"""Native (C) trace generation ≡ Python trace builder.

Pins miden_tpu/native/trace_gen.c + vm/native_trace.py against the exact
Python interpreter+builder on whole matrices — every core column, the
chiplets/poseidon traces, and the execution outputs — for programs inside
the native subset (a single basic block), and checks the fallback chain
for programs outside it.

The assembler wraps every program in ``Join(prologue, body)`` (the
prologue initializes memory), so the native single-block subset is only
reachable through directly-built MAST programs; assembled programs take
the Python path until the C interpreter grows join/memory support.
"""

import numpy as np
import pytest

from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.mast import MastForest, Program
from miden_tpu.vm.native_trace import NativeUnsupported, native_execute_and_trace
from miden_tpu.vm.ops import Op
from miden_tpu.vm.processor import Processor, StackInputs
from miden_tpu.vm.trace import TraceBuilder, execute_and_trace


def _python_trace(program, stack_inputs=None):
    import os

    if isinstance(stack_inputs, list):
        stack_inputs = StackInputs(stack_inputs)
    tracer = TraceBuilder()
    proc = Processor(program, stack_inputs, tracer=tracer)
    os.environ["MIDEN_TPU_NATIVE"] = "0"  # force the exact Python path:
    try:  # the hybrid runs eligible blocks in C even under TraceBuilder
        out = proc.execute()
    finally:
        os.environ.pop("MIDEN_TPU_NATIVE", None)
    return out, tracer.finalize(program)


def _block_program(ops) -> Program:
    forest = MastForest()
    bid = forest.add_block([Op(n) if isinstance(n, str) else Op(*n) for n in ops])
    forest.roots.append(bid)
    return Program(forest, bid)


NATIVE_PROGRAMS = [
    # arithmetic + stack shuffling
    ([("PUSH", 3), ("PUSH", 4), "ADD", ("PUSH", 7), "MUL", "SWAP", "DROP"], []),
    # fibonacci loop body, unrolled (SPAN/RESPAN coverage across batches)
    (
        [("PUSH", 0), ("PUSH", 1)]
        + ["SWAP", "DUP1", "ADD"] * 40
        + ["SWAP", "DROP", "SWAP", "DROP"],
        [],
    ),
    # u32 ops exercising the range checker
    (
        [("PUSH", 100000), "U32SPLIT", "U32ADD", "DROP",
         ("PUSH", 12345), "U32MUL", "DROP", "DROP"],
        [],
    ),
    # stack inputs + dup/movup family
    (
        ["DUP7", "MOVUP5", "ADD", "MOVDN3", "DROP", "DROP"],
        [9, 8, 7, 6, 5, 4, 3, 2],
    ),
    # comparisons + conditional swaps
    (
        [("PUSH", 5), ("PUSH", 9), "EQ", ("PUSH", 11), ("PUSH", 22),
         "MOVUP2", "CSWAP", "ADD", "DROP"],
        [],
    ),
]


@pytest.mark.parametrize("ops,inputs", NATIVE_PROGRAMS)
def test_native_matches_python_whole_matrices(ops, inputs):
    prog = _block_program(ops)
    out_py, tr_py = _python_trace(prog, list(inputs))
    out_c, tr_c = native_execute_and_trace(prog, list(inputs))

    assert out_c.stack == out_py.stack
    assert out_c.clk == out_py.clk
    assert tr_c.num_real_rows == tr_py.num_real_rows
    assert tr_c.program_hash == tr_py.program_hash
    assert tr_c.stack_outputs == tr_py.stack_outputs

    assert tr_c.matrix.shape == tr_py.matrix.shape
    mismatch = np.argwhere(tr_c.matrix != tr_py.matrix)
    assert mismatch.size == 0, f"core matrix differs first at {mismatch[:5]}"
    assert np.array_equal(tr_c.chiplets, tr_py.chiplets)
    assert np.array_equal(tr_c.poseidon, tr_py.poseidon)


def test_fallback_chain_dispatches():
    """execute_and_trace transparently falls back to Python for programs
    outside the native subset (all assembled programs today: the assembler
    emits a Join prologue with memory ops)."""
    prog = assemble("begin push.1 push.2 add push.4 mul swap drop end")
    with pytest.raises(NativeUnsupported):
        native_execute_and_trace(prog)
    out, tr = execute_and_trace(prog)
    _, tr_py = _python_trace(prog)
    assert np.array_equal(tr.matrix, tr_py.matrix)
    assert out.stack[0] == 12


@pytest.mark.slow  # full prove+verify compile; matrix parity is the fast pin
def test_native_prove_verify_e2e():
    """A native-traced raw-block program proves and verifies end-to-end."""
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.vm.prove import prove_program, verify_program

    prog = _block_program(
        [("PUSH", 0), ("PUSH", 1)]
        + ["SWAP", "DUP1", "ADD"] * 11
        + ["SWAP", "DROP", "SWAP", "DROP"]
    )
    # confirm this program really takes the native path
    native_execute_and_trace(prog)
    out, proof = prove_program(prog, params=TEST_PARAMS)
    assert out.stack[0] == 144  # fib(12)
    verify_program(proof, params=TEST_PARAMS)


def test_loop_body_blocks_run_native_and_match_python():
    """Control-flow programs route loop-body basic blocks through the C
    segment path (END rows carry the h4 is_loop_body flag); the full
    trace matches the pure-Python build bit for bit."""
    import os

    from miden_tpu.vm.assembler import assemble
    from miden_tpu.vm.trace import execute_and_trace

    # while loop: counts down from 40, accumulating fib-style adds
    src = (
        "begin push.40 push.0 push.1 "
        "dup.2 neq.0 "
        "while.true "
        "  swap dup.1 add "
        "  movup.2 sub.1 movdn.2 "
        "  dup.2 neq.0 "
        "end "
        "movup.2 drop swap drop swap drop "
        "end"
    )
    prog = assemble(src)
    out_c, tr_c = execute_and_trace(prog)
    os.environ["MIDEN_TPU_NATIVE"] = "0"
    try:
        out_py, tr_py = execute_and_trace(prog)
    finally:
        del os.environ["MIDEN_TPU_NATIVE"]

    assert out_c.stack == out_py.stack and out_c.clk == out_py.clk
    assert tr_c.matrix.shape == tr_py.matrix.shape
    mismatch = np.argwhere(tr_c.matrix != tr_py.matrix)
    assert mismatch.size == 0, f"core matrix differs first at {mismatch[:5]}"
    assert np.array_equal(tr_c.chiplets, tr_py.chiplets)
    assert np.array_equal(tr_c.poseidon, tr_py.poseidon)
