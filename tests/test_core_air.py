"""Core VM AIR tests: real traces satisfy every constraint family; corrupted
traces are rejected.

Mirrors the reference's `check_constraints` debug-checker strategy
(crates/lifted-stark/src/debug.rs) on the Miden decoder/stack/range
constraint set (docs/src/design/{decoder,stack,range}).
"""

import dataclasses

import pytest

from miden_tpu.field import gl
from miden_tpu.vm import layout as L
from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.constraints import CoreVmAir, check_core_trace
from miden_tpu.vm.processor import AdviceProvider
from miden_tpu.vm.trace import execute_and_trace

PROGRAMS = {
    "fib": (
        "begin push.0 push.1 repeat.10 swap dup.1 add end swap drop swap drop end",
        [],
        None,
    ),
    "loop_sum": (
        """
        begin
            push.0 swap dup.0 neq.0
            while.true dup.0 movup.2 add swap sub.1 dup.0 neq.0 end
            drop
        end
        """,
        [7],
        None,
    ),
    "call_u32": (
        """
        proc lowbits
            u32split drop
        end
        begin
            push.5000000042 call.lowbits push.3 u32wrapping_add swap drop
        end
        """,
        [],
        None,
    ),
    "memory": (
        """
        begin
            push.42 mem_store.100 push.7 mem_store.104
            mem_load.100 mem_load.104 u32assert2 u32wrapping_add swap drop
        end
        """,
        [],
        None,
    ),
    "u32_mix": (
        """
        begin
            push.100000 push.200000 u32assert2
            u32overflowing_add drop
            push.7 u32wrapping_mul
            push.13 u32divmod drop
            swap drop swap drop
        end
        """,
        [],
        None,
    ),
    "stackops": (
        """
        begin
            push.1 push.2 push.3 push.4
            swapw dupw.1 dropw movup.5 movdn.3
            push.1 cswap
            dropw drop drop drop
        end
        """,
        [9, 8, 7],
        None,
    ),
    "respan": (
        "begin "
        + " ".join(f"push.{i} drop" for i in range(20))
        + " push.9 swap drop end",
        [],
        None,
    ),
    "ext2": (
        "begin push.3 push.4 push.5 push.6 ext2mul drop drop drop drop end",
        [],
        None,
    ),
    "advice": (
        "begin adv_push.2 u32assert2 u32overflowing_sub drop drop end",
        [],
        AdviceProvider(stack=[9, 5]),
    ),
}


def test_constraint_degree():
    assert CoreVmAir().constraint_degree() == 9


@pytest.mark.parametrize("name", sorted(PROGRAMS))
def test_real_traces_satisfy_air(name):
    src, inputs, advice = PROGRAMS[name]
    _, trace = execute_and_trace(assemble(src), inputs, advice=advice)
    violations = check_core_trace(trace)
    assert not violations, violations[:10]


CORRUPTIONS = [
    ("stack", 3, L.STACK_TOP[0]),
    ("opbit", 2, L.OP_BITS[3]),
    ("clk", 5, L.CLK),
    ("gc", 2, L.GROUP_COUNT),
    ("rcv", 10, L.RC_VALUE),
    ("b0", 4, L.B0),
    ("h0", 2, L.HASHER[0]),
    ("in_span", 3, L.IN_SPAN),
    ("op_index", 3, L.OP_INDEX),
    ("ctx", 6, L.CTX),
    ("addr", 2, L.ADDR),
]


@pytest.mark.parametrize("label,row,col", CORRUPTIONS, ids=[c[0] for c in CORRUPTIONS])
def test_corruptions_caught(label, row, col):
    _, trace = execute_and_trace(
        assemble("begin push.5 push.6 add swap drop end"), []
    )
    m = trace.matrix.copy()
    m[row, col] = (int(m[row, col]) + 1) % gl.P
    bad = dataclasses.replace(trace, matrix=m)
    assert check_core_trace(bad, max_violations=3), f"corrupt {label} missed"


def test_forged_output_caught():
    # claiming the wrong output in the public values must fail
    _, trace = execute_and_trace(
        assemble("begin push.5 push.6 add swap drop end"), []
    )
    bad = dataclasses.replace(
        trace, stack_outputs=[999] + list(trace.stack_outputs[1:])
    )
    assert check_core_trace(bad, max_violations=3)


def test_forged_program_hash_caught():
    # the block-hash-table seed binds execution to the claimed program hash
    _, trace = execute_and_trace(
        assemble("begin push.5 push.6 add swap drop end"), []
    )
    ph = list(trace.program_hash)
    ph[0] = (ph[0] + 1) % gl.P
    bad = dataclasses.replace(trace, program_hash=tuple(ph))
    violations = check_core_trace(bad, max_violations=50)
    assert any("bus" in v.label or "logup" in v.label for v in violations), violations


def test_tampered_join_digest_breaks_block_hash_bus():
    import numpy as np
    from miden_tpu.vm.ops import OPCODES

    src = "begin push.1 if.true push.2 drop else push.3 drop end drop end"
    _, trace = execute_and_trace(assemble(src), [])
    ops = sum(
        trace.matrix[:, L.OP_BITS[i]].astype(np.int64) << i for i in range(7)
    )
    join = int(np.flatnonzero(ops == OPCODES["JOIN"])[0])
    m = trace.matrix.copy()
    m[join, L.HASHER[2]] += 1
    v = check_core_trace(dataclasses.replace(trace, matrix=m), max_violations=5)
    assert any("bus" in x.label or "logup" in x.label for x in v), v


def test_dyncall_with_nonempty_overflow_satisfies_air():
    """DYNCALL while the overflow table holds rows: its depth reset rides
    call_entry and its overflow pop uses the h5-stored pointer — DYNCALL
    must NOT sit in the aggregate shift-left flag (op_flags/mod.rs:599-619;
    a prior version double-popped the overflow bus and forced b0' = 15)."""
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op

    from tests.test_ref_parity import _dyn_prelude_ops, _dyn_target_proc_hash

    f = MastForest()
    # store the callee hash (from the stack inputs) to memory, then
    # overflow the stack by 3 BEFORE pushing the hash address for dyncall
    pre = f.add_block(
        _dyn_prelude_ops()[:-1]  # ... MSTOREW, DROPx4 (hash now in memory)
        + [Op("PUSH", imm=7), Op("PUSH", imm=8), Op("PUSH", imm=9)]
        + [Op("PUSH", imm=40)]  # hash address for the dyncall
    )
    dc = f.add_dyn(is_dyncall=True)
    inner = f.add_join(pre, dc)
    # drain the 3 overflowed rows so the boundary b0_last = 16 holds
    drain = f.add_block([Op("DROP"), Op("DROP"), Op("DROP")])
    root = f.add_join(inner, drain)
    f.make_root(root)
    target = f.add_block([Op("SWAP")])
    f.make_root(target)

    _, trace = execute_and_trace(Program(f, root), _dyn_target_proc_hash())
    violations = check_core_trace(trace)
    assert not violations, violations[:10]


def test_tampered_overflow_value_caught():
    import numpy as np

    _, t = execute_and_trace(
        assemble("begin push.1 push.2 push.3 drop drop drop end"),
        list(range(1, 17)),
    )
    m = t.matrix.copy()
    deep = int(np.flatnonzero(m[:, L.B0] > 17)[0])
    m[deep, L.STACK_TOP[15]] += 1
    v = check_core_trace(dataclasses.replace(t, matrix=m), max_violations=5)
    assert any("bus" in x.label or "stack" in x.label for x in v), v
