"""Chiplets AIR tests: memory/bitwise traces satisfy the stacked chiplet
constraints, the cross-AIR buses balance, and tampered chiplet values are
rejected (docs/src/design/chiplets/{memory,bitwise}.md)."""

import dataclasses

import numpy as np
import pytest

from miden_tpu.vm import chiplets as C
from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.constraints import check_core_trace
from miden_tpu.vm.trace import execute_and_trace

PROGRAMS = {
    "memory_mix": (
        """
        begin
            push.42 mem_store.100 push.7 mem_store.104
            mem_load.100 mem_load.104 u32assert2 u32wrapping_add swap drop
            push.1 push.2 push.3 push.4 push.200 mem_storew_le
            mem_loadw_le dropw drop
        end
        """,
        [],
    ),
    "bitwise": (
        """
        begin
            push.0xF0F0 push.0x0FF0 u32and
            push.0xAAAA u32xor
            swap drop swap drop
        end
        """,
        [],
    ),
    "mem_stream": (
        """
        begin
            push.1 push.2 push.3 push.4 push.100 mem_storew_le dropw
            push.5 push.6 push.7 push.8 push.104 mem_storew_le dropw
            padw padw padw push.100 movdn.12
            mem_stream
            dropw dropw dropw drop
        end
        """,
        [],
    ),
    "overwrite": (
        """
        begin
            push.10 mem_store.300
            push.20 mem_store.300
            mem_load.300 push.20 assert_eq
        end
        """,
        [],
    ),
    "cross_context": (
        """
        proc writer
            push.77 mem_store.100 push.104 mem_load assertz.err="must be fresh"
        end
        begin
            push.42 mem_store.100
            call.writer
            mem_load.100 push.42 assert_eq
        end
        """,
        [],
    ),
}


@pytest.mark.parametrize("name", sorted(PROGRAMS))
def test_chiplet_traces_satisfy_airs(name):
    src, inputs = PROGRAMS[name]
    out, trace = execute_and_trace(assemble(src), inputs)
    violations = check_core_trace(trace)
    assert not violations, violations[:10]


def test_chiplets_trace_structure():
    src, inputs = PROGRAMS["memory_mix"]
    _, trace = execute_and_trace(assemble(src), inputs)
    m = trace.chiplets
    n = m.shape[0]
    assert m.shape[1] == C.CHIPLETS_WIDTH
    assert n & (n - 1) == 0
    # chip_clk counts from 1
    assert np.array_equal(m[:, C.CHIP_CLK], np.arange(1, n + 1, dtype=np.uint64))
    # memory rows sorted by (ctx, addr, clk)
    mem = m[(m[:, C.S0] == 1) & (m[:, C.S1] == 1) & (m[:, C.S2] == 0)]
    keys = [
        (int(r[C.M_CTX]), int(r[C.M_ADDR]), int(r[C.M_CLK])) for r in mem
    ]
    assert keys == sorted(keys)
    assert len(mem) > 0


@pytest.mark.parametrize(
    "col",
    [C.M_V[0], C.M_CLK, C.M_ADDR, C.M_D0, C.M_RW],
    ids=["value", "clk", "addr", "d0", "rw"],
)
def test_tampered_memory_rows_caught(col):
    src, inputs = PROGRAMS["memory_mix"]
    _, trace = execute_and_trace(assemble(src), inputs)
    m = trace.chiplets.copy()
    mem_rows = np.flatnonzero(
        (m[:, C.S0] == 1) & (m[:, C.S1] == 1) & (m[:, C.S2] == 0)
    )
    r = int(mem_rows[len(mem_rows) // 2])
    m[r, col] += 1
    bad = dataclasses.replace(trace, chiplets=m)
    assert check_core_trace(bad, max_violations=5), f"tampered col {col} missed"


def test_tampered_bitwise_result_caught():
    src, inputs = PROGRAMS["bitwise"]
    _, trace = execute_and_trace(assemble(src), inputs)
    m = trace.chiplets.copy()
    bw_rows = np.flatnonzero((m[:, C.S0] == 1) & (m[:, C.S1] == 0))
    r = int(bw_rows[7])  # final row of the first cycle
    m[r, C.BW_Z] += 1
    bad = dataclasses.replace(trace, chiplets=m)
    assert check_core_trace(bad, max_violations=5)


def test_forged_memory_load_caught():
    # claim a different loaded value in the core trace: the chiplet bus
    # must catch the mismatch
    src, inputs = PROGRAMS["overwrite"]
    _, trace = execute_and_trace(assemble(src), inputs)
    from miden_tpu.vm import layout as L
    from miden_tpu.vm.ops import OPCODES

    ops = sum(
        trace.matrix[:, L.OP_BITS[i]].astype(np.int64) << i for i in range(7)
    )
    mload_rows = np.flatnonzero(ops == OPCODES["MLOAD"])
    assert len(mload_rows) > 0
    m = trace.matrix.copy()
    # the loaded value lands on the next row's s0
    m[mload_rows[0] + 1, L.STACK_TOP[0]] += 1
    bad = dataclasses.replace(trace, matrix=m)
    assert check_core_trace(bad, max_violations=8)


def test_syscall_kernel_rom():
    # kernel procedures bind through the kernel ROM chiplet: INIT removals
    # balanced by the public kernel digests, CALL multiplicities by the
    # SYSCALL rows (docs kernel_rom.md)
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op

    forest = MastForest()
    proc = forest.add_block([Op("PUSH", 7), Op("SWAP"), Op("DROP")])
    unused = forest.add_block([Op("PUSH", 9), Op("SWAP"), Op("DROP")])
    sys1 = forest.add_call(proc, is_syscall=True)
    body = forest.add_block([Op("PUSH", 3)])
    join = forest.add_join(body, sys1)
    outer = forest.add_join(join, forest.add_block([Op("DROP")]))
    forest.make_root(outer)
    program = Program(
        forest, outer,
        kernel_digests=(forest[proc].digest, forest[unused].digest),
    )
    out, trace = execute_and_trace(program, [])
    # [3] → syscall replaces with 7 → trailing block drops it
    assert out.stack[0] == 0
    violations = check_core_trace(trace)
    assert not violations, violations[:8]
    # kernel rows present: one per declared proc, multiplicities 1 and 0
    krows = trace.chiplets[
        (trace.chiplets[:, C.S0] == 1)
        & (trace.chiplets[:, C.S1] == 1)
        & (trace.chiplets[:, C.S2] == 1)
        & (trace.chiplets[:, C.S3] == 1)
        & (trace.chiplets[:, C.S4] == 0)
    ]
    assert sorted(int(r[C.K_MULT]) for r in krows) == [0, 1]

    # forged kernel digest in the public claim breaks the balance
    bad = dataclasses.replace(
        trace,
        kernel_digests=(
            tuple((trace.kernel_digests[0][0] + 1,) + trace.kernel_digests[0][1:]),
            trace.kernel_digests[1],
        ),
    )
    assert check_core_trace(bad, max_violations=5)


def test_masm_syscall_end_to_end():
    # MASM-level kernel: Assembler(kernel=...) declares the ROM; syscall
    # rows bind through KERNEL_PROC_CALL messages
    from miden_tpu.vm.assembler import Assembler

    kernel = """
    export.get_secret
        push.1234 swap drop
    end
    export.unused_proc
        push.1 drop
    end
    """
    asm = Assembler(kernel=kernel)
    prog = asm.assemble_program("begin push.0 syscall.get_secret swap drop end")
    out, trace = execute_and_trace(prog, [])
    assert out.stack[0] == 1234
    assert len(prog.kernel_digests) == 2
    assert not check_core_trace(trace)

    # syscalls to non-kernel procs are rejected at execution
    import pytest as _pytest

    from miden_tpu.vm.processor import ExecutionError

    asm2 = Assembler(kernel="export.only_proc\n push.1 drop\nend")
    with _pytest.raises(Exception):
        asm2.assemble_program("begin syscall.not_there end")
