"""Structural tests for the core execution trace builder.

Checks the invariants the decoder/stack AIR will enforce
(docs/src/design/decoder/constraints.md, docs/src/design/stack/index.md,
docs/src/design/range.md) directly on traces of real assembled programs.
"""

import numpy as np
import pytest

from miden_tpu.vm import layout as L
from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.ops import OPCODES
from miden_tpu.vm.trace import RANGE_STEPS, execute_and_trace

HALT = OPCODES["HALT"]
END = OPCODES["END"]
SPAN = OPCODES["SPAN"]
RESPAN = OPCODES["RESPAN"]
PUSH = OPCODES["PUSH"]


def opcode_col(m):
    return sum(m[:, L.OP_BITS[i]].astype(np.int64) << i for i in range(7))


PROGRAMS = {
    "fib": """
        begin
            push.0 push.1
            repeat.10 swap dup.1 add end
            swap drop swap drop
        end
    """,
    "loop_sum": """
        begin
            push.0 swap dup.0 neq.0
            while.true
                dup.0 movup.2 add swap sub.1 dup.0 neq.0
            end
            drop
        end
    """,
    "call_u32": """
        proc lowbits
            u32split drop
        end
        begin
            push.5000000042 call.lowbits
            push.3 u32wrapping_add
            swap drop
        end
    """,
    "memory": """
        begin
            push.42 mem_store.100
            push.7 mem_store.104
            mem_load.100 mem_load.104 u32assert2 u32wrapping_add
            swap drop
        end
    """,
}


@pytest.fixture(params=sorted(PROGRAMS), ids=sorted(PROGRAMS))
def traced(request):
    src = PROGRAMS[request.param]
    inputs = [7] if request.param == "loop_sum" else []
    out, trace = execute_and_trace(assemble(src), inputs)
    return out, trace


class TestStructure:
    def test_shape_and_clk(self, traced):
        _, t = traced
        n = t.matrix.shape[0]
        assert t.matrix.shape == (n, L.CORE_WIDTH)
        assert n >= L.MIN_TRACE_LEN and n & (n - 1) == 0
        assert np.array_equal(t.matrix[:, L.CLK], np.arange(n, dtype=np.uint64))

    def test_op_bits_binary_and_halt_padding(self, traced):
        _, t = traced
        m = t.matrix
        for c in L.OP_BITS:
            assert np.all(m[:, c] <= 1)
        ops = opcode_col(m)
        # rows after the program are all HALT with addr 0 and program hash
        assert np.all(ops[t.num_real_rows :] == HALT)
        assert np.all(m[t.num_real_rows :, L.ADDR] == 0)
        for i in range(4):
            assert np.all(m[t.num_real_rows :, L.HASHER[i]] == t.program_hash[i])
        # halt-only-follows-halt
        is_halt = ops == HALT
        assert np.all(~is_halt[:-1] | is_halt[1:])

    def test_extra_columns(self, traced):
        _, t = traced
        m = t.matrix.astype(np.int64)
        b4, b5, b6 = m[:, L.OP_BITS[4]], m[:, L.OP_BITS[5]], m[:, L.OP_BITS[6]]
        assert np.array_equal(m[:, L.EXTRA[0]], b6 * (1 - b5) * b4)
        assert np.array_equal(m[:, L.EXTRA[1]], b6 * b5)

    def test_in_span_iff_user_op(self, traced):
        _, t = traced
        m = t.matrix
        ops = opcode_col(m)
        ctrl = {
            OPCODES[n]
            for n in (
                "JOIN", "SPLIT", "LOOP", "REPEAT", "SPAN", "RESPAN",
                "DYN", "DYNCALL", "CALL", "SYSCALL", "END", "HALT",
            )
        }
        is_ctrl = np.isin(ops, sorted(ctrl))
        assert np.array_equal(m[:, L.IN_SPAN].astype(bool), ~is_ctrl)

    def test_group_count(self, traced):
        _, t = traced
        m = t.matrix.astype(np.int64)
        ops = opcode_col(m)
        gc = m[:, L.GROUP_COUNT]
        dgc = gc[:-1] - gc[1:]
        sp = m[:-1, L.IN_SPAN]
        # inside a span gc stays or decrements by one
        assert np.all((sp == 0) | (dgc == 0) | (dgc == 1))
        # SPAN/RESPAN/PUSH rows decrement by exactly one
        dec = np.isin(ops[:-1], [SPAN, RESPAN, PUSH])
        assert np.all(~dec | (dgc == 1))
        # gc = 0 on every END row
        assert np.all(gc[ops == END] == 0)
        # when gc decrements in-span without an immediate, h0 must be 0
        h0 = m[:-1, L.HASHER[0]]
        imm = ops[:-1] == PUSH
        assert np.all(~((sp == 1) & (dgc == 1) & ~imm) | (h0 == 0))

    def test_op_group_decoding(self, traced):
        _, t = traced
        m = t.matrix.astype(object)
        ops = opcode_col(t.matrix)
        n = t.num_real_rows
        h0 = t.matrix[:, L.HASHER[0]].astype(object)
        gc = t.matrix[:, L.GROUP_COUNT].astype(np.int64)
        sp = t.matrix[:, L.IN_SPAN].astype(np.int64)
        for r in range(n - 1):
            gates = ops[r] in (SPAN, RESPAN, PUSH) or (
                sp[r] and sp[r + 1] and gc[r] == gc[r + 1]
            )
            if gates:
                assert int(h0[r]) == int(h0[r + 1]) * 128 + int(ops[r + 1]), r
            if sp[r] and ops[r + 1] in (END, RESPAN):
                assert int(h0[r]) == 0, r

    def test_stack_boundary_and_depth(self, traced):
        out, t = traced
        m = t.matrix
        assert m[0, L.B0] == 16 and m[-1, L.B0] == 16
        assert m[0, L.B1] == 0 and m[-1, L.B1] == 0
        assert np.all(m[:, L.B0] >= 16)
        # outputs on the last row
        assert [int(v) for v in m[-1, L.STACK_TOP[0] : L.STACK_TOP[0] + 16]] == out.stack
        # stack h0 helper: (b0-16)*h0 == 1 wherever b0 != 16
        from miden_tpu.field import gl

        for r in range(m.shape[0]):
            d = int(m[r, L.B0]) - 16
            if d:
                assert gl.mul(d, int(m[r, L.H0])) == 1

    def test_range_checker(self, traced):
        _, t = traced
        m = t.matrix.astype(np.int64)
        v = m[:, L.RC_VALUE]
        assert v[0] == 0 and v[-1] == 65535
        deltas = set(np.unique(v[1:] - v[:-1]).tolist())
        assert deltas <= ({0} | set(RANGE_STEPS))
        # multiplicity-weighted values == the requested multiset
        from collections import Counter

        table = Counter()
        for val, mult in zip(v.tolist(), m[:, L.RC_MULT].tolist()):
            if mult:
                table[val] += mult
        assert table == Counter(t.range_values)

    def test_end_rows_carry_digests(self, traced):
        _, t = traced
        m = t.matrix
        ops = opcode_col(m)
        # END flags are binary
        for c in L.HASHER[4:8]:
            assert np.all(m[ops == END, c] <= 1)


class TestSpecifics:
    def test_respan_on_long_block(self):
        # >8 groups forces a RESPAN (multi-batch basic block)
        body = " ".join(f"push.{i} drop" for i in range(20))
        out, t = execute_and_trace(assemble(f"begin {body} push.9 swap drop end"), [])
        assert out.stack[0] == 9
        ops = opcode_col(t.matrix)
        respans = np.flatnonzero(ops == RESPAN)
        assert len(respans) >= 1
        # addr increments by 2 across RESPAN
        m = t.matrix.astype(np.int64)
        for r in respans:
            assert m[r + 1, L.ADDR] == m[r, L.ADDR] + 2
            # h1 on the row after RESPAN holds the parent block id
            join_addr = m[0, L.ADDR]  # root: parent of the span
            assert m[r + 1, L.HASHER[1]] == join_addr or m[r + 1, L.HASHER[1]] >= 0

    def test_loop_trace_flags(self):
        out, t = execute_and_trace(
            assemble(
                "begin push.3 dup.0 neq.0 while.true sub.1 dup.0 neq.0 end"
                " drop drop end"
            ),
            [],
        )
        m = t.matrix
        ops = opcode_col(m)
        repeat_rows = np.flatnonzero(ops == OPCODES["REPEAT"])
        assert len(repeat_rows) == 2  # 3 iterations = 2 repeats
        # REPEAT rows carry is_loop_body = 1 in h4 and s0 = 1
        for r in repeat_rows:
            assert m[r, L.END_IS_LOOP_BODY] == 1
            assert m[r, L.STACK_TOP[0]] == 1
        # exactly one END row with is_loop = 1, preceded by s0 = 0
        loop_ends = np.flatnonzero((ops == END) & (m[:, L.END_IS_LOOP] == 1))
        assert len(loop_ends) == 1
        assert m[loop_ends[0], L.STACK_TOP[0]] == 0

    def test_call_context_columns(self):
        src = """
        proc ten
            push.10 swap drop
        end
        begin
            push.99 call.ten swap drop
        end
        """
        out, t = execute_and_trace(assemble(src), [])
        assert out.stack[0] == 10
        m = t.matrix.astype(np.int64)
        ops = opcode_col(t.matrix)
        call_rows = np.flatnonzero(ops == OPCODES["CALL"])
        assert len(call_rows) == 1
        r = call_rows[0]
        # next row enters the new context: ctx = clk of next row, fn_hash set
        assert m[r, L.CTX] == 0
        assert m[r + 1, L.CTX] == r + 1
        assert tuple(m[r + 1, list(L.FN_HASH)]) != (0, 0, 0, 0)
        # the call END row restores ctx on the following row
        call_ends = np.flatnonzero((ops == END) & (t.matrix[:, L.END_IS_CALL] == 1))
        assert len(call_ends) == 1
        assert m[call_ends[0] + 1, L.CTX] == 0
