"""Native-path trace generation: C interpreter + numpy finalization.

The scalable front-end for real-program proving (reference analog: the
320 MHz FastProcessor + rayon build_trace, processor/src/fast/mod.rs:102,
trace/parallel/mod.rs:91). Programs whose entrypoint is a single basic
block over the supported op subset execute in C at ~10^8 rows/s with
trace rows written directly into a numpy buffer; everything else falls
back to the (exact, slow) Python interpreter.

Equivalence with the Python path is pinned by tests/test_native_trace.py.
"""

from __future__ import annotations

import numpy as np

from ..field import gl
from . import layout as L
from .mast import BasicBlockNode, Program
from .ops import OPCODES

P = gl.P

# internal dispatch kinds — must match the enum in native/trace_gen.c
_KINDS = {
    "NOOP": 0, "ASSERT": 1, "ADD": 2, "MUL": 3, "NEG": 4, "INV": 5,
    "INCR": 6, "NOT": 7, "AND": 8, "OR": 9, "EQ": 10, "EQZ": 11,
    "EXPACC": 12, "EXT2MUL": 13, "PAD": 14, "DROP": 15, "SWAP": 16,
    "SWAPW": (17, 4), "SWAPW2": (17, 8), "SWAPW3": (17, 12), "SWAPDW": 18,
    "CSWAP": 22, "CSWAPW": 23, "PUSH": 24, "SDEPTH": 25, "CLK": 26,
    "U32SPLIT": 27, "U32ADD": 28, "U32ADD3": 29, "U32SUB": 30,
    "U32MUL": 31, "U32MADD": 32, "U32DIV": 33, "U32ASSERT2": 34,
}
for _i in range(16):
    _KINDS[f"DUP{_i}"] = (19, _i)
for _i in range(2, 9):
    _KINDS[f"MOVUP{_i}"] = (20, _i)
    _KINDS[f"MOVDN{_i}"] = (21, _i)


class NativeUnsupported(Exception):
    pass


def _op_tables(node: BasicBlockNode):
    n_batches = len(node.batches)
    groups = np.zeros(n_batches * 8, dtype=np.uint64)
    n_groups = np.zeros(n_batches, dtype=np.int64)
    batch_of_op, codes, kinds, params, imms, has_imm = [], [], [], [], [], []
    for bi, batch in enumerate(node.batches):
        groups[bi * 8 : bi * 8 + 8] = [g % P for g in batch.groups]
        n_groups[bi] = batch.num_groups
        for op in batch.ops:
            k = _KINDS.get(op.name)
            if k is None:
                raise NativeUnsupported(op.name)
            kind, param = k if isinstance(k, tuple) else (k, 0)
            batch_of_op.append(bi)
            codes.append(op.op_code)
            kinds.append(kind)
            params.append(param)
            imms.append(op.imm or 0)
            has_imm.append(1 if op.imm is not None else 0)
    return (
        groups,
        n_groups,
        np.asarray(batch_of_op, dtype=np.int64),
        np.asarray(codes, dtype=np.uint64),
        np.asarray(kinds, dtype=np.int64),
        np.asarray(params, dtype=np.uint64),
        np.asarray(imms, dtype=np.uint64),
        np.asarray(has_imm, dtype=np.uint64),
    )


def _node_tables(node: BasicBlockNode):
    cache = node.__dict__.get("_native_tables")
    if cache is None:
        cache = _op_tables(node)
        node.__dict__["_native_tables"] = cache
    return cache


def native_block_segment(
    proc, tracer, node: BasicBlockNode, addr: int, is_loop_body: bool = False
) -> bool:
    """Execute + trace one basic block in C at the processor's current
    state, splicing the rows (SPAN + ops + RESPANs + END) into the tracer
    as a segment and advancing the processor (clk, stack, overflow).

    Returns False (leaving all state untouched) when the block is outside
    the native op subset — the caller then runs the exact Python path.
    The hybrid keeps control flow (join/split/loop/call rows, memory and
    chiplet ops) in Python at O(#nodes) cost while the op rows — the bulk
    of any long trace — are written at C speed (reference analog: the
    fragment-parallel ReplayProcessor, processor/src/trace/parallel/).
    """
    import ctypes
    import os

    if os.environ.get("MIDEN_TPU_NATIVE") == "0":
        return False
    if tracer is None or not hasattr(tracer, "append_segment"):
        return False
    try:
        tables = _node_tables(node)
    except NativeUnsupported:
        return False
    from ..native import trace_gen_lib

    groups, n_groups, batch_of_op, codes, kinds, params, imms, has_imm = tables
    n_ops = len(codes)
    n_batches = len(n_groups)
    n_rows = n_ops + n_batches + 1  # SPAN + ops + RESPANs + END

    depth0 = proc.depth
    stack_init = np.zeros(depth0, dtype=np.uint64)
    stack_init[: len(proc.stack)] = [v % P for v in proc.stack[:depth0]]
    ovf_init = np.asarray(proc.overflow_addrs, dtype=np.uint64)
    fn_hash = np.asarray(proc.fn_hash, dtype=np.uint64)
    digest = np.asarray(node.digest, dtype=np.uint64)

    out = np.zeros((n_rows, L.CORE_WIDTH), dtype=np.uint64)
    rc_out = np.zeros(max(4 * n_ops, 4), dtype=np.uint64)
    stack_cap = depth0 + 32 + n_ops
    stack_buf = np.zeros(stack_cap, dtype=np.uint64)
    ovf_buf = np.zeros(stack_cap, dtype=np.uint64)
    final16 = np.zeros(16, dtype=np.uint64)
    final_ovf = np.zeros(stack_cap, dtype=np.uint64)
    final_ovf_clk = np.zeros(stack_cap, dtype=np.uint64)
    n_rc = np.zeros(1, dtype=np.int64)
    final_depth = np.zeros(1, dtype=np.int64)
    final_clk = np.zeros(1, dtype=np.uint64)

    lib = trace_gen_lib()
    u64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    rows = lib.run_block_segment(
        u64p(groups), i64p(n_groups), n_batches,
        i64p(batch_of_op), u64p(codes), i64p(kinds),
        u64p(params), u64p(imms), u64p(has_imm), n_ops,
        u64p(stack_init), depth0, u64p(ovf_init),
        proc.clk, proc.ctx, u64p(fn_hash),
        addr, tracer._cur_addr(), 1, int(is_loop_body), u64p(digest),
        u64p(out), n_rows, u64p(rc_out), i64p(n_rc),
        u64p(stack_buf), u64p(ovf_buf), stack_cap,
        u64p(final16), u64p(final_ovf), u64p(final_ovf_clk),
        i64p(final_depth), u64p(final_clk),
    )
    if rows < 0:
        from .processor import ExecutionError

        raise ExecutionError(f"native block execution failed (code {rows})")
    assert int(rows) == n_rows

    tracer.append_segment(out)
    depth = int(final_depth[0])
    n_ovf = depth - L.MIN_STACK_DEPTH
    proc.stack = [int(v) for v in final16] + [
        int(v) for v in final_ovf[:n_ovf]
    ]
    proc.overflow_addrs = [int(v) for v in final_ovf_clk[:n_ovf]]
    proc.depth = depth
    proc.clk = int(final_clk[0])
    return True


def native_execute_and_trace(program: Program, stack_inputs=None):
    """Execute + build the core trace natively.

    Raises :class:`NativeUnsupported` when the program shape or op set is
    outside the native subset (caller falls back to the Python path)."""
    import ctypes

    from ..native import trace_gen_lib
    from .processor import ExecutionError, StackInputs, AdviceProvider, ExecutionOutput
    from .trace import CoreTrace, _range_checker_rows

    node = program.forest[program.entrypoint]
    if not isinstance(node, BasicBlockNode):
        raise NativeUnsupported(type(node).__name__)
    cache = node.__dict__.get("_native_tables")
    if cache is None:
        cache = _op_tables(node)
        node.__dict__["_native_tables"] = cache
    groups, n_groups, batch_of_op, codes, kinds, params, imms, has_imm = cache
    n_ops = len(codes)
    n_batches = len(n_groups)

    if isinstance(stack_inputs, StackInputs):
        inputs = list(stack_inputs.values)
    else:
        inputs = [v % P for v in (stack_inputs or [])]
    stack_init = np.zeros(16, dtype=np.uint64)
    stack_init[: len(inputs)] = inputs

    digest = np.asarray(node.digest, dtype=np.uint64)
    # exact row count: SPAN + ops + RESPANs + END
    n_real = n_ops + n_batches + 1
    n = 1 << (max(n_real + 1, L.MIN_TRACE_LEN) - 1).bit_length()
    # the C interpreter writes straight into the final padded matrix
    m = np.zeros((n, L.CORE_WIDTH), dtype=np.uint64)
    rc_out = np.zeros(max(4 * n_ops, 4), dtype=np.uint64)
    stack_cap = 32 + n_ops
    stack_buf = np.zeros(stack_cap, dtype=np.uint64)
    ovf_buf = np.zeros(stack_cap, dtype=np.uint64)
    final_stack = np.zeros(16, dtype=np.uint64)
    n_rc = np.zeros(1, dtype=np.int64)
    final_depth = np.zeros(1, dtype=np.int64)
    final_clk = np.zeros(1, dtype=np.uint64)

    lib = trace_gen_lib()
    u64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    rows = lib.run_basic_block(
        u64p(groups), i64p(n_groups), n_batches,
        i64p(batch_of_op), u64p(codes), i64p(kinds),
        u64p(params), u64p(imms), u64p(has_imm),
        n_ops, u64p(stack_init), u64p(digest),
        u64p(m), n, u64p(rc_out), i64p(n_rc),
        u64p(stack_buf), u64p(ovf_buf), stack_cap,
        u64p(final_stack), i64p(final_depth), u64p(final_clk),
    )
    if rows < 0:
        raise ExecutionError(f"native execution failed (code {rows})")
    assert int(rows) == n_real
    if int(final_depth[0]) != L.MIN_STACK_DEPTH:
        raise ExecutionError(
            f"program must end with stack depth 16, got {int(final_depth[0])}"
        )

    program_hash = program.forest[program.entrypoint].digest

    # chiplets trace: the hasher chiplet recomputes the basic-block hash
    from . import chiplets as CH

    hasher_requests = [
        ("basic_block", 1, [list(node.batches[i].groups) for i in range(n_batches)])
    ]
    chiplets, poseidon, mem_range = CH.build_chiplets_trace(
        hasher_requests, [], [], program.kernel_digests, [], []
    )

    requests = [int(v) for v in rc_out[: int(n_rc[0])]] + list(mem_range)
    rc_rows = _range_checker_rows(requests)

    target = max(n_real + 1, L.MIN_TRACE_LEN, len(rc_rows))
    if target > n:  # rare: range-checker rows outgrew the op rows
        n2 = 1 << (target - 1).bit_length()
        m2 = np.zeros((n2, L.CORE_WIDTH), dtype=np.uint64)
        m2[:n_real] = m[:n_real]
        m, n = m2, n2

    # HALT padding (vectorized): program hash in h0..h3, final stack copied
    # forward, clk keeps incrementing.
    halt = OPCODES["HALT"]
    pad = np.zeros(L.CORE_WIDTH, dtype=np.uint64)
    bits = [(halt >> i) & 1 for i in range(7)]
    for i, b in enumerate(bits):
        pad[L.OP_BITS[i]] = b
    for i in range(4):
        pad[L.HASHER[i]] = program_hash[i]
    pad[L.EXTRA[0]] = bits[6] & (1 - bits[5]) & bits[4]
    pad[L.EXTRA[1]] = bits[6] & bits[5]
    for i in range(16):
        pad[L.STACK_TOP[i]] = final_stack[i]
    pad[L.B0] = L.MIN_STACK_DEPTH
    m[n_real:] = pad
    m[n_real:, L.CLK] = np.arange(n_real, n, dtype=np.uint64)

    # h0 = 1/(b0 - 16): depths are small, invert distinct values once
    depths = m[:, L.B0].astype(np.int64) - 16
    inv_cache = {0: 0}
    uniq = np.unique(depths)
    for d in uniq:
        d = int(d)
        if d not in inv_cache:
            inv_cache[d] = pow(d % P, P - 2, P)
    lut = np.zeros(int(uniq.max()) + 1, dtype=np.uint64)
    for d in uniq:
        lut[int(d)] = inv_cache[int(d)]
    m[:, L.H0] = lut[depths]

    # range-checker columns: bottom-aligned exactly like the Python builder
    # (zero padding rows first, then the table — reference
    # trace/range/mod.rs:82 write_range_into_core)
    vals = np.zeros(n, dtype=np.uint64)
    mults = np.zeros(n, dtype=np.uint64)
    pad_rows = n - len(rc_rows)
    for i, (v, mult) in enumerate(rc_rows):
        vals[pad_rows + i] = v
        mults[pad_rows + i] = mult
    m[:, L.RC_VALUE] = vals
    m[:, L.RC_MULT] = mults

    stack_out = [int(v) for v in final_stack]
    trace = CoreTrace(
        matrix=m,
        chiplets=chiplets,
        poseidon=poseidon,
        num_real_rows=n_real,
        program_hash=program_hash,
        stack_inputs=[int(v) for v in stack_init],
        stack_outputs=stack_out,
        kernel_digests=tuple(program.kernel_digests),
        hasher_requests=hasher_requests,
        range_values=requests,
    )
    output = ExecutionOutput(
        stack=stack_out,
        advice=AdviceProvider(),
        memory={},
        clk=int(final_clk[0]),
    )
    return output, trace
