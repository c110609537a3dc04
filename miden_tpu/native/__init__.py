"""Native (C) runtime components.

The compute path of this framework is JAX/XLA on TPU; the host-side
runtime pieces the reference implements in Rust (fast interpreter +
trace builder, processor/src/fast/ + trace/parallel/) are implemented
here in C, compiled on first use and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None


def _build() -> str:
    src = os.path.join(_DIR, "trace_gen.c")
    out = os.path.join(_DIR, "_trace_gen.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        cc = os.environ.get("CC", "cc")
        subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", out, src],
            check=True,
            capture_output=True,
        )
    return out


def trace_gen_lib():
    """The compiled trace-generator library (built lazily, cached)."""
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.run_basic_block.restype = ctypes.c_int64
        lib.run_basic_block.argtypes = [
            u64p, i64p, ctypes.c_int64,           # groups, n_groups, n_batches
            i64p, u64p, i64p,                     # batch_of_op, op_code, op_kind
            u64p, u64p, u64p,                     # op_param, op_imm, op_has_imm
            ctypes.c_int64, u64p, u64p,           # n_ops, stack_init, digest
            u64p, ctypes.c_int64, u64p, i64p,     # out, cap_rows, rc_out, n_rc_out
            u64p, u64p, ctypes.c_int64,           # stack_buf, ovf_buf, stack_cap
            u64p, i64p, u64p,                     # final_stack, final_depth, final_clk
        ]
        lib.run_block_segment.restype = ctypes.c_int64
        lib.run_block_segment.argtypes = [
            u64p, i64p, ctypes.c_int64,           # groups, n_groups, n_batches
            i64p, u64p, i64p,                     # batch_of_op, op_code, op_kind
            u64p, u64p, u64p,                     # op_param, op_imm, op_has_imm
            ctypes.c_int64,                       # n_ops
            u64p, ctypes.c_int64, u64p,           # stack_init, depth0, ovf_clk_init
            ctypes.c_uint64, ctypes.c_uint64, u64p,  # clk0, ctx, fn_hash
            ctypes.c_uint64, ctypes.c_uint64,     # block_addr, parent_addr
            ctypes.c_int64, ctypes.c_int64, u64p,  # write_end, is_loop_body, digest
            u64p, ctypes.c_int64, u64p, i64p,     # out, cap_rows, rc_out, n_rc_out
            u64p, u64p, ctypes.c_int64,           # stack_buf, ovf_buf, stack_cap
            u64p, u64p, u64p, i64p, u64p,         # final 16/ovf/ovf_clk/depth/clk
        ]
        lib.p2_set_constants.restype = None
        lib.p2_set_constants.argtypes = [u64p, u64p, u64p, u64p]
        lib.p2_permute_batch.restype = None
        lib.p2_permute_batch.argtypes = [u64p, ctypes.c_int64]
        lib.p2_chain_basic_block.restype = None
        lib.p2_chain_basic_block.argtypes = [u64p, ctypes.c_int64, u64p, u64p]
        lib.p2_packed_rows.restype = None
        lib.p2_packed_rows.argtypes = [u64p, ctypes.c_int64, u64p, u64p]

        import numpy as np

        from ..hash import constants as C

        lib.p2_set_constants(
            *(
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
                for arr in (
                    np.asarray(C.ARK_EXT_INITIAL, dtype=np.uint64),
                    np.asarray(C.ARK_INT, dtype=np.uint64),
                    np.asarray(C.ARK_EXT_TERMINAL, dtype=np.uint64),
                    np.asarray(C.MAT_DIAG, dtype=np.uint64),
                )
            )
        )
        _LIB = lib
    return _LIB


def u64ptr(a):
    import ctypes as _ct

    return a.ctypes.data_as(_ct.POINTER(_ct.c_uint64))
