"""Poseidon2 permutation as a Pallas TPU kernel.

The jnp implementation (:mod:`poseidon2`) stages every round through HBM —
30 rounds × (12, n) × 2 limbs of traffic. This kernel tiles the batch into
VMEM blocks and unrolls all 30 rounds with every intermediate resident in
VMEM/vector registers, so HBM sees one read of the input block and one
write of the output block.

Only the raw permutation is a kernel: the sponge/Merkle choreography
around it stays in XLA (measured: an in-kernel absorb ``fori_loop`` was
3× slower than XLA scan + this kernel — loop-carried VMEM state defeats
Mosaic's vectorizer, while inter-permutation HBM traffic is negligible).

State layout: ``(12, n)`` lane-major, limbs as two uint32 arrays (the same
packed representation as :mod:`miden_tpu.field.goldilocks`). The kernel works
on 12 row vectors of shape (1, blk) — no sublane reshapes or gathers, which
Mosaic cannot lower — and reuses the exact limb arithmetic from
``goldilocks`` so bit-exactness with the jnp path is inherited. Round
constants arrive as an SMEM input (Pallas kernels cannot close over device
arrays). Reference semantics:
crates/crypto/src/hash/algebraic_sponge/poseidon2/mod.rs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.goldilocks import Fp, fp_add, fp_double, fp_mul
from . import constants as C

# batch lanes per kernel invocation (grid dimension tiles the batch)
BLOCK = 2048

# On CPU backends (the virtual test mesh) Mosaic cannot compile; run the
# kernels through the Pallas interpreter so the same code path stays
# covered by the CPU test suite.
_INTERPRET = jax.default_backend() == "cpu"


def _call(kernel, **kwargs):
    return pl.pallas_call(kernel, interpret=_INTERPRET, **kwargs)

_N_INT = C.NUM_INTERNAL_ROUNDS  # 22


# Constant table rows: 0..3 initial external, 4..25 internal (col 0),
# 26..29 terminal external, 30 = MAT_DIAG. Shape (31, 12) per limb.
def _const_table() -> tuple[np.ndarray, np.ndarray]:
    rows = []
    for r in range(4):
        rows.append(C.ARK_EXT_INITIAL[r * 12 : r * 12 + 12])
    for r in range(_N_INT):
        rows.append([C.ARK_INT[r]] + [0] * 11)
    for r in range(4):
        rows.append(C.ARK_EXT_TERMINAL[r * 12 : r * 12 + 12])
    rows.append(list(C.MAT_DIAG))
    arr = np.asarray(rows, dtype=np.uint64)
    return (
        (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (arr >> np.uint64(32)).astype(np.uint32),
    )


_TBL_LO, _TBL_HI = _const_table()

_M4 = ((2, 3, 1, 1), (1, 2, 3, 1), (1, 1, 2, 3), (3, 1, 1, 2))


def _sbox(x: Fp) -> Fp:
    x2 = fp_mul(x, x)
    x4 = fp_mul(x2, x2)
    x3 = fp_mul(x2, x)
    return fp_mul(x4, x3)


def _mul_small(x: Fp, k: int) -> Fp:
    if k == 1:
        return x
    if k == 2:
        return fp_double(x)
    assert k == 3
    return fp_add(fp_double(x), x)


def _mds_external_rows(s: list) -> list:
    """M_E on 12 row vectors: M4 within each 4-chunk + cross-chunk sums."""
    out = [None] * 12
    for b in (0, 4, 8):
        for r in range(4):
            acc = _mul_small(s[b + 0], _M4[r][0])
            for j in range(1, 4):
                acc = fp_add(acc, _mul_small(s[b + j], _M4[r][j]))
            out[b + r] = acc
    sums = [fp_add(fp_add(out[l], out[4 + l]), out[8 + l]) for l in range(4)]
    return [fp_add(out[i], sums[i & 3]) for i in range(12)]


def _sum_rows(s: list) -> Fp:
    acc = [fp_add(s[i], s[6 + i]) for i in range(6)]
    acc = [fp_add(acc[i], acc[3 + i]) for i in range(3)]
    return fp_add(fp_add(acc[0], acc[1]), acc[2])


def _permute_rows(s: list, kconst) -> list:
    """All 30 rounds on 12 (1, blk) Fp rows. ``kconst(row, lane) -> Fp``
    yields the scalar constant at table position (row, lane)."""

    def ext_round(cur, row):
        cur = [_sbox(fp_add(cur[i], kconst(row, i))) for i in range(12)]
        return _mds_external_rows(cur)

    diag = [kconst(30, i) for i in range(12)]
    s = _mds_external_rows(s)
    for r in range(4):
        s = ext_round(s, r)
    for r in range(_N_INT):
        s0 = _sbox(fp_add(s[0], kconst(4 + r, 0)))
        s = [s0] + s[1:]
        total = _sum_rows(s)
        s = [fp_add(total, fp_mul(s[i], diag[i])) for i in range(12)]
    for r in range(4):
        s = ext_round(s, 26 + r)
    return s


def _permute_kernel(tbl_lo_ref, tbl_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    def kconst(row: int, lane: int) -> Fp:
        return Fp(tbl_lo_ref[row, lane], tbl_hi_ref[row, lane])

    s = [
        Fp(lo_ref[i : i + 1, :], hi_ref[i : i + 1, :]) for i in range(12)
    ]
    s = _permute_rows(s, kconst)
    for i in range(12):
        out_lo_ref[i : i + 1, :] = s[i].lo
        out_hi_ref[i : i + 1, :] = s[i].hi


@functools.partial(jax.jit, static_argnums=(1,))
def permute_pallas(state: Fp, block: int = BLOCK) -> Fp:
    """Batched permutation on ``(12, n)`` states; n must be a multiple of
    the block size (power-of-two batches are — smaller ones shrink it)."""
    n = state.shape[-1]
    if n < block:
        block = max(128, n)
    grid = (n // block,)
    spec = pl.BlockSpec((12, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((12, n), jnp.uint32)
    lo, hi = _call(
        _permute_kernel,
        grid=grid,
        in_specs=[tbl_spec, tbl_spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
    )(jnp.asarray(_TBL_LO), jnp.asarray(_TBL_HI), state.lo, state.hi)
    return Fp(lo, hi)
