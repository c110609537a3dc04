"""Poseidon2 permutation as a Pallas TPU kernel.

The jnp implementation (:mod:`poseidon2`) stages every round through HBM —
30 rounds × (12, n) × 2 limbs of traffic. This kernel tiles the batch into
VMEM blocks and runs all 30 rounds with every intermediate resident in
VMEM/vector registers, so HBM sees one read of the input block and one
write of the output block.

Only the raw permutation is a kernel: the sponge/Merkle choreography
around it stays in XLA (measured: an in-kernel absorb ``fori_loop`` was
3× slower than XLA scan + this kernel — loop-carried VMEM state defeats
Mosaic's vectorizer, while inter-permutation HBM traffic is negligible).

State layout: ``(12, n)`` lane-major, limbs as two uint32 arrays (the same
packed representation as :mod:`miden_tpu.field.goldilocks`). The 12 state
lanes live on the sublane axis and every round operates on the whole
``(12, blk)`` block at once — the external MDS is a circulant, expressed
as three chunk-local rotations (``pltpu.roll`` + boundary select), and the
internal-round row sum is a rotation tree. The first kernel generation
kept 12 separate ``(1, blk)`` rows and unrolled every lane of every round
in Python: ~150k traced ops per call site, which cost ~70 s of *client-side
tracing* per call site per process and bloated every enclosing jaxpr.
Internal rounds run under ``lax.fori_loop`` (one body compiled).

Bit-exactness with the jnp path is inherited from using the exact same
limb arithmetic (goldilocks fp_add/fp_mul) — field ops are exact, so
reassociation is value-preserving. Reference semantics:
crates/crypto/src/hash/algebraic_sponge/poseidon2/mod.rs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.goldilocks import Fp, fp_add, fp_double, fp_mul, fp_where
from . import constants as C

# batch lanes per kernel invocation (grid dimension tiles the batch)
BLOCK = 2048

# On CPU backends (the virtual test mesh) Mosaic cannot compile; run the
# kernels through the Pallas interpreter so the same code path stays
# covered by the CPU test suite.
_INTERPRET = jax.default_backend() == "cpu"

_N_INT = C.NUM_INTERNAL_ROUNDS  # 22


def _split_limbs(vals) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(vals, dtype=np.uint64)
    return (
        (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (arr >> np.uint64(32)).astype(np.uint32),
    )


_EXT_LO, _EXT_HI = _split_limbs(
    [C.ARK_EXT_INITIAL[r * 12 : r * 12 + 12] for r in range(4)]
    + [C.ARK_EXT_TERMINAL[r * 12 : r * 12 + 12] for r in range(4)]
)  # (8, 12)
_INT_LO, _INT_HI = _split_limbs(C.ARK_INT)  # (22,)
_DIAG_LO, _DIAG_HI = _split_limbs(C.MAT_DIAG)  # (12,)


def _sbox(x: Fp) -> Fp:
    x2 = fp_mul(x, x)
    x4 = fp_mul(x2, x2)
    x3 = fp_mul(x2, x)
    return fp_mul(x4, x3)


def _roll(s: Fp, k: int) -> Fp:
    """Cyclic rotation on the 12-lane sublane axis: out[i] = s[(i−k) % 12]."""
    return Fp(pltpu.roll(s.lo, k, axis=0), pltpu.roll(s.hi, k, axis=0))


def _mul_small(x: Fp, k: int) -> Fp:
    if k == 1:
        return x
    if k == 2:
        return fp_double(x)
    assert k == 3
    return fp_add(fp_double(x), x)


def _mds_external_v(s: Fp, pos4) -> Fp:
    """M_E on the whole (12, blk) state.

    M4 = circ(2,3,1,1) within each 4-chunk: out[b+r] = Σ_k c_k·s[b+(r+k)%4],
    where the chunk-local rotation by k is a global roll fixed up at chunk
    boundaries. Cross-chunk sums are the rotation identity
    sums[i] = out[i] + out[i−4] + out[i−8] (mod 12)."""

    def chunk_roll(k: int) -> Fp:
        a = _roll(s, 12 - k)  # out[i] = s[i+k mod 12]
        b = _roll(s, 4 - k)  # out[i] = s[i+k−4 mod 12]
        return fp_where(pos4 < (4 - k), a, b)

    c1 = chunk_roll(1)
    c2 = chunk_roll(2)
    c3 = chunk_roll(3)
    out = fp_add(
        fp_add(_mul_small(s, 2), _mul_small(c1, 3)), fp_add(c2, c3)
    )
    sums = fp_add(fp_add(out, _roll(out, 4)), _roll(out, 8))
    return fp_add(out, sums)


def _sum_rows_v(s: Fp) -> Fp:
    """(12, blk) → every lane holds Σ_i s[i] (rotation tree)."""
    t = fp_add(s, _roll(s, 6))  # offsets {0, 6}
    t = fp_add(t, _roll(t, 3))  # {0, 3, 6, 9}
    return fp_add(fp_add(t, _roll(t, 1)), _roll(t, 2))  # all 12


def _permute_block(s: Fp, pos4, lane0, ext: Fp, intc: Fp, diag: Fp) -> Fp:
    """All 30 rounds on a (12, blk) state block.

    ``ext``: (12, 8) external round constants (column r = round r);
    ``intc``: (1, 22) internal round constants (lane-0 additions);
    ``diag``: (12, 1) internal diagonal."""

    def ext_round(cur: Fp, r: int) -> Fp:
        rc = Fp(ext.lo[:, r : r + 1], ext.hi[:, r : r + 1])  # (12, 1)
        return _mds_external_v(_sbox(fp_add(cur, rc)), pos4)

    s = _mds_external_v(s, pos4)
    for r in range(4):
        s = ext_round(s, r)

    # unrolled with static constant indices: Mosaic has no dynamic_slice,
    # and 22 × ~80 traced ops is cheap
    for r in range(_N_INT):
        rc = Fp(intc.lo[0, r], intc.hi[0, r])  # scalar; lane 0 only
        boxed = _sbox(fp_add(s, rc))
        cur = fp_where(lane0, boxed, s)
        total = _sum_rows_v(cur)
        s = fp_add(total, fp_mul(cur, diag))

    for r in range(4, 8):
        s = ext_round(s, r)
    return s


def _permute_kernel(el_ref, eh_ref, il_ref, ih_ref, dl_ref, dh_ref,
                    lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    pos4 = jax.lax.broadcasted_iota(jnp.uint32, (12, 1), 0) % 4
    lane0 = jax.lax.broadcasted_iota(jnp.uint32, (12, 1), 0) == 0
    s = _permute_block(
        Fp(lo_ref[:], hi_ref[:]),
        pos4,
        lane0,
        Fp(el_ref[:], eh_ref[:]),
        Fp(il_ref[:], ih_ref[:]),
        Fp(dl_ref[:], dh_ref[:]),
    )
    out_lo_ref[:] = s.lo
    out_hi_ref[:] = s.hi


@functools.partial(jax.jit, static_argnums=(1,))
def permute_pallas(state: Fp, block: int = BLOCK) -> Fp:
    """Batched permutation on ``(12, n)`` states; n must be a multiple of
    the block size (power-of-two batches are — smaller ones shrink it)."""
    n = state.shape[-1]
    if n < block:
        block = max(128, n)
    grid = (n // block,)
    spec = pl.BlockSpec((12, block), lambda i: (0, i), memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out_shape = jax.ShapeDtypeStruct((12, n), jnp.uint32)
    lo, hi = pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[
            cspec((12, 8)), cspec((12, 8)),
            cspec((1, _N_INT)), cspec((1, _N_INT)),
            cspec((12, 1)), cspec((12, 1)),
            spec, spec,
        ],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=_INTERPRET,
    )(
        jnp.asarray(_EXT_LO.T), jnp.asarray(_EXT_HI.T),
        jnp.asarray(_INT_LO[None, :]), jnp.asarray(_INT_HI[None, :]),
        jnp.asarray(_DIAG_LO[:, None]), jnp.asarray(_DIAG_HI[:, None]),
        state.lo, state.hi,
    )
    return Fp(lo, hi)
