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

State layout — the third generation, "lane planes": the caller's ``(12, n)``
lane-major state is reshaped to ``(12, 8, n/8)`` so each of the 12 state
lanes becomes a full ``(8, B)`` tile of *batch* elements — exactly the
native (sublane, lane) vreg shape. Every elementwise op then runs at 100%
vreg occupancy, and the external MDS matrix becomes *static Python
indexing* over the 12 plane arrays (pure adds/doublings — no sublane
rolls, no boundary selects, no masks). The internal-round S-box touches
only state lane 0, so it costs 1/12 of a full-state S-box — the earlier
generations S-boxed all 12 lanes and masked 11 away (measured ~3× kernel
speedup over the second-generation (12, blk) rotation kernel).

Round loops run under ``lax.fori_loop`` with their round constants as
dynamically-indexed SMEM scalars — one traced external body + one internal
body instead of 30 unrolled rounds. Client-side tracing of this kernel is
the dominant first-run cost of the whole prover (each enclosing jit
re-traces it per batch shape), so traced-op count matters as much as
runtime: generation one (12 unrolled ``(1, blk)`` rows × 30 unrolled
rounds) traced ~150k ops and cost ~70 s per call site.

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

from ..field.goldilocks import Fp, fp_add, fp_double, fp_mul
from . import constants as C

# batch columns per kernel invocation: a (12, 8, BLOCK_COLS) block holds
# 8 * BLOCK_COLS permutation states
BLOCK_COLS = 512

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
)  # (8, 12); transposed to (12, 8) at the call
_INT_LO, _INT_HI = _split_limbs(C.ARK_INT)  # (22,)
_DIAG_LO, _DIAG_HI = _split_limbs(C.MAT_DIAG)  # (12,)


def _sbox(x: Fp) -> Fp:
    x2 = fp_mul(x, x)
    x4 = fp_mul(x2, x2)
    x3 = fp_mul(x2, x)
    return fp_mul(x4, x3)


def _mds_external(s: list) -> list:
    """M_E on 12 lane planes: M4 = circ(2,3,1,1) within each 4-chunk, then
    cross-chunk per-position sums. Row identity (shared subexpressions):
    ``y_r = (x0+x1+x2+x3) + x_r + 2·x_{(r+1)%4}`` per chunk."""
    dbl = [fp_double(x) for x in s]
    out = []
    for c in range(3):
        x = s[4 * c : 4 * c + 4]
        d = dbl[4 * c : 4 * c + 4]
        total = fp_add(fp_add(x[0], x[1]), fp_add(x[2], x[3]))
        for r in range(4):
            out.append(fp_add(total, fp_add(x[r], d[(r + 1) % 4])))
    sums = [
        fp_add(fp_add(out[r], out[4 + r]), out[8 + r]) for r in range(4)
    ]
    return [fp_add(out[i], sums[i % 4]) for i in range(12)]


def _sum12(s: list) -> Fp:
    t = [fp_add(s[i], s[i + 6]) for i in range(6)]
    u = [fp_add(t[i], t[i + 3]) for i in range(3)]
    return fp_add(fp_add(u[0], u[1]), u[2])


def _permute_kernel(el_ref, eh_ref, il_ref, ih_ref, dl_ref, dh_ref,
                    lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    """All 30 rounds on 12 (8, B) lane planes.

    The (12, blk) VMEM block is reshaped to lane planes INSIDE the
    kernel: a host-level reshape changes the (8, 128) tiling of the HBM
    arrays, so XLA materialized full relayout copies of every state
    array around each permute call — gigabytes of extra executable
    temp space per commit phase at 2^20 (the per-process accumulation
    of those reservations exhausted the chip).

    ``el/eh``: (12, 8) external round constant limbs (SMEM; column r =
    round r); ``il/ih``: (1, 22) internal round constants (lane-0 only);
    ``dl/dh``: (12, 1) internal diagonal. All scalars, dynamically indexed
    by the round loops."""
    blk8 = lo_ref.shape[1] // 8
    lo3 = lo_ref[:].reshape(12, 8, blk8)
    hi3 = hi_ref[:].reshape(12, 8, blk8)
    s = tuple(Fp(lo3[i], hi3[i]) for i in range(12))
    diag = [Fp(dl_ref[i, 0], dh_ref[i, 0]) for i in range(12)]

    def ext_body(r, cur):
        boxed = [
            _sbox(fp_add(x, Fp(el_ref[i, r], eh_ref[i, r])))
            for i, x in enumerate(cur)
        ]
        return tuple(_mds_external(boxed))

    def int_body(r, cur):
        cur = list(cur)
        cur[0] = _sbox(fp_add(cur[0], Fp(il_ref[0, r], ih_ref[0, r])))
        total = _sum12(cur)
        return tuple(
            fp_add(total, fp_mul(x, d)) for x, d in zip(cur, diag)
        )

    s = tuple(_mds_external(list(s)))
    s = jax.lax.fori_loop(0, 4, ext_body, s)
    s = jax.lax.fori_loop(0, _N_INT, int_body, s)
    s = jax.lax.fori_loop(4, 8, ext_body, s)
    out_lo_ref[:] = jnp.stack([x.lo for x in s]).reshape(12, 8 * blk8)
    out_hi_ref[:] = jnp.stack([x.hi for x in s]).reshape(12, 8 * blk8)


@functools.partial(jax.jit, static_argnums=(1,))
def permute_pallas(state: Fp, block: int = 8 * BLOCK_COLS) -> Fp:
    """Batched permutation on ``(12, n)`` states; n a power-of-two multiple
    of 8 (smaller batches shrink the block). The lane-plane view happens
    inside the kernel — inputs/outputs keep the caller's (12, n) layout
    so no HBM relayout copies are materialized around the call."""
    n = state.shape[-1]
    assert n % 1024 == 0, "plane layout needs 128-lane planes (n % 1024 == 0)"
    if n < block:
        block = max(1024, n)
    grid = (n // block,)
    spec = pl.BlockSpec(
        (12, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    def sspec(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.SMEM,
        )

    out_shape = jax.ShapeDtypeStruct((12, n), jnp.uint32)
    lo, hi = pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[
            sspec((12, 8)), sspec((12, 8)),
            sspec((1, _N_INT)), sspec((1, _N_INT)),
            sspec((12, 1)), sspec((12, 1)),
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
