"""Pallas TPU kernels for the Goldilocks NTT.

The XLA stage-by-stage NTT (ntt.py) pays two structural taxes on TPU:

- **runtime**: every butterfly stage is a separate HBM round-trip
  (~log n passes over the whole array), and

- **compile time**: each stage unrolls to ~150 HLO ops of 32-bit limb
  arithmetic; the axon XLA service compiles these graphs at ~10² ops/s,
  so every distinct (size, batch) shape costs minutes.

This module replaces the transform with a **four-step decomposition**
(n = n1·n2, Bailey 1989 — also the layout of the sharded NTT in
dist/ntt_dist.py and of p3's Radix2DitParallel's cache-friendly split):

    DIF (natural → bit-reversed, matching ntt.dft_dif exactly):
      view x as (n1, n2):  A = DIF_n1 along axis 0  (columns)
      B[r1, j2] = A[r1, j2] · ω_n^{rev_n1(r1)·j2}   (twiddle table T)
      C = DIF_n2 along axis 1 (via transpose + column kernel)
      flat C (row-major) IS the full-size bit-reversed output, because
      rev_n(k1 + n1·k2) = rev_n1(k1)·n2 + rev_n2(k2).

    DIT (bit-reversed → natural) is the mirror: DIT_n2 along axis 1,
    the SAME twiddle table, DIT_n1 along axis 0.

Each sub-transform runs ALL its stages inside one Pallas kernel with the
block resident in VMEM — one HBM round-trip per sub-transform, and one
Mosaic compilation per (log_size, tile) reused by every call site in the
prover. The kernel uses the classic **in-place** butterfly form (pairs
``(p, p ^ half)`` selected by lane masks, implemented with ``pltpu.roll``)
so every stage reads and writes the same fixed-shape block — the
functional stacked-reshape form stack-allocated every stage's temporaries
and blew the 16 MB VMEM budget. Results are written back to the output
ref between stages to bound liveness.

Equivalence with the pure-XLA path is pinned (interpret mode on CPU) by
tests/test_ntt_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..field.goldilocks import (
    Fp,
    fp_add,
    fp_broadcast_to,
    fp_from_u64,
    fp_mul,
    fp_sub,
    fp_where,
)

MAX_LOG_SINGLE = 10  # largest sub-transform done in one kernel: Mosaic
# stack-allocates ~3 stages of butterfly temporaries, and a (2^11, 128)
# block put the scoped VMEM usage at ~24 MB vs the 16 MB budget
_TILE = 128  # columns per kernel instance


def _is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)


# ---------------------------------------------------------------------------
# Twiddle tables
# ---------------------------------------------------------------------------

_STAGE_TW: dict = {}  # (log_n, inverse) -> np (log_n, n) u64, T[s,p]
_OUTER_TW: dict = {}  # (log_n1, log_n2, inverse) -> Fp (n1, n2)


def _stage_tw_table(log_n: int, inverse: bool) -> np.ndarray:
    """Full per-stage twiddle rows: T[s, p] = ω_m^{p & (m/2 − 1)} with
    m = n >> s (don't-care at top-half lanes) — indexable with fixed shape
    inside the kernel."""
    key = (log_n, inverse)
    if key not in _STAGE_TW:
        n = 1 << log_n
        out = np.empty((log_n, n), dtype=np.uint64)
        p_idx = np.arange(n)
        for s in range(log_n):
            m = n >> s
            half = m // 2
            w = gl.two_adic_generator(log_n - s)
            if inverse:
                w = gl.inv(w)
            pows = np.empty(half, dtype=np.uint64)
            acc = 1
            for i in range(half):
                pows[i] = acc
                acc = gl.mul(acc, w)
            out[s] = pows[p_idx & (half - 1)]
        _STAGE_TW[key] = out
    return _STAGE_TW[key]


def _bitrev_indices(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def outer_twiddles(log_n1: int, log_n2: int, inverse: bool) -> Fp:
    """T[r1, j2] = ω_n^{rev_n1(r1)·j2} (ω → ω⁻¹ when inverse), n = n1·n2.

    Built on device: row seeds ω^{rev(r1)} then log(n2) masked multiplies
    (a vectorized fp_powers with per-row bases)."""
    key = (log_n1, log_n2, inverse)
    if key in _OUTER_TW:
        return _OUTER_TW[key]
    n1, n2 = 1 << log_n1, 1 << log_n2
    w = gl.two_adic_generator(log_n1 + log_n2)
    if inverse:
        w = gl.inv(w)
    rev = _bitrev_indices(n1)
    acc = 1
    pows = np.empty(n1, dtype=np.uint64)
    for i in range(n1):
        pows[i] = acc
        acc = gl.mul(acc, w)
    seeds_host = pows[rev]

    with jax.ensure_compile_time_eval():  # build eagerly even under trace
        seeds = fp_from_u64(seeds_host)
        idx = jnp.arange(n2, dtype=jnp.uint32)
        bits = jnp.arange(max(1, log_n2), dtype=jnp.uint32)

        def step(carry, bit):
            acc, b = carry  # acc (n1, n2), b (n1,)
            bb = Fp(b.lo[:, None], b.hi[:, None])
            stepped = fp_mul(acc, fp_broadcast_to(bb, acc.shape))
            use = ((idx[None, :] >> bit) & 1).astype(bool)
            return (fp_where(use, stepped, acc), fp_mul(b, b)), None

        ones = Fp(
            jnp.ones((n1, n2), jnp.uint32), jnp.zeros((n1, n2), jnp.uint32)
        )
        (out, _), _ = jax.lax.scan(step, (ones, seeds), bits)
    if not _is_tracer(out.lo):
        _OUTER_TW[key] = out
    return out


# ---------------------------------------------------------------------------
# Column-transform kernel (all stages in VMEM, in-place butterflies)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _col_transform(log_n: int, dit: bool, interpret: bool, x_lo, x_hi, tw_lo, tw_hi):
    """Pallas dispatch: transform axis 0 of (n, M) in (n, TILE) column
    blocks, all stages in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m_cols = x_lo.shape
    assert n == 1 << log_n
    tile = min(_TILE, m_cols)

    def kernel(tl_ref, th_ref, xl_ref, xh_ref, ol_ref, oh_ref):
        ol_ref[:] = xl_ref[:]
        oh_ref[:] = xh_ref[:]
        pos = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
        stages = reversed(range(log_n)) if dit else range(log_n)
        for s in stages:
            m = n >> s
            half = m // 2
            x = Fp(ol_ref[:], oh_ref[:])
            tw = Fp(tl_ref[s][:, None], th_ref[s][:, None])
            first = (pos & jnp.uint32(half)) == 0  # (n, 1) mask
            # pltpu.roll requires non-negative shifts; roll by n−half ≡ −half
            down_lo = pltpu.roll(x.lo, n - half, axis=0)  # x[p + half]
            down_hi = pltpu.roll(x.hi, n - half, axis=0)
            up_lo = pltpu.roll(x.lo, half, axis=0)  # x[p - half]
            up_hi = pltpu.roll(x.hi, half, axis=0)
            down = Fp(down_lo, down_hi)
            up = Fp(up_lo, up_hi)
            if dit:
                # top: a + w·b (b = x[p+half]); bottom: a − w·b, where for
                # bottom lanes a = x[p−half], b = x[p]
                top = fp_add(x, fp_mul(down, tw))
                bot = fp_sub(up, fp_mul(x, tw))
            else:
                # top: a + b; bottom: (a − b)·w with a = x[p−half], b = x[p]
                top = fp_add(x, down)
                bot = fp_mul(fp_sub(up, x), tw)
            y = fp_where(first, top, bot)
            ol_ref[:] = y.lo
            oh_ref[:] = y.hi

    grid = (m_cols // tile,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((log_n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((log_n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m_cols), jnp.uint32),
            jax.ShapeDtypeStruct((n, m_cols), jnp.uint32),
        ],
        interpret=interpret,
    )(tw_lo, tw_hi, x_lo, x_hi)
    return out


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def col_transform(x: Fp, inverse: bool, dit: bool) -> Fp:
    """Transform along axis 0 of an (n, M) Fp array (n ≤ 2^MAX_LOG_SINGLE):
    DIF (natural → bitrev) or DIT (bitrev → natural), forward or inverse
    twiddles. Pads M to the tile size when needed."""
    n, m_cols = x.shape
    log_n = n.bit_length() - 1
    assert n == 1 << log_n and log_n <= MAX_LOG_SINGLE
    if log_n == 0:
        return x
    tw = fp_from_u64(_stage_tw_table(log_n, inverse))
    tile = min(_TILE, max(1, m_cols))
    pad = (-m_cols) % tile
    lo, hi = x.lo, x.hi
    if pad:
        lo = jnp.pad(lo, [(0, 0), (0, pad)])
        hi = jnp.pad(hi, [(0, 0), (0, pad)])
    out_lo, out_hi = _col_transform(
        log_n, dit, _interpret(), lo, hi, tw.lo, tw.hi
    )
    if pad:
        out_lo = out_lo[:, :m_cols]
        out_hi = out_hi[:, :m_cols]
    return Fp(out_lo, out_hi)


# ---------------------------------------------------------------------------
# Full-size transforms (four-step, recursive)
# ---------------------------------------------------------------------------


def _split(log_n: int):
    log_n1 = min(MAX_LOG_SINGLE, (log_n + 1) // 2)
    return log_n1, log_n - log_n1


def _twiddle_mul(x: Fp, t: Fp) -> Fp:
    """x (n1, n2, w) · T (n1, n2) broadcast over w."""
    tb = Fp(t.lo[:, :, None], t.hi[:, :, None])
    return fp_mul(x, fp_broadcast_to(tb, x.shape))


def dft_dif(x: Fp, inverse: bool = False) -> Fp:
    """Pallas four-step DIF: natural input → bit-reversed output along
    axis 0 of (n, w) (bit-exact twin of ntt.dft_dif)."""
    n, w = x.shape
    log_n = n.bit_length() - 1
    if log_n <= MAX_LOG_SINGLE:
        return col_transform(x, inverse, dit=False)
    log_n1, log_n2 = _split(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    # step A: DIF_n1 over axis 0 of (n1, n2·w)  (recursive if n1 too big)
    a = dft_dif(x.reshape(n1, n2 * w), inverse)
    # step B: twiddle
    b = _twiddle_mul(a.reshape(n1, n2, w), outer_twiddles(log_n1, log_n2, inverse))
    # step C: DIF_n2 along axis 1 → transpose to put it on axis 0
    bt = Fp(jnp.swapaxes(b.lo, 0, 1), jnp.swapaxes(b.hi, 0, 1))  # (n2, n1, w)
    c = dft_dif(bt.reshape(n2, n1 * w), inverse).reshape(n2, n1, w)
    out = Fp(jnp.swapaxes(c.lo, 0, 1), jnp.swapaxes(c.hi, 0, 1))  # (n1, n2, w)
    return out.reshape(n, w)


def dft_dit(x: Fp, inverse: bool = False) -> Fp:
    """Pallas four-step DIT: bit-reversed input → natural output along
    axis 0 of (n, w) (bit-exact twin of ntt.dft_dit)."""
    n, w = x.shape
    log_n = n.bit_length() - 1
    if log_n <= MAX_LOG_SINGLE:
        return col_transform(x, inverse, dit=True)
    log_n1, log_n2 = _split(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    g = x.reshape(n1, n2, w)
    # step A: DIT_n2 along axis 1 (input bitrev there)
    gt = Fp(jnp.swapaxes(g.lo, 0, 1), jnp.swapaxes(g.hi, 0, 1))  # (n2, n1, w)
    d = dft_dit(gt.reshape(n2, n1 * w), inverse).reshape(n2, n1, w)
    dt = Fp(jnp.swapaxes(d.lo, 0, 1), jnp.swapaxes(d.hi, 0, 1))  # (n1, n2, w)
    # step B: same twiddle table
    e = _twiddle_mul(dt, outer_twiddles(log_n1, log_n2, inverse))
    # step C: DIT_n1 along axis 0
    out = dft_dit(e.reshape(n1, n2 * w), inverse)
    return out.reshape(n, w)
