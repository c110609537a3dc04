"""Row-sharded Goldilocks NTT / coset LDE over a device mesh.

Decomposition: with ``D`` devices and contiguous row shards, a DIF
butterfly stage over blocks of size ``m`` is cross-shard iff ``m/2`` is at
least the shard size — i.e. exactly the first ``log2 D`` stages (for DIT,
the last ``log2 D``). Those stages exchange whole shards pairwise over ICI
(``ppermute``); every other stage — and the bit-reversed zero-pad of the
LDE, which is shard-local under contiguous sharding — reuses the
single-device kernels from :mod:`miden_tpu.ntt.ntt` unchanged, so
bit-exactness with the single-device path is structural.

Reference analog: p3-dft ``Radix2DitParallel`` under rayon
(crates/lifted-stark/src/prover/commit.rs:173); here parallelism is the
mesh row axis and the stage exchange is an explicit collective.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..field import gl
from ..field.goldilocks import Fp, fp_mul, fp_add, fp_sub, fp_powers
from ..ntt import ntt
from .mesh import ROWS, shard_rows


def _stage_table(log_n: int, s: int, inverse: bool) -> Fp:
    """Global (n,) table ``T[r] = ω_m^{r mod (m/2)}`` for stage ``s``
    (block size ``m = n >> s``); sharded rows give each device exactly the
    twiddle slice its bottom-half elements need."""
    log_m = log_n - s
    w = gl.two_adic_generator(log_m)
    if inverse:
        w = gl.inv(w)
    half = fp_powers(w, 1 << (log_m - 1))
    reps = (1 << log_n) // (1 << (log_m - 1))
    return Fp(jnp.tile(half.lo, reps), jnp.tile(half.hi, reps))


def _perm(d: int, mask: int):
    return [(i, i ^ mask) for i in range(d)]


def _xchg(x: Fp, mask: int, d: int) -> Fp:
    lo = jax.lax.ppermute(x.lo, ROWS, _perm(d, mask))
    hi = jax.lax.ppermute(x.hi, ROWS, _perm(d, mask))
    return Fp(lo, hi)


def _fp_where(c, a: Fp, b: Fp) -> Fp:
    return Fp(jnp.where(c, a.lo, b.lo), jnp.where(c, a.hi, b.hi))


def _dif_cross(x: Fp, tw: Fp, s: int, d: int) -> Fp:
    """One cross-shard DIF stage: top ← a+b, bottom ← (a−b)·T."""
    mask = d >> (s + 1)
    k = jax.lax.axis_index(ROWS)
    am_top = (k & mask) == 0
    other = _xchg(x, mask, d)
    top = fp_add(x, other)
    bot = fp_mul(fp_sub(other, x), Fp(tw.lo[:, None], tw.hi[:, None]))
    return _fp_where(am_top, top, bot)


def _dit_cross(x: Fp, tw: Fp, s: int, d: int) -> Fp:
    """One cross-shard DIT stage: bottom pre-multiplies by T, then
    top ← t+w, bottom ← t−w."""
    mask = d >> (s + 1)
    k = jax.lax.axis_index(ROWS)
    am_top = (k & mask) == 0
    pre = _fp_where(
        am_top, x, fp_mul(x, Fp(tw.lo[:, None], tw.hi[:, None]))
    )
    other = _xchg(pre, mask, d)
    return _fp_where(am_top, fp_add(pre, other), fp_sub(other, pre))


def coset_lde_sharded(
    evals: Fp, added_bits: int, shift_out: int, mesh, shift_in: int = 1
) -> Fp:
    """Sharded twin of :func:`miden_tpu.ntt.ntt.coset_lde`: natural-order
    evaluations over ``shift_in·H`` (rows sharded over ``mesh``) →
    natural-order evaluations over ``shift_out·K``, rows sharded.
    """
    n, batch = evals.shape
    log_n = n.bit_length() - 1
    d = mesh.devices.size
    log_d = d.bit_length() - 1
    assert n % d == 0 and n // d >= 2, "shard must hold ≥ 2 rows"
    big_n = n << added_bits
    eff = gl.mul(shift_out % gl.P, gl.inv(shift_in % gl.P)) if shift_in != 1 else shift_out % gl.P

    # Pre-warm the LOCAL stage twiddle caches OUTSIDE the shard_map region:
    # tables first built inside the Manual-mesh context would be cached
    # with that context's sharding type and poison every later Auto-context
    # user of the same size (Mesh "Auto vs Manual" errors).
    ntt._stage_twiddles(log_n - log_d, True)
    ntt._stage_twiddles(log_n + added_bits - log_d, False)

    # tables (global, row-sharded)
    inv_tabs = [
        shard_rows(_stage_table(log_n, s, True), mesh) for s in range(log_d)
    ]
    fwd_tabs = [
        shard_rows(_stage_table(log_n + added_bits, s, False), mesh)
        for s in range(log_d)
    ]
    eff_tab = (
        shard_rows(ntt.shift_powers(eff, big_n, bitrev=True), mesh)
        if eff != 1
        else None
    )
    inv_n = gl.inv(n % gl.P)
    x = shard_rows(evals, mesh) if not _is_sharded(evals) else evals

    spec1 = P(ROWS)
    spec2 = P(ROWS, None)

    @partial(jax.jit, static_argnums=())
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            spec2,
            tuple([spec1] * log_d),
            tuple([spec1] * log_d),
            (spec1 if eff_tab is not None else P()),
        ),
        out_specs=spec2,
    )
    def run(x_l: Fp, inv_t, fwd_t, eff_t):
        # 1. interpolate: cross inverse-DIF stages, then local stages
        for s in range(log_d):
            x_l = _dif_cross(x_l, inv_t[s], s, d)
        x_l = ntt.dft_dif(x_l, inverse=True)
        x_l = fp_mul(x_l, Fp(*[jnp.full_like(x_l.lo, v) for v in
                               ((inv_n & 0xFFFFFFFF), (inv_n >> 32))]))
        # 2. zero-pad in bit-reversed coefficient space (shard-local)
        x_l = ntt._pad_bitrev_coeffs(x_l, added_bits)
        # 3. coset shift in coefficient space
        if eff_t is not None:
            x_l = fp_mul(x_l, Fp(eff_t.lo[:, None], eff_t.hi[:, None]))
        # 4. evaluate: local DIT stages, then cross stages (reverse order)
        x_l = ntt.dft_dit(x_l)
        for s in reversed(range(log_d)):
            x_l = _dit_cross(x_l, fwd_t[s], s, d)
        return x_l

    dummy = Fp(jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32))
    return run(
        x,
        tuple(inv_tabs),
        tuple(fwd_tabs),
        eff_tab if eff_tab is not None else dummy,
    )


def _is_sharded(x: Fp) -> bool:
    try:
        return not x.lo.sharding.is_fully_replicated
    except AttributeError:
        return False
