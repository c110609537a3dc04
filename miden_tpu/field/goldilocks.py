"""Goldilocks field arithmetic on TPU as packed 32-bit limb ops (JAX).

TPU vector units have no native 64-bit integer multiply, so a field element
``a < p = 2^64 - 2^32 + 1`` is represented as a pair of ``uint32`` arrays
``(lo, hi)`` with ``a = lo + 2^32 * hi`` (struct-of-arrays). All operations are
elementwise over arbitrary leading shapes and stay inside ``uint32``
arithmetic: 32x32 -> 64 products are built from four 16x16 products, and the
Goldilocks reduction uses ``2^64 ≡ 2^32 - 1 (mod p)``.

This is the TPU-native replacement for the reference's ``Felt``/``PackedFelt``
(crates/field/src/native/mod.rs:58, crates/field/src/lib.rs:20-28): where the
Rust build packs AVX2/NEON lanes, here whole traces are field-element arrays
and XLA fuses the limb ops across the VPU.

All values are kept **canonical** (``< p``) at function boundaries, which is
required because field elements feed order-sensitive hashing (Poseidon2) and
transcript serialization.

The quadratic extension ``Fp2 = F[x]/(x^2 - 7)`` mirrors the reference's
``QuadFelt = BinomialExtensionField<Felt, 2>`` (core/src/lib.rs:30).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import gl

U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)
_EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 == 2^64 mod p
_P_LO = np.uint32(0x00000001)
_P_HI = np.uint32(0xFFFFFFFF)


def _u32(x):
    return x.astype(U32)


# ---------------------------------------------------------------------------
# Fp: base field element arrays
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Fp:
    """An array of Goldilocks elements: ``value = lo + 2^32 * hi``, canonical."""

    lo: jax.Array
    hi: jax.Array

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.lo, self.hi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- convenience --------------------------------------------------------
    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __getitem__(self, idx) -> "Fp":
        return Fp(self.lo[idx], self.hi[idx])

    def reshape(self, *shape) -> "Fp":
        return Fp(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def astype_u64(self) -> jax.Array:
        """Lossless read-back as uint64 (CPU/testing only)."""
        return self.lo.astype(jnp.uint64) | (self.hi.astype(jnp.uint64) << 32)


def fp_from_u64(values) -> Fp:
    """Build an Fp array from numpy uint64 / Python-int values (host-side)."""
    arr = np.asarray(values, dtype=np.uint64)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return Fp(jnp.asarray(lo), jnp.asarray(hi))


def fp_to_u64(x: Fp) -> np.ndarray:
    """Read back an Fp array to numpy uint64 (host-side)."""
    lo = np.asarray(jax.device_get(x.lo)).astype(np.uint64)
    hi = np.asarray(jax.device_get(x.hi)).astype(np.uint64)
    return lo | (hi << np.uint64(32))


def fp_zeros(shape) -> Fp:
    z = jnp.zeros(shape, dtype=U32)
    return Fp(z, z)


def fp_ones(shape) -> Fp:
    return Fp(jnp.ones(shape, dtype=U32), jnp.zeros(shape, dtype=U32))


def fp_const(value: int, shape=()) -> Fp:
    value %= gl.P
    lo = jnp.full(shape, np.uint32(value & 0xFFFFFFFF), dtype=U32)
    hi = jnp.full(shape, np.uint32(value >> 32), dtype=U32)
    return Fp(lo, hi)


def fp_broadcast_to(x: Fp, shape) -> Fp:
    return Fp(jnp.broadcast_to(x.lo, shape), jnp.broadcast_to(x.hi, shape))


def fp_concat(xs: Sequence[Fp], axis=0) -> Fp:
    return Fp(
        jnp.concatenate([x.lo for x in xs], axis=axis),
        jnp.concatenate([x.hi for x in xs], axis=axis),
    )


def fp_stack(xs: Sequence[Fp], axis=0) -> Fp:
    return Fp(
        jnp.stack([x.lo for x in xs], axis=axis),
        jnp.stack([x.hi for x in xs], axis=axis),
    )


def fp_where(cond, a: Fp, b: Fp) -> Fp:
    return Fp(jnp.where(cond, a.lo, b.lo), jnp.where(cond, a.hi, b.hi))


def fp_equal(a: Fp, b: Fp) -> jax.Array:
    return (a.lo == b.lo) & (a.hi == b.hi)


# ---------------------------------------------------------------------------
# 64-bit limb helpers (uint32 pairs, plain modular-2^64 semantics)
# ---------------------------------------------------------------------------


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out. carry trick: x = a+b wraps iff x < b."""
    lo = alo + blo
    c = _u32(lo < blo)
    hi = ahi + bhi + c
    # carry-out of the high limb: hi < bhi would miss the +c case; compute in
    # two steps so each add's carry is observable.
    h1 = ahi + bhi
    c1 = _u32(h1 < bhi)
    h2 = h1 + c
    c2 = _u32(h2 < c)
    return lo, h2, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out."""
    lo = alo - blo
    b0 = _u32(alo < blo)
    h1 = ahi - bhi
    b1 = _u32(ahi < bhi)
    hi = h1 - b0
    b2 = _u32(h1 < b0)
    return lo, hi, b1 | b2


def _mul32_wide(a, b):
    """Full 32x32 -> 64 product from four 16x16 products (all uint32)."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    carry_mid = _u32(mid < p10)
    lo = p00 + (mid << 16)
    carry_lo = _u32(lo < p00)
    hi = p11 + (mid >> 16) + (carry_mid << 16) + carry_lo
    return lo, hi


def _geq_p(lo, hi):
    """value >= p, for canonicalization (p = 2^64 - 2^32 + 1)."""
    return (hi == _P_HI) & (lo >= _P_LO)


def _canonicalize(lo, hi):
    """Subtract p once if value >= p. Input must be < 2^64 (< 2p suffices)."""
    ge = _geq_p(lo, hi)
    # value - p == value + (2^32 - 1) - 2^64  (mod 2^64)
    lo2, hi2, _ = _add64(lo, hi, _EPS, jnp.zeros_like(hi))
    return jnp.where(ge, lo2, lo), jnp.where(ge, hi2, hi)


# ---------------------------------------------------------------------------
# Field operations
# ---------------------------------------------------------------------------


def fp_add(a: Fp, b: Fp) -> Fp:
    lo, hi, c = _add64(a.lo, a.hi, b.lo, b.hi)
    # carry-out: fold 2^64 ≡ 2^32 - 1. Sum < 2p < 2^65, and after folding the
    # value is < 2^64 (see SURVEY §7 phase-0 notes), so one fold + one
    # conditional subtract canonicalizes.
    eps = c * _EPS
    lo2, hi2, _ = _add64(lo, hi, eps, jnp.zeros_like(hi))
    return Fp(*_canonicalize(lo2, hi2))


def fp_sub(a: Fp, b: Fp) -> Fp:
    lo, hi, brw = _sub64(a.lo, a.hi, b.lo, b.hi)
    # borrow: add p back == subtract (2^32 - 1) mod 2^64.
    eps = brw * _EPS
    lo2, hi2, _ = _sub64(lo, hi, eps, jnp.zeros_like(hi))
    return Fp(lo2, hi2)


def fp_neg(a: Fp) -> Fp:
    return fp_sub(fp_zeros(a.shape), a)


def fp_double(a: Fp) -> Fp:
    return fp_add(a, a)


def _reduce128(r0, r1, r2, r3):
    """Reduce a 128-bit value (four uint32 digits, little-endian) mod p.

    With ``n0 = r0 + 2^32 r1`` (low 64), ``n1 = r2``, ``n2 = r3``:
    ``x ≡ n0 - n2 + n1 * (2^32 - 1) (mod p)`` since ``2^64 ≡ 2^32 - 1`` and
    ``2^96 ≡ -1``. Same algorithm as plonky2/p3's ``reduce128``.
    """
    zero = jnp.zeros_like(r0)
    # t = n0 - n2 (n2 < 2^32). On borrow the wrapped t >= 2^64 - 2^32, so
    # subtracting EPSILON cannot underflow.
    tlo, thi, brw = _sub64(r0, r1, r3, zero)
    eps = brw * _EPS
    tlo, thi, _ = _sub64(tlo, thi, eps, zero)
    # t1 = n1 * (2^32 - 1) = (n1 << 32) - n1, a 64-bit value.
    t1lo, t1hi, _ = _sub64(zero, r2, r2, zero)
    # res = t + t1; on carry fold in EPSILON (cannot re-overflow since
    # t1 <= (2^32-1)^2 keeps the folded value < 2^64).
    lo, hi, c = _add64(tlo, thi, t1lo, t1hi)
    eps = c * _EPS
    lo, hi, _ = _add64(lo, hi, eps, zero)
    return _canonicalize(lo, hi)


def fp_mul(a: Fp, b: Fp) -> Fp:
    ll_lo, ll_hi = _mul32_wide(a.lo, b.lo)
    lh_lo, lh_hi = _mul32_wide(a.lo, b.hi)
    hl_lo, hl_hi = _mul32_wide(a.hi, b.lo)
    hh_lo, hh_hi = _mul32_wide(a.hi, b.hi)

    # r1 = ll_hi + lh_lo + hl_lo (collect carries into c_r1)
    r1 = ll_hi + lh_lo
    c_a = _u32(r1 < lh_lo)
    r1b = r1 + hl_lo
    c_b = _u32(r1b < hl_lo)
    c_r1 = c_a + c_b

    # r2 = lh_hi + hl_hi + hh_lo + c_r1
    r2 = lh_hi + hl_hi
    c_c = _u32(r2 < hl_hi)
    r2b = r2 + hh_lo
    c_d = _u32(r2b < hh_lo)
    r2c = r2b + c_r1
    c_e = _u32(r2c < c_r1)

    r3 = hh_hi + c_c + c_d + c_e
    return Fp(*_reduce128(ll_lo, r1b, r2c, r3))


def fp_square(a: Fp) -> Fp:
    return fp_mul(a, a)


def fp_mul_2exp(a: Fp, k: int) -> Fp:
    """Multiply by 2^k (k ≥ 0) via limb shifts + the 2^64 ≡ 2^32 − 1 fold —
    ~10 primitive ops instead of a full 4-product multiplication. Used for
    the constraint system's power-of-two weights (op-group radix 2^7,
    16-bit limb combos)."""
    zero = jnp.zeros_like(a.lo)
    while k >= 32:
        # value·2^32 = lo·2^32 + hi·2^64 ≡ (0, lo) + hi·(2^32 − 1)
        t1lo, t1hi, _ = _sub64(zero, a.hi, a.hi, zero)
        lo, hi, c = _add64(zero, a.lo, t1lo, t1hi)
        eps = c * _EPS
        lo, hi, _ = _add64(lo, hi, eps, zero)
        a = Fp(*_canonicalize(lo, hi))
        k -= 32
    if k == 0:
        return a
    ovf = a.hi >> (32 - k)  # < 2^k
    hi2 = (a.hi << k) | (a.lo >> (32 - k))
    lo2 = a.lo << k
    # + ovf·(2^32 − 1) = (ovf << 32) − ovf
    t1lo, t1hi, _ = _sub64(zero, ovf, ovf, zero)
    lo3, hi3, c = _add64(lo2, hi2, t1lo, t1hi)
    eps = c * _EPS
    lo3, hi3, _ = _add64(lo3, hi3, eps, zero)
    return Fp(*_canonicalize(lo3, hi3))


def fp_mul_small(a: Fp, k: int) -> Fp:
    """Multiply by a small non-negative integer constant via shift-and-add."""
    assert 0 <= k
    if k == 0:
        return fp_zeros(a.shape)
    result = None
    acc = a
    while k:
        if k & 1:
            result = acc if result is None else fp_add(result, acc)
        k >>= 1
        if k:
            acc = fp_double(acc)
    return result


def fp_pow_const(a: Fp, e: int) -> Fp:
    """Raise to a Python-int exponent (square-and-multiply, unrolled at trace)."""
    if e == 0:
        return fp_ones(a.shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else fp_mul(result, base)
        e >>= 1
        if e:
            base = fp_square(base)
    return result


_P_MINUS_2_BITS = np.array(
    [(gl.P - 2) >> i & 1 for i in range(64)], dtype=np.bool_
)


def _fp_inv_fermat(a: Fp) -> Fp:
    """Inverse via Fermat: a^(p-2), square-and-multiply under ``lax.scan`` so
    the compiled program holds one step, not 64 (keeps XLA compile time flat —
    the chain unrolled is ~10^4 primitives). ~128 full-array muls."""

    def step(carry, bit):
        acc, base = carry
        acc = fp_where(bit, fp_mul(acc, base), acc)
        return (acc, fp_square(base)), None

    acc0 = fp_ones(a.shape)
    (acc, _), _ = jax.lax.scan(step, (acc0, a), jnp.asarray(_P_MINUS_2_BITS))
    return acc


_BATCH_INV_LANES = 4096  # Fermat fallback width / Montgomery lane count


def fp_batch_inv(a: Fp) -> Fp:
    """Batch multiplicative inverse of a flat nonzero array (Montgomery trick,
    the TPU equivalent of p3's ``batch_multiplicative_inverse``; reference use
    on the DEEP path: crates/lifted-stark/src/pcs/deep/interpolate.rs).

    Blocked 2-pass product scan over a ``(C, R)`` view: exclusive prefix
    products down the C axis (R lanes wide), one Fermat inversion of the R
    lane totals, then a reverse pass ``inv(x[c]) = P_c · carry`` with
    ``carry ← carry · x[c]``. Total ≈ 3 muls/element + 128·R — ~40× less work
    than per-element Fermat. All elements must be nonzero (DEEP/quotient
    denominators are, by domain disjointness)."""
    n = a.shape[0]
    assert a.ndim == 1 and (n & (n - 1)) == 0
    r = min(n, _BATCH_INV_LANES)
    if n <= r:
        return _fp_inv_fermat(a)
    c = n // r
    x = a.reshape(c, r)

    def fwd(carry, xc):
        return fp_mul(carry, xc), carry

    total, prefix_ex = jax.lax.scan(fwd, fp_ones((r,)), x)
    total_inv = _fp_inv_fermat(total)

    def bwd(carry, inputs):
        xc, pc = inputs
        return fp_mul(carry, xc), fp_mul(pc, carry)

    _, inv_rows = jax.lax.scan(bwd, total_inv, (x, prefix_ex), reverse=True)
    return inv_rows.reshape(n)


def fp_inv(a: Fp) -> Fp:
    """Inverse of nonzero elements. Large flat arrays route through the
    Montgomery batch trick; scalars/small arrays use Fermat directly."""
    if a.ndim == 1 and a.shape[0] > _BATCH_INV_LANES and (a.shape[0] & (a.shape[0] - 1)) == 0:
        return fp_batch_inv(a)
    return _fp_inv_fermat(a)


def fp_exp_power_of_2(a: Fp, k: int) -> Fp:
    """a^(2^k) — k repeated squarings.

    For k ≥ 6 the squarings run under ``lax.fori_loop`` so the compiled
    graph holds ONE square body: XLA:CPU's backend goes super-linear (in
    practice, hangs past ~10) on long fully-inlined dependent scalar
    multiply chains, and nothing is gained by unrolling a sequential
    chain anyway."""
    if k >= 6:
        return jax.lax.fori_loop(0, k, lambda _, v: fp_square(v), a)
    for _ in range(k):
        a = fp_square(a)
    return a


def fp_powers(base: int, n: int, shift: int = 1) -> Fp:
    """Device array ``[shift, shift*base, ..., shift*base^(n-1)]``.

    Built with log2(n) masked multiplies from the binary expansion of the
    index (no O(n) host loop), run under ``lax.scan`` so the compiled
    program holds ONE multiply body — each unrolled field multiply costs
    ~100 HLO ops and XLA compiles these graphs at only ~10^2 ops/s, so the
    unrolled form was a measurable compile-time tax at every call site.
    ``base`` is a host int: the per-step factors b^(2^k) are precomputed
    exactly on host and scanned over.
    """
    assert n > 0
    log_n = max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=U32)
    b = base % gl.P
    factors = []
    for _ in range(log_n):
        factors.append(b)
        b = (b * b) % gl.P
    factors_fp = fp_from_u64(np.asarray(factors, dtype=np.uint64))
    bits = jnp.arange(log_n, dtype=U32)

    def step(acc: Fp, xs):
        factor, bit = xs
        stepped = fp_mul(acc, fp_broadcast_to(factor, (n,)))
        use = ((idx >> bit) & 1).astype(bool)
        return fp_where(use, stepped, acc), None

    acc0 = fp_const(shift % gl.P, (n,))
    acc, _ = jax.lax.scan(step, acc0, (factors_fp, bits))
    return acc


def fp_sum_axis0(x: Fp) -> Fp:
    """Exact modular sum over axis 0 via log-depth halving reductions."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        lo_part = x[0:half]
        hi_part = x[half : 2 * half]
        folded = fp_add(lo_part, hi_part)
        if n % 2:
            folded = fp_concat([folded, x[2 * half : n]], axis=0)
            n = half + 1
        else:
            n = half
        x = folded
    return x[0]


# ---------------------------------------------------------------------------
# Fp2: quadratic extension x^2 - 7
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Fp2:
    """Array of QuadFelt elements ``c0 + c1 * x`` with ``x^2 = 7``."""

    c0: Fp
    c1: Fp

    def tree_flatten(self):
        return (self.c0, self.c1), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.c0.shape

    def __getitem__(self, idx) -> "Fp2":
        return Fp2(self.c0[idx], self.c1[idx])

    def reshape(self, *shape) -> "Fp2":
        return Fp2(self.c0.reshape(*shape), self.c1.reshape(*shape))


def fp2_from_fp(x: Fp) -> Fp2:
    return Fp2(x, fp_zeros(x.shape))


def fp2_from_pair(c0: int, c1: int, shape=()) -> Fp2:
    return Fp2(fp_const(c0, shape), fp_const(c1, shape))


def fp2_zeros(shape) -> Fp2:
    return Fp2(fp_zeros(shape), fp_zeros(shape))


def fp2_ones(shape) -> Fp2:
    return Fp2(fp_ones(shape), fp_zeros(shape))


def fp2_add(a: Fp2, b: Fp2) -> Fp2:
    return Fp2(fp_add(a.c0, b.c0), fp_add(a.c1, b.c1))


def fp2_sub(a: Fp2, b: Fp2) -> Fp2:
    return Fp2(fp_sub(a.c0, b.c0), fp_sub(a.c1, b.c1))


def fp2_neg(a: Fp2) -> Fp2:
    return Fp2(fp_neg(a.c0), fp_neg(a.c1))


def fp2_mul(a: Fp2, b: Fp2) -> Fp2:
    # (a0 + a1 x)(b0 + b1 x) = a0 b0 + 7 a1 b1 + (a0 b1 + a1 b0) x
    a0b0 = fp_mul(a.c0, b.c0)
    a1b1 = fp_mul(a.c1, b.c1)
    a0b1 = fp_mul(a.c0, b.c1)
    a1b0 = fp_mul(a.c1, b.c0)
    return Fp2(fp_add(a0b0, fp_mul_small(a1b1, gl.W_EXT)), fp_add(a0b1, a1b0))


def fp2_mul_base(a: Fp2, s: Fp) -> Fp2:
    return Fp2(fp_mul(a.c0, s), fp_mul(a.c1, s))


def fp2_square(a: Fp2) -> Fp2:
    return fp2_mul(a, a)


def fp2_inv(a: Fp2) -> Fp2:
    # (a0 + a1 x)^-1 = (a0 - a1 x) / (a0^2 - 7 a1^2)
    d = fp_sub(fp_square(a.c0), fp_mul_small(fp_square(a.c1), gl.W_EXT))
    di = fp_inv(d)
    return Fp2(fp_mul(a.c0, di), fp_mul(fp_neg(a.c1), di))


def fp2_exp_power_of_2(a: Fp2, k: int) -> Fp2:
    """a^(2^k) — looped squarings past k ≥ 6 (see fp_exp_power_of_2)."""
    if k >= 6:
        return jax.lax.fori_loop(0, k, lambda _, v: fp2_square(v), a)
    for _ in range(k):
        a = fp2_square(a)
    return a


def fp2_where(cond, a: Fp2, b: Fp2) -> Fp2:
    return Fp2(fp_where(cond, a.c0, b.c0), fp_where(cond, a.c1, b.c1))


def fp2_concat(xs: Sequence[Fp2], axis=0) -> Fp2:
    return Fp2(
        fp_concat([x.c0 for x in xs], axis=axis),
        fp_concat([x.c1 for x in xs], axis=axis),
    )


def fp2_broadcast_to(x: Fp2, shape) -> Fp2:
    return Fp2(fp_broadcast_to(x.c0, shape), fp_broadcast_to(x.c1, shape))


def fp2_powers(base: Fp2, n: int) -> Fp2:
    """Powers ``[1, base, ..., base^(n-1)]`` of a runtime extension scalar,
    built with log2(n) masked multiplies under ``lax.scan`` (one multiply
    body compiled — see fp_powers)."""
    assert n > 0
    log_n = max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=U32)
    bits = jnp.arange(log_n, dtype=U32)

    def step(carry, bit):
        acc, b = carry
        stepped = fp2_mul(acc, fp2_broadcast_to(b, (n,)))
        use = ((idx >> bit) & 1).astype(bool)
        return (fp2_where(use, stepped, acc), fp2_mul(b, b)), None

    (acc, _b), _ = jax.lax.scan(step, (fp2_ones((n,)), base), bits)
    return acc


def fp2_sum_axis0(x: Fp2) -> Fp2:
    return Fp2(fp_sum_axis0(x.c0), fp_sum_axis0(x.c1))


def fp2_tile(x: Fp2, reps: int) -> Fp2:
    """Cyclically repeat along axis 0 (lifting in natural domain order)."""
    if reps == 1:
        return x
    return Fp2(
        Fp(jnp.tile(x.c0.lo, reps), jnp.tile(x.c0.hi, reps)),
        Fp(jnp.tile(x.c1.lo, reps), jnp.tile(x.c1.hi, reps)),
    )


def fp2_from_pairs_u64(values) -> Fp2:
    """Host: build from an array of (c0, c1) uint64 pairs, shape (..., 2)."""
    arr = np.asarray(values, dtype=np.uint64)
    return Fp2(fp_from_u64(arr[..., 0]), fp_from_u64(arr[..., 1]))


def fp2_to_pairs_u64(x: Fp2) -> np.ndarray:
    return np.stack([fp_to_u64(x.c0), fp_to_u64(x.c1)], axis=-1)
