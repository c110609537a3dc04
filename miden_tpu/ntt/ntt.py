"""Goldilocks NTT / low-degree extension on TPU (JAX).

TPU-native replacement for the reference's p3-dft ``Radix2DitParallel``
(used at crates/lifted-stark/src/prover/commit.rs:173, quotient.rs:190,
pcs/fri/prover.rs:232). Where Rust parallelizes butterflies over rayon
threads, here every stage is one vectorized elementwise pass over the whole
``(n, batch)`` array, jitted so XLA fuses the limb arithmetic.

Conventions (self-consistent across this framework):

- Arrays are ``(n, batch)``: the transform runs along axis 0, batched over
  columns.
- ``dft_dif``: natural-order input → **bit-reversed** output (decimation in
  frequency). ``dft_dit``: bit-reversed input → natural output (decimation
  in time). Both evaluate ``X[k] = Σ_j x[j]·ω^{jk}`` with ``ω`` the canonical
  two-adic generator of order n (gl.two_adic_generator).
- ``interpolate_bitrev``: natural evaluations over a (sub)group → coefficients
  in bit-reversed order (inverse twiddles + 1/n scale).
- ``coset_lde``: evaluations over ``shift_in·H`` (natural order) →
  evaluations over ``shift_out·K``, ``|K| = blowup·|H|`` (natural order).
  Zero-padding in coefficient space uses the bit-reversal identity: a
  bit-reversed coefficient vector of size n zero-pads to size N by
  scattering entry j to position j·(N/n) — a pure reshape+pad, no gather.

All twiddle/power tables are computed **on device** with O(log² n) masked
multiplies (fp_powers), then cached per size; nothing scales with n on the
host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..field.goldilocks import (
    Fp,
    fp_add,
    fp_broadcast_to,
    fp_concat,
    fp_const,
    fp_from_u64,
    fp_mul,
    fp_powers,
    fp_sub,
    fp_zeros,
)

# ---------------------------------------------------------------------------
# Twiddle caches (host-side dict of device arrays)
# ---------------------------------------------------------------------------

_TWIDDLE_CACHE: dict = {}


def _is_tracer(fp: Fp) -> bool:
    return isinstance(fp.lo, jax.core.Tracer)


def _stage_twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle arrays for a size-2^log_n transform.

    Entry ``s`` (s = 0 .. log_n-1) holds the half-block twiddles for block
    size ``m = 2^(log_n - s)``: ``[ω_m^0, ω_m^1, ..., ω_m^{m/2-1}]`` (or the
    inverse powers). DIF consumes them in order 0..; DIT in reverse.
    """
    key = (log_n, inverse)
    if key not in _TWIDDLE_CACHE:
        # ensure_compile_time_eval: if we're called during a jit trace, the
        # table build must still run eagerly — staged into the graph it
        # becomes a huge constant-folding job that XLA:CPU chews on for
        # minutes (observed >9 min for a 10-stage transform).
        with jax.ensure_compile_time_eval():
            tws = []
            for s in range(log_n):
                log_m = log_n - s
                w = gl.two_adic_generator(log_m)
                if inverse:
                    w = gl.inv(w)
                tws.append(fp_powers(w, max(1, 1 << (log_m - 1))))
        if any(_is_tracer(t) for t in tws):
            return tws  # under trace of tracer shapes: don't cache tracers
        _TWIDDLE_CACHE[key] = tws
    return _TWIDDLE_CACHE[key]


_POWERS_CACHE: dict = {}


def shift_powers(shift: int, n: int, bitrev: bool) -> Fp:
    """Device array of ``shift^k`` for k = 0..n-1 (optionally bit-reversed)."""
    key = (shift % gl.P, n, bitrev)
    if key not in _POWERS_CACHE:
        with jax.ensure_compile_time_eval():  # see _stage_twiddles
            p = fp_powers(shift, n)
            if bitrev and n > 1:
                p = bitrev_perm(p)
        if _is_tracer(p):
            return p  # under trace of tracer shapes: don't cache tracers
        _POWERS_CACHE[key] = p
    return _POWERS_CACHE[key]


def bitrev_perm(x: Fp) -> Fp:
    """Bit-reversal permutation along axis 0 (power-of-two length).

    Implemented as reshape → transpose → reshape (no gather): index bits of
    axis 0 are reversed.
    """
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if log_n <= 1:
        return x
    rest = x.shape[1:]

    def rev(a):
        a = a.reshape((2,) * log_n + rest)
        perm = tuple(reversed(range(log_n))) + tuple(
            range(log_n, log_n + len(rest))
        )
        return a.transpose(perm).reshape((n,) + rest)

    return Fp(rev(x.lo), rev(x.hi))


# ---------------------------------------------------------------------------
# Forward / inverse transforms
# ---------------------------------------------------------------------------


def _butterfly_dif(x: Fp, tw: Fp) -> Fp:
    """One DIF stage. x: (blocks, m, batch); tw: (m/2,)."""
    m = x.shape[1]
    a = x[:, : m // 2]
    b = x[:, m // 2 :]
    twb = Fp(tw.lo[None, :, None], tw.hi[None, :, None])
    top = fp_add(a, b)
    bot = fp_mul(fp_sub(a, b), twb)
    # (blocks, 2, m/2, batch) -> (2*blocks, m/2, batch)
    lo = jnp.stack([top.lo, bot.lo], axis=1)
    hi = jnp.stack([top.hi, bot.hi], axis=1)
    blocks = x.shape[0]
    batch = x.shape[2]
    return Fp(lo.reshape(blocks * 2, m // 2, batch), hi.reshape(blocks * 2, m // 2, batch))


def _butterfly_dit(x: Fp, tw: Fp) -> Fp:
    """One DIT stage (inverse of _butterfly_dif without the scale).

    x: (2*blocks, m/2, batch) viewed as pairs of half-blocks; tw: (m/2,).
    Produces (blocks, m, batch) with block[j] = top[j] + tw^j·bot[j] /
    block[j+m/2] = top[j] − tw^j·bot[j].
    """
    blocks2, half, batch = x.shape
    blocks = blocks2 // 2
    lo = x.lo.reshape(blocks, 2, half, batch)
    hi = x.hi.reshape(blocks, 2, half, batch)
    t = Fp(lo[:, 0], hi[:, 0])
    u = Fp(lo[:, 1], hi[:, 1])
    twb = Fp(tw.lo[None, :, None], tw.hi[None, :, None])
    utw = fp_mul(u, twb)
    top = fp_add(t, utw)
    bot = fp_sub(t, utw)
    # stack+reshape rather than concatenate: XLA:CPU compiles long
    # concatenate chains pathologically slowly (minutes for 10+ stages),
    # while the stack/reshape form (as in _butterfly_dif) is instant.
    out_lo = jnp.stack([top.lo, bot.lo], axis=1).reshape(blocks, 2 * half, batch)
    out_hi = jnp.stack([top.hi, bot.hi], axis=1).reshape(blocks, 2 * half, batch)
    return Fp(out_lo, out_hi)


def _use_pallas_ntt(n: int) -> bool:
    """Route through the Pallas four-step kernels on TPU backends: one
    Mosaic compile per sub-size shared by every call site (the XLA path
    compiles each stage per shape at ~10² HLO ops/s on the axon service),
    and all sub-transform stages run VMEM-resident."""
    import os

    if os.environ.get("MIDEN_TPU_PALLAS_NTT") == "0":
        return False
    return n >= 16 and jax.default_backend() != "cpu"


def dft_dif(x: Fp, inverse: bool = False) -> Fp:
    """Size-n transform along axis 0: natural input → bit-reversed output.

    Forward twiddles evaluate the DFT; ``inverse=True`` uses inverse twiddles
    (caller applies the 1/n scale).
    """
    n, batch = x.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if _use_pallas_ntt(n):
        from . import ntt_pallas

        return ntt_pallas.dft_dif(x, inverse)
    tws = _stage_twiddles(log_n, inverse)
    y = x.reshape(1, n, batch)
    for s in range(log_n):
        y = _butterfly_dif(y, tws[s])
    return y.reshape(n, batch)


def dft_dit(x: Fp, inverse: bool = False) -> Fp:
    """Size-n transform along axis 0: bit-reversed input → natural output."""
    n, batch = x.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if _use_pallas_ntt(n):
        from . import ntt_pallas

        return ntt_pallas.dft_dit(x, inverse)
    tws = _stage_twiddles(log_n, inverse)
    y = x.reshape(n, 1, batch)
    for s in reversed(range(log_n)):
        y = _butterfly_dit(y, tws[s])
    return y.reshape(n, batch)


def _scale(x: Fp, c: int) -> Fp:
    return fp_mul(x, fp_broadcast_to(fp_const(c), x.shape))


def interpolate_bitrev(evals_natural: Fp) -> Fp:
    """Natural-order evaluations over the order-n subgroup → coefficients in
    bit-reversed order (includes the 1/n scale)."""
    n = evals_natural.shape[0]
    coeffs = dft_dif(evals_natural, inverse=True)
    return _scale(coeffs, gl.inv(n % gl.P))


def evaluate_natural(coeffs_bitrev: Fp) -> Fp:
    """Bit-reversed coefficients → natural-order evaluations (size preserved)."""
    return dft_dit(coeffs_bitrev)


def _pad_bitrev_coeffs(coeffs_bitrev: Fp, added_bits: int) -> Fp:
    """Zero-pad a bit-reversed coefficient vector n → n·2^added_bits.

    Natural-order padding (coefficients k ≥ n are zero) corresponds in the
    larger bit-reversed order to scattering entry j to position j·2^added_bits
    — i.e. reshape (n, 1, batch), pad axis 1 with zeros, flatten.
    """
    if added_bits == 0:
        return coeffs_bitrev
    n, batch = coeffs_bitrev.shape
    r = 1 << added_bits
    pad = [(0, 0), (0, r - 1), (0, 0)]
    lo = jnp.pad(coeffs_bitrev.lo[:, None, :], pad)
    hi = jnp.pad(coeffs_bitrev.hi[:, None, :], pad)
    return Fp(lo.reshape(n * r, batch), hi.reshape(n * r, batch))


def coset_lde(
    evals_natural: Fp,
    added_bits: int,
    shift_out: int,
    shift_in: int = 1,
) -> Fp:
    """Low-degree extension: evals over ``shift_in·H`` (natural, size n) →
    evals over ``shift_out·K`` (natural, size n·2^added_bits).

    Mirrors p3-dft ``coset_lde_batch`` semantics (reference
    crates/lifted-stark/src/prover/commit.rs:142-180) with this framework's
    natural-order output convention.
    """
    n = evals_natural.shape[0]
    coeffs = interpolate_bitrev(evals_natural)  # coeffs of f(shift_in · X)
    coeffs = _pad_bitrev_coeffs(coeffs, added_bits)
    big_n = n << added_bits
    # f(shift_out·X) coefficients: multiply coeff k by (shift_out/shift_in)^k.
    eff = gl.mul(shift_out % gl.P, gl.inv(shift_in % gl.P)) if shift_in != 1 else shift_out % gl.P
    if eff != 1:
        pw = shift_powers(eff, big_n, bitrev=True)
        coeffs = fp_mul(coeffs, Fp(pw.lo[:, None], pw.hi[:, None]))
    return dft_dit(coeffs)


def coset_interpolate_bitrev(evals_natural: Fp, shift: int) -> Fp:
    """Evaluations over ``shift·H`` (natural) → coefficients of f itself
    (bit-reversed order)."""
    n = evals_natural.shape[0]
    coeffs = interpolate_bitrev(evals_natural)  # coeffs of f(shift·X)
    if shift % gl.P != 1:
        pw = shift_powers(gl.inv(shift % gl.P), n, bitrev=True)
        coeffs = fp_mul(coeffs, Fp(pw.lo[:, None], pw.hi[:, None]))
    return coeffs


def evaluate_coeffs_on_coset(coeffs_bitrev: Fp, added_bits: int, shift: int) -> Fp:
    """Bit-reversed coefficients (size n) → natural evaluations over
    ``shift·K`` with ``|K| = n·2^added_bits``."""
    coeffs = _pad_bitrev_coeffs(coeffs_bitrev, added_bits)
    big_n = coeffs.shape[0]
    if shift % gl.P != 1:
        pw = shift_powers(shift, big_n, bitrev=True)
        coeffs = fp_mul(coeffs, Fp(pw.lo[:, None], pw.hi[:, None]))
    return dft_dit(coeffs)


# ---------------------------------------------------------------------------
# Jitted entry points
# ---------------------------------------------------------------------------
# The twiddle/power caches hold concrete device arrays. They must be
# populated EAGERLY (outside any trace) or cached tracers would leak out of
# jit; the warm wrappers below populate them first, so inside the jit the
# cache hit closes over constants.

_coset_lde_jit = jax.jit(coset_lde, static_argnums=(1, 2, 3))
_coset_interpolate_bitrev_jit = jax.jit(coset_interpolate_bitrev, static_argnums=(1,))
_evaluate_coeffs_on_coset_jit = jax.jit(evaluate_coeffs_on_coset, static_argnums=(1, 2))


def _warm(log_small: int, log_big: int, shifts_bitrev) -> None:
    # stage twiddles feed only the XLA butterfly path; skip them when the
    # Pallas kernels own the transform (each eager table build costs a
    # remote compile on the axon service)
    if not _use_pallas_ntt(1 << max(log_small, log_big)):
        _stage_twiddles(log_small, True)
        _stage_twiddles(log_big, False)
    for s, n in shifts_bitrev:
        if s % gl.P != 1:
            shift_powers(s, n, bitrev=True)


def coset_lde_jit(evals, added_bits: int, shift_out: int, shift_in: int = 1):
    n = evals.shape[0]
    log_n = n.bit_length() - 1
    eff = (
        gl.mul(shift_out % gl.P, gl.inv(shift_in % gl.P))
        if shift_in != 1
        else shift_out % gl.P
    )
    _warm(log_n, log_n + added_bits, [(eff, n << added_bits)])
    return _coset_lde_jit(evals, added_bits, shift_out, shift_in)


def coset_interpolate_bitrev_jit(evals, shift: int):
    n = evals.shape[0]
    log_n = n.bit_length() - 1
    _warm(log_n, 0, [(gl.inv(shift % gl.P), n)])
    return _coset_interpolate_bitrev_jit(evals, shift)


def evaluate_coeffs_on_coset_jit(coeffs, added_bits: int, shift: int):
    n = coeffs.shape[0]
    log_big = n.bit_length() - 1 + added_bits
    _warm(0, log_big, [(shift, n << added_bits)])
    return _evaluate_coeffs_on_coset_jit(coeffs, added_bits, shift)
