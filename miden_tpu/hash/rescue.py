"""RPO-256 / RPX-256 permutations batched on device.

State layout matches :mod:`poseidon2`: ``(12, n)`` lane-major packed-limb
``Fp``. Bit-exact with :mod:`rescue_host` (pinned in tests against the
reference's 19 RPO known-answer vectors, rpo/tests.rs EXPECTED).

Structure (crates/crypto/src/hash/algebraic_sponge/rescue/):
- MDS: 12x12 circulant with small entries — shift-and-add multiplies
  (``fp_mul_small``), no full 4-product multiplications.
- forward S-box x^7: 4 muls/lane; inverse S-box x^{1/7}: the reference's
  72-multiplication addition chain (rescue/mod.rs apply_inv_sbox).
- RPX (E) round: x^7 in F_p[φ]/(φ³−φ−1) on four 3-lane chunks
  (rpx/mod.rs cubic_ext), Karatsuba-style 6-mul products.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..field.goldilocks import (
    Fp,
    fp_add,
    fp_double,
    fp_from_u64,
    fp_mul,
    fp_mul_small,
    fp_square,
    fp_stack,
)
from . import rescue_constants as RC

_ARK1_DEV = None
_ARK2_DEV = None


def _arks():
    global _ARK1_DEV, _ARK2_DEV
    if _ARK1_DEV is None:
        # ensure_compile_time_eval: first call may happen under a jit trace;
        # the cached arrays must be concrete, not leaked tracers
        with jax.ensure_compile_time_eval():
            _ARK1_DEV = fp_from_u64(np.asarray(RC.ARK1, dtype=np.uint64))
            _ARK2_DEV = fp_from_u64(np.asarray(RC.ARK2, dtype=np.uint64))
    return _ARK1_DEV, _ARK2_DEV


def _rows(state: Fp) -> list:
    return [state[i] for i in range(12)]


def _add_ark(rows: list, ark: Fp, r: int) -> list:
    return [fp_add(rows[i], Fp(ark.lo[r, i], ark.hi[r, i])) for i in range(12)]


def _mds(rows: list) -> list:
    out = []
    for i in range(12):
        acc = None
        for j in range(12):
            term = fp_mul_small(rows[j], RC.MDS_ROW0[(j - i) % 12])
            acc = term if acc is None else fp_add(acc, term)
        out.append(acc)
    return out


def _sbox7(x: Fp) -> Fp:
    x2 = fp_square(x)
    x4 = fp_square(x2)
    x3 = fp_mul(x2, x)
    return fp_mul(x4, x3)


INV_ALPHA = 10540996611094048183  # 7^-1 mod (p-1)

_INV_ALPHA_BITS = np.array(
    [(INV_ALPHA >> i) & 1 for i in range(64)], dtype=np.bool_
)


def _inv_sbox_state(state: Fp) -> Fp:
    """x^{1/7} = x^INV_ALPHA on the whole (12, n) state.

    Square-and-multiply under ``lax.scan`` over the exponent bits — ONE
    compiled step instead of the reference's 72-multiplication addition
    chain (rescue/mod.rs:52-95): the unrolled chain's depth trips XLA:CPU's
    super-linear straight-line pathology, and on TPU the scan costs the
    same HBM traffic."""
    import jax.numpy as jnp

    def step(carry, bit):
        acc, base = carry
        from ..field.goldilocks import fp_where

        acc = fp_where(bit, fp_mul(acc, base), acc)
        return (acc, fp_square(base)), None

    from ..field.goldilocks import fp_ones

    (acc, _), _ = jax.lax.scan(
        step, (fp_ones(state.shape), state), jnp.asarray(_INV_ALPHA_BITS)
    )
    return acc


def _inv_sbox(rows: list) -> list:
    out = _inv_sbox_state(fp_stack(rows, axis=0))
    return [out[i] for i in range(12)]


def _fb_round(rows: list, r: int) -> list:
    ark1, ark2 = _arks()
    rows = [_sbox7(x) for x in _add_ark(_mds(rows), ark1, r)]
    return _inv_sbox(_add_ark(_mds(rows), ark2, r))


def _c3_mul(a, b):
    """Cubic extension product mod φ³−φ−1 on 3-lane tuples (schoolbook +
    fold: φ³=φ+1, φ⁴=φ²+φ)."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    c0 = fp_mul(a0, b0)
    c1 = fp_add(fp_mul(a0, b1), fp_mul(a1, b0))
    c2 = fp_add(fp_add(fp_mul(a0, b2), fp_mul(a1, b1)), fp_mul(a2, b0))
    c3 = fp_add(fp_mul(a1, b2), fp_mul(a2, b1))
    c4 = fp_mul(a2, b2)
    return (fp_add(c0, c3), fp_add(c1, fp_add(c3, c4)), fp_add(c2, c4))


def _c3_pow7(a):
    a2 = _c3_mul(a, a)
    a3 = _c3_mul(a2, a)
    a6 = _c3_mul(a3, a3)
    return _c3_mul(a6, a)


def _ext_round(rows: list, r: int) -> list:
    ark1, _ = _arks()
    s = _add_ark(rows, ark1, r)
    out = []
    for b in (0, 3, 6, 9):
        out.extend(_c3_pow7((s[b], s[b + 1], s[b + 2])))
    return out


def _mds_arr(s: Fp) -> Fp:
    """Circulant MDS on the whole (12, n) state: out[i] = Σ_k c_k·s[(i+k)%12]
    — 12 shift-and-add multiplies instead of 144 per-lane ones (each traced
    field multiply costs ~10²  HLO ops; XLA compiles at ~10² ops/s, so round
    bodies must stay lean)."""
    import jax.numpy as jnp

    acc = None
    for k in range(12):
        c = RC.MDS_ROW0[k]
        if c == 0:
            continue
        rolled = Fp(jnp.roll(s.lo, -k, axis=0), jnp.roll(s.hi, -k, axis=0))
        term = fp_mul_small(rolled, c)
        acc = term if acc is None else fp_add(acc, term)
    return acc


def _add_ark_arr(s: Fp, ark_row: Fp) -> Fp:
    return fp_add(s, Fp(ark_row.lo[:, None], ark_row.hi[:, None]))


def _fb_round_arr(state: Fp, ark1_row: Fp, ark2_row: Fp) -> Fp:
    """One FB round on a (12, n) state with (12,) ARK rows (array form, used
    inside the round scan)."""
    s = _add_ark_arr(_mds_arr(state), ark1_row)
    s = _sbox7(s)
    s = _add_ark_arr(_mds_arr(s), ark2_row)
    return _inv_sbox_state(s)


@jax.jit
def rpo_permute(state: Fp) -> Fp:
    """Batched RPO permutation on (12, n) states.

    The 7 uniform rounds run under ``lax.scan`` (one compiled round body):
    fully unrolled, the ~250 dependent multiplies/round × 7 trip XLA:CPU's
    super-linear straight-line-chain pathology (see fp_exp_power_of_2)."""
    assert state.shape[0] == 12
    ark1, ark2 = _arks()

    def body(st: Fp, arks):
        a1, a2 = arks
        return _fb_round_arr(st, a1, a2), None

    out, _ = jax.lax.scan(body, state, (ark1, ark2))
    return out


def _ext_round_arr(state: Fp, ark_row: Fp) -> Fp:
    """E round on (12, n): the four 3-lane cubic-extension x^7 maps run
    vectorized across groups — view (4, 3, n), one _c3_pow7 on (4, n)
    components instead of four scalar-group copies."""
    n = state.shape[-1]
    s = _add_ark_arr(state, ark_row)
    g = s.reshape(4, 3, n)
    a = (Fp(g.lo[:, 0], g.hi[:, 0]), Fp(g.lo[:, 1], g.hi[:, 1]),
         Fp(g.lo[:, 2], g.hi[:, 2]))
    c0, c1, c2 = _c3_pow7(a)
    import jax.numpy as jnp

    lo = jnp.stack([c0.lo, c1.lo, c2.lo], axis=1).reshape(12, n)
    hi = jnp.stack([c0.hi, c1.hi, c2.hi], axis=1).reshape(12, n)
    return Fp(lo, hi)


@jax.jit
def rpx_permute(state: Fp) -> Fp:
    """Batched RPX (XHash12) permutation on (12, n) states:
    (FB)(E)(FB)(E)(FB)(E)(M), the (FB)(E) pairs scanned (see rpo_permute)."""
    assert state.shape[0] == 12
    ark1, ark2 = _arks()
    fb_idx = np.asarray([0, 2, 4])
    ex_idx = np.asarray([1, 3, 5])
    fb1 = Fp(ark1.lo[fb_idx], ark1.hi[fb_idx])
    fb2 = Fp(ark2.lo[fb_idx], ark2.hi[fb_idx])
    ex1 = Fp(ark1.lo[ex_idx], ark1.hi[ex_idx])

    def body(st: Fp, arks):
        a1, a2, e1 = arks
        st = _fb_round_arr(st, a1, a2)
        st = _ext_round_arr(st, e1)
        return st, None

    st, _ = jax.lax.scan(body, state, (fb1, fb2, ex1))
    return _add_ark_arr(_mds_arr(st), Fp(ark1.lo[6], ark1.hi[6]))


# --- LMCS sponge wrappers (StatefulSponge overwrite-mode semantics, the
# same choreography as hash/poseidon2.py hash_blocks/compress_pairs) ---


def _hash_blocks_with(permute_fn, blocks: Fp) -> Fp:
    import jax.numpy as jnp
    from ..field.goldilocks import fp_concat, fp_zeros

    n_leaves, n_blocks, rate = blocks.shape
    assert rate == 8
    state = fp_zeros((12, n_leaves))

    def body(st: Fp, chunk: Fp):
        chunk_t = Fp(chunk.lo.T, chunk.hi.T)
        st = fp_concat([chunk_t, st[8:12]], axis=0)
        return permute_fn(st), None

    scanned = Fp(jnp.moveaxis(blocks.lo, 1, 0), jnp.moveaxis(blocks.hi, 1, 0))
    state, _ = jax.lax.scan(body, state, scanned)
    digest = state[0:4]
    return Fp(digest.lo.T, digest.hi.T)


def _compress_pairs_with(permute_fn, left: Fp, right: Fp) -> Fp:
    from ..field.goldilocks import fp_concat, fp_zeros

    n = left.shape[0]
    state = fp_concat(
        [Fp(left.lo.T, left.hi.T), Fp(right.lo.T, right.hi.T), fp_zeros((4, n))],
        axis=0,
    )
    out = permute_fn(state)[0:4]
    return Fp(out.lo.T, out.hi.T)


def rpo_hash_blocks(blocks: Fp) -> Fp:
    return _hash_blocks_with(rpo_permute, blocks)


def rpo_compress_pairs(left: Fp, right: Fp) -> Fp:
    return _compress_pairs_with(rpo_permute, left, right)


def rpx_hash_blocks(blocks: Fp) -> Fp:
    return _hash_blocks_with(rpx_permute, blocks)


def rpx_compress_pairs(left: Fp, right: Fp) -> Fp:
    return _compress_pairs_with(rpx_permute, left, right)
