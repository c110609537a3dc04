"""Batched Poseidon2 permutation on TPU (JAX, packed 32-bit limb Goldilocks).

The state is a single `Fp` array of shape ``(12, n)`` — lane-major
struct-of-arrays, so one call runs ``n`` independent permutations with every
round fully vectorized across both the 12 lanes and the batch. This is the
TPU replacement for the reference's SIMD-packed permutations
(crates/crypto/src/hash/algebraic_sponge/packed.rs): where Rust packs 4–8 AVX
lanes, here ``n`` is an entire Merkle layer or leaf batch.

All heavy use goes through :func:`hash_blocks` (LMCS leaf hashing) and
:func:`compress_pairs` (Merkle tree layers).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field.goldilocks import (
    Fp,
    fp_add,
    fp_concat,
    fp_from_u64,
    fp_mul,
    fp_mul_small,
    fp_square,
    fp_zeros,
)
from . import constants as C


def _const_col(values) -> Fp:
    """Constant Fp column of shape (len(values), 1) for broadcasting."""
    return fp_from_u64(np.asarray(values, dtype=np.uint64)[:, None])


_ARK_INITIAL = [_const_col(C.ARK_EXT_INITIAL[r * 12 : r * 12 + 12]) for r in range(4)]
_ARK_TERMINAL = [_const_col(C.ARK_EXT_TERMINAL[r * 12 : r * 12 + 12]) for r in range(4)]
_ARK_INT = [_const_col([C.ARK_INT[r]]) for r in range(C.NUM_INTERNAL_ROUNDS)]
_MAT_DIAG = _const_col(C.MAT_DIAG)

_M4 = ((2, 3, 1, 1), (1, 2, 3, 1), (1, 1, 2, 3), (3, 1, 1, 2))


def _sbox(x: Fp) -> Fp:
    x2 = fp_square(x)
    x4 = fp_square(x2)
    x3 = fp_mul(x2, x)
    return fp_mul(x4, x3)


def _mds_external(s: Fp) -> Fp:
    # s: (12, n). View as (3, 4, n): apply M4 within each 4-chunk, then add
    # cross-chunk per-position sums. M4 entries are 1/2/3 — adds and doubles.
    n = s.shape[-1]
    c = s.reshape(3, 4, n)
    cols = [c[:, j] for j in range(4)]  # each (3, n)
    rows = []
    for r in range(4):
        acc = None
        for j in range(4):
            term = fp_mul_small(cols[j], _M4[r][j])
            acc = term if acc is None else fp_add(acc, term)
        rows.append(acc)
    out = Fp(
        jnp.stack([x.lo for x in rows], axis=1),
        jnp.stack([x.hi for x in rows], axis=1),
    )  # (3, 4, n)
    sums = out[0]
    sums = fp_add(fp_add(out[0], out[1]), out[2])  # (4, n)
    lifted = Fp(
        jnp.broadcast_to(sums.lo[None], (3, 4, n)),
        jnp.broadcast_to(sums.hi[None], (3, 4, n)),
    )
    return fp_add(out, lifted).reshape(12, n)


def _set_row0(s: Fp, row: Fp) -> Fp:
    return Fp(
        jnp.concatenate([row.lo[None], s.lo[1:]], axis=0),
        jnp.concatenate([row.hi[None], s.hi[1:]], axis=0),
    )


def _sum_rows(s: Fp) -> Fp:
    # Exact tree reduction over the 12 lanes (no modular shortcuts).
    acc = s[0:6]
    acc = fp_add(acc, s[6:12])  # (6, n)
    acc = fp_add(acc[0:3], acc[3:6])  # (3, n)
    acc = fp_add(fp_add(acc[0], acc[1]), acc[2])  # (n,)
    return acc


_ARK_INITIAL_STACK = _const_col(C.ARK_EXT_INITIAL).reshape(4, 12, 1)
_ARK_TERMINAL_STACK = _const_col(C.ARK_EXT_TERMINAL).reshape(4, 12, 1)
_ARK_INT_STACK = _const_col(C.ARK_INT).reshape(C.NUM_INTERNAL_ROUNDS, 1)


def permute(state: Fp) -> Fp:
    """Poseidon2 permutation on a batch of states, shape ``(12, n)``.

    Rounds run under ``lax.scan`` so the compiled program contains one
    external and one internal round body regardless of round count — this
    keeps XLA compile time flat as the permutation appears in many fused
    kernels (leaf hashing, every Merkle layer, grinding).
    """
    assert state.shape[0] == 12
    n = state.shape[-1]
    if _use_pallas(n):
        from . import poseidon2_pallas as pp

        return pp.permute_pallas(state)

    def ext_round(s: Fp, rc: Fp) -> tuple:
        return _mds_external(_sbox(fp_add(s, rc))), None

    def int_round(s: Fp, rc: Fp) -> tuple:
        s0 = _sbox(fp_add(s[0], rc[0]))
        s = _set_row0(s, s0)
        total = _sum_rows(s)
        diag_term = fp_mul(s, _MAT_DIAG)
        total_b = Fp(
            jnp.broadcast_to(total.lo[None], (12, n)),
            jnp.broadcast_to(total.hi[None], (12, n)),
        )
        return fp_add(total_b, diag_term), None

    s = _mds_external(state)
    s, _ = jax.lax.scan(ext_round, s, _ARK_INITIAL_STACK)
    s, _ = jax.lax.scan(int_round, s, _ARK_INT_STACK)
    s, _ = jax.lax.scan(ext_round, s, _ARK_TERMINAL_STACK)
    return s


def _use_pallas(n: int) -> bool:
    """Route large batches through the Pallas permutation kernel on TPU
    backends (the jnp scan stages every round through HBM; the kernel keeps
    all 30 rounds in VMEM — measured 3.8× on a v5e chip). The sponge /
    Merkle-layer choreography around the permutation stays in XLA: its HBM
    traffic between permutations is negligible next to the rounds'.

    The floor is 1024: the kernel's in-VMEM lane-plane reshape needs a
    full 128-lane minor dim per 8-sublane plane (Mosaic rejects the shape
    cast below that), and sub-1024 batches are top-of-tree noise."""
    return n >= 1024 and (n & (n - 1)) == 0 and jax.default_backend() != "cpu"


def hash_blocks(blocks: Fp) -> Fp:
    """Overwrite-mode sponge over pre-chunked rate blocks, batched over leaves.

    ``blocks``: Fp of shape ``(n_leaves, n_blocks, 8)`` — each leaf's row data
    already padded to rate-8 blocks (LMCS row alignment guarantees this:
    reference crates/stateful-hasher/src/field_sponge.rs semantics).

    Returns digests as Fp of shape ``(n_leaves, 4)``.
    """
    n_leaves, n_blocks, rate = blocks.shape
    assert rate == 8
    state = fp_zeros((12, n_leaves))

    # lax.scan over the block axis: one permutation in the compiled body
    # regardless of row width (compile time stays constant as widths grow).
    def body(state: Fp, chunk: Fp):
        chunk_t = Fp(chunk.lo.T, chunk.hi.T)  # (8, n_leaves)
        state = fp_concat([chunk_t, state[8:12]], axis=0)
        return permute(state), None

    scanned = Fp(
        jnp.moveaxis(blocks.lo, 1, 0), jnp.moveaxis(blocks.hi, 1, 0)
    )  # (n_blocks, n_leaves, 8)
    state, _ = jax.lax.scan(body, state, scanned)
    digest = state[0:4]
    return Fp(digest.lo.T, digest.hi.T)


def compress_pairs(left: Fp, right: Fp) -> Fp:
    """Merkle 2-to-1 compression, batched: ``(n, 4) x (n, 4) -> (n, 4)``.

    TruncatedPermutation<P, 2, 4, 12>: state = left||right||0^4, permute,
    take first 4 lanes.
    """
    n = left.shape[0]
    state = fp_concat(
        [Fp(left.lo.T, left.hi.T), Fp(right.lo.T, right.hi.T), fp_zeros((4, n))],
        axis=0,
    )
    out = permute(state)[0:4]
    return Fp(out.lo.T, out.hi.T)


# Jitted entry points — the permutation unrolls to O(10^3) primitive ops, so
# eager dispatch dominates without compilation.
permute_jit = jax.jit(permute)
hash_blocks_jit = jax.jit(hash_blocks)
compress_pairs_jit = jax.jit(compress_pairs)
