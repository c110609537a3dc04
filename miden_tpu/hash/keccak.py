"""Batched Keccak-256 on TPU (JAX, u64 lanes as uint32 pairs).

Row-parallel kernels for the Keccak LMCS config (reference
air/src/config.rs `keccak_config`) and the Keccak precompile's witness
generation. Keccak-f is pure bitwise logic — XOR/AND-NOT/rotate — which
splits exactly across the (lo, hi) uint32 halves the TPU prefers; the 24
rounds are unrolled with compile-time rotation constants.

Ground truth: keccak_host.py (pinned to the reference's NIST vectors).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import keccak_host as H

RATE_WORDS = H.RATE // 8  # 17 u64 lanes absorbed per block


def _rotl(lo, hi, n: int):
    """Rotate-left a u64 given as (lo, hi) uint32 halves."""
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n > 32:
        lo, hi = hi, lo
        n -= 32
    nn = np.uint32(n)
    inv = np.uint32(32 - n)
    new_lo = (lo << nn) | (hi >> inv)
    new_hi = (hi << nn) | (lo >> inv)
    return new_lo, new_hi


def keccak_f(lanes: list) -> list:
    """Keccak-f[1600] on 25 lanes, each a (lo, hi) pair of (n,) uint32."""
    a = list(lanes)
    for rc in H.ROUND_CONSTANTS:
        c = [
            (
                a[x][0] ^ a[x + 5][0] ^ a[x + 10][0] ^ a[x + 15][0] ^ a[x + 20][0],
                a[x][1] ^ a[x + 5][1] ^ a[x + 10][1] ^ a[x + 15][1] ^ a[x + 20][1],
            )
            for x in range(5)
        ]
        d = []
        for x in range(5):
            rl, rh = _rotl(c[(x + 1) % 5][0], c[(x + 1) % 5][1], 1)
            d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
        a = [(a[i][0] ^ d[i % 5][0], a[i][1] ^ d[i % 5][1]) for i in range(25)]
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl(
                    a[x + 5 * y][0], a[x + 5 * y][1], H.ROTATIONS[x][y]
                )
        a = [
            (
                b[i][0] ^ (~b[(i % 5 + 1) % 5 + 5 * (i // 5)][0] & b[(i % 5 + 2) % 5 + 5 * (i // 5)][0]),
                b[i][1] ^ (~b[(i % 5 + 1) % 5 + 5 * (i // 5)][1] & b[(i % 5 + 2) % 5 + 5 * (i // 5)][1]),
            )
            for i in range(25)
        ]
        a[0] = (a[0][0] ^ np.uint32(rc & 0xFFFFFFFF), a[0][1] ^ np.uint32(rc >> 32))
    return a


def _absorb_blocks(words_lo: list, words_hi: list, n: int) -> list:
    """Sponge over a static number of u64 words (already 0x01…0x80 padded to
    a multiple of 17). words_*: lists of (n,) uint32 lanes."""
    zero = jnp.zeros((n,), jnp.uint32)
    state = [(zero, zero) for _ in range(25)]
    nwords = len(words_lo)
    assert nwords % RATE_WORDS == 0
    for off in range(0, nwords, RATE_WORDS):
        state = [
            (
                state[i][0] ^ words_lo[off + i] if i < RATE_WORDS else state[i][0],
                state[i][1] ^ words_hi[off + i] if i < RATE_WORDS else state[i][1],
            )
            for i in range(25)
        ]
        state = keccak_f(state)
    return state


def _pad_words(words_lo: list, words_hi: list, tail_bytes: int, n: int):
    """Apply Keccak pad10*1 given full u64 words plus ``tail_bytes`` == 0
    (the felt-row case: lengths are multiples of 8)."""
    assert tail_bytes == 0
    zero = jnp.zeros((n,), jnp.uint32)
    # 0x01 goes into the first byte of the next word.
    words_lo = list(words_lo) + [zero + np.uint32(1)]
    words_hi = list(words_hi) + [zero]
    while len(words_lo) % RATE_WORDS != 0:
        words_lo.append(zero)
        words_hi.append(zero)
    # 0x80 in the final byte of the block.
    words_hi[-1] = words_hi[-1] ^ np.uint32(0x80000000)
    return words_lo, words_hi


def hash_felt_rows(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Keccak256::hash_elements per row: (n, w) canonical felts → (n, 8) u32
    digests (LE word layout, matching blake3.hash_felt_rows)."""
    n, w = lo.shape
    words_lo = [lo[:, j].astype(jnp.uint32) for j in range(w)]
    words_hi = [hi[:, j].astype(jnp.uint32) for j in range(w)]
    words_lo, words_hi = _pad_words(words_lo, words_hi, 0, n)
    state = _absorb_blocks(words_lo, words_hi, n)
    out = []
    for i in range(4):
        out.append(state[i][0])
        out.append(state[i][1])
    return jnp.stack(out, axis=1)


def compress_pairs(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Merkle merge: keccak256(left_bytes || right_bytes) per row."""
    n = left.shape[0]
    words_lo = [left[:, 2 * i] for i in range(4)] + [right[:, 2 * i] for i in range(4)]
    words_hi = [left[:, 2 * i + 1] for i in range(4)] + [right[:, 2 * i + 1] for i in range(4)]
    words_lo, words_hi = _pad_words(words_lo, words_hi, 0, n)
    state = _absorb_blocks(words_lo, words_hi, n)
    out = []
    for i in range(4):
        out.append(state[i][0])
        out.append(state[i][1])
    return jnp.stack(out, axis=1)


def digests_to_bytes(digests: np.ndarray) -> list[bytes]:
    """(n, 8) u32 → 32-byte digest strings."""
    arr = np.asarray(digests, dtype="<u4")
    return [row.tobytes() for row in arr]
