"""Batched BLAKE3 on TPU (JAX, uint32 lanes).

Row-parallel kernels for the Blake3 LMCS configs (reference
air/src/config.rs:236 `blake3_256_config`): every trace row (a vector of
u64 Goldilocks felts, hashed as their LE bytes per
crates/crypto/src/hash/blake/mod.rs:126) maps to one digest, and Merkle
layers merge digest pairs with ``blake3(left || right)``.

BLAKE3 is pure 32-bit add/xor/rotate — a perfect fit for the VPU: the state
is 16 lanes of shape-(n,) uint32 vectors, rounds fully unrolled (7 rounds ×
8 G-mixes), compile-time message schedule. Rows up to 1024 bytes (128
felts) stay within one BLAKE3 chunk, so the per-row chain is a static
sequence of ≤16 compressions.

Ground truth: blake3_host.py (same module family as poseidon2/_host).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import blake3_host as H

_IV = tuple(np.uint32(x) for x in H.IV)


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _g(s: list, a: int, b: int, c: int, d: int, mx, my) -> None:
    s[a] = s[a] + s[b] + mx
    s[d] = _rotr(s[d] ^ s[a], 16)
    s[c] = s[c] + s[d]
    s[b] = _rotr(s[b] ^ s[c], 12)
    s[a] = s[a] + s[b] + my
    s[d] = _rotr(s[d] ^ s[a], 8)
    s[c] = s[c] + s[d]
    s[b] = _rotr(s[b] ^ s[c], 7)


def compress(cv: list, m: list, counter: int, block_len: int, flags: int) -> list:
    """Vectorized compression: cv = 8 (n,) u32 lanes, m = 16 lanes."""
    zero = jnp.zeros_like(cv[0])
    s = list(cv) + [
        zero + _IV[0], zero + _IV[1], zero + _IV[2], zero + _IV[3],
        zero + np.uint32(counter & 0xFFFFFFFF),
        zero + np.uint32((counter >> 32) & 0xFFFFFFFF),
        zero + np.uint32(block_len),
        zero + np.uint32(flags),
    ]
    for r in range(7):
        _g(s, 0, 4, 8, 12, m[0], m[1])
        _g(s, 1, 5, 9, 13, m[2], m[3])
        _g(s, 2, 6, 10, 14, m[4], m[5])
        _g(s, 3, 7, 11, 15, m[6], m[7])
        _g(s, 0, 5, 10, 15, m[8], m[9])
        _g(s, 1, 6, 11, 12, m[10], m[11])
        _g(s, 2, 7, 8, 13, m[12], m[13])
        _g(s, 3, 4, 9, 14, m[14], m[15])
        if r != 6:
            m = [m[p] for p in H.MSG_PERMUTATION]
    return [s[i] ^ s[i + 8] for i in range(8)]


def _felts_to_words(lo: jnp.ndarray, hi: jnp.ndarray) -> list:
    """(n, w) packed-limb felts → 2w u32 message lanes (LE u64 layout:
    low word first). ``lo``/``hi`` are the canonical 32-bit halves."""
    n, w = lo.shape
    out = []
    for j in range(w):
        out.append(lo[:, j].astype(jnp.uint32))
        out.append(hi[:, j].astype(jnp.uint32))
    return out


def hash_felt_rows(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Hash each row of canonical felts to a 32-byte digest: (n, 8) u32.

    Semantics: Blake3_256::hash_elements = blake3 over the rows' LE u64
    bytes. Row byte length w*8 must stay within one chunk (w ≤ 128).
    """
    n, w = lo.shape
    nbytes = w * 8
    assert nbytes <= H.CHUNK_LEN, "row exceeds one BLAKE3 chunk"
    words = _felts_to_words(lo, hi)
    zero = jnp.zeros((n,), jnp.uint32)
    cv = [zero + iv for iv in _IV]
    nblocks = max(1, (nbytes + H.BLOCK_LEN - 1) // H.BLOCK_LEN)
    for b in range(nblocks):
        blk = words[b * 16 : (b + 1) * 16]
        block_len = min(H.BLOCK_LEN, nbytes - b * H.BLOCK_LEN)
        blk = blk + [zero] * (16 - len(blk))
        flags = (H.CHUNK_START if b == 0 else 0) | (
            (H.CHUNK_END | H.ROOT) if b == nblocks - 1 else 0
        )
        cv = compress(cv, blk, 0, block_len, flags)
    return jnp.stack(cv, axis=1)


def compress_pairs(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Merkle merge: blake3(left_bytes || right_bytes) per row.

    left/right: (n, 8) u32 digests → (n, 8) u32. A 64-byte input is one
    full block: flags = CHUNK_START | CHUNK_END | ROOT (as pinned by the
    reference's in-VM 2-to-1 hasher, crates/lib/core/asm/crypto/hashes/
    blake3.masm:31 `push.11.64.0.0`).
    """
    n = left.shape[0]
    zero = jnp.zeros((n,), jnp.uint32)
    cv = [zero + iv for iv in _IV]
    m = [left[:, i] for i in range(8)] + [right[:, i] for i in range(8)]
    out = compress(cv, m, 0, H.BLOCK_LEN, H.CHUNK_START | H.CHUNK_END | H.ROOT)
    return jnp.stack(out, axis=1)


def digests_to_bytes(digests: np.ndarray, out_len: int = 32) -> list[bytes]:
    """(n, 8) u32 → list of digest byte strings (LE words)."""
    arr = np.asarray(digests, dtype="<u4")
    return [row.tobytes()[:out_len] for row in arr]
