"""stdlib crypto::hashes::sha256 — in-VM SHA-256 vs hashlib.

Reference contract: crates/lib/core/asm/crypto/hashes/sha256.masm
(hash_1to1 / hash_2to1, FIPS 180-4 big-endian word packing).
"""

import hashlib

import pytest

from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
from miden_tpu.vm.processor import execute


def _words_be(data: bytes) -> list[int]:
    return [
        int.from_bytes(data[4 * i : 4 * i + 4], "big")
        for i in range(len(data) // 4)
    ]


def _run(src: str):
    prog = assemble_with_stdlib(src)
    return execute(prog, [], event_handlers=stdlib_event_handlers())


@pytest.mark.parametrize("seed", [0, 3, 255])
def test_hash_1to1_matches_hashlib(seed):
    data = bytes((seed + 11 * i) % 256 for i in range(32))
    want = _words_be(hashlib.sha256(data).digest())
    pushes = " ".join(f"push.{v}" for v in reversed(_words_be(data)))
    src = f"""
    use miden::core::crypto::hashes::sha256
    begin
        {pushes}
        exec.sha256::hash_1to1
    end
    """
    out = _run(src)
    assert list(out.stack[0:8]) == want


@pytest.mark.parametrize("seed", [1, 77])
def test_hash_2to1_matches_hashlib(seed):
    data = bytes((seed * 3 + 5 * i) % 256 for i in range(64))
    want = _words_be(hashlib.sha256(data).digest())
    pushes = " ".join(f"push.{v}" for v in reversed(_words_be(data)))
    src = f"""
    use miden::core::crypto::hashes::sha256
    begin
        {pushes}
        exec.sha256::hash_2to1
    end
    """
    out = _run(src)
    assert list(out.stack[0:8]) == want


def test_sha256_chain_matches_hashlib():
    data = bytes(range(32))
    host = data
    for _ in range(3):
        host = hashlib.sha256(host).digest()
    pushes = " ".join(f"push.{v}" for v in reversed(_words_be(data)))
    src = f"""
    use miden::core::crypto::hashes::sha256
    begin
        {pushes}
        repeat.3
            exec.sha256::hash_1to1
        end
    end
    """
    out = _run(src)
    assert list(out.stack[0:8]) == _words_be(host)
