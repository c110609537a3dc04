"""stdlib crypto::hashes::blake3 — in-VM BLAKE3 vs the host implementation.

The reference's headline benchmark program is an in-VM blake3 hash chain
(masm-examples/hashing/blake3_1to1, README.md:115-141); this module pins
our stdlib blake3 against hash/blake3_host.py on the same contracts.
"""

import pytest

from miden_tpu.hash.blake3_host import blake3
from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
from miden_tpu.vm.processor import execute


def _words(data: bytes) -> list[int]:
    return [
        int.from_bytes(data[4 * i : 4 * i + 4], "little")
        for i in range(len(data) // 4)
    ]


def _run(src: str):
    prog = assemble_with_stdlib(src)
    return execute(prog, [], event_handlers=stdlib_event_handlers())


@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF])
def test_hash_2to1_matches_host(seed):
    data = bytes((seed * 31 + i * 7 + 3) % 256 for i in range(64))
    m = _words(data)
    want = _words(blake3(data))
    pushes = " ".join(f"push.{v}" for v in reversed(m))  # m0 ends on top
    src = f"""
    use miden::core::crypto::hashes::blake3
    begin
        {pushes}
        exec.blake3::hash_2to1
    end
    """
    out = _run(src)
    assert list(out.stack[0:8]) == want


@pytest.mark.parametrize("seed", [0, 5])
def test_hash_1to1_matches_host(seed):
    data = bytes((seed * 17 + i * 13 + 1) % 256 for i in range(32))
    m = _words(data)
    want = _words(blake3(data))
    pushes = " ".join(f"push.{v}" for v in reversed(m))
    src = f"""
    use miden::core::crypto::hashes::blake3
    begin
        {pushes}
        exec.blake3::hash_1to1
    end
    """
    out = _run(src)
    assert list(out.stack[0:8]) == want


def test_blake3_chain_matches_host():
    """The reference benchmark shape: iterated 1-to-1 hashing."""
    data = bytes(range(32))
    host = data
    for _ in range(4):
        host = blake3(host)
    m = _words(data)
    pushes = " ".join(f"push.{v}" for v in reversed(m))
    src = f"""
    use miden::core::crypto::hashes::blake3
    begin
        {pushes}
        repeat.4
            exec.blake3::hash_1to1
        end
    end
    """
    out = _run(src)
    assert list(out.stack[0:8]) == _words(host)
