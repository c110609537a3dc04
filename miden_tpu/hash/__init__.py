"""Cryptographic hashing (SURVEY.md §2.1, crates/crypto/src/hash).

Device-batched row hashers for the proving path plus exact host twins:

- ``poseidon2`` / ``poseidon2_host`` — the algebraic sponge (recursion- and
  Merkle-relevant; width 12, rate 8, digest 4)
- ``blake3`` / ``blake3_host`` — byte hasher for the blake3 LMCS configs
- ``keccak`` / ``keccak_host`` — Keccak-256 (config + precompile witness)
- ``sha2`` — SHA-256 (host)
- ``stateful`` — incremental StatefulHasher/StatefulSponge/ChainingHasher
  API (crates/stateful-hasher)
"""

from . import (  # noqa: F401
    blake3,
    blake3_host,
    constants,
    keccak,
    keccak_host,
    poseidon2,
    poseidon2_host,
    sha2,
    stateful,
)
