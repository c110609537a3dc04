"""Digital signature schemes (SURVEY.md §2.1, crates/crypto/src/dsa).

Host-side crypto — signatures are produced/checked by the host and enter the
proving path only as advice data (the VM verifies them in-circuit via MASM
programs), so these are exact scalar implementations, not device kernels:

- ``ecdsa_k256`` — ECDSA over secp256k1, Keccak-256 message hashing,
  recoverable (r, s, v) signatures (dsa/ecdsa_k256_keccak/mod.rs)
- ``ed25519`` — EdDSA over Curve25519 per RFC 8032, SHA-512
  (dsa/eddsa_25519_sha512/mod.rs)
- ``falcon512`` — Falcon-512 lattice signatures with Poseidon2
  hash-to-point (dsa/falcon512_poseidon2/)
"""

from . import ecdsa_k256, ed25519, falcon512  # noqa: F401
