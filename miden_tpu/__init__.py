"""miden_tpu — a TPU-native STARK proving framework for the Miden VM proof pipeline.

This package re-implements the proving stack of `0xMiden/miden-vm` (a Rust,
Plonky3-based "lifted STARK" over the 64-bit Goldilocks field) as a brand-new
TPU-first design on JAX/XLA/Pallas:

- ``field``      — Goldilocks base field + quadratic extension as packed 32-bit
                   limb arithmetic (TPU has no native 64-bit integer multiply).
- ``ntt``        — radix-2 NTT / iNTT and coset LDE with bit-reversed layout,
                   mirroring the semantics of p3-dft's ``coset_lde_batch``
                   (reference: crates/lifted-stark/src/prover/commit.rs:142-180).
- ``hash``       — batched Poseidon2 width-12 permutation + sponge
                   (reference: crates/crypto/src/hash/algebraic_sponge/poseidon2/).
- ``merkle``     — the Lifted Matrix Commitment Scheme (LMCS)
                   (reference: crates/lifted-stark/src/lmcs/).
- ``transcript`` — duplex-sponge Fiat-Shamir challenger + prover/verifier channels
                   (reference: crates/stark-transcript/).
- ``stark``      — domains, prover orchestration, DEEP-ALI, FRI, verifier
                   (reference: crates/lifted-stark/src/{domain,prover,pcs,verifier}).
- ``air``        — the LiftedAir interface + built-in AIRs
                   (reference: crates/lifted-air/).
- ``parallel``   — device-mesh sharded kernels (row-sharded NTT / Merkle).

The compute-heavy phases (LDE, Merkle hashing, constraint evaluation, DEEP
reduction, FRI folding) run on-device under ``jax.jit``; the tiny query phase,
grinding bookkeeping, and transcript live host-side.
"""

__version__ = "0.1.0"
