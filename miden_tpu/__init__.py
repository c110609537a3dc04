"""miden_tpu: TPU-native STARK proving framework for the Miden VM pipeline.

Built from scratch in JAX/XLA: Goldilocks field as packed 32-bit limb
arrays, batched Poseidon2, radix-2 NTT/LDE, lifted Merkle commitments, a
device-resident Fiat-Shamir challenger, and the full lifted-STARK
prover/verifier.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: compiled kernels (permutation, NTT stages,
# constraint evaluators) are shape-keyed; caching across processes removes
# recompilation from every run after the first.
_cache_dir = _os.environ.get(
    "MIDEN_TPU_JAX_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
)
try:
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass
