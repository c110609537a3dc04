"""miden_tpu: TPU-native STARK proving framework for the Miden VM pipeline.

Built from scratch in JAX/XLA: Goldilocks field as packed 32-bit limb
arrays, batched Poseidon2, radix-2 NTT/LDE, lifted Merkle commitments, a
device-resident Fiat-Shamir challenger, and the full lifted-STARK
prover/verifier.
"""

import os as _os

import jax as _jax


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU serializes AOT executables with the *compiling* machine's
    target features; loading one on a host with different features is
    undefined (cpu_aot_loader errors, and in practice executables that
    hang). The repo cache travels across machines between rounds, so
    CPU-backend entries must be namespaced per host. TPU executables have
    no host-CPU dependence and share one directory."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


# Persistent compilation cache: compiled kernels (permutation, NTT stages,
# constraint evaluators) are shape-keyed; caching across processes removes
# recompilation from every run after the first.
_cache_dir = _os.environ.get(
    "MIDEN_TPU_JAX_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
)
# Namespace per host ONLY when the *primary* platform is CPU. The platform
# list is priority-ordered ("axon,cpu" means TPU with CPU fallback), so a
# substring test would wrongly send TPU executables — which have no host-CPU
# dependence and should be shared — into the per-host namespace, making the
# cache cold for every new process on a different host (the round-2 bench
# paid ~1500 s of recompilation per process because of exactly this).
_plat = _os.environ.get("JAX_PLATFORMS") or (_jax.config.jax_platforms or "")
if _plat.split(",")[0].strip() == "cpu":
    _cache_dir = _os.path.join(_cache_dir, "cpu-" + _host_fingerprint())
try:
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass
