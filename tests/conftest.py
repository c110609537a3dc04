"""Test configuration: force CPU with 8 virtual devices.

Mirrors the reference's strategy of testing parallel logic without a cluster
(SURVEY.md §4): the 8-device virtual mesh lets the ``dist`` sharding tests
(tests/test_dist.py) assert multi-device results bit-exact against the
single-device ground truth.

The environment pins ``JAX_PLATFORMS=axon`` (the real-TPU tunnel) and a
sitecustomize imports jax at interpreter start, so mutating ``os.environ``
here is too late for the platform choice — override via ``jax.config``
instead. ``XLA_FLAGS`` is still read lazily at backend init, so setting it
here (before any array op) works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
