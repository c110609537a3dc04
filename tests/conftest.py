"""Test configuration: force CPU with 8 virtual devices before importing JAX.

Mirrors the reference's strategy of testing parallel logic without a cluster
(SURVEY.md §4): sharded kernels run on a host-local virtual mesh and are
asserted bit-exact against the single-device / pure-Python ground truth.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
