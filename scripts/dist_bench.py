#!/usr/bin/env python3
"""Sharded-prove bench: the committed repro for MULTICHIP_SPANS.md.

Proves the Miden-shaped statement (bench_airs.miden_shaped_statement)
with trace rows sharded over an n-device mesh, verifies host-side, and
checks the transcript BYTE-IDENTICAL against the single-device prove.

Defaults reproduce the 2^14 8-device virtual-CPU-mesh table in
MULTICHIP_SPANS.md:

    python scripts/dist_bench.py                 # 2^14, 8 CPU devices
    DIST_LOG_N=12 DIST_DEVICES=4 python scripts/dist_bench.py
    DIST_PARAMS=test python scripts/dist_bench.py   # TEST_PARAMS profile
    DIST_SKIP_SINGLE=1 ...                       # skip the identity check

On real multi-chip hardware drop the CPU override via DIST_PLATFORM=.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_dev = int(os.environ.get("DIST_DEVICES", "8"))
if os.environ.get("DIST_PLATFORM", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n_dev}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
else:
    import jax

from miden_tpu.bench_airs import miden_shaped_statement
from miden_tpu.dist import make_mesh
from miden_tpu.dist.prover import prove_sharded
from miden_tpu.stark.params import MIDEN_PARAMS, TEST_PARAMS
from miden_tpu.stark.prover import prove
from miden_tpu.stark.verifier import verify
from miden_tpu.transcript.challenger import DuplexChallenger


def main() -> None:
    log_n = int(os.environ.get("DIST_LOG_N", "14"))
    params = (
        TEST_PARAMS if os.environ.get("DIST_PARAMS") == "test" else MIDEN_PARAMS
    )
    seed = [0x6D69, 0x6465, 0x6E2D, 0x7470]
    statement, traces = miden_shaped_statement(log_n)
    mesh = make_mesh(n_dev)

    t0 = time.time()
    out_s = prove_sharded(params, statement, traces, DuplexChallenger(seed), mesh)
    first_s = time.time() - t0
    t0 = time.time()
    out_s = prove_sharded(params, statement, traces, DuplexChallenger(seed), mesh)
    steady_s = time.time() - t0
    t0 = time.time()
    verify(params, statement, out_s.proof, DuplexChallenger(seed))
    verify_s = time.time() - t0
    print(
        f"sharded 2^{log_n} x{n_dev}dev: first {first_s:.1f}s, "
        f"steady {steady_s:.1f}s, verify {verify_s:.1f}s, "
        f"proof {out_s.proof.size_in_bytes()} B",
        flush=True,
    )

    if os.environ.get("DIST_SKIP_SINGLE") != "1":
        out_1 = prove(params, statement, traces, DuplexChallenger(seed))
        assert out_s.digest == out_1.digest, "sharded digest mismatch"
        assert out_s.proof.data.fields == out_1.proof.data.fields
        assert out_s.proof.data.commitments == out_1.proof.data.commitments
        print("sharded transcript BYTE-IDENTICAL to single-device", flush=True)


if __name__ == "__main__":
    main()
