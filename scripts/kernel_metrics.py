#!/usr/bin/env python3
"""Kernel roofline metrics on the current backend.

Reports the two BASELINE.json-named kernel metrics the e2e numbers
stand on: Poseidon2 permutations/s (the Pallas width-12 kernel at the
LMCS leaf-hash shape) and Goldilocks NTT Melem/s (the four-step coset
LDE at the 2^17 x 51 main-commit shape). One JSON line per metric.

    python scripts/kernel_metrics.py            # real TPU
    KM_LOG_N=16 KM_WIDTH=51 ... python scripts/kernel_metrics.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench(fn, *args, reps=10):
    # force completion with a host readback: block_until_ready over the
    # axon tunnel returns before the device queue drains, which once made
    # this report dispatch latency as a 5000 Mperm/s "throughput"
    out = fn(*args)
    np.asarray(out.lo[:1, :1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out.lo[:1, :1])
    return (time.time() - t0) / reps


def main() -> None:
    import jax

    from miden_tpu.field import gl
    from miden_tpu.field.goldilocks import fp_from_u64
    from miden_tpu.hash.poseidon2_pallas import permute_pallas
    from miden_tpu.ntt import ntt

    rng = np.random.default_rng(0)

    # Poseidon2: (12, n) lane-major permutations, the leaf-hash shape
    n = 1 << int(os.environ.get("KM_PERM_LOG_N", "18"))
    state = fp_from_u64(
        rng.integers(0, gl.P, size=(12, n), dtype=np.uint64)
    )
    dt = _bench(permute_pallas, state)
    print(
        json.dumps(
            {
                "metric": f"poseidon2_pallas_perms_per_s_12x{n}",
                "value": round(n / dt / 1e6, 2),
                "unit": "Mperm/s",
            }
        ),
        flush=True,
    )

    # NTT: coset LDE at the main-commit shape (rows x width, blowup 8)
    log_n = int(os.environ.get("KM_LOG_N", "17"))
    width = int(os.environ.get("KM_WIDTH", "51"))
    mat = fp_from_u64(
        rng.integers(0, gl.P, size=(1 << log_n, width), dtype=np.uint64)
    )
    shift = gl.canonical_lde_shift(log_n + 3)
    dt = _bench(ntt.coset_lde_jit, mat, 3, shift, reps=5)
    # one LDE = forward NTT (n) + 8 inverse-size transforms; count
    # processed elements as rows x width x (1 + blowup) per pass
    melem = (1 << log_n) * width * 9 / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"goldilocks_ntt_lde_melem_per_s_2^{log_n}x{width}",
                "value": round(melem, 1),
                "unit": "Melem/s",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
