#!/usr/bin/env python3
"""Benchmark: end-to-end STARK proof wall-clock on real TPU.

Proves a Miden-shaped 3-AIR statement (51-col core + 8 EF aux at 2^LOG_N,
22-col chiplets at 2^(LOG_N-2), 16-col poseidon2 at 2^(LOG_N-4); blowup 8,
FRI arity 4, 27 queries, PoW 16/12/4 — the production protocol profile) and
prints ONE JSON line.

Baseline: the reference Rust prover at 2^20 rows with the Poseidon2 STARK
hash takes 6.9 s on a 64-thread AMD EPYC 9R45 (BASELINE.md; README.md:154).
``vs_baseline`` = baseline_seconds / our_seconds at the benched size
(baseline scaled linearly in rows from 2^20), so > 1.0 means faster than the
64-core Rust prover.

The driver runs this under a time box, so the bench is timeout-robust: it
sweeps sizes smallest-first (2^14 -> 2^16 -> 2^18 -> 2^20), then — budget
permitting — the real-program VM row (BENCH_VM shape: fibonacci MASM at
2^18 core rows through the C interpreter + the real VM AIRs), printing and
flushing one JSON line per row AS SOON AS it completes. A timeout
truncates the record to the sizes that finished instead of voiding it; the
last flushed line is always the largest completed size.

Env:
  BENCH_LOG_N     force a single core-trace log2 height (skips the sweep)
  BENCH_SIZES     comma-separated log2 heights for the sweep (default
                  "14,16,18,20")
  BENCH_BUDGET_S  wall-clock budget in seconds (default 3600); a size is
                  skipped if the remaining budget is clearly insufficient.
                  The per-size flush makes an external timeout truncate
                  the record to completed sizes, so a budget larger than
                  the driver's box costs nothing
  BENCH_REPS      steady-state repetitions per size (default 3)
  BENCH_VERIFY    "1" to also verify the proof (off by default; verification
                  is host-side and not the benched quantity)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_2P20_S = 6.9  # EPYC 9R45 64T, Poseidon2 hash, 2^20 rows


def bench_vm() -> None:
    """BENCH_VM=1: prove a real MASM execution end-to-end (assemble →
    C-interpreted execute+trace → real VM AIRs → STARK) and verify it.

    Default program: a fibonacci loop sized for a 2^18-row core trace
    (BENCH_VM_REPS overrides; each rep is 3 VM ops). The benched quantity
    is the full prove_program wall-clock including execution and trace
    generation, mirroring the reference's e2e_prove primary CI metric
    (benches/blake3-bench/src/lib.rs:29)."""
    from miden_tpu.vm.assembler import assemble
    from miden_tpu.vm.prove import prove_program, verify_program

    reps = int(os.environ.get("BENCH_VM_REPS", "84000"))
    src = (
        "begin push.0 push.1 "
        + f"repeat.{reps} swap dup.1 add end "
        + "swap drop swap drop end"
    )
    prog = assemble(src)
    out, proof = prove_program(prog)  # warm-up (compiles are cached)
    t0 = time.time()
    out, proof = prove_program(prog)
    steady_s = time.time() - t0
    verify_program(proof)
    n_rows = 1 << max(proof.stark.log_heights)
    baseline_s = BASELINE_2P20_S * n_rows / (1 << 20)
    print(
        json.dumps(
            {
                "metric": f"e2e_vm_prove_verify_masm_2^{max(proof.stark.log_heights)}",
                "value": round(steady_s, 3),
                "unit": "s",
                "vs_baseline": round(baseline_s / steady_s, 4),
                "proof_bytes": proof.stark.size_in_bytes(),
                "top_of_stack": out.stack[0],
            }
        )
    )


def _bench_one_size(log_n: int, reps: int) -> tuple:
    """Prove the Miden-shaped statement at 2^log_n and print ONE flushed
    JSON line. Compilation is persistently cached, so ``first_run_s`` is
    dominated by cache load / re-trace on a warm host. Returns
    ``(first_s, steady_s)`` for the budget estimator."""
    from miden_tpu.bench_airs import miden_shaped_statement
    from miden_tpu.stark import MIDEN_PARAMS, prove
    from miden_tpu.transcript.challenger import DuplexChallenger

    seed = [0x6D69, 0x6465, 0x6E2D, 0x7470]  # domain separator
    statement, traces = miden_shaped_statement(log_n)

    t_start = time.time()
    out = prove(MIDEN_PARAMS, statement, traces, DuplexChallenger(seed))
    first_s = time.time() - t_start

    times = []
    for _ in range(reps):
        t_start = time.time()
        out = prove(MIDEN_PARAMS, statement, traces, DuplexChallenger(seed))
        times.append(time.time() - t_start)
    times.sort()
    steady_s = times[len(times) // 2]

    if os.environ.get("BENCH_VERIFY") == "1":
        from miden_tpu.stark import verify

        digest = verify(MIDEN_PARAMS, statement, out.proof, DuplexChallenger(seed))
        assert digest == out.digest

    baseline_s = BASELINE_2P20_S * (1 << log_n) / (1 << 20)
    print(
        json.dumps(
            {
                "metric": f"e2e_prove_2^{log_n}_miden_shaped",
                "value": round(steady_s, 3),
                "unit": "s",
                "vs_baseline": round(baseline_s / steady_s, 4),
                "first_run_s": round(first_s, 3),
                "runs_s": [round(t, 3) for t in times],
                "proof_bytes": out.proof.size_in_bytes(),
            }
        ),
        flush=True,
    )
    return first_s, steady_s


def main() -> None:
    if os.environ.get("BENCH_VM") == "1":
        bench_vm()
        return
    reps = int(os.environ.get("BENCH_REPS", "3"))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "3600"))

    forced = os.environ.get("BENCH_LOG_N")
    if forced is not None:
        _bench_one_size(int(forced), reps)
        return

    sizes = [int(s) for s in os.environ.get("BENCH_SIZES", "14,16,18,20").split(",")]
    t0 = time.time()
    prev = None  # (first_s, steady_s) of the previous size
    for log_n in sizes:
        remaining = budget_s - (time.time() - t0)
        # Next-size estimate: steady cost scales ~4x in rows; the
        # first-run overhead (re-trace + compile-cache load) grows much
        # slower than 4x — budget 2x the previous overhead. The round-4
        # record was voided by estimating with 5x the previous TOTAL
        # (dominated by one-off compile), overshooting the real cost
        # ~4x. The per-size stdout flush makes an overrun safe anyway
        # (an external timeout truncates to completed sizes), so bias
        # toward attempting.
        if prev is not None:
            first_s, steady_s = prev
            overhead = max(first_s - steady_s, 0.0)
            estimate = 2.0 * overhead + 4.0 * steady_s * (reps + 1)
            if remaining < estimate:
                # stderr, NOT stdout: the driver parses the last stdout
                # JSON line, which must stay the largest completed size.
                print(
                    f"bench: budget exhausted before 2^{log_n} "
                    f"({remaining:.0f}s remaining < estimate {estimate:.0f}s)",
                    file=sys.stderr,
                    flush=True,
                )
                return
        prev = _bench_one_size(log_n, reps)

    # The real-program row (the reference's e2e_prove primary CI metric
    # shape): a MASM fibonacci loop through assemble → C-interpreted
    # execute+trace → the real VM AIRs → fused STARK + host verify. Runs
    # after the shaped sweep when budget remains.
    if prev is not None and os.environ.get("BENCH_SKIP_VM") != "1":
        first_s, steady_s = prev
        # The VM row's phases are warmed in-round; on a warm cache its
        # first run costs a fraction of the largest shaped size's
        # overhead. An overrun is safe regardless: the per-row flush
        # means an external timeout keeps the shaped record intact.
        estimate = 0.5 * max(first_s - steady_s, 0.0) + 2.0 * steady_s + 120.0
        remaining = budget_s - (time.time() - t0)
        if remaining < estimate:
            print(
                f"bench: budget exhausted before the VM row "
                f"({remaining:.0f}s remaining < estimate {estimate:.0f}s)",
                file=sys.stderr,
                flush=True,
            )
            return
        bench_vm()


if __name__ == "__main__":
    main()
