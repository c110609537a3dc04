"""Minimal phase tracing, span-name-compatible with the reference.

The reference instruments every pipeline stage with `tracing` spans
("LDE", "commit to main traces", "evaluate constraints", "quotient LDE",
"DEEP reduce + assemble", "FRI round commit", "FRI fold", grind spans —
SURVEY.md §5). Enable with MIDEN_TPU_TRACE=1 to print per-span wall times.
"""

from __future__ import annotations

import contextlib
import os
import time

_ENABLED = os.environ.get("MIDEN_TPU_TRACE") == "1"
# MIDEN_TPU_SYNC=1: insert a device barrier at each span boundary so span
# times reflect true device work (the prover is otherwise fully async and
# all time pools in the final readback). Debugging only — barriers cost
# a link round-trip each.
_SYNC = os.environ.get("MIDEN_TPU_SYNC") == "1"
_depth = 0


def _barrier() -> None:
    import jax
    import jax.numpy as jnp

    # TPU executes one stream in order: reading back a fresh trivial
    # computation waits for everything queued before it.
    jax.device_get(jnp.zeros(()) + 1)


@contextlib.contextmanager
def span(name: str, **fields):
    global _depth
    if not _ENABLED:
        yield
        return
    if _SYNC:
        _barrier()
    t0 = time.time()
    _depth += 1
    try:
        yield
        if _SYNC:
            _barrier()
    finally:
        _depth -= 1
        extra = " ".join(f"{k}={v}" for k, v in fields.items())
        print(
            f"[trace] {'  ' * _depth}{name} {extra} {time.time() - t0:.3f}s",
            flush=True,
        )
