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
_depth = 0


@contextlib.contextmanager
def span(name: str, **fields):
    global _depth
    if not _ENABLED:
        yield
        return
    t0 = time.time()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        extra = " ".join(f"{k}={v}" for k, v in fields.items())
        print(
            f"[trace] {'  ' * _depth}{name} {extra} {time.time() - t0:.3f}s",
            flush=True,
        )
