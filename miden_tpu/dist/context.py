"""Active-mesh context: routes the prover's heavy stages to sharded twins.

``prove()`` itself is layout-agnostic — every stage consumes whatever
arrays it is given. Entering :func:`use_mesh` makes the two stages where
layout is performance-critical (trace/quotient commitment: NTT butterflies
+ Merkle tree folds) build their explicitly-sharded versions
(:mod:`ntt_dist`, :mod:`lmcs_dist`); every other stage is elementwise or
small and partitions correctly under XLA's GSPMD once its inputs are
sharded. This mirrors how the reference scopes rayon parallelism to the
hot loops (SURVEY.md §2.8) rather than threading a pool through every
function signature.
"""

from __future__ import annotations

from contextlib import contextmanager

_ACTIVE = None


def active_mesh():
    """The mesh set by the innermost :func:`use_mesh`, or None."""
    return _ACTIVE


@contextmanager
def use_mesh(mesh):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        yield mesh
    finally:
        _ACTIVE = prev
