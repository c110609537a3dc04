"""Full multi-chip STARK prove over a row-sharded device mesh.

``prove_sharded`` runs the COMPLETE pipeline of
:func:`miden_tpu.stark.prover.prove` — trace commit, aux build, constraint
evaluation, quotient, DEEP, FRI, queries — with the trace-row axis sharded
over the mesh:

- input traces are placed with a contiguous row sharding;
- the trace/quotient commits run the explicit sharded kernels (butterfly
  ``ppermute`` stages in :mod:`ntt_dist`, local-subtree + collective-top
  Merkle in :mod:`lmcs_dist`) via the :mod:`context` hook;
- every remaining stage (constraint eval, α/β folds, DEEP reduction, FRI
  folds) is elementwise or reshape-local over rows and partitions under
  XLA GSPMD from the sharded inputs — the same scoping the reference
  applies to rayon (hot loops parallel, choreography serial; SURVEY §2.8).

The produced proof is BIT-IDENTICAL to the single-device one: every hash
absorbs rows in domain order regardless of layout, and all arithmetic is
exact. tests/test_dist.py asserts transcript equality on the 8-device
virtual mesh; the driver's ``dryrun_multichip`` executes this path.
"""

from __future__ import annotations

from ..stark.params import PcsParams  # noqa: F401  (re-export for callers)
from ..stark.prover import Statement, StarkOutput, prove
from .context import use_mesh



def prove_sharded(params, statement: Statement, traces, challenger, mesh) -> StarkOutput:
    """Prove with trace rows sharded over ``mesh``.

    ``traces``: numpy u64 or device Fp matrices, instance order. Sharding
    happens at the commit boundary (the first device placement): the
    sharded LDE kernel row-shards its input and emits sharded LDEs, so the
    committed matrices — and everything derived from them downstream — are
    sharded without the host-side aux builders ever seeing device arrays.
    """
    with use_mesh(mesh):
        return prove(params, statement, list(traces), challenger)
