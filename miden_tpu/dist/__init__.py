"""Distributed (multi-chip) proving components.

TPU-native replacement for the reference's rayon row-parallelism
(SURVEY.md §2.8): the trace-row axis is sharded over a
``jax.sharding.Mesh`` and each pipeline stage runs under ``shard_map``
with explicit ICI collectives —

- :mod:`ntt_dist` — coset LDE with the first/last ``log2(D)`` butterfly
  stages exchanged via ``ppermute`` (reference analog: p3-dft's rayon
  ``Radix2DitParallel``, crates/lifted-stark/src/prover/commit.rs:173);
- :mod:`lmcs_dist` — LMCS commitment with per-shard local subtrees and a
  collective gather of the shard roots for the replicated top layers
  (reference analog: lmcs/lifted_tree.rs:81-100 parallel layers);
- :mod:`context` — the ``use_mesh`` hook that routes the prover's commit
  stages through the sharded kernels;
- :mod:`prover` — ``prove_sharded``: the FULL prove pipeline with sharded
  trace rows (constraint eval / DEEP / FRI partition under GSPMD from the
  sharded inputs; reference analog: row-block parallel eval,
  prover/constraints/mod.rs:31).

Everything is bit-exact with the single-device pipeline (hashes and
transcripts are order-sensitive; the tests in tests/test_dist.py assert
equality against the single-device ground truth on an 8-device mesh).
"""

from .mesh import make_mesh, shard_rows, replicate
from .context import use_mesh, active_mesh

__all__ = ["make_mesh", "shard_rows", "replicate", "use_mesh", "active_mesh"]
