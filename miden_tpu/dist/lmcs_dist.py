"""Row-sharded LMCS commitment over a device mesh.

The Merkle tree over ``max_h`` domain rows decomposes exactly at the shard
boundary: with ``D`` devices and contiguous row shards of ``S = max_h/D``
rows, every tree node at level ``j ≤ log2 S`` covers rows of a single
shard, so leaf hashing and the bottom ``log2 S`` digest layers are fully
local; the per-shard subtree roots are then ``all_gather``-ed (one (D,4)
collective on ICI) and the top ``log2 D`` layers fold replicated. The
result is layer-for-layer identical to :func:`miden_tpu.merkle.lmcs.build_tree`
— bit-exactness is structural, asserted in tests/test_dist.py.

Lifting (shorter matrices): domain row ``d`` reads matrix row ``d mod h``.
Within shard ``k`` that is a contiguous, power-of-two-aligned window of the
short matrix — a tile when ``h ≤ S``, a ``dynamic_slice`` at offset
``(k·S) mod h`` when ``h > S`` — so shorter matrices are replicated (they
are small by definition) and sliced shard-locally; no gather, no halo.

Reference analog: rayon-parallel leaf hashing + digest layers
(crates/lifted-stark/src/lmcs/lifted_tree.rs:81-100).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..field.goldilocks import Fp
from ..hash import poseidon2
from ..merkle import lmcs
from .mesh import ROWS, shard_rows, replicate


def _local_lift_rows(m: Fp, h: int, shard: int, k) -> Fp:
    """Rows ``[(k·S + j) mod h, j < S]`` of a height-``h`` matrix (S=shard)."""
    if h == shard:
        return m
    if h < shard:
        reps = shard // h
        return Fp(jnp.tile(m.lo, (reps, 1)), jnp.tile(m.hi, (reps, 1)))
    start = (k * shard) % h
    return Fp(
        jax.lax.dynamic_slice_in_dim(m.lo, start, shard, axis=0),
        jax.lax.dynamic_slice_in_dim(m.hi, start, shard, axis=0),
    )


def _fold_once(cur: Fp) -> Fp:
    n = cur.shape[0]
    left = Fp(cur.lo.reshape(n // 2, 2, 4)[:, 0], cur.hi.reshape(n // 2, 2, 4)[:, 0])
    right = Fp(cur.lo.reshape(n // 2, 2, 4)[:, 1], cur.hi.reshape(n // 2, 2, 4)[:, 1])
    return poseidon2.compress_pairs(left, right)


def build_tree_sharded(matrices, mesh) -> lmcs.LmcsTree:
    """Sharded twin of :func:`miden_tpu.merkle.lmcs.build_tree`.

    Max-height matrices are row-sharded over ``mesh``; shorter ones are
    replicated. Returns a regular :class:`LmcsTree` whose bottom layers are
    row-sharded global arrays and whose top ``log2 D`` layers are
    replicated — every consumer (openings, roots) is layout-agnostic.
    """
    matrices = list(matrices)
    heights = [m.shape[0] for m in matrices]
    widths = [m.shape[1] for m in matrices]
    max_h = max(heights)
    d = mesh.devices.size
    assert max_h % d == 0 and max_h // d >= 1, "shard must hold ≥ 1 row"
    shard = max_h // d
    log_local = shard.bit_length() - 1
    log_top = d.bit_length() - 1

    placed = tuple(
        shard_rows(m, mesh) if h == max_h else replicate(m, mesh)
        for m, h in zip(matrices, heights)
    )
    specs = tuple(
        P(ROWS, None) if h == max_h else P() for h in heights
    )

    local_specs = tuple(P(ROWS, None) for _ in range(log_local + 1))

    # Local subtrees under shard_map; the top log2(D) layers fold outside on
    # the (D, 4) shard-root layer — XLA inserts the all-gather, the fold
    # itself is D/2 tiny hashes replicated everywhere.
    @partial(jax.jit)
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=local_specs,
        check_vma=False,
    )
    def run_local(ms):
        k = jax.lax.axis_index(ROWS)
        parts_lo, parts_hi = [], []
        for m, h in zip(ms, heights):
            loc = _local_lift_rows(m, h, shard, k)
            w = loc.shape[1]
            pad = lmcs.aligned_width(w) - w
            lo, hi = loc.lo, loc.hi
            if pad:
                lo = jnp.pad(lo, [(0, 0), (0, pad)])
                hi = jnp.pad(hi, [(0, 0), (0, pad)])
            parts_lo.append(lo)
            parts_hi.append(hi)
        flat = Fp(jnp.concatenate(parts_lo, axis=1), jnp.concatenate(parts_hi, axis=1))
        total_w = flat.shape[1]
        blocks = flat.reshape(shard, total_w // lmcs.ALIGNMENT, lmcs.ALIGNMENT)
        cur = poseidon2.hash_blocks(blocks)
        local_layers = [cur]
        for _ in range(log_local):
            cur = _fold_once(cur)
            local_layers.append(cur)
        return tuple(local_layers)

    local_layers = list(run_local(placed))

    @jax.jit
    def fold_tops(shard_roots: Fp):
        cur = shard_roots
        tops = []
        while cur.shape[0] > 1:
            cur = _fold_once(cur)
            tops.append(cur)
        return tuple(tops)

    layers = local_layers
    if log_top:
        layers = layers + list(fold_tops(local_layers[-1]))

    return lmcs.LmcsTree(
        matrices=list(placed), heights=heights, widths=widths, layers=layers
    )
