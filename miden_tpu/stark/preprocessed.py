"""Preprocessed data: fixed per-AIR matrices + their committed LDE tree.

Preprocessed columns are fixed circuit data (lookup tables, selectors)
declared by an :class:`Air` via ``preprocessed_trace()`` and committed once
at setup. The prover holds the cached raw matrices plus their LDE tree; the
verifier holds only the commitment — a trusted setup input, like the AIR
list itself, observed into Fiat–Shamir before the statement.

Reference: crates/lifted-stark/src/preprocessed.rs (Preprocessed::build,
validate_preprocessed); used by the precompile VM's byte-pair LUT
(precompiles-prover/src/primitives/byte_pair_lut.rs).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gl
from ..merkle import lmcs
from ..ntt import ntt
from ..field.goldilocks import fp_from_u64
from .params import PcsParams


@dataclass
class Preprocessed:
    """``traces[i]`` is the raw matrix for AIR ``i`` (instance order), None
    where the AIR declares none. ``tree`` commits one LDE per preprocessed
    AIR sorted by (height, air index) — the committed trace order both
    sides reproduce (preprocessed.rs:100-113)."""

    traces: list
    tree: lmcs.LmcsTree
    # committed order: instance indices of preprocessed AIRs, (height, idx)
    order: list

    def commitment(self) -> tuple:
        return tuple(int(v) for v in self.tree.root())

    def trace_index_for_air(self) -> dict:
        """instance air index -> committed preprocessed trace index."""
        return {air_idx: t for t, air_idx in enumerate(self.order)}


def build_preprocessed(statement, params: PcsParams):
    """Build the bundle from a statement's AIRs, or None when no AIR
    declares preprocessed columns (Preprocessed::build).

    Under an active dist mesh this reuses :func:`commit_traces`-style
    placement via the plain jitted LDE — preprocessed matrices are setup
    data, built once, so sharding them buys nothing."""
    airs = statement.multi_air.airs
    traces = [a.preprocessed_trace() for a in airs]
    if all(t is None for t in traces):
        return None
    pairs = [
        (i, np.asarray(t, dtype=np.uint64))
        for i, t in enumerate(traces)
        if t is not None
    ]
    for i, t in pairs:
        n, w = t.shape
        assert n & (n - 1) == 0, f"AIR {i}: preprocessed height not a power of two"
        assert w == airs[i].preprocessed_width, (
            f"AIR {i}: preprocessed width {w} != declared {airs[i].preprocessed_width}"
        )
    pairs.sort(key=lambda p: (p[1].shape[0], p[0]))
    ldes = []
    for i, t in pairs:
        n = t.shape[0]
        shift = gl.canonical_lde_shift((n.bit_length() - 1) + params.log_blowup)
        ldes.append(ntt.coset_lde_jit(fp_from_u64(t), params.log_blowup, shift))
    tree = lmcs.build_tree(ldes, hash=params.lmcs_hash())
    return Preprocessed(traces=traces, tree=tree, order=[i for i, _ in pairs])


def validate_preprocessed(statement, traces, preprocessed: Preprocessed, params: PcsParams):
    """Shape checks at prove time (validate_preprocessed, preprocessed.rs:160):
    presence parity per AIR, width vs declaration, height vs the main trace,
    committed LDE height vs this config's blowup."""
    airs = statement.multi_air.airs
    if len(preprocessed.traces) != len(airs):
        raise ValueError("preprocessed raw trace count mismatch")
    for i, (a, raw) in enumerate(zip(airs, preprocessed.traces)):
        declared = a.preprocessed_width > 0
        if (raw is not None) != declared:
            raise ValueError(f"AIR {i}: preprocessed presence mismatch")
        if raw is None:
            continue
        raw = np.asarray(raw)
        if raw.shape[1] != a.preprocessed_width:
            raise ValueError(f"AIR {i}: preprocessed width mismatch")
        if raw.shape[0] != traces[i].shape[0]:
            raise ValueError(
                f"AIR {i}: preprocessed height {raw.shape[0]} != main trace "
                f"height {traces[i].shape[0]}"
            )
    for t, air_idx in enumerate(preprocessed.order):
        exp_h = traces[air_idx].shape[0] << params.log_blowup
        if preprocessed.tree.heights[t] != exp_h:
            raise ValueError(
                f"preprocessed trace {t}: committed LDE height "
                f"{preprocessed.tree.heights[t]} != expected {exp_h}"
            )
        if preprocessed.tree.widths[t] != airs[air_idx].preprocessed_width:
            raise ValueError(f"preprocessed trace {t}: committed width mismatch")
