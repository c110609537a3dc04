"""Lifted Matrix Commitment Scheme (LMCS) on TPU.

One Merkle tree commits to several matrices of different power-of-two
heights (reference: crates/lifted-stark/src/lmcs/). Shorter matrices are
virtually lifted to the max height by **cyclic repetition in domain order**
(equivalently nearest-neighbor repetition in bit-reversed order — see the
equivalence note at lmcs/mod.rs:60-70): domain index ``d`` of the tree reads
row ``d mod h`` of a height-``h`` matrix, which equals the lifted polynomial
``f(X^{N/h})`` evaluated at the ``d``-th point of the max coset.

Unlike the reference (bit-reversed storage), this framework stores LDE
matrices in **natural domain order** throughout — the tree is domain-indexed
either way, so openings and FRI stay compatible with the protocol structure.

- Leaf ``d``: overwrite-mode Poseidon2 sponge over the row of every matrix at
  ``d mod h_i``, each row zero-padded to the sponge rate (alignment 8).
- Inner layers: TruncatedPermutation 2-to-1 compression of adjacent domain
  indices.
- Batch openings use a deduplicated Merkle witness: one shared sibling
  schedule (:func:`sibling_schedule`) drives both the prover's hint stream
  and the verifier's replay (reference lmcs/merkle_witness.rs).

Leaf hashing and tree layers run batched on device; opening extraction
gathers O(queries · log N) digests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import Fp, fp_concat, fp_from_u64, fp_to_u64
from ..hash import poseidon2
from ..hash import poseidon2_host

ALIGNMENT = 8  # sponge rate; rows are zero-padded to a multiple of this


@dataclass(frozen=True)
class LmcsHash:
    """Hash configuration for the tree (reference: per-hash LMCS types,
    air/src/config.rs:236-353).

    ``leaf_digests``: device, full padded leaf matrix ``Fp (h, W)`` ->
    ``Fp (h, 4)``. ``compress_pairs``: device ``Fp (m, 4) x 2 -> Fp (m, 4)``.
    Host twins recompute leaves/merges for the verifier. ``algebraic``
    configs produce canonical-felt digests (transcript-observable as 4
    elements); byte hashes produce raw u64 words."""

    name: str
    leaf_digests: object
    compress_pairs: object
    host_hash_elements: object  # list[int] -> [4]
    host_compress: object  # ([4],[4]) -> [4]
    algebraic: bool = True
    #: batched width-12 permutation ``Fp (12, n) -> Fp (12, n)`` for
    #: algebraic sponges — drives the incremental (streaming) leaf absorb.
    permute: object = None


def _sponge_hash(name, hash_blocks, compress_pairs, host_hash, host_compress,
                 permute=None):
    """Width-12 algebraic sponges share the rate-8/digest-4 layout: leaves
    hash the row in rate-sized blocks."""

    def leaf_digests(flat: Fp) -> Fp:
        h, w = flat.shape
        blocks = flat.reshape(h, w // ALIGNMENT, ALIGNMENT)
        return hash_blocks(blocks)

    return LmcsHash(
        name, leaf_digests, compress_pairs, host_hash, host_compress,
        permute=permute,
    )


def _byte_hash(name, dev_mod, host_mod) -> "LmcsHash":
    """BLAKE3-256 / Keccak-256 trees: digests are 32 bytes carried as four
    LE u64 words (arbitrary u64s, not field elements)."""

    def leaf_digests(flat: Fp) -> Fp:
        d8 = dev_mod.hash_felt_rows(flat.lo, flat.hi)  # (h, 8) u32
        return Fp(d8[:, 0::2], d8[:, 1::2])

    def compress_pairs(left: Fp, right: Fp) -> Fp:
        import jax.numpy as _jnp

        def to8(d: Fp):
            n = d.lo.shape[0]
            out = _jnp.zeros((n, 8), _jnp.uint32)
            out = out.at[:, 0::2].set(d.lo.astype(_jnp.uint32))
            return out.at[:, 1::2].set(d.hi.astype(_jnp.uint32))

        d8 = dev_mod.compress_pairs(to8(left), to8(right))
        return Fp(d8[:, 0::2], d8[:, 1::2])

    def _words(digest: bytes) -> list:
        return [
            int.from_bytes(digest[i : i + 8], "little") for i in range(0, 32, 8)
        ]

    def _bytes(words) -> bytes:
        return b"".join(int(w).to_bytes(8, "little") for w in words)

    def host_hash_elements(elements):
        return _words(host_mod.hash_elements(list(elements)))

    def host_compress(a, b):
        return _words(host_mod.merge(_bytes(a), _bytes(b)))

    return LmcsHash(
        name,
        leaf_digests,
        compress_pairs,
        host_hash_elements,
        host_compress,
        algebraic=False,
    )


POSEIDON2_HASH = _sponge_hash(
    "poseidon2",
    poseidon2.hash_blocks,
    poseidon2.compress_pairs,
    poseidon2_host.hash_elements,
    poseidon2_host.compress,
)


def rpo_hash() -> "LmcsHash":
    from ..hash import rescue, rescue_host

    return _sponge_hash(
        "rpo256",
        rescue.rpo_hash_blocks,
        rescue.rpo_compress_pairs,
        rescue_host.rpo_hash_elements_stateful,
        rescue_host.rpo_compress,
    )


def rpx_hash() -> "LmcsHash":
    from ..hash import rescue, rescue_host

    return _sponge_hash(
        "rpx256",
        rescue.rpx_hash_blocks,
        rescue.rpx_compress_pairs,
        rescue_host.rpx_hash_elements_stateful,
        rescue_host.rpx_compress,
    )


def blake3_hash() -> "LmcsHash":
    from ..hash import blake3, blake3_host

    return _byte_hash("blake3_256", blake3, blake3_host)


def keccak_hash() -> "LmcsHash":
    from ..hash import keccak, keccak_host

    return _byte_hash("keccak256", keccak, keccak_host)


HASH_CONFIGS = {
    "poseidon2": lambda: POSEIDON2_HASH,
    "rpo256": rpo_hash,
    "rpx256": rpx_hash,
    "blake3_256": blake3_hash,
    "keccak256": keccak_hash,
}


def aligned_width(w: int) -> int:
    return ((w + ALIGNMENT - 1) // ALIGNMENT) * ALIGNMENT


@dataclass
class LmcsTree:
    """Prover-side committed tree.

    ``matrices``: the committed matrices (natural domain order, device Fp).
    ``layers``: digest layers bottom-up; ``layers[0]`` has ``height`` leaf
    digests, ``layers[-1]`` is the root. Device Fp of shape ``(m, 4)``.

    Registered as a JAX pytree (heights/widths are static aux data) so whole
    trees can cross ``jax.jit`` boundaries — the fused prover phases return
    them directly.
    """

    matrices: list
    heights: list
    widths: list
    layers: list

    def tree_flatten(self):
        return (tuple(self.matrices), tuple(self.layers)), (
            tuple(self.heights),
            tuple(self.widths),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        matrices, layers = children
        heights, widths = aux
        return cls(
            matrices=list(matrices),
            heights=list(heights),
            widths=list(widths),
            layers=list(layers),
        )

    @property
    def height(self) -> int:
        return max(self.heights)

    def root(self) -> np.ndarray:
        return fp_to_u64(self.layers[-1])[0]

    def root_dev(self) -> Fp:
        """Root digest as a device Fp (4,) — no host sync."""
        top = self.layers[-1]
        return Fp(top.lo[0], top.hi[0])

    def rows_at(self, indices: Sequence[int]) -> list:
        """For each query index (tree's own domain order), the unpadded rows
        of every matrix, as numpy u64. Returns ``rows[q][m] -> (w_m,)``."""
        out = []
        gathered = []
        for m, h in zip(self.matrices, self.heights):
            idx = jnp.asarray([d % h for d in indices], dtype=jnp.int32)
            gathered.append(fp_to_u64(Fp(m.lo[idx], m.hi[idx])))
        for q in range(len(indices)):
            out.append([g[q] for g in gathered])
        return out

    def aligned_rows_at(self, indices: Sequence[int]) -> list:
        rows = self.rows_at(indices)
        out = []
        for per_matrix in rows:
            aligned = []
            for r in per_matrix:
                pad = aligned_width(len(r)) - len(r)
                aligned.append(np.pad(r, (0, pad)))
            out.append(aligned)
        return out

    def digest_at(self, level: int, index: int) -> np.ndarray:
        layer = self.layers[level]
        return fp_to_u64(Fp(layer.lo[index : index + 1], layer.hi[index : index + 1]))[0]


def _lift_pad_concat(matrices: list, heights: list, max_h: int) -> Fp:
    """Cyclically lift every matrix to max_h rows, pad widths to alignment,
    concatenate along columns: result (max_h, total_aligned_width)."""
    parts_lo, parts_hi = [], []
    for m, h in zip(matrices, heights):
        reps = max_h // h
        lo, hi = m.lo, m.hi
        if reps > 1:
            lo = jnp.tile(lo, (reps, 1))
            hi = jnp.tile(hi, (reps, 1))
        w = m.shape[1]
        pad = aligned_width(w) - w
        if pad:
            lo = jnp.pad(lo, [(0, 0), (0, pad)])
            hi = jnp.pad(hi, [(0, 0), (0, pad)])
        parts_lo.append(lo)
        parts_hi.append(hi)
    return Fp(jnp.concatenate(parts_lo, axis=1), jnp.concatenate(parts_hi, axis=1))


import jax as _jax

_jax.tree_util.register_pytree_node_class(LmcsTree)

_COMMIT_FNS: dict = {}


_TOP_FOLD = 1024  # fold layers at/below this size in one scanned loop


def _split_pairs(cur: Fp):
    n = cur.shape[0]
    return (
        Fp(cur.lo.reshape(n // 2, 2, 4)[:, 0], cur.hi.reshape(n // 2, 2, 4)[:, 0]),
        Fp(cur.lo.reshape(n // 2, 2, 4)[:, 1], cur.hi.reshape(n // 2, 2, 4)[:, 1]),
    )


def _fold_layers(h: LmcsHash, leaves: Fp) -> tuple:
    """Digest layers bottom-up from the leaf layer.

    Large layers fold one compiled compress per level (runtime-optimal);
    everything at/below ``_TOP_FOLD`` leaves runs in ONE ``lax.scan`` over a
    fixed ``(1024, 4)`` buffer — a single compress body compiled once and
    shared by every tree shape (XLA compiles each scanned permutation in
    ~0.5–2 s, and per-level unrolling was the dominant compile cost of the
    whole pipeline). The masked tail work is ≤ 10 × 512 extra permutations
    per tree — noise next to leaf hashing."""
    import jax.numpy as jnp

    layers = [leaves]
    cur = leaves
    while cur.shape[0] > _TOP_FOLD:
        left, right = _split_pairs(cur)
        cur = h.compress_pairs(left, right)
        layers.append(cur)

    n = cur.shape[0]
    if n == 1:
        return tuple(layers)
    # pad up to the fixed buffer size (zeros are canonical field elements,
    # so the dead lanes stay well-defined through the permutation)
    pad = _TOP_FOLD - n
    buf = cur
    if pad:
        buf = Fp(
            jnp.pad(cur.lo, [(0, pad), (0, 0)]),
            jnp.pad(cur.hi, [(0, pad), (0, 0)]),
        )

    def body(b: Fp, _):
        left, right = _split_pairs(b)
        out = h.compress_pairs(left, right)  # (512, 4)
        nxt = Fp(
            jnp.concatenate([out.lo, jnp.zeros_like(out.lo)], axis=0),
            jnp.concatenate([out.hi, jnp.zeros_like(out.hi)], axis=0),
        )
        return nxt, out

    log_top = _TOP_FOLD.bit_length() - 1  # 10
    _, outs = _jax.lax.scan(body, buf, None, length=log_top)
    # live slices per level: level j+1 of this sub-tree has n >> (j+1) nodes
    k = n.bit_length() - 1
    for j in range(k):
        live = n >> (j + 1)
        layers.append(Fp(outs.lo[j, :live], outs.hi[j, :live]))
    return tuple(layers)


def _sponge_leaves_incremental(matrices: list, heights: list, max_h: int) -> Fp:
    """Leaf digests via an incremental overwrite-mode Poseidon2-style sponge,
    WITHOUT materializing the lifted + padded column concat.

    The concat form needs ``max_h × Σ aligned_w`` elements live at once —
    ~6 GB at the 2^20 contract size (2^23 LDE rows × ~96 aligned cols × 2
    limbs) on a 16 GB chip. Here the sponge state ``(12, max_h)`` absorbs
    each matrix's rate-8 column blocks in sequence: full blocks are sliced
    out of the (unpadded) matrix under ``lax.fori_loop`` — one permutation
    body compiled per matrix, one ``(h, 8)`` slice live per step — and the
    ragged tail block is padded separately. Bit-identical to hashing the
    concat since every aligned width is a multiple of the rate.
    """
    import jax.numpy as jnp

    from ..field.goldilocks import fp_zeros
    from ..hash import poseidon2

    state = fp_zeros((12, max_h))

    def absorb(state: Fp, chunk: Fp, reps: int) -> Fp:
        # chunk: (h, 8) natural rows; lift to (max_h, 8) by cyclic repetition
        lo, hi = chunk.lo, chunk.hi
        if reps > 1:
            lo = jnp.tile(lo, (reps, 1))
            hi = jnp.tile(hi, (reps, 1))
        s = fp_concat([Fp(lo.T, hi.T), state[8:12]], axis=0)
        return poseidon2.permute(s)

    for m, h in zip(matrices, heights):
        w = m.shape[1]
        if w == 0:
            continue
        reps = max_h // h
        nb_full = w // ALIGNMENT
        if nb_full:
            def body(i, st, m=m, h=h, reps=reps):
                chunk = Fp(
                    _jax.lax.dynamic_slice(m.lo, (0, i * ALIGNMENT), (h, ALIGNMENT)),
                    _jax.lax.dynamic_slice(m.hi, (0, i * ALIGNMENT), (h, ALIGNMENT)),
                )
                return absorb(st, chunk, reps)

            state = _jax.lax.fori_loop(0, nb_full, body, state)
        tail = w - nb_full * ALIGNMENT
        if tail:
            pad = [(0, 0), (0, ALIGNMENT - tail)]
            chunk = Fp(
                jnp.pad(m.lo[:, nb_full * ALIGNMENT :], pad),
                jnp.pad(m.hi[:, nb_full * ALIGNMENT :], pad),
            )
            state = absorb(state, chunk, reps)
    digest = state[0:4]
    return Fp(digest.lo.T, digest.hi.T)


def _commit_fn(h: LmcsHash):
    """Per-hash jitted commit: leaf-hash + every Merkle layer in ONE
    compiled program (one device dispatch per tree). Algebraic sponge
    configs stream the leaf absorption (no lifted-concat materialization);
    byte hashes keep the concat form (their device kernels consume whole
    rows)."""
    fn = _COMMIT_FNS.get(h.name)
    if fn is not None:
        return fn

    @_jax.jit
    def commit(matrices: tuple) -> tuple:
        matrices = list(matrices)
        heights = [m.shape[0] for m in matrices]
        max_h = max(heights)
        if h.algebraic:
            leaves = _sponge_leaves_incremental(matrices, heights, max_h)
        else:
            flat = _lift_pad_concat(matrices, heights, max_h)
            leaves = h.leaf_digests(flat)  # (max_h, 4)
        return _fold_layers(h, leaves)

    _COMMIT_FNS[h.name] = commit
    return commit


def build_tree(
    matrices: Sequence[Fp], hash: LmcsHash = POSEIDON2_HASH
) -> LmcsTree:
    """Commit to matrices (natural domain order, heights powers of two).

    All heights must divide the max height. The entire commitment — leaf
    hashing + every layer — is one jitted device call.
    """
    matrices = list(matrices)
    heights = [m.shape[0] for m in matrices]
    widths = [m.shape[1] for m in matrices]
    max_h = max(heights)
    for h in heights:
        assert max_h % h == 0 and (h & (h - 1)) == 0, "heights must be powers of two"
    layers = list(_commit_fn(hash)(tuple(matrices)))
    return LmcsTree(matrices=matrices, heights=heights, widths=widths, layers=layers)


# ---------------------------------------------------------------------------
# Batch opening (shared sibling schedule)
# ---------------------------------------------------------------------------


def sibling_schedule(indices: Sequence[int], depth: int) -> list:
    """Deduplicated Merkle witness schedule.

    Given sorted unique leaf indices of a depth-``depth`` tree, returns the
    ``(level, node_index)`` list (deterministic order) of sibling digests the
    verifier cannot derive and the prover must supply. Level 0 = leaves.
    """
    frontier = sorted(set(indices))
    needed = []
    for level in range(depth):
        parents = set(frontier)
        for i in frontier:
            sib = i ^ 1
            if sib not in parents:
                needed.append((level, sib))
        frontier = sorted({i >> 1 for i in frontier})
    return needed


def prove_batch(tree: LmcsTree, indices: Sequence[int], channel) -> None:
    """Open the tree at sorted-unique ``indices`` (tree's own domain order),
    streaming hints: aligned rows per index per matrix, then the sibling
    digests per :func:`sibling_schedule`.

    All sibling digests are gathered in a single batched device transfer
    (one per tree) — per-digest round-trips dominate over a slow link."""
    import jax.numpy as jnp

    indices = sorted(set(indices))
    depth = (tree.height - 1).bit_length()
    for per_matrix in tree.aligned_rows_at(indices):
        for row in per_matrix:
            channel.hint_field_slice([int(v) for v in row])
    sched = sibling_schedule(indices, depth)
    if not sched:
        return
    per_level: dict = {}
    for level, node in sched:
        per_level.setdefault(level, []).append(node)
    parts = []
    keys = []
    for level in sorted(per_level):
        nodes = per_level[level]
        layer = tree.layers[level]
        idx = jnp.asarray(nodes, dtype=jnp.int32)
        parts.append(Fp(layer.lo[idx], layer.hi[idx]))
        keys.extend((level, n) for n in nodes)
    gathered = fp_to_u64(
        Fp(
            jnp.concatenate([p.lo for p in parts], axis=0),
            jnp.concatenate([p.hi for p in parts], axis=0),
        )
    )
    digest_map = {k: gathered[i] for i, k in enumerate(keys)}
    for key in sched:
        channel.hint_commitment(tuple(int(v) for v in digest_map[key]))


def gather_openings_dev(tree: LmcsTree, indices: Sequence[int]):
    """Device-side batch-opening gather: returns ``(flat, meta)`` where
    ``flat`` is ONE 1-D Fp buffer holding — in transcript hint order — the
    aligned rows of every matrix per query index, followed by the sibling
    digests of :func:`sibling_schedule`. No host sync; the caller
    concatenates buffers across trees and reads back once.

    ``meta`` = (n_indices, aligned_widths, n_siblings)."""
    import jax.numpy as jnp

    indices = sorted(set(indices))
    depth = (tree.height - 1).bit_length()
    parts_lo, parts_hi = [], []
    aws = []
    for m, h in zip(tree.matrices, tree.heights):
        idx = jnp.asarray([d % h for d in indices], dtype=jnp.int32)
        lo, hi = m.lo[idx], m.hi[idx]  # (q, w)
        w = m.shape[1]
        aw = aligned_width(w)
        aws.append(aw)
        if aw > w:
            lo = jnp.pad(lo, [(0, 0), (0, aw - w)])
            hi = jnp.pad(hi, [(0, 0), (0, aw - w)])
        parts_lo.append(lo)
        parts_hi.append(hi)
    # (q, total_aligned) → row-major flatten = per index, matrices in order
    rows_lo = jnp.concatenate(parts_lo, axis=1).reshape(-1)
    rows_hi = jnp.concatenate(parts_hi, axis=1).reshape(-1)

    sched = sibling_schedule(indices, depth)
    sib_lo = sib_hi = None
    if sched:
        per_level: dict = {}
        for level, node in sched:
            per_level.setdefault(level, []).append(node)
        slos, shis = [], []
        order = []
        for level in sorted(per_level):
            nodes = per_level[level]
            layer = tree.layers[level]
            idx = jnp.asarray(nodes, dtype=jnp.int32)
            slos.append(layer.lo[idx])
            shis.append(layer.hi[idx])
            order.extend((level, n) for n in nodes)
        # reorder gathered digests into sched order
        pos = {k: i for i, k in enumerate(order)}
        perm = jnp.asarray([pos[k] for k in sched], dtype=jnp.int32)
        sib_lo = jnp.concatenate(slos, axis=0)[perm].reshape(-1)
        sib_hi = jnp.concatenate(shis, axis=0)[perm].reshape(-1)
    flat = Fp(
        jnp.concatenate([rows_lo] + ([sib_lo] if sib_lo is not None else [])),
        jnp.concatenate([rows_hi] + ([sib_hi] if sib_hi is not None else [])),
    )
    return flat, (len(indices), aws, len(sched))


@_jax.jit
def _gather_query_data(matrices: tuple, heights: tuple, layers: tuple, idx):
    """One jitted gather per tree: the (q,) raw query indices (device
    int32, duplicates allowed) select every matrix row and the FULL
    Merkle sibling path per query — value-independent shapes, so the
    executable is reused across proofs (the deduplicated gather of
    gather_openings_dev re-dispatched ~40 eager ops per tree per proof,
    ~5 ms each over the tunnel). Returns one flat Fp buffer:
    [rows per matrix (q·aw)...][sibling paths (depth·q·4)]."""
    import jax.numpy as jnp

    parts_lo, parts_hi = [], []
    for m, h in zip(matrices, heights):
        w = m.shape[1]
        if w == 0:
            continue
        ridx = jnp.remainder(idx, h)
        lo, hi = m.lo[ridx], m.hi[ridx]  # (q, w)
        aw = aligned_width(w)
        if aw > w:
            lo = jnp.pad(lo, [(0, 0), (0, aw - w)])
            hi = jnp.pad(hi, [(0, 0), (0, aw - w)])
        parts_lo.append(lo.reshape(-1))
        parts_hi.append(hi.reshape(-1))
    depth = len(layers) - 1
    for level in range(depth):
        sib = jnp.bitwise_xor(jnp.right_shift(idx, level), 1)
        layer = layers[level]
        parts_lo.append(layer.lo[sib].reshape(-1))
        parts_hi.append(layer.hi[sib].reshape(-1))
    return Fp(jnp.concatenate(parts_lo), jnp.concatenate(parts_hi))


def gather_query_data(tree: LmcsTree, idx) -> tuple:
    """Device path-gather for :func:`emit_opening_hints`. ``idx``: (q,)
    int32 device array of raw query indices in this tree's domain order."""
    flat = _gather_query_data(
        tuple(tree.matrices), tuple(tree.heights), tuple(tree.layers), idx
    )
    return flat, (
        int(idx.shape[0]),
        [aligned_width(w) for w in tree.widths if w],
        len(tree.layers) - 1,
        [h for w, h in zip(tree.widths, tree.heights) if w],
    )


def emit_opening_hints(channel, host_vals: np.ndarray, meta, raw_indices) -> None:
    """Feed a read-back :func:`gather_query_data` buffer into the channel
    hint stream with the canonical batch-opening layout: aligned rows per
    sorted-unique index per matrix, then the deduplicated sibling digests
    of :func:`sibling_schedule` (selected host-side from the full gathered
    paths)."""
    q, aws, depth, heights = meta
    raw = [int(v) for v in raw_indices]
    assert len(raw) == q
    uniq = sorted(set(raw))
    first_pos: dict = {}
    for j, d in enumerate(raw):
        first_pos.setdefault(d, j)

    mat_off = []
    off = 0
    for aw in aws:
        mat_off.append(off)
        off += q * aw
    sib_base = off
    for d in uniq:
        for m_i, aw in enumerate(aws):
            base = mat_off[m_i] + first_pos[d] * aw
            channel.hint_field_slice(
                [int(v) for v in host_vals[base : base + aw]]
            )
    # per level: map (i >> level) -> first raw position (for sibling lookup)
    sched = sibling_schedule(uniq, depth)
    by_level: dict = {}
    for level in range(depth):
        lv = {}
        for d in uniq:
            lv.setdefault(d >> level, first_pos[d])
        by_level[level] = lv
    for level, node in sched:
        j = by_level[level][node ^ 1]
        base = sib_base + (level * q + j) * 4
        channel.hint_commitment(
            tuple(int(v) for v in host_vals[base : base + 4])
        )
    assert sib_base + depth * q * 4 == len(host_vals)


def append_opening_hints(channel, host_vals: np.ndarray, meta) -> None:
    """Feed a read-back :func:`gather_openings_dev` buffer into the channel
    hint stream (rows per index per matrix, then sibling digests)."""
    q, aws, n_sib = meta
    total_aw = sum(aws)
    off = 0
    for _ in range(q):
        for aw in aws:
            channel.hint_field_slice([int(v) for v in host_vals[off : off + aw]])
            off += aw
    for _ in range(n_sib):
        channel.hint_commitment(tuple(int(v) for v in host_vals[off : off + 4]))
        off += 4
    assert off == len(host_vals)


def verify_batch(
    commitment,
    widths: Sequence[int],
    max_height: int,
    indices: Sequence[int],
    channel,
    hash: LmcsHash = POSEIDON2_HASH,
) -> dict:
    """Verifier side of :func:`prove_batch`.

    Reads hinted rows + sibling digests from ``channel``, recomputes leaf
    digests and folds to the root; raises ``ValueError`` on mismatch.
    Returns ``{index: [row_per_matrix (unpadded numpy u64)]}``.
    """
    indices = sorted(set(indices))
    depth = (max_height - 1).bit_length()
    rows_by_index: dict = {}
    leaf_digest: dict = {}
    for d in indices:
        rows = []
        stream = []
        for w in widths:
            aw = aligned_width(w)
            row = channel.read_hint_fields(aw)
            stream.extend(row)
            rows.append(np.asarray(row[:w], dtype=np.uint64))
        rows_by_index[d] = rows
        leaf_digest[d] = tuple(hash.host_hash_elements([int(v) for v in stream]))

    nodes = {(0, d): leaf_digest[d] for d in indices}
    frontier = indices
    for level in range(depth):
        parents_set = set(frontier)
        for i in frontier:
            sib = i ^ 1
            if sib not in parents_set:
                nodes[(level, sib)] = tuple(channel.read_hint_commitment())
        next_frontier = sorted({i >> 1 for i in frontier})
        for p in next_frontier:
            left = nodes[(level, 2 * p)]
            right = nodes[(level, 2 * p + 1)]
            nodes[(level + 1, p)] = tuple(
                hash.host_compress(list(left), list(right))
            )
        frontier = next_frontier
    root = nodes[(depth, 0)]
    if tuple(int(v) for v in commitment) != root:
        raise ValueError("LMCS root mismatch")
    return rows_by_index
