"""Merkle data structures: trees, SMTs, MMR, store.

Ground truth: the reference's precomputed empty-subtree table
(crates/crypto/src/merkle/empty_roots.rs) pins the Poseidon2 merge chain;
everything else is checked for internal consistency (paths verify against
roots, point updates match rebuilds, store mirrors the source trees).
"""

import random

from miden_tpu.merkle import (
    EMPTY_WORD,
    EmptySubtreeRoots,
    MerkleStore,
    MerkleTree,
    Mmr,
    NodeIndex,
    PartialMerkleTree,
    PartialMmr,
    SimpleSmt,
    Smt,
    SparseMerklePath,
    int_to_word,
    merge,
)
from miden_tpu.merkle.smt import SmtLeaf

# EMPTY_SUBTREES[255-h] from empty_roots.rs — empty subtree root at height h.
EMPTY_ROOT_VECTORS = {
    0: (0, 0, 0, 0),
    1: (0x5B31A8B9799FF836, 0xE385174FE60F4B08, 0xE82C6BE88D50767C, 0x2778F3B6A18981E2),
    2: (0xE0C4C734868C11C6, 0xEE1F9ED1DA448050, 0x19FD124DD8F24870, 0xCDD77F41D7DEFF73),
    8: (0xDAF329ACF17F9313, 0x4C71884A628539E4, 0x882ACA9FDB79254F, 0x6DDD1C729017BF62),
    64: (0x372B613B73452A2D, 0x2326929E7C83670C, 0x24A6024D88EFD716, 0x9ADA032226EE8F41),
}


def test_empty_subtree_roots_match_reference():
    for height, expect in EMPTY_ROOT_VECTORS.items():
        assert EmptySubtreeRoots.entry(height, 0) == expect
    # entry(d, d) is always the empty leaf.
    assert EmptySubtreeRoots.entry(64, 64) == EMPTY_WORD
    hashes = EmptySubtreeRoots.empty_hashes(8)
    assert hashes[0] == EMPTY_ROOT_VECTORS[8] and hashes[8] == EMPTY_WORD


def test_merkle_tree_paths_and_update():
    leaves = [int_to_word(i + 1) for i in range(8)]
    tree = MerkleTree(leaves)
    assert tree.depth == 3
    for i in range(8):
        path = tree.get_path(NodeIndex(3, i))
        assert path.verify(i, leaves[i], tree.root)
    # Interior node = merge of its children.
    n = tree.get_node(NodeIndex(2, 0))
    assert n == merge(leaves[0], leaves[1])
    # Point update equals rebuild.
    tree.update_leaf(5, int_to_word(99))
    leaves[5] = int_to_word(99)
    assert tree.root == MerkleTree(leaves).root


def test_merkle_tree_device_build_matches_host():
    import numpy as np

    rng = np.random.default_rng(7)
    leaves = [tuple(int(x) for x in row) for row in rng.integers(0, 1 << 63, size=(2048, 4))]
    big = MerkleTree(leaves)  # device-batched path (n >= 1024)
    # Host ground truth via explicit fold.
    level = list(map(lambda l: tuple(v % ((1 << 64) - (1 << 32) + 1) for v in l), leaves))
    while len(level) > 1:
        level = [merge(level[i], level[i + 1]) for i in range(0, len(level), 2)]
    assert big.root == level[0]


def test_partial_merkle_tree():
    leaves = [int_to_word(i + 1) for i in range(8)]
    tree = MerkleTree(leaves)
    pmt = PartialMerkleTree()
    for i in (2, 5):
        pmt.add_path(i, leaves[i], tree.get_path(NodeIndex(3, i)))
    assert pmt.root == tree.root
    assert pmt.get_path(NodeIndex(3, 2)).verify(2, leaves[2], tree.root)
    # Update through the partial view matches updating the dense tree.
    pmt.update_leaf(NodeIndex(3, 5), int_to_word(42))
    tree.update_leaf(5, int_to_word(42))
    assert pmt.root == tree.root


def test_simple_smt_sparse_equals_dense():
    depth = 6
    smt = SimpleSmt(depth)
    assert smt.root == EmptySubtreeRoots.entry(depth, 0)
    dense = [EMPTY_WORD] * (1 << depth)
    rng = random.Random(3)
    for _ in range(20):
        k = rng.randrange(1 << depth)
        v = int_to_word(rng.randrange(1 << 60))
        smt.insert(k, v)
        dense[k] = v
    assert smt.root == MerkleTree(dense).root
    k = next(iter(dict(smt.leaves())))
    path, leaf = smt.open(k)
    assert path.verify(k, leaf, smt.root)
    # Deleting everything returns to the empty root.
    for k, _ in list(smt.leaves()):
        smt.insert(k, EMPTY_WORD)
    assert smt.root == EmptySubtreeRoots.entry(depth, 0)


def test_sparse_merkle_path_roundtrip():
    depth = 6
    smt = SimpleSmt(depth, [(3, int_to_word(7)), (11, int_to_word(9))])
    path, leaf = smt.open(3)
    sparse = SparseMerklePath.from_path(depth, path)
    assert len(sparse.nodes) < len(path.nodes)  # most siblings are empty
    assert sparse.to_path(depth).nodes == path.nodes


def test_full_smt_insert_open_delete():
    smt = Smt()
    empty_root = smt.root
    k1 = (1, 2, 3, 4)
    k2 = (9, 9, 9, 4)  # same key[3] -> same leaf (multi-entry)
    k3 = (0, 0, 0, 77)
    smt.insert(k1, (10, 0, 0, 0))
    smt.insert(k3, (30, 0, 0, 0))
    assert smt.get_value(k1) == (10, 0, 0, 0)
    proof = smt.open(k1)
    assert proof.verify_membership(k1, (10, 0, 0, 0), smt.root)
    # Non-membership: k2 shares the leaf with k1 but has no entry.
    proof2 = smt.open(k2)
    assert proof2.verify_membership(k2, EMPTY_WORD, smt.root)
    # Multi-entry leaf keeps both values; sorted hashing is stable.
    smt.insert(k2, (20, 0, 0, 0))
    assert smt.num_leaves() == 2 and smt.num_entries() == 3
    proof3 = smt.open(k2)
    assert proof3.verify_membership(k2, (20, 0, 0, 0), smt.root)
    assert proof3.leaf.num_entries() == 2
    # Deletion restores the empty root.
    for k in (k1, k2, k3):
        smt.insert(k, EMPTY_WORD)
    assert smt.root == empty_root


def test_smt_leaf_hash_modes():
    single = SmtLeaf([((1, 2, 3, 4), (5, 6, 7, 8))])
    multi = SmtLeaf([((1, 2, 3, 4), (5, 6, 7, 8)), ((2, 2, 3, 4), (6, 6, 7, 8))])
    assert SmtLeaf().hash() == EMPTY_WORD
    assert single.hash() != multi.hash()
    # Entry order does not matter (sorted by key, most-significant felt last).
    multi_rev = SmtLeaf([((2, 2, 3, 4), (6, 6, 7, 8)), ((1, 2, 3, 4), (5, 6, 7, 8))])
    assert multi.hash() == multi_rev.hash()


def test_mmr_add_open_peaks():
    mmr = Mmr()
    leaves = [int_to_word(i + 1) for i in range(11)]
    for leaf in leaves:
        mmr.add(leaf)
    assert mmr.forest == 11
    peaks = mmr.peaks()
    assert len(peaks.peaks) == 3  # 11 = 0b1011
    for pos in range(11):
        assert mmr.get(pos) == leaves[pos]
        proof = mmr.open(pos)
        assert peaks.verify(leaves[pos], proof)
    # Openings against an earlier forest still verify against its peaks.
    old = mmr.peaks_at(7)
    for pos in range(7):
        assert old.verify(leaves[pos], mmr.open_at(pos, 7))
    # Peak commitment changes when a leaf is appended.
    before = peaks.hash_peaks()
    mmr.add(int_to_word(12))
    assert mmr.peaks().hash_peaks() != before


def test_mmr_peaks_hash_padding_shape():
    mmr = Mmr([int_to_word(i) for i in range(3)])
    peaks = mmr.peaks()
    assert len(peaks.hash_peaks()) == 4


def test_partial_mmr_track_and_add():
    mmr = Mmr([int_to_word(i + 1) for i in range(8)])
    pm = PartialMmr(mmr.peaks())
    proof = mmr.open(3)
    pm.track(3, int_to_word(4), proof.merkle_path)
    assert pm.is_tracked(3) and pm.get(3) == int_to_word(4)
    # Appends keep tracked paths valid.
    for i in range(8, 12):
        mmr.add(int_to_word(i + 1))
        pm.add(int_to_word(i + 1))
    assert pm.peaks().peaks == mmr.peaks().peaks
    assert mmr.peaks().verify(int_to_word(4), pm.open(3))


def test_merkle_store_mixed_sources():
    tree = MerkleTree([int_to_word(i + 1) for i in range(8)])
    smt = SimpleSmt(4, [(2, int_to_word(5))])
    store = MerkleStore()
    store.extend(tree.inner_nodes())
    # SMT inner nodes via the empty-subtree preseed + explicit path.
    path, leaf = smt.open(2)
    store.add_merkle_path(2, leaf, path)

    leaf_val, got_path = store.get_path(tree.root, NodeIndex(3, 6))
    assert leaf_val == int_to_word(7)
    assert got_path.verify(6, leaf_val, tree.root)
    assert store.get_node(smt.root, NodeIndex(4, 2)) == int_to_word(5)

    # Copy-on-write set_node: the old root still resolves to the old value.
    old_root = tree.root
    new_root = store.set_node(tree.root, NodeIndex(3, 6), int_to_word(70))
    tree.update_leaf(6, int_to_word(70))
    assert new_root == tree.root
    assert store.get_node(new_root, NodeIndex(3, 6)) == int_to_word(70)
    assert store.get_node(old_root, NodeIndex(3, 6)) == int_to_word(7)

    # merge_roots: both subtrees reachable under the merged root.
    merged = store.merge_roots(tree.root, smt.root)
    assert store.get_node(merged, NodeIndex(1, 0)) == tree.root
    # Leaf depth probing: fully materialized to depth 3.
    assert store.get_leaf_depth(tree.root, 3, 5) == 3


def test_store_subset():
    t1 = MerkleTree([int_to_word(i) for i in range(4)])
    t2 = MerkleTree([int_to_word(i + 100) for i in range(4)])
    store = MerkleStore()
    store.extend(t1.inner_nodes())
    store.extend(t2.inner_nodes())
    sub = store.subset([t1.root])
    assert sub.get_node(t1.root, NodeIndex(2, 3)) == int_to_word(3)
    try:
        sub.get_node(t2.root, NodeIndex(2, 0))
        raised = False
    except Exception:
        raised = True
    assert raised
