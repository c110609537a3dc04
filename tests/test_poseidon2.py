"""Poseidon2 permutation/sponge tests.

The permutation is pinned by the reference's test vector
(crates/crypto/src/hash/algebraic_sponge/poseidon2/test.rs: permutation of
state [0..11]); the batched JAX kernel is cross-checked against the scalar
host implementation on random states.
"""

import numpy as np

from miden_tpu.field import gl
from miden_tpu.field.goldilocks import Fp, fp_from_u64, fp_to_u64
from miden_tpu.hash import poseidon2, poseidon2_host

EXPECTED_PERM_0_11 = [
    0xF292AB67C0F14B03, 0x0A32F1B37656544C, 0x053C61AB895498DE, 0x02FF92E55B196FFB,
    0x58176E8F6F58CAB2, 0xB0AA1206E7AEC0F8, 0xE90C13F3DCE83CA4, 0xF4DA15333EDF39C2,
    0x23B701C053C2CA6C, 0xD233D593DCDFBF58, 0x4EFFA5F9516FB52E, 0x0AAF4489F1F40166,
]


def test_host_permutation_vector():
    out = poseidon2_host.permute(list(range(12)))
    assert out == EXPECTED_PERM_0_11


def test_jax_permutation_matches_host():
    rng = np.random.default_rng(0)
    n = 37
    states = rng.integers(0, gl.P, size=(12, n), dtype=np.uint64)
    out = poseidon2.permute_jit(fp_from_u64(states))
    got = fp_to_u64(out)
    for j in range(n):
        exp = poseidon2_host.permute([int(states[i, j]) for i in range(12)])
        assert [int(got[i, j]) for i in range(12)] == exp


def test_jax_permutation_vector():
    state = np.arange(12, dtype=np.uint64)[:, None]
    out = poseidon2.permute_jit(fp_from_u64(state))
    got = [int(x) for x in fp_to_u64(out)[:, 0]]
    assert got == EXPECTED_PERM_0_11


def test_hash_blocks_matches_host_sponge():
    rng = np.random.default_rng(1)
    n_leaves, n_blocks = 9, 3
    data = rng.integers(0, gl.P, size=(n_leaves, n_blocks, 8), dtype=np.uint64)
    digests = fp_to_u64(poseidon2.hash_blocks_jit(fp_from_u64(data)))
    for l in range(n_leaves):
        exp = poseidon2_host.hash_elements([int(x) for x in data[l].ravel()])
        assert [int(x) for x in digests[l]] == exp


def test_compress_pairs_matches_host():
    rng = np.random.default_rng(2)
    n = 11
    left = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    right = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    out = fp_to_u64(poseidon2.compress_pairs_jit(fp_from_u64(left), fp_from_u64(right)))
    for i in range(n):
        exp = poseidon2_host.compress([int(x) for x in left[i]], [int(x) for x in right[i]])
        assert [int(x) for x in out[i]] == exp
