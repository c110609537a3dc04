"""RPO-256 / RPX-256 (Rescue family) — host vectors + device parity.

Host RPO is pinned to the reference's 19 known-answer vectors
(crates/crypto/src/hash/algebraic_sponge/rescue/rpo/tests.rs EXPECTED,
regenerable via rpo/generate_test_vectors.py). RPX has no published
known-answer vectors; its components are pinned instead: FB rounds are
shared with RPO, and the cubic-extension x^7 map is checked against a
generic polynomial pow mod (φ³ − φ − 1).
"""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.field.goldilocks import fp_from_u64, fp_to_u64
from miden_tpu.hash import rescue
from miden_tpu.hash.rescue_host import (
    P,
    Rpo256,
    Rpx256,
    _c3_mul,
    _c3_pow7,
    rpo_permute,
    rpx_permute,
)

# First, middle, and last of the 19 reference vectors: hash_elements([0..n)).
RPO_VECTORS = {
    1: [8563248028282119176, 14757918088501470722, 14042820149444308297, 7607140247535155355],
    8: [5421234586123900205, 9738602082989433872, 7017816005734536787, 8635896173743411073],
    19: [17273934282489765074, 8007352780590012415, 16690624932024962846, 8137543572359747206],
}


def test_rpo_known_answer_vectors():
    elements = list(range(19))
    for n, want in RPO_VECTORS.items():
        assert Rpo256.hash_elements(elements[:n]) == want


def test_rpo_merge_consistency():
    e = [3, 1, 4, 1, 5, 9, 2, 6]
    assert Rpo256.merge(e[:4], e[4:]) == Rpo256.hash_elements(e)
    assert Rpo256.merge_in_domain(e[:4], e[4:], 7) != Rpo256.merge(e[:4], e[4:])


def test_rpx_merge_consistency():
    e = [0, 1, 2, 3, 4, 5, 6, 7]
    assert Rpx256.merge(e[:4], e[4:]) == Rpx256.hash_elements(e)
    # RPX and RPO must not collide on the same input
    assert Rpx256.hash_elements(e) != Rpo256.hash_elements(e)


def test_cubic_pow7_against_generic_pow():
    def poly_mul(a, b):
        c = [0] * 5
        for i in range(3):
            for j in range(3):
                c[i + j] += a[i] * b[j]
        return [(c[0] + c[3]) % P, (c[1] + c[3] + c[4]) % P, (c[2] + c[4]) % P]

    def poly_pow(a, e):
        r = [1, 0, 0]
        b = list(a)
        while e:
            if e & 1:
                r = poly_mul(r, b)
            b = poly_mul(b, b)
            e >>= 1
        return r

    rng = np.random.default_rng(11)
    for _ in range(10):
        a = tuple(int(v) for v in rng.integers(0, P, 3, dtype=np.uint64))
        assert list(_c3_pow7(a)) == poly_pow(a, 7)
        b = tuple(int(v) for v in rng.integers(0, P, 3, dtype=np.uint64))
        assert list(_c3_mul(a, b)) == poly_mul(a, b)


def test_inv_sbox_is_sbox_inverse():
    rng = np.random.default_rng(3)
    s = [int(v) for v in rng.integers(0, P, 12, dtype=np.uint64)]
    from miden_tpu.hash.rescue_host import _inv_sbox, _sbox

    assert _inv_sbox(_sbox(s)) == s


@pytest.mark.slow  # tracing+lowering the 7-round limb graph takes ~30 s/hash on CPU
@pytest.mark.parametrize("which", ["rpo", "rpx"])
def test_device_permutation_matches_host(which):
    rng = np.random.default_rng(5)
    states = rng.integers(0, P, (12, 16), dtype=np.uint64)
    dev = rescue.rpo_permute if which == "rpo" else rescue.rpx_permute
    host = rpo_permute if which == "rpo" else rpx_permute
    out = np.asarray(fp_to_u64(dev(fp_from_u64(states))))
    for j in (0, 7, 15):
        assert [int(v) for v in out[:, j]] == host([int(v) for v in states[:, j]])
