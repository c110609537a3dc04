"""Field kernel validation vs the pure-Python Goldilocks oracle.

Follows the reference's test pattern of checking every fast path against a
naive implementation (e.g. quotient.rs:219-273 fold-vs-NaiveDft).
"""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.field import goldilocks as g

RNG = np.random.default_rng(42)


def rand_u64(n, include_edges=True):
    vals = RNG.integers(0, gl.P, size=n, dtype=np.uint64)
    if include_edges and n >= 8:
        edges = np.array(
            [0, 1, 2, gl.P - 1, gl.P - 2, gl.EPSILON, gl.EPSILON + 1, (1 << 63)],
            dtype=np.uint64,
        )
        vals[: len(edges)] = edges % np.uint64(gl.P)
    return vals


N = 256


@pytest.fixture(scope="module")
def ab():
    return rand_u64(N), rand_u64(N)


def test_roundtrip(ab):
    a, _ = ab
    assert np.array_equal(g.fp_to_u64(g.fp_from_u64(a)), a)


def test_add(ab):
    a, b = ab
    expected = np.array([gl.add(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64)
    got = g.fp_to_u64(g.fp_add(g.fp_from_u64(a), g.fp_from_u64(b)))
    assert np.array_equal(got, expected)


def test_sub(ab):
    a, b = ab
    expected = np.array([gl.sub(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64)
    got = g.fp_to_u64(g.fp_sub(g.fp_from_u64(a), g.fp_from_u64(b)))
    assert np.array_equal(got, expected)


def test_mul(ab):
    a, b = ab
    expected = np.array([gl.mul(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64)
    got = g.fp_to_u64(g.fp_mul(g.fp_from_u64(a), g.fp_from_u64(b)))
    assert np.array_equal(got, expected)


def test_mul_edge_products():
    # Values whose product exercises the reduction edge cases near p and the
    # 2^96 ≡ -1 fold.
    specials = [0, 1, gl.P - 1, gl.EPSILON, gl.EPSILON + 1, 2**63, gl.P - gl.EPSILON]
    a = np.array([x % gl.P for x in specials for _ in specials], dtype=np.uint64)
    b = np.array([y % gl.P for _ in specials for y in specials], dtype=np.uint64)
    expected = np.array([gl.mul(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64)
    got = g.fp_to_u64(g.fp_mul(g.fp_from_u64(a), g.fp_from_u64(b)))
    assert np.array_equal(got, expected)


def test_neg(ab):
    a, _ = ab
    expected = np.array([gl.neg(int(x)) for x in a], dtype=np.uint64)
    got = g.fp_to_u64(g.fp_neg(g.fp_from_u64(a)))
    assert np.array_equal(got, expected)


def test_inv(ab):
    a, _ = ab
    a = np.where(a == 0, np.uint64(1), a)
    expected = np.array([gl.inv(int(x)) for x in a], dtype=np.uint64)
    got = g.fp_to_u64(g.fp_inv(g.fp_from_u64(a)))
    assert np.array_equal(got, expected)


def test_pow_const(ab):
    a, _ = ab
    for e in [0, 1, 2, 7, gl.P - 2, (1 << 40) + 12345]:
        expected = np.array([gl.pow_(int(x), e) for x in a], dtype=np.uint64)
        got = g.fp_to_u64(g.fp_pow_const(g.fp_from_u64(a), e))
        assert np.array_equal(got, expected), f"exponent {e}"


def test_mul_small(ab):
    a, _ = ab
    for k in [0, 1, 2, 3, 7, 11]:
        expected = np.array([gl.mul(int(x), k) for x in a], dtype=np.uint64)
        got = g.fp_to_u64(g.fp_mul_small(g.fp_from_u64(a), k))
        assert np.array_equal(got, expected), f"k={k}"


def test_powers():
    base = gl.two_adic_generator(10)
    shift = 12345
    n = 100
    expected = np.array(
        [gl.mul(shift, gl.pow_(base, i)) for i in range(n)], dtype=np.uint64
    )
    got = g.fp_to_u64(g.fp_powers(base, n, shift))
    assert np.array_equal(got, expected)


def test_two_adic_generator_orders():
    for log_n in [1, 2, 5, 16, 32]:
        w = gl.two_adic_generator(log_n)
        assert gl.exp_power_of_2(w, log_n) == 1
        if log_n > 0:
            assert gl.exp_power_of_2(w, log_n - 1) == gl.P - 1  # primitive


def test_ext_mul_matches_oracle():
    a = rand_u64(2 * N).reshape(N, 2)
    b = rand_u64(2 * N, include_edges=False).reshape(N, 2)
    expected = np.array(
        [gl.ext_mul((int(x[0]), int(x[1])), (int(y[0]), int(y[1]))) for x, y in zip(a, b)],
        dtype=np.uint64,
    )
    got = g.fp2_to_pairs_u64(g.fp2_mul(g.fp2_from_pairs_u64(a), g.fp2_from_pairs_u64(b)))
    assert np.array_equal(got, expected)


def test_ext_inv():
    a = rand_u64(2 * N).reshape(N, 2)
    a[0] = [1, 0]
    x = g.fp2_from_pairs_u64(a)
    prod = g.fp2_mul(x, g.fp2_inv(x))
    pairs = g.fp2_to_pairs_u64(prod)
    assert np.all(pairs[:, 0] == 1)
    assert np.all(pairs[:, 1] == 0)


def test_ext_pow_oracle():
    a = (123456789, 987654321)
    assert gl.ext_mul(a, gl.ext_inv(a)) == (1, 0)
    assert gl.ext_pow(a, 5) == gl.ext_mul(gl.ext_mul(gl.ext_mul(gl.ext_mul(a, a), a), a), a)


def test_batch_inv_matches_fermat():
    n = 1 << 14  # above the Montgomery threshold
    vals = (rand_u64(n) % (gl.P - 1)) + 1  # nonzero
    x = g.fp_from_u64(vals)
    got = g.fp_to_u64(g.fp_batch_inv(x))
    expected = np.array([pow(int(v), gl.P - 2, gl.P) for v in vals[:64]], dtype=np.uint64)
    assert np.array_equal(got[:64], expected)
    prod = g.fp_to_u64(g.fp_mul(x, g.fp_batch_inv(x)))
    assert np.all(prod == 1)
