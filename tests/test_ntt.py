"""NTT tests: every fast path cross-checked against a naive python-int DFT
(the reference's own validation pattern — SURVEY.md §4, fold-vs-naive-DFT)."""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.field.goldilocks import fp_from_u64, fp_to_u64
from miden_tpu.ntt import ntt


def naive_dft(x, shift=1):
    """Evaluate poly with coeffs x at points shift*w^k, natural order."""
    n = len(x)
    w = gl.two_adic_generator(n.bit_length() - 1)
    out = []
    for k in range(n):
        pt = gl.mul(shift, pow(w, k, gl.P))
        acc = 0
        for j in reversed(range(n)):
            acc = (acc * pt + x[j]) % gl.P
        out.append(acc)
    return out


def bitrev_list(x):
    n = len(x)
    b = n.bit_length() - 1
    return [x[int(format(i, f"0{b}b")[::-1], 2)] for i in range(n)]


@pytest.mark.parametrize("log_n", [0, 1, 3, 5])
def test_dft_dif_matches_naive(log_n):
    n = 1 << log_n
    rng = np.random.default_rng(log_n)
    coeffs = rng.integers(0, gl.P, size=(n, 2), dtype=np.uint64)
    out = fp_to_u64(ntt.dft_dif(fp_from_u64(coeffs)))
    for c in range(2):
        expect = naive_dft([int(v) for v in coeffs[:, c]])
        assert [int(v) for v in out[:, c]] == bitrev_list(expect)


@pytest.mark.parametrize("log_n", [1, 4])
def test_dft_dit_matches_naive(log_n):
    n = 1 << log_n
    rng = np.random.default_rng(10 + log_n)
    coeffs = rng.integers(0, gl.P, size=(n, 3), dtype=np.uint64)
    coeffs_br = np.array(bitrev_list(list(coeffs)), dtype=np.uint64)
    out = fp_to_u64(ntt.dft_dit(fp_from_u64(coeffs_br)))
    for c in range(3):
        expect = naive_dft([int(v) for v in coeffs[:, c]])
        assert [int(v) for v in out[:, c]] == expect


def test_interpolate_roundtrip():
    n = 32
    rng = np.random.default_rng(2)
    evals = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    coeffs = ntt.interpolate_bitrev(fp_from_u64(evals))
    back = fp_to_u64(ntt.evaluate_natural(coeffs))
    assert np.array_equal(back, evals)


@pytest.mark.parametrize("shift_in,added", [(1, 3), (1, 0)])
def test_coset_lde_matches_naive(shift_in, added):
    n, b = 16, 2
    shift_out = gl.canonical_lde_shift(n.bit_length() - 1 + added)
    rng = np.random.default_rng(3)
    coeffs = rng.integers(0, gl.P, size=(n, b), dtype=np.uint64)
    evals_in = np.array(
        [
            [naive_dft([int(v) for v in coeffs[:, c]], shift_in)[k] for c in range(b)]
            for k in range(n)
        ],
        dtype=np.uint64,
    )
    out = fp_to_u64(
        ntt.coset_lde(fp_from_u64(evals_in), added, shift_out, shift_in)
    )
    big = n << added
    padded = [[int(v) for v in coeffs[:, c]] + [0] * (big - n) for c in range(b)]
    for c in range(b):
        expect = naive_dft(padded[c], shift_out)
        assert [int(v) for v in out[:, c]] == expect


def test_coset_interpolate_and_eval_roundtrip():
    n = 16
    shift = gl.canonical_lde_shift(7)
    rng = np.random.default_rng(4)
    coeffs = rng.integers(0, gl.P, size=(n, 2), dtype=np.uint64)
    evals = np.array(
        [
            [naive_dft([int(v) for v in coeffs[:, c]], shift)[k] for c in range(2)]
            for k in range(n)
        ],
        dtype=np.uint64,
    )
    cb = ntt.coset_interpolate_bitrev(fp_from_u64(evals), shift)
    got = fp_to_u64(ntt.bitrev_perm(cb))
    assert np.array_equal(got, coeffs)
    # re-evaluate on a bigger coset
    out = fp_to_u64(ntt.evaluate_coeffs_on_coset(cb, 1, shift))
    expect0 = naive_dft([int(v) for v in coeffs[:, 0]] + [0] * n, shift)
    assert [int(v) for v in out[:, 0]] == expect0


def test_bitrev_perm():
    x = np.arange(8, dtype=np.uint64)
    out = fp_to_u64(ntt.bitrev_perm(fp_from_u64(x)))
    assert list(out) == [0, 4, 2, 6, 1, 5, 3, 7]
