"""Pallas four-step NTT ≡ XLA stage-by-stage NTT (bit-exact).

Runs the Pallas kernels in interpret mode on the CPU mesh and compares
whole outputs against ntt.dft_dif / ntt.dft_dit for single-kernel sizes,
four-step sizes, forward and inverse twiddles.
"""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.field.goldilocks import fp_from_u64, fp_to_u64
from miden_tpu.ntt import ntt, ntt_pallas


def _rand(n, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, gl.P, (n, w), dtype=np.uint64)


@pytest.mark.parametrize("log_n", [1, 4, 6])
@pytest.mark.parametrize("inverse", [False, True])
def test_single_kernel_matches_xla(log_n, inverse):
    x = _rand(1 << log_n, 3, seed=log_n)
    ref = fp_to_u64(ntt.dft_dif(fp_from_u64(x), inverse=inverse))
    got = fp_to_u64(ntt_pallas.dft_dif(fp_from_u64(x), inverse=inverse))
    assert np.array_equal(ref, got)

    xb = _rand(1 << log_n, 2, seed=100 + log_n)
    ref = fp_to_u64(ntt.dft_dit(fp_from_u64(xb), inverse=inverse))
    got = fp_to_u64(ntt_pallas.dft_dit(fp_from_u64(xb), inverse=inverse))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_matches_xla(inverse, monkeypatch):
    # force the four-step split at a small size so the test stays fast
    monkeypatch.setattr(ntt_pallas, "MAX_LOG_SINGLE", 4)
    x = _rand(1 << 7, 3, seed=7)  # 2^7 = 2^4 · 2^3 split
    ref = fp_to_u64(ntt.dft_dif(fp_from_u64(x), inverse=inverse))
    got = fp_to_u64(ntt_pallas.dft_dif(fp_from_u64(x), inverse=inverse))
    assert np.array_equal(ref, got)

    xb = _rand(1 << 7, 2, seed=17)
    ref = fp_to_u64(ntt.dft_dit(fp_from_u64(xb), inverse=inverse))
    got = fp_to_u64(ntt_pallas.dft_dit(fp_from_u64(xb), inverse=inverse))
    assert np.array_equal(ref, got)


def test_round_trip_four_step(monkeypatch):
    monkeypatch.setattr(ntt_pallas, "MAX_LOG_SINGLE", 4)
    x = _rand(1 << 6, 2, seed=3)
    coeffs = ntt_pallas.dft_dif(fp_from_u64(x), inverse=True)
    back = ntt_pallas.dft_dit(coeffs)
    n_inv = gl.inv(1 << 6)
    back_h = (fp_to_u64(back).astype(object) * n_inv) % gl.P
    assert np.array_equal(back_h.astype(np.uint64), x)
