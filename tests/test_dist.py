"""Multi-device sharded proving components vs single-device ground truth.

Runs on the 8-virtual-device CPU mesh (conftest.py). Everything asserted
bit-exact: all arithmetic is exact Goldilocks, so any divergence is a
sharding/collective bug, not rounding.
"""

import jax
import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.field.goldilocks import fp_from_u64, fp_to_u64
from miden_tpu.ntt import ntt
from miden_tpu.dist import make_mesh
from miden_tpu.dist.ntt_dist import coset_lde_sharded

requires_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _rand_fp(shape, seed=0):
    rng = np.random.default_rng(seed)
    return fp_from_u64(rng.integers(0, gl.P, size=shape, dtype=np.uint64))


@requires_mesh
@pytest.mark.parametrize("log_n,added_bits", [(10, 3), (12, 1)])
def test_coset_lde_sharded_matches_single_device(log_n, added_bits):
    mesh = make_mesh(8)
    evals = _rand_fp((1 << log_n, 4), seed=log_n)
    shift = int(gl.GENERATOR)

    want = fp_to_u64(ntt.coset_lde(evals, added_bits, shift))
    got = fp_to_u64(coset_lde_sharded(evals, added_bits, shift, mesh))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@requires_mesh
def test_lmcs_sharded_matches_single_device():
    from miden_tpu.merkle import lmcs
    from miden_tpu.dist.lmcs_dist import build_tree_sharded

    mesh = make_mesh(8)
    # mixed heights: one max-height, one equal to the shard size, one tiny
    mats = [
        _rand_fp((1 << 9, 5), seed=1),
        _rand_fp((1 << 6, 3), seed=2),
        _rand_fp((1 << 3, 9), seed=3),
    ]
    want = lmcs.build_tree(mats)
    got = build_tree_sharded(mats, mesh)

    assert got.heights == want.heights and got.widths == want.widths
    assert len(got.layers) == len(want.layers)
    for j, (a, b) in enumerate(zip(got.layers, want.layers)):
        np.testing.assert_array_equal(
            np.asarray(fp_to_u64(a)), np.asarray(fp_to_u64(b)), err_msg=f"layer {j}"
        )

    # openings must also agree (layout-agnostic consumers)
    idx = [0, 1, 255, 511]
    fa, ma = lmcs.gather_openings_dev(got, idx)
    fb, mb = lmcs.gather_openings_dev(want, idx)
    assert ma == mb
    np.testing.assert_array_equal(
        np.asarray(fp_to_u64(fa)), np.asarray(fp_to_u64(fb))
    )


@requires_mesh
@pytest.mark.slow
def test_prove_sharded_bit_identical():
    """Full prove on the 8-device mesh == single-device proof, byte for byte
    (mixed heights + aux columns so lifting and LogUp run under sharding).
    Slow: ~8 min on a 4-core host emulating 8 devices."""
    from test_stark_e2e import FibAir, ProductAir, fib_trace, SEED
    from miden_tpu.stark.prover import Statement, MultiAir, prove
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.transcript.challenger import DuplexChallenger
    from miden_tpu.dist.prover import prove_sharded

    fib = fib_trace(1 << 10)
    prod = np.random.default_rng(9).integers(0, gl.P, size=(1 << 7, 1), dtype=np.uint64)
    publics = [0, 1, int(fib[-1, 1])]
    st = Statement(MultiAir([FibAir(), ProductAir()]), publics)

    mesh = make_mesh(8)
    out_s = prove_sharded(TEST_PARAMS, st, [fib, prod], DuplexChallenger(SEED), mesh)
    out_1 = prove(TEST_PARAMS, st, [fib, prod], DuplexChallenger(SEED))

    assert out_s.digest == out_1.digest
    assert out_s.proof.log_heights == out_1.proof.log_heights
    assert out_s.proof.data.fields == out_1.proof.data.fields
    assert out_s.proof.data.commitments == out_1.proof.data.commitments

    from miden_tpu.stark.verifier import verify

    verify(TEST_PARAMS, st, out_s.proof, DuplexChallenger(SEED))


@requires_mesh
def test_coset_lde_sharded_nested_shift():
    mesh = make_mesh(8)
    evals = _rand_fp((1 << 10, 3), seed=7)
    s_in = int(gl.GENERATOR)
    s_out = gl.mul(s_in, s_in)

    want = fp_to_u64(ntt.coset_lde(evals, 2, s_out, shift_in=s_in))
    got = fp_to_u64(coset_lde_sharded(evals, 2, s_out, mesh, shift_in=s_in))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@requires_mesh
@pytest.mark.slow
def test_fused_sharded_bit_identical():
    """The FUSED prover under the 8-device mesh == single-device fused,
    byte for byte (VERDICT round-4 ask #7: the 10-phase structure must
    survive sharding). The shaped 3-AIR statement exercises mixed-height
    lifting, device-aux LogUp and the sharded commit twins inside the
    phase jits."""
    import os

    from miden_tpu.bench_airs import miden_shaped_statement
    from miden_tpu.dist.prover import prove_sharded
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.stark.prover import Statement, prove
    from miden_tpu.stark.verifier import verify
    from miden_tpu.transcript.challenger import DuplexChallenger

    SEED = [11, 22, 33, 44]
    statement, traces = miden_shaped_statement(6)
    mesh = make_mesh(8)
    os.environ["MIDEN_TPU_FUSED"] = "1"
    try:
        out_s = prove_sharded(
            TEST_PARAMS, statement, traces, DuplexChallenger(SEED), mesh
        )
        out_1 = prove(TEST_PARAMS, statement, traces, DuplexChallenger(SEED))
    finally:
        os.environ.pop("MIDEN_TPU_FUSED", None)

    assert out_s.digest == out_1.digest
    assert out_s.proof.data.fields == out_1.proof.data.fields
    assert out_s.proof.data.commitments == out_1.proof.data.commitments
    statement2, _ = miden_shaped_statement(6)
    verify(TEST_PARAMS, statement2, out_s.proof, DuplexChallenger(SEED))
