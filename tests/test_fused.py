"""Fused prover ≡ eager prover (bit-identical transcripts).

The phase-jitted pipeline (miden_tpu/stark/fused.py) must produce exactly
the proof the eager path produces — same field stream, same commitments,
same digest — and the proof must verify. Runs the miden-shaped 3-AIR
statement (device-aux builders) at a tiny size on the CPU mesh.
"""

import os

import pytest

from miden_tpu.stark import MIDEN_PARAMS
from miden_tpu.stark.params import TEST_PARAMS
from miden_tpu.stark.prover import prove
from miden_tpu.stark.verifier import verify
from miden_tpu.transcript.challenger import DuplexChallenger
from miden_tpu.bench_airs import miden_shaped_statement


SEED = [11, 22, 33, 44]


def _prove_with(fused: bool, statement, traces):
    os.environ["MIDEN_TPU_FUSED"] = "1" if fused else "0"
    try:
        return prove(TEST_PARAMS, statement, traces, DuplexChallenger(SEED))
    finally:
        os.environ.pop("MIDEN_TPU_FUSED", None)


@pytest.mark.slow
def test_fused_matches_eager_bit_exact():
    statement, traces = miden_shaped_statement(6)
    eager = _prove_with(False, statement, traces)
    fused = _prove_with(True, statement, traces)

    assert fused.digest == eager.digest
    assert fused.proof.log_heights == eager.proof.log_heights
    assert fused.proof.data.fields == eager.proof.data.fields
    assert fused.proof.data.commitments == eager.proof.data.commitments

    # and the fused proof verifies against the host-side verifier replay
    statement2, _ = miden_shaped_statement(6)
    digest = verify(TEST_PARAMS, statement2, fused.proof, DuplexChallenger(SEED))
    assert digest == fused.digest


@pytest.mark.slow  # re-proves everything; bit-exactness already covered fast
def test_fused_phase_cache_reuse():
    """Second prove with the same statement object must reuse the phase
    cache (no new phase entries) and still be bit-identical."""
    from miden_tpu.stark import fused as fused_mod

    statement, traces = miden_shaped_statement(6)
    p1 = _prove_with(True, statement, traces)
    n_entries = len(fused_mod._PHASE_CACHE)
    p2 = _prove_with(True, statement, traces)
    assert len(fused_mod._PHASE_CACHE) == n_entries
    assert p1.proof.data.fields == p2.proof.data.fields
    assert p1.proof.data.commitments == p2.proof.data.commitments


@pytest.mark.slow
def test_fused_fine_phase_split_matches_eager():
    """The finer phase split used at ≥ 2^19 (per-LDE / per-tree / per-
    instance-quotient phases) produces the same bytes as the eager path."""
    statement, traces = miden_shaped_statement(6)
    eager = _prove_with(False, statement, traces)
    os.environ["MIDEN_TPU_FUSED_FINE"] = "1"
    try:
        fused = _prove_with(True, statement, traces)
    finally:
        os.environ.pop("MIDEN_TPU_FUSED_FINE", None)
    assert fused.proof.data.fields == eager.proof.data.fields
    assert fused.proof.data.commitments == eager.proof.data.commitments
