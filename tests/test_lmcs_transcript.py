"""LMCS commitment + transcript channel tests."""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.field.goldilocks import fp_from_u64
from miden_tpu.merkle import lmcs
from miden_tpu.transcript.challenger import (
    DuplexChallenger,
    ProverChannel,
    TranscriptData,
    TranscriptError,
    VerifierChannel,
)


def test_challenger_prover_verifier_agree():
    seed = [5, 6, 7, 8]
    p = DuplexChallenger(seed)
    v = DuplexChallenger(seed)
    p.observe_slice([1, 2, 3])
    v.observe_slice([1, 2, 3])
    assert p.sample() == v.sample()
    assert p.sample_bits(10) == v.sample_bits(10)
    assert p.sample_ext() == v.sample_ext()


def test_grind_device_matches_host():
    ch = DuplexChallenger([1, 2, 3, 4])
    ch.observe_slice([42, 43])
    ref = ch.clone()
    w = ch.grind(8)
    assert ref.check_witness(8, w)
    # challenger state advanced identically on both paths
    assert ch.state == ref.state


def test_transcript_roundtrip_and_tail_check():
    pch = ProverChannel(DuplexChallenger([0, 0, 0, 0]))
    pch.send_field_slice([10, 20])
    pch.send_commitment([1, 2, 3, 4])
    a = pch.sample_ext()
    pch.hint_field_slice([7, 8, 9])
    w = pch.grind(4)
    digest, data = pch.finalize()

    vch = VerifierChannel(data, DuplexChallenger([0, 0, 0, 0]))
    assert vch.read_field_slice(2) == [10, 20]
    assert vch.read_commitment() == (1, 2, 3, 4)
    assert vch.sample_ext() == a
    assert vch.read_hint_fields(3) == [7, 8, 9]
    vch.check_pow(4)
    assert vch.finalize() == digest

    # trailing data must be rejected
    vch2 = VerifierChannel(data, DuplexChallenger([0, 0, 0, 0]))
    vch2.read_field_slice(2)
    vch2.read_commitment()
    with pytest.raises(TranscriptError):
        vch2.finalize()


def test_lmcs_commit_open_verify_mixed_heights():
    rng = np.random.default_rng(7)
    m_big = rng.integers(0, gl.P, size=(16, 5), dtype=np.uint64)
    m_small = rng.integers(0, gl.P, size=(4, 3), dtype=np.uint64)
    tree = lmcs.build_tree([fp_from_u64(m_big), fp_from_u64(m_small)])
    root = tree.root()

    indices = [3, 9, 9, 14]
    pch = ProverChannel(DuplexChallenger([0, 0, 0, 0]))
    lmcs.prove_batch(tree, indices, pch)
    _, data = pch.finalize()

    vch = VerifierChannel(data, DuplexChallenger([0, 0, 0, 0]))
    rows = lmcs.verify_batch(root, [5, 3], 16, indices, vch)
    vch.finalize()
    for d in sorted(set(indices)):
        assert np.array_equal(rows[d][0], m_big[d])
        assert np.array_equal(rows[d][1], m_small[d % 4])


def test_lmcs_verify_rejects_tamper():
    rng = np.random.default_rng(8)
    m = rng.integers(0, gl.P, size=(8, 3), dtype=np.uint64)
    tree = lmcs.build_tree([fp_from_u64(m)])
    pch = ProverChannel(DuplexChallenger([0, 0, 0, 0]))
    lmcs.prove_batch(tree, [2, 5], pch)
    _, data = pch.finalize()
    data.fields[0] = (data.fields[0] + 1) % gl.P
    vch = VerifierChannel(data, DuplexChallenger([0, 0, 0, 0]))
    with pytest.raises(ValueError):
        lmcs.verify_batch(tree.root(), [3], 8, [2, 5], vch)
