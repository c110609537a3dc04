"""Multi-hash STARK configs (reference ships one StarkConfig per hash,
air/src/config.rs:236-353): the LMCS tree, and the full prove/verify
pipeline, parameterized by commitment hash.

Fast tests cover the host-twin consistency and config plumbing; the
device-tree roundtrips and full-pipeline roundtrips compile large per-hash
kernels on the CPU mesh and are marked slow.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from miden_tpu.field.goldilocks import fp_from_u64
from miden_tpu.merkle import lmcs
from miden_tpu.stark.params import TEST_PARAMS
from miden_tpu.transcript.challenger import (
    DuplexChallenger,
    ProverChannel,
    TranscriptData,
    VerifierChannel,
)

HASHES = ["rpo256", "rpx256", "blake3_256", "keccak256"]


def _roundtrip(hash_name: str):
    """Commit → open → verify through the hint channel with the given hash."""
    cfg = lmcs.HASH_CONFIGS[hash_name]()
    rng = np.random.default_rng(11)
    m_big = rng.integers(0, 2**63, (16, 5), dtype=np.uint64)
    m_small = rng.integers(0, 2**63, (4, 3), dtype=np.uint64)
    tree = lmcs.build_tree(
        [fp_from_u64(m_big), fp_from_u64(m_small)], hash=cfg
    )
    root = [int(v) for v in tree.root()]

    ch = ProverChannel(DuplexChallenger([0x6D75, 0x6C74, 0x6968, 0x6173]))
    indices = [1, 6, 13]
    lmcs.prove_batch(tree, indices, ch)
    data = TranscriptData(ch.fields, ch.commitments)
    vch = VerifierChannel(data, DuplexChallenger([0x6D75, 0x6C74, 0x6968, 0x6173]))
    rows = lmcs.verify_batch(root, [5, 3], 16, indices, vch, hash=cfg)
    for d in indices:
        assert list(rows[d][0]) == list(m_big[d])
        assert list(rows[d][1]) == list(m_small[d % 4])

    # corrupt the root -> rejection
    bad = list(root)
    bad[0] ^= 1
    ch2 = ProverChannel(DuplexChallenger([0x6D75, 0x6C74, 0x6968, 0x6173]))
    lmcs.prove_batch(tree, indices, ch2)
    data2 = TranscriptData(ch2.fields, ch2.commitments)
    vch2 = VerifierChannel(data2, DuplexChallenger([0x6D75, 0x6C74, 0x6968, 0x6173]))
    with pytest.raises(ValueError):
        lmcs.verify_batch(bad, [5, 3], 16, indices, vch2, hash=cfg)


@pytest.mark.slow
@pytest.mark.parametrize("hash_name", HASHES)
def test_lmcs_roundtrip_per_hash(hash_name):
    _roundtrip(hash_name)


def test_host_twins_consistent():
    """Host leaf/merge twins agree with themselves across an 8-element
    stream and produce 4-word digests."""
    for name in ["poseidon2", *HASHES]:
        cfg = lmcs.HASH_CONFIGS[name]()
        d1 = cfg.host_hash_elements(list(range(8)))
        d2 = cfg.host_hash_elements(list(range(8)))
        assert d1 == d2 and len(d1) == 4
        m = cfg.host_compress(list(d1), list(d1))
        assert len(m) == 4 and m != d1


def _check_device_digests(name):
    """Device-vs-host agreement: leaf_digests and compress_pairs on a
    single small batch must equal the host twins (ADVICE round-2 finding:
    the slow roundtrips were the only device/host cross-check)."""
    from miden_tpu.field.goldilocks import fp_to_u64

    rng = np.random.default_rng(3)
    cfg = lmcs.HASH_CONFIGS[name]()
    rows = rng.integers(0, 2**63, (2, 8), dtype=np.uint64)
    dev = fp_to_u64(cfg.leaf_digests(fp_from_u64(rows)))
    for r in range(2):
        host = cfg.host_hash_elements([int(v) for v in rows[r]])
        assert [int(v) for v in dev[r]] == list(host), name
    left, right = dev[0], dev[1]
    dev_m = fp_to_u64(
        cfg.compress_pairs(
            fp_from_u64(left[None, :]), fp_from_u64(right[None, :])
        )
    )[0]
    host_m = cfg.host_compress([int(v) for v in left], [int(v) for v in right])
    assert [int(v) for v in dev_m] == list(host_m), name


def test_device_digests_match_host_poseidon2():
    _check_device_digests("poseidon2")


@pytest.mark.slow  # each byte-hash/rescue device kernel costs minutes of
# XLA:CPU compile at this (otherwise untested) tiny shape
@pytest.mark.parametrize("hash_name", HASHES)
def test_device_digests_match_host_per_hash(hash_name):
    _check_device_digests(hash_name)


def test_params_reject_byte_hash_pipeline():
    """The full pipeline requires algebraic (felt-digest) hashes."""
    with pytest.raises(AssertionError):
        dataclasses.replace(TEST_PARAMS, hash_name="blake3_256")


@pytest.mark.slow
@pytest.mark.parametrize("hash_name", ["rpo256", "rpx256"])
def test_full_pipeline_roundtrip_per_hash(hash_name):
    """End-to-end prove+verify of a small fibonacci AIR with an RPO/RPX
    commitment tree."""
    from tests.test_stark_e2e import _fib_setup  # shared fixture builder

    params = dataclasses.replace(TEST_PARAMS, hash_name=hash_name)
    statement, traces, seed = _fib_setup()
    from miden_tpu.stark.prover import prove
    from miden_tpu.stark.verifier import verify

    res = prove(params, statement, traces, DuplexChallenger(seed))
    verify(params, statement, res.proof, DuplexChallenger(seed))
