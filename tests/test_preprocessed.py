"""Preprocessed-column prove/verify roundtrips.

Mirrors the reference's framework fixture
(crates/lifted-stark/src/testing/test_preprocessed.rs): an AIR whose
constraint reads a fixed committed column, a full roundtrip, and the
negative paths (missing / wrong commitment, parity violations).
"""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.stark import (
    Air,
    MultiAir,
    Statement,
    TEST_PARAMS,
    VerificationError,
    build_preprocessed,
    prove,
    verify,
)
from miden_tpu.transcript.challenger import DuplexChallenger

SEED = [5, 6, 7, 8]
N = 16


class SquareLutAir(Air):
    """pp column holds i^2 mod p; the main column must equal pp + offset
    (reads the preprocessed value at both window offsets)."""

    width = 1
    preprocessed_width = 1
    num_public_values = 1

    def eval(self, f):
        f.assert_zero(f.main(0) - f.preprocessed(0) - f.public(0))
        f.assert_transition(
            f.main(0, 1) - f.preprocessed(0, 1) - f.public(0)
        )

    def preprocessed_trace(self):
        return np.asarray(
            [[(i * i) % gl.P] for i in range(N)], dtype=np.uint64
        )


def _trace(offset: int) -> np.ndarray:
    return np.asarray(
        [[((i * i) + offset) % gl.P] for i in range(N)], dtype=np.uint64
    )


def _st(offset=3):
    return Statement(MultiAir([SquareLutAir()]), [offset])


@pytest.mark.slow
def test_preprocessed_roundtrip():
    st = _st()
    pp = build_preprocessed(st, TEST_PARAMS)
    assert pp is not None and pp.order == [0]
    out = prove(TEST_PARAMS, st, [_trace(3)], DuplexChallenger(SEED), preprocessed=pp)
    digest = verify(
        TEST_PARAMS, st, out.proof, DuplexChallenger(SEED),
        preprocessed_commitment=pp.commitment(),
    )
    assert digest == out.digest


@pytest.mark.slow
def test_preprocessed_wrong_commitment_rejected():
    st = _st()
    pp = build_preprocessed(st, TEST_PARAMS)
    out = prove(TEST_PARAMS, st, [_trace(3)], DuplexChallenger(SEED), preprocessed=pp)
    from miden_tpu.transcript.challenger import TranscriptError

    bad = list(pp.commitment())
    bad[0] ^= 1
    # FS diverges from the first observation on: rejection surfaces as a
    # transcript (PoW/tail) or verification error — either is a rejection.
    with pytest.raises((VerificationError, TranscriptError)):
        verify(
            TEST_PARAMS, st, out.proof, DuplexChallenger(SEED),
            preprocessed_commitment=tuple(bad),
        )


def test_preprocessed_presence_parity_enforced():
    st = _st()
    pp = build_preprocessed(st, TEST_PARAMS)
    with pytest.raises(ValueError):
        prove(TEST_PARAMS, st, [_trace(3)], DuplexChallenger(SEED))
    out = prove(TEST_PARAMS, st, [_trace(3)], DuplexChallenger(SEED), preprocessed=pp)
    with pytest.raises(VerificationError):
        verify(TEST_PARAMS, st, out.proof, DuplexChallenger(SEED))


def test_preprocessed_bad_witness_rejected_by_constraints():
    """A main trace inconsistent with the fixed column can't be proven
    (the constraint checker path) — check via debug checker."""
    from miden_tpu.stark.debug import check_air

    air = SquareLutAir()
    bad = _trace(3)
    bad[5, 0] = 999
    v = check_air(
        air, bad, preprocessed=np.asarray(air.preprocessed_trace()), publics=[3]
    )
    assert v, "expected constraint violations"
    ok = check_air(
        air, _trace(3), preprocessed=np.asarray(air.preprocessed_trace()), publics=[3]
    )
    assert not ok
