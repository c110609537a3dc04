"""Precompile VM stage 2: keccak256 claims (bit-column round AIR).

Fast tests pin the trace builder against the host Keccak-256
(keccak_host.keccak256, itself NIST/Ethereum-vector-pinned) and check
every session AIR's constraints plus the cross-AIR LogUp balance on a
mixed u256+keccak session with the exact scalar evaluator; slow tests
prove + verify the full second STARK end-to-end.
"""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.hash.keccak_host import keccak256
from miden_tpu.precompile.keccak import (
    CYCLE,
    K_A0,
    K_ACT,
    KECCAK_WIDTH,
    KeccakAir,
    Keccak256Claim,
    OUT_ROW,
    build_keccak_trace,
)
from miden_tpu.precompile.session import (
    ChainAir,
    RangeTableAir,
    SessionMultiAir,
    SessionPermAir,
    U256AddClaim,
    U256Air,
    build_session_traces,
    deferred_root_for,
    prove_deferred_state,
    verify_deferred,
)
from miden_tpu.stark.debug import check_air
from miden_tpu.stark.params import TEST_PARAMS

RAND = [(0x1234_5678_9ABC_DEF0, 0x0FED_CBA9_8765_4321), (12345, 67890)]

KCLAIMS = [
    Keccak256Claim(a=0x1122_DEAD_BEEF, b=(1 << 255) | 0xF00D),
    Keccak256Claim(a=(1 << 256) - 1, b=0),
]
MIXED = [
    U256AddClaim(a=(1 << 255) + 12345, b=(1 << 255) + (7 << 128)),
    KCLAIMS[0],
    U256AddClaim(a=0xDEADBEEF, b=(1 << 200) - 1),
    KCLAIMS[1],
]


def _publics(root, n, nu, nk=None, nec=0):
    nk = (n - nu) if nk is None else nk
    return [*[int(v) % gl.P for v in root], n, nu, nk, nec]


def _bits_to_int(row, first, count):
    return sum(int(row[K_A0 + first + t]) << t for t in range(count))


def test_keccak_trace_matches_host_digest():
    """Row 24's state bits are the keccak-f output; lanes 0..3 are the
    digest of the padded message."""
    trace = build_keccak_trace(KCLAIMS, n_claims=2, n_u256=0)
    assert trace.shape == (CYCLE * 2, KECCAK_WIDTH)
    for j, cl in enumerate(KCLAIMS):
        out_row = trace[CYCLE * j + OUT_ROW]
        got = _bits_to_int(out_row, 0, 256)
        want = int.from_bytes(keccak256(cl.message), "little")
        assert got == want, f"claim {j}: digest mismatch"
        # row 0 carries the raw message bits
        row0 = trace[CYCLE * j]
        assert _bits_to_int(row0, 0, 256) == cl.a
        assert _bits_to_int(row0, 256, 256) == cl.b
        assert row0[K_A0 + 512] == 1 and row0[K_A0 + 1087] == 1


@pytest.mark.slow
def test_mixed_session_airs_satisfy_constraints_and_balance():
    chain, u256, rng, perm, root, keccak = build_session_traces(MIXED)
    assert keccak is not None
    publics = _publics(root, 4, 2)
    finals = []
    for air, main in (
        (ChainAir(), chain),
        (U256Air(), u256),
        (RangeTableAir(), rng),
        (SessionPermAir(), perm),
        (KeccakAir(), keccak),
    ):
        aux, vals = air.build_aux_trace(main, publics, [], RAND)
        vs = check_air(
            air, main, aux=aux, publics=publics, randomness=RAND,
            aux_values=vals,
        )
        assert not vs, f"{type(air).__name__}: {vs[:4]}"
        finals.extend(vals)
    total = SessionMultiAir([]).eval_external(RAND, [finals], [])[0]
    assert tuple(total) == (0, 0), f"LogUp imbalance: {total}"


def test_keccak_air_rejects_tampered_state():
    """Flipping any state bit breaks a round transition (or digest
    wiring), and a wrong claim digest breaks the bus balance."""
    chain, u256, rng, perm, root, keccak = build_session_traces(MIXED)
    publics = _publics(root, 4, 2)
    air = KeccakAir()

    bad = keccak.copy()
    bad[5, K_A0 + 77] ^= 1  # mid-round state bit of claim 0
    aux, vals = air.build_aux_trace(bad, publics, [], RAND)
    vs = check_air(air, bad, aux=aux, publics=publics, randomness=RAND,
                   aux_values=vals)
    assert vs, "tampered round state accepted"
    labels = [
        air.label_order[v.index]
        for v in vs
        if v.index < len(air.label_order)
    ]
    assert any("round/" in l or "theta/" in l for l in labels), labels[:5]

    # non-boolean junk is caught even where no round constraint looks
    bad2 = keccak.copy()
    bad2[CYCLE - 2, K_A0 + 3] = 7
    aux, vals = air.build_aux_trace(bad2, publics, [], RAND)
    vs = check_air(air, bad2, aux=aux, publics=publics, randomness=RAND,
                   aux_values=vals)
    assert vs and any(
        "bool/" in air.label_order[v.index] for v in vs
    ), "non-boolean state accepted"


def test_root_covers_claim_kind_and_order():
    """The deferred root distinguishes claim kinds and order."""
    r1 = deferred_root_for(MIXED)
    r2 = deferred_root_for(list(reversed(MIXED)))
    assert r1 != r2
    swapped = [
        Keccak256Claim(a=MIXED[0].a, b=MIXED[0].b),
        *MIXED[1:],
    ]
    assert deferred_root_for(swapped) != r1


@pytest.mark.slow
def test_prove_verify_mixed_session_e2e():
    proof = prove_deferred_state(MIXED, params=TEST_PARAMS)
    assert proof.n_claims == 4 and proof.n_u256 == 2
    verify_deferred(proof, proof.root, params=TEST_PARAMS)

    from miden_tpu.stark.verifier import VerificationError

    with pytest.raises(VerificationError):
        verify_deferred(proof, (1, 2, 3, 4), params=TEST_PARAMS)


@pytest.mark.slow
def test_prove_verify_all_keccak_session_e2e():
    """Zero u256 claims: the u256 chiplet is fully padded."""
    proof = prove_deferred_state(KCLAIMS, params=TEST_PARAMS)
    assert proof.n_u256 == 0
    verify_deferred(proof, proof.root, params=TEST_PARAMS)
