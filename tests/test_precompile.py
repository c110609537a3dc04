"""Precompile VM (deferred session) stage 1: u256-add claims.

Fast tests check every session AIR's constraints on concrete traces with
the exact scalar evaluator (stark.debug.check_air) including the cross-AIR
LogUp balance; slow tests prove + verify the full second STARK and its
binding to a main-VM proof's deferred root.
"""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.precompile.session import (
    ChainAir,
    RangeTableAir,
    SessionMultiAir,
    U256Air,
    SessionPermAir,
    U256AddClaim,
    build_session_traces,
    claim_statement_digest,
    deferred_root_for,
    fold_deferred_root,
    prove_deferred_state,
    verify_deferred,
)
from miden_tpu.stark.debug import check_air
from miden_tpu.stark.params import TEST_PARAMS

RAND = [(0x1234_5678_9ABC_DEF0, 0x0FED_CBA9_8765_4321), (12345, 67890)]

CLAIMS = [
    U256AddClaim(a=(1 << 255) + 12345, b=(1 << 255) + (7 << 128)),  # wraps
    U256AddClaim(a=0xDEADBEEF, b=(1 << 200) - 1),
]


def _publics(root, n, nu=None, nk=0, nec=0):
    nu = n if nu is None else nu
    return [*[int(v) % gl.P for v in root], n, nu, nk, nec]


def test_session_airs_satisfy_constraints_and_balance():
    chain, u256, rng, perm, root, _ = build_session_traces(CLAIMS)
    publics = _publics(root, len(CLAIMS))
    finals = []
    for air, main in (
        (ChainAir(), chain),
        (U256Air(), u256),
        (RangeTableAir(), rng),
        (SessionPermAir(), perm),
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


def test_chain_rejects_wrong_root_or_data():
    chain, u256, rng, perm, root, _ = build_session_traces(CLAIMS)
    # wrong public root → root-binding constraint fires
    bad_publics = _publics((root[0] ^ 1, *root[1:]), len(CLAIMS))
    air = ChainAir()
    aux, vals = air.build_aux_trace(chain, bad_publics, [], RAND)
    vs = check_air(air, chain, aux=aux, publics=bad_publics,
                   randomness=RAND, aux_values=vals)
    labels = [
        air.label_order[v.index]
        for v in vs
        if v.index < len(air.label_order)
    ]
    assert any("root" in l for l in labels), (vs[:3], labels[:3])

    # tampered u256 output limb → addition constraint fires
    from miden_tpu.precompile.session import U_O

    bad = u256.copy()
    bad[0, U_O[3]] ^= 1
    uair = U256Air()
    aux, vals = uair.build_aux_trace(bad, _publics(root, 2), [], RAND)
    vs = check_air(uair, bad, aux=aux, publics=_publics(root, 2),
                   randomness=RAND, aux_values=vals)
    assert vs, "tampered sum accepted"


def test_digest_matches_vm_logdeferred_semantics():
    """The session's fold function is the LOGDEFERRED op's fold."""
    from miden_tpu.hash import poseidon2_host as hp

    root = (0, 0, 0, 0)
    stmt = claim_statement_digest(CLAIMS[0])
    assert fold_deferred_root(root, stmt) == tuple(
        hp.permute([*root, *stmt, 1, 0, 0, 0])[0:4]
    )
    assert deferred_root_for(CLAIMS) != (0, 0, 0, 0)


@pytest.mark.slow
def test_prove_verify_deferred_e2e():
    proof = prove_deferred_state(CLAIMS, params=TEST_PARAMS)
    verify_deferred(proof, proof.root, params=TEST_PARAMS)

    from miden_tpu.stark.verifier import VerificationError

    with pytest.raises(VerificationError):
        verify_deferred(proof, (1, 2, 3, 4), params=TEST_PARAMS)


@pytest.mark.slow
def test_main_proof_binds_session_root_e2e():
    """A MASM program LOGDEFERREDs the claims' statement digests; the main
    proof's deferred root then equals the session proof's root, closing
    the loop the reference closes in prover/src/lib.rs:193-199."""
    from miden_tpu.vm.assembler import assemble
    from miden_tpu.vm.prove import prove_program, verify_program

    stmts = [claim_statement_digest(c) for c in CLAIMS]
    pushes = []
    for s in stmts:
        # stack for log_deferred: statement digest at s[4:8]
        pushes.append(
            "push.0.0.0.0 "
            + f"push.{s[3]}.{s[2]}.{s[1]}.{s[0]} "
            + "swapw log_deferred dropw dropw dropw"
        )
    src = "begin " + " ".join(pushes) + " end"
    prog = assemble(src)
    out, proof = prove_program(prog, params=TEST_PARAMS)
    # without the session proof the verifier must refuse (unless partial)
    from miden_tpu.stark.verifier import VerificationError

    with pytest.raises(VerificationError):
        verify_program(proof, params=TEST_PARAMS)
    verify_program(proof, params=TEST_PARAMS, partial=True)

    session = prove_deferred_state(CLAIMS, params=TEST_PARAMS)
    assert tuple(session.root) == tuple(proof.deferred_root)
    verify_program(proof, params=TEST_PARAMS, deferred=session)


def test_u256_mul_claims_satisfy_constraints_and_balance():
    """Mixed add+mul session: all AIRs satisfied, LogUp balanced, and
    mul tamper (output limb, carry-hi overflow) rejected."""
    from miden_tpu.precompile.session import U256MulClaim, U_CH, U_O

    claims = [
        U256AddClaim(a=(1 << 255) + 12345, b=(1 << 255) + (7 << 128)),
        U256MulClaim(a=((1 << 256) - 1), b=((1 << 256) - 1)),  # max wrap
        U256MulClaim(a=0xDEADBEEF_12345678, b=(1 << 200) + 17),
        U256MulClaim(a=0, b=(1 << 255)),  # zero product
    ]
    chain, u256, rng, perm, root, _ = build_session_traces(claims)
    publics = _publics(root, len(claims))
    finals = []
    for air, main in (
        (ChainAir(), chain),
        (U256Air(), u256),
        (RangeTableAir(), rng),
        (SessionPermAir(), perm),
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

    uair = U256Air()
    for col, delta in ((U_O[7], 1), (U_CH[3], 40)):
        bad = u256.copy()
        bad[1, col] = (int(bad[1, col]) + delta) % gl.P
        aux, vals = uair.build_aux_trace(bad, publics, [], RAND)
        vs = check_air(uair, bad, aux=aux, publics=publics,
                       randomness=RAND, aux_values=vals)
        # either a mul constraint fires, or (for carry games) the range
        # bus unbalances against the untouched table
        if not vs:
            finals2 = list(vals)
            for air, main in (
                (ChainAir(), chain),
                (RangeTableAir(), rng),
                (SessionPermAir(), perm),
            ):
                _, v2 = air.build_aux_trace(main, publics, [], RAND)
                finals2.extend(v2)
            tot = SessionMultiAir([]).eval_external(RAND, [finals2], [])[0]
            assert tuple(tot) != (0, 0), f"tamper {col} accepted"


@pytest.mark.slow
def test_prove_verify_mul_session_e2e():
    from miden_tpu.precompile.session import U256MulClaim

    claims = [
        U256MulClaim(a=(1 << 128) + 3, b=(1 << 128) + 5),
        U256AddClaim(a=7, b=9),
    ]
    proof = prove_deferred_state(claims, params=TEST_PARAMS)
    verify_deferred(proof, deferred_root_for(claims), params=TEST_PARAMS)


@pytest.mark.slow
def test_permuted_perm_cycle_ids_rejected():
    """Adversarial: swapping permutation-cycle ids across claims (so a
    chiplet wires its hashes to the other claim's Poseidon2 cycles) must
    break a wiring fraction or the cross-AIR balance — a forged claim
    cannot ride a valid-looking root (VERDICT r3 weak #8)."""
    from miden_tpu.precompile.session import CH_PERM, U_PERM

    tr = build_session_traces(CLAIMS)
    chain, u256, rng, perm, root, _ = tr
    publics = _publics(root, len(CLAIMS))

    def balance_and_checks(mats):
        finals, bad = [], []
        for air, main in (
            (ChainAir(), mats[0]),
            (U256Air(), mats[1]),
            (RangeTableAir(), rng),
            (SessionPermAir(), perm),
        ):
            aux, vals = air.build_aux_trace(main, publics, [], RAND)
            vs = check_air(air, main, aux=aux, publics=publics,
                           randomness=RAND, aux_values=vals)
            bad.extend(vs)
            finals.extend(vals)
        total = SessionMultiAir([]).eval_external(RAND, [finals], [])[0]
        return bad, tuple(total)

    # sanity: untampered balances
    bad, total = balance_and_checks((chain, u256))
    assert not bad and total == (0, 0)

    # swap the two chain claims' statement-sponge cycle bases
    forged_chain = chain.copy()
    forged_chain[0, CH_PERM], forged_chain[1, CH_PERM] = (
        chain[1, CH_PERM],
        chain[0, CH_PERM],
    )
    bad, total = balance_and_checks((forged_chain, u256))
    assert bad or total != (0, 0), "cross-claim cycle swap accepted"

    # point a u256 row's operand hashes at the chain's fold cycles
    forged_u = u256.copy()
    forged_u[0, U_PERM] = 2  # claim 0's fold cycle id
    bad, total = balance_and_checks((chain, forged_u))
    assert bad or total != (0, 0), "u256 cycle retarget accepted"
