"""secp256k1 EC precompile: host group law, deferred-DAG claims, and the
EC session chiplets (precompile/ec.py).

Reference scope: precompiles-prover/src/ec/ (group/point stores + add +
msm chiplets); here the claim-granular TPU-first redesign proves
complete-group-law add and double-and-add scalar-mul statements on the
deferred session stack.
"""

import pytest

from miden_tpu.dsa.ecdsa_k256 import P as EC_P
from miden_tpu.dsa.ecdsa_k256 import _point_mul
from miden_tpu.vm.deferred import (
    DeferredError,
    DeferredState,
    PID_EC_ADD,
    PID_EC_MUL,
    binop_statement_node,
    default_registry,
    ec_point_node,
    ec_point_value,
    secp256k1_complete_add,
    secp256k1_scalar_mul,
    u256_value_node,
)

G = _point_mul(1)
G2 = _point_mul(2)
G3 = _point_mul(3)
INF = (0, 0)


# ---------------------------------------------------------------------------
# Host group law
# ---------------------------------------------------------------------------


def test_complete_add_matches_jacobian_ladder():
    assert secp256k1_complete_add(G, G) == G2
    assert secp256k1_complete_add(G, G2) == G3
    assert secp256k1_complete_add(G2, G) == G3
    for k in (5, 123456789, (1 << 255) + 17):
        assert secp256k1_scalar_mul(k, G) == _point_mul(k)


def test_complete_add_infinity_cases():
    neg_g = (G[0], EC_P - G[1])
    assert secp256k1_complete_add(INF, G) == G
    assert secp256k1_complete_add(G, INF) == G
    assert secp256k1_complete_add(INF, INF) == INF
    assert secp256k1_complete_add(G, neg_g) == INF
    assert secp256k1_scalar_mul(0, G) == INF


def test_point_node_roundtrip():
    node = ec_point_node(*G)
    assert len(node.chunks) == 2
    assert ec_point_value(node) == G
    with pytest.raises(DeferredError):
        ec_point_value(u256_value_node(7))  # one-chunk node is not a point


# ---------------------------------------------------------------------------
# Deferred-DAG registration (host evaluator)
# ---------------------------------------------------------------------------


def _register_add_claim(st, p, q, out):
    nodes = [ec_point_node(*p), ec_point_node(*q), ec_point_node(*out)]
    for n in nodes:
        st.register(n)
    stmt = binop_statement_node(
        PID_EC_ADD, *(n.digest() for n in nodes)
    )
    st.register(stmt)
    return stmt


def test_ec_claims_register_and_evaluate():
    st = DeferredState(registry=default_registry())
    _register_add_claim(st, G, G2, G3)
    nk = u256_value_node(987654321)
    npt = ec_point_node(*G)
    nout = ec_point_node(*_point_mul(987654321))
    for n in (nk, npt, nout):
        st.register(n)
    st.register(
        binop_statement_node(
            PID_EC_MUL, nk.digest(), npt.digest(), nout.digest()
        )
    )


def test_false_ec_claims_rejected():
    st = DeferredState(registry=default_registry())
    with pytest.raises(DeferredError, match="false"):
        _register_add_claim(st, G, G2, G2)
    # off-curve operand
    st2 = DeferredState(registry=default_registry())
    with pytest.raises(DeferredError, match="on secp256k1|canonical"):
        _register_add_claim(st2, (1, 1), G2, G3)
    # (non-canonical coordinates x + p almost never fit in 256 bits —
    # 2^256 − p = 2^32 + 977 — so the canonicity reject is untestable
    # with real curve points; the evaluator still guards the window)


# ---------------------------------------------------------------------------
# Session chiplets: constraints + LogUp balance
# ---------------------------------------------------------------------------

RAND = [(0x1234_5678_9ABC_DEF0, 0x0FED_CBA9_8765_4321), (12345, 67890)]


def _session_publics(root, n, nu, nk, nec):
    from miden_tpu.field import gl

    return [*[int(v) % gl.P for v in root], n, nu, nk, nec]


def _check_session(claims, nu, nk, nec):
    from miden_tpu.precompile.ec import EcMacAir, EcOpAir
    from miden_tpu.precompile.session import (
        ChainAir,
        RangeTableAir,
        SessionMultiAir,
        SessionPermAir,
        U256Air,
        build_session_traces,
    )
    from miden_tpu.stark.debug import check_air

    tr = build_session_traces(claims)
    publics = _session_publics(tr.root, len(claims), nu, nk, nec)
    finals = []
    pairs = [
        (ChainAir(), tr.chain),
        (U256Air(), tr.u256),
        (RangeTableAir(), tr.rng),
        (SessionPermAir(), tr.perm),
        (EcOpAir(), tr.ec_op),
        (EcMacAir(), tr.ec_mac),
    ]
    for air, main in pairs:
        aux, vals = air.build_aux_trace(main, publics, [], RAND)
        vs = check_air(
            air,
            main,
            aux=aux,
            publics=publics,
            randomness=RAND,
            aux_values=vals,
        )
        assert not vs, f"{type(air).__name__}: {vs[:4]}"
        finals.extend(vals)
    total = SessionMultiAir([]).eval_external(RAND, [finals], [])[0]
    assert tuple(total) == (0, 0), f"LogUp imbalance: {total}"
    return tr


def test_ec_session_all_cases_constraints_and_balance():
    """All five complete-law cases in one session, mixed with a u256
    claim: every chiplet's constraints hold and LogUp balances."""
    from miden_tpu.precompile.ec import EcAddClaim
    from miden_tpu.precompile.session import U256AddClaim

    neg_g = (G[0], EC_P - G[1])
    claims = [
        EcAddClaim(a=G, b=G2),  # chord
        U256AddClaim(a=0xDEADBEEF, b=(1 << 200) - 1),
        EcAddClaim(a=G, b=G),  # tangent (doubling)
        EcAddClaim(a=G, b=neg_g),  # negation -> infinity
        EcAddClaim(a=INF, b=G3),  # infinity-A
        EcAddClaim(a=G2, b=INF),  # infinity-B
    ]
    _check_session(claims, nu=1, nk=0, nec=5)


def test_ec_session_tamper_rejected():
    """A wrong result point breaks the chiplet constraints (the claim
    digests pin the operands, so the group law must fail)."""
    import numpy as np

    from miden_tpu.precompile.ec import (
        EcAddClaim,
        EcMacAir,
        EcOpAir,
        E_XR,
        build_ec_traces,
    )
    from miden_tpu.stark.debug import check_air

    claim = EcAddClaim(a=G, b=G2)
    cycles = []
    op, mac = build_ec_traces([claim], 3, cycles)
    publics = _session_publics((0, 0, 0, 0), 1, 0, 0, 1)
    # tamper the result's first limb: some constraint family must break
    bad = op.copy()
    bad[0, E_XR[0]] ^= 1
    air = EcOpAir()
    aux, vals = air.build_aux_trace(bad, publics, [], RAND)
    vs = check_air(
        air, bad, aux=aux, publics=publics, randomness=RAND, aux_values=vals
    )
    # the digest re-derivation (wiring) and MAC messages shift: the bus
    # columns no longer cancel, so the final aux value changes vs the
    # honest trace — detected through the cross-AIR balance
    aux0, vals0 = air.build_aux_trace(op, publics, [], RAND)
    assert vals != vals0 or vs


# ---------------------------------------------------------------------------
# MASM stdlib module + VM binding
# ---------------------------------------------------------------------------


def _limbs256(x):
    return [(x >> (32 * i)) & 0xFFFFFFFF for i in range(8)]


def _push8(limbs):
    return (
        f"push.{limbs[7]}.{limbs[6]}.{limbs[5]}.{limbs[4]} "
        f"push.{limbs[3]}.{limbs[2]}.{limbs[1]}.{limbs[0]}"
    )


def _ec_add_src(point_a, body):
    """Program: inputs carry [XB(8), YB(8)]; A is pushed in-source
    (stack inputs are capped at 16 felts)."""
    return (
        "use miden::core::crypto::ec::secp256k1\n"
        "begin "
        + _push8(_limbs256(point_a[1]))
        + " "
        + _push8(_limbs256(point_a[0]))
        + f" {body} end"
    )


def test_secp256k1_masm_add():
    """exec.secp256k1::add returns A + B and LOGDEFERREDs the canonical
    EC add statement digest (matching the host-side claim digest)."""
    from miden_tpu.precompile.ec import EcAddClaim
    from miden_tpu.precompile.session import deferred_root_for
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.processor import execute

    src = _ec_add_src(G, "exec.secp256k1::add")
    inputs = _limbs256(G2[0]) + _limbs256(G2[1])
    out = execute(
        assemble_with_stdlib(src),
        inputs,
        event_handlers=stdlib_event_handlers(),
    )
    assert list(out.stack[0:8]) == _limbs256(G3[0])
    assert list(out.stack[8:16]) == _limbs256(G3[1])
    assert tuple(out.deferred_root) == deferred_root_for(
        [EcAddClaim(a=G, b=G2)]
    )


def test_secp256k1_masm_mul():
    """exec.secp256k1::mul returns [k]·P and logs the EC mul claim."""
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.processor import execute

    k = 0xDEAD_BEEF_1234_5678_9ABC
    r = _point_mul(k)
    src = (
        "use miden::core::crypto::ec::secp256k1\n"
        "begin " + _push8(_limbs256(k)) + " exec.secp256k1::mul end"
    )
    inputs = _limbs256(G[0]) + _limbs256(G[1])
    out = execute(
        assemble_with_stdlib(src),
        inputs,
        event_handlers=stdlib_event_handlers(),
    )
    assert list(out.stack[0:8]) == _limbs256(r[0])
    assert list(out.stack[8:16]) == _limbs256(r[1])
    stmt = binop_statement_node(
        PID_EC_MUL,
        u256_value_node(k).digest(),
        ec_point_node(*G).digest(),
        ec_point_node(*r).digest(),
    ).digest()
    from miden_tpu.precompile.session import fold_deferred_root

    assert tuple(out.deferred_root) == fold_deferred_root((0, 0, 0, 0), stmt)


@pytest.mark.slow
def test_ec_session_prove_verify_e2e():
    """Mixed EC + u256 session proves and verifies; tampered root and a
    dishonest claim count are rejected."""
    from miden_tpu.precompile.ec import EcAddClaim
    from miden_tpu.precompile.session import (
        U256AddClaim,
        prove_deferred_state,
        verify_deferred,
    )
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.stark.verifier import VerificationError

    claims = [
        EcAddClaim(a=G, b=G2),
        U256AddClaim(a=12345, b=67890),
        EcAddClaim(a=G, b=G),
    ]
    proof = prove_deferred_state(claims, params=TEST_PARAMS)
    assert proof.n_ec == 2
    verify_deferred(proof, proof.root, params=TEST_PARAMS)
    with pytest.raises(VerificationError):
        verify_deferred(proof, (1, 2, 3, 4), params=TEST_PARAMS)


@pytest.mark.slow
def test_ec_main_proof_binds_session_root_e2e():
    """A MASM program calling secp256k1::add produces a main proof whose
    deferred root the EC session proof discharges (the loop the
    reference closes for EC claims in prover/src/lib.rs)."""
    from miden_tpu.precompile.ec import EcAddClaim
    from miden_tpu.precompile.session import (
        prove_deferred_state,
    )
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.stark.verifier import VerificationError
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.prove import prove_program, verify_program

    src = _ec_add_src(G, "exec.secp256k1::add dropw dropw dropw dropw")
    inputs = _limbs256(G2[0]) + _limbs256(G2[1])
    out, proof = prove_program(
        assemble_with_stdlib(src),
        inputs,
        params=TEST_PARAMS,
        event_handlers=stdlib_event_handlers(),
    )
    with pytest.raises(VerificationError):
        verify_program(proof, params=TEST_PARAMS)
    verify_program(proof, params=TEST_PARAMS, partial=True)
    session = prove_deferred_state([EcAddClaim(a=G, b=G2)], params=TEST_PARAMS)
    assert tuple(session.root) == tuple(proof.deferred_root)
    verify_program(proof, params=TEST_PARAMS, deferred=session)


def test_ec_mul_chain_constraints_and_balance():
    """A scalar-mul claim (513-row double-and-add chain) mixed with an
    add claim: all chiplets satisfied, LogUp balanced."""
    from miden_tpu.precompile.ec import EcAddClaim, EcMulClaim

    k = 0b1011_0110_1001  # small scalar: leading-zero chain + mixed bits
    claims = [
        EcMulClaim(a=k, b=G),
        EcAddClaim(a=G, b=G2),
    ]
    tr = _check_session(claims, nu=0, nk=0, nec=2)
    assert tr.ec_op.shape[0] == 1024  # 513 + 1 rows -> pow2
    from miden_tpu.precompile.ec import EcMulClaim as _M

    assert claims[0].out == _point_mul(k)


@pytest.mark.slow
def test_ec_mul_zero_and_infinity_chains():
    """[0]·P = O and [k]·O = O chains prove (pure infinity-case rows)."""
    from miden_tpu.precompile.ec import EcMulClaim

    claims = [
        EcMulClaim(a=0, b=G),
        EcMulClaim(a=12345, b=INF),
    ]
    _check_session(claims, nu=0, nk=0, nec=2)
    assert claims[0].out == INF and claims[1].out == INF


@pytest.mark.slow
def test_ec_mul_session_prove_verify_e2e():
    """A scalar-mul claim proves and verifies through the full session
    STARK (513-row chain + MAC chiplet)."""
    from miden_tpu.precompile.ec import EcMulClaim
    from miden_tpu.precompile.session import (
        prove_deferred_state,
        verify_deferred,
    )
    from miden_tpu.stark.params import TEST_PARAMS

    proof = prove_deferred_state(
        [EcMulClaim(a=0b1011_0110_1001, b=G)], params=TEST_PARAMS
    )
    assert proof.n_ec == 1
    verify_deferred(proof, proof.root, params=TEST_PARAMS)


# ---------------------------------------------------------------------------
# In-VM ECDSA verification over the EC precompile
# ---------------------------------------------------------------------------


def _store8_src(x, addr):
    l = _limbs256(x)
    return (
        f"push.{l[3]}.{l[2]}.{l[1]}.{l[0]} push.{addr} mem_storew_le dropw "
        f"push.{l[7]}.{l[6]}.{l[5]}.{l[4]} push.{addr + 4} mem_storew_le dropw "
    )


def _ecdsa_src(e, r, s, qx, qy):
    body = "".join(
        _store8_src(v, 100 + 8 * j) for j, v in enumerate((e, r, s, qx, qy))
    )
    return (
        "use miden::core::crypto::dsa::ecdsa_secp256k1\n"
        "begin "
        + body
        + "push.100 exec.ecdsa_secp256k1::verify_prehash end"
    )


def _run_ecdsa(e, r, s, qx, qy):
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.processor import execute

    out = execute(
        assemble_with_stdlib(_ecdsa_src(e, r, s, qx, qy)),
        [],
        event_handlers=stdlib_event_handlers(),
    )
    return out


def test_ecdsa_in_vm_verify():
    """In-VM ECDSA verification (4 deferred EC claims) accepts a valid
    signature and rejects tampered ones, matching the host verifier."""
    from miden_tpu.dsa.ecdsa_k256 import N as EC_N
    from miden_tpu.dsa.ecdsa_k256 import SigningKey

    sk = SigningKey.from_seed(b"miden-tpu-ecdsa-test")
    pk = sk.public_key()
    digest = bytes(range(32))
    sig = sk.sign_prehash(digest)
    assert pk.verify_prehash(digest, sig)
    e = int.from_bytes(digest, "big")

    out = _run_ecdsa(e, sig.r, sig.s, pk.x, pk.y)
    assert int(out.stack[0]) == 1
    assert tuple(out.deferred_root) != (0, 0, 0, 0)

    # tampered s: host advice falls back, in-VM checks reject
    bad_s = sig.s + 1 if sig.s + 1 < EC_N else sig.s - 1
    out = _run_ecdsa(e, sig.r, bad_s, pk.x, pk.y)
    assert int(out.stack[0]) == 0
    # out-of-range r
    out = _run_ecdsa(e, EC_N, sig.s, pk.x, pk.y)
    assert int(out.stack[0]) == 0
    # wrong message
    out = _run_ecdsa(e ^ 1, sig.r, sig.s, pk.x, pk.y)
    assert int(out.stack[0]) == 0


def test_ecdsa_claims_discharge_through_session_bridge():
    """The deferred DAG from an in-VM ECDSA run bridges to session
    claims (3 muls + 1 add) whose root matches the execution's."""
    from miden_tpu.dsa.ecdsa_k256 import SigningKey
    from miden_tpu.precompile.ec import EcAddClaim, EcMulClaim
    from miden_tpu.precompile.session import (
        claims_from_deferred_state,
        deferred_root_for,
    )

    sk = SigningKey.from_seed(b"miden-tpu-ecdsa-bridge")
    pk = sk.public_key()
    digest = b"\x17" * 32
    sig = sk.sign_prehash(digest)
    e = int.from_bytes(digest, "big")
    out = _run_ecdsa(e, sig.r, sig.s, pk.x, pk.y)
    assert int(out.stack[0]) == 1

    claims = claims_from_deferred_state(out.deferred_state)
    kinds = [type(c).__name__ for c in claims]
    assert kinds == ["EcMulClaim", "EcMulClaim", "EcMulClaim", "EcAddClaim"]
    assert deferred_root_for(claims) == tuple(out.deferred_root)


def test_ecdsa_adversarial_vectors():
    """Wycheproof-style edge vectors against both the host verifier and
    the in-VM verifier: zero / overflow r and s, swapped signature
    halves, and the high-s malleated twin (accepted by design — this
    scheme, like the reference's, does not enforce low-s)."""
    from miden_tpu.dsa.ecdsa_k256 import N as EC_N
    from miden_tpu.dsa.ecdsa_k256 import Signature, SigningKey

    sk = SigningKey.from_seed(b"miden-tpu-ecdsa-vectors")
    pk = sk.public_key()
    digest = b"\xab" * 32
    sig = sk.sign_prehash(digest)
    e = int.from_bytes(digest, "big")

    vectors = [
        # (r, s, expect_valid)
        (sig.r, sig.s, True),
        (0, sig.s, False),
        (sig.r, 0, False),
        (EC_N, sig.s, False),
        (sig.r, EC_N, False),
        (EC_N - 1, sig.s, False),
        (sig.s, sig.r, False),  # swapped halves
        (sig.r, EC_N - sig.s, True),  # high-s malleated twin
    ]
    for r, s, want in vectors:
        host = pk.verify_prehash(digest, Signature(r=r, s=s, v=sig.v))
        assert host == want, (r, s, want)
        out = _run_ecdsa(e, r, s, pk.x, pk.y)
        assert int(out.stack[0]) == int(want), (r, s, want)

    # wrong public key
    other = SigningKey.from_seed(b"other-key").public_key()
    out = _run_ecdsa(e, sig.r, sig.s, other.x, other.y)
    assert int(out.stack[0]) == 0
