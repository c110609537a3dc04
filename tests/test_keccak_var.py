"""Arbitrary-length keccak precompile: KeccakVarAir + SpongeAir.

Fast tests run the exact scalar evaluator over a session mixing all
four claim kinds (u256 add/mul, 64-byte merge, arbitrary-length) and
check the cross-AIR LogUp balance plus targeted tampering; slow tests
prove + verify the full second STARK including a 1 KiB claim.
"""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.hash.keccak_host import keccak256
from miden_tpu.precompile.keccak import Keccak256Claim, KeccakAir
from miden_tpu.precompile.keccak_var import (
    CYCLE,
    KECCAK_VAR_WIDTH,
    KeccakClaim,
    KeccakVarAir,
    SpongeAir,
    V_A0,
    build_keccak_var_trace,
)
from miden_tpu.precompile.session import (
    ChainAir,
    RangeTableAir,
    SessionMultiAir,
    SessionPermAir,
    U256AddClaim,
    U256Air,
    U256MulClaim,
    build_session_traces,
    claim_statement_digest,
    deferred_root_for,
    prove_deferred_state,
    verify_deferred,
)
from miden_tpu.stark.debug import check_air
from miden_tpu.stark.params import TEST_PARAMS

RAND = [(0x1234_5678_9ABC_DEF0, 0x0FED_CBA9_8765_4321), (12345, 67890)]

# all four claim kinds; arbitrary lengths cover empty, multi-block, and
# a rate-boundary-straddling length
MIXED = [
    U256AddClaim(a=(1 << 255) + 12345, b=(1 << 255) + (7 << 128)),
    KeccakClaim(message=b""),
    U256MulClaim(a=0xDEADBEEF_CAFEBABE, b=(1 << 200) + 17),
    KeccakClaim(message=bytes(range(200))),  # 2 blocks, pad mid-block
    Keccak256Claim(a=0x1122_DEAD_BEEF, b=(1 << 255) | 0xF00D),
]


def _publics(root, claims):
    n = len(claims)
    nu = sum(1 for c in claims if isinstance(c, (U256AddClaim, U256MulClaim)))
    nk = sum(1 for c in claims if isinstance(c, Keccak256Claim))
    return [*[int(v) % gl.P for v in root], n, nu, nk, 0]


def _airs_and_traces(tr, claims):
    out = [
        (ChainAir(), tr.chain),
        (U256Air(), tr.u256),
        (RangeTableAir(), tr.rng),
        (SessionPermAir(), tr.perm),
    ]
    if tr.keccak is not None:
        out.append((KeccakAir(), tr.keccak))
    if tr.kvar is not None:
        out.append((KeccakVarAir(), tr.kvar))
        out.append((SpongeAir(), tr.sponge))
    return out


def _check_all(tr, claims, expect_ok=True, only=None):
    """Exact-evaluator check. ``only`` limits the (expensive) constraint
    sweep to the named AIR classes; the LogUp balance always spans every
    AIR (aux builds are cheap relative to check_air)."""
    publics = _publics(tr.root, claims)
    finals = []
    bad = []
    for air, main in _airs_and_traces(tr, claims):
        aux, vals = air.build_aux_trace(main, publics, [], RAND)
        if only is None or type(air).__name__ in only:
            vs = check_air(
                air, main, aux=aux, publics=publics, randomness=RAND,
                aux_values=vals,
            )
            if vs:
                bad.append((type(air).__name__, vs[:3]))
        finals.extend(vals)
    total = SessionMultiAir([]).eval_external(RAND, [finals], [])[0]
    if expect_ok:
        assert not bad, bad
        assert tuple(total) == (0, 0), f"LogUp imbalance: {total}"
    return bad, tuple(total)


def test_var_trace_digests_match_host():
    claims = [KeccakClaim(b""), KeccakClaim(bytes(range(200)))]
    trace = build_keccak_var_trace(claims)
    assert trace.shape[1] == KECCAK_VAR_WIDTH
    # claim 0: 1 block at cycle 0; claim 1: blocks at cycles 1, 2
    for cyc, cl in ((0, claims[0]), (2, claims[1])):
        out_row = trace[CYCLE * cyc + 24]
        got = sum(int(out_row[V_A0 + t]) << t for t in range(256))
        assert got == cl.out, f"cycle {cyc} digest mismatch"


@pytest.mark.slow
def test_mixed_four_kind_session_satisfies_and_balances():
    tr = build_session_traces(MIXED)
    assert tr.root == deferred_root_for(MIXED)
    _check_all(tr, MIXED)


def test_statement_digest_matches_dag_node():
    from miden_tpu.vm import deferred as D

    cl = MIXED[3]
    out_node = D.Node.chunks_from_bytes(keccak256(cl.message))
    _, stmt = D.keccak_statement_node(cl.message, out_node.digest())
    assert stmt.digest() == claim_statement_digest(cl)


@pytest.mark.parametrize(
    "mutate,only",
    [
        # flip a digest bit on the final out row -> out-chunk mismatch
        (lambda tr: tr.kvar.__setitem__((CYCLE * 2 + 24, V_A0 + 3), 1 - int(tr.kvar[CYCLE * 2 + 24, V_A0 + 3])), ("KeccakVarAir",)),
        # flip a message bit (keeps booleanity) -> round/absorb breaks
        (lambda tr: tr.kvar.__setitem__((CYCLE * 1, V_A0 + 7), 1 - int(tr.kvar[CYCLE * 1, V_A0 + 7])), ("KeccakVarAir",)),
        # lie about the length in the sponge -> range/kstmt breaks
        (lambda tr: tr.sponge.__setitem__((0, 3), int(tr.sponge[0, 3]) + 1), ("SpongeAir",)),
    ],
)
def test_tampering_rejected(mutate, only):
    tr = build_session_traces(MIXED)
    mutate(tr)
    bad, total = _check_all(tr, MIXED, expect_ok=False, only=only)
    assert bad or total != (0, 0), "tampered session accepted"


@pytest.mark.slow
@pytest.mark.skipif(
    __import__("os").environ.get("MIDEN_TPU_HEAVY") != "1"
    and __import__("jax").default_backend() == "cpu",
    reason="KeccakVarAir's constraint graph takes >25 min to compile on "
    "the CPU XLA backend (fine on the TPU compile service); run with "
    "MIDEN_TPU_HEAVY=1 to force",
)
def test_prove_verify_1kib_keccak_session_e2e():
    """The stage-3 'done' shape: u256 mul + a 1 KiB keccak claim in one
    session, proven and verified against the deferred root."""
    claims = [
        U256MulClaim(a=(1 << 128) + 3, b=(1 << 130) + 5),
        KeccakClaim(message=bytes(range(256)) * 4),  # 1 KiB, 8 blocks
    ]
    proof = prove_deferred_state(claims, params=TEST_PARAMS)
    assert proof.n_kmerge == 0 and proof.n_u256 == 1
    verify_deferred(proof, deferred_root_for(claims), params=TEST_PARAMS)
    from miden_tpu.stark.verifier import VerificationError

    with pytest.raises(VerificationError):
        verify_deferred(proof, (1, 2, 3, 4), params=TEST_PARAMS)


def test_claims_from_deferred_state_roundtrip():
    """A DeferredState's AND-chain converts to session claims whose
    fold reproduces the DAG root (the execute -> discharge bridge)."""
    from miden_tpu.precompile.session import claims_from_deferred_state
    from miden_tpu.vm import deferred as D

    st = D.DeferredState(D.default_registry())
    for cl in MIXED:
        if isinstance(cl, KeccakClaim):
            out_node = D.Node.chunks_from_bytes(keccak256(cl.message))
            st.register(out_node)
            msg_node, stmt = D.keccak_statement_node(
                cl.message, out_node.digest()
            )
            st.register(msg_node)
            sd = st.register(stmt)
        else:
            nodes = [D.u256_value_node(x) for x in (cl.a, cl.b, cl.out)]
            for nd in nodes:
                st.register(nd)
            sd = st.register(
                D.binop_statement_node(
                    cl.id, *(nd.digest() for nd in nodes)
                )
            )
        st.log_statement(sd)

    claims = claims_from_deferred_state(st)
    assert [type(c).__name__ for c in claims] == [
        type(c).__name__ for c in MIXED
    ]
    assert deferred_root_for(claims) == tuple(st.root)
    assert st.root == tuple(deferred_root_for(MIXED))


def _hash_memory_program(message: bytes):
    """MASM that stores `message` in the canonical chunk layout at
    address 1000 and calls keccak256::hash_memory."""
    from miden_tpu.vm.deferred import keccak_message_chunks

    limbs = [v for c in keccak_message_chunks(message) for v in c]
    stores = "".join(
        f"push.{v}.{1000 + i} mem_store " for i, v in enumerate(limbs) if v
    )
    return (
        "use miden::core::crypto::hashes::keccak256\n"
        f"begin {stores} push.{len(message)} push.1000 "
        "exec.keccak256::hash_memory end"
    )


def test_hash_memory_masm_digest_and_dag():
    """keccak256::hash_memory returns the digest, folds the canonical
    id-6 claim into the deferred root, and keeps the DAG synced."""
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.processor import execute

    msg = bytes(range(1, 201))  # 200 bytes -> 2 blocks
    out = execute(
        assemble_with_stdlib(_hash_memory_program(msg)),
        [0] * 16,
        event_handlers=stdlib_event_handlers(),
    )
    want = int.from_bytes(keccak256(msg), "little")
    assert list(out.stack[0:8]) == [
        (want >> (32 * i)) & 0xFFFFFFFF for i in range(8)
    ]
    cl = KeccakClaim(message=msg)
    assert tuple(out.deferred_root) == deferred_root_for([cl])
    assert out.deferred_state is not None
    assert out.deferred_state.root == tuple(out.deferred_root)
    from miden_tpu.precompile.session import claims_from_deferred_state

    assert claims_from_deferred_state(out.deferred_state) == [cl]


@pytest.mark.slow
@pytest.mark.skipif(
    __import__("os").environ.get("MIDEN_TPU_HEAVY") != "1"
    and __import__("jax").default_backend() == "cpu",
    reason="kvar session prove is CPU-compile-bound; see above",
)
def test_hash_memory_full_loop_e2e():
    """Execute -> main proof -> DAG-discharged session proof -> full
    verification: the complete stage-3 'bound to a main proof' loop."""
    from miden_tpu.precompile.session import prove_deferred_state_dag
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.prove import prove_program, verify_program

    msg = bytes(range(1, 151))
    out, proof = prove_program(
        assemble_with_stdlib(_hash_memory_program(msg)),
        params=TEST_PARAMS,
        event_handlers=stdlib_event_handlers(),
    )
    assert any(proof.deferred_root)
    # partial verification consumes the embedded wire witness
    verify_program(proof, params=TEST_PARAMS, partial=True)
    session = prove_deferred_state_dag(out.deferred_state, params=TEST_PARAMS)
    verify_program(proof, params=TEST_PARAMS, deferred=session)
