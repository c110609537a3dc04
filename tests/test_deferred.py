"""Deferred DAG: canonical node digests, state semantics, wire form.

Mirrors the reference's deferred-state test strategy
(core/src/deferred/{node,state,wire}.rs #[cfg(test)]): tag/namespace
rules, digest binding, register/evaluate/log semantics, strict
canonical wire rehydration, and budget enforcement — plus the bindings
this framework adds: the AND digest equals the LOGDEFERRED fold and the
session AIR's claim statement digests equal canonical node digests.
"""

import pytest

from miden_tpu.hash import poseidon2_host as hp
from miden_tpu.hash.keccak_host import keccak256
from miden_tpu.vm import deferred as D

MASK = (1 << 256) - 1


def _u256_dag_claim(state, a, b, out, pid):
    nodes = [D.u256_value_node(x) for x in (a, b, out)]
    for n in nodes:
        state.register(n)
    stmt = D.binop_statement_node(
        pid, nodes[0].digest(), nodes[1].digest(), nodes[2].digest()
    )
    return state.register(stmt)


def test_framework_tags_and_namespace():
    assert D.Node.true_node().digest() == D.TRUE_DIGEST
    assert D.TAG_AND.as_word() == (1, 0, 0, 0)
    assert D.TAG_CHUNKS.as_word() == (2, 0, 0, 0)
    for bad in (0, 1, 2):
        with pytest.raises(D.DeferredError):
            D.Tag.precompile(bad)
        with pytest.raises(D.DeferredError):
            D.Node.data(D.Tag(bad) if bad != 2 else D.Tag(0), ((0,) * 8,))
    # name-derived ids avoid the reserved namespace and are stable
    assert D.precompile_id("foo") == D.precompile_id("foo")
    assert D.precompile_id("foo") != D.precompile_id("bar")
    assert D.precompile_id("foo") not in (0, 1, 2)


def test_digest_binds_tag_and_payload():
    c = tuple(range(8))
    n1 = D.Node.data(D.Tag.precompile(9), (c,))
    n2 = D.Node.data(D.Tag.precompile(9, (1, 0, 0)), (c,))
    n3 = D.Node.data(D.Tag.precompile(9), (tuple(range(1, 9)),))
    assert len({n1.digest(), n2.digest(), n3.digest()}) == 3
    # multi-chunk sponge: digest chains the capacity across absorbs
    m = D.Node.data(D.Tag.precompile(9), (c, c))
    s1 = hp.permute([*c, 9, 0, 0, 0])
    assert m.digest() == tuple(hp.permute([*c, *s1[8:12]])[0:4])


def test_and_digest_is_the_logdeferred_fold():
    lhs, rhs = (1, 2, 3, 4), (5, 6, 7, 8)
    want = tuple(hp.permute([*lhs, *rhs, 1, 0, 0, 0])[0:4])
    assert D.Node.and_node(lhs, rhs).digest() == want


def test_chunks_from_bytes_packs_le_u32_and_zero_pads():
    empty = D.Node.chunks_from_bytes(b"")
    assert empty.chunks == (((0,) * 8),)
    n = D.Node.chunks_from_bytes(bytes([1, 2, 3, 4, 5]))
    assert n.chunks[0][0] == int.from_bytes(bytes([1, 2, 3, 4]), "little")
    assert n.chunks[0][1] == 5 and n.chunks[0][2:] == (0,) * 6
    long = D.Node.chunks_from_bytes(bytes(range(33)))
    assert len(long.chunks) == 2 and long.chunks[1][0] == 32


def test_statement_digest_matches_session_scheme():
    from miden_tpu.precompile.session import (
        U256AddClaim,
        claim_statement_digest,
    )

    cl = U256AddClaim(a=(1 << 255) + 17, b=MASK - 3)
    nodes = [D.u256_value_node(x) for x in (cl.a, cl.b, cl.out)]
    stmt = D.binop_statement_node(
        D.PID_U256_ADD,
        nodes[0].digest(),
        nodes[1].digest(),
        nodes[2].digest(),
    )
    assert stmt.digest() == claim_statement_digest(cl)


def test_register_evaluate_log_and_memoization():
    st = D.DeferredState(D.default_registry())
    a, b = 77, (1 << 250) + 13
    sd = _u256_dag_claim(st, a, b, (a + b) & MASK, D.PID_U256_ADD)
    # predicate evaluated eagerly to TRUE and memoized
    assert st.evaluate_digest(sd) == D.TRUE_DIGEST
    root1 = st.log_statement(sd)
    assert root1 == D.Node.and_node(D.TRUE_DIGEST, sd).digest()
    # mul claim on the same operands
    md = _u256_dag_claim(st, a, b, (a * b) & MASK, D.PID_U256_MUL)
    root2 = st.log_verified_statement(md, D.Node.and_node(root1, md).digest())
    assert st.root == root2
    with pytest.raises(D.DeferredError):
        st.log_verified_statement(md, (9, 9, 9, 9))


def test_false_claims_and_dangling_children_rejected():
    st = D.DeferredState(D.default_registry())
    an, bn = D.u256_value_node(5), D.u256_value_node(6)
    st.register(an)
    st.register(bn)
    on = D.u256_value_node(12)  # 5 + 6 != 12
    st.register(on)
    bad = D.binop_statement_node(
        D.PID_U256_ADD, an.digest(), bn.digest(), on.digest()
    )
    with pytest.raises(D.DeferredError):
        st.register(bad)
    dangling = D.binop_statement_node(
        D.PID_U256_ADD, (1, 1, 1, 1), bn.digest(), on.digest()
    )
    with pytest.raises(D.DeferredError):
        st.register(dangling)


def test_keccak_statement_arbitrary_length():
    st = D.DeferredState(D.default_registry())
    msg = bytes(range(256)) * 4  # 1 KiB
    out = D.Node.chunks_from_bytes(keccak256(msg))
    st.register(out)
    msg_node, stmt = D.keccak_statement_node(msg, out.digest())
    assert len(msg_node.chunks) == 5 * -(-(len(msg) + 1) // 136)
    st.register(msg_node)
    sd = st.register(stmt)
    st.log_statement(sd)
    # wrong digest rejected
    bad_out = D.Node.chunks_from_bytes(keccak256(msg + b"x"))
    st.register(bad_out)
    _, bad = D.keccak_statement_node(msg, bad_out.digest())
    with pytest.raises(D.DeferredError):
        st.register(bad)
    # non-canonical chunking rejected (extra block of zeros)
    padded = D.Node.chunks_node(
        D.keccak_message_chunks(msg) + D.keccak_message_chunks(b"")
    )
    st.register(padded)
    forged = D.Node.join(
        D.Tag.precompile(D.PID_KECCAK256, (len(msg), 0, 0)),
        padded.digest(),
        out.digest(),
    )
    with pytest.raises(D.DeferredError):
        st.register(forged)


def test_wire_roundtrip_bytes_and_strictness():
    st = D.DeferredState(D.default_registry())
    a, b = 111, 222
    sd = _u256_dag_claim(st, a, b, a + b, D.PID_U256_ADD)
    st.log_statement(sd)
    msg = b"hello deferred world" * 11
    out = D.Node.chunks_from_bytes(keccak256(msg))
    st.register(out)
    msg_node, stmt = D.keccak_statement_node(msg, out.digest())
    st.register(msg_node)
    st.log_statement(st.register(stmt))

    wire = st.to_wire()
    blob = wire.to_bytes()
    assert D.DeferredStateWire.from_bytes(blob) == wire
    st2 = D.DeferredState.from_wire(D.default_registry(), wire)
    assert st2.root == st.root and set(st2.nodes) >= set(
        d for d in st.nodes if d in {e for e in st2.nodes}
    )

    # orphans are dropped from wire (root-reachable closure only)
    st.register(D.u256_value_node(999))
    assert st.to_wire() == wire

    # non-canonical orderings are rejected
    shuffled = D.DeferredStateWire(list(reversed(wire.entries)))
    with pytest.raises(D.IntegrityError):
        shuffled.rehydrate(D.default_registry())

    # empty wire opens TRUE
    st3 = D.DeferredStateWire([]).rehydrate(D.default_registry())
    assert st3.root == D.TRUE_DIGEST

    # byte-level: bad magic, truncation, trailing garbage
    for bad in (b"XXXX" + blob[4:], blob[:-3], blob + b"\x00"):
        with pytest.raises(D.IntegrityError):
            D.DeferredStateWire.from_bytes(bad)


def test_budget_enforced():
    st = D.DeferredState(D.default_registry(), max_elements=20)
    st.register(D.u256_value_node(1))  # 4 + 8 = 12 felts
    with pytest.raises(D.IntegrityError):
        st.register(D.u256_value_node(2))  # would exceed 20
    wire_big = D.DeferredState(D.default_registry())
    sd = _u256_dag_claim(wire_big, 1, 2, 3, D.PID_U256_ADD)
    wire_big.log_statement(sd)
    with pytest.raises(D.IntegrityError):
        wire_big.to_wire().rehydrate(D.default_registry(), max_elements=10)


def test_vm_execution_produces_synced_dag_witness():
    """The keccak merge event registers its claim; LOGDEFERRED advances
    the DAG via log_verified_statement; the output carries a witness
    whose wire justifies the bound root."""
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.processor import execute

    a, b = (1 << 200) + 7, (1 << 130) + 9
    limbs = lambda v: [(v >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
    src = (
        "use miden::core::crypto::hashes::keccak256\n"
        "begin exec.keccak256::merge end"
    )
    out = execute(
        assemble_with_stdlib(src),
        limbs(a) + limbs(b),
        event_handlers=stdlib_event_handlers(),
    )
    st = out.deferred_state
    assert st is not None and st.root == tuple(out.deferred_root)
    wire = st.to_wire()
    st2 = D.DeferredState.from_wire(D.default_registry(), wire)
    assert st2.root == tuple(out.deferred_root)


def test_raw_logdeferred_clears_sync():
    """Folding an unregistered statement keeps executing (the chain is
    constrained without a witness) but withholds the DAG witness."""
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op
    from miden_tpu.vm.processor import execute

    ops = [Op("PUSH", v) for v in (4, 3, 2, 1)] + [Op("PUSH", 0)] * 4
    ops.append(Op("LOGDEFERRED"))
    forest = MastForest()
    r = forest.add_block(ops)
    forest.make_root(r)
    out = execute(Program(forest, r), [0] * 16)
    assert any(out.deferred_root)
    assert out.deferred_state is None
