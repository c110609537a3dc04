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
