"""Falcon-512 with Poseidon2 hash-to-point (dsa/falcon512_poseidon2/).

Covers the NTRU equation, deterministic sign → exact NTT verify, norm-bound
rejection, and the reference byte encodings (pk 897B, sig poly 625B
compressed, sk 1281B with G recomputation).
"""

import pytest

from miden_tpu.dsa import falcon512 as fc

# module-scope keypair: keygen is a few seconds of NTRUSolve
_SK = fc.SecretKey.generate(seed=b"\x42" * 32)
_PK = _SK.public_key()


def test_ntru_equation():
    g, neg_f, G, neg_F = _SK.basis
    f = [-v for v in neg_f]
    F = [-v for v in neg_F]
    diff = [
        a - b
        for a, b in zip(fc._int_negacyclic_mul(f, G), fc._int_negacyclic_mul(g, F))
    ]
    assert diff[0] == fc.Q and all(v == 0 for v in diff[1:])


def test_sign_verify_deterministic():
    msg = (17, 34, 51, 68)
    sig = _SK.sign(msg)
    assert _PK.verify(msg, sig)
    assert not _PK.verify((17, 34, 51, 69), sig)
    # deterministic: same sk + message → same signature
    assert _SK.sign(msg).s2 == sig.s2
    # s2 within the encodable range and norm bound honored
    assert max(abs(v) for v in sig.s2) <= 2047
    c = fc.hash_to_point(msg, sig.nonce)
    s2h = fc.poly_mul_mod([v % fc.Q for v in sig.s2], _PK.h)
    s1 = [(a - b) % fc.Q for a, b in zip(c, s2h)]
    norm = sum(fc._balanced(v) ** 2 for v in s1) + sum(v * v for v in sig.s2)
    assert norm < fc.SIG_L2_BOUND


def test_tampered_signature_rejected():
    msg = (1, 2, 3, 4)
    sig = _SK.sign(msg)
    # flip one coefficient: the (s1, s2) vector leaves the short-norm ball
    bad = fc.Signature(sig.nonce, [sig.s2[0] + 1] + sig.s2[1:], sig.h)
    assert not _PK.verify(msg, bad)
    # a signature under a different public key binds to its own h
    other = fc.Signature(sig.nonce, sig.s2, [(v + 1) % fc.Q for v in sig.h])
    assert not _PK.verify(msg, other)


def test_serialization_roundtrips():
    msg = (9, 8, 7, 6)
    sig = _SK.sign(msg)
    blob = sig.to_bytes()
    assert len(blob) == 1 + fc.SIG_NONCE_LEN + fc.SIG_POLY_BYTE_LEN + fc.PK_LEN
    rt = fc.Signature.from_bytes(blob)
    assert rt.s2 == sig.s2 and rt.h == sig.h and rt.nonce == sig.nonce
    assert _PK.verify(msg, rt)

    assert fc.PublicKey.from_bytes(_PK.to_bytes()).h == _PK.h
    assert len(_PK.to_bytes()) == fc.PK_LEN

    skb = _SK.to_bytes()
    assert len(skb) == 1281
    assert fc.SecretKey.from_bytes(skb).basis == _SK.basis

    with pytest.raises(fc.FalconError):
        fc.Signature.from_bytes(b"\x00" + blob[1:])
    with pytest.raises(fc.FalconError):
        fc.PublicKey.from_bytes(b"\x00" * fc.PK_LEN)


def test_commitment_and_hash_to_point():
    assert len(_PK.to_commitment()) == 4
    # hash-to-point: 512 coefficients mod q, nonce-sensitive
    c1 = fc.hash_to_point((1, 2, 3, 4), fc.deterministic_nonce())
    assert len(c1) == fc.N and all(0 <= v < fc.Q for v in c1)
    c2 = fc.hash_to_point((1, 2, 3, 4), bytes([2]) + fc.PREVERSIONED_NONCE)
    assert c1 != c2


def test_sampler_z_statistics():
    rng = fc.ChaChaRng(b"\x05" * 32)
    samples = [fc.sampler_z(0.5, 1.5, fc.SIGMIN, rng) for _ in range(2000)]
    mean = sum(samples) / len(samples)
    var = sum((s - mean) ** 2 for s in samples) / len(samples)
    assert abs(mean - 0.5) < 0.15
    assert abs(var - 2.25) < 0.5
