"""DSA suite + crypto utilities (crates/crypto/src/{dsa,aead,ecdh,ies,rand}).

RFC vectors pin Ed25519 (RFC 8032 TEST 1-3), X25519 (RFC 7748 §5.2), and
ChaCha20-Poly1305 building blocks; the rest are roundtrip/consistency tests
mirroring the reference's in-module test style.
"""

import pytest

from miden_tpu.crypto import aead, ecdh, ies, rand_coin
from miden_tpu.dsa import ecdsa_k256 as ec
from miden_tpu.dsa import ed25519 as ed
from miden_tpu.field import gl


# -- Ed25519 (RFC 8032) ------------------------------------------------------


def test_ed25519_rfc8032_test1():
    sk = ed.SigningKey(bytes.fromhex(
        "9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60"))
    pk = sk.public_key()
    assert pk.data.hex() == (
        "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a")
    sig = sk.sign_bytes(b"")
    assert sig.hex() == (
        "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
        "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b")
    assert pk.verify_bytes(b"", sig)
    assert not pk.verify_bytes(b"x", sig)


def test_ed25519_rfc8032_test2():
    sk = ed.SigningKey(bytes.fromhex(
        "4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb"))
    pk = sk.public_key()
    assert pk.data.hex() == (
        "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c")
    msg = bytes([0x72])
    sig = sk.sign_bytes(msg)
    assert sig.hex() == (
        "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
        "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00")
    assert pk.verify_bytes(msg, sig)


def test_ed25519_word_and_commitment():
    sk = ed.SigningKey(b"\x07" * 32)
    pk = sk.public_key()
    word = (5, 6, 7, 8)
    sig = sk.sign(word)
    assert pk.verify(word, sig)
    assert not pk.verify((5, 6, 7, 9), sig)
    assert len(pk.to_commitment()) == 4
    assert len(pk.to_elements()) == 8
    # malleability: s >= L rejected
    bad = sig[:32] + (ed.L).to_bytes(32, "little")
    assert not pk.verify(word, bad)


# -- ECDSA secp256k1 ---------------------------------------------------------


def test_ecdsa_sign_verify_recover():
    sk = ec.SigningKey.from_seed(b"key")
    pk = sk.public_key()
    assert ec.is_on_curve((pk.x, pk.y))
    msg = (11, 22, 33, 44)
    sig = sk.sign(msg)
    assert sig.s <= ec.N // 2  # low-s normalization
    assert pk.verify(msg, sig)
    assert not pk.verify((11, 22, 33, 45), sig)
    rec = ec.PublicKey.recover_from(msg, sig)
    assert (rec.x, rec.y) == (pk.x, pk.y)
    # serialization roundtrips
    assert ec.PublicKey.from_bytes(pk.to_bytes()) == pk
    assert ec.Signature.from_bytes(sig.to_bytes()) == sig
    # deterministic (RFC 6979) signing
    assert sk.sign(msg) == sig
    assert len(pk.to_commitment()) == 4
    assert len(pk.to_elements()) == 16


def test_ecdsa_rejects_bad_inputs():
    with pytest.raises(ec.EcdsaError):
        ec.SigningKey.from_bytes(b"\x00" * 32)
    with pytest.raises(ec.EcdsaError):
        ec.Signature.from_bytes(b"\x00" * 65)
    # an r whose x-coordinate is not on the curve cannot be lifted
    r_bad = next(r for r in range(2, 50) if ec._lift_x(r, False) is None)
    with pytest.raises(ec.EcdsaError):
        ec.PublicKey.recover_from((9, 9, 9, 9), ec.Signature(r_bad, 1, 0))
    with pytest.raises(ec.EcdsaError):
        ec.PublicKey.from_bytes(bytes([2]) + r_bad.to_bytes(32, "big"))


# -- X25519 (RFC 7748 §5.2 vector 1) + ECDH ----------------------------------


def test_x25519_rfc7748_vector():
    k = bytes.fromhex(
        "a546e36bf0527c9d3b16154b82465edd62144c0ac1fc5a18506a2244ba449ac4")
    u = bytes.fromhex(
        "e6db6867583030db3594c1a424b15f7c726624ec26b3353b10a903a6d0ab1c4c")
    out = ecdh.x25519(k, u)
    assert out.hex() == (
        "c3da55379de9c6908e94ea4df28d084f32eccf03491c71f754b4075577a28552")


def test_x25519_agreement():
    a, b = b"\x01" * 32, b"\x02" * 32
    pa, pb = ecdh.x25519_public_key(a), ecdh.x25519_public_key(b)
    assert ecdh.x25519_shared_secret(a, pb) == ecdh.x25519_shared_secret(b, pa)


def test_k256_ecdh_agreement():
    a = ec.SigningKey.from_seed(b"alice")
    b = ec.SigningKey.from_seed(b"bob")
    assert a.get_shared_secret(b.public_key()) == b.get_shared_secret(a.public_key())


# -- AEAD --------------------------------------------------------------------


def test_aead_poseidon2_roundtrip():
    key = aead.AeadPoseidon2([1, 2, 3, 4])
    data = list(range(19))
    ad = [7, 8, 9]
    enc = key.encrypt_elements(data, ad, nonce=(9, 9, 9, 9))
    assert key.decrypt_elements(enc, ad) == data
    # wrong AD / tampered ciphertext / wrong key all fail
    with pytest.raises(aead.AeadError):
        key.decrypt_elements(enc, [7, 8])
    bad = aead.EncryptedData("elements", [(enc.ciphertext[0] + 1) % gl.P] + enc.ciphertext[1:], enc.auth_tag, enc.nonce)
    with pytest.raises(aead.AeadError):
        key.decrypt_elements(bad, ad)
    with pytest.raises(aead.AeadError):
        aead.AeadPoseidon2([1, 2, 3, 5]).decrypt_elements(enc, ad)


def test_aead_poseidon2_bytes_roundtrip():
    key = aead.AeadPoseidon2([5, 6, 7, 8])
    for msg in (b"", b"short", b"x" * 200):
        enc = key.encrypt_bytes(msg, b"context")
        assert key.decrypt_bytes(enc, b"context") == msg


def test_byte_element_packing_roundtrip():
    for msg in (b"", b"a", b"1234567", b"12345678", b"x" * 100):
        felts = aead.bytes_to_elements_with_padding(msg)
        assert aead.padded_elements_to_bytes(felts) == msg


def test_xchacha20poly1305_roundtrip():
    key = aead.XChaCha20Poly1305(b"\x42" * 32)
    sealed = key.encrypt_bytes(b"hello world", b"ad")
    assert key.decrypt_bytes(sealed, b"ad") == b"hello world"
    with pytest.raises(aead.AeadError):
        key.decrypt_bytes(sealed, b"other-ad")
    with pytest.raises(aead.AeadError):
        key.decrypt_bytes(sealed[:-1] + bytes([sealed[-1] ^ 1]), b"ad")


# -- IES ---------------------------------------------------------------------


@pytest.mark.parametrize("scheme", sorted(ies.SCHEMES))
def test_ies_seal_unseal(scheme):
    msg = b"the deferred root is bound"
    if scheme.startswith("k256"):
        sk = ec.SigningKey.from_seed(b"recipient")
        pk = sk.public_key()
        secret = sk
    else:
        secret = b"\x33" * 32
        pk = ecdh.x25519_public_key(secret)
    sealed = ies.seal_bytes(scheme, pk, msg, b"ad")
    assert ies.unseal_bytes(secret, sealed, b"ad") == msg
    with pytest.raises(Exception):
        ies.unseal_bytes(secret, sealed, b"wrong-ad")


# -- RandomCoin --------------------------------------------------------------


def test_random_coin():
    coin = rand_coin.RandomCoin((1, 2, 3, 4))
    first9 = [coin.draw() for _ in range(9)]
    assert all(0 <= v < gl.P for v in first9)
    # deterministic + rate-aligned permutation schedule
    coin2 = rand_coin.RandomCoin((1, 2, 3, 4))
    from miden_tpu.hash import poseidon2_host as hp

    state = [0] * 12
    state[0:4] = [1, 2, 3, 4]
    state = hp.permute(state)
    assert first9[:8] == state[:8]
    assert first9[8] == hp.permute(state)[0]
    # reseed diverges the stream and resets the pointer
    coin2.reseed((5, 5, 5, 5))
    assert coin2.draw() != rand_coin.RandomCoin((1, 2, 3, 4)).draw()
    # parts roundtrip
    state, cur = coin.into_parts()
    clone = rand_coin.RandomCoin.from_parts(state, cur)
    assert clone.draw() == coin.draw()
    # byte stream
    assert len(coin.fill_bytes(10)) == 10
