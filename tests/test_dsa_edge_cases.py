"""Adversarial DSA/ECDH edge cases (Wycheproof-style).

The reference validates its suite against the Wycheproof vector sets
(tests/wycheproof/src/lib.rs — loaded from the wycheproof-ng crates at
build time, so the raw vectors are not vendored in-tree and are not
available offline here). This module covers the same *failure classes*
those vectors probe — scalar range violations, malleability, off-curve
and non-canonical point encodings, low-order ECDH inputs — constructed
directly against our implementations. It is NOT a Wycheproof run; when
vectors can be vendored, they should replace the constructed cases.
"""

import pytest

from miden_tpu.dsa import ecdsa_k256 as ecdsa
from miden_tpu.dsa import ed25519
from miden_tpu.crypto import ecdh

MSG = [1, 2, 3, 4]


@pytest.fixture(scope="module")
def k256_pair():
    sk = ecdsa.SigningKey.from_seed(b"\x01" * 32)
    return sk, sk.public_key(), sk.sign(MSG)


class TestEcdsaK256:
    def test_scalar_range_rejected(self, k256_pair):
        _, pk, sig = k256_pair
        n = ecdsa.N
        for r, s in ((0, sig.s), (sig.r, 0), (n, sig.s), (sig.r, n),
                     (n + 1, sig.s), (sig.r, n + sig.s)):
            assert not pk.verify(MSG, ecdsa.Signature(r % (1 << 256), s % (1 << 256), sig.v))
        # serialized forms with out-of-range scalars must not parse
        bad = n.to_bytes(32, "big") + sig.s.to_bytes(32, "big") + b"\x00"
        with pytest.raises(ecdsa.EcdsaError):
            ecdsa.Signature.from_bytes(bad)
        bad = (0).to_bytes(32, "big") + sig.s.to_bytes(32, "big") + b"\x00"
        with pytest.raises(ecdsa.EcdsaError):
            ecdsa.Signature.from_bytes(bad)

    def test_high_s_malleated_signature(self, k256_pair):
        """(r, n - s) verifies under plain ECDSA; the recovery id must
        catch the flip when key-recovery is the verification path."""
        _, pk, sig = k256_pair
        mal = ecdsa.Signature(sig.r, ecdsa.N - sig.s, sig.v)
        assert pk.verify(MSG, mal)  # mathematical ECDSA accepts both
        rec = ecdsa.PublicKey.recover_from(MSG, mal)
        assert (rec.x, rec.y) != (pk.x, pk.y), "recovery id must bind s"

    def test_off_curve_public_key_rejected(self, k256_pair):
        _, pk, sig = k256_pair
        off = ecdsa.PublicKey(pk.x, (pk.y + 1) % (2**256 - 2**32 - 977))
        assert not off.verify(MSG, sig)
        # compressed encoding with a non-residue x must not parse
        bad_x = next(
            x for x in range(2, 64) if ecdsa._lift_x(x, False) is None
        )
        with pytest.raises(ecdsa.EcdsaError):
            ecdsa.PublicKey.from_bytes(bytes([2]) + bad_x.to_bytes(32, "big"))

    def test_wrong_message_and_truncated_encodings(self, k256_pair):
        _, pk, sig = k256_pair
        assert not pk.verify([9, 9, 9, 9], sig)
        with pytest.raises(ecdsa.EcdsaError):
            ecdsa.Signature.from_bytes(sig.to_bytes()[:64])
        with pytest.raises(ecdsa.EcdsaError):
            ecdsa.PublicKey.from_bytes(b"\x04" + pk.x.to_bytes(32, "big"))


class TestEd25519:
    def test_non_canonical_s_rejected(self):
        sk = ed25519.SigningKey(b"\x02" * 32)
        pk = sk.public_key()
        sig = sk.sign_bytes(b"msg")
        assert pk.verify_bytes(b"msg", sig)
        s = int.from_bytes(sig[32:], "little")
        bumped = sig[:32] + (s + ed25519.L).to_bytes(32, "little")
        assert not pk.verify_bytes(b"msg", bumped), "s >= L must fail"

    def test_tampered_r_and_lengths(self):
        sk = ed25519.SigningKey(b"\x03" * 32)
        pk = sk.public_key()
        sig = sk.sign_bytes(b"msg")
        flip = bytes([sig[0] ^ 1]) + sig[1:]
        assert not pk.verify_bytes(b"msg", flip)
        assert not pk.verify_bytes(b"msg", sig[:63])
        assert not pk.verify_bytes(b"msg", sig + b"\x00")

    def test_non_canonical_point_encoding(self):
        """An R encoding with y >= p must not verify (decompress must
        enforce canonicality)."""
        sk = ed25519.SigningKey(b"\x04" * 32)
        pk = sk.public_key()
        sig = sk.sign_bytes(b"msg")
        p = 2**255 - 19
        r_y = int.from_bytes(sig[:32], "little") & ((1 << 255) - 1)
        if r_y + p < (1 << 255):  # representable non-canonical twin
            sign_bit = int.from_bytes(sig[:32], "little") >> 255
            twin = ((sign_bit << 255) | (r_y + p)).to_bytes(32, "little")
            assert not pk.verify_bytes(b"msg", twin + sig[32:])


class TestX25519:
    def test_low_order_point_yields_zero_secret(self):
        """RFC 7748 low-order inputs produce the all-zero shared secret;
        the API must reject (or a caller comparing to zero must be able
        to): pin the actual behavior."""
        scalar = b"\x05" * 32
        zero_pt = (0).to_bytes(32, "little")
        one_pt = (1).to_bytes(32, "little")
        for pt in (zero_pt, one_pt):
            try:
                out = ecdh.x25519_shared_secret(scalar, pt)
            except Exception:
                continue  # explicit rejection is also acceptable
            assert out == b"\x00" * 32, (
                "low-order input must yield the recognizable zero secret"
            )
