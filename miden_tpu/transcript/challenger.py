"""Fiat-Shamir duplex challenger + transcript channels.

Mirrors the reference stack: p3 ``DuplexChallenger<Felt, Poseidon2, 12, 8>``
(instantiated at air/src/config.rs:223-275 with the relation digest pre-loaded
into the sponge capacity) recording into ``ProverTranscript`` /
``VerifierTranscript`` (crates/stark-transcript/src/): *sent* values are
observed into the challenger and recorded; *hints* (opened rows, Merkle
siblings) are recorded but not observed; the verifier replays the same stream
and enforces an empty tail.

The challenger state is 12 Goldilocks elements — O(1) work per interaction —
so it lives host-side as exact Python ints. The one hot spot, proof-of-work
grinding (pcs params: 16/12/4 bits), is **batched on device**: candidate
witnesses are screened thousands-at-a-time through the batched Poseidon2
permutation (:mod:`miden_tpu.hash.poseidon2`).

Duplex semantics (p3): observe buffers into ``input_buffer`` and duplexes at
rate-8; duplexing overwrites ``state[0..len(buffer)]``, permutes, and refills
``output_buffer = state[0..8]``; ``sample`` pops from the **end** of the
output buffer; any observe invalidates buffered output.
"""

from __future__ import annotations

import numpy as np

from ..field import gl
from ..field.goldilocks import fp_from_u64, fp_to_u64
from ..hash import poseidon2, poseidon2_host

RATE = 8
WIDTH = 12


import functools

import jax
import jax.numpy as jnp

from ..field.goldilocks import Fp


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _grind_batch(pos: int, bits: int, batch: int, base: "Fp", start):
    """Screen ``batch`` PoW witness candidates [start, start+batch) fully on
    device. Witnesses stay < 2^32 (overwhelmingly sufficient for ≤ 24-bit
    PoW), so the candidate lane is just a uint32 iota in the low limb."""
    ws = jnp.arange(batch, dtype=jnp.uint32) + jnp.uint32(start)
    lo = jnp.broadcast_to(base.lo, (12, batch))
    hi = jnp.broadcast_to(base.hi, (12, batch))
    lo = lo.at[pos].set(ws)
    hi = hi.at[pos].set(jnp.zeros((batch,), jnp.uint32))
    out = poseidon2.permute(Fp(lo, hi))
    lane_lo = out.lo[RATE - 1]
    lane_hi = out.hi[RATE - 1]
    mask_lo = jnp.uint32((1 << min(bits, 32)) - 1)
    ok = (lane_lo & mask_lo) == 0
    if bits > 32:
        mask_hi = jnp.uint32((1 << (bits - 32)) - 1)
        ok &= (lane_hi & mask_hi) == 0
    idx = jnp.argmax(ok)
    return idx, ok[idx]


class DuplexChallenger:
    def __init__(self, capacity_seed=None):
        self.state = [0] * WIDTH
        if capacity_seed is not None:
            assert len(capacity_seed) == 4
            self.state[RATE:] = [v % gl.P for v in capacity_seed]
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    def clone(self) -> "DuplexChallenger":
        c = DuplexChallenger()
        c.state = list(self.state)
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    def _duplexing(self) -> None:
        assert len(self.input_buffer) <= RATE
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        self.state = poseidon2_host.permute(self.state)
        self.output_buffer = list(self.state[:RATE])

    def observe(self, value: int) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(value % gl.P)
        if len(self.input_buffer) == RATE:
            self._duplexing()

    def observe_slice(self, values) -> None:
        for v in values:
            self.observe(v)

    def sample(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    def sample_ext(self) -> tuple:
        c0 = self.sample()
        c1 = self.sample()
        return (c0, c1)

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int) -> int:
        """Find a witness w with ``sample_bits(bits) == 0`` after observing w.

        Candidates are generated and screened **on device** in one dispatch
        per batch: build the post-duplex states for ``state[pos] = w`` over a
        candidate range and test lane 7 (the first sampled element — output
        pops from the end of the rate). Only the winning index crosses the
        link."""
        pos = len(self.input_buffer)
        base = list(self.state)
        for i, v in enumerate(self.input_buffer):
            base[i] = v
        batch = max(4096, 8 << bits)
        base_fp = fp_from_u64(np.asarray(base, dtype=np.uint64)[:, None])
        start = 0
        while True:
            idx, found = _grind_batch(pos, bits, batch, base_fp, start)
            if bool(found):
                witness = start + int(idx)
                ok = self.check_witness(bits, witness)
                assert ok, "device grind disagrees with host challenger"
                return witness
            start += batch

    def finalize(self) -> list:
        """Binding digest: one unconditional state transition, then the first
        4 state elements (CanFinalizeDigest semantics per
        crates/stark-transcript/src/prover.rs:33-45)."""
        self._duplexing()
        return list(self.state[:4])


class ProverChannel:
    """Records the transcript while driving the challenger (sent vs hint)."""

    def __init__(self, challenger: DuplexChallenger):
        self.challenger = challenger
        self.fields: list[int] = []
        self.commitments: list[tuple] = []

    # --- sends (recorded + observed) ---
    def send_field_slice(self, values) -> None:
        vals = [int(v) % gl.P for v in values]
        self.fields.extend(vals)
        self.challenger.observe_slice(vals)

    def send_field(self, v) -> None:
        self.send_field_slice([v])

    def send_ext(self, v) -> None:
        self.send_field_slice([v[0], v[1]])

    def send_ext_slice(self, values) -> None:
        flat = []
        for v in values:
            flat.extend((v[0], v[1]))
        self.send_field_slice(flat)

    def send_commitment(self, digest) -> None:
        # Observed digests feed the algebraic challenger, so they must be
        # canonical field elements; assert instead of silently reducing
        # (byte-hash digests are raw u64 words and are never *observed* —
        # they travel as hints only).
        digest = tuple(int(v) for v in digest)
        assert len(digest) == 4
        assert all(0 <= v < gl.P for v in digest), "non-canonical digest observed"
        self.commitments.append(digest)
        self.challenger.observe_slice(digest)

    # --- hints (recorded only) ---
    def hint_field_slice(self, values) -> None:
        self.fields.extend(int(v) % gl.P for v in values)

    def hint_commitment(self, digest) -> None:
        # NO mod-p reduction: blake3/keccak LMCS digests are raw u64 words
        # (any word in [p, 2^64) would be corrupted, breaking verify_batch
        # for byte-hash trees ~2^-32 per word).
        self.commitments.append(tuple(int(v) for v in digest))

    # --- challenges ---
    def sample(self) -> int:
        return self.challenger.sample()

    def sample_bits(self, bits: int) -> int:
        return self.challenger.sample_bits(bits)

    def sample_ext(self) -> tuple:
        return self.challenger.sample_ext()

    def grind(self, bits: int) -> int:
        witness = self.challenger.grind(bits)
        self.fields.append(witness)
        return witness

    def finalize(self):
        digest = self.challenger.finalize()
        return digest, TranscriptData(self.fields, self.commitments)


class TranscriptData:
    """Raw proof payload: the field stream + commitment stream."""

    def __init__(self, fields, commitments):
        self.fields = list(fields)
        self.commitments = [tuple(c) for c in commitments]

    def size_in_bytes(self) -> int:
        return 8 * (len(self.fields) + 4 * len(self.commitments))

    def to_arrays(self):
        return (
            np.asarray(self.fields, dtype=np.uint64),
            np.asarray(self.commitments, dtype=np.uint64).reshape(-1, 4),
        )

    @classmethod
    def from_arrays(cls, fields, commitments):
        return cls(
            [int(v) for v in fields],
            [tuple(int(x) for x in c) for c in commitments],
        )


class TranscriptError(ValueError):
    pass


class VerifierChannel:
    """Replays a recorded transcript, enforcing stream discipline."""

    def __init__(self, data: TranscriptData, challenger: DuplexChallenger):
        self.data = data
        self.challenger = challenger
        self._f = 0
        self._c = 0

    def _next_fields(self, n: int) -> list:
        if self._f + n > len(self.data.fields):
            raise TranscriptError("transcript field stream exhausted")
        out = self.data.fields[self._f : self._f + n]
        self._f += n
        for v in out:
            if not (0 <= v < gl.P):
                raise TranscriptError("non-canonical field element in transcript")
        return out

    # --- sent values: read + observe ---
    def read_field_slice(self, n: int) -> list:
        vals = self._next_fields(n)
        self.challenger.observe_slice(vals)
        return vals

    def read_field(self) -> int:
        return self.read_field_slice(1)[0]

    def read_ext(self) -> tuple:
        v = self.read_field_slice(2)
        return (v[0], v[1])

    def read_ext_slice(self, n: int) -> list:
        v = self.read_field_slice(2 * n)
        return [(v[2 * i], v[2 * i + 1]) for i in range(n)]

    def read_commitment(self) -> tuple:
        if self._c >= len(self.data.commitments):
            raise TranscriptError("transcript commitment stream exhausted")
        digest = self.data.commitments[self._c]
        self._c += 1
        self.challenger.observe_slice(digest)
        return digest

    # --- hints: read only ---
    def read_hint_fields(self, n: int) -> list:
        return self._next_fields(n)

    def read_hint_commitment(self) -> tuple:
        if self._c >= len(self.data.commitments):
            raise TranscriptError("transcript commitment stream exhausted")
        digest = self.data.commitments[self._c]
        self._c += 1
        return digest

    # --- challenges ---
    def sample(self) -> int:
        return self.challenger.sample()

    def sample_bits(self, bits: int) -> int:
        return self.challenger.sample_bits(bits)

    def sample_ext(self) -> tuple:
        return self.challenger.sample_ext()

    def check_pow(self, bits: int) -> None:
        witness = self._next_fields(1)[0]
        if not self.challenger.check_witness(bits, witness):
            raise TranscriptError(f"proof-of-work check failed ({bits} bits)")

    def finalize(self):
        if self._f != len(self.data.fields) or self._c != len(self.data.commitments):
            raise TranscriptError("trailing data in transcript")
        return self.challenger.finalize()
