"""Device-resident Fiat-Shamir challenger + recording channel.

The host :class:`~miden_tpu.transcript.challenger.DuplexChallenger` is exact
but forces a host↔device round-trip at every commitment/sample — fatal when
the TPU sits behind a high-latency link (each blocking readback costs a full
RTT; the round-1 profile showed the prover spending ~75% of wall-clock in
these syncs). This module keeps the whole Fiat-Shamir state machine **on
device**: the sponge state is an ``Fp`` array of 12 scalars, every observe /
duplex / sample / grind is a (tiny, async) device op, and the entire proof
pipeline becomes one dependency graph that is read back **once** at the end.

All control flow is static: the duplex schedule depends only on the counts
of observed/sampled elements, which are fixed by the statement shape — so
the same class works on concrete arrays or under ``jax.jit`` tracing.

Semantics are bit-identical to the host challenger (p3 ``DuplexChallenger
<Felt, Poseidon2, 12, 8>``, reference air/src/config.rs:223-275): observe
buffers into the rate, duplexing overwrites ``state[0..len(buffer)]`` and
refills the output buffer from ``state[0..8]``; sample pops from the end;
any observe invalidates buffered output. The equivalence is pinned by
``tests/test_device_challenger.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gl
from ..field.goldilocks import (
    Fp,
    Fp2,
    fp_concat,
    fp_from_u64,
    fp_to_u64,
)
from ..hash import poseidon2

RATE = 8
WIDTH = 12


@jax.jit
def _permute1(state: Fp) -> Fp:
    """Permute a single (12,) state."""
    out = poseidon2.permute(Fp(state.lo[:, None], state.hi[:, None]))
    return Fp(out.lo[:, 0], out.hi[:, 0])


@jax.jit
def _duplex_chain(state: Fp, chunks: Fp) -> Fp:
    """Fold ``chunks`` (k, 8) of rate-aligned inputs into the sponge: one
    scanned permutation body, one dispatch for any k."""

    def body(s: Fp, chunk: Fp):
        s2 = fp_concat([chunk, s[RATE:]], axis=0)
        out = poseidon2.permute(Fp(s2.lo[:, None], s2.hi[:, None]))
        return Fp(out.lo[:, 0], out.hi[:, 0]), None

    out, _ = jax.lax.scan(body, state, chunks)
    return out


def _as_fp_scalar(v) -> Fp:
    if isinstance(v, Fp):
        return v
    return fp_from_u64(np.uint64(int(v) % gl.P))


class DeviceChallenger:
    """Duplex challenger over device scalars (static control flow)."""

    def __init__(self, state: Fp, ibuf: Fp | None = None):
        assert state.shape == (WIDTH,)
        self.state = state
        # input buffer: Fp (k,) with 0 <= k < RATE
        self.ibuf = ibuf if ibuf is not None else fp_from_u64(np.zeros(0, np.uint64))
        # output buffer: Fp (8,) = state[:8] after last duplex; obuf_n
        # elements remain (pop from the end)
        self.obuf = None
        self.obuf_n = 0

    @classmethod
    def from_host(cls, host) -> "DeviceChallenger":
        c = cls(fp_from_u64(np.asarray(host.state, dtype=np.uint64)))
        if host.input_buffer:
            c.ibuf = fp_from_u64(np.asarray(host.input_buffer, dtype=np.uint64))
        if host.output_buffer:
            c.obuf = c.state[:RATE]
            c.obuf_n = len(host.output_buffer)
        return c

    # -- core sponge ---------------------------------------------------------
    def _duplex_partial(self) -> None:
        """Duplex with the (possibly partial) input buffer."""
        k = self.ibuf.shape[0]
        assert k <= RATE
        s = fp_concat([self.ibuf, self.state[k:]], axis=0) if k else self.state
        self.state = _permute1(s)
        self.ibuf = self.ibuf[:0]
        self.obuf = self.state[:RATE]
        self.obuf_n = RATE

    def observe_arr(self, arr: Fp) -> None:
        """Observe a flat Fp array (any length) — rate-aligned prefix folds
        in one scanned dispatch."""
        assert arr.ndim == 1
        if arr.shape[0] == 0:
            # Observing zero elements is a no-op: the host challenger's
            # observe_slice([]) does NOT invalidate its output buffer, so
            # neither may we (empty aux-value sends occur for aux-less AIRs).
            return
        self.obuf_n = 0
        total = fp_concat([self.ibuf, arr], axis=0) if self.ibuf.shape[0] else arr
        n = total.shape[0]
        full = n // RATE
        if full:
            chunks = total[: full * RATE].reshape(full, RATE)
            self.state = _duplex_chain(self.state, chunks)
        self.ibuf = total[full * RATE :]
        if full and self.ibuf.shape[0] == 0:
            self.obuf = self.state[:RATE]
            self.obuf_n = RATE

    def observe(self, v) -> None:
        self.observe_arr(_as_fp_scalar(v).reshape(1))

    def observe_slice(self, values) -> None:
        if isinstance(values, Fp):
            self.observe_arr(values)
            return
        vals = [int(v) % gl.P for v in values]
        if vals:
            self.observe_arr(fp_from_u64(np.asarray(vals, dtype=np.uint64)))

    def sample(self) -> Fp:
        if self.ibuf.shape[0] or self.obuf_n == 0:
            self._duplex_partial()
        self.obuf_n -= 1
        return self.obuf[self.obuf_n]

    def sample_ext(self) -> Fp2:
        c0 = self.sample()
        c1 = self.sample()
        return Fp2(c0, c1)

    # -- proof of work -------------------------------------------------------
    def grind(self, bits: int):
        """Find (on device, single batch) a witness w < 2^32 such that
        observing w then sampling gives ``bits`` low zero bits. Returns
        (witness Fp (), ok bool ()) — ok is asserted host-side at the final
        readback (failure probability ≤ e^-32 at the chosen batch sizes)."""
        from .challenger import _grind_batch

        k = self.ibuf.shape[0]
        base = fp_concat(
            [self.ibuf, self.state[k:]], axis=0
        ) if k else self.state
        batch = min(1 << 21, max(4096, 32 << bits))
        idx, ok = _grind_batch(
            k, bits, batch, Fp(base.lo[:, None], base.hi[:, None]), 0
        )
        witness = Fp(idx.astype(jnp.uint32), jnp.zeros((), jnp.uint32))
        self.observe(witness)
        self.sample()  # pop the checked lane (value == 0 mod 2^bits)
        return witness, ok

    def finalize(self) -> Fp:
        """Binding digest: one unconditional transition, first 4 lanes."""
        self._duplex_partial()
        return self.state[:4]


def _flatten_ext(arr: Fp2) -> Fp:
    """Fp2 (k,) → interleaved base Fp (2k,): [c0_0, c1_0, c0_1, ...]."""
    k = arr.shape[0]
    lo = jnp.stack([arr.c0.lo, arr.c1.lo], axis=1).reshape(2 * k)
    hi = jnp.stack([arr.c0.hi, arr.c1.hi], axis=1).reshape(2 * k)
    return Fp(lo, hi)


class DeviceProverChannel:
    """Transcript recorder over device values.

    Mirrors :class:`~miden_tpu.transcript.challenger.ProverChannel` but
    every recorded value is a device array; ``materialize()`` performs the
    single blocking readback and yields host-side
    :class:`~miden_tpu.transcript.challenger.TranscriptData`.
    """

    def __init__(self, challenger: DeviceChallenger):
        self.challenger = challenger
        self._entries: list = []  # ("f"|"c", Fp flat array)
        self._checks: list = []  # (label, device bool ()) asserted at readback
        # populated by materialize(); post-materialize hints append here
        self._host_fields: list | None = None
        self._host_commitments: list | None = None
        self._digest: list | None = None

    # --- sends (recorded + observed) ---
    def send_field_slice(self, values) -> None:
        arr = values if isinstance(values, Fp) else fp_from_u64(
            np.asarray([int(v) % gl.P for v in values], dtype=np.uint64)
        )
        self._entries.append(("f", arr))
        self.challenger.observe_arr(arr)

    def send_field(self, v) -> None:
        self.send_field_slice(_as_fp_scalar(v).reshape(1))

    def send_ext(self, v: Fp2) -> None:
        self.send_field_slice(_flatten_ext(Fp2(v.c0.reshape(1), v.c1.reshape(1))))

    def send_ext_slice(self, values) -> None:
        if isinstance(values, Fp2):
            self.send_field_slice(_flatten_ext(values))
            return
        flat = []
        for v in values:
            flat.extend((int(v[0]), int(v[1])))
        self.send_field_slice(flat)

    def send_commitment(self, digest: Fp) -> None:
        assert digest.shape == (4,)
        self._entries.append(("c", digest))
        self.challenger.observe_arr(digest)

    # --- hints (recorded only; host values after materialize()) ---
    def hint_field_slice(self, values) -> None:
        if self._host_fields is not None:
            self._host_fields.extend(int(v) % gl.P for v in values)
            return
        arr = values if isinstance(values, Fp) else fp_from_u64(
            np.asarray([int(v) % gl.P for v in values], dtype=np.uint64)
        )
        self._entries.append(("f", arr))

    def hint_commitment(self, digest) -> None:
        if self._host_commitments is not None:
            # Raw u64 words — byte-hash digests must NOT be reduced mod p
            # (see ProverChannel.hint_commitment).
            self._host_commitments.append(tuple(int(v) for v in digest))
            return
        if not isinstance(digest, Fp):
            digest = fp_from_u64(np.asarray(digest, dtype=np.uint64))
        self._entries.append(("c", digest))

    # --- challenges ---
    def sample(self) -> Fp:
        return self.challenger.sample()

    def sample_ext(self) -> Fp2:
        return self.challenger.sample_ext()

    def grind(self, bits: int) -> None:
        witness, ok = self.challenger.grind(bits)
        self._entries.append(("f", witness.reshape(1)))
        self._checks.append((f"grind({bits})", ok))

    def check(self, label: str, flag) -> None:
        """Register a device-side boolean to assert at readback (external
        assertions, OOD-point domain checks, ...)."""
        self._checks.append((label, flag))

    # --- the single readback ---
    def materialize(self, extra: Fp | None = None):
        """Read everything back in ONE transfer; subsequent hints append to
        the host-side streams. Returns extra as numpy u64 (or None). Raises
        if any registered device-side check failed."""
        digest = self.challenger.finalize()
        parts = [arr for (_k, arr) in self._entries]
        parts.append(digest)
        if extra is not None:
            parts.append(extra)
        flags = [jnp.asarray(f, jnp.uint32).reshape(1) for (_l, f) in self._checks]
        flag_arr = (
            Fp(jnp.concatenate(flags), jnp.zeros(len(flags), jnp.uint32))
            if flags
            else None
        )
        if flag_arr is not None:
            parts.append(flag_arr)
        big = fp_concat([p.reshape(-1) for p in parts], axis=0)
        host = fp_to_u64(big)  # THE blocking readback

        off = 0
        fields: list[int] = []
        commitments: list[tuple] = []
        for kind, arr in self._entries:
            n = int(np.prod(arr.shape))
            vals = host[off : off + n]
            off += n
            if kind == "f":
                fields.extend(int(v) for v in vals)
            else:
                commitments.append(tuple(int(v) for v in vals))
        digest_vals = [int(v) for v in host[off : off + 4]]
        off += 4
        extra_vals = None
        if extra is not None:
            n = int(np.prod(extra.shape))
            extra_vals = host[off : off + n]
            off += n
        if flag_arr is not None:
            fvals = host[off : off + len(self._checks)]
            for (label, _), v in zip(self._checks, fvals):
                if not int(v):
                    raise AssertionError(f"device-side check failed: {label}")
        self._host_fields = fields
        self._host_commitments = commitments
        self._digest = digest_vals
        return extra_vals

    def finalize(self):
        """Final (digest, TranscriptData) after materialize() + hint tail."""
        from .challenger import TranscriptData

        assert self._host_fields is not None, "materialize() first"
        return self._digest, TranscriptData(
            self._host_fields, self._host_commitments
        )
