"""Device challenger ≡ host challenger (bit-exact).

Pins :class:`miden_tpu.transcript.device_challenger.DeviceChallenger` against
the exact-integer host :class:`~miden_tpu.transcript.challenger.DuplexChallenger`
on mixed observe/sample schedules, grind, and channel recording — the claim
made in device_challenger.py's module docstring.
"""

import numpy as np

from miden_tpu.field import gl
from miden_tpu.field.goldilocks import Fp, fp_from_u64, fp_to_u64
from miden_tpu.transcript.challenger import DuplexChallenger, ProverChannel
from miden_tpu.transcript.device_challenger import (
    DeviceChallenger,
    DeviceProverChannel,
)


def _dev_scalar_to_int(s: Fp) -> int:
    return int(fp_to_u64(Fp(s.lo.reshape(1), s.hi.reshape(1)))[0])


def test_observe_sample_schedule_matches_host():
    rng = np.random.default_rng(7)
    host = DuplexChallenger([1, 2, 3, 4])
    dev = DeviceChallenger.from_host(host)

    # interleave observes of varying lengths with samples
    for step, (n_obs, n_smp) in enumerate(
        [(1, 1), (3, 2), (8, 1), (0, 3), (13, 5), (7, 0), (2, 9)]
    ):
        vals = [int(v) for v in rng.integers(0, gl.P, size=n_obs, dtype=np.uint64)]
        host.observe_slice(vals)
        if vals:
            dev.observe_arr(fp_from_u64(np.asarray(vals, dtype=np.uint64)))
        for _ in range(n_smp):
            h = host.sample()
            d = _dev_scalar_to_int(dev.sample())
            assert h == d, f"sample mismatch at step {step}"

    # final sponge states agree exactly
    assert [int(v) for v in fp_to_u64(dev.state)] == host.state


def test_from_host_mid_stream():
    """from_host must pick up a partially-filled input/output buffer."""
    host = DuplexChallenger()
    host.observe_slice([5, 6, 7])  # partial input buffer
    dev = DeviceChallenger.from_host(host)
    assert host.sample() == _dev_scalar_to_int(dev.sample())

    host2 = DuplexChallenger()
    host2.observe_slice(list(range(8)))
    host2.sample()  # leaves output buffer partially consumed
    dev2 = DeviceChallenger.from_host(host2)
    for _ in range(3):
        assert host2.sample() == _dev_scalar_to_int(dev2.sample())


def test_grind_matches_host_witness_semantics():
    host = DuplexChallenger([9, 9, 9, 9])
    host.observe_slice([11, 22, 33])
    dev = DeviceChallenger.from_host(host.clone())

    witness, ok = dev.grind(4)
    w = _dev_scalar_to_int(witness)
    assert bool(np.asarray(ok))
    # host accepts the device-found witness and the states re-align
    assert host.check_witness(4, w)
    assert host.sample() == _dev_scalar_to_int(dev.sample())


def test_channel_transcript_matches_host_channel():
    """Same sends through both channels → identical TranscriptData + digest."""
    seed = [4, 3, 2, 1]
    hch = ProverChannel(DuplexChallenger(seed))
    dch = DeviceProverChannel(DeviceChallenger.from_host(DuplexChallenger(seed)))

    hch.send_field_slice([10, 20, 30])
    dch.send_field_slice([10, 20, 30])
    digest = [111, 222, 333, 444]
    hch.send_commitment(digest)
    dch.send_commitment(fp_from_u64(np.asarray(digest, dtype=np.uint64)))
    assert hch.sample_ext() == tuple(
        _dev_scalar_to_int(c) for c in (lambda e: (e.c0, e.c1))(dch.sample_ext())
    )
    hch.hint_field_slice([7, 8])
    dch.hint_field_slice([7, 8])

    dch.materialize()
    hdig, hdata = hch.finalize()
    ddig, ddata = dch.finalize()
    assert hdig == ddig
    assert hdata.fields == ddata.fields
    assert hdata.commitments == ddata.commitments


def test_hint_commitment_not_reduced_mod_p():
    """Raw u64 digest words ≥ p (byte-hash trees) survive the hint stream
    unreduced, both pre- and post-materialize (ADVICE round-2 finding)."""
    big = gl.P + 12345  # a valid blake3 digest word, NOT a field element
    for post in (False, True):
        dch = DeviceProverChannel(DeviceChallenger.from_host(DuplexChallenger()))
        dch.send_field(1)  # something to materialize
        if post:
            dch.materialize()
            dch.hint_commitment((big, 1, 2, 3))
        else:
            dch.hint_commitment(np.asarray([big, 1, 2, 3], dtype=np.uint64))
            dch.materialize()
        _, data = dch.finalize()
        assert data.commitments[-1][0] == big

    hch = ProverChannel(DuplexChallenger())
    hch.hint_commitment((big, 1, 2, 3))
    _, data = hch.finalize()
    assert data.commitments[-1][0] == big
