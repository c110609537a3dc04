"""Seeded mutation fuzzing of the untrusted-input decoders.

The three byte-level attack surfaces — MAST wire form (vm/mast_io.py),
proof transcripts (stark/proof_io.py + vm/prove.py VmProof), and the
deferred-DAG wire (vm/deferred.py) — must never raise anything but
their declared format errors, loop, or over-allocate on corrupt input.
Mirrors the reference's decoder-hardening strategy (budgeted readers,
tests/wycheproof-style adversarial inputs) with deterministic seeded
mutations: truncations, bit flips, byte splices, and length-field
inflation on valid baselines.
"""

import random

import pytest

from miden_tpu.field import gl
from miden_tpu.vm import deferred as D

N_MUTATIONS = 300


def _mutations(rng, blob: bytes):
    yield blob  # unmutated baseline must round-trip
    yield b""
    yield blob[: len(blob) // 2]
    for _ in range(N_MUTATIONS):
        kind = rng.randrange(4)
        b = bytearray(blob)
        if kind == 0 and len(b) > 1:  # truncate
            del b[rng.randrange(1, len(b)) :]
        elif kind == 1:  # bit flip
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        elif kind == 2:  # splice a random run
            at = rng.randrange(len(b))
            run = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
            b[at : at + len(run)] = run
        else:  # inflate a 4-byte LE length field
            at = rng.randrange(max(1, len(b) - 4))
            b[at : at + 4] = (0xFFFF_FFFF).to_bytes(4, "little")
        yield bytes(b)


def test_deferred_wire_decoder_survives_mutations():
    st = D.DeferredState(D.default_registry())
    nodes = [D.u256_value_node(x) for x in (7, 9, 16)]
    for n in nodes:
        st.register(n)
    sd = st.register(
        D.binop_statement_node(
            D.PID_U256_ADD, *(n.digest() for n in nodes)
        )
    )
    st.log_statement(sd)
    blob = st.to_wire().to_bytes()

    rng = random.Random(0xDEF)
    accepted = 0
    for mut in _mutations(rng, blob):
        try:
            wire = D.DeferredStateWire.from_bytes(mut)
            D.DeferredState.from_wire(D.default_registry(), wire)
            accepted += 1
            assert mut == blob or wire == D.DeferredStateWire.from_bytes(blob)
        except D.IntegrityError:
            pass  # the only acceptable failure mode
    assert accepted >= 1  # the unmutated baseline round-trips


def test_mast_wire_decoder_survives_mutations():
    from miden_tpu.vm.assembler import assemble
    from miden_tpu.vm.mast_io import MastFormatError, program_to_bytes, program_from_bytes

    prog = assemble(
        "begin push.1 push.2 repeat.5 dup.1 add end swap drop end"
    )
    blob = program_to_bytes(prog)
    rng = random.Random(0xAAB)
    ok = 0
    for mut in _mutations(rng, blob):
        try:
            program_from_bytes(mut)
            ok += 1
        except MastFormatError:
            pass
    assert ok >= 1


def test_vm_proof_decoder_survives_mutations():
    """Corrupt proof bytes must fail parsing or verification — never
    crash with a foreign exception type."""
    import dataclasses

    from miden_tpu.stark.proof_io import ProofFormatError
    from miden_tpu.vm.prove import VmProof

    # a structurally valid proof container with a tiny synthetic STARK
    # transcript is enough to exercise the VmProof layer; deep STARK
    # transcript fuzz lives with proof_io's own budget tests
    base = None
    try:
        from miden_tpu.stark.proof_io import proof_from_bytes  # noqa: F401
    except ImportError:
        pytest.skip("proof_io unavailable")
    # build from a real (fast) proof if available in the module cache;
    # otherwise fuzz the header path only
    header = (
        VmProof.MAGIC
        + (VmProof.VERSION).to_bytes(4, "little")
        + b"\x00" * (8 * 40)
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    rng = random.Random(0xCAFE)
    for mut in _mutations(rng, header + b"\x00" * 64):
        try:
            VmProof.from_bytes(mut)
        except ProofFormatError:
            pass  # the only acceptable failure mode


@pytest.mark.slow
def test_vm_proof_decoder_survives_real_proof_mutations():
    """Mutate a REAL serialized proof (TEST_PARAMS, with a deferred wire)
    so the transcript boundary and the deferred_wire length field get
    mutation coverage — the synthetic all-zero header above never
    exercises n_wire > 0 against truncated transcript bytes."""
    from miden_tpu.stark.proof_io import ProofFormatError
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.prove import VmProof, prove_program

    src = (
        "use miden::core::crypto::hashes::keccak256\n"
        "begin exec.keccak256::merge dropw dropw end"
    )
    prog = assemble_with_stdlib(src)
    _out, proof = prove_program(
        prog,
        stack_inputs=[3, 0, 0, 0, 0, 0, 0, 0, 5, 0, 0, 0, 0, 0, 0, 0],
        params=TEST_PARAMS,
        event_handlers=stdlib_event_handlers(),
    )
    blob = proof.to_bytes()
    assert proof.deferred_wire, "fixture must carry a deferred wire"

    roundtrip = VmProof.from_bytes(blob)
    assert roundtrip.to_bytes() == blob

    rng = random.Random(0xFEED)
    ok = 0
    for mut in _mutations(rng, blob):
        try:
            VmProof.from_bytes(mut)
            ok += 1
        except ProofFormatError:
            pass  # the only acceptable failure mode
    assert ok >= 1  # the unmutated baseline round-trips
