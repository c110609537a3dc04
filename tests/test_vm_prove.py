"""End-to-end VM proving: execute a MASM program, prove it through the
STARK pipeline, verify, and reject tampered claims.

Mirrors miden-vm/tests/integration/prove_verify.rs at the facade level
(prover/src/lib.rs:117 prove_sync → verifier/src/lib.rs:99 verify).
"""

import dataclasses

import pytest

from miden_tpu.stark.verifier import VerificationError
from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.prove import prove_program, verify_program

# On the CPU test mesh the prover automatically uses the bytecode
# constraint evaluator (stark/interp.py) — the fused XLA graph is only
# compiled on real TPU.


@pytest.fixture(scope="module")
def proven():
    prog = assemble(
        "begin push.0 push.1 repeat.10 swap dup.1 add end swap drop swap drop end"
    )
    out, proof = prove_program(prog)
    return out, proof


def test_prove_and_verify_roundtrip(proven):
    out, proof = proven
    assert out.stack[0] == 89  # fib(11)
    assert proof.stack_outputs[0] == 89
    verify_program(proof)


def test_tampered_output_rejected(proven):
    _, proof = proven
    bad = dataclasses.replace(
        proof, stack_outputs=[123] + list(proof.stack_outputs[1:])
    )
    with pytest.raises(VerificationError):
        verify_program(bad)


def test_tampered_program_hash_rejected(proven):
    _, proof = proven
    ph = list(proof.program_hash)
    ph[0] ^= 1
    bad = dataclasses.replace(proof, program_hash=tuple(ph))
    with pytest.raises(VerificationError):
        verify_program(bad)


def test_tampered_inputs_rejected(proven):
    _, proof = proven
    bad = dataclasses.replace(
        proof, stack_inputs=[7] + list(proof.stack_inputs[1:])
    )
    with pytest.raises(VerificationError):
        verify_program(bad)
