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


def test_proof_serialization_roundtrip(proven):
    _, proof = proven
    from miden_tpu.vm.prove import VmProof

    blob = proof.to_bytes()
    back = VmProof.from_bytes(blob)
    assert back.program_hash == proof.program_hash
    assert back.stack_outputs == proof.stack_outputs
    assert back.kernel_digests == proof.kernel_digests
    verify_program(back)
    # bit-flip anywhere in the claim or transcript must fail parse or verify
    import pytest as _p

    from miden_tpu.stark.proof_io import ProofFormatError

    corrupt = bytearray(blob)
    corrupt[10] ^= 1
    with _p.raises((ProofFormatError, VerificationError)):
        verify_program(VmProof.from_bytes(bytes(corrupt)))


def test_cli_compile_and_run(tmp_path):
    import os
    import subprocess
    import sys

    src = tmp_path / "p.masm"
    src.write_text("begin push.2 push.3 mul swap drop end")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "miden_tpu", "compile", str(src)],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0 and "program hash:" in out.stdout
    out = subprocess.run(
        [sys.executable, "-m", "miden_tpu", "run", str(src)],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0
    assert out.stdout.splitlines()[-1].startswith("output stack: [6,")
