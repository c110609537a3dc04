"""Committed ACE circuit registry + relation-digest FS binding.

Mirrors the reference's registry snapshot test (air/src/config.rs:383-454
— the RELATION_DIGEST snapshot fails whenever any constraint changes) and
the FS-binding property: proofs are bound to the committed relation.
"""

import dataclasses

import pytest

from miden_tpu.vm.ace_registry import (
    _merkle_root,
    circuit_commitment,
    registry_path,
    registry_root,
    relation_seed,
    vm_registry,
)

# Pinned: changing ANY VM constraint (or the circuit encoding) moves
# these. Regenerate deliberately when the constraint system changes —
# existing proofs stop verifying, which is the point.
PINNED_ROOT = (
    5216835266848523123,
    15651513818510892642,
    5705813749221664127,
    9236215505984732082,
)
PINNED_SEED = (
    9814776147513383986,
    732077666974610715,
    13001758689279085520,
    6799555718454890707,
)


def test_registry_root_snapshot():
    assert registry_root() == PINNED_ROOT
    assert relation_seed() == PINNED_SEED


def test_tampered_circuit_moves_the_root():
    _root, leaves, circuits = vm_registry()
    tampered = dataclasses.replace(
        circuits[0],
        instr_words=(circuits[0].instr_words[0] ^ 1,)
        + circuits[0].instr_words[1:],
    )
    bad_leaf = circuit_commitment(tampered)
    assert bad_leaf != leaves[0]
    bad_root = _merkle_root([bad_leaf, *leaves[1:]])
    assert bad_root != PINNED_ROOT


def test_registry_paths_authenticate():
    from miden_tpu.hash import poseidon2_host

    root, leaves, _ = vm_registry()
    for i, leaf in enumerate(leaves):
        node = list(leaf)
        idx = i
        for sib in registry_path(i):
            if idx & 1:
                node = poseidon2_host.compress(list(sib), node)
            else:
                node = poseidon2_host.compress(node, list(sib))
            idx >>= 1
        assert tuple(node) == root


@pytest.mark.slow
def test_relation_seed_binds_proofs():
    """A proof produced under a different (tampered) relation seed must
    not verify — the FS binding at work."""
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.stark.prover import prove
    from miden_tpu.stark.verifier import VerificationError
    from miden_tpu.transcript.challenger import DuplexChallenger
    from miden_tpu.vm.assembler import assemble
    from miden_tpu.vm.prove import (
        VmProof,
        _statement,
        prove_program,
        protocol_seed,
        verify_program,
    )
    from miden_tpu.vm.trace import execute_and_trace

    prog = assemble("begin push.3 push.4 add swap drop end")
    _out, proof = prove_program(prog, params=TEST_PARAMS)
    verify_program(proof, params=TEST_PARAMS, partial=True)

    # re-prove the same execution under a seed for a DIFFERENT relation
    out, trace = execute_and_trace(prog)
    st = _statement(
        trace.program_hash, trace.stack_inputs, trace.stack_outputs,
        trace.kernel_digests, trace.deferred_root,
    )
    bad_seed = list(protocol_seed())
    bad_seed[0] ^= 1
    res = prove(
        TEST_PARAMS, st,
        [trace.matrix, trace.chiplets, trace.poseidon],
        DuplexChallenger(bad_seed),
    )
    forged = VmProof(
        proof.program_hash, proof.stack_inputs, proof.stack_outputs,
        proof.kernel_digests, res.proof,
        deferred_root=proof.deferred_root,
        deferred_wire=proof.deferred_wire,
    )
    with pytest.raises((VerificationError, ValueError)):
        verify_program(forged, params=TEST_PARAMS, partial=True)
