"""End-to-end VM proving: execute a MASM program, prove it through the
STARK pipeline, verify, and reject tampered claims.

Mirrors miden-vm/tests/integration/prove_verify.rs at the facade level
(prover/src/lib.rs:117 prove_sync → verifier/src/lib.rs:99 verify).
"""

import dataclasses

import pytest

from miden_tpu.stark.verifier import VerificationError
from miden_tpu.vm.assembler import assemble
from miden_tpu.stark.params import TEST_PARAMS
from miden_tpu.vm.prove import prove_program, verify_program

# On the CPU test mesh the prover automatically uses the bytecode
# constraint evaluator (stark/interp.py) — the fused XLA graph is only
# compiled on real TPU.


@pytest.fixture(scope="module")
def proven():
    # TEST_PARAMS keeps the module fixture inside the fast-gate budget
    # (the MIDEN_PARAMS profile costs ~2.5 min of CPU compile); the
    # production profile is exercised by the slow e2e tests and bench.py
    prog = assemble(
        "begin push.0 push.1 repeat.10 swap dup.1 add end swap drop swap drop end"
    )
    out, proof = prove_program(prog, params=TEST_PARAMS)
    return out, proof


def test_prove_and_verify_roundtrip(proven):
    out, proof = proven
    assert out.stack[0] == 89  # fib(11)
    assert proof.stack_outputs[0] == 89
    verify_program(proof, params=TEST_PARAMS)


def test_tampered_output_rejected(proven):
    _, proof = proven
    bad = dataclasses.replace(
        proof, stack_outputs=[123] + list(proof.stack_outputs[1:])
    )
    with pytest.raises(VerificationError):
        verify_program(bad, params=TEST_PARAMS)


def test_tampered_program_hash_rejected(proven):
    _, proof = proven
    ph = list(proof.program_hash)
    ph[0] ^= 1
    bad = dataclasses.replace(proof, program_hash=tuple(ph))
    with pytest.raises(VerificationError):
        verify_program(bad, params=TEST_PARAMS)


def test_tampered_inputs_rejected(proven):
    _, proof = proven
    bad = dataclasses.replace(
        proof, stack_inputs=[7] + list(proof.stack_inputs[1:])
    )
    with pytest.raises(VerificationError):
        verify_program(bad, params=TEST_PARAMS)


def test_proof_serialization_roundtrip(proven):
    _, proof = proven
    from miden_tpu.vm.prove import VmProof

    blob = proof.to_bytes()
    back = VmProof.from_bytes(blob)
    assert back.program_hash == proof.program_hash
    assert back.stack_outputs == proof.stack_outputs
    assert back.kernel_digests == proof.kernel_digests
    verify_program(back, params=TEST_PARAMS)
    # bit-flip anywhere in the claim or transcript must fail parse or verify
    import pytest as _p

    from miden_tpu.stark.proof_io import ProofFormatError

    corrupt = bytearray(blob)
    corrupt[10] ^= 1
    with _p.raises((ProofFormatError, VerificationError)):
        verify_program(VmProof.from_bytes(bytes(corrupt)), params=TEST_PARAMS)


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


@pytest.mark.slow
def test_prove_mtree_get():
    # MPVERIFY end-to-end: mtree_get opens leaf 5 of an 8-leaf tree and
    # proves the Merkle path through the hasher chiplet
    # (tests/integration/operations/crypto_ops.rs mtree_get parity)
    from miden_tpu.merkle import MerkleStore, MerkleTree
    from miden_tpu.vm.processor import AdviceProvider

    leaves = [(3 * i + 1, 0, i, 0) for i in range(8)]
    tree = MerkleTree(leaves)
    store = MerkleStore()
    store.extend(tree.inner_nodes())
    root = ".".join(str(x) for x in reversed(tree.root))
    prog = assemble(
        f"begin push.{root} push.5 push.3 mtree_get "
        "movupw.2 dropw movupw.2 dropw end"
    )
    out, proof = prove_program(prog, advice=AdviceProvider(store=store))
    assert out.stack[:4] == list(leaves[5])
    assert out.stack[4:8] == list(tree.root)
    verify_program(proof)


@pytest.mark.slow
def test_prove_mtree_set():
    # MRUPDATE end-to-end: both Merkle legs prove through the hasher
    # chiplet with sibling-table reuse enforcement
    from miden_tpu.merkle import MerkleStore, MerkleTree
    from miden_tpu.vm.processor import AdviceProvider

    leaves = [(7 * i + 2, i, 0, 1) for i in range(8)]
    tree = MerkleTree(leaves)
    store = MerkleStore()
    store.extend(tree.inner_nodes())
    new_leaves = list(leaves)
    new_leaves[6] = (99, 98, 97, 96)
    expect_root = MerkleTree(new_leaves).root
    root = ".".join(str(x) for x in reversed(tree.root))
    newv = ".".join(str(x) for x in reversed(new_leaves[6]))
    # mtree_set: [d, i, R_old, V_new, ...] → [R_new, V_old, ...]
    prog = assemble(
        f"begin push.{newv} push.{root} push.6 push.3 mtree_set "
        "movupw.2 dropw movupw.2 dropw end"
    )
    out, proof = prove_program(prog, advice=AdviceProvider(store=store))
    assert out.stack[:4] == list(leaves[6])
    assert out.stack[4:8] == list(expect_root)
    verify_program(proof)


@pytest.mark.slow
def test_prove_horner_eval():
    # HORNERBASE + HORNEREXT: α word written to memory, 8 base + 4 ext
    # Horner steps, accumulator checked against host extension arithmetic
    from miden_tpu.field import gl
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op

    alpha = (123456789, 987654321)
    coef = [3, 1, 4, 1, 5, 9, 2, 6]
    acc0 = (11, 22)

    def step(acc, c):
        return gl.ext_add(gl.ext_mul(acc, alpha), c)

    acc = acc0
    for c in coef:  # HORNERBASE: base coefficients, c0 = highest degree
        acc = step(acc, (c, 0))
    for j in range(4):  # HORNEREXT: ext coefficients (s2j, s2j+1)
        acc = step(acc, (coef[2 * j], coef[2 * j + 1]))

    ops = [
        Op("PUSH", 77), Op("PUSH", 55),  # k1, k0 (unused word tail)
        Op("PUSH", alpha[1]), Op("PUSH", alpha[0]),
        Op("PUSH", 100), Op("MSTOREW"),
        Op("DROP"), Op("DROP"), Op("DROP"), Op("DROP"),
        Op("HORNERBASE"), Op("HORNEREXT"),
    ]
    forest = MastForest()
    root = forest.add_block(ops)
    forest.make_root(root)
    prog = Program(forest, root)
    stack_inputs = [*coef, 0, 0, 0, 0, 0, 100, *acc0]
    out, proof = prove_program(prog, stack_inputs=stack_inputs)
    assert (out.stack[14], out.stack[15]) == acc
    verify_program(proof)


@pytest.mark.slow
@pytest.mark.parametrize("coset", [0, 1, 2, 3])
def test_prove_fri_ext2fold4(coset):
    # one factor-4 FRI fold per coset, checked against host extension
    # arithmetic (miden-vm/tests/integration/operations/fri_ops.rs parity)
    from miden_tpu.field import gl
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op
    from miden_tpu.vm.processor import FRI_TAU_INV, FRI_TWO_INV

    rng = __import__("random").Random(42 + coset)
    v = [rng.randrange(gl.P) for _ in range(8)]  # [q0, q2, q1, q3] bitrev
    f_pos, poe = rng.randrange(gl.P), rng.randrange(1, gl.P)
    alpha = (rng.randrange(gl.P), rng.randrange(gl.P))
    cptr = 24
    q = [(v[0], v[1]), (v[4], v[5]), (v[2], v[3]), (v[6], v[7])]  # natural
    pe = q[coset]
    stack_inputs = [*v, f_pos, coset, poe, *pe, *alpha, cptr]

    x = poe * pow(FRI_TAU_INV, coset, gl.P) % gl.P
    ev = gl.ext_mul_base(alpha, gl.inv(x))
    es = gl.ext_mul(ev, ev)

    def fold2(a, b, ep):
        return gl.ext_mul_base(
            gl.ext_add(gl.ext_add(a, b), gl.ext_mul(gl.ext_sub(a, b), ep)),
            FRI_TWO_INV,
        )

    folded = fold2(
        fold2(q[0], q[2], ev),
        fold2(q[1], q[3], gl.ext_mul_base(ev, FRI_TAU_INV)),
        es,
    )

    forest = MastForest()
    root = forest.add_block([Op("FRIE2F4")])
    forest.make_root(root)
    out, proof = prove_program(Program(forest, root), stack_inputs=stack_inputs)
    st = out.stack
    assert st[8] == st[9] == st[14] == cptr + 8
    assert st[10] == pow(poe, 4, gl.P)
    assert st[11] == f_pos
    assert (st[12], st[13]) == folded
    verify_program(proof)


@pytest.mark.slow
def test_prove_crypto_stream():
    # CRYPTOSTREAM: plaintext at mem[40..48] + rate on the stack →
    # ciphertext at mem[56..64] and s[0:8]; pointers advance by 8
    from miden_tpu.field import gl
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op

    rate = [10, 20, 30, 40, 50, 60, 70, 80]
    p1, p2 = [5, 6, 7, 8], [9, 10, 11, 12]
    ops = []
    for addr, word in ((40, p1), (44, p2)):
        ops += [Op("PUSH", v) for v in reversed(word)]
        ops += [Op("PUSH", addr), Op("MSTOREW")]
        ops += [Op("DROP")] * 4
    ops.append(Op("CRYPTOSTREAM"))
    forest = MastForest()
    root = forest.add_block(ops)
    forest.make_root(root)
    stack_inputs = [*rate, 0, 0, 0, 0, 40, 56, 0, 0]
    out, proof = prove_program(Program(forest, root), stack_inputs=stack_inputs)
    expect = [(p + r) % gl.P for p, r in zip(p1 + p2, rate)]
    assert out.stack[:8] == expect
    assert out.stack[12] == 48 and out.stack[13] == 64
    verify_program(proof)


@pytest.mark.slow
def test_prove_eval_circuit():
    # EVALCIRCUIT: a 6-node circuit ((a-b) squared thrice, a = b) proven
    # through the ACE chiplet with wire-bus + memory binding
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op

    a = b = (3, 5)
    # ids descend: a=5, b=4, gates output 3, 2, 1, 0
    instrs = [
        5 + (4 << 30) + (0 << 60),  # id3 = a - b = 0
        3 + (3 << 30) + (1 << 60),  # id2 = id3 * id3
        2 + (2 << 30) + (1 << 60),  # id1 = id2 * id2
        1 + (1 << 30) + (1 << 60),  # id0 = id1 * id1 (= 0)
    ]
    ops = []
    for addr, word in ((200, [*a, *b]), (204, instrs)):
        ops += [Op("PUSH", v) for v in reversed(word)]
        ops += [Op("PUSH", addr), Op("MSTOREW")]
        ops += [Op("DROP")] * 4
    ops.append(Op("EVALCIRCUIT"))
    forest = MastForest()
    root = forest.add_block(ops)
    forest.make_root(root)
    stack_inputs = [200, 2, 4] + [0] * 13
    out, proof = prove_program(Program(forest, root), stack_inputs=stack_inputs)
    assert out.stack[:3] == [200, 2, 4]
    verify_program(proof)


@pytest.mark.slow
def test_eval_circuit_nonzero_rejected():
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op
    from miden_tpu.vm.processor import ExecutionError, execute

    instrs = [
        5 + (4 << 30) + (0 << 60),
        3 + (3 << 30) + (1 << 60),
        2 + (2 << 30) + (1 << 60),
        1 + (1 << 30) + (1 << 60),
    ]
    ops = []
    for addr, word in ((200, [3, 5, 3, 6]), (204, instrs)):  # a != b
        ops += [Op("PUSH", v) for v in reversed(word)]
        ops += [Op("PUSH", addr), Op("MSTOREW")]
        ops += [Op("DROP")] * 4
    ops.append(Op("EVALCIRCUIT"))
    forest = MastForest()
    root = forest.add_block(ops)
    forest.make_root(root)
    with pytest.raises(ExecutionError):
        execute(Program(forest, root), [200, 2, 4] + [0] * 13)


@pytest.mark.slow
def test_prove_log_deferred():
    # LOGDEFERRED: two statement digests folded into the AND-chain
    # deferred root; the proof claim carries the final root and the
    # chain bus + boundary terminals enforce it
    from miden_tpu.hash import poseidon2_host as hp
    from miden_tpu.vm.mast import MastForest, Program
    from miden_tpu.vm.ops import Op

    stmts = [(11, 12, 13, 14), (21, 22, 23, 24)]
    root = (0, 0, 0, 0)
    for stmt in stmts:
        root = tuple(hp.permute([*root, *stmt, 1, 0, 0, 0])[0:4])

    ops = []
    for stmt in stmts:
        # place the statement at s[4:8]: push 8 values (stmt below 4 pads)
        ops += [Op("PUSH", v) for v in reversed(stmt)]
        ops += [Op("PUSH", 0)] * 4
        ops.append(Op("LOGDEFERRED"))
        ops += [Op("DROP")] * 8  # drop the 12-lane output top
    forest = MastForest()
    r = forest.add_block(ops)
    forest.make_root(r)
    out, proof = prove_program(Program(forest, r))
    assert proof.deferred_root == root
    # non-zero deferred root: full verification requires the session
    # proof; partial verification checks only the main STARK
    with pytest.raises(VerificationError):
        verify_program(proof)
    verify_program(proof, partial=True)
    # tampering with the claimed deferred root must fail the main STARK
    import dataclasses

    bad = dataclasses.replace(proof, deferred_root=(9, 9, 9, 9))
    with pytest.raises(VerificationError):
        verify_program(bad, partial=True)
