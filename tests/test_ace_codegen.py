"""ACE codegen: Air constraint folds compiled to EVALCIRCUIT circuits.

Differential strategy (mirrors the reference ace-codegen test split,
crates/ace-codegen/src/tests/): the generated circuit's host evaluation
must agree with an independent scalar fold of the same Air (ScalarBackend
Folder pass) on random inputs, the VM must accept the circuit via
EVALCIRCUIT, and any tampering (wrong expected value, wrong input) must
be rejected. A slow test proves a program containing the generated
circuit, covering the ACE chiplet AIR end to end.
"""

import random

import pytest

from miden_tpu.field import gl
from miden_tpu.stark.air import Air, Expr, Folder, ScalarBackend
from miden_tpu.vm.ace_codegen import build_ace_circuit, eval_circuit_program
from miden_tpu.vm.processor import ExecutionError, execute


def _scalar_fold(air, n_pub, n_rand, n_auxv, inputs):
    """Independent reference: the same Folder walk over ScalarBackend."""
    be = ScalarBackend()
    it = iter(inputs)
    w, aw, p = air.width, air.aux_width, len(air.periodic_columns)
    pw = air.preprocessed_width
    mc = [next(it) for _ in range(w)]
    mn = [next(it) for _ in range(w)]
    ppc = [next(it) for _ in range(pw)]
    ppn = [next(it) for _ in range(pw)]
    ac = [(next(it), next(it)) for _ in range(aw)]
    an = [(next(it), next(it)) for _ in range(aw)]
    sels = tuple(next(it) for _ in range(3))
    per = [next(it) for _ in range(p)]
    pubs = [next(it) for _ in range(n_pub)]
    rnd = [(next(it), next(it)) for _ in range(n_rand)]
    avs = [(next(it), next(it)) for _ in range(n_auxv)]
    alpha = (next(it), next(it))
    f = Folder(
        be,
        main_fn=lambda c, o=0: Expr(be, "base", (mn if o else mc)[c]),
        aux_fn=lambda c, o=0: Expr(be, "ext", (an if o else ac)[c]),
        preprocessed_fn=lambda c, o=0: Expr(be, "base", (ppn if o else ppc)[c]),
        periodic=[Expr(be, "base", v) for v in per],
        publics=[Expr(be, "base", v) for v in pubs],
        randomness=[Expr(be, "ext", v) for v in rnd],
        aux_values=[Expr(be, "ext", v) for v in avs],
        selectors=tuple(Expr(be, "base", v) for v in sels),
        alpha=Expr(be, "ext", alpha),
    )
    air.eval(f)
    acc = f.acc
    return acc.val if acc.kind == "ext" else (acc.val, 0)


class TinyAir(Air):
    width = 2
    num_public_values = 1

    def eval(self, f):
        a, b = f.main(0), f.main(1)
        f.assert_transition(f.main(0, 1) - a * b - f.public(0))
        f.assert_zero(a * a - b)


def _roundtrip(air, n_pub, n_rand, n_auxv, seed=0):
    c = build_ace_circuit(air, n_pub, n_rand, n_auxv)
    rng = random.Random(seed)
    inputs = [rng.randrange(gl.P) for _ in range(c.n_inputs)]
    want = _scalar_fold(air, n_pub, n_rand, n_auxv, inputs)
    assert c.evaluate(inputs, want), f"{c.air_name}: circuit != scalar fold"
    assert not c.evaluate(inputs, (want[0] ^ 1, want[1]))
    bad = list(inputs)
    bad[0] = (bad[0] + 1) % gl.P
    assert not c.evaluate(bad, want)
    return c, inputs, want


def test_tiny_air_matches_scalar_fold_and_vm():
    c, inputs, want = _roundtrip(TinyAir(), 1, 0, 0)
    out = execute(eval_circuit_program(c, inputs, want), [0] * 16)
    assert out.clk > 0
    with pytest.raises(ExecutionError):
        execute(
            eval_circuit_program(c, inputs, (want[0] ^ 1, want[1])), [0] * 16
        )


def test_session_airs_compile_and_match():
    """Real session AIRs (chain, u256, range) compile to circuits that
    agree with the independent scalar fold."""
    from miden_tpu.precompile.session import ChainAir, RangeTableAir, U256Air

    for air, pub in ((ChainAir(), 7), (U256Air(), 7), (RangeTableAir(), 7)):
        c, _, _ = _roundtrip(air, pub, 2, 1, seed=hash(type(air).__name__) & 0xFF)
        assert c.num_eval % 4 == 0 and c.num_vars % 2 == 0


def test_vm_core_air_compiles():
    """The flagship CoreVmAir fold compiles and matches (host only: the
    circuit has ~10^5 gates; VM execution is covered by the slow test
    with a smaller AIR)."""
    from miden_tpu.vm.constraints import CoreVmAir

    c, _, _ = _roundtrip(CoreVmAir(), 40, 2, 4, seed=7)
    assert c.total_nodes < (1 << 30)


def test_chain_air_circuit_runs_in_vm():
    from miden_tpu.precompile.session import RangeTableAir

    c, inputs, want = _roundtrip(RangeTableAir(), 7, 2, 1, seed=3)
    execute(eval_circuit_program(c, inputs, want), [0] * 16)


@pytest.mark.slow
def test_generated_circuit_proves_e2e():
    """prove_program over a generated circuit: the ACE chiplet proves
    the constraint-fold evaluation."""
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.vm.prove import prove_program, verify_program

    c, inputs, want = _roundtrip(TinyAir(), 1, 0, 0, seed=11)
    out, proof = prove_program(
        eval_circuit_program(c, inputs, want), params=TEST_PARAMS
    )
    verify_program(proof, params=TEST_PARAMS)
