"""End-to-end prove → verify roundtrips for the lifted STARK engine.

Mirrors the reference's framework-level integration fixtures
(crates/lifted-stark/src/testing/: tiny synthetic AIRs with heterogeneous
heights, degree mixes, aux columns, periodic columns)."""

import numpy as np
import pytest

from miden_tpu.field import gl
from miden_tpu.stark import (
    TEST_PARAMS,
    Air,
    MultiAir,
    Statement,
    VerificationError,
    prove,
    verify,
)
from miden_tpu.transcript.challenger import DuplexChallenger

SEED = [11, 22, 33, 44]


class FibAir(Air):
    width = 2
    num_public_values = 3

    def eval(self, f):
        a, b = f.main(0), f.main(1)
        an, bn = f.main(0, 1), f.main(1, 1)
        f.assert_zero_first_row(a - f.public(0))
        f.assert_zero_first_row(b - f.public(1))
        f.assert_transition(an - b)
        f.assert_transition(bn - (a + b))
        f.assert_zero_last_row(b - f.public(2))


def fib_trace(n, a0=0, b0=1):
    rows = []
    a, b = a0, b0
    for _ in range(n):
        rows.append((a, b))
        a, b = b, gl.add(a, b)
    return np.array(rows, dtype=np.uint64)


class CubeAir(Air):
    """Degree-3 AIR with a periodic column: y = x², x' = x·y·p + x."""

    width = 2
    num_public_values = 3
    periodic_columns = [[1, 0]]

    def eval(self, f):
        x, y = f.main(0), f.main(1)
        xn = f.main(0, 1)
        p = f.periodic(0)
        f.assert_zero(y - x * x)
        f.assert_transition(xn - (x * y * p + x))


def cube_trace(n, x0=3):
    rows = []
    x = x0
    for i in range(n):
        y = gl.mul(x, x)
        rows.append((x, y))
        p = 1 if i % 2 == 0 else 0
        x = gl.add(gl.mul(gl.mul(x, y), p), x)
    return np.array(rows, dtype=np.uint64)


class ProductAir(Air):
    """Running-product aux column (LogUp-style): A₀ = γ−v₀,
    Aᵢ₊₁ = Aᵢ·(γ−vᵢ₊₁); the final product is exposed as an aux value."""

    width = 1
    aux_width = 1
    num_randomness = 1
    num_aux_values = 1
    num_public_values = 3

    def eval(self, f):
        v = f.main(0)
        vn = f.main(0, 1)
        a = f.aux(0)
        an = f.aux(0, 1)
        g = f.rand(0)
        f.assert_zero_first_row(a - (g - v))
        f.assert_transition(an - a * (g - vn))
        f.assert_zero_last_row(a - f.aux_value(0))

    def build_aux_trace(self, main, publics, aux_inputs, randomness):
        g = randomness[0]
        n = main.shape[0]
        aux = np.zeros((n, 1, 2), dtype=np.uint64)
        acc = (1, 0)
        for i in range(n):
            term = gl.ext_sub(g, (int(main[i, 0]), 0))
            acc = gl.ext_mul(acc, term)
            aux[i, 0] = acc
        return aux, [acc]


def _roundtrip(statement, traces):
    out = prove(TEST_PARAMS, statement, traces, DuplexChallenger(SEED))
    digest = verify(TEST_PARAMS, statement, out.proof, DuplexChallenger(SEED))
    assert digest == out.digest
    return out


def test_fib_roundtrip():
    n = 8
    tr = fib_trace(n)
    publics = [0, 1, int(tr[-1, 1])]
    st = Statement(MultiAir([FibAir()]), publics)
    out = _roundtrip(st, [tr])
    assert out.proof.size_in_bytes() > 0


@pytest.mark.slow
def test_cube_roundtrip_degree3():
    tr = cube_trace(16)
    st = Statement(MultiAir([CubeAir()]), [0, 0, 0])
    _roundtrip(st, [tr])


@pytest.mark.slow
def test_product_aux_roundtrip():
    rng = np.random.default_rng(5)
    tr = rng.integers(0, gl.P, size=(8, 1), dtype=np.uint64)
    st = Statement(MultiAir([ProductAir()]), [0, 0, 0])
    _roundtrip(st, [tr])


@pytest.mark.slow
def test_multi_air_mixed_heights():
    fib = fib_trace(16)
    prod = np.random.default_rng(6).integers(0, gl.P, size=(4, 1), dtype=np.uint64)
    cube = cube_trace(8)
    publics = [0, 1, int(fib[-1, 1])]
    st = Statement(MultiAir([FibAir(), ProductAir(), CubeAir()]), publics)
    _roundtrip(st, [fib, prod, cube])


def test_wrong_public_rejected():
    n = 8
    tr = fib_trace(n)
    st = Statement(MultiAir([FibAir()]), [0, 1, int(tr[-1, 1])])
    out = prove(TEST_PARAMS, st, [tr], DuplexChallenger(SEED))
    bad = Statement(MultiAir([FibAir()]), [0, 1, 12345])
    with pytest.raises(Exception):
        verify(TEST_PARAMS, bad, out.proof, DuplexChallenger(SEED))


def test_tampered_transcript_rejected():
    tr = fib_trace(8)
    st = Statement(MultiAir([FibAir()]), [0, 1, int(tr[-1, 1])])
    out = prove(TEST_PARAMS, st, [tr], DuplexChallenger(SEED))
    out.proof.data.fields[3] = (out.proof.data.fields[3] + 1) % gl.P
    with pytest.raises(Exception):
        verify(TEST_PARAMS, st, out.proof, DuplexChallenger(SEED))


class FamilyAir(Air):
    """Exercises the stacked constraint-family API (main_many/assert_*_many):
    must fold identically across the vector (prover) and scalar (verifier)
    backends."""

    width = 6
    num_public_values = 3

    def eval(self, f):
        a = f.main_many(range(self.width))
        nxt = f.main_many(range(self.width), 1)
        b = f.main_many([(c + 1) % self.width for c in range(self.width)])
        f.assert_transition_many(nxt * a - a * a * b)
        f.assert_zero_first_row_many(f.main_many(range(3)) - f.public_many(range(3)))
        f.assert_zero(f.main(0) * f.main(1))


@pytest.mark.slow
def test_family_api_roundtrip():
    tr = np.zeros((8, 6), dtype=np.uint64)
    st = Statement(MultiAir([FamilyAir()]), [0, 0, 0])
    _roundtrip(st, [tr])
