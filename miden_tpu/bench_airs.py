"""Miden-shaped synthetic AIRs for benchmarking.

Mirrors the shape of the Miden VM multi-AIR (SURVEY.md §2.3): a 51-column
"core" AIR with an 8-EF-column LogUp aux block, a 22-column "chiplets" AIR,
and a 16-column "poseidon2-permutation" AIR with a 16-row periodic cycle —
at the same widths, degree profile (max degree multiple 3 ⇒ quotient D = 2
chunks... degree 3 constraints), and height mix as the real thing, so the
prover exercises identical LDE/commit/constraint/DEEP/FRI cost.

Constraints are chosen to vanish on the all-zero main trace so arbitrary
power-of-two heights bench without a VM front-end (zero data moves through
the exact same kernels at the same cost).
"""

from __future__ import annotations

import numpy as np

from .field import gl
from .field.goldilocks import Fp2, fp2_broadcast_to, fp2_from_pairs_u64
from .stark.air import Air, MultiAir


class CoreShapedAir(Air):
    """51 main columns + 8 EF aux columns (4 LogUp buses worth), degree ≤ 3."""

    width = 51
    aux_width = 8
    num_randomness = 2
    num_aux_values = 8
    num_public_values = 32
    aux_on_device = True  # build_aux_trace accepts device Fp2 randomness

    def eval(self, f):
        w = self.width
        # degree-3 transition family across all columns (vanishes at 0)
        a = f.main_many(range(w))
        b = f.main_many([(c + 1) % w for c in range(w)])
        nxt = f.main_many(range(w), 1)
        f.assert_transition_many(nxt * a - a * a * b)
        # boundary families against the 32 public values
        head = f.main_many(range(16))
        f.assert_zero_first_row_many(head - f.public_many(range(16)))
        f.assert_zero_last_row_many(head - f.public_many(range(16, 32)))
        # aux running-sum constraints per EF column
        g0 = f.rand(0)
        g1 = f.rand(1)
        av = f.aux_many(range(self.aux_width))
        avn = f.aux_many(range(self.aux_width), 1)
        m0 = f.main_many(range(self.aux_width))
        m1 = f.main_many(range(self.aux_width), 1)
        f.assert_zero_first_row_many(av - (m0 * g1 + g0))
        f.assert_transition_many(avn - av - (m1 * g1 + g0))
        f.assert_zero_last_row_many(av - f.aux_value_many(range(self.aux_width)))

    def build_aux_trace(self, main, publics, aux_inputs, randomness):
        n = main.shape[0]
        g0, g1 = randomness  # device Fp2 scalars (aux_on_device)
        # terms = γ0 + v·γ1, v = main col c (zero in the bench): one device
        # prefix scan builds all 8 columns; everything stays on device —
        # the aux values flow straight into the transcript without a sync.
        from .stark.aux import running_sum_aux_columns

        terms = fp2_broadcast_to(g0, (n, self.aux_width))
        interleaved, final = running_sum_aux_columns(terms)
        return interleaved, final  # final: Fp2 (aux_width,)


class ChipletsShapedAir(Air):
    """22 main columns, degree ≤ 3, no aux."""

    width = 22
    num_public_values = 32

    def eval(self, f):
        w = self.width
        a = f.main_many(range(w))
        b = f.main_many([(c + 3) % w for c in range(w)])
        nxt = f.main_many(range(w), 1)
        f.assert_transition_many(nxt * b - a * a * b)
        f.assert_zero_first_row(f.main(0))


class PermShapedAir(Air):
    """16 main columns with a 16-row periodic cycle column, degree ≤ 3."""

    width = 16
    num_public_values = 32
    periodic_columns = [[1] + [0] * 15, [0] * 15 + [1]]

    def eval(self, f):
        p0 = f.periodic(0)
        p1 = f.periodic(1)
        a = f.main_many(range(self.width))
        nxt = f.main_many(range(self.width), 1)
        f.assert_zero_many(a * a * p0)
        f.assert_transition_many((nxt - a) * p1)


def miden_shaped_statement(log_core: int):
    """The Miden height mix: core at 2^log_core, chiplets 4× shorter,
    poseidon2 16× shorter (cf. execution_trace_optimization.md)."""
    from .stark.prover import Statement

    airs = MultiAir([CoreShapedAir(), ChipletsShapedAir(), PermShapedAir()])
    publics = [0] * 32

    # Device-resident zero traces: the benched quantity is proving, not the
    # (tunnel-limited) host→device trace transfer.
    import jax.numpy as jnp
    from .field.goldilocks import Fp

    def zeros(n, w):
        return Fp(jnp.zeros((n, w), jnp.uint32), jnp.zeros((n, w), jnp.uint32))

    core = zeros(1 << log_core, 51)
    chip = zeros(1 << max(4, log_core - 2), 22)
    perm = zeros(1 << max(4, log_core - 4), 16)
    return Statement(airs, publics), [core, chip, perm]
