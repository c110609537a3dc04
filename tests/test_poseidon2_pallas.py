"""Pallas Poseidon2 permutation kernel vs the host ground truth.

On the CPU test mesh the kernel runs through the Pallas interpreter
(``poseidon2_pallas._INTERPRET``), exercising the exact kernel code that
Mosaic compiles on TPU. Interpreter tracing is expensive (~1 min), so the
test is marked slow; bit-exactness on real hardware (vs both the jnp path
and plonky3 vectors) was additionally verified on a v5e chip.
"""

import numpy as np
import pytest

from miden_tpu.field.goldilocks import fp_from_u64, fp_to_u64
from miden_tpu.hash import poseidon2_host as hp
from miden_tpu.hash import poseidon2_pallas as pp

P = (1 << 64) - (1 << 32) + 1


@pytest.mark.slow
def test_permute_pallas_matches_host():
    states = np.random.default_rng(7).integers(0, P, (12, 1024), dtype=np.uint64)
    out = fp_to_u64(pp.permute_pallas(fp_from_u64(states), 1024))
    for j in (0, 17, 1023):
        exp = hp.permute([int(v) for v in states[:, j]])
        assert [int(v) for v in out[:, j]] == exp
