"""Field layer: Goldilocks base field + quadratic extension.

- ``gl``         — pure-Python exact arithmetic (ground truth, host helpers).
- ``goldilocks`` — JAX packed 32-bit-limb kernels (the on-device representation).
"""

from . import gl
from .goldilocks import (  # noqa: F401
    Fp,
    Fp2,
    fp_add,
    fp_broadcast_to,
    fp_concat,
    fp_const,
    fp_double,
    fp_equal,
    fp_exp_power_of_2,
    fp_from_u64,
    fp_inv,
    fp_mul,
    fp_mul_small,
    fp_neg,
    fp_ones,
    fp_pow_const,
    fp_powers,
    fp_square,
    fp_stack,
    fp_sub,
    fp_to_u64,
    fp_where,
    fp_zeros,
    fp2_add,
    fp2_broadcast_to,
    fp2_concat,
    fp2_exp_power_of_2,
    fp2_from_fp,
    fp2_from_pair,
    fp2_from_pairs_u64,
    fp2_inv,
    fp2_mul,
    fp2_mul_base,
    fp2_neg,
    fp2_ones,
    fp2_square,
    fp2_sub,
    fp2_to_pairs_u64,
    fp2_where,
    fp2_zeros,
)
