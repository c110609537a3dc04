"""Device-side auxiliary (LogUp) trace builders.

The reference builds LogUp running-sum columns with a fused rayon
accumulator over 512-row chunks (air/src/lookup/aux_builder.rs:36-303). The
TPU-native equivalent is a parallel prefix sum: ``jax.lax.associative_scan``
over exact Goldilocks extension adds — O(log n) depth, fully parallel, and
shardable across a device mesh (SURVEY.md §5 long-trace scaling).
"""

from __future__ import annotations

import jax
import numpy as np

from ..field.goldilocks import (
    Fp2,
    fp2_add,
    fp2_to_pairs_u64,
)


def prefix_sum_ext(terms: Fp2) -> Fp2:
    """Inclusive prefix sum of extension elements along axis 0.

    Above 2^16 rows the flat ``associative_scan`` graph (log-depth slicing/
    concat levels over the full array) reliably crashes the remote XLA
    compile helper; the blocked form — in-block scans batched over blocks,
    then a small sequential ``lax.scan`` over block totals — compiles a
    fraction of the graph for two passes of runtime work."""
    n = terms.shape[0]
    if n <= (1 << 16) or (n & (n - 1)):
        return jax.lax.associative_scan(fp2_add, terms, axis=0)
    block = 1 << 12
    c = n // block
    rest = terms.shape[1:]
    v = terms.reshape(c, block, *rest)
    inblock = jax.lax.associative_scan(fp2_add, v, axis=1)
    totals = inblock[:, block - 1]  # (c, ...)

    def step(carry, t):
        return fp2_add(carry, t), carry  # exclusive prefix of block totals

    from ..field.goldilocks import fp2_zeros

    _, offsets = jax.lax.scan(step, fp2_zeros(rest), totals)
    # broadcast offsets over in-block rows
    from ..field.goldilocks import fp2_broadcast_to

    off = offsets.reshape(c, 1, *rest)
    out = fp2_add(inblock, fp2_broadcast_to(off, inblock.shape))
    return out.reshape(n, *rest)


def running_sum_aux(terms: Fp2):
    """Build a 1-column LogUp-style aux trace from per-row terms.

    Returns (aux numpy (n, 1, 2) u64, final_sum (c0, c1)) in the
    ``Air.build_aux_trace`` contract.
    """
    acc = prefix_sum_ext(terms)
    pairs = fp2_to_pairs_u64(acc)  # (n, 2)
    final = (int(pairs[-1, 0]), int(pairs[-1, 1]))
    return pairs[:, None, :].astype(np.uint64), [final]


@jax.jit
def running_sum_aux_columns(terms: Fp2):
    """Device-resident multi-column builder: terms (n, k) ext → interleaved
    base matrix (n, 2k) ready for commitment, plus the final row (k,) ext.

    One dispatch builds every LogUp column (prefix scan along rows)."""
    from ..field.goldilocks import Fp
    import jax.numpy as jnp

    acc = prefix_sum_ext(terms)  # (n, k) ext
    n, k = acc.shape
    interleaved = Fp(
        jnp.stack([acc.c0.lo, acc.c1.lo], axis=2).reshape(n, 2 * k),
        jnp.stack([acc.c0.hi, acc.c1.hi], axis=2).reshape(n, 2 * k),
    )
    return interleaved, acc[n - 1]
