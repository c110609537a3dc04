"""Generic numeric LogUp aux builder: evaluates an AIR's fraction-column
spec per row with exact scalar arithmetic — the very same spec the
constraints consume, so the prover and the constraint system cannot
drift.

Aux layout convention (both VM AIRs): column 0 is the accumulator,
columns 1.. are the fraction columns; acc[0] = seed (1/d_seed or 0),
acc[r+1] = acc[r] + Σ fractions(row r); the final value is returned as
the committed aux value when the AIR declares one.
"""

from __future__ import annotations

import numpy as np

from ...field import gl
from ...stark.air import Expr, Folder, ScalarBackend


def build_device_aux(air, main, publics, randomness, columns_fn, seed_fn=None):
    """Device twin of :func:`build_numeric_aux`: evaluates the same
    fraction-column spec ONCE over all rows with the vectorized backend
    (the spec itself is backend-generic), batch-inverts the denominators,
    and builds the accumulator with a parallel prefix scan — the TPU
    equivalent of the reference's fused rayon accumulator
    (air/src/lookup/aux_builder.rs:36-303). Zero host round-trips: accepts
    device ``Fp`` main matrices and ``Fp2`` randomness scalars, returns the
    interleaved device aux matrix + device aux values, so the whole VM
    prove pipeline stays a single asynchronous dependency graph.

    Bit-equivalence with the numeric builder is pinned by
    tests/test_device_aux.py."""
    import jax.numpy as jnp

    from ...field.goldilocks import (
        Fp,
        Fp2,
        fp2_add,
        fp2_inv,
        fp2_mul,
        fp2_where,
        fp2_zeros,
        fp_from_u64,
    )
    from ...stark.air import VectorBackend
    from ...stark.aux import prefix_sum_ext

    n = main.shape[0]
    if not isinstance(main, Fp):
        main = fp_from_u64(np.ascontiguousarray(np.asarray(main, np.uint64)))
    be = VectorBackend((n,))

    def base_const(v):
        from ...field.goldilocks import fp_broadcast_to, fp_const

        return Expr(be, "base", fp_broadcast_to(fp_const(int(v) % gl.P), (n,)))

    def ext_rand(r):
        from ...field.goldilocks import fp2_broadcast_to, fp2_from_pairs_u64

        if isinstance(r, Fp2):
            return Expr(be, "ext", fp2_broadcast_to(r, (n,)))
        arr = fp2_from_pairs_u64(
            np.asarray([int(r[0]) % gl.P, int(r[1]) % gl.P], np.uint64)
        )
        return Expr(be, "ext", fp2_broadcast_to(arr, (n,)))

    main_next = Fp(jnp.roll(main.lo, -1, axis=0), jnp.roll(main.hi, -1, axis=0))

    def main_fn(c, offset=0):
        src = main_next if offset else main
        return Expr(be, "base", src[:, c])

    periodic = []
    for p in air.periodic_columns:
        reps = n // len(p)
        arr = fp_from_u64(np.asarray(list(p) * reps, dtype=np.uint64))
        periodic.append(Expr(be, "base", arr))

    folder = Folder(
        be,
        main_fn=main_fn,
        periodic=periodic,
        publics=[base_const(v) for v in publics],
        randomness=[ext_rand(r) for r in randomness],
        selectors=(base_const(0), base_const(0), base_const(1)),
    )

    def as_ext_arr(e):
        if e.kind == "ext":
            return e.val
        from ...field.goldilocks import fp_sub

        return Fp2(e.val, fp_sub(e.val, e.val))

    cols = columns_fn(folder)
    k = len(cols)
    row_idx = jnp.arange(n)
    not_last = row_idx < (n - 1)

    fracs = []
    for V, U in cols:
        v = as_ext_arr(V)
        u = as_ext_arr(U)
        frac = fp2_mul(v, fp2_inv(u))
        # the numeric builder leaves row n−1 at zero (no transition there)
        fracs.append(fp2_where(not_last, frac, fp2_zeros((n,))))

    if seed_fn is not None:
        seed_all = as_ext_arr(seed_fn(folder))
        seed = fp2_inv(seed_all[0:1])  # row-0 value
    else:
        seed = fp2_zeros((1,))

    # acc[r] = seed + Σ_{r' < r} Σ_i fracs[r', i]
    rowsum = fracs[0] if k else fp2_zeros((n,))
    for fcol in fracs[1:]:
        rowsum = fp2_add(rowsum, fcol)
    inc = prefix_sum_ext(rowsum)  # inclusive prefix
    from ...field.goldilocks import fp2_broadcast_to as _b2, fp2_concat

    shifted = fp2_concat([fp2_zeros((1,)), inc[: n - 1]], axis=0)
    acc = fp2_add(shifted, _b2(seed[0], (n,)))
    final = fp2_add(acc[n - 1], rowsum[n - 1])

    # interleave (n, 1+k) ext → (n, 2(1+k)) base
    cols_all = [acc] + fracs
    lo = jnp.stack(
        [x for c in cols_all for x in (c.c0.lo, c.c1.lo)], axis=1
    )
    hi = jnp.stack(
        [x for c in cols_all for x in (c.c0.hi, c.c1.hi)], axis=1
    )
    aux = Fp(lo, hi)
    if air.num_aux_values:
        return aux, Fp2(
            Fp(final.c0.lo.reshape(1), final.c0.hi.reshape(1)),
            Fp(final.c1.lo.reshape(1), final.c1.hi.reshape(1)),
        )
    return aux, fp2_zeros((0,))


def build_aux_dispatch(air, main, publics, randomness, columns_fn, seed_fn=None):
    """Route to the device builder when inputs are device-resident (Fp2
    randomness from the fused prover / Fp trace matrices), else the exact
    numeric builder (host debug checks, differential tests)."""
    from ...field.goldilocks import Fp, Fp2

    device = isinstance(main, Fp) or any(
        isinstance(r, Fp2) for r in randomness
    )
    builder = build_device_aux if device else build_numeric_aux
    return builder(air, main, publics, randomness, columns_fn, seed_fn=seed_fn)


def build_numeric_aux(air, main, publics, randomness, columns_fn, seed_fn=None):
    """Returns (aux (n, 1+k, 2) u64, aux_values) where k = number of
    fraction columns produced by ``columns_fn(f)``."""
    n = main.shape[0]
    be = ScalarBackend()

    def base(v):
        return Expr(be, "base", int(v) % gl.P)

    def ext(pair):
        return Expr(be, "ext", (int(pair[0]) % gl.P, int(pair[1]) % gl.P))

    pubs = [base(v) for v in publics]
    rands = [ext(r) for r in randomness]
    periodic_patterns = [list(p) for p in air.periodic_columns]

    def as_ext(val):
        return val if isinstance(val, tuple) else (val % gl.P, 0)

    def folder(r, rn):
        return Folder(
            be,
            main_fn=lambda c, o=0: base(main[rn if o else r, c]),
            periodic=[base(p[r % len(p)]) for p in periodic_patterns],
            publics=pubs,
            randomness=rands,
            selectors=(base(0), base(0), base(1)),
        )

    k = None
    fracs = None
    for r in range(n - 1):
        cols = columns_fn(folder(r, r + 1))
        if fracs is None:
            k = len(cols)
            fracs = np.zeros((n, k, 2), dtype=np.uint64)
        for i, (V, U) in enumerate(cols):
            v = as_ext(V.val)
            u = as_ext(U.val)
            fracs[r, i] = gl.ext_mul(v, gl.ext_inv(u))
    if fracs is None:
        k = 0
        fracs = np.zeros((n, 0, 2), dtype=np.uint64)

    acc = (0, 0)
    if seed_fn is not None:
        f0 = folder(0, 1 % n)
        acc = gl.ext_inv(as_ext(seed_fn(f0).val))
    aux = np.zeros((n, 1 + k, 2), dtype=np.uint64)
    for r in range(n):
        aux[r, 0] = acc
        aux[r, 1:] = fracs[r]
        for i in range(k):
            acc = gl.ext_add(acc, (int(fracs[r, i, 0]), int(fracs[r, i, 1])))
    aux_values = [acc] if air.num_aux_values else []
    return aux, aux_values
