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
