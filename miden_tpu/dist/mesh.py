"""Device mesh + sharding helpers for the row axis.

One mesh axis (``"rows"``) covers the single-slice case; multi-host pods
add a second axis by constructing the mesh externally and passing it in —
every component here only needs the row axis name.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field.goldilocks import Fp, Fp2

ROWS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (ROWS,))


def _put(arr, mesh: Mesh, spec: P):
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_rows(x, mesh: Mesh):
    """Shard an Fp/Fp2/array along axis 0 of its leaves."""
    if isinstance(x, Fp2):
        return Fp2(shard_rows(x.c0, mesh), shard_rows(x.c1, mesh))
    if isinstance(x, Fp):
        spec = P(ROWS, *([None] * (x.lo.ndim - 1)))
        return Fp(_put(x.lo, mesh, spec), _put(x.hi, mesh, spec))
    spec = P(ROWS, *([None] * (x.ndim - 1)))
    return _put(x, mesh, spec)


def replicate(x, mesh: Mesh):
    """Replicate an Fp/Fp2/array on every device of the mesh."""
    if isinstance(x, Fp2):
        return Fp2(replicate(x.c0, mesh), replicate(x.c1, mesh))
    if isinstance(x, Fp):
        return Fp(_put(x.lo, mesh, P()), _put(x.hi, mesh, P()))
    return _put(x, mesh, P())
