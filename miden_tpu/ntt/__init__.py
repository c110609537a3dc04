"""NTT / low-degree extension kernels."""

from . import ntt  # noqa: F401
