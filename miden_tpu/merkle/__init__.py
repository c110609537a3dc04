"""Merkle commitments (LMCS)."""

from . import lmcs  # noqa: F401
