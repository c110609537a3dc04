"""Fiat-Shamir transcript channels."""

from . import challenger  # noqa: F401
