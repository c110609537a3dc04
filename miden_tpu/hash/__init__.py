"""Cryptographic hashing on TPU: batched Poseidon2 + host scalar twin."""

from . import constants, poseidon2, poseidon2_host  # noqa: F401
