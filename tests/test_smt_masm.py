"""collections::smt — in-VM SMT reads against the host Smt.

Differential strategy mirrors tests/test_mmr_masm.py: every read path
(empty leaf, single-entry leaf, multi-entry leaf, absent key in an
existing leaf) is checked against merkle/smt.py, and forged advice
(tampered leaf preimage, wrong root) must be rejected by the in-VM
hash/path checks.
"""

import pytest

from miden_tpu.merkle.nodes import MerkleError
from miden_tpu.merkle.smt import Smt
from miden_tpu.stdlib import (
    assemble_with_stdlib,
    smt_advice,
    stdlib_event_handlers,
)
from miden_tpu.vm.processor import ExecutionError, execute

K1 = (1, 2, 3, 40)
K2 = (9, 9, 9, 40)  # same leaf index (key[3]) as K1 -> multi-entry leaf
K3 = (5, 5, 5, 77)  # single-entry leaf


@pytest.fixture(scope="module")
def smt():
    t = Smt()
    t.insert(K1, (11, 12, 13, 14))
    t.insert(K2, (21, 22, 23, 24))
    t.insert(K3, (31, 32, 33, 34))
    return t


@pytest.fixture(scope="module")
def get_prog():
    return assemble_with_stdlib(
        "use miden::core::collections::smt\nbegin exec.smt::get end"
    )


@pytest.mark.parametrize(
    "key,want",
    [
        (K1, (11, 12, 13, 14)),
        (K2, (21, 22, 23, 24)),  # multi-entry leaf, second entry
        (K3, (31, 32, 33, 34)),  # single-entry leaf
        ((0, 0, 0, 123), (0, 0, 0, 0)),  # empty leaf
        ((8, 8, 8, 40), (0, 0, 0, 0)),  # absent key in a multi leaf
        ((5, 5, 6, 77), (0, 0, 0, 0)),  # absent key in a single leaf
    ],
)
def test_get_matches_host(smt, get_prog, key, want):
    assert smt.get_value(key) == want
    out = execute(
        get_prog,
        list(key) + list(smt.root),
        advice=smt_advice(smt, [key]),
        event_handlers=stdlib_event_handlers(),
    )
    assert tuple(out.stack[0:4]) == want
    assert tuple(out.stack[4:8]) == tuple(smt.root)


def test_forged_leaf_preimage_rejected(smt, get_prog):
    adv = smt_advice(smt, [K3])
    key = next(iter(adv.map))
    adv.map[key] = list(adv.map[key])
    adv.map[key][4] ^= 1  # flip a value limb: leaf hash check must fire
    with pytest.raises(ExecutionError):
        execute(
            get_prog,
            list(K3) + list(smt.root),
            advice=adv,
            event_handlers=stdlib_event_handlers(),
        )


def test_wrong_root_rejected(smt, get_prog):
    bad_root = list(smt.root)
    bad_root[0] ^= 1
    # the advice store has no tree under the forged root: the host
    # merkle-node lookup fails (MerkleError) before MPVERIFY can
    with pytest.raises((ExecutionError, MerkleError)):
        execute(
            get_prog,
            list(K1) + bad_root,
            advice=smt_advice(smt, [K1]),
            event_handlers=stdlib_event_handlers(),
        )
