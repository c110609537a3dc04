"""Hasher chiplet + Poseidon2 permutation AIR tests: block digests and
HPERM results are cryptographically bound through the chiplet bus, the
perm-link wiring bus, and the packed 16-row permutation cycles
(docs/src/design/chiplets/hasher.md)."""

import dataclasses

import numpy as np
import pytest

from miden_tpu.hash import poseidon2_host as hp
from miden_tpu.vm import chiplets as C
from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.constraints import check_core_trace
from miden_tpu.vm.trace import execute_and_trace

PROGRAMS = {
    "hmerge": ("begin hmerge dropw end", [1, 2, 3, 4, 5, 6, 7, 8]),
    "hash_1to1": ("begin hash dropw end", [1, 2, 3, 4]),
    "control_flow": (
        "begin push.1 if.true push.2 drop else push.3 drop end drop end",
        [],
    ),
    "loop_respan": (
        "begin "
        + " ".join(f"push.{i} drop" for i in range(12))
        + " push.3 dup.0 neq.0 while.true sub.1 dup.0 neq.0 end drop drop end",
        [],
    ),
    "dedup": (  # the same block hashed twice → one cycle, multiplicity 2
        "begin push.2 dup.0 neq.0 while.true sub.1 dup.0 neq.0 end drop drop end",
        [],
    ),
}


@pytest.mark.parametrize("name", sorted(PROGRAMS))
def test_hasher_traces_satisfy_airs(name):
    src, inputs = PROGRAMS[name]
    _, trace = execute_and_trace(assemble(src), inputs)
    assert not check_core_trace(trace), check_core_trace(trace)[:8]


def test_packed_cycles_match_permutation():
    _, trace = execute_and_trace(
        assemble("begin hmerge dropw end"), [1, 2, 3, 4, 5, 6, 7, 8]
    )
    p = trace.poseidon
    for cid in range(p.shape[0] // 16):
        cycle = p[16 * cid : 16 * cid + 16]
        state_in = [int(v) for v in cycle[0, list(C.P_STATE)]]
        state_out = [int(v) for v in cycle[15, list(C.P_STATE)]]
        assert state_out == hp.permute(state_in)
        assert np.all(cycle[:, C.P_PERM] == cid)


def test_dedup_multiplicity():
    # a loop body executed multiple times hashes the same state each
    # iteration: one cycle with multiplicity > 1
    src, inputs = PROGRAMS["dedup"]
    _, trace = execute_and_trace(assemble(src), inputs)
    p = trace.poseidon
    mults = [int(p[16 * c, C.P_WITNESS[0]]) for c in range(p.shape[0] // 16)]
    assert max(mults) >= 2, mults


TAMPERS = [
    ("controller_digest", "chiplets", lambda t: (0, C.H_STATE[0])),
    ("perm_id", "chiplets", lambda t: (0, C.H_PERM)),
    ("poseidon_witness", "poseidon", lambda t: (5, C.P_WITNESS[0])),
    ("poseidon_state", "poseidon", lambda t: (8, C.P_STATE[3])),
]


@pytest.mark.parametrize("name,field,pick", TAMPERS, ids=[t[0] for t in TAMPERS])
def test_hasher_tampering_caught(name, field, pick):
    _, trace = execute_and_trace(
        assemble("begin hmerge dropw end"), [1, 2, 3, 4, 5, 6, 7, 8]
    )
    m = getattr(trace, field).copy()
    if field == "chiplets":
        hrows = np.flatnonzero(m[:, C.S0] == 0)
        out_rows = [r for r in hrows if m[r, C.H_HS0] == 0]
        r, col = out_rows[0], pick(trace)[1]
    else:
        r, col = pick(trace)
    m[r, col] += 1
    bad = dataclasses.replace(trace, **{field: m})
    assert check_core_trace(bad, max_violations=5), f"tamper {name} missed"


def test_forged_join_digest_now_cryptographically_bound():
    # pre-hasher this was only structurally checked; now the forged child
    # digest has no matching hasher response
    src = "begin push.1 if.true push.2 drop else push.3 drop end drop end"
    _, trace = execute_and_trace(assemble(src), [])
    from miden_tpu.vm import layout as L
    from miden_tpu.vm.ops import OPCODES

    ops = sum(
        trace.matrix[:, L.OP_BITS[i]].astype(np.int64) << i for i in range(7)
    )
    join = int(np.flatnonzero(ops == OPCODES["JOIN"])[0])
    m = trace.matrix.copy()
    m[join, L.HASHER[2]] += 1
    bad = dataclasses.replace(trace, matrix=m)
    assert check_core_trace(bad, max_violations=5)
