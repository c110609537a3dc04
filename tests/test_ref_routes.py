"""Differential pin of the constraint-system flag/routing tables against
the reference (VERDICT round-3 ask #6, second carry).

Three layers, all transcribed from reference code as DATA:

1. Op-flag polynomials: every flag evaluated over all 128 op-bit patterns
   must be the exact indicator of its opcode, flags must be mutually
   exclusive, and each flag's algebraic degree must equal the reference
   degree class (air/src/constraints/op_flags/mod.rs:41-51,96-115).
2. Per-position stack routing: the (no/left/right)_shift_at membership per
   opcode, transcribed verbatim from the reference's own route-table test
   (air/src/constraints/op_flags/stack_route_tests.rs:27-190), diffed
   against the repo's STACK_SPEC-derived routing (vm/constraints/core.py).
3. Aggregate scalar shift flags: the left/right composite membership per
   opcode (stack_route_tests.rs:192-241 — note DYNCALL is intentionally
   NOT in the aggregate left flag, op_flags/mod.rs:599-619).

A single mis-transcribed flag polynomial / route entry fails here even
though every behavioral trace test still passes.
"""

from __future__ import annotations

import pytest

from miden_tpu.field import gl
from miden_tpu.stark.air import Expr, Folder, ScalarBackend
from miden_tpu.vm import layout as L
from miden_tpu.vm.constraints.core import STACK_SPEC
from miden_tpu.vm.constraints.op_flags import OpFlags
from miden_tpu.vm.ops import OPCODES

# Valid-but-unused opcode slots (stack_route_tests.rs:14-16); the repo pins
# their flags to zero instead (core.py "forbidden" constraints).
UNUSED_OPCODES = (6, 47, 95)


def _scalar_opflags(code: int, end_is_loop: int = 0, next_code: int = 0):
    """OpFlags evaluated numerically at one op-bit pattern.

    extra[0] / extra[1] are set per their defining relations (constraint-
    enforced in core.py: extra0 = b6(1-b5)b4, extra1 = b6·b5)."""
    be = ScalarBackend()

    def bits(c):
        return [(c >> i) & 1 for i in range(7)]

    cur, nxt = bits(code), bits(next_code)
    cols = {}
    for i in range(7):
        cols[(L.OP_BITS[i], 0)] = cur[i]
        cols[(L.OP_BITS[i], 1)] = nxt[i]
    cols[(L.EXTRA[0], 0)] = cur[6] * (1 - cur[5]) * cur[4]
    cols[(L.EXTRA[1], 0)] = cur[6] * cur[5]
    cols[(L.EXTRA[0], 1)] = nxt[6] * (1 - nxt[5]) * nxt[4]
    cols[(L.EXTRA[1], 1)] = nxt[6] * nxt[5]
    cols[(L.END_IS_LOOP, 0)] = end_is_loop

    f = Folder(
        be,
        main_fn=lambda c, o=0: Expr(be, "base", cols.get((c, o), 0)),
    )
    return OpFlags(f)


def _well_formed(code: int) -> bool:
    """Patterns admissible under the op-bit well-formedness constraints
    (core.py "prefix100/b0", "prefix11/b0", "prefix11/b1"): the degree-6
    group forces b0 = 0, the degree-4 group forces b0 = b1 = 0 — the same
    degree-reduction contract as the reference (op_flags/mod.rs:7-18)."""
    b6, b5, b4 = code >> 6, (code >> 5) & 1, (code >> 4) & 1
    if b6 and not b5 and not b4:
        return (code & 1) == 0
    if b6 and b5:
        return (code & 3) == 0
    return True


def test_op_flags_are_exact_indicators():
    """flag[name](bit pattern of c) == [c == opcode(name)] over every
    well-formed pattern, with the extra columns at their constrained
    values."""
    for code in range(128):
        if not _well_formed(code):
            continue
        fl = _scalar_opflags(code)
        for name, op in OPCODES.items():
            want = 1 if code == op else 0
            got = fl.flags[name].val
            assert got == want, (
                f"flag {name} (op {op}) evaluates to {got} at pattern {code}"
            )


def test_op_flags_mutually_exclusive():
    for code in range(128):
        if not _well_formed(code):
            continue
        fl = _scalar_opflags(code)
        total = sum(f.val for f in fl.flags.values())
        assert total <= 1, f"{total} flags active at pattern {code}"


def test_op_flag_degrees_match_reference_classes():
    """Degree classes per op_flags/mod.rs:41-51: b6=0 -> 7, prefix 100 -> 6,
    prefix 101 -> 5 (extra[0]), prefix 11 -> 4 (extra[1])."""
    from miden_tpu.stark.air import DegreeBackend

    be = DegreeBackend()
    f = Folder(be, main_fn=lambda c, o=0: Expr(be, "base", 1))
    fl = OpFlags(f)
    for name, op in OPCODES.items():
        b6, b5, b4 = op >> 6, (op >> 5) & 1, (op >> 4) & 1
        if not b6:
            want = 7
        elif (b5, b4) == (0, 0):
            want = 6
        elif b5 == 0:
            want = 5
        else:
            want = 4
        assert fl.flags[name].val == want, (
            f"flag {name}: degree {fl.flags[name].val}, reference class {want}"
        )


# ---------------------------------------------------------------------------
# Per-position stack routes, transcribed from
# /root/reference/air/src/constraints/op_flags/stack_route_tests.rs:38-190.
# Encoding: (no_shift positions, left positions, right positions); reference
# half-open ranges rendered as Python ranges. The reference tracks a
# right-shift flag at position 15 (feeding its overflow handling); the repo
# routes that through the aggregate f_shr depth/overflow constraints
# instead, so right sets are compared on positions 0..14 only.
# ---------------------------------------------------------------------------

R = range
REFERENCE_ROUTES = {
    # no-shift everywhere
    **{
        op: (R(0, 16), (), ())
        for op in (
            "NOOP", "U32ASSERT2", "MPVERIFY", "SPAN", "JOIN", "LOOP", "EMIT",
            "RESPAN", "HALT", "CALL", "SYSCALL", "EVALCIRCUIT",
        )
    },
    # unary ops modify only s0
    **{
        op: (R(1, 16), (), ())
        for op in ("EQZ", "NEG", "INV", "INCR", "NOT", "MLOAD")
    },
    "SWAP": (R(2, 16), (), ()),
    # MOVUPn: right shift 0..n, untouched above n
    **{
        f"MOVUP{n}": (R(n + 1, 16), (), R(0, n)) for n in range(2, 9)
    },
    # MOVDNn: left shift 1..n+1, untouched above n
    **{
        f"MOVDN{n}": (R(n + 1, 16), R(1, n + 1), ()) for n in range(2, 9)
    },
    **{
        op: (R(4, 16), (), ())
        for op in ("CALLER", "ADVPOPW", "EXPACC", "EXT2MUL", "MRUPDATE")
    },
    "SWAPW": (R(8, 16), (), ()),
    "SWAPW2": ((*R(4, 8), *R(12, 16)), (), ()),
    "SWAPW3": (R(4, 12), (), ()),
    "SWAPDW": ((), (), ()),
    **{
        op: ((), R(1, 16), ())
        for op in (
            "ASSERT", "DROP", "MSTORE", "MSTOREW", "SPLIT", "REPEAT", "DYN",
            "DYNCALL",
        )
    },
    **{
        op: ((), R(2, 16), ())
        for op in ("EQ", "ADD", "MUL", "AND", "OR", "U32AND", "U32XOR")
    },
    **{op: ((), R(3, 16), ()) for op in ("CSWAP", "U32ADD3", "U32MADD")},
    "MLOADW": ((), R(5, 16), ()),
    "CSWAPW": ((), R(9, 16), ()),
    **{
        op: ((), (), R(0, 16))
        for op in (
            "PAD", "DUP0", "DUP1", "DUP2", "DUP3", "DUP4", "DUP5", "DUP6",
            "DUP7", "DUP9", "DUP11", "DUP13", "DUP15", "ADVPOP", "SDEPTH",
            "CLK", "PUSH",
        )
    },
    "U32SPLIT": ((), (), R(1, 16)),
    **{
        op: (R(2, 16), (), ())
        for op in ("U32ADD", "U32SUB", "U32MUL", "U32DIV")
    },
    "HPERM": (R(12, 16), (), ()),
    "LOGDEFERRED": (R(12, 16), (), ()),
    "MSTREAM": ((*R(8, 12), *R(13, 16)), (), ()),
    "PIPE": ((*R(8, 12), *R(13, 16)), (), ()),
    "HORNERBASE": (R(0, 14), (), ()),
    "HORNEREXT": (R(0, 14), (), ()),
    "FRIE2F4": ((), (), ()),
    "CRYPTOSTREAM": ((), (), ()),
    # END is route-split on is_loop_end (stack_route_tests.rs:51-52)
    "END": (R(0, 16), (), ()),       # non-loop END
    "END_LOOP": ((), R(1, 16), ()),  # loop END
}

# Positions where the repo's routing deliberately diverges from the
# reference table, each with the covering mechanism. Format:
# op -> (kind, positions, justification).
ROUTE_EXCEPTIONS = {
    # The reference leaves CRYPTOSTREAM's untouched lanes to its op-specific
    # memory-bus constraints; the repo pins the untouched rate lanes
    # (s8..s11) and trailing slots (s14, s15) through the generic routing
    # and binds the ciphertext lanes + pointer increments via spec
    # constraints (core.py STACK_SPEC["CRYPTOSTREAM"]). Strictly tighter.
    "CRYPTOSTREAM": ("no", {8, 9, 10, 11, 14, 15}, "repo routes untouched lanes"),
}


def _our_routes(name):
    if name == "END":
        return set(R(0, 16)), set(), set()
    if name == "END_LOOP":
        return set(), set(R(1, 16)), set()
    spec = STACK_SPEC[name]
    return (
        set(spec.get("no", ())),
        set(spec.get("left", ())),
        {d for d in spec.get("right", ()) if d < 15},
    )


@pytest.mark.parametrize("name", sorted(REFERENCE_ROUTES))
def test_stack_routes_match_reference(name):
    ref_no, ref_left, ref_right = (set(x) for x in REFERENCE_ROUTES[name])
    ref_right -= {15}  # see module note on position 15
    our_no, our_left, our_right = _our_routes(name)
    exc = ROUTE_EXCEPTIONS.get(name)
    if exc is not None:
        kind, positions, _why = exc
        ours = {"no": our_no, "left": our_left, "right": our_right}[kind]
        assert positions <= ours, f"{name}: exception positions not present"
        ours -= positions
    assert our_no == ref_no, f"{name}: no-shift {sorted(our_no)} != ref {sorted(ref_no)}"
    assert our_left == ref_left, f"{name}: left {sorted(our_left)} != ref {sorted(ref_left)}"
    assert our_right == ref_right, f"{name}: right {sorted(our_right)} != ref {sorted(ref_right)}"


def test_route_table_covers_every_opcode():
    """Every opcode has a route entry (or is an argued skip)."""
    missing = set(OPCODES) - set(REFERENCE_ROUTES)
    assert missing == set(), f"opcodes without pinned routes: {missing}"


# ---------------------------------------------------------------------------
# Aggregate scalar shift flags (stack_route_tests.rs:192-241).
# ---------------------------------------------------------------------------

AGG_LEFT = {
    "ASSERT", "EQ", "ADD", "MUL", "AND", "OR", "U32AND", "U32XOR", "FRIE2F4",
    "DROP", "CSWAP", "CSWAPW", "MLOADW", "MSTORE", "MSTOREW", "U32ADD3",
    "U32MADD", "SPLIT", "REPEAT", "DYN",
    # NOT DYNCALL (op_flags/mod.rs:599-619) — its depth reset rides
    # call_entry and its overflow pop uses the h5-stored pointer.
}
AGG_RIGHT = {
    "PAD", "DUP0", "DUP1", "DUP2", "DUP3", "DUP4", "DUP5", "DUP6", "DUP7",
    "DUP9", "DUP11", "DUP13", "DUP15", "ADVPOP", "SDEPTH", "CLK", "PUSH",
    "U32SPLIT",
}


def test_aggregate_shift_flags_match_reference():
    for name, op in OPCODES.items():
        fl = _scalar_opflags(op, end_is_loop=0)
        want_l = 1 if name in AGG_LEFT else 0
        want_r = 1 if name in AGG_RIGHT else 0
        assert fl.shift_left.val == want_l, f"left aggregate mismatch: {name}"
        assert fl.shift_right.val == want_r, f"right aggregate mismatch: {name}"
    # END aggregates depend on is_loop_end
    for loop, want in ((0, 0), (1, 1)):
        fl = _scalar_opflags(OPCODES["END"], end_is_loop=loop)
        assert fl.shift_left.val == want, f"END loop={loop}"
        assert fl.shift_right.val == 0


def test_control_flow_flag_matches_reference_set():
    """Control-flow membership per op_flags/mod.rs:621-648: SPAN, JOIN,
    SPLIT, LOOP, END, REPEAT, RESPAN, HALT, DYN, DYNCALL, CALL, SYSCALL."""
    cf = {
        "SPAN", "JOIN", "SPLIT", "LOOP", "END", "REPEAT", "RESPAN", "HALT",
        "DYN", "DYNCALL", "CALL", "SYSCALL",
    }
    for name, op in OPCODES.items():
        fl = _scalar_opflags(op)
        want = 1 if name in cf else 0
        assert fl.control_flow.val == want, f"control_flow mismatch: {name}"


def test_next_ctrl_flags_match_reference():
    """Next-row END/REPEAT/RESPAN/HALT flags (op_flags/mod.rs:234-257)."""
    targets = ("END", "REPEAT", "RESPAN", "HALT")
    for next_name, next_op in OPCODES.items():
        fl = _scalar_opflags(0, next_code=next_op)
        for t in targets:
            want = 1 if next_name == t else 0
            assert fl.next_ctrl[t].val == want, f"{t}' at next={next_name}"
        assert fl.next_ctrl["ANY"].val == (1 if next_name in targets else 0)
