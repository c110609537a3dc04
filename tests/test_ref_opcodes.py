"""Differential pin of the opcode table against the reference.

The full opcode map from /root/reference/core/src/operations/mod.rs:14-130
is embedded here as DATA (protocol constants that must match bit-for-bit —
the trace-parity suite pins execution *behavior*, this pins the encoding
itself so a single wrong opcode value cannot slip through while every
behavioral test still passes). Also pins the structural opcode-class
semantics the constraint system depends on (op_flags/mod.rs:8-25):

- degree classes by the top bits (b6 b5 b4): 0** → degree 7 (all bits
  discriminate), 100 → degree 6 (b0 unused), 101 → degree 5 (extra[0]
  column), 11* → degree 4 (extra[1] column);
- stack-shift classes by the top bits (operations/mod.rs:17-26):
  00xxxxx no shift, 010xxxx left shift, 011xxxx right shift;
- u32 range-check class: 100xxx- consume 4 range checks.
"""

from miden_tpu.vm.ops import OPCODES

# /root/reference/core/src/operations/mod.rs:28-129 (verbatim values)
REFERENCE_OPCODES = {
    "NOOP": 0b0000_0000, "EQZ": 0b0000_0001, "NEG": 0b0000_0010,
    "INV": 0b0000_0011, "INCR": 0b0000_0100, "NOT": 0b0000_0101,
    "MLOAD": 0b0000_0111, "SWAP": 0b0000_1000, "CALLER": 0b0000_1001,
    "MOVUP2": 0b0000_1010, "MOVDN2": 0b0000_1011, "MOVUP3": 0b0000_1100,
    "MOVDN3": 0b0000_1101, "ADVPOPW": 0b0000_1110, "EXPACC": 0b0000_1111,
    "MOVUP4": 0b0001_0000, "MOVDN4": 0b0001_0001, "MOVUP5": 0b0001_0010,
    "MOVDN5": 0b0001_0011, "MOVUP6": 0b0001_0100, "MOVDN6": 0b0001_0101,
    "MOVUP7": 0b0001_0110, "MOVDN7": 0b0001_0111, "SWAPW": 0b0001_1000,
    "EXT2MUL": 0b0001_1001, "MOVUP8": 0b0001_1010, "MOVDN8": 0b0001_1011,
    "SWAPW2": 0b0001_1100, "SWAPW3": 0b0001_1101, "SWAPDW": 0b0001_1110,
    "EMIT": 0b0001_1111,
    "ASSERT": 0b0010_0000, "EQ": 0b0010_0001, "ADD": 0b0010_0010,
    "MUL": 0b0010_0011, "AND": 0b0010_0100, "OR": 0b0010_0101,
    "U32AND": 0b0010_0110, "U32XOR": 0b0010_0111, "FRIE2F4": 0b0010_1000,
    "DROP": 0b0010_1001, "CSWAP": 0b0010_1010, "CSWAPW": 0b0010_1011,
    "MLOADW": 0b0010_1100, "MSTORE": 0b0010_1101, "MSTOREW": 0b0010_1110,
    "PAD": 0b0011_0000, "DUP0": 0b0011_0001, "DUP1": 0b0011_0010,
    "DUP2": 0b0011_0011, "DUP3": 0b0011_0100, "DUP4": 0b0011_0101,
    "DUP5": 0b0011_0110, "DUP6": 0b0011_0111, "DUP7": 0b0011_1000,
    "DUP9": 0b0011_1001, "DUP11": 0b0011_1010, "DUP13": 0b0011_1011,
    "DUP15": 0b0011_1100, "ADVPOP": 0b0011_1101, "SDEPTH": 0b0011_1110,
    "CLK": 0b0011_1111,
    "U32ADD": 0b0100_0000, "U32SUB": 0b0100_0010, "U32MUL": 0b0100_0100,
    "U32DIV": 0b0100_0110, "U32SPLIT": 0b0100_1000, "U32ASSERT2": 0b0100_1010,
    "U32ADD3": 0b0100_1100, "U32MADD": 0b0100_1110,
    "HPERM": 0b0101_0000, "MPVERIFY": 0b0101_0001, "PIPE": 0b0101_0010,
    "MSTREAM": 0b0101_0011, "SPLIT": 0b0101_0100, "LOOP": 0b0101_0101,
    "SPAN": 0b0101_0110, "JOIN": 0b0101_0111, "DYN": 0b0101_1000,
    "HORNERBASE": 0b0101_1001, "HORNEREXT": 0b0101_1010, "PUSH": 0b0101_1011,
    "DYNCALL": 0b0101_1100, "EVALCIRCUIT": 0b0101_1101,
    "LOGDEFERRED": 0b0101_1110,
    "MRUPDATE": 0b0110_0000, "CRYPTOSTREAM": 0b0110_0100,
    "SYSCALL": 0b0110_1000, "CALL": 0b0110_1100,
    "END": 0b0111_0000, "REPEAT": 0b0111_0100, "RESPAN": 0b0111_1000,
    "HALT": 0b0111_1100,
}


def test_every_reference_opcode_matches():
    """Every reference opcode we implement must have the exact value."""
    missing, wrong = [], []
    for name, code in REFERENCE_OPCODES.items():
        if name not in OPCODES:
            missing.append(name)
        elif OPCODES[name] != code:
            wrong.append((name, OPCODES[name], code))
    assert not wrong, f"opcode value mismatches: {wrong}"
    # missing ops are a (tracked) coverage gap, not a divergence; no op we
    # DO implement may be absent from the reference or carry another value
    extra = [n for n in OPCODES if n not in REFERENCE_OPCODES]
    assert not extra, f"opcodes not in the reference: {extra}"


def test_opcode_class_alignment_constraints():
    """Low-degree alignment constraints the reference decoder relies on
    (op_flags/mod.rs:8-25): degree-6 ops have b0 = 0; degree-5 ops
    (101xxx-) have b0 free but must be even too in the reference table;
    degree-4 ops (11xxx--) have b0 = b1 = 0."""
    for name, code in REFERENCE_OPCODES.items():
        b6, b5, b4 = (code >> 6) & 1, (code >> 5) & 1, (code >> 4) & 1
        if (b6, b5, b4) == (1, 0, 0):
            assert code & 1 == 0, f"{name}: degree-6 opcode with b0 set"
        if b6 == 1 and b5 == 1:
            assert code & 0b11 == 0, f"{name}: degree-4 opcode with low bits"


def test_stack_shift_classes():
    """Spot-pin the shift classification (operations/mod.rs:17-26) against
    known op behavior: 010xxxx = left shift, 011xxxx = right shift."""
    left = ["ASSERT", "EQ", "ADD", "MUL", "AND", "OR", "DROP"]
    right = ["PAD", "DUP0", "DUP7", "ADVPOP", "SDEPTH", "CLK"]
    none = ["NOOP", "EQZ", "NEG", "INV", "SWAP", "MOVUP4", "SWAPW"]
    for n in left:
        assert REFERENCE_OPCODES[n] >> 4 == 0b010, n
    for n in right:
        assert REFERENCE_OPCODES[n] >> 4 == 0b011, n
    for n in none:
        assert REFERENCE_OPCODES[n] >> 5 == 0b00, n
