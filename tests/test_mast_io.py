"""Budgeted MAST serialization: roundtrips, digest recomputation, and
untrusted-input hardening (reference: core/src/mast/serialization/)."""

import struct

import pytest

from miden_tpu.vm.assembler import assemble
from miden_tpu.vm.mast_io import (
    MAGIC,
    MastFormatError,
    forest_from_bytes,
    program_from_bytes,
    program_to_bytes,
)
from miden_tpu.vm.processor import execute

SRC = """
proc square
    dup mul
end
begin
    push.3 exec.square
    push.1
    if.true push.1 else push.2 end
    push.1
    while.true push.7 drop push.0 end
    drop
end
"""


def test_program_roundtrip_preserves_hash_and_behavior():
    prog = assemble(SRC)
    data = program_to_bytes(prog)
    back = program_from_bytes(data)
    assert back.hash == prog.hash
    assert back.kernel_digests == prog.kernel_digests
    assert execute(back).stack == execute(prog).stack
    # deterministic encoding
    assert program_to_bytes(back) == data


def test_digests_recomputed_not_trusted():
    """Tampering with an opcode byte changes the recomputed program hash
    (or is rejected); it can never keep the original digest."""
    prog = assemble("begin push.1 push.2 add end")
    data = bytearray(program_to_bytes(prog))
    # first basic-block op byte: magic(4) ver(4) n_nodes(4) tag(1) n_ops(4)
    op_off = 4 + 4 + 4 + 1 + 4
    data[op_off] ^= 1
    try:
        back = program_from_bytes(bytes(data))
    except MastFormatError:
        return  # flipped into an invalid opcode: also fine
    assert back.hash != prog.hash


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d[: len(d) // 2],  # truncation
        lambda d: d + b"\x00",  # trailing bytes
        lambda d: b"XXXX" + d[4:],  # bad magic
        lambda d: d[:4] + struct.pack("<I", 99) + d[8:],  # bad version
        # node budget: claim 2^21 nodes
        lambda d: d[:8] + struct.pack("<I", 1 << 21) + d[12:],
    ],
)
def test_malformed_inputs_rejected(mutate):
    data = program_to_bytes(assemble("begin push.1 drop end"))
    with pytest.raises(MastFormatError):
        program_from_bytes(mutate(data))


def test_forward_child_reference_rejected():
    """A join whose child does not precede it must be rejected (the DAG
    wire form is topologically ordered by construction)."""
    bad = bytearray()
    bad += MAGIC
    bad += struct.pack("<II", 1, 1)  # version 1, one node
    bad += struct.pack("<BII", 1, 0, 5)  # join(0, 5): 5 is forward
    bad += struct.pack("<I", 0)  # roots
    bad += struct.pack("<I", 0)  # advice
    with pytest.raises(MastFormatError):
        forest_from_bytes(bytes(bad))


def test_oversized_input_rejected_before_parse():
    from miden_tpu.vm import mast_io

    with pytest.raises(MastFormatError):
        forest_from_bytes(b"\x00" * (mast_io.MAX_BYTES + 1))
