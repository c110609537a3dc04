"""VM layer tests: op batching (mirrors of the reference's batch_ops_1..9
vectors, core/src/mast/node/basic_block_node/tests.rs:12-273 + insta
snapshots), MAST digests, and interpreter behavior
(processor/src/fast/tests)."""

import pytest

from miden_tpu.hash import poseidon2_host as hp
from miden_tpu.merkle import MerkleStore, MerkleTree
from miden_tpu.vm import (
    BATCH_SIZE,
    AdviceProvider,
    ExecutionError,
    MastForest,
    Op,
    Program,
    batch_ops,
    execute,
    push,
)
from miden_tpu.vm.ops import OP_BITS


def bg(ops):
    """build_group (tests.rs:275): pack opcodes 7 bits each."""
    g = 0
    for i, op in enumerate(ops):
        g |= op.op_code << (OP_BITS * i)
    return g


ADD, MUL, PAD = Op("ADD"), Op("MUL"), Op("PAD")


def check(ops, expected_batches):
    batches = batch_ops(ops)
    assert len(batches) == len(expected_batches)
    for got, (groups, num_groups) in zip(batches, expected_batches):
        assert got.groups == groups
        assert got.num_groups == num_groups
    # digest = Poseidon2 hash_elements over all batches' group felts
    flat = [g for b in batches for g in b.groups]
    return hp.hash_elements_padded(flat)


class TestOpBatching:
    def test_batch_ops_1(self):
        check([ADD], [([bg([ADD])] + [0] * 7, 1)])

    def test_batch_ops_2(self):
        check([ADD, MUL], [([bg([ADD, MUL])] + [0] * 7, 1)])

    def test_batch_ops_3(self):
        ops = [ADD, push(12345678)]
        check(ops, [([bg(ops), 12345678] + [0] * 6, 2)])

    def test_batch_ops_4(self):
        ops = [push(i) for i in range(1, 8)] + [ADD]
        check(ops, [([bg(ops), 1, 2, 3, 4, 5, 6, 7], 8)])

    def test_batch_ops_5(self):
        # last push overflows into a second batch
        ops = [ADD, MUL] + [push(i) for i in range(1, 7)] + [ADD, push(7)]
        check(
            ops,
            [
                ([bg(ops[:9]), 1, 2, 3, 4, 5, 6, 0], 8),
                ([bg([ops[9]]), 7] + [0] * 6, 2),
            ],
        )

    def test_batch_ops_6(self):
        ops = [ADD, MUL, ADD, push(7), ADD, ADD, push(11), MUL, MUL, ADD]
        check(ops, [([bg(ops[:9]), 7, 11, bg(ops[9:]), 0, 0, 0, 0], 4)])

    def test_batch_ops_7(self):
        # push at the end of a group moves into the next group
        ops = [ADD, MUL, ADD, ADD, ADD, MUL, MUL, ADD, push(11)]
        check(ops, [([bg(ops[:8]), bg([ops[8]]), 11, 0, 0, 0, 0, 0], 4)])

    def test_batch_ops_8(self):
        ops = [ADD, MUL, ADD, ADD, ADD, MUL, MUL, push(1), push(2)]
        check(ops, [([bg(ops[:8]), 1, bg([ops[8]]), 2, 0, 0, 0, 0], 4)])

    def test_batch_ops_9(self):
        # push at the end of the 7th group overflows to the next batch
        ops = (
            [ADD, MUL]
            + [push(i) for i in range(1, 6)]
            + [ADD, MUL, ADD, MUL, ADD, MUL, ADD, MUL, ADD, MUL]
            + [push(6), PAD]
        )
        check(
            ops,
            [
                ([bg(ops[:9]), 1, 2, 3, 4, 5, bg(ops[9:17]), 0], 8),
                ([bg(ops[17:]), 6] + [0] * 6, 2),
            ],
        )

    def test_non_final_batches_full_and_pow2(self):
        # proptest invariants (tests.rs:305-337)
        ops = [push(i) for i in range(40)] + [ADD] * 25
        batches = batch_ops(ops)
        for b in batches[:-1]:
            assert b.num_groups == BATCH_SIZE
        for b in batches:
            assert b.num_groups & (b.num_groups - 1) == 0
        raw = [op for b in batches for op in b.raw_ops()]
        assert raw == ops


class TestMastDigests:
    def test_block_digest_is_group_hash(self):
        forest = MastForest()
        nid = forest.add_block([ADD, MUL])
        groups = [g for b in forest[nid].batches for g in b.groups]
        assert forest[nid].digest == tuple(hp.hash_elements_padded(groups))

    def test_join_digest_merges_children_in_domain(self):
        forest = MastForest()
        a = forest.add_block([ADD])
        b = forest.add_block([MUL])
        j = forest.add_join(a, b)
        expected = hp.merge_in_domain(
            list(forest[a].digest), list(forest[b].digest), 0b0101_0111
        )
        assert forest[j].digest == tuple(expected)

    def test_dedup_by_digest(self):
        forest = MastForest()
        assert forest.add_block([ADD]) == forest.add_block([ADD])
        a, b = forest.add_block([ADD]), forest.add_block([MUL])
        assert forest.add_join(a, b) == forest.add_join(a, b)

    def test_error_code_kept_out_of_digest(self):
        # The digest is the plain sequential hash (what the hasher chiplet
        # recomputes); error codes only alter the forest-dedup fingerprint
        # (basic_block_node/mod.rs:841 fingerprint_for_node).
        f = MastForest()
        n1 = f.add_block([push(1), Op("ASSERT")])
        n2 = f.add_block([push(1), Op("ASSERT", err_code=7)])
        assert n1 != n2
        assert f[n1].digest == f[n2].digest
        assert f[n1].fingerprint != f[n2].fingerprint


def run(ops, stack=None, advice=None):
    forest = MastForest()
    root = forest.add_block(ops)
    forest.make_root(root)
    return execute(Program(forest, root), stack or [], advice)


class TestProcessor:
    def test_push_add(self):
        out = run([push(3), push(5), ADD])
        assert out.stack[0] == 8

    def test_field_ops(self):
        from miden_tpu.field import gl

        out = run([push(3), Op("NEG")])
        assert out.stack[0] == gl.P - 3
        out = run([push(3), Op("INV"), push(3), MUL])
        assert out.stack[0] == 1
        out = run([push(7), Op("EQZ"), push(0), Op("EQZ")])
        assert out.stack[:2] == [1, 0]

    def test_u32_ops(self):
        out = run([push(2**32 + 5), Op("U32SPLIT")])
        assert out.stack[:2] == [5, 1]
        out = run([push(0xFFFFFFFF), push(2), Op("U32ADD")])
        assert out.stack[:2] == [1, 1]  # lo, carry
        out = run([push(7), push(3), Op("U32SUB")])  # a=7 (below), b=3 (top)
        assert out.stack[:2] == [0, 4]  # borrow, diff
        out = run([push(10), push(3), Op("U32DIV")])
        assert out.stack[:2] == [1, 3]  # rem, quot
        out = run([push(0b1100), push(0b1010), Op("U32AND")])
        assert out.stack[0] == 0b1000
        with pytest.raises(ExecutionError):
            run([push(2**33), push(1), Op("U32ADD")])

    def test_stack_manipulation(self):
        out = run([push(1), push(2), push(3), Op("MOVDN2")])
        # before: [3,2,1]; movdn2 → [2,1,3]
        assert out.stack[:3] == [2, 1, 3]
        out = run([push(1), push(2), Op("SWAP")])
        assert out.stack[:2] == [1, 2]
        out = run([push(9), Op("DUP0"), ADD])
        assert out.stack[0] == 18

    def test_overflow_underflow(self):
        # pushing 20 values then dropping all returns zeros from the bottom
        ops = [push(i) for i in range(20)] + [Op("DROP")] * 20
        out = run(ops)
        assert out.stack == [0] * 16

    def test_memory(self):
        out = run([push(42), push(100), Op("MSTORE"), Op("DROP"), push(100), Op("MLOAD")])
        assert out.stack[0] == 42

    def test_split_and_loop(self):
        forest = MastForest()
        t = forest.add_block([push(10)])
        f = forest.add_block([push(20)])
        split = forest.add_split(t, f)
        forest.make_root(split)
        assert execute(Program(forest, split), [1]).stack[0] == 10
        assert execute(Program(forest, split), [0]).stack[0] == 20

        # do-while loop (execution/loop.rs): body runs unconditionally,
        # leaves the re-entry condition on top; sum 1..n via counter
        forest2 = MastForest()
        body = forest2.add_block(
            # [acc, i] → [cond=(i-1 != 0), acc+i, i-1]
            [Op("DUP1"), ADD, Op("SWAP"), push(1), Op("NEG"), ADD, Op("SWAP"),
             Op("DUP1"), Op("EQZ"), Op("NOT")]
        )
        loop = forest2.add_loop(body)
        forest2.make_root(loop)
        out = execute(Program(forest2, loop), [0, 5])  # acc=0, i=5
        assert out.stack[0] == 15

    def test_hperm(self):
        state = list(range(12))
        out = run([push(v) for v in reversed(state)] + [Op("HPERM")])
        assert out.stack[:12] == hp.permute(state)

    def test_advice(self):
        adv = AdviceProvider(stack=[11, 22])
        out = run([Op("ADVPOP"), Op("ADVPOP"), ADD], advice=adv)
        assert out.stack[0] == 33

    def test_mpverify(self):
        leaves = [(i, i + 1, i + 2, i + 3) for i in range(0, 32, 4)]
        tree = MerkleTree(leaves)
        store = MerkleStore()
        store.extend(tree.inner_nodes())
        adv = AdviceProvider(store=store)
        # stack: [V, depth, index, R, ...] (crypto_ops/mod.rs:96-105)
        stack = list(leaves[2]) + [3, 2] + list(tree.root)
        out = run([Op("MPVERIFY")], stack=stack, advice=adv)
        assert out.stack[:4] == list(leaves[2])
        bad = list(leaves[3]) + [3, 2] + list(tree.root)
        with pytest.raises(ExecutionError):
            run([Op("MPVERIFY")], stack=bad, advice=adv)

    def test_call_context_isolation(self):
        # memory written in the caller's context is invisible inside call
        forest = MastForest()
        callee = forest.add_block([push(100), Op("MLOAD"), Op("SWAP"), Op("DROP")])
        call = forest.add_call(callee)
        store_then_call = forest.add_block(
            [push(42), push(100), Op("MSTORE"), Op("DROP")]
        )
        root = forest.add_join(store_then_call, call)
        forest.make_root(root)
        out = execute(Program(forest, root))
        assert out.stack[0] == 0  # fresh context reads 0

    def test_assertion(self):
        with pytest.raises(ExecutionError):
            run([push(0), Op("ASSERT", err_code=5)])
        out = run([push(1), Op("ASSERT")])
        assert out.stack == [0] * 16
