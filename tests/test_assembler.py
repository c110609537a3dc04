"""Assembler tests: MASM source → MAST → execution, validated against the
reference's instruction lowering semantics (crates/assembly/src/instruction/)
and the masm-examples programs."""

import pytest

from miden_tpu.field import gl
from miden_tpu.hash import poseidon2_host as hp
from miden_tpu.merkle import MerkleStore, MerkleTree
from miden_tpu.vm import (
    AdviceProvider,
    Assembler,
    AssemblyError,
    ExecutionError,
    assemble,
    execute,
)

P = gl.P


def run(source, stack=None, advice=None, **kw):
    return execute(assemble(source), stack or [], advice, **kw)


class TestBasics:
    def test_fib(self):
        # miden-vm/masm-examples/fib/fib.masm (1001st Fibonacci number)
        src = """
        begin
            repeat.1000
                swap dup.1 add
            end
        end
        """
        out = run(src, [1, 0])  # top=1, then 0
        a, b = 0, 1
        for _ in range(1000):
            a, b = b, (a + b) % P
        assert out.stack[0] == b  # top after n iterations = F(n+1)

    def test_arithmetic_immediates(self):
        out = run("begin push.5 add.2 mul.3 sub.1 div.4 end")
        # ((5+2)*3 - 1) / 4 = 5
        assert out.stack[0] == 5

    def test_comparisons(self):
        out = run("begin push.3 push.7 lt push.3 push.7 gt push.5 push.5 lte end")
        assert out.stack[:3] == [1, 0, 1]
        # comparisons on >32-bit values exercise the split paths
        big_a, big_b = P - 5, P - 3
        out = run(f"begin push.{big_a} push.{big_b} lt end")
        assert out.stack[0] == 1
        out = run(f"begin push.{big_b} push.{big_a} gte end")
        assert out.stack[0] == 1

    def test_pow2_exp(self):
        out = run("begin push.13 pow2 end")
        assert out.stack[0] == 1 << 13
        out = run("begin push.3 exp.5 end")
        assert out.stack[0] == 3**5
        out = run("begin push.7 push.20 exp end")
        assert out.stack[0] == pow(7, 20, P)

    def test_xor_and_bool(self):
        out = run("begin push.1 push.0 xor push.1 push.1 xor end")
        assert out.stack[:2] == [0, 1]

    def test_is_odd(self):
        out = run("begin push.7 is_odd push.8 is_odd end")
        assert out.stack[:2] == [0, 1]

    def test_eqw(self):
        out = run("begin push.1.2.3.4 push.1.2.3.4 eqw end")
        assert out.stack[0] == 1


class TestU32:
    def test_u32_arith_modes(self):
        out = run("begin push.4000000000 push.1000000000 u32overflowing_add end")
        assert out.stack[:2] == [1, (5000000000) % (1 << 32)]
        out = run("begin push.4000000000 push.1000000000 u32wrapping_add end")
        assert out.stack[0] == 5000000000 % (1 << 32)
        out = run("begin push.10 u32wrapping_sub.3 end")
        assert out.stack[0] == 7
        out = run("begin push.100000 u32widening_mul.100000 end")
        r = 100000 * 100000
        assert out.stack[:2] == [r & 0xFFFFFFFF, r >> 32]

    def test_u32_div_mod(self):
        out = run("begin push.17 u32div.5 push.17 u32mod.5 push.17 u32divmod.5 end")
        assert out.stack[:4] == [2, 3, 2, 3]

    def test_u32_shifts(self):
        out = run("begin push.1 u32shl.4 push.256 u32shr.3 end")
        assert out.stack[:2] == [32, 16]
        out = run("begin push.1 push.31 u32shl end")
        assert out.stack[0] == 1 << 31
        out = run("begin push.2147483648 u32rotl.1 push.1 u32rotr.1 end")
        assert out.stack[:2] == [1 << 31, 1]

    def test_u32_bitwise(self):
        out = run("begin push.12 push.10 u32and push.12 push.10 u32or push.12 push.10 u32xor end")
        assert out.stack[:3] == [6, 14, 8]
        out = run("begin push.0 u32not end")
        assert out.stack[0] == 0xFFFFFFFF

    def test_u32_popcnt(self):
        out = run("begin push.3735928559 u32popcnt end")
        assert out.stack[0] == bin(3735928559).count("1")

    def test_u32_cmp_minmax(self):
        out = run("begin push.3 push.7 u32lt push.3 push.7 u32gt end")
        assert out.stack[:2] == [0, 1]  # gt(3,7)=0 on top? see below
        # stack [b=7, a=3]: u32lt → a<b = 1; then gt → 0
        assert out.stack[1] == 1
        out = run("begin push.3 push.7 u32min push.3 push.7 u32max end")
        assert out.stack[:2] == [7, 3]

    def test_u32_test_assert(self):
        # u32test leaves the tested value on the stack under the flag
        out = run(f"begin push.{2**40} u32test push.5 u32test end")
        assert out.stack[0] == 1 and out.stack[2] == 0
        out = run(f"begin push.{2**40} u32cast end")
        assert out.stack[0] == 2**40 % (1 << 32)
        with pytest.raises(ExecutionError):
            run(f"begin push.{2**40} u32assert end")


class TestControlFlow:
    def test_if_else(self):
        src = "begin if.true push.10 else push.20 end end"
        assert run(src, [1]).stack[0] == 10
        assert run(src, [0]).stack[0] == 20

    def test_if_no_else(self):
        src = "begin if.true push.1 add end end"
        assert run(src, [1, 5]).stack[0] == 6
        assert run(src, [0, 5]).stack[0] == 5

    def test_nested_if(self):
        src = """
        begin
            if.true
                if.true push.1 else push.2 end
            else
                if.true push.3 else push.4 end
            end
        end
        """
        # outer condition is on top; inner condition underneath
        assert run(src, [1, 1]).stack[0] == 1
        assert run(src, [1, 0]).stack[0] == 2
        assert run(src, [0, 1]).stack[0] == 3
        assert run(src, [0, 0]).stack[0] == 4

    def test_while(self):
        # sum 1..=n: stack [n]; acc under it
        src = """
        begin
            dup neq.0
            while.true
                swap dup.1 add swap
                sub.1 dup neq.0
            end
            drop
        end
        """
        out = run(src, [5, 0])
        assert out.stack[0] == 15

    def test_repeat_nested(self):
        src = "begin repeat.3 repeat.4 push.1 add end end end"
        out = run(src, [0])
        assert out.stack[0] == 12


class TestProcedures:
    def test_exec(self):
        src = """
        proc double
            dup add
        end
        begin
            push.21 exec.double
        end
        """
        assert run(src).stack[0] == 42

    def test_exec_chain(self):
        src = """
        proc sq
            dup mul
        end
        proc quad
            exec.sq exec.sq
        end
        begin push.2 exec.quad end
        """
        assert run(src).stack[0] == 16

    def test_call_isolates_context(self):
        src = """
        proc reader
            push.100 mem_load swap drop
        end
        begin
            push.42 mem_store.100
            call.reader
        end
        """
        assert run(src).stack[0] == 0  # fresh memory context inside call

    def test_module_import(self):
        asm = Assembler()
        asm.add_module(
            "my::math",
            """
            pub proc triple(x: felt) -> felt
                push.3 mul
            end
            """,
        )
        program = asm.assemble_program(
            """
            use my::math
            begin push.7 exec.math::triple end
            """
        )
        assert execute(program).stack[0] == 21

    def test_const(self):
        src = """
        const FOO = 12
        const BAR = 0x10
        begin push.FOO push.BAR add end
        """
        assert run(src).stack[0] == 28

    def test_unknown_instruction(self):
        with pytest.raises(AssemblyError):
            assemble("begin frobnicate end")


class TestCryptoAndAdvice:
    def test_hmerge_matches_host(self):
        # stack [A, B] (A on top) → digest = merge(A, B)
        a = [1, 2, 3, 4]
        b = [5, 6, 7, 8]
        src = f"begin push.{'.'.join(map(str, reversed(b)))} push.{'.'.join(map(str, reversed(a)))} hmerge end"
        out = run(src)
        assert out.stack[:4] == hp.merge(a, b)

    def test_hash_1to1(self):
        a = [9, 8, 7, 6]
        src = f"begin push.{'.'.join(map(str, reversed(a)))} hash end"
        out = run(src)
        assert out.stack[:4] == hp.hash_elements_padded(a)

    def test_mtree_get(self):
        leaves = [(i, 0, 0, 0) for i in range(8)]
        tree = MerkleTree(leaves)
        store = MerkleStore()
        store.extend(tree.inner_nodes())
        adv = AdviceProvider(store=store)
        root = ".".join(str(x) for x in reversed(tree.root))
        # stack wants [d, i, R]: push root first, then index, then depth
        src = f"begin push.{root} push.5 push.3 mtree_get end"
        out = run(src, advice=adv)
        assert out.stack[:4] == [5, 0, 0, 0]
        assert out.stack[4:8] == list(tree.root)

    def test_adv_mapval(self):
        key = (1, 2, 3, 4)
        adv = AdviceProvider(map={key: [10, 20, 30]})
        src = "begin push.4.3.2.1 adv.push_mapval adv_push.3 end"
        out = run(src, advice=adv)
        assert out.stack[:3] == [30, 20, 10]

    def test_event_const(self):
        src = """
        const MY_EVENT = event("my::custom_event")
        begin push.MY_EVENT end
        """
        from miden_tpu.vm import event_id

        assert run(src).stack[0] == event_id("my::custom_event")

    def test_assert_with_error_message(self):
        src = 'begin assert.err="value must be set" end'
        with pytest.raises(ExecutionError):
            run(src, [0])
        assert run(src, [1]).stack == [0] * 16
