"""Stdlib: procedure locals, the u64 module, and sys procedures.

Mirrors the reference stdlib test strategy (crates/lib/core/tests/math/
u64_mod.rs): execute each public procedure against Python big-int ground
truth, including boundary values, plus an end-to-end prove/verify of a
u64-heavy program.
"""

from __future__ import annotations

import random

import pytest

from miden_tpu.stdlib import (
    assemble_with_stdlib,
    stdlib_event_handlers,
    stdlib_modules,
)
from miden_tpu.vm.assembler import AssemblyError, assemble
from miden_tpu.vm.processor import ExecutionError, execute

M32 = (1 << 32) - 1
M64 = (1 << 64) - 1


def limbs(v: int) -> list[int]:
    return [v & M32, v >> 32]


def run_u64(proc: str, inputs: list[int]) -> list[int]:
    src = f"use miden::core::math::u64\nbegin exec.u64::{proc} end"
    out = execute(
        assemble_with_stdlib(src),
        list(inputs),
        event_handlers=stdlib_event_handlers(),
    )
    return out.stack


PAIRS = [
    (0, 0),
    (1, 0),
    (0, 1),
    (M64, M64),
    (M64, 1),
    (1, M64),
    (1 << 32, (1 << 32) - 1),
    (1 << 63, 1 << 63),
    (12345678901234567890, 987654321098765432),
]
random.seed(7)
PAIRS += [(random.getrandbits(64), random.getrandbits(64)) for _ in range(6)]


class TestU64Arithmetic:
    def check(self, proc, ref):
        for a, b in PAIRS:
            exp = ref(a, b)
            if exp is None:
                continue
            got = list(run_u64(proc, limbs(b) + limbs(a))[: len(exp)])
            assert got == exp, (proc, hex(a), hex(b), got, exp)

    def test_add_family(self):
        self.check("wrapping_add", lambda a, b: limbs((a + b) & M64))
        self.check(
            "overflowing_add",
            lambda a, b: [int(a + b > M64)] + limbs((a + b) & M64),
        )
        self.check(
            "widening_add",
            lambda a, b: limbs((a + b) & M64) + [int(a + b > M64)],
        )

    def test_sub_family(self):
        self.check("wrapping_sub", lambda a, b: limbs((a - b) & M64))
        self.check(
            "overflowing_sub",
            lambda a, b: [int(a < b)] + limbs((a - b) & M64),
        )

    def test_mul_family(self):
        self.check("wrapping_mul", lambda a, b: limbs((a * b) & M64))
        self.check(
            "overflowing_mul",
            lambda a, b: [int(a * b > M64)] + limbs((a * b) & M64),
        )
        self.check(
            "widening_mul",
            lambda a, b: [(a * b >> (32 * i)) & M32 for i in range(4)],
        )

    def test_comparisons(self):
        self.check("lt", lambda a, b: [int(a < b)])
        self.check("gt", lambda a, b: [int(a > b)])
        self.check("lte", lambda a, b: [int(a <= b)])
        self.check("gte", lambda a, b: [int(a >= b)])
        self.check("eq", lambda a, b: [int(a == b)])
        self.check("neq", lambda a, b: [int(a != b)])
        self.check("min", lambda a, b: limbs(min(a, b)))
        self.check("max", lambda a, b: limbs(max(a, b)))

    def test_divmod(self):
        self.check("div", lambda a, b: limbs(a // b) if b else None)
        self.check("mod", lambda a, b: limbs(a % b) if b else None)
        self.check(
            "divmod",
            lambda a, b: limbs(a % b) + limbs(a // b) if b else None,
        )

    def test_div_by_zero_rejected(self):
        with pytest.raises(ExecutionError):
            run_u64("div", limbs(0) + limbs(5))

    def test_bitwise(self):
        self.check("and", lambda a, b: limbs(a & b))
        self.check("or", lambda a, b: limbs(a | b))
        self.check("xor", lambda a, b: limbs(a ^ b))

    def test_unary(self):
        vals = [0, 1, M64, 1 << 32, (1 << 32) - 1, 0xF0F0F0F0F0F0F0F0]
        unops = {
            "not": lambda a: limbs(a ^ M64),
            "eqz": lambda a: [int(a == 0)],
            "clz": lambda a: [64 - a.bit_length()],
            "ctz": lambda a: [(a & -a).bit_length() - 1 if a else 64],
            "clo": lambda a: [64 - (a ^ M64).bit_length()],
            "cto": lambda a: [
                ((w := a ^ M64) & -w).bit_length() - 1 if a != M64 else 64
            ],
        }
        for proc, ref in unops.items():
            for a in vals:
                exp = ref(a)
                got = list(run_u64(proc, limbs(a))[: len(exp)])
                assert got == exp, (proc, hex(a), got, exp)

    def test_shifts(self):
        vals = [0, 1, M64, 1 << 63, 0x123456789ABCDEF0]
        shops = {
            "shl": lambda a, n: limbs((a << n) & M64),
            "shr": lambda a, n: limbs(a >> n),
            "rotl": lambda a, n: limbs(
                ((a << n) | (a >> (64 - n))) & M64 if n else a
            ),
            "rotr": lambda a, n: limbs(
                ((a >> n) | (a << (64 - n))) & M64 if n else a
            ),
        }
        for proc, ref in shops.items():
            for a in vals:
                for n in (0, 1, 31, 32, 33, 63):
                    got = list(run_u64(proc, [n] + limbs(a))[:2])
                    assert got == ref(a, n), (proc, hex(a), n)


class TestU32ClzFamily:
    def test_against_ground_truth(self):
        refs = {
            "u32clz": lambda v: 32 - v.bit_length(),
            "u32ctz": lambda v: ((v & -v).bit_length() - 1) if v else 32,
            "u32clo": lambda v: 32 - ((~v) & M32).bit_length(),
            "u32cto": lambda v: (
                ((w := (~v) & M32) & -w).bit_length() - 1 if v != M32 else 32
            ),
        }
        vals = [0, 1, 2, 3, 1 << 31, M32, 0x00F0F000, 0x7FFFFFFE]
        for instr, ref in refs.items():
            for v in vals:
                out = execute(assemble(f"begin push.{v} {instr} end"))
                assert out.stack[0] == ref(v), (instr, v)

    def test_bad_advice_rejected(self):
        """A lying host (wrong clz hint) must make verification trap."""
        from miden_tpu.vm.events import SYSTEM_EVENT_IDS

        def lying(processor):
            processor.advice.stack.insert(0, 3)  # clz(2^31) is 0, not 3

        prog = assemble("begin push.2147483648 u32clz end")
        with pytest.raises(ExecutionError):
            execute(
                prog,
                event_handlers={SYSTEM_EVENT_IDS["sys::u32_clz"]: lying},
            )


class TestProcedureLocals:
    def test_store_load_roundtrip(self):
        src = """
        @locals(6)
        proc scratch
            loc_store.0
            loc_store.5
            loc_load.0 loc_load.5 add
            locaddr.0 locaddr.5 swap sub
        end
        begin push.7 push.35 exec.scratch swap end
        """
        out = execute(assemble(src))
        assert out.stack[0] == 42
        assert out.stack[1] == 5  # locals are 5 addresses apart

    def test_word_locals(self):
        src = """
        @locals(8)
        proc wordy
            loc_storew_le.0 dropw
            loc_storew_le.4 dropw
            padw loc_loadw_le.0
            padw loc_loadw_le.4
        end
        begin
            push.1 push.2 push.3 push.4
            push.5 push.6 push.7 push.8
            exec.wordy
        end
        """
        out = execute(assemble(src))
        assert out.stack[:8] == [4, 3, 2, 1, 8, 7, 6, 5]

    def test_nested_frames(self):
        src = """
        @locals(1)
        proc inner
            loc_store.0
            loc_load.0 loc_load.0 mul
        end
        @locals(2)
        proc outer
            loc_store.0 loc_store.1
            loc_load.0 exec.inner
            loc_load.1 exec.inner
            add
        end
        begin push.3 push.4 exec.outer end
        """
        out = execute(assemble(src))
        assert out.stack[0] == 3 * 3 + 4 * 4

    def test_local_out_of_range(self):
        src = """
        @locals(2)
        proc p
            loc_load.2
        end
        begin exec.p end
        """
        with pytest.raises(AssemblyError):
            assemble(src)

    def test_locals_in_called_context(self):
        """Locals work inside a `call` (fresh memory context, fmp from 0)."""
        src = """
        @locals(2)
        proc helper
            loc_store.0 loc_store.1
            loc_load.0 loc_load.1 add
        end
        proc callee
            exec.helper swap drop swap drop swap drop
        end
        begin push.10 push.32 call.callee end
        """
        out = execute(assemble(src))
        assert out.stack[0] == 42


class TestSysModule:
    def test_truncate_stack(self):
        src = """
        use miden::core::sys
        begin
            push.101 push.102 push.103 push.104 push.105 push.106
            exec.sys::truncate_stack
        end
        """
        out = execute(assemble_with_stdlib(src))
        assert out.stack[:6] == [106, 105, 104, 103, 102, 101]

    def test_drop_stack_top(self):
        src = """
        use miden::core::sys
        begin
            push.5 push.6
            exec.sys::drop_stack_top
        end
        """
        out = execute(assemble_with_stdlib(src))
        assert out.stack == [0] * 16


class TestStdlibRegistry:
    def test_modules_discovered(self):
        mods = stdlib_modules()
        assert "miden::core::math::u64" in mods
        assert "miden::core::sys" in mods


@pytest.mark.slow
def test_u64_program_proves_e2e():
    """End-to-end: prove and verify a program exercising u64 stdlib ops
    (mul, add, divmod) — the VERDICT round-1 'done' criterion for stdlib."""
    from miden_tpu.stark.params import TEST_PARAMS
    from miden_tpu.vm.prove import prove_program, verify_program

    src = """
    use miden::core::math::u64
    use miden::core::sys
    begin
        push.0xCAFE push.0xDEADBEEF
        push.0x9ABC push.0x12345678
        exec.u64::wrapping_mul
        push.0 push.12345
        exec.u64::wrapping_add
        push.0 push.1000003
        exec.u64::divmod
        exec.u64::wrapping_add
        exec.sys::truncate_stack
    end
    """
    prog = assemble_with_stdlib(src)
    a = (0xCAFE << 32) | 0xDEADBEEF
    b = (0x9ABC << 32) | 0x12345678
    c = ((a * b) & M64) + 12345
    q, r = divmod(c, 1000003)
    expect = (q + r) & M64
    out, proof = prove_program(
        prog, params=TEST_PARAMS, event_handlers=stdlib_event_handlers()
    )
    assert out.stack[0] == expect & M32
    assert out.stack[1] == expect >> 32
    verify_program(proof, params=TEST_PARAMS)


# ---------------------------------------------------------------------------
# word module
# ---------------------------------------------------------------------------

WORDS = [
    ((0, 0, 0, 0), (0, 0, 0, 0)),
    ((1, 2, 3, 4), (1, 2, 3, 4)),
    ((1, 2, 3, 4), (1, 2, 3, 5)),
    ((5, 2, 3, 4), (1, 2, 3, 4)),
    ((9, 9, 9, 1), (1, 1, 1, 2)),
    ((M64 - 1, 0, 0, 0), (0, M64 - 1, 0, 0)),
    ((7, 7, 7, 7), (7, 7, 7, 8)),
]


def _word_key(w):
    # most-significant element first (Merkle key order)
    return tuple(reversed(w))


def run_word(proc: str, stack_inputs: list[int]) -> list[int]:
    src = f"use miden::core::word\nbegin exec.word::{proc} end"
    out = execute(assemble_with_stdlib(src), stack_inputs)
    return out.stack


def _push_words(rhs, lhs):
    # stack inputs list: index 0 = top of stack = r0
    return list(rhs) + list(lhs)


@pytest.mark.parametrize("rhs,lhs", WORDS)
def test_word_comparisons(rhs, lhs):
    for proc, expect in (
        ("gt", _word_key(lhs) > _word_key(rhs)),
        ("gte", _word_key(lhs) >= _word_key(rhs)),
        ("lt", _word_key(lhs) < _word_key(rhs)),
        ("lte", _word_key(lhs) <= _word_key(rhs)),
        ("eq", lhs == rhs),
    ):
        got = run_word(proc, _push_words(rhs, lhs))
        assert got[0] == int(expect), (proc, rhs, lhs, got[:2])


def test_word_test_eq_preserves():
    rhs, lhs = (1, 2, 3, 4), (1, 2, 3, 4)
    got = run_word("test_eq", _push_words(rhs, lhs))
    assert got[0] == 1
    assert tuple(got[1:5]) == rhs and tuple(got[5:9]) == lhs
    got = run_word("test_eq", _push_words((9, 2, 3, 4), lhs))
    assert got[0] == 0


def test_word_eqz_testz_reverse():
    assert run_word("eqz", [0, 0, 0, 0])[0] == 1
    assert run_word("eqz", [0, 0, 1, 0])[0] == 0
    got = run_word("testz", [0, 0, 0, 0])
    assert got[0] == 1 and got[1:5] == [0, 0, 0, 0]
    got = run_word("reverse", [1, 2, 3, 4])
    assert got[0:4] == [4, 3, 2, 1]


def test_word_store_u32s_le():
    src = (
        "use miden::core::word\n"
        "begin push.100 movdn.4 exec.word::store_word_u32s_le "
        "push.100 mem_load push.101 mem_load push.104 mem_load "
        "push.107 mem_load end"
    )
    a = (5 << 32) | 7
    b = 11
    c = (1 << 63)
    d = M64 - (1 << 32)
    out = execute(assemble_with_stdlib(src), [a, b, c, d])
    # loaded: [mem[107], mem[104], mem[101], mem[100], ...]
    assert out.stack[3] == a & M32  # w0_lo at ptr
    assert out.stack[2] == a >> 32  # w0_hi at ptr+1
    assert out.stack[1] == c & M32  # w2_lo at ptr+4
    assert out.stack[0] == d >> 32  # w3_hi at ptr+7


# ---------------------------------------------------------------------------
# mem module
# ---------------------------------------------------------------------------


def test_memcopy_words_and_elements():
    src = (
        "use miden::core::mem\n"
        "begin "
        # write two words at 1000.. then copy to 2000..
        "push.1.2.3.4 push.1000 mem_storew_le dropw "
        "push.5.6.7.8 push.1004 mem_storew_le dropw "
        "push.2000 push.1000 push.2 exec.mem::memcopy_words "
        "push.2000 mem_load push.2005 mem_load "
        # element copy: 3 elements 1000 -> 3000
        "push.3000 push.1000 push.3 exec.mem::memcopy_elements "
        "push.3002 mem_load "
        "end"
    )
    out = execute(assemble_with_stdlib(src))
    # push.1.2.3.4 leaves 4 on top => memory[1000..1004] = [4,3,2,1]
    assert out.stack[2] == 4  # mem[2000]
    assert out.stack[1] == 7  # mem[2005] = mem[1005]
    assert out.stack[0] == 2  # mem[3002]


def test_memcopy_rejects_overlap():
    src = (
        "use miden::core::mem\n"
        "begin push.1002 push.1000 push.2 exec.mem::memcopy_words end"
    )
    with pytest.raises(ExecutionError):
        execute(assemble_with_stdlib(src))


# ---------------------------------------------------------------------------
# u128 module
# ---------------------------------------------------------------------------

M128 = (1 << 128) - 1


def limbs128(v: int) -> list[int]:
    return [(v >> (32 * i)) & M32 for i in range(4)]


def run_u128(proc: str, b: int, a: int, unary=False) -> list[int]:
    src = f"use miden::core::math::u128\nbegin exec.u128::{proc} end"
    inputs = limbs128(b) if unary else limbs128(b) + limbs128(a)
    return execute(assemble_with_stdlib(src), inputs).stack


U128_PAIRS = [
    (0, 0),
    (1, 0),
    (0, 1),
    (M128, M128),
    (M128, 1),
    (1, M128),
    (1 << 64, (1 << 64) - 1),
    (1 << 127, 1 << 127),
    (0xDEADBEEF_CAFEBABE_12345678_9ABCDEF0, 0x0F1E2D3C_4B5A6978_87A9CBED_FEDCBA98),
    ((1 << 96) - 1, (1 << 32) + 5),
]


@pytest.mark.parametrize("b,a", U128_PAIRS)
def test_u128_add_sub_mul(b, a):
    got = run_u128("overflowing_add", b, a)
    total = a + b
    assert got[0] == (total >> 128) and got[1:5] == limbs128(total & M128)
    got = run_u128("wrapping_add", b, a)
    assert got[0:4] == limbs128(total & M128)
    got = run_u128("widening_add", b, a)
    assert got[0:4] == limbs128(total & M128) and got[4] == (total >> 128)

    diff = a - b
    got = run_u128("overflowing_sub", b, a)
    assert got[0] == int(diff < 0) and got[1:5] == limbs128(diff & M128)
    got = run_u128("wrapping_sub", b, a)
    assert got[0:4] == limbs128(diff & M128)

    got = run_u128("wrapping_mul", b, a)
    assert got[0:4] == limbs128((a * b) & M128), (hex(a), hex(b))


@pytest.mark.parametrize("b,a", U128_PAIRS)
def test_u128_comparisons(b, a):
    for proc, expect in (
        ("eq", a == b), ("neq", a != b), ("lt", a < b), ("gt", a > b),
        ("lte", a <= b), ("gte", a >= b),
    ):
        got = run_u128(proc, b, a)
        assert got[0] == int(expect), (proc, hex(a), hex(b), got[:2])
    got = run_u128("min", b, a)
    assert got[0:4] == limbs128(min(a, b))
    got = run_u128("max", b, a)
    assert got[0:4] == limbs128(max(a, b))


@pytest.mark.parametrize("b,a", U128_PAIRS)
def test_u128_bitwise(b, a):
    for proc, expect in (
        ("and", a & b), ("or", a | b), ("xor", a ^ b),
    ):
        got = run_u128(proc, b, a)
        assert got[0:4] == limbs128(expect), proc
    got = run_u128("not", a, 0, unary=True)
    assert got[0:4] == limbs128(a ^ M128)
    got = run_u128("eqz", a, 0, unary=True)
    assert got[0] == int(a == 0)


# ---------------------------------------------------------------------------
# u256 module
# ---------------------------------------------------------------------------

M256 = (1 << 256) - 1


def limbs256(v: int) -> list[int]:
    return [(v >> (32 * i)) & M32 for i in range(8)]


def run_u256(proc: str, b: int, a: int, unary=False) -> list[int]:
    src = f"use miden::core::math::u256\nbegin exec.u256::{proc} end"
    inputs = limbs256(b) if unary else limbs256(b) + limbs256(a)
    return execute(assemble_with_stdlib(src), inputs).stack


U256_PAIRS = [
    (0, 0),
    (1, 0),
    (M256, M256),
    (M256, 1),
    (1 << 128, (1 << 128) - 1),
    (1 << 255, 1 << 255),
    (0xDEADBEEF_CAFEBABE_12345678_9ABCDEF0_0F1E2D3C_4B5A6978_87A9CBED_FEDCBA98,
     0x01234567_89ABCDEF_FEDCBA98_76543210_DEADC0DE_8BADF00D_0D15EA5E_CAFED00D),
    ((1 << 224) - 1, (1 << 32) + 5),
]


@pytest.mark.parametrize("b,a", U256_PAIRS)
def test_u256_add_sub_mul(b, a):
    total = a + b
    got = run_u256("overflowing_add", b, a)
    assert got[0] == (total >> 256)
    assert got[1:9] == limbs256(total & M256)
    got = run_u256("wrapping_add", b, a)
    assert got[0:8] == limbs256(total & M256)

    diff = a - b
    got = run_u256("overflowing_sub", b, a)
    assert got[0] == int(diff < 0) and got[1:9] == limbs256(diff & M256)
    got = run_u256("wrapping_sub", b, a)
    assert got[0:8] == limbs256(diff & M256)

    got = run_u256("wrapping_mul", b, a)
    assert got[0:8] == limbs256((a * b) & M256), (hex(a), hex(b))


@pytest.mark.parametrize("b,a", U256_PAIRS)
def test_u256_comparisons_bitwise(b, a):
    for proc, expect in (
        ("eq", a == b), ("neq", a != b), ("lt", a < b), ("gt", a > b),
        ("lte", a <= b), ("gte", a >= b),
    ):
        got = run_u256(proc, b, a)
        assert got[0] == int(expect), (proc, hex(a), hex(b))
    for proc, expect in (("and", a & b), ("or", a | b), ("xor", a ^ b)):
        got = run_u256(proc, b, a)
        assert got[0:8] == limbs256(expect), proc
    got = run_u256("not", a, 0, unary=True)
    assert got[0:8] == limbs256(a ^ M256)
    got = run_u256("eqz", a, 0, unary=True)
    assert got[0] == int(a == 0)


# ---------------------------------------------------------------------------
# crypto::hashes::keccak256 (precompile-backed)
# ---------------------------------------------------------------------------


def limbs256(v):  # noqa: F811 - shared helper shape with u256 tests
    return [(v >> (32 * i)) & M32 for i in range(8)]


def test_keccak256_merge_digest_and_deferred_root():
    """merge returns Keccak256(L || R) as LE u32 limbs and folds the
    matching precompile claim into the deferred root."""
    from miden_tpu.hash.keccak_host import keccak256
    from miden_tpu.precompile import Keccak256Claim, deferred_root_for

    a = 0x1122_DEAD_BEEF_0055_AA77 | (1 << 250)
    b = (1 << 255) | 0xF00D
    src = (
        "use miden::core::crypto::hashes::keccak256\n"
        "begin exec.keccak256::merge end"
    )
    # stack inputs are top-first: l limb 0 on top, r limbs below
    inputs = limbs256(a) + limbs256(b)
    out = execute(
        assemble_with_stdlib(src),
        inputs,
        event_handlers=stdlib_event_handlers(),
    )
    msg = a.to_bytes(32, "little") + b.to_bytes(32, "little")
    want = int.from_bytes(keccak256(msg), "little")
    assert list(out.stack[0:8]) == limbs256(want)
    assert tuple(out.deferred_root) == deferred_root_for(
        [Keccak256Claim(a=a, b=b)]
    )


def test_poseidon2_stdlib_module():
    """hash/merge/merge_in_domain/permute match the host Poseidon2."""
    from miden_tpu.hash import poseidon2_host as hp

    def run(proc, inputs):
        src = (
            "use miden::core::crypto::hashes::poseidon2\n"
            f"begin exec.poseidon2::{proc} end"
        )
        return execute(
            assemble_with_stdlib(src),
            inputs,
            event_handlers=stdlib_event_handlers(),
        ).stack

    a = [5, 6, 7, 8]  # word A, element at position 0 on top
    b = [9, 10, 11, 12]

    got = run("hash", list(a))
    want = hp.hash_elements_padded(a)
    assert list(got[0:4]) == list(want), (got[0:4], want)

    got = run("merge", list(a) + list(b))
    assert list(got[0:4]) == list(hp.merge(a, b))

    dom = 7
    got = run("merge_in_domain", [dom, *a, *b])
    assert list(got[0:4]) == list(hp.merge_in_domain(a, b, dom))

    state = list(range(1, 13))
    got = run("permute", list(state))
    assert list(got[0:12]) == list(hp.permute(state))

    got = run("init_no_padding", [42])
    assert list(got[0:13]) == [0] * 12 + [42]

    got = run("squeeze_digest", list(range(1, 13)))
    assert list(got[0:4]) == [1, 2, 3, 4]


def test_debug_module_prints_state(capfd):
    """miden::core::debug procedures emit host print events without
    disturbing execution (debug.masm; reference crates/lib/core/asm/
    debug.masm)."""
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.processor import execute

    src = (
        "use miden::core::debug\n"
        "begin "
        "push.7.8.9.10 push.48 mem_storew_le dropw "
        "exec.debug::print_stack "
        "push.56.48 exec.debug::print_mem "
        "exec.debug::print_mem_all "
        "push.0 exec.debug::print_adv_stack "
        "push.42 "
        "end"
    )
    out = execute(
        assemble_with_stdlib(src), [], event_handlers=stdlib_event_handlers()
    )
    assert int(out.stack[0]) == 42
    err = capfd.readouterr().err
    assert "[debug] stack" in err
    assert "mem[48..52] = [10, 9, 8, 7]" in err
    assert "advice stack" in err


def test_aead_masm_encrypt_decrypt():
    """crypto::aead matches the host AeadPoseidon2 (MonkeySpongeWrap):
    in-VM encrypt reproduces ciphertext + tag; decrypt pipes the
    host-decrypted plaintext and re-authenticates in-VM."""
    import pytest as _pytest

    from miden_tpu.crypto.aead import AeadPoseidon2, _pad
    from miden_tpu.stdlib import assemble_with_stdlib, stdlib_event_handlers
    from miden_tpu.vm.processor import ExecutionError, execute

    key = [11, 22, 33, 44]
    nonce = (55, 66, 77, 88)
    data = [101, 202, 303, 404, 505, 606, 707, 808, 909, 1010]  # 2 blocks
    aead = AeadPoseidon2(key)
    enc = aead.encrypt_elements(data, nonce=nonce)
    padded = _pad(data)
    n_blocks = len(padded) // 8

    def store_elems(vals, base):
        out = []
        for w in range(0, len(vals), 4):
            v = vals[w : w + 4]
            out.append(
                f"push.{v[3]}.{v[2]}.{v[1]}.{v[0]} push.{base + w} "
                "mem_storew_le dropw"
            )
        return " ".join(out)

    def pushw(vals):
        return f"push.{vals[3]}.{vals[2]}.{vals[1]}.{vals[0]}"

    src_enc = (
        "use miden::core::crypto::aead\n"
        "begin "
        + store_elems(padded, 200)
        + f" push.{n_blocks} push.300 push.200 "
        + pushw(list(nonce))
        + " "
        + pushw(key)
        + " exec.aead::encrypt end"
    )
    out = execute(
        assemble_with_stdlib(src_enc), [], event_handlers=stdlib_event_handlers()
    )
    assert [int(v) for v in out.stack[0:4]] == [int(v) for v in enc.auth_tag]
    ct = []
    for w in range(0, 8 * n_blocks, 4):
        ct.extend(int(v) for v in out.memory[(0, 300 + w)])
    assert ct == [int(v) for v in enc.ciphertext]

    src_dec = (
        "use miden::core::crypto::aead\n"
        "begin "
        + store_elems([int(v) for v in enc.ciphertext], 400)
        + f" push.{n_blocks} push.500 push.400 "
        + pushw([int(v) for v in enc.auth_tag])
        + " "
        + pushw(list(nonce))
        + " "
        + pushw(key)
        + " exec.aead::decrypt end"
    )
    out = execute(
        assemble_with_stdlib(src_dec), [], event_handlers=stdlib_event_handlers()
    )
    plain = []
    for w in range(0, 8 * n_blocks, 4):
        plain.extend(int(v) for v in out.memory[(0, 500 + w)])
    assert plain == padded

    # tampered tag: the host authenticator rejects
    bad = src_dec.replace(
        pushw([int(v) for v in enc.auth_tag]),
        pushw([int(enc.auth_tag[0]) ^ 1, *[int(v) for v in enc.auth_tag[1:]]]),
        1,
    )
    with _pytest.raises(ExecutionError):
        execute(
            assemble_with_stdlib(bad), [], event_handlers=stdlib_event_handlers()
        )
