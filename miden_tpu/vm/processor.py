"""MAST interpreter: executes programs and produces execution outputs.

Behavioral spec: processor/src/ — the FastProcessor interpreter loop
(fast/mod.rs:102, continuation-stack dispatch over MAST nodes) and the
per-operation semantics under execution/operations/ (cited per handler).
This is the host-side oracle of the TPU framework: it runs programs and
(next milestones) records the replay logs that the device-side trace
builder consumes.

Conventions:
  - operand stack: index 0 = top; depth never drops below 16 (zeros shift
    in at the bottom once the overflow table is empty — fast/mod.rs:38).
  - `call`/`syscall` start a new execution context: fresh memory context,
    operand stack truncated to 16 with the overflow saved for the return
    (fast/mod.rs execution contexts).
  - memory: element-addressable u32 addresses; word accesses must be
    4-aligned (fast/memory.rs:244 split_addr).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..field import gl
from ..hash import poseidon2_host as hp
from ..merkle import MerkleStore, NodeIndex
from .mast import (
    BasicBlockNode,
    CallNode,
    DynNode,
    ExternalNode,
    JoinNode,
    LoopNode,
    Program,
    SplitNode,
)
from .ops import Op

P = gl.P
U32_MAX = 0xFFFFFFFF
MIN_STACK_DEPTH = 16


class ExecutionError(Exception):
    pass


@dataclass
class AdviceProvider:
    """Nondeterministic inputs (processor/src/host/advice/mod.rs): a stack,
    a map of word→values, and a MerkleStore."""

    stack: list[int] = field(default_factory=list)  # index 0 popped first
    map: dict[tuple, list[int]] = field(default_factory=dict)
    store: MerkleStore = field(default_factory=MerkleStore)

    def pop_stack(self) -> int:
        if not self.stack:
            raise ExecutionError("advice stack is empty")
        return self.stack.pop(0)

    def pop_stack_word(self) -> list[int]:
        if len(self.stack) < 4:
            raise ExecutionError("advice stack underflow (word)")
        w = self.stack[:4]
        del self.stack[:4]
        return w


@dataclass
class StackInputs:
    """Initial operand stack; element 0 is the top (core/src/program/)."""

    values: list[int]

    def __post_init__(self):
        if len(self.values) > MIN_STACK_DEPTH:
            raise ExecutionError("too many stack inputs")
        self.values = [v % P for v in self.values]


@dataclass
class ExecutionOutput:
    stack: list[int]  # top first, padded to 16
    advice: AdviceProvider
    memory: dict
    clk: int


class Processor:
    """Iterative MAST executor."""

    def __init__(
        self,
        program: Program,
        stack_inputs: StackInputs | None = None,
        advice: AdviceProvider | None = None,
        max_cycles: int = 1 << 29,
        event_handlers: dict | None = None,
    ):
        self.program = program
        self.forest = program.forest
        inputs = (stack_inputs or StackInputs([])).values
        self.stack: list[int] = list(inputs) + [0] * (MIN_STACK_DEPTH - len(inputs))
        self.advice = advice or AdviceProvider()
        self.memory: dict[tuple[int, int], list[int]] = {}  # (ctx, word_addr) -> word
        self.ctx = 0
        self._next_ctx = 1
        self.clk = 0
        self.max_cycles = max_cycles
        self.event_handlers = event_handlers or {}  # id → fn(processor)
        self.fn_hash = (0, 0, 0, 0)
        self.caller_hash = (0, 0, 0, 0)
        self._ctx_stack: list[tuple] = []  # saved (ctx, overflow, fn_hash, caller_hash)

    # -- stack helpers ------------------------------------------------------

    def _push(self, v: int) -> None:
        self.stack.insert(0, v % P)

    def _drop(self, n: int = 1) -> None:
        for _ in range(n):
            del self.stack[0]
            if len(self.stack) < MIN_STACK_DEPTH:
                self.stack.append(0)

    def _u32(self, idx: int) -> int:
        v = self.stack[idx]
        if v > U32_MAX:
            raise ExecutionError(f"stack[{idx}] = {v} is not a u32")
        return v

    # -- execution ----------------------------------------------------------

    def execute(self) -> ExecutionOutput:
        self._execute_node(self.program.entrypoint)
        return ExecutionOutput(
            stack=list(self.stack[:MIN_STACK_DEPTH]),
            advice=self.advice,
            memory=self.memory,
            clk=self.clk,
        )

    def _tick(self, n: int = 1) -> None:
        self.clk += n
        if self.clk > self.max_cycles:
            raise ExecutionError("max cycles exceeded")

    def _execute_node(self, node_id: int) -> None:
        node = self.forest[node_id]
        if isinstance(node, BasicBlockNode):
            self._tick()  # SPAN
            for i, batch in enumerate(node.batches):
                if i > 0:
                    self._tick()  # RESPAN
                for op in batch.ops:
                    self._execute_op(op)
                    self._tick()
            self._tick()  # END
        elif isinstance(node, JoinNode):
            self._tick()
            self._execute_node(node.children[0])
            self._execute_node(node.children[1])
            self._tick()
        elif isinstance(node, SplitNode):
            self._tick()
            cond = self.stack[0]
            self._drop()
            if cond == 1:
                self._execute_node(node.children[0])
            elif cond == 0:
                self._execute_node(node.children[1])
            else:
                raise ExecutionError(f"split condition {cond} is not binary")
            self._tick()
        elif isinstance(node, LoopNode):
            self._tick()
            cond = self.stack[0]
            self._drop()
            while cond == 1:
                self._execute_node(node.children[0])
                cond = self.stack[0]
                self._drop()
                if cond not in (0, 1):
                    raise ExecutionError(f"loop condition {cond} is not binary")
                self._tick()  # REPEAT or the final END absorbs one row
            if cond != 0:
                raise ExecutionError(f"loop condition {cond} is not binary")
            self._tick()
        elif isinstance(node, CallNode):
            self._enter_call(node)
            self._execute_node(node.children[0])
            self._exit_call()
        elif isinstance(node, DynNode):
            self._tick()
            digest = tuple(self.stack[:4])
            self._drop(4)
            target = self.forest.find_root(digest)
            if target is None:
                target = self.forest._by_digest.get(digest)
            if target is None:
                raise ExecutionError(f"dynamic target {digest} not found")
            if node.is_dyncall:
                self._enter_call(CallNode((target,), False, digest))
                self._execute_node(target)
                self._exit_call()
            else:
                self._execute_node(target)
            self._tick()
        elif isinstance(node, ExternalNode):
            target = self.forest._by_digest.get(node.digest)
            if target is None or target == node_id:
                raise ExecutionError(f"external node {node.digest} unresolved")
            self._execute_node(target)
        else:
            raise ExecutionError(f"unknown node kind {type(node).__name__}")

    def _enter_call(self, node: CallNode) -> None:
        self._tick()
        callee = self.forest[node.children[0]]
        self._ctx_stack.append(
            (self.ctx, self.stack[MIN_STACK_DEPTH:], self.fn_hash, self.caller_hash)
        )
        if node.is_syscall:
            # Syscalls run in the root context; callee must be in the kernel.
            if self.program.kernel_digests and callee.digest not in self.program.kernel_digests:
                raise ExecutionError("syscall target not in kernel")
            self.caller_hash = self.fn_hash
            self.ctx = 0
        else:
            self.ctx = self._next_ctx
            self._next_ctx += 1
            self.fn_hash = callee.digest
        self.stack = self.stack[:MIN_STACK_DEPTH]

    def _exit_call(self) -> None:
        if any(self.stack[MIN_STACK_DEPTH:]):
            raise ExecutionError("call must return with depth 16")
        self.ctx, overflow, self.fn_hash, self.caller_hash = self._ctx_stack.pop()
        self.stack = self.stack[:MIN_STACK_DEPTH] + overflow
        self._tick()

    # -- system events (fast/basic_block/sys_event_handlers.rs) ---------

    def _handle_event(self, eid: int) -> None:
        """Run the handler for event id `eid`. During a handler the stack is
        [event_id, operands...] — the assembler emits push/emit/drop."""
        from .events import SYSTEM_EVENT_BY_ID

        name = SYSTEM_EVENT_BY_ID.get(eid)
        if name is None:
            handler = self.event_handlers.get(eid)
            if handler is None:
                raise ExecutionError(f"no handler for event id {eid}")
            handler(self)
            return
        s, adv = self.stack, self.advice
        if name == "sys::merkle_node_to_stack":
            depth, index, root = s[1], s[2], tuple(s[3:7])
            node = adv.store.get_node(root, NodeIndex(depth, index))
            adv.stack[0:0] = list(node)  # node[0] pops first
        elif name == "sys::merkle_node_merge":
            lhs, rhs = tuple(s[1:5]), tuple(s[5:9])
            parent = tuple(hp.merge(list(lhs), list(rhs)))
            adv.store.extend([(parent, lhs, rhs)])
        elif name in (
            "sys::map_value_to_stack",
            "sys::map_value_to_stack_n_0",
            "sys::map_value_to_stack_n_4",
            "sys::map_value_to_stack_n_8",
        ):
            key = tuple(s[1:5])
            values = adv.map.get(key)
            if values is None:
                raise ExecutionError(f"advice map key {key} not found")
            out = list(values)
            if name.endswith(("n_0", "n_4", "n_8")):
                pad_to = int(name[-1])
                if pad_to:
                    out += [0] * (-len(out) % pad_to)
                out.insert(0, len(values))
            adv.stack[0:0] = out
        elif name == "sys::map_value_count_to_stack":
            key = tuple(s[1:5])
            if key not in adv.map:
                raise ExecutionError(f"advice map key {key} not found")
            adv.stack.insert(0, len(adv.map[key]))
        elif name == "sys::has_map_key":
            adv.stack.insert(0, 1 if tuple(s[1:5]) in adv.map else 0)
        elif name == "sys::ext2_inv":
            # (a0 + a1·x) with x² = 7; inverse = (a0 − a1·x)/(a0² − 7·a1²)
            a0, a1 = s[1], s[2]
            d = (a0 * a0 - 7 * a1 * a1) % P
            if d == 0:
                raise ExecutionError("ext2inv: division by zero")
            dinv = pow(d, P - 2, P)
            # push low then high so the high coefficient pops first
            adv.stack[0:0] = [a1 and (P - a1) * dinv % P, a0 * dinv % P][::-1]
        elif name == "sys::ilog2":
            if s[1] == 0:
                raise ExecutionError("ilog2 of zero")
            adv.stack.insert(0, s[1].bit_length() - 1)
        elif name == "sys::u32_clz":
            adv.stack.insert(0, 32 - self._u32(1).bit_length())
        elif name == "sys::u32_ctz":
            v = self._u32(1)
            adv.stack.insert(0, (v & -v).bit_length() - 1 if v else 32)
        elif name == "sys::u32_clo":
            v = (~self._u32(1)) & U32_MAX
            adv.stack.insert(0, 32 - v.bit_length())
        elif name == "sys::u32_cto":
            v = (~self._u32(1)) & U32_MAX
            adv.stack.insert(0, (v & -v).bit_length() - 1 if v else 32)
        elif name == "sys::mem_to_map":
            # [event_id, KEY, start_addr, end_addr, ...] → map[KEY] = mem[start..end)
            key, start, end = tuple(s[1:5]), s[5], s[6]
            if start > U32_MAX or end > U32_MAX or start > end:
                raise ExecutionError("mem_to_map: invalid range")
            adv.map[key] = [self._mem_read_element(a) for a in range(start, end)]
        elif name in ("sys::hdword_to_map", "sys::hdword_to_map_with_domain"):
            # [event_id, A, B, ...]; key = hash(A || B, domain), values [A, B]
            a, b = list(s[1:5]), list(s[5:9])
            domain = s[9] if name.endswith("domain") else 0
            key = tuple(hp.merge_in_domain(a, b, domain))
            adv.map[key] = a + b
        elif name == "sys::hqword_to_map":
            words = [s[i] for i in range(1, 17)]
            key = tuple(hp.hash_elements_padded(words))
            adv.map[key] = words
        elif name == "sys::hperm_to_map":
            # state [RATE1, RATE2, CAP]; values = rate; key = permuted digest
            state = [s[i] for i in range(1, 13)]
            key = tuple(hp.permute(state)[0:4])
            adv.map[key] = state[:8]
        else:
            raise ExecutionError(f"system event {name} not implemented")

    # -- memory ---------------------------------------------------------

    def _mem_word(self, addr: int) -> list[int]:
        if addr > U32_MAX or addr % 4:
            raise ExecutionError(f"unaligned or invalid word address {addr}")
        return self.memory.setdefault((self.ctx, addr), [0, 0, 0, 0])

    def _mem_read_element(self, addr: int) -> int:
        if addr > U32_MAX:
            raise ExecutionError(f"invalid address {addr}")
        word = self.memory.get((self.ctx, addr - addr % 4))
        return word[addr % 4] if word else 0

    # -- ops ------------------------------------------------------------

    def _execute_op(self, op: Op) -> None:  # noqa: C901
        s = self.stack
        name = op.name
        if name == "NOOP":
            return
        # system (execution/operations/sys_ops)
        if name == "ASSERT":
            if s[0] != 1:
                raise ExecutionError(f"assertion failed (err={op.err_code})")
            self._drop()
        elif name == "SDEPTH":
            self._push(len(s))
        elif name == "CLK":
            self._push(self.clk)
        elif name == "CALLER":
            s[0:4] = list(self.caller_hash)
        elif name == "EMIT":
            # Dispatch by the event id on top of the stack; system events
            # first, then user handlers (fast/basic_block/sys_event_handlers.rs:50).
            self._handle_event(s[0])
        # field ops (execution/operations/field_ops)
        elif name == "ADD":
            a, b = s[0], s[1]
            self._drop()
            s[0] = (a + b) % P
        elif name == "MUL":
            a, b = s[0], s[1]
            self._drop()
            s[0] = a * b % P
        elif name == "NEG":
            s[0] = (-s[0]) % P
        elif name == "INV":
            if s[0] == 0:
                raise ExecutionError("division by zero")
            s[0] = pow(s[0], P - 2, P)
        elif name == "INCR":
            s[0] = (s[0] + 1) % P
        elif name == "NOT":
            if s[0] > 1:
                raise ExecutionError("not: operand not binary")
            s[0] ^= 1
        elif name == "AND":
            a, b = s[0], s[1]
            if a > 1 or b > 1:
                raise ExecutionError("and: operand not binary")
            self._drop()
            s[0] = a & b
        elif name == "OR":
            a, b = s[0], s[1]
            if a > 1 or b > 1:
                raise ExecutionError("or: operand not binary")
            self._drop()
            s[0] = a | b
        elif name == "EQ":
            a, b = s[0], s[1]
            self._drop()
            s[0] = 1 if a == b else 0
        elif name == "EQZ":
            s[0] = 1 if s[0] == 0 else 0
        elif name == "EXPACC":
            # [lsb', base², acc·base^lsb, exp>>1] (field_ops/mod.rs:195)
            base, acc, exp = s[1], s[2], s[3]
            lsb = exp & 1
            s[0] = lsb
            s[1] = base * base % P
            s[2] = acc * (base if lsb else 1) % P
            s[3] = exp >> 1
        elif name == "EXT2MUL":
            # (x²−7)-extension product into positions 2,3 (field_ops:227)
            b0, b1, a0, a1 = s[0], s[1], s[2], s[3]
            s[2] = (a0 * b0 + 7 * a1 * b1) % P
            s[3] = (a0 * b1 + a1 * b0) % P
        # u32 ops (execution/operations/u32_ops)
        elif name == "U32SPLIT":
            # [value] → [lo, hi], lo on top (u32_ops/mod.rs:51)
            v = s[0]
            s[0] = v >> 32
            self._push(v & U32_MAX)
        elif name == "U32ADD":
            a, b = self._u32(0), self._u32(1)
            r = a + b
            s[0], s[1] = r & U32_MAX, r >> 32
        elif name == "U32ADD3":
            a, b, c = self._u32(0), self._u32(1), self._u32(2)
            r = a + b + c
            self._drop()
            s[0], s[1] = r & U32_MAX, r >> 32
        elif name == "U32SUB":
            b, a = self._u32(0), self._u32(1)
            r = (a - b) & ((1 << 64) - 1)
            s[0], s[1] = r >> 63, r & U32_MAX
        elif name == "U32MUL":
            a, b = self._u32(0), self._u32(1)
            r = a * b
            s[0], s[1] = r & U32_MAX, r >> 32
        elif name == "U32MADD":
            a, b, c = self._u32(0), self._u32(1), self._u32(2)
            r = a * b + c
            self._drop()
            s[0], s[1] = r & U32_MAX, r >> 32
        elif name == "U32DIV":
            b, a = self._u32(0), self._u32(1)
            if b == 0:
                raise ExecutionError("division by zero")
            s[0], s[1] = a % b, a // b
        elif name == "U32AND":
            a, b = self._u32(0), self._u32(1)
            self._drop()
            s[0] = a & b
        elif name == "U32XOR":
            a, b = self._u32(0), self._u32(1)
            self._drop()
            s[0] = a ^ b
        elif name == "U32ASSERT2":
            self._u32(0), self._u32(1)
        # stack ops (execution/operations/stack_ops)
        elif name == "PAD":
            self._push(0)
        elif name == "DROP":
            self._drop()
        elif name == "SWAP":
            s[0], s[1] = s[1], s[0]
        elif name.startswith("SWAPW"):
            off = {"SWAPW": 4, "SWAPW2": 8, "SWAPW3": 12}[name]
            s[0:4], s[off : off + 4] = s[off : off + 4], s[0:4]
        elif name == "SWAPDW":
            s[0:8], s[8:16] = s[8:16], s[0:8]
        elif name.startswith("DUP"):
            self._push(s[int(name[3:])])
        elif name.startswith("MOVUP"):
            n = int(name[5:])
            s.insert(0, s.pop(n))
        elif name.startswith("MOVDN"):
            n = int(name[5:])
            s.insert(n, s.pop(0))
        elif name == "CSWAP":
            c = s[0]
            if c > 1:
                raise ExecutionError("cswap: condition not binary")
            self._drop()
            if c:
                s[0], s[1] = s[1], s[0]
        elif name == "CSWAPW":
            c = s[0]
            if c > 1:
                raise ExecutionError("cswapw: condition not binary")
            self._drop()
            if c:
                s[0:4], s[4:8] = s[4:8], s[0:4]
        elif name == "PUSH":
            self._push(op.imm)
        # io ops (execution/operations/io_ops)
        elif name == "ADVPOP":
            self._push(self.advice.pop_stack())
        elif name == "ADVPOPW":
            s[0:4] = [v % P for v in self.advice.pop_stack_word()]
        elif name == "MLOAD":
            s[0] = self._mem_read_element(s[0])
        elif name == "MLOADW":
            addr = s[0]
            self._drop()
            s[0:4] = list(self._mem_word(addr))
        elif name == "MSTORE":
            addr = s[0]
            self._drop()
            if addr > U32_MAX:
                raise ExecutionError(f"invalid address {addr}")
            word = self.memory.setdefault((self.ctx, addr - addr % 4), [0, 0, 0, 0])
            word[addr % 4] = s[0]
        elif name == "MSTOREW":
            addr = s[0]
            self._drop()
            self._mem_word(addr)[:] = s[0:4]
        elif name == "MSTREAM":
            # Two words from mem[s[12]]; the word at addr goes to the top,
            # s[12] += 8 (io_ops/mod.rs:226-252).
            addr = s[12]
            s[0:4] = list(self._mem_word(addr))
            s[4:8] = list(self._mem_word(addr + 4))
            s[12] = (addr + 8) % P
        elif name == "PIPE":
            # Two advice words → memory and stack; first popped word on top
            # (io_ops/mod.rs:276-305).
            addr = s[12]
            w0 = [v % P for v in self.advice.pop_stack_word()]
            w1 = [v % P for v in self.advice.pop_stack_word()]
            self._mem_word(addr)[:] = w0
            self._mem_word(addr + 4)[:] = w1
            s[0:4] = w0
            s[4:8] = w1
            s[12] = (addr + 8) % P
        # crypto ops (execution/operations/crypto_ops)
        elif name == "HPERM":
            state = [s[i] for i in range(12)]
            out = hp.permute(state)
            s[0:12] = out
        elif name == "MPVERIFY":
            # [V, depth, index, R, ...]: verify that the tree with root R
            # opens to V at (depth, index); stack unchanged
            # (execution/operations/crypto_ops/mod.rs:96-105)
            node_claim = s[0:4]
            depth, index = s[4], s[5]
            root = tuple(s[6:10])
            node = self.advice.store.get_node(root, NodeIndex(depth, index))
            if list(node) != node_claim:
                raise ExecutionError(f"merkle path verification failed (err={op.err_code})")
        elif name == "MRUPDATE":
            # [V_old, depth, index, R_old, V_new, ...] → [R_new, depth,
            # index, R_old, V_new, ...] (crypto_ops/mod.rs:161-170)
            old = s[0:4]
            depth, index = s[4], s[5]
            old_root = tuple(s[6:10])
            new_val = tuple(s[10:14])
            cur = self.advice.store.get_node(old_root, NodeIndex(depth, index))
            if list(cur) != old:
                raise ExecutionError("merkle update: old value mismatch")
            new_root = self.advice.store.set_node(
                old_root, NodeIndex(depth, index), new_val
            )
            s[0:4] = list(new_root)
        else:
            raise ExecutionError(f"operation {name} not implemented yet")


def execute(
    program: Program,
    stack_inputs: list[int] | StackInputs | None = None,
    advice: AdviceProvider | None = None,
    **opts,
) -> ExecutionOutput:
    """Execute a program (processor/src/lib.rs:114 `execute`)."""
    if isinstance(stack_inputs, list):
        stack_inputs = StackInputs(stack_inputs)
    return Processor(program, stack_inputs, advice, **opts).execute()
