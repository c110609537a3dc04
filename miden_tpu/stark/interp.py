"""Bytecode constraint evaluator: compile-size-O(1) quotient evaluation.

The fused XLA evaluator (prover._evaluate_quotient_dev) inlines the whole
constraint program into one graph — fastest at steady state, but the
graph is huge (hundreds of thousands of ops for the VM AIR), making
XLA:CPU compilation impractical and costing minutes of tracing per
process. This module records ``Air.eval`` once into a flat base-field
SSA program (ADD/SUB/MUL over Goldilocks) with a linear-scan register
allocator, then executes it on device with ``lax.scan`` over the
instruction stream — the compiled program size is independent of the
constraint count.

Selected by the prover on the CPU test mesh (or MIDEN_TPU_INTERP=1);
semantics are identical to the fused path — the very same ``Air.eval``
is recorded through a ScalarBackend subclass, so the α-fold order and
every constraint expression match value-for-value.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..field import gl
from ..field.goldilocks import Fp, Fp2, fp_add, fp_mul, fp_sub
from .air import Air, Expr, Folder, ScalarBackend

OP_ADD, OP_SUB, OP_MUL = 0, 1, 2


class RecordBackend(ScalarBackend):
    """Records base-field SSA instructions; values are register ids.

    Extension-field values are (lo_reg, hi_reg) tuples; ext arithmetic
    decomposes into base instructions exactly like gl.ext_* (x² = 7).
    Constants must be interned (``intern``) before recording starts.
    """

    def __init__(self, n_inputs: int):
        self.n_inputs = n_inputs
        self.instrs: list[tuple[int, int, int]] = []
        self.consts: dict[int, int] = {}
        self.const_values: list[int] = []
        self._sealed = False

    def intern(self, c: int) -> int:
        c %= gl.P
        reg = self.consts.get(c)
        if reg is None:
            assert not self._sealed, f"constant {c} discovered after sealing"
            reg = self.n_inputs + len(self.const_values)
            self.consts[c] = reg
            self.const_values.append(c)
        return reg

    def seal(self) -> None:
        self._sealed = True
        self.n_fixed = self.n_inputs + len(self.const_values)

    def _emit(self, op: int, a: int, b: int) -> int:
        self.instrs.append((op, a, b))
        return self.n_fixed + len(self.instrs) - 1

    def const(self, c: int):
        return self.intern(c)

    def _scal(self, f, a, b):
        if isinstance(a, list) or isinstance(b, list):
            if not isinstance(a, list):
                a = [a] * len(b)
            if not isinstance(b, list):
                b = [b] * len(a)
            return [f(x, y) for x, y in zip(a, b)]
        return f(a, b)

    def add(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return self._scal(lambda x, y: self._emit(OP_ADD, x, y), a, b)
        return self._scal(self._ext_add, self._ext(a, ka), self._ext(b, kb))

    def sub(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return self._scal(lambda x, y: self._emit(OP_SUB, x, y), a, b)
        return self._scal(self._ext_sub, self._ext(a, ka), self._ext(b, kb))

    def mul(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return self._scal(lambda x, y: self._emit(OP_MUL, x, y), a, b)
        if ka == "base":
            return self._scal(lambda y, x: self._ext_mul_base(y, x), b, a)
        if kb == "base":
            return self._scal(self._ext_mul_base, a, b)
        return self._scal(self._ext_mul, a, b)

    def mul_int(self, v, c: int, kind: str):
        creg = self.intern(c)
        if kind == "base":
            if isinstance(v, list):
                return [self._emit(OP_MUL, x, creg) for x in v]
            return self._emit(OP_MUL, v, creg)
        if isinstance(v, list):
            return [self._ext_mul_base(x, creg) for x in v]
        return self._ext_mul_base(v, creg)

    def _ext(self, v, k):
        if k == "ext":
            return v
        zero = self.intern(0)
        if isinstance(v, list):
            return [(x, zero) for x in v]
        return (v, zero)

    def _ext_add(self, a, b):
        return (self._emit(OP_ADD, a[0], b[0]), self._emit(OP_ADD, a[1], b[1]))

    def _ext_sub(self, a, b):
        return (self._emit(OP_SUB, a[0], b[0]), self._emit(OP_SUB, a[1], b[1]))

    def _ext_mul_base(self, a, s):
        return (self._emit(OP_MUL, a[0], s), self._emit(OP_MUL, a[1], s))

    def _ext_mul(self, a, b):
        a0b0 = self._emit(OP_MUL, a[0], b[0])
        a1b1 = self._emit(OP_MUL, a[1], b[1])
        a0b1 = self._emit(OP_MUL, a[0], b[1])
        a1b0 = self._emit(OP_MUL, a[1], b[0])
        t = self._emit(OP_MUL, a1b1, self.intern(7))
        return (self._emit(OP_ADD, a0b0, t), self._emit(OP_ADD, a0b1, a1b0))


def _collect_constants(air: Air, n_pub: int, n_rand: int, n_auxv: int) -> list[int]:
    """Dry scalar pass observing every integer constant eval() uses."""
    seen: list[int] = []

    class _Catch(ScalarBackend):
        def const(self, c):
            seen.append(c % gl.P)
            return super().const(c)

        def mul_int(self, v, c, kind):
            seen.append(c % gl.P)
            return super().mul_int(v, c, kind)

    be = _Catch()
    one = Expr(be, "base", 1)
    f = Folder(
        be,
        main_fn=lambda c, o=0: Expr(be, "base", 1),
        aux_fn=lambda c, o=0: Expr(be, "ext", (1, 0)),
        preprocessed_fn=lambda c, o=0: Expr(be, "base", 1),
        periodic=[Expr(be, "base", 1) for _ in air.periodic_columns],
        publics=[Expr(be, "base", 0)] * n_pub,
        randomness=[Expr(be, "ext", (1, 1))] * n_rand,
        aux_values=[Expr(be, "ext", (1, 1))] * n_auxv,
        selectors=(one, one, one),
        alpha=Expr(be, "ext", (1, 1)),
    )
    air.eval(f)
    return seen


class ConstraintProgram:
    """A recorded, register-allocated constraint program for one Air.

    Input register layout (order matched by ``evaluate_folded_constraints``),
    split into a row-varying VECTOR block and a row-constant SCALAR block so
    the executor never broadcasts scalars (publics / randomness / constants)
    to full-domain rows:
      vector [0, n_vec):  main cur (w) | main next (w) | pp cur (pw) |
                          pp next (pw) | aux cur (2aw) | aux next (2aw) |
                          selectors (3) | periodic (p)
      scalar [n_vec, n_fixed): publics | randomness (2 each) |
                          aux_values (2 each) | alpha (2) | constants
    """

    def __init__(self, air: Air, n_pub: int, n_rand: int, n_auxv: int):
        self.air = air
        w, aw, p = air.width, air.aux_width, len(air.periodic_columns)
        pw = air.preprocessed_width
        self.n_pub, self.n_rand, self.n_auxv = n_pub, n_rand, n_auxv
        self.n_vec = 2 * w + 2 * pw + 4 * aw + 3 + p
        n_inputs = self.n_vec + n_pub + 2 * n_rand + 2 * n_auxv + 2

        be = RecordBackend(n_inputs)
        for c in [0, 1, 7] + _collect_constants(air, n_pub, n_rand, n_auxv):
            be.intern(c)
        be.seal()

        nxt = iter(range(n_inputs)).__next__
        main_cur = [nxt() for _ in range(w)]
        main_next = [nxt() for _ in range(w)]
        pp_cur = [nxt() for _ in range(pw)]
        pp_next = [nxt() for _ in range(pw)]
        aux_cur = [(nxt(), nxt()) for _ in range(aw)]
        aux_next = [(nxt(), nxt()) for _ in range(aw)]
        sels = tuple(nxt() for _ in range(3))
        periodic = [nxt() for _ in range(p)]
        pubs = [nxt() for _ in range(n_pub)]
        rands = [(nxt(), nxt()) for _ in range(n_rand)]
        auxvs = [(nxt(), nxt()) for _ in range(n_auxv)]
        alpha = (nxt(), nxt())

        f = Folder(
            be,
            main_fn=lambda c, o=0: Expr(be, "base", (main_next if o else main_cur)[c]),
            aux_fn=lambda c, o=0: Expr(be, "ext", (aux_next if o else aux_cur)[c]),
            preprocessed_fn=lambda c, o=0: Expr(
                be, "base", (pp_next if o else pp_cur)[c]
            ),
            periodic=[Expr(be, "base", r) for r in periodic],
            publics=[Expr(be, "base", r) for r in pubs],
            randomness=[Expr(be, "ext", r) for r in rands],
            aux_values=[Expr(be, "ext", r) for r in auxvs],
            selectors=tuple(Expr(be, "base", r) for r in sels),
            alpha=Expr(be, "ext", alpha),
        )
        air.eval(f)
        assert f.acc is not None, "AIR produced no constraints"
        if f.acc.kind == "base":
            # single-constraint AIRs never touch α: lift base → ext
            f.acc = Expr(be, "ext", be._ext(f.acc.val, "base"))
        assert f.acc.kind == "ext"
        self.num_constraints = f.num_constraints
        self.n_inputs = n_inputs
        self.const_values = be.const_values
        self.n_fixed = be.n_fixed
        self._allocate(be.instrs, f.acc.val)

    def _allocate(self, instrs, out_regs) -> None:
        """Linear-scan register reuse over the SSA stream. Slot 0 is a
        dedicated scratch sink for dead results."""
        n_fixed = self.n_fixed
        n = len(instrs)
        last_use: dict[int, int] = {}
        for i, (_, a, b) in enumerate(instrs):
            for r in (a, b):
                if r >= n_fixed:
                    last_use[r] = i
        for r in out_regs:
            if r >= n_fixed:
                last_use[r] = n

        free: list[int] = []
        mapping: dict[int, int] = {}
        frame_size = 1  # slot 0 = scratch
        code = np.zeros((max(n, 1), 4), dtype=np.int32)
        for i, (op, a, b) in enumerate(instrs):
            ra = a if a < n_fixed else n_fixed + mapping[a]
            rb = b if b < n_fixed else n_fixed + mapping[b]
            for r in (a, b):
                if r >= n_fixed and last_use.get(r) == i and r in mapping:
                    free.append(mapping.pop(r))
            ssa = n_fixed + i
            if ssa in last_use:
                slot = free.pop() if free else frame_size
                if slot == frame_size:
                    frame_size += 1
                mapping[ssa] = slot
            else:
                slot = 0
            code[i] = (op, ra, rb, n_fixed + slot)
        self.code = code
        self.frame_size = frame_size
        self.out_slots = tuple(
            r if r < n_fixed else n_fixed + mapping[r] for r in out_regs
        )


def _run_chunk(prog: ConstraintProgram, vec: Fp, scal: Fp) -> Fp2:
    """Execute the program on one row-chunk. ``vec`` is (n_vec, blk) row-
    varying inputs, ``scal`` (n_scal,) row-constant inputs. Returns the
    folded accumulator as a (blk,) ext value."""
    blk = vec.shape[1]
    n_vec, n_fixed = prog.n_vec, prog.n_fixed
    frame_lo = jnp.zeros((prog.frame_size, blk), dtype=jnp.uint32)
    frame_hi = jnp.zeros((prog.frame_size, blk), dtype=jnp.uint32)
    code = jnp.asarray(prog.code)

    def read(lo, hi, idx):
        in_vec = idx < n_vec
        in_scal = jnp.logical_and(idx >= n_vec, idx < n_fixed)
        vi = jnp.where(in_vec, idx, 0)
        si = jnp.where(in_scal, idx - n_vec, 0)
        fi = jnp.where(idx >= n_fixed, idx - n_fixed, 0)
        return Fp(
            jnp.where(
                in_vec,
                vec.lo[vi],
                jnp.where(in_scal, scal.lo[si], lo[fi]),
            ),
            jnp.where(
                in_vec,
                vec.hi[vi],
                jnp.where(in_scal, scal.hi[si], hi[fi]),
            ),
        )

    def step(carry, instr):
        lo, hi = carry
        op, a, b, dst = instr[0], instr[1], instr[2], instr[3]
        va = read(lo, hi, a)
        vb = read(lo, hi, b)
        res = jax.lax.switch(
            op,
            [
                lambda: fp_add(va, vb),
                lambda: fp_sub(va, vb),
                lambda: fp_mul(va, vb),
            ],
        )
        slot = dst - n_fixed
        return (lo.at[slot].set(res.lo), hi.at[slot].set(res.hi)), None

    (lo, hi), _ = jax.lax.scan(step, (frame_lo, frame_hi), code)

    def out(reg):
        if reg < n_vec:
            return Fp(vec.lo[reg], vec.hi[reg])
        if reg < n_fixed:
            return Fp(
                jnp.broadcast_to(scal.lo[reg - n_vec], (blk,)),
                jnp.broadcast_to(scal.hi[reg - n_vec], (blk,)),
            )
        return Fp(lo[reg - n_fixed], hi[reg - n_fixed])

    return Fp2(out(prog.out_slots[0]), out(prog.out_slots[1]))


#: element budget for (frame + vector-input) chunk footprint: 2^28 elements
#: x 8 B/elem (lo+hi) = 2 GB live per chunk, leaving room for the retained
#: LDEs on a 16 GB chip
_CHUNK_ELEM_BUDGET = 1 << 28


def _chunk_rows(prog: ConstraintProgram, nd: int) -> int:
    """Largest power-of-two block height whose executor footprint fits the
    budget (the CoreVmAir frame is ~600 slots: unchunked at nd=2^21 it is a
    ~10 GB frame — the round-3 BENCH_VM RESOURCE_EXHAUSTED)."""
    per_row = prog.frame_size + prog.n_vec
    blk = 1 << 14
    while blk < nd and per_row * (blk << 1) <= _CHUNK_ELEM_BUDGET:
        blk <<= 1
    return min(blk, nd)


_PROGRAM_CACHE: dict = {}


def get_program(air: Air, n_pub: int, n_rand: int, n_auxv: int) -> ConstraintProgram:
    key = (type(air), n_pub, n_rand, n_auxv)
    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        prog = ConstraintProgram(air, n_pub, n_rand, n_auxv)
        _PROGRAM_CACHE[key] = prog
    return prog


def evaluate_folded_constraints(
    air: Air,
    main: Fp,  # (nd, w)
    aux: Fp | None,  # (nd, 2aw), c0/c1 interleaved per column
    selectors: tuple,  # 3 × Fp (nd,)
    publics: Fp,  # (n_pub,)
    randomness: Fp2,  # (n_rand,)
    aux_values: Fp2,  # (n_auxv,)
    periodic: list,  # p × Fp (nd,)
    alpha: Fp2,  # scalar-shaped
    pp: Fp | None = None,  # (nd, pw)
    next_offset: int = 1,
) -> Fp2:
    """α-folded constraint accumulator via the recorded program; matches
    the fused evaluator value-for-value.

    "Next-row" values are gathered per chunk at ``(r + next_offset) % nd``
    instead of materializing rolled full-domain copies, and the program runs
    over row chunks (``lax.map``) so peak memory is independent of nd."""
    nd = main.shape[0]
    prog = get_program(
        air, int(publics.shape[0]), int(randomness.shape[0]),
        int(aux_values.shape[0]),
    )

    # --- scalar block: (n_scal,) built once, never broadcast -------------
    scal_lo, scal_hi = [], []

    def push_scal(v: Fp):
        scal_lo.append(jnp.reshape(v.lo, ()))
        scal_hi.append(jnp.reshape(v.hi, ()))

    for j in range(int(publics.shape[0])):
        push_scal(publics[j])
    for j in range(int(randomness.shape[0])):
        push_scal(Fp(randomness.c0.lo[j], randomness.c0.hi[j]))
        push_scal(Fp(randomness.c1.lo[j], randomness.c1.hi[j]))
    for j in range(int(aux_values.shape[0])):
        push_scal(Fp(aux_values.c0.lo[j], aux_values.c0.hi[j]))
        push_scal(Fp(aux_values.c1.lo[j], aux_values.c1.hi[j]))
    push_scal(alpha.c0)
    push_scal(alpha.c1)
    for c in prog.const_values:
        push_scal(Fp(jnp.uint32(c & 0xFFFFFFFF), jnp.uint32(c >> 32)))
    scal = Fp(jnp.stack(scal_lo), jnp.stack(scal_hi))
    assert prog.n_vec + scal.shape[0] == prog.n_fixed

    blk = _chunk_rows(prog, nd)
    n_blk = nd // blk
    d = next_offset

    sel_mat = Fp(
        jnp.stack([s.lo for s in selectors] + [p.lo for p in periodic]),
        jnp.stack([s.hi for s in selectors] + [p.hi for p in periodic]),
    )  # (3 + p, nd)

    def chunk(t):
        start = t * blk
        nrows = (start + jnp.arange(blk) + d) & (nd - 1)  # nd is a power of two
        parts_lo, parts_hi = [], []

        def push_cur(m):
            # contiguous rows: dynamic_slice, transposed to (k, blk)
            parts_lo.append(jax.lax.dynamic_slice_in_dim(m.lo, start, blk, 0).T)
            parts_hi.append(jax.lax.dynamic_slice_in_dim(m.hi, start, blk, 0).T)

        def push_next(m):
            # wrap-around rows: gather at (r + d) mod nd
            parts_lo.append(jnp.take(m.lo, nrows, axis=0).T)
            parts_hi.append(jnp.take(m.hi, nrows, axis=0).T)

        for m, present in ((main, True), (pp, air.preprocessed_width),
                           (aux, air.aux_width)):
            if present:
                push_cur(m)
                push_next(m)
        parts_lo.append(jax.lax.dynamic_slice_in_dim(sel_mat.lo, start, blk, 1))
        parts_hi.append(jax.lax.dynamic_slice_in_dim(sel_mat.hi, start, blk, 1))
        vec = Fp(
            jnp.concatenate(parts_lo, axis=0),
            jnp.concatenate(parts_hi, axis=0),
        )
        res = _run_chunk(prog, vec, scal)
        return res.c0.lo, res.c0.hi, res.c1.lo, res.c1.hi

    if n_blk == 1:
        c0lo, c0hi, c1lo, c1hi = chunk(jnp.uint32(0))
        return Fp2(Fp(c0lo, c0hi), Fp(c1lo, c1hi))
    c0lo, c0hi, c1lo, c1hi = jax.lax.map(chunk, jnp.arange(n_blk, dtype=jnp.uint32))
    return Fp2(
        Fp(c0lo.reshape(nd), c0hi.reshape(nd)),
        Fp(c1lo.reshape(nd), c1hi.reshape(nd)),
    )
