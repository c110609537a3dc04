"""AIR interface: one constraint definition, three evaluation backends.

The reference evaluates constraints three ways — packed SIMD on the quotient
coset (prover/constraints/), scalar at the OOD point (verifier/constraints.rs),
and symbolically for degree/layout discovery (lifted-air symbolic/). This
module realizes the same triple with a single ``Air.eval(folder)`` definition
dispatched over interchangeable backends:

- :class:`VectorBackend` — JAX arrays over the whole quotient domain (prover);
- :class:`ScalarBackend` — exact Python ints at the OOD point (verifier);
- :class:`DegreeBackend` — degree-multiple tracking (quotient sizing,
  mirroring lifted-air's symbolic builder and domain.rs log_quotient_degree).

Constraints are α-folded Horner-style in ``assert_*`` order:
``acc ← acc·α + c`` — prover and verifier fold identically, so the quotient
identity holds value-for-value at the OOD point.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..field import gl
from ..field.goldilocks import (
    Fp,
    Fp2,
    fp2_add,
    fp2_mul,
    fp2_mul_base,
    fp2_sub,
    fp_add,
    fp_broadcast_to,
    fp_const,
    fp_mul,
    fp_sub,
)

# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------


class VectorBackend:
    """Values are Fp (base) / Fp2 (ext) arrays over the evaluation domain."""

    kind = "vector"

    def __init__(self, shape):
        self.shape = shape
        self._const_cache: dict = {}

    def const(self, c: int):
        # memoized, scalar-shaped (broadcasting is implicit in ops): keeps
        # the lowered graph free of per-use constant/broadcast storms
        c %= gl.P
        v = self._const_cache.get(c)
        if v is None:
            v = fp_const(c)
            self._const_cache[c] = v
        return v

    def mul_int(self, v, c: int, kind: str):
        """Multiply by an integer constant; powers of two lower to limb
        shifts (fp_mul_2exp) instead of full 4-product multiplies."""
        from ..field.goldilocks import fp_mul_2exp

        c %= gl.P
        if c == 0:
            return self.mul(v, self.const(0), kind, "base")
        if c == 1:
            return v
        if c & (c - 1) == 0:
            k = c.bit_length() - 1
            if kind == "base":
                return fp_mul_2exp(v, k)
            return Fp2(fp_mul_2exp(v.c0, k), fp_mul_2exp(v.c1, k))
        return self.mul(v, self.const(c), kind, "base")

    def add(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return fp_add(a, b)
        a = self._ext(a, ka)
        b = self._ext(b, kb)
        return fp2_add(a, b)

    def sub(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return fp_sub(a, b)
        a = self._ext(a, ka)
        b = self._ext(b, kb)
        return fp2_sub(a, b)

    def mul(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return fp_mul(a, b)
        if ka == "base":
            return fp2_mul_base(b, a)
        if kb == "base":
            return fp2_mul_base(a, b)
        return fp2_mul(a, b)

    def _ext(self, v, k):
        if k == "ext":
            return v
        zero = fp_sub(v, v)
        return Fp2(v, zero)


class ScalarBackend:
    """Values are Python ints (base) / (c0, c1) tuples (ext).

    Stacked constraint families (``main_many`` / ``assert_*_many``) are
    represented as Python lists and operate elementwise, mirroring the
    vector backend's leading group axis.
    """

    kind = "scalar"

    def const(self, c: int):
        return c % gl.P

    def mul_int(self, v, c: int, kind: str):
        c %= gl.P
        if kind == "base":
            if isinstance(v, list):
                return [gl.mul(x, c) for x in v]
            return gl.mul(v, c)
        if isinstance(v, list):
            return [gl.ext_mul_base(x, c) for x in v]
        return gl.ext_mul_base(v, c)

    def _zip(self, a, b, f):
        if isinstance(a, list) or isinstance(b, list):
            if not isinstance(a, list):
                a = [a] * len(b)
            if not isinstance(b, list):
                b = [b] * len(a)
            assert len(a) == len(b)
            return [f(x, y) for x, y in zip(a, b)]
        return f(a, b)

    def add(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return self._zip(a, b, gl.add)
        return self._zip(
            self._ext(a, ka), self._ext(b, kb), gl.ext_add
        )

    def sub(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return self._zip(a, b, gl.sub)
        return self._zip(
            self._ext(a, ka), self._ext(b, kb), gl.ext_sub
        )

    def mul(self, a, b, ka, kb):
        if ka == "base" and kb == "base":
            return self._zip(a, b, gl.mul)
        if ka == "base":
            return self._zip(b, a, lambda x, y: gl.ext_mul_base(x, y))
        if kb == "base":
            return self._zip(a, b, lambda x, y: gl.ext_mul_base(x, y))
        return self._zip(a, b, gl.ext_mul)

    def _ext(self, v, k):
        if k == "ext":
            return v
        if isinstance(v, list):
            return [(x, 0) for x in v]
        return (v, 0)


class DegreeBackend:
    """Values are degree multiples (trace column = 1)."""

    kind = "degree"

    def const(self, c: int):
        return 0

    def mul_int(self, v, c: int, kind: str):
        return v

    def add(self, a, b, ka, kb):
        return max(a, b)

    sub = add

    def mul(self, a, b, ka, kb):
        return a + b


class Expr:
    """Backend-dispatched value with operator overloading."""

    __slots__ = ("backend", "kind", "val")

    def __init__(self, backend, kind, val):
        self.backend = backend
        self.kind = kind
        self.val = val

    def _coerce(self, other) -> "Expr":
        if isinstance(other, Expr):
            return other
        if isinstance(other, int):
            return Expr(self.backend, "base", self.backend.const(other))
        raise TypeError(f"cannot mix Expr with {type(other)}")

    def _bin(self, other, op):
        other = self._coerce(other)
        kind = "ext" if "ext" in (self.kind, other.kind) else "base"
        if isinstance(self.backend, DegreeBackend):
            kind = "base"
        return Expr(
            self.backend,
            kind,
            op(self.val, other.val, self.kind, other.kind),
        )

    def __add__(self, other):
        return self._bin(other, self.backend.add)

    __radd__ = __add__

    def __sub__(self, other):
        return self._bin(other, self.backend.sub)

    def __rsub__(self, other):
        return self._coerce(other).__sub__(self)

    def __mul__(self, other):
        if isinstance(other, int) and hasattr(self.backend, "mul_int"):
            return Expr(
                self.backend,
                self.kind,
                self.backend.mul_int(self.val, other, self.kind),
            )
        return self._bin(other, self.backend.mul)

    __rmul__ = __mul__

    def __neg__(self):
        return self._coerce(0).__sub__(self)


# ---------------------------------------------------------------------------
# Folder
# ---------------------------------------------------------------------------


class Folder:
    """Constraint accumulation context handed to ``Air.eval``.

    The environment callbacks (`main_fn`, `aux_fn`, …) are provided by the
    prover (vector), verifier (scalar), or degree analyzer.
    """

    def __init__(
        self,
        backend,
        *,
        main_fn,
        aux_fn=None,
        preprocessed_fn=None,
        periodic=(),
        publics=(),
        randomness=(),
        aux_values=(),
        selectors=None,
        alpha=None,
    ):
        self.backend = backend
        self._main = main_fn
        self._aux = aux_fn
        self._preprocessed = preprocessed_fn
        self._periodic = list(periodic)
        self._publics = list(publics)
        self._randomness = list(randomness)
        self._aux_values = list(aux_values)
        self._selectors = selectors
        self._alpha = alpha
        self._alpha_pow_arr = None  # memoized device powers of α
        self.acc = None  # α-folded accumulator (ext Expr)
        self.num_constraints = 0

    # --- value access ---
    def main(self, col: int, offset: int = 0) -> Expr:
        return self._main(col, offset)

    def aux(self, col: int, offset: int = 0) -> Expr:
        return self._aux(col, offset)

    def preprocessed(self, col: int, offset: int = 0) -> Expr:
        """Fixed preprocessed column (AirBuilder::preprocessed)."""
        return self._preprocessed(col, offset)

    def main_many(self, cols, offset: int = 0) -> Expr:
        """Stacked access to a list of main columns (one Expr with a leading
        group axis). Keeps the compiled constraint program size independent
        of the family width — homogeneous constraint families should use
        this plus ``assert_*_many``."""
        cols = list(cols)
        if isinstance(self.backend, DegreeBackend):
            return Expr(self.backend, "base", 1)
        if isinstance(self.backend, ScalarBackend):
            # kind follows the environment's element Exprs: the verifier's
            # OOD claims are ext, the bytecode recorder's registers are base
            elems = [self._main(c, offset) for c in cols]
            kind = elems[0].kind if elems else "base"
            return Expr(self.backend, kind, [e.val for e in elems])
        vals = [self._main(c, offset).val for c in cols]
        from ..field.goldilocks import Fp as _Fp
        import jax.numpy as _jnp

        return Expr(
            self.backend,
            "base",
            _Fp(
                _jnp.stack([v.lo for v in vals], axis=0),
                _jnp.stack([v.hi for v in vals], axis=0),
            ),
        )

    def aux_many(self, cols, offset: int = 0) -> Expr:
        cols = list(cols)
        if isinstance(self.backend, DegreeBackend):
            return Expr(self.backend, "base", 1)
        if isinstance(self.backend, ScalarBackend):
            return Expr(
                self.backend, "ext", [self._aux(c, offset).val for c in cols]
            )
        vals = [self._aux(c, offset).val for c in cols]
        from ..field.goldilocks import Fp as _Fp, Fp2 as _Fp2
        import jax.numpy as _jnp

        def stk(sel):
            return _Fp(
                _jnp.stack([sel(v).lo for v in vals], axis=0),
                _jnp.stack([sel(v).hi for v in vals], axis=0),
            )

        return Expr(
            self.backend,
            "ext",
            _Fp2(stk(lambda v: v.c0), stk(lambda v: v.c1)),
        )

    def public_many(self, idxs) -> Expr:
        idxs = list(idxs)
        if isinstance(self.backend, DegreeBackend):
            return Expr(self.backend, "base", 0)
        if isinstance(self.backend, ScalarBackend):
            return Expr(self.backend, "base", [self._publics[i].val for i in idxs])
        vals = [self._publics[i].val for i in idxs]
        from ..field.goldilocks import Fp as _Fp
        import jax.numpy as _jnp

        stacked = _Fp(
            _jnp.stack([v.lo for v in vals], axis=0)[:, None],
            _jnp.stack([v.hi for v in vals], axis=0)[:, None],
        )
        return Expr(self.backend, "base", stacked)

    def aux_value_many(self, idxs) -> Expr:
        idxs = list(idxs)
        if isinstance(self.backend, DegreeBackend):
            return Expr(self.backend, "base", 0)
        if isinstance(self.backend, ScalarBackend):
            return Expr(
                self.backend, "ext", [self._aux_values[i].val for i in idxs]
            )
        vals = [self._aux_values[i].val for i in idxs]
        from ..field.goldilocks import Fp as _Fp, Fp2 as _Fp2
        import jax.numpy as _jnp

        def stk(sel):
            return _Fp(
                _jnp.stack([sel(v).lo for v in vals], axis=0)[:, None],
                _jnp.stack([sel(v).hi for v in vals], axis=0)[:, None],
            )

        return Expr(
            self.backend, "ext", _Fp2(stk(lambda v: v.c0), stk(lambda v: v.c1))
        )

    def periodic(self, i: int) -> Expr:
        return self._periodic[i]

    def public(self, i: int) -> Expr:
        return self._publics[i]

    def rand(self, i: int) -> Expr:
        return self._randomness[i]

    def aux_value(self, i: int) -> Expr:
        return self._aux_values[i]

    def const(self, c: int) -> Expr:
        return Expr(self.backend, "base", self.backend.const(c))

    def ext_const(self, c) -> Expr:
        if isinstance(self.backend, DegreeBackend):
            return Expr(self.backend, "base", 0)
        if isinstance(self.backend, ScalarBackend):
            return Expr(self.backend, "ext", (c[0] % gl.P, c[1] % gl.P))
        zero0 = self.backend.const(c[0])
        zero1 = self.backend.const(c[1])
        return Expr(self.backend, "ext", Fp2(zero0, zero1))

    # --- selectors ---
    def is_first_row(self) -> Expr:
        return self._selectors[0]

    def is_last_row(self) -> Expr:
        return self._selectors[1]

    def is_transition(self) -> Expr:
        return self._selectors[2]

    # --- constraint sinks ---
    def _fold(self, e: Expr) -> None:
        self.num_constraints += 1
        if isinstance(self.backend, DegreeBackend):
            self.acc = e.val if self.acc is None else max(self.acc, e.val)
            return
        if self.acc is None:
            self.acc = e
        else:
            self.acc = self.acc * self._alpha + e

    def assert_zero(self, e: Expr, label: str | None = None) -> None:
        """Constraint holding on every row."""
        self._tag(label)
        self._fold(e)

    def assert_zero_first_row(self, e: Expr, label: str | None = None) -> None:
        self._tag(label)
        self._fold(e * self.is_first_row())

    def assert_zero_last_row(self, e: Expr, label: str | None = None) -> None:
        self._tag(label)
        self._fold(e * self.is_last_row())

    def assert_transition(self, e: Expr, label: str | None = None) -> None:
        """Constraint holding on every row but the last."""
        self._tag(label)
        self._fold(e * self.is_transition())

    def _tag(self, label: str | None) -> None:
        """Debug folders override to record the label of the next
        constraint; production folders ignore labels entirely."""

    # --- stacked (family) sinks ---
    def _fold_many(self, e: Expr) -> None:
        """Fold a stacked family of G constraints in one step:
        ``acc ← acc·α^G + Σ_g α^{G−1−g}·c_g`` — identical to folding the G
        constraints individually, but with a compiled program size
        independent of G."""
        if isinstance(self.backend, DegreeBackend):
            self.num_constraints += 1
            self.acc = e.val if self.acc is None else max(self.acc, e.val)
            return
        if isinstance(self.backend, ScalarBackend):
            vals = e.val if isinstance(e.val, list) else [e.val]
            for v in vals:
                self._fold(Expr(self.backend, e.kind, v))
            return
        # vector backend
        from ..field.goldilocks import (
            Fp as _Fp,
            Fp2 as _Fp2,
            fp2_mul,
            fp2_sum_axis0,
        )

        val = e.val
        if e.kind == "base":
            from ..field.goldilocks import fp_sub as _fp_sub

            val = _Fp2(val, _fp_sub(val, val))
        g = val.shape[0]
        self.num_constraints += g
        from ..field.goldilocks import fp2_powers

        # powers [1, α, ..., α^G] in log2(G) masked multiplies, memoized
        # across families (a prefix of a longer power array is reusable).
        if self._alpha_pow_arr is None or self._alpha_pow_arr.shape[0] < g + 1:
            self._alpha_pow_arr = fp2_powers(self._alpha.val, g + 1)
        pws = self._alpha_pow_arr  # (>=G+1,) ext
        desc = pws[0:g]
        desc = _Fp2(
            _Fp(desc.c0.lo[::-1][:, None], desc.c0.hi[::-1][:, None]),
            _Fp(desc.c1.lo[::-1][:, None], desc.c1.hi[::-1][:, None]),
        )  # (G, 1) ext, descending
        folded = fp2_sum_axis0(fp2_mul(desc, val))  # (nd,) ext
        folded_e = Expr(self.backend, "ext", folded)
        alpha_g = Expr(self.backend, "ext", pws[g])
        if self.acc is None:
            self.acc = folded_e
        else:
            self.acc = self.acc * alpha_g + folded_e

    def stack(self, exprs) -> Expr:
        """Stack a list of same-kind Exprs into one family Expr with a
        leading group axis, for use with ``assert_*_many``. Keeps the
        compiled constraint program size O(1) in the family size — the
        graph-size analog of the reference's batched linear combinations
        (prover/constraints/folder.rs:85-101)."""
        exprs = list(exprs)
        kind = "ext" if any(e.kind == "ext" for e in exprs) else "base"
        if isinstance(self.backend, DegreeBackend):
            return Expr(self.backend, "base", max(e.val for e in exprs))
        if isinstance(self.backend, ScalarBackend):
            # promotion must go through the backend: subclasses (e.g. the
            # bytecode recorder) represent the zero imaginary part
            # differently from the literal value 0
            vals = [
                e.val if e.kind == kind or kind == "base"
                else self.backend._ext(e.val, e.kind)
                for e in exprs
            ]
            return Expr(self.backend, kind, vals)
        import jax.numpy as _jnp

        from ..field.goldilocks import Fp as _Fp, Fp2 as _Fp2, fp_broadcast_to

        shape = self.backend.shape

        def to_fp2(e):
            if e.kind == "ext":
                return e.val
            zero = fp_broadcast_to(Fp(_jnp.uint32(0), _jnp.uint32(0)), shape)
            return _Fp2(fp_broadcast_to(e.val, shape), zero)

        if kind == "base":
            vals = [fp_broadcast_to(e.val, shape) for e in exprs]
            return Expr(
                self.backend,
                "base",
                _Fp(
                    _jnp.stack([v.lo for v in vals]),
                    _jnp.stack([v.hi for v in vals]),
                ),
            )
        vals = [to_fp2(e) for e in exprs]

        def stk(sel):
            return _Fp(
                _jnp.stack([sel(v).lo for v in vals]),
                _jnp.stack([sel(v).hi for v in vals]),
            )

        return Expr(
            self.backend, "ext", _Fp2(stk(lambda v: v.c0), stk(lambda v: v.c1))
        )

    def assert_zero_many(self, e: Expr, label: str | None = None) -> None:
        self._tag(label)
        self._fold_many(e)

    def assert_zero_first_row_many(self, e: Expr, label: str | None = None) -> None:
        self._tag(label)
        self._fold_many(e * self.is_first_row())

    def assert_zero_last_row_many(self, e: Expr, label: str | None = None) -> None:
        self._tag(label)
        self._fold_many(e * self.is_last_row())

    def assert_transition_many(self, e: Expr, label: str | None = None) -> None:
        self._tag(label)
        self._fold_many(e * self.is_transition())


# ---------------------------------------------------------------------------
# Air / MultiAir
# ---------------------------------------------------------------------------


class Air:
    """One AIR instance: main width, optional aux (LogUp) columns, periodic
    columns, and an ``eval`` over a :class:`Folder`.

    Mirrors the ``LiftedAir`` trait (crates/lifted-air/src/air.rs:48): window
    size is fixed at 2 rows (offset ∈ {0, 1}).
    """

    width: int = 0
    aux_width: int = 0
    preprocessed_width: int = 0
    num_randomness: int = 0
    num_aux_values: int = 0
    num_public_values: int = 0
    periodic_columns: Sequence[Sequence[int]] = ()

    # AIRs are stateless constraint definitions: hash/compare by type so
    # jitted evaluators (air as a static argument) cache across fresh
    # instances — otherwise every prove would retrace the quotient graph.
    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(other) is type(self)

    def eval(self, f: Folder) -> None:
        raise NotImplementedError

    def build_aux_trace(self, main, publics, aux_inputs, randomness):
        """main: numpy u64 (n, width). Returns (aux (n, aux_width, 2) u64,
        aux_values list[(c0,c1)])."""
        n = main.shape[0]
        return np.zeros((n, 0, 2), dtype=np.uint64), []

    def preprocessed_trace(self):
        """Fixed circuit data (lookup tables, selectors) committed once at
        setup: numpy u64 (n, preprocessed_width) with n equal to this AIR's
        main trace height, or None (reference: BaseAir::preprocessed_trace,
        crates/lifted-stark/src/preprocessed.rs:80-95)."""
        return None

    def constraint_degree(self) -> int:
        """Max degree multiple via the degree backend."""
        backend = DegreeBackend()
        one = Expr(backend, "base", 1)
        zero = Expr(backend, "base", 0)
        f = Folder(
            backend,
            main_fn=lambda c, o=0: Expr(backend, "base", 1),
            aux_fn=lambda c, o=0: Expr(backend, "base", 1),
            preprocessed_fn=lambda c, o=0: Expr(backend, "base", 1),
            # A period-p column is h(X^{n/p}) with degree up to n·(p−1)/p —
            # count it as a full trace-degree factor (conservative bound).
            periodic=[one] * len(self.periodic_columns),
            publics=[zero] * self.num_public_values,
            randomness=[zero] * self.num_randomness,
            aux_values=[zero] * self.num_aux_values,
            selectors=(one, one, Expr(backend, "base", 0)),
            alpha=zero,
        )
        self.eval(f)
        return int(f.acc or 1)


class MultiAir:
    """A set of AIRs proven together (MultiAir trait, lifted-air/src/air.rs).

    ``eval_external`` checks cross-AIR assertions (e.g. LogUp bus balance)
    over the per-AIR aux values; all entries must be zero.
    """

    def __init__(self, airs: Sequence[Air]):
        self.airs = list(airs)

    def num_public_values(self) -> int:
        return max((a.num_public_values for a in self.airs), default=0)

    def observe(self, challenger, publics, aux_inputs) -> None:
        challenger.observe_slice(publics)
        challenger.observe_slice(aux_inputs)

    def eval_external(self, randomness, aux_values, log_heights) -> list:
        return []


def aux_on_device_now(air) -> bool:
    """Whether this AIR's aux builder should receive device randomness.

    ``aux_on_device`` may be True (always — cheap builders), False, or
    "tpu" (only off the CPU test backend: the VM bus-spec graphs cost
    minutes of XLA:CPU compile per shape, so CPU tests keep the exact
    numeric builder)."""
    import jax as _jax

    v = getattr(air, "aux_on_device", False)
    if v == "tpu":
        return _jax.default_backend() != "cpu"
    return bool(v)
