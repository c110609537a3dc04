"""secp256k1 EC session chiplets: complete group-law add claims on the
deferred-precompile session STARK.

Reference scope: ``precompiles-prover/src/ec/`` — the reference proves
EC statements with four chiplets (group table, point store, add, MSM)
that delegate 256-bit field math to uint MAC relations over byte-LUT
range checks. This module is the TPU-first redesign at claim
granularity:

- :class:`EcMacAir` — the **modular MAC chiplet**: one row proves
  ``a·b + m·(c·d) + e − f − g ≡ 0 (mod p_secp256k1)`` for 256-bit
  operands in 16-bit limbs (a 16×16 carry-save convolution like the
  session U256 mul rows), with a 17-limb quotient witness and every
  limb/carry range-checked against the shared 2^16 table. ``m`` is
  −1 or −3 (flag-selected), which is exactly enough to express every
  secp256k1 group-law identity in one row each — the analog of the
  reference's ``UintMul`` MAC trio (ec/mod.rs "curve-membership MAC").
- :class:`EcOpAir` — the **group-law chiplet**: one row per EC add
  claim carrying both operand points, the result, and the case
  witnesses (λ, Δ, Δ⁻¹, 2y, x²), with a complete-law case split
  (infinity-A / infinity-B / chord / tangent / negation) mirroring the
  reference's complete ``EcGroupAddAir`` (ec/add/mod.rs). Field math is
  delegated to the MAC chiplet over a LogUp bus; operand digests are
  re-derived by wiring two Poseidon2 absorbs per point to the shared
  permutation chiplet; the claim removes the session chain's
  ``[cid, ha, hb, ho]`` claim-bus message, so EC claims mix freely with
  u256/keccak claims in any order.

MAC messages carry seven 256-bit operands (57 felts) — wider than the
session's 16-element message bound — so the MAC bus uses a **long-form
encoding** with the bus prefix at β^64: a short-form message (prefix at
β^16) can never collide with a long-form one, because equality of the
two random linear combinations would force the long form's β^64
coefficient (bus+1 ≥ 1) to match the short form's zero.

Infinity is the (0, 0) sentinel ((0,0) is not on the curve), mirroring
the reference's ``is_pai`` flag + none-sentinel ptrs (ec/mod.rs).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gl
from ..hash import poseidon2_host as hp
from ..stark.air import Air
from ..vm.constraints.buses import BUS_WIRING_IN, BUS_WIRING_OUT, Challenges, mux
from ..vm.deferred import (
    PID_EC_ADD,
    secp256k1_complete_add,
)

P = gl.P

#: session-local MAC bus id (disjoint from wiring + SBUS_CLAIM/RANGE)
SBUS_MAC = 14

#: long-form message width bound (bus prefix at β^W_LONG)
W_LONG = 64

EC_PRIME = 2**256 - 2**32 - 977
_MASK16 = (1 << 16) - 1
_B23 = 1 << 23


def _limbs16(x: int) -> list[int]:
    return [(x >> (16 * i)) & _MASK16 for i in range(16)]


def _limbs32(x: int) -> list[int]:
    return [(x >> (32 * i)) & 0xFFFFFFFF for i in range(8)]


_P16 = _limbs16(EC_PRIME)
#: constant limb coefficients of 8·2^256·p (the positivity offset)
_OFF = [0] * 16 + [8 * v for v in _P16]
_OFFSET_INT = 8 * (1 << 256) * EC_PRIME


class LongChallenges(Challenges):
    """β-power table for long-form (≤64-element) bus messages.

    ``D = α + (bus+1)·β^64 + Σ_{k<64} β^k·elem_k`` — collision-free
    against the 16-element short form (see module docstring)."""

    def __init__(self, f):
        alpha = f.rand(0)
        beta = f.rand(1)
        pows = [f.const(1), beta]
        for _ in range(W_LONG - 1):
            pows.append(pows[-1] * beta)
        self.beta = pows  # β^0 .. β^64
        self.alpha = alpha

    def msg(self, bus: int, elems):
        d = self.alpha + self.beta[W_LONG] * (bus + 1)
        for k, e in enumerate(elems):
            if isinstance(e, int) and e == 0:
                continue
            d = d + self.beta[k] * e
        return d


# ---------------------------------------------------------------------------
# Claims
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EcAddClaim:
    """Claim: out = a + b on secp256k1 (complete affine group law,
    (0, 0) = point at infinity)."""

    a: tuple
    b: tuple

    def __post_init__(self):
        for x, y in (self.a, self.b):
            assert 0 <= x < (1 << 256) and 0 <= y < (1 << 256)

    @property
    def out(self) -> tuple:
        return secp256k1_complete_add(self.a, self.b)

    @property
    def id(self) -> int:
        return PID_EC_ADD


def point_digest_states(pt) -> tuple:
    """(s1, s2) full Poseidon2 states of the two-chunk point-node sponge
    (deferred.ec_point_node digest = s2[0:4])."""
    x, y = pt
    s1 = hp.permute([*_limbs32(x), 2, 0, 0, 0])
    s2 = hp.permute([*_limbs32(y), *s1[8:12]])
    return s1, s2


def point_digest(pt) -> tuple:
    return tuple(point_digest_states(pt)[1][0:4])


# ---------------------------------------------------------------------------
# MAC chiplet
# ---------------------------------------------------------------------------

M_ACT = 0
M_M3 = 1
M_A = list(range(2, 18))
M_B = list(range(18, 34))
M_C = list(range(34, 50))
M_D = list(range(50, 66))
M_E = list(range(66, 82))
M_F = list(range(82, 98))
M_G = list(range(98, 114))
M_T = list(range(114, 131))  # 17 quotient limbs (top < 16)
M_CLO = list(range(131, 162))  # 31 carry-lo limbs (16-bit)
M_CHI = list(range(162, 193))  # 31 carry-hi limbs (< 256)
MAC_WIDTH = 193


def _packed32_cols(f, cols):
    limbs = [f.main(c) for c in cols]
    return [limbs[2 * j] + limbs[2 * j + 1] * (1 << 16) for j in range(8)]


def mac_message(f, long_ch):
    """The long-form MAC provide message, built from the row's limbs."""
    m3 = f.main(M_M3)
    elems = [m3]
    for block in (M_A, M_B, M_C, M_D, M_E, M_F, M_G):
        elems.extend(_packed32_cols(f, block))
    return long_ch.msg(SBUS_MAC, elems)


def mac_bus_columns(f):
    """1 provide column + 48 range-check columns (4 values each)."""
    from .session import SBUS_RANGE

    ch = Challenges(f)
    lch = LongChallenges(f)
    one = f.const(1)
    act = f.main(M_ACT)

    cols = [mux(one, [(act, [(1, mac_message(f, lch))])])]
    vals = [f.main(c) for c in (*M_A, *M_B, *M_C, *M_D, *M_E, *M_F, *M_G)]
    vals += [f.main(c) for c in M_T[0:16]]
    vals.append(f.main(M_T[16]) * 4096)  # top quotient limb < 16
    vals += [f.main(c) for c in M_CLO]
    vals += [f.main(c) * 256 for c in M_CHI]  # carry-hi < 256
    for g in range(0, len(vals), 4):
        fracs = [(1, ch.msg(SBUS_RANGE, [v])) for v in vals[g : g + 4]]
        cols.append(mux(one, [(act, fracs)]))
    return cols


class EcMacAir(Air):
    """Modular MAC rows: a·b + m·(c·d) + e − f − g ≡ 0 (mod p_secp).

    Integer identity proven limb-wise with signed offset carries:
    ``conv(a,b) − (1+2·m3)·conv(c,d) + e − f − g + 8·2^256·p = t·p``
    over ℤ, all limbs 16-bit range-checked, t a 17-limb quotient. The
    row-level analog of the reference's UintMul MAC relation
    (precompiles-prover/src/uint/mul/) with the secp256k1 modulus folded
    into the convolution instead of a wrapping 2^256 cut."""

    width = MAC_WIDTH
    aux_width = 1 + 49
    num_randomness = 2
    num_aux_values = 1
    num_public_values = 8

    def eval(self, f) -> None:
        fam = {"zero": [], "trans": [], "first": [], "last": []}

        def A(kind, e, label):
            fam[kind].append((e, label))

        act = f.main(M_ACT)
        actn = f.main(M_ACT, 1)
        m3 = f.main(M_M3)
        a = [f.main(c) for c in M_A]
        b = [f.main(c) for c in M_B]
        c = [f.main(c_) for c_ in M_C]
        d = [f.main(c_) for c_ in M_D]
        e = [f.main(c_) for c_ in M_E]
        ff = [f.main(c_) for c_ in M_F]
        g = [f.main(c_) for c_ in M_G]
        t = [f.main(c_) for c_ in M_T]
        clo = [f.main(c_) for c_ in M_CLO]
        chi = [f.main(c_) for c_ in M_CHI]

        A("zero", act * (act - 1), "act/bool")
        A("trans", (1 - act) * actn, "act/monotone")
        A("last", act, "act/last_padding")
        A("zero", m3 * (m3 - 1), "m3/bool")
        A("zero", (1 - act) * m3, "m3/pad_zero")

        def conv(u, v, k):
            s = f.const(0)
            for i in range(max(0, k - len(v) + 1), min(k + 1, len(u))):
                s = s + u[i] * v[k - i]
            return s

        carries = [clo[i] + chi[i] * (1 << 16) for i in range(31)]
        mneg = 1 + m3 * 2  # |m| = 1 + 2·m3 (m = −|m|)
        for k in range(32):
            val = conv(a, b, k) - mneg * conv(c, d, k)
            if k < 16:
                val = val + e[k] - ff[k] - g[k]
            if _OFF[k]:
                val = val + _OFF[k]
            # t·p convolution (p limbs are constants)
            tp = f.const(0)
            for i in range(max(0, k - 15), min(k + 1, 17)):
                if _P16[k - i]:
                    tp = tp + t[i] * _P16[k - i]
            val = val - tp
            if k > 0:
                val = val + carries[k - 1] - _B23
            if k < 31:
                val = val - (carries[k] - _B23) * (1 << 16)
            A("zero", act * val, f"mac/limb{k}")

        cols = mac_bus_columns(f)
        acc = f.aux(0)
        accn = f.aux(0, 1)
        for k, (V, U) in enumerate(cols):
            av = f.aux(1 + k)
            A("trans", U * av - V, f"bus/frac{k}")
        total = f.aux(1)
        for k in range(1, len(cols)):
            total = total + f.aux(1 + k)
        A("trans", accn - acc - total, "bus/acc")
        A("first", acc, "bus/acc_first")
        A("last", acc - f.aux_value(0), "bus/acc_final")

        self.label_order = []
        for kind, sink in (
            ("zero", f.assert_zero_many),
            ("trans", f.assert_transition_many),
            ("first", f.assert_zero_first_row_many),
            ("last", f.assert_zero_last_row_many),
        ):
            items = fam[kind]
            if items:
                sink(f.stack([e_ for e_, _ in items]), f"family/{kind}")
                self.label_order.extend(label for _, label in items)

    aux_on_device = "tpu"

    def build_aux_trace(self, main, publics, aux_inputs, randomness):
        from ..vm.constraints.aux_numeric import build_aux_dispatch

        return build_aux_dispatch(
            self, main, publics, randomness, mac_bus_columns
        )


@dataclass(frozen=True)
class MacSpec:
    """One MAC row: a·b + m·(c·d) + e − f − g ≡ 0 (mod p), m = −1−2·m3."""

    a: int
    b: int
    c: int = 0
    d: int = 0
    e: int = 0
    f: int = 0
    g: int = 0
    m3: int = 0

    def check(self) -> None:
        m = -(1 + 2 * self.m3)
        assert (
            self.a * self.b + m * self.c * self.d + self.e - self.f - self.g
        ) % EC_PRIME == 0, "MAC spec does not hold"

    def message_elems(self) -> list[int]:
        elems = [self.m3]
        for v in (self.a, self.b, self.c, self.d, self.e, self.f, self.g):
            elems.extend(_limbs32(v))
        return elems


def build_mac_rows(specs, counts=None) -> np.ndarray:
    """MAC trace rows (one per spec) + range-table multiplicities."""
    n = len(specs)
    rows = 1 << max(1, (n + 1 - 1).bit_length())
    mat = np.zeros((rows, MAC_WIDTH), dtype=np.uint64)
    for r, s in enumerate(specs):
        s.check()
        row = mat[r]
        row[M_ACT] = 1
        row[M_M3] = s.m3
        la, lb = _limbs16(s.a), _limbs16(s.b)
        lc, ld = _limbs16(s.c), _limbs16(s.d)
        le, lf, lg = _limbs16(s.e), _limbs16(s.f), _limbs16(s.g)
        row[M_A], row[M_B], row[M_C], row[M_D] = la, lb, lc, ld
        row[M_E], row[M_F], row[M_G] = le, lf, lg
        m = -(1 + 2 * s.m3)
        big = (
            s.a * s.b
            + m * s.c * s.d
            + s.e
            - s.f
            - s.g
            + _OFFSET_INT
        )
        t, rem = divmod(big, EC_PRIME)
        assert rem == 0 and 0 <= t < 16 << 256
        lt = _limbs16(t & ((1 << 256) - 1)) + [t >> 256]
        row[M_T] = lt
        carry = 0
        for k in range(31):
            val = sum(la[i] * lb[k - i] for i in range(max(0, k - 15), min(k + 1, 16)))
            val += m * sum(
                lc[i] * ld[k - i] for i in range(max(0, k - 15), min(k + 1, 16))
            )
            if k < 16:
                val += le[k] - lf[k] - lg[k]
            val += _OFF[k]
            val -= sum(
                lt[i] * _P16[k - i] for i in range(max(0, k - 15), min(k + 1, 17))
            )
            tot = val + carry
            assert tot % (1 << 16) == 0, f"carry misalignment at limb {k}"
            carry = tot >> 16
            off = carry + _B23
            assert 0 <= off < 1 << 24
            row[M_CLO[k]] = off & _MASK16
            row[M_CHI[k]] = off >> 16
        if counts is not None:
            for v in (*la, *lb, *lc, *ld, *le, *lf, *lg, *lt[0:16]):
                counts[v] += 1
            counts[lt[16] * 4096] += 1
            for k in range(31):
                counts[int(mat[r, M_CLO[k]])] += 1
                counts[int(mat[r, M_CHI[k]]) * 256] += 1
    return mat


# ---------------------------------------------------------------------------
# Group-law chiplet
# ---------------------------------------------------------------------------

E_ACT = 0
E_PERM = 1
E_CID = 2
E_FIA = 3
E_FIB = 4
E_FADD = 5
E_FDBL = 6
E_FNEG = 7
E_XA = list(range(8, 16))
E_YA = list(range(16, 24))
E_XB = list(range(24, 32))
E_YB = list(range(32, 40))
E_XR = list(range(40, 48))
E_YR = list(range(48, 56))
E_LAM = list(range(56, 64))
E_DLT = list(range(64, 72))
E_DLI = list(range(72, 80))
E_W2Y = list(range(80, 88))
E_UA = list(range(88, 96))
E_UB = list(range(96, 104))
E_SA1 = list(range(104, 116))
E_SA2 = list(range(116, 128))
E_SB1 = list(range(128, 140))
E_SB2 = list(range(140, 152))
E_SO1 = list(range(152, 164))
E_SO2 = list(range(164, 176))
EC_WIDTH = 176

_ONE8 = [1] + [0] * 7
_SEVEN8 = [7] + [0] * 7
_ZERO8 = [0] * 8


def ec_bus_columns(f):
    """6 digest-wiring columns (one per Poseidon2 cycle), the claim-bus
    removal, and 4 flag-muxed MAC-consume columns."""
    from .session import SBUS_CLAIM

    ch = Challenges(f)
    lch = LongChallenges(f)
    one = f.const(1)
    act = f.main(E_ACT)
    perm = f.main(E_PERM)
    cid = f.main(E_CID)
    fadd = f.main(E_FADD)
    fdbl = f.main(E_FDBL)
    fneg = f.main(E_FNEG)
    xa = [f.main(c) for c in E_XA]
    ya = [f.main(c) for c in E_YA]
    xb = [f.main(c) for c in E_XB]
    yb = [f.main(c) for c in E_YB]
    xr = [f.main(c) for c in E_XR]
    yr = [f.main(c) for c in E_YR]
    lam = [f.main(c) for c in E_LAM]
    dlt = [f.main(c) for c in E_DLT]
    dli = [f.main(c) for c in E_DLI]
    w2y = [f.main(c) for c in E_W2Y]
    ua = [f.main(c) for c in E_UA]
    ub = [f.main(c) for c in E_UB]

    cols = []
    # digest wiring: two absorbs per point, cycle ids perm..perm+5
    for k, (xc, yc, s1c, s2c) in enumerate(
        (
            (xa, ya, E_SA1, E_SA2),
            (xb, yb, E_SB1, E_SB2),
            (xr, yr, E_SO1, E_SO2),
        )
    ):
        s1 = [f.main(c) for c in s1c]
        s2 = [f.main(c) for c in s2c]
        in0 = ch.msg(BUS_WIRING_IN, [perm + 2 * k, *xc, 2, 0, 0, 0])
        out0 = ch.msg(BUS_WIRING_OUT, [perm + 2 * k, *s1])
        in1 = ch.msg(
            BUS_WIRING_IN,
            [perm + 2 * k + 1, *yc, s1[8], s1[9], s1[10], s1[11]],
        )
        out1 = ch.msg(BUS_WIRING_OUT, [perm + 2 * k + 1, *s2])
        cols.append(mux(one, [(act, [(1, in0), (1, out0)])]))
        cols.append(mux(one, [(act, [(1, in1), (1, out1)])]))
    sa2 = [f.main(c) for c in E_SA2]
    sb2 = [f.main(c) for c in E_SB2]
    so2 = [f.main(c) for c in E_SO2]
    claim = ch.msg(SBUS_CLAIM, [cid, *sa2[0:4], *sb2[0:4], *so2[0:4]])
    cols.append(mux(one, [(act, [(-1, claim)])]))

    def mac(m3, a, b, c=_ZERO8, d=_ZERO8, e=_ZERO8, fo=_ZERO8, g=_ZERO8):
        return lch.msg(SBUS_MAC, [m3, *a, *b, *c, *d, *e, *fo, *g])

    m_slope = mac(0, lam, xb, lam, xa, ya, yb)
    m_x3 = mac(0, lam, lam, xr, _ONE8, _ZERO8, xa, xb)
    m_y3 = mac(0, lam, xa, lam, xr, _ZERO8, ya, yr)
    m_dlt = mac(0, dlt, _ONE8, _ZERO8, _ZERO8, xa, xb)
    m_inv = mac(0, dlt, dli, _ZERO8, _ZERO8, _ZERO8, _ONE8)
    m_oc_au = mac(0, xa, xa, ua, _ONE8)
    m_oc_a = mac(0, ya, ya, ua, xa, _ZERO8, _SEVEN8)
    m_oc_bu = mac(0, xb, xb, ub, _ONE8)
    m_oc_b = mac(0, yb, yb, ub, xb, _ZERO8, _SEVEN8)
    m_w = mac(0, w2y, _ONE8, _ZERO8, _ZERO8, _ZERO8, ya, ya)
    m_slope_d = mac(1, lam, w2y, xa, xa)
    m_neg = mac(0, ya, _ONE8, _ZERO8, _ZERO8, yb)

    cols.append(
        mux(
            one,
            [
                (fadd, [(-1, m_slope), (-1, m_x3), (-1, m_y3)]),
                (fdbl, [(-1, m_w), (-1, m_slope_d), (-1, m_x3)]),
                (fneg, [(-1, m_neg)]),
            ],
        )
    )
    cols.append(
        mux(
            one,
            [
                (fadd, [(-1, m_dlt), (-1, m_inv)]),
                (fdbl, [(-1, m_y3)]),
            ],
        )
    )
    cols.append(
        mux(one, [(fadd + fdbl + fneg, [(-1, m_oc_au), (-1, m_oc_a)])])
    )
    cols.append(mux(one, [(fadd, [(-1, m_oc_bu), (-1, m_oc_b)])]))
    return cols


class EcOpAir(Air):
    """Complete secp256k1 group-law rows (one per EC add claim).

    Case flags (one-hot): infinity-A → R = B; infinity-B → R = A;
    chord (x₁ ≠ x₂, proven by Δ·Δ⁻¹ ≡ 1); tangent (A = B limb-exact);
    negation (x equal, y₁ + y₂ ≡ 0 → R = (0,0)). Finite cases consume
    on-curve MACs for their operands ("stored ⟹ on-curve",
    ec/mod.rs), making the (0,0) sentinel unusable in a finite case.
    """

    width = EC_WIDTH
    aux_width = 1 + 11
    num_randomness = 2
    num_aux_values = 1
    num_public_values = 8

    def eval(self, f) -> None:
        fam = {"zero": [], "trans": [], "first": [], "last": []}

        def A(kind, e, label):
            fam[kind].append((e, label))

        act = f.main(E_ACT)
        actn = f.main(E_ACT, 1)
        perm = f.main(E_PERM)
        permn = f.main(E_PERM, 1)
        cid = f.main(E_CID)
        flags = [f.main(c) for c in (E_FIA, E_FIB, E_FADD, E_FDBL, E_FNEG)]
        fia, fib, fadd, fdbl, fneg = flags
        xa = [f.main(c) for c in E_XA]
        ya = [f.main(c) for c in E_YA]
        xb = [f.main(c) for c in E_XB]
        yb = [f.main(c) for c in E_YB]
        xr = [f.main(c) for c in E_XR]
        yr = [f.main(c) for c in E_YR]

        A("zero", act * (act - 1), "act/bool")
        A("trans", (1 - act) * actn, "act/monotone")
        A("last", act, "act/last_padding")
        total_flags = flags[0]
        for fl in flags[1:]:
            total_flags = total_flags + fl
        for j, fl in enumerate(flags):
            A("zero", fl * (fl - 1), f"flag/bool{j}")
            A("zero", (1 - act) * fl, f"flag/pad_zero{j}")
        A("zero", act * (total_flags - 1), "flag/one_hot")
        A("zero", act * (cid - PID_EC_ADD), "id/ec_add")

        n_claims = f.public(4)
        n_u256 = f.public(5)
        n_km = f.public(6)
        A("first", perm - (n_claims + n_u256 + n_km) * 3, "perm/first")
        A("trans", actn * (permn - perm - 6), "perm/step")

        for i in range(8):
            A("zero", fia * xa[i], f"ia/xa{i}")
            A("zero", fia * ya[i], f"ia/ya{i}")
            A("zero", fia * (xr[i] - xb[i]), f"ia/xr{i}")
            A("zero", fia * (yr[i] - yb[i]), f"ia/yr{i}")
            A("zero", fib * xb[i], f"ib/xb{i}")
            A("zero", fib * yb[i], f"ib/yb{i}")
            A("zero", fib * (xr[i] - xa[i]), f"ib/xr{i}")
            A("zero", fib * (yr[i] - ya[i]), f"ib/yr{i}")
            A("zero", fdbl * (xa[i] - xb[i]), f"dbl/xeq{i}")
            A("zero", fdbl * (ya[i] - yb[i]), f"dbl/yeq{i}")
            A("zero", fneg * (xa[i] - xb[i]), f"neg/xeq{i}")
            A("zero", fneg * xr[i], f"neg/xr{i}")
            A("zero", fneg * yr[i], f"neg/yr{i}")

        cols = ec_bus_columns(f)
        acc = f.aux(0)
        accn = f.aux(0, 1)
        for k, (V, U) in enumerate(cols):
            av = f.aux(1 + k)
            A("trans", U * av - V, f"bus/frac{k}")
        total = f.aux(1)
        for k in range(1, len(cols)):
            total = total + f.aux(1 + k)
        A("trans", accn - acc - total, "bus/acc")
        A("first", acc, "bus/acc_first")
        A("last", acc - f.aux_value(0), "bus/acc_final")

        self.label_order = []
        for kind, sink in (
            ("zero", f.assert_zero_many),
            ("trans", f.assert_transition_many),
            ("first", f.assert_zero_first_row_many),
            ("last", f.assert_zero_last_row_many),
        ):
            items = fam[kind]
            if items:
                sink(f.stack([e for e, _ in items]), f"family/{kind}")
                self.label_order.extend(label for _, label in items)

    aux_on_device = "tpu"

    def build_aux_trace(self, main, publics, aux_inputs, randomness):
        from ..vm.constraints.aux_numeric import build_aux_dispatch

        return build_aux_dispatch(
            self, main, publics, randomness, ec_bus_columns
        )


# ---------------------------------------------------------------------------
# Trace builders
# ---------------------------------------------------------------------------


def _inv_mod_p(v: int) -> int:
    return pow(v, -1, EC_PRIME)


def ec_case_and_witnesses(p, q) -> tuple:
    """(flag_name, witnesses dict, mac specs) for one complete-add row;
    the host twin of the EcOpAir case split."""
    x1, y1 = p
    x2, y2 = q
    w = dict(lam=0, dlt=0, dli=0, w2y=0, ua=0, ub=0)
    if p == (0, 0):
        return "ia", w, []
    if q == (0, 0):
        return "ib", w, []
    specs = []
    w["ua"] = x1 * x1 % EC_PRIME
    oc_a = [
        MacSpec(a=x1, b=x1, c=w["ua"], d=1),
        MacSpec(a=y1, b=y1, c=w["ua"], d=x1, f=7),
    ]
    r = secp256k1_complete_add(p, q)
    x3, y3 = r
    if x1 == x2 and y1 == y2:
        w["w2y"] = 2 * y1 % EC_PRIME
        w["lam"] = 3 * x1 * x1 * _inv_mod_p(w["w2y"]) % EC_PRIME
        specs = [
            MacSpec(a=w["w2y"], b=1, f=y1, g=y1),
            MacSpec(a=w["lam"], b=w["w2y"], c=x1, d=x1, m3=1),
            MacSpec(a=w["lam"], b=w["lam"], c=x3, d=1, f=x1, g=x2),
            MacSpec(a=w["lam"], b=x1, c=w["lam"], d=x3, f=y1, g=y3),
            *oc_a,
        ]
        return "dbl", w, specs
    if x1 == x2:  # y2 = −y1: result infinity
        specs = [MacSpec(a=y1, b=1, e=y2), *oc_a]
        return "neg", w, specs
    w["ub"] = x2 * x2 % EC_PRIME
    w["dlt"] = (x2 - x1) % EC_PRIME
    w["dli"] = _inv_mod_p(w["dlt"])
    w["lam"] = (y2 - y1) * w["dli"] % EC_PRIME
    specs = [
        MacSpec(a=w["lam"], b=x2, c=w["lam"], d=x1, e=y1, f=y2),
        MacSpec(a=w["lam"], b=w["lam"], c=x3, d=1, f=x1, g=x2),
        MacSpec(a=w["lam"], b=x1, c=w["lam"], d=x3, f=y1, g=y3),
        MacSpec(a=w["dlt"], b=1, e=x1, f=x2),
        MacSpec(a=w["dlt"], b=w["dli"], f=1),
        *oc_a,
        MacSpec(a=x2, b=x2, c=w["ub"], d=1),
        MacSpec(a=y2, b=y2, c=w["ub"], d=x2, f=7),
    ]
    return "add", w, specs


_FLAG_COL = {
    "ia": E_FIA,
    "ib": E_FIB,
    "add": E_FADD,
    "dbl": E_FDBL,
    "neg": E_FNEG,
}


def build_ec_traces(ec_claims, perm_base: int, perm_cycles, counts=None):
    """(op_matrix, mac_matrix): EcOp rows consume perm cycles
    perm_base + 6j (appended to ``perm_cycles``) and emit MAC rows."""
    nec = len(ec_claims)
    rows = 1 << max(1, nec.bit_length())  # pow2 ≥ nec+1 (≥ 1 pad row)
    if rows <= nec:
        rows <<= 1
    op = np.zeros((rows, EC_WIDTH), dtype=np.uint64)
    op[0, E_PERM] = perm_base  # perm/first anchor even with zero claims
    all_specs = []
    for j, cl in enumerate(ec_claims):
        p, q, r = cl.a, cl.b, cl.out
        case, w, specs = ec_case_and_witnesses(p, q)
        all_specs.extend(specs)
        row = op[j]
        row[E_ACT] = 1
        row[E_PERM] = perm_base + 6 * j
        row[E_CID] = cl.id
        row[_FLAG_COL[case]] = 1
        row[E_XA], row[E_YA] = _limbs32(p[0]), _limbs32(p[1])
        row[E_XB], row[E_YB] = _limbs32(q[0]), _limbs32(q[1])
        row[E_XR], row[E_YR] = _limbs32(r[0]), _limbs32(r[1])
        row[E_LAM] = _limbs32(w["lam"])
        row[E_DLT] = _limbs32(w["dlt"])
        row[E_DLI] = _limbs32(w["dli"])
        row[E_W2Y] = _limbs32(w["w2y"])
        row[E_UA] = _limbs32(w["ua"])
        row[E_UB] = _limbs32(w["ub"])
        for pt, (s1c, s2c) in (
            (p, (E_SA1, E_SA2)),
            (q, (E_SB1, E_SB2)),
            (r, (E_SO1, E_SO2)),
        ):
            s1, s2 = point_digest_states(pt)
            row[s1c] = s1
            row[s2c] = s2
            perm_cycles.append(([*_limbs32(pt[0]), 2, 0, 0, 0], 1))
            perm_cycles.append(([*_limbs32(pt[1]), *s1[8:12]], 1))
    mac = build_mac_rows(all_specs, counts)
    return op, mac
