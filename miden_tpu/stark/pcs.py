"""PCS prover: DEEP quotient + FRI commit/query phases on device.

Mirrors crates/lifted-stark/src/pcs/ (deep/prover.rs, fri/prover.rs,
prover.rs) with this framework's natural-domain-order conventions:

- Committed matrices hold LDE evaluations in natural order over their own
  canonical coset ``s_m·K_m`` (|K_m| = matrix height m).
- OOD evaluation of every committed column is barycentric over its own
  domain: ``f(z) = (z^m − s^m)/(m·s^m) · Σ_i f(x_i)·x_i/(z − x_i)`` — one
  batched inverse + one reduction per (matrix height, point).
- The DEEP quotient combines all columns with α (highest power on the first
  column) and the points with β:
  ``Q(X) = Σ_j β^j·(f_red(z_j) − f_red(X))/(z_j − X)``, shorter matrices
  lifted by cyclic repetition (pcs/deep/prover.rs:326-423's natural-order
  equivalent).
- FRI round r reshapes natural-order evals E into a (size/arity, arity)
  matrix: row k holds ``[E[k + j·size/arity] for j]`` — the coset
  ``x_k·⟨μ⟩`` (μ an arity-th root of unity). Folding recovers the
  low-degree combination via a size-arity iDFT + Horner at ``β/x_k``
  (pcs/fri/fold/).

Every Fiat-Shamir value (OOD point, DEEP α/β, FRI βs, PoW witnesses, query
indices) stays a **device scalar** threaded from the
:class:`~miden_tpu.transcript.device_challenger.DeviceChallenger`, so the
whole opening phase is one asynchronous device dependency graph with zero
blocking host round-trips (the round-1 profile showed per-phase host syncs
costing ~70 ms each over the TPU link).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial as _partial

import jax as _jax
import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..field.goldilocks import (
    Fp,
    Fp2,
    fp2_add,
    fp2_broadcast_to,
    fp2_concat,
    fp2_exp_power_of_2,
    fp2_from_pairs_u64,
    fp2_inv,
    fp2_mul,
    fp2_mul_base,
    fp2_powers,
    fp2_sub,
    fp2_sum_axis0,
    fp2_tile,
    fp2_zeros,
    fp_from_u64,
    fp_mul,
    fp_powers,
    fp_sub,
)
from ..merkle import lmcs
from ..ntt import ntt
from .domains import LiftedDomain
from .params import PcsParams
from ..utils.tracing import span

_POINTS_CACHE: dict = {}


def coset_points(log_size: int, shift: int) -> Fp:
    """Natural-order points of the coset shift·K, cached per (size, shift)."""
    key = (log_size, shift % gl.P)
    if key not in _POINTS_CACHE:
        # Eager even under jit trace: staged table builds become giant
        # constant-folding jobs for XLA (see ntt._stage_twiddles).
        with _jax.ensure_compile_time_eval():
            w = gl.two_adic_generator(log_size)
            p = fp_powers(w, 1 << log_size, shift=shift)
        if ntt._is_tracer(p):
            return p  # under trace of tracer shapes: don't cache tracers
        _POINTS_CACHE[key] = p
    return _POINTS_CACHE[key]


def _ext_scalar(z: tuple, shape=()) -> Fp2:
    return fp2_from_pairs_u64(np.array(z, dtype=np.uint64).reshape(*shape, 2))


def _bconst(c: int, shape) -> Fp:
    from ..field.goldilocks import fp_broadcast_to, fp_const

    return fp_broadcast_to(fp_const(c), shape)


# ---------------------------------------------------------------------------
# OOD evaluation (barycentric, device)
# ---------------------------------------------------------------------------


@_partial(_jax.jit, static_argnums=(0, 1, 2))
def _bary_weights_dev(log_m: int, shift: int, log_lift: int, z: Fp2, pts: Fp):
    """Shared barycentric factors for one (height, lift, point): the weight
    column ``x_i/(z_l − x_i)`` and the scalar scale ``(z_l^m − s^m)/(m·s^m)``.

    Split out of the per-matrix evaluation so matrices of the same height
    (across trees) reuse ONE inverse/weight graph — the Fermat-inverse scan
    and weight multiplies dominate the compiled size of the claims phase.
    ``pts`` is the coset point table (passed as an argument: a concrete
    table captured by a trace becomes a multi-MB MLIR *constant* in every
    enclosing fused-phase graph — slow uploads, and materializing it while
    HBM is nearly full OOMed the 2^20 claims phase)."""
    z_l = fp2_exp_power_of_2(z, log_lift)
    m = 1 << log_m
    zb = fp2_broadcast_to(z_l, (m,))
    denom = fp2_sub(zb, Fp2(pts, fp_sub(pts, pts)))
    weights = fp2_mul_base(fp2_inv(denom), pts)  # x_i / (z_l - x_i)
    sm = gl.exp_power_of_2(shift % gl.P, log_m)
    c = gl.inv(gl.mul(m % gl.P, sm))
    zm = fp2_exp_power_of_2(z_l, log_m)
    scale = fp2_mul_base(
        fp2_sub(zm, Fp2(_bconst(sm, ()), _bconst(0, ()))), _bconst(c, ())
    )
    return weights, scale


#: chunk row-reductions over matrices taller than this: the one-shot form
#: materializes an (m, w) extension product (4 u32 arrays — ~6.8 GB at
#: 2^23×51) and its log-depth halving intermediates, which blows the HBM
#: budget at the 2^20 contract size
_ROW_CHUNK_ABOVE = 1 << 22


def _row_chunks(m: int) -> int:
    # chunk to ~2^18-row slices: a (m, w) extension product at 2^23x51 is
    # ~850 MB per temp with only 8 chunks, and the claims/DEEP phases run
    # while the committed trees already hold most of HBM (2^20 OOM)
    return max(8, m >> 18)


@_jax.jit
def _weighted_eval_dev(weights: Fp2, scale: Fp2, matrix: Fp) -> Fp2:
    """scale · Σ_i weights_i·f_col(x_i) per column. Returns Fp2 (w,)."""
    m, w = matrix.shape

    def one_shot(wts: Fp2, mat: Fp) -> Fp2:
        wcol = Fp2(
            Fp(wts.c0.lo[:, None], wts.c0.hi[:, None]),
            Fp(wts.c1.lo[:, None], wts.c1.hi[:, None]),
        )
        return fp2_sum_axis0(fp2_mul_base(wcol, mat))  # (w,) ext

    if m <= _ROW_CHUNK_ABOVE:
        sums = one_shot(weights, matrix)
    else:
        c = _row_chunks(m)
        b = m // c
        wv = weights.reshape(c, b)
        mv = matrix.reshape(c, b, w)

        def body(acc: Fp2, xs):
            wts, mat = xs
            return fp2_add(acc, one_shot(wts, mat)), None

        sums, _ = _jax.lax.scan(body, fp2_zeros((w,)), (wv, mv))
    return fp2_mul(fp2_broadcast_to(scale, (w,)), sums)


@_partial(_jax.jit, static_argnums=(0, 1, 2))
def _eval_columns_dev(
    log_m: int, shift: int, log_lift: int, matrix: Fp, z: Fp2, pts: Fp
) -> Fp2:
    """Evaluate every column polynomial of ``matrix`` (natural-order evals
    over shift·K) at ``z^{2^log_lift}``. Returns Fp2 (w,)."""
    weights, scale = _bary_weights_dev(log_m, shift, log_lift, z, pts)
    return _weighted_eval_dev(weights, scale, matrix)


def eval_columns_at(matrix: Fp, shift: int, z) -> list:
    """Host-convenience wrapper (testing): evaluate columns at a host ext
    point, returning (c0, c1) int pairs."""
    from ..field.goldilocks import fp2_to_pairs_u64

    m, _w = matrix.shape
    vals = _eval_columns_dev(
        m.bit_length() - 1, shift, 0, matrix, _ext_scalar(tuple(z)),
        coset_points(m.bit_length() - 1, shift),
    )
    return [tuple(int(x) for x in p) for p in fp2_to_pairs_u64(vals)]


@dataclass
class DeepClaims:
    """Per-point OOD evaluation claims, aligned to the hashing layout.

    ``evals[point][tree]`` is one Fp2 array per tree holding the
    concatenated *aligned* column claims of all its matrices (zero pads
    included), matching the α-coefficient positions and the transcript
    claim stream. ``widths[tree]`` lists the unpadded widths per matrix.
    """

    evals: list  # [point][tree] -> Fp2 (K_tree,)
    aligned_widths: list  # [tree][matrix] -> aligned width


def compute_deep_claims(
    trees: list, zs: list, points=None, max_height=None
) -> DeepClaims:
    """Evaluate all committed columns of all trees at each opening point
    (device; one dispatch per (matrix, point), all asynchronous).

    A matrix of height h inside a tree of height H is the lift
    ``f(X^{H/h})``; its polynomial is evaluated at ``z^{lift}``. The max
    tree height across trees defines the common lift reference."""
    max_h = max(t.height for t in trees)
    out = []
    aligned = [
        [lmcs.aligned_width(m.shape[1]) for m in t.matrices] for t in trees
    ]
    for z in zs:
        per_tree = []
        for tree in trees:
            parts = []
            for matrix, h in zip(tree.matrices, tree.heights):
                w = matrix.shape[1]
                aw = lmcs.aligned_width(w)
                if w == 0:
                    continue
                lift = max_h // h
                shift = gl.canonical_lde_shift(h.bit_length() - 1)
                key = (h.bit_length() - 1, shift % gl.P)
                pts = (points or {}).get(key)
                if pts is None:
                    pts = coset_points(*key)
                vals = _eval_columns_dev(
                    h.bit_length() - 1, shift, lift.bit_length() - 1, matrix,
                    z, pts,
                )
                if aw > w:
                    vals = fp2_concat([vals, fp2_zeros((aw - w,))], axis=0)
                parts.append(vals)
            per_tree.append(
                fp2_concat(parts, axis=0) if parts else fp2_zeros((0,))
            )
        out.append(per_tree)
    return DeepClaims(evals=out, aligned_widths=aligned)


# ---------------------------------------------------------------------------
# DEEP quotient
# ---------------------------------------------------------------------------


def deep_compose(
    domain: LiftedDomain,
    trees: list,
    claims: DeepClaims,
    zs: list,
    alpha: Fp2,
    beta: Fp2,
    points=None,
) -> Fp2:
    """Build the DEEP quotient evaluations over the max LDE domain (natural
    order): ``Q(x) = Σ_j β^j·(f_red(z_j) − f_red(x))·1/(z_j − x)``.

    α/β and the claims are device values; α coefficients are assigned per
    aligned column with the highest power on the first column
    (deep/prover.rs Horner convention)."""
    total_w = sum(sum(aws) for aws in claims.aligned_widths)
    pows = fp2_powers(alpha, total_w)  # [1, α, ..., α^{W-1}]
    desc = pows[::-1]  # position i gets α^{W-1-i}

    # f_red(z_j) = Σ_i α^{W-1-i}·claim_i  (over the full aligned stream)
    f_red_zs = []
    for per_tree in claims.evals:
        flat = fp2_concat(per_tree, axis=0)
        f_red_zs.append(fp2_sum_axis0(fp2_mul(desc, flat)))
    f_red_z = Fp2(
        Fp(
            jnp.stack([v.c0.lo for v in f_red_zs]),
            jnp.stack([v.c0.hi for v in f_red_zs]),
        ),
        Fp(
            jnp.stack([v.c1.lo for v in f_red_zs]),
            jnp.stack([v.c1.hi for v in f_red_zs]),
        ),
    )

    # per-matrix α coefficient slices (first w of each aligned block)
    matrices = []
    coeff_arrays = []
    off = 0
    for tree, aws in zip(trees, claims.aligned_widths):
        for matrix, aw in zip(tree.matrices, aws):
            w = matrix.shape[1]
            if w:
                matrices.append(matrix)
                coeff_arrays.append(desc[off : off + w])
            off += aw

    zs_arr = Fp2(
        Fp(jnp.stack([z.c0.lo for z in zs]), jnp.stack([z.c0.hi for z in zs])),
        Fp(jnp.stack([z.c1.lo for z in zs]), jnp.stack([z.c1.hi for z in zs])),
    )
    bpows = fp2_powers(beta, len(zs))
    key = (domain.log_lde_height, domain.lde_shift % gl.P)
    pts = (points or {}).get(key)
    if pts is None:
        pts = coset_points(*key)
    return _deep_compose_dev(
        domain, tuple(matrices), tuple(coeff_arrays), f_red_z, zs_arr, bpows,
        pts,
    )


@_partial(_jax.jit, static_argnums=(0,))
def _deep_compose_dev(
    domain: LiftedDomain,
    matrices: tuple,
    coeff_arrays: tuple,
    f_red_zs: Fp2,
    zs: Fp2,
    bpows: Fp2,
    pts: Fp,
) -> Fp2:
    big_n = domain.lde_height
    f_red = None
    for matrix, carr in zip(matrices, coeff_arrays):
        h, w = matrix.shape
        crow = Fp2(
            Fp(carr.c0.lo[None, :], carr.c0.hi[None, :]),
            Fp(carr.c1.lo[None, :], carr.c1.hi[None, :]),
        )
        if h <= _ROW_CHUNK_ABOVE:
            part = fp2_sum_axis1(fp2_mul_base(crow, matrix))  # (h,) ext
        else:
            # chunk tall matrices: the (h, w) ext product is ~6.8 GB at
            # 2^23×51 (see _ROW_CHUNK_ABOVE)
            c = _row_chunks(h)
            b = h // c
            mv = matrix.reshape(c, b, w)

            def body(_, mat):
                return None, fp2_sum_axis1(fp2_mul_base(crow, mat))

            _, parts = _jax.lax.scan(body, None, mv)  # (c, b) ext
            part = parts.reshape(h)
        part = fp2_tile(part, big_n // h)
        f_red = part if f_red is None else fp2_add(f_red, part)

    zero = fp_sub(pts, pts)
    acc = None
    for j in range(zs.shape[0]):
        zb = fp2_broadcast_to(zs[j], (big_n,))
        inv_den = fp2_inv(fp2_sub(zb, Fp2(pts, zero)))
        num = fp2_sub(fp2_broadcast_to(f_red_zs[j], (big_n,)), f_red)
        term = fp2_mul(num, inv_den)
        if j > 0:
            term = fp2_mul(term, fp2_broadcast_to(bpows[j], (big_n,)))
        acc = term if acc is None else fp2_add(acc, term)
    return acc


def fp2_sum_axis1(x: Fp2) -> Fp2:
    from ..field.goldilocks import fp_sum_axis0

    def t(f):
        return Fp(f.lo.T, f.hi.T)

    return Fp2(fp_sum_axis0(t(x.c0)), fp_sum_axis0(t(x.c1)))


# ---------------------------------------------------------------------------
# FRI
# ---------------------------------------------------------------------------


def ext_to_base_matrix(x: Fp2) -> Fp:
    """(n, k) ext matrix → (n, 2k) base matrix, columns interleaved
    [e0.c0, e0.c1, e1.c0, ...]."""
    n, k = x.shape
    lo = jnp.stack([x.c0.lo, x.c1.lo], axis=2).reshape(n, 2 * k)
    hi = jnp.stack([x.c0.hi, x.c1.hi], axis=2).reshape(n, 2 * k)
    return Fp(lo, hi)


@_partial(_jax.jit, static_argnums=(0,))
def _fold_rows_dev(log_arity: int, mat: Fp2, x_inv: Fp, beta: Fp2) -> Fp2:
    """Fold each row's coset evals: size-arity iDFT + Horner at β/x_k.

    mat: (rows, arity) ext with column j = f(x_k·μ^j); x_inv: (rows,) base.
    Returns (rows,) ext: g(x_k^arity).
    """
    arity = 1 << log_arity
    mu_inv = gl.inv(gl.two_adic_generator(log_arity))
    rows = mat.shape[0]
    # c_t = Σ_j μ^{-jt}·y_j   (t = 0..arity-1)
    cs = []
    for t in range(arity):
        acc = None
        for j in range(arity):
            w = pow(mu_inv, (j * t) % arity, gl.P)
            col = mat[:, j]
            term = col if w == 1 else fp2_mul_base(
                col, _bconst(w, (rows,))
            )
            acc = term if acc is None else fp2_add(acc, term)
        cs.append(acc)
    # x = β·x_inv (ext (rows,)); result = (1/arity)·Σ_t c_t·x^t, Horner.
    x = fp2_mul_base(fp2_broadcast_to(beta, (rows,)), x_inv)
    acc = cs[-1]
    for t in reversed(range(arity - 1)):
        acc = fp2_add(fp2_mul(acc, x), cs[t])
    return fp2_mul_base(acc, _bconst(gl.inv(arity), (rows,)))


@dataclass
class FriProver:
    trees: list  # LmcsTree per round


@_partial(_jax.jit, static_argnums=(0,))
def _fri_round_prep(log_arity: int, cur: Fp2) -> tuple:
    """Reshape natural-order evals into the (rows, arity) coset matrix and
    its flattened base commitment matrix — one dispatch per round."""
    arity = 1 << log_arity
    n_rows = cur.shape[0] >> log_arity
    mat = Fp2(
        Fp(
            cur.c0.lo.reshape(arity, n_rows).T,
            cur.c0.hi.reshape(arity, n_rows).T,
        ),
        Fp(
            cur.c1.lo.reshape(arity, n_rows).T,
            cur.c1.hi.reshape(arity, n_rows).T,
        ),
    )
    return mat, ext_to_base_matrix(mat)


@_partial(_jax.jit, static_argnums=(0, 1))
def _x_inv_step(log_arity: int, next_rows: int, x_inv: Fp) -> Fp:
    nx = x_inv[:next_rows]
    for _ in range(log_arity):
        nx = fp_mul(nx, nx)
    return nx


@_partial(_jax.jit, static_argnums=(0, 2))
def _final_poly_dev(final_deg: int, cur: Fp2, shift: int = 1) -> Fp2:
    """Interpolate the last FRI layer over its coset, truncate to the degree
    bound, return **descending**-order coefficients (fri/prover.rs:228-239)."""
    comp = Fp(
        jnp.stack([cur.c0.lo, cur.c1.lo], axis=1),
        jnp.stack([cur.c0.hi, cur.c1.hi], axis=1),
    )  # (size, 2)
    coeffs_br = ntt.coset_interpolate_bitrev(comp, shift)
    coeffs = ntt.bitrev_perm(coeffs_br)[:final_deg]
    rev = coeffs[::-1]
    return Fp2(rev[:, 0], rev[:, 1])


def fri_x_inv_init(params: PcsParams, domain: LiftedDomain) -> Fp:
    """x_inv[k] = 1/(s·ω^k) over the first size/arity rows."""
    n_rows = domain.lde_height >> params.log_folding_arity
    return fp_powers(
        gl.inv(gl.two_adic_generator(domain.log_lde_height)),
        n_rows,
        shift=gl.inv(domain.lde_shift),
    )


def fri_num_rounds(params: PcsParams, domain: LiftedDomain) -> int:
    size = domain.lde_height
    final_domain_size = params.final_poly_degree << params.log_blowup
    rounds = 0
    while size > final_domain_size:
        size >>= params.log_folding_arity
        rounds += 1
    return rounds


def fri_round(params: PcsParams, cur: Fp2, x_inv: Fp, channel, last: bool):
    """One FRI round: reshape → commit → grind → β → fold (+ x_inv step).

    Returns (tree, folded, next_x_inv)."""
    log_arity = params.log_folding_arity
    n_rows = cur.shape[0] >> log_arity
    with span("FRI round commit", rows=n_rows):
        mat, mat_base = _fri_round_prep(log_arity, cur)
        tree = lmcs.build_tree([mat_base], hash=params.lmcs_hash())
    channel.send_commitment(tree.root_dev())
    channel.grind(params.folding_pow_bits)
    beta = channel.sample_ext()
    with span("FRI fold", rows=n_rows):
        folded = _fold_rows_dev(log_arity, mat, x_inv[:n_rows], beta)
    next_x_inv = (
        x_inv if last else _x_inv_step(log_arity, n_rows >> log_arity, x_inv)
    )
    return tree, folded, next_x_inv


def fri_final(params: PcsParams, domain: LiftedDomain, cur: Fp2, channel) -> None:
    """Interpolate + truncate the last layer and send the final polynomial."""
    rounds = fri_num_rounds(params, domain)
    cur_shift = gl.exp_power_of_2(
        domain.lde_shift, params.log_folding_arity * rounds
    )
    size = cur.shape[0]
    ntt._warm(size.bit_length() - 1, 0, [(gl.inv(cur_shift % gl.P), size)])
    final_poly = _final_poly_dev(params.final_poly_degree, cur, cur_shift)
    channel.send_ext_slice(final_poly)


def fri_commit(params: PcsParams, domain: LiftedDomain, evals: Fp2, channel) -> FriProver:
    """FRI commit phase (pcs/fri/prover.rs:93-242, natural-order variant).

    Every round's root observation, PoW grind, and β sample run on the
    device challenger — the round loop dispatches asynchronously with no
    host sync."""
    rounds = fri_num_rounds(params, domain)
    x_inv = fri_x_inv_init(params, domain)
    trees = []
    cur = evals
    for r in range(rounds):
        tree, cur, x_inv = fri_round(params, cur, x_inv, channel, r == rounds - 1)
        trees.append(tree)
    fri_final(params, domain, cur, channel)
    return FriProver(trees=trees)


def open_with_channel(
    params: PcsParams,
    domain: LiftedDomain,
    trees: list,
    zs: list,
    channel,
):
    """PCS opening through query-index sampling (pcs/prover.rs:35-105):
    DEEP → FRI → PoW → sample indices. Returns (fri_trees, index scalar
    array) — the caller materializes the transcript and runs the (host-
    directed) query gather phase."""
    with span("evaluate at OOD points"):
        claims = compute_deep_claims(trees, zs)
    # 1. Bind claims: per point, the flat aligned stream.
    for per_tree in claims.evals:
        channel.send_ext_slice(fp2_concat(per_tree, axis=0))
    # 2. PoW + DEEP challenges.
    with span("DEEP grind", bits=params.deep_pow_bits):
        channel.grind(params.deep_pow_bits)
    alpha = channel.sample_ext()
    beta = channel.sample_ext()
    # 3. DEEP quotient over the max LDE domain.
    with span("DEEP reduce + assemble"):
        deep_evals = deep_compose(domain, trees, claims, zs, alpha, beta)
    # 4. FRI commit phase.
    with span("FRI commit phase"):
        fri = fri_commit(params, domain, deep_evals, channel)
    # 5. Query PoW + indices (device scalars; masked host-side after the
    #    single readback).
    with span("query grind", bits=params.query_pow_bits):
        channel.grind(params.query_pow_bits)
    idx_scalars = [channel.sample() for _ in range(params.num_queries)]
    idx_arr = Fp(
        jnp.stack([s.lo for s in idx_scalars]),
        jnp.stack([s.hi for s in idx_scalars]),
    )
    return fri.trees, idx_arr
