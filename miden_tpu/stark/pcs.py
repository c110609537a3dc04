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
    fp2_from_pairs_u64,
    fp2_inv,
    fp2_mul,
    fp2_mul_base,
    fp2_sub,
    fp2_sum_axis0,
    fp2_tile,
    fp2_to_pairs_u64,
    fp2_broadcast_to,
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


def eval_columns_at(matrix: Fp, shift: int, z: tuple) -> list:
    """Evaluate every column polynomial of ``matrix`` (natural-order evals
    over shift·K) at the extension point z. Returns list of (c0, c1) ints."""
    m, _w = matrix.shape
    log_m = m.bit_length() - 1
    sums = _weighted_colsum_dev(log_m, shift, matrix, _ext_scalar(z))
    # scale = (z^m - s^m) / (m * s^m)
    zm = gl.ext_exp_power_of_2(z, log_m)
    sm = gl.exp_power_of_2(shift % gl.P, log_m)
    scale = gl.ext_mul_base(
        gl.ext_sub(zm, (sm, 0)), gl.inv(gl.mul(m % gl.P, sm))
    )
    pairs = fp2_to_pairs_u64(sums)
    return [gl.ext_mul(scale, (int(p[0]), int(p[1]))) for p in pairs]


@_partial(_jax.jit, static_argnums=(0, 1))
def _weighted_colsum_dev(log_m: int, shift: int, matrix: Fp, z: Fp2) -> Fp2:
    """Σ_i (x_i/(z−x_i))·f_col(x_i) per column — the barycentric core."""
    m = 1 << log_m
    pts = coset_points(log_m, shift)
    zb = fp2_broadcast_to(z, (m,))
    denom = fp2_sub(zb, Fp2(pts, fp_sub(pts, pts)))
    weights = fp2_mul_base(fp2_inv(denom), pts)  # x_i / (z - x_i)
    wcol = Fp2(
        Fp(weights.c0.lo[:, None], weights.c0.hi[:, None]),
        Fp(weights.c1.lo[:, None], weights.c1.hi[:, None]),
    )
    prods = fp2_mul_base(wcol, matrix)  # (m, w) ext
    return fp2_sum_axis0(prods)  # (w,) ext


@dataclass
class DeepClaims:
    """Per-point OOD evaluation claims, aligned to the hashing layout.

    ``evals[point][tree][matrix]`` is a list of (c0, c1) per *aligned*
    column (zero pads included), matching the α-coefficient positions and
    the transcript claim stream.
    """

    evals: list


def compute_deep_claims(trees: list, lift_exps: list, zs: list) -> DeepClaims:
    """Evaluate all committed columns of all trees at each opening point.

    ``lift_exps[t][m]`` is the lift ratio of matrix m in tree t (max_height /
    matrix height); the matrix polynomial is evaluated at ``z^{lift}``.
    """
    out = []
    for z in zs:
        per_tree = []
        for tree, lifts in zip(trees, lift_exps):
            per_matrix = []
            for matrix, lift, h in zip(tree.matrices, lifts, tree.heights):
                if matrix.shape[1] == 0:
                    per_matrix.append([])
                    continue
                z_l = gl.ext_exp_power_of_2(z, lift.bit_length() - 1)
                shift = gl.canonical_lde_shift(h.bit_length() - 1)
                vals = eval_columns_at(matrix, shift, z_l)
                aw = lmcs.aligned_width(matrix.shape[1])
                vals = vals + [(0, 0)] * (aw - len(vals))
                per_matrix.append(vals)
            per_tree.append(per_matrix)
        out.append(per_tree)
    return DeepClaims(evals=out)


def deep_compose(
    domain: LiftedDomain,
    trees: list,
    claims: DeepClaims,
    zs: list,
    alpha: tuple,
    beta: tuple,
) -> Fp2:
    """Build the DEEP quotient evaluations over the max LDE domain (natural
    order): ``Q(x) = Σ_j β^j·(f_red(z_j) − f_red(x))·1/(z_j − x)``."""
    # α coefficients per aligned column, highest power first (deep/prover.rs
    # Horner convention: column 0 gets α^{W−1}).
    total_w = sum(
        lmcs.aligned_width(m.shape[1]) for t in trees for m in t.matrices
    )
    coeffs = []
    a = (1, 0)
    for _ in range(total_w):
        coeffs.append(a)
        a = gl.ext_mul(a, alpha)
    coeffs.reverse()
    col_iter = iter(coeffs)
    matrices = []
    coeff_arrays = []
    for tree in trees:
        for matrix in tree.matrices:
            w = matrix.shape[1]
            aw = lmcs.aligned_width(w)
            cs = [next(col_iter) for _ in range(aw)][:w]  # pads contribute 0
            if w == 0:
                continue
            matrices.append(matrix)
            coeff_arrays.append(_ext_scalar_list(cs))

    # f_red(z_j): Horner over the full aligned claim stream (host ints).
    f_red_zs = []
    bpows = []
    bpow = (1, 0)
    for j, _z in enumerate(zs):
        flat = [
            v
            for per_matrix in claims.evals[j]
            for vals in per_matrix
            for v in vals
        ]
        f_red_z = (0, 0)
        for v in flat:
            f_red_z = gl.ext_add(gl.ext_mul(f_red_z, alpha), v)
        f_red_zs.append(f_red_z)
        bpows.append(bpow)
        bpow = gl.ext_mul(bpow, beta)

    return _deep_compose_dev(
        domain,
        tuple(matrices),
        tuple(coeff_arrays),
        _ext_scalar_list(f_red_zs),
        _ext_scalar_list(list(zs)),
        _ext_scalar_list(bpows),
    )


@_partial(_jax.jit, static_argnums=(0,))
def _deep_compose_dev(
    domain: LiftedDomain,
    matrices: tuple,
    coeff_arrays: tuple,
    f_red_zs: Fp2,
    zs: Fp2,
    bpows: Fp2,
) -> Fp2:
    big_n = domain.lde_height
    f_red = None
    for matrix, carr in zip(matrices, coeff_arrays):
        h = matrix.shape[0]
        crow = Fp2(
            Fp(carr.c0.lo[None, :], carr.c0.hi[None, :]),
            Fp(carr.c1.lo[None, :], carr.c1.hi[None, :]),
        )
        part = fp2_sum_axis1(fp2_mul_base(crow, matrix))  # (h,) ext
        part = fp2_tile(part, big_n // h)
        f_red = part if f_red is None else fp2_add(f_red, part)

    pts = coset_points(domain.log_lde_height, domain.lde_shift)
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


def _ext_scalar_list(vals: list) -> Fp2:
    arr = np.array(vals, dtype=np.uint64)  # (k, 2)
    return fp2_from_pairs_u64(arr)


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


def _fold_rows(mat: Fp2, x_inv: Fp, beta: tuple, log_arity: int) -> Fp2:
    return _fold_rows_dev(log_arity, mat, x_inv, _ext_scalar(beta))


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


def _bconst(c: int, shape) -> Fp:
    from ..field.goldilocks import fp_broadcast_to, fp_const

    return fp_broadcast_to(fp_const(c), shape)


@dataclass
class FriProver:
    trees: list  # LmcsTree per round
    final_poly: list  # descending-order ext coefficients


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


def fri_commit(params: PcsParams, domain: LiftedDomain, evals: Fp2, channel) -> FriProver:
    """FRI commit phase (pcs/fri/prover.rs:93-242, natural-order variant)."""
    log_arity = params.log_folding_arity
    arity = params.arity
    size = domain.lde_height
    log_size = domain.log_lde_height
    shift = domain.lde_shift
    final_domain_size = params.final_poly_degree << params.log_blowup

    # x_inv[k] = 1/(s·ω^k) over the first size/arity rows.
    n_rows = size >> log_arity
    x_inv = fp_powers(
        gl.inv(gl.two_adic_generator(log_size)), n_rows, shift=gl.inv(shift)
    )

    trees = []
    cur = evals
    cur_shift = shift
    while size > final_domain_size:
        n_rows = size >> log_arity
        with span("FRI round commit", rows=n_rows):
            mat, mat_base = _fri_round_prep(log_arity, cur)
            tree = lmcs.build_tree([mat_base])
        channel.send_commitment(tree.root())
        channel.grind(params.folding_pow_bits)
        beta = channel.sample_ext()
        with span("FRI fold", rows=n_rows):
            cur = _fold_rows(mat, x_inv[:n_rows], beta, log_arity)
        trees.append(tree)
        size = n_rows
        cur_shift = gl.exp_power_of_2(cur_shift, log_arity)
        if size > final_domain_size:
            x_inv = _x_inv_step(log_arity, size >> log_arity, x_inv)

    # Final polynomial: interpolate over its coset, truncate to the degree
    # bound, send descending-order coefficients.
    final_deg = params.final_poly_degree
    comp = Fp(
        jnp.stack([cur.c0.lo, cur.c1.lo], axis=1),
        jnp.stack([cur.c0.hi, cur.c1.hi], axis=1),
    )  # (size, 2)
    coeffs_br = ntt.coset_interpolate_bitrev_jit(comp, cur_shift)
    coeffs = ntt.bitrev_perm(coeffs_br)
    from ..field.goldilocks import fp_to_u64

    cn = fp_to_u64(coeffs)  # (size, 2)
    final_poly = [(int(cn[i, 0]), int(cn[i, 1])) for i in range(final_deg)]
    final_poly.reverse()
    channel.send_ext_slice(final_poly)
    return FriProver(trees=trees, final_poly=final_poly)


def open_with_channel(
    params: PcsParams,
    domain: LiftedDomain,
    trees: list,
    zs: list,
    channel,
) -> None:
    """Full PCS opening (pcs/prover.rs:35-105): DEEP → FRI → PoW → queries."""
    max_h = domain.lde_height
    lift_exps = [
        [max_h // h for h in tree.heights] for tree in trees
    ]
    with span("evaluate at OOD points"):
        claims = compute_deep_claims(trees, lift_exps, zs)
    # 1. Bind claims: per point, the flat aligned stream.
    for per_tree in claims.evals:
        flat = [v for pm in per_tree for vals in pm for v in vals]
        channel.send_ext_slice(flat)
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
    # 5. Query PoW + indices.
    with span("query grind", bits=params.query_pow_bits):
        channel.grind(params.query_pow_bits)
    indices = sorted(
        {channel.sample_bits(domain.log_lde_height) for _ in range(params.num_queries)}
    )
    # 6. Open input trees (lifted) then FRI round trees.
    with span("query phase"):
        for tree in trees:
            lmcs.prove_batch(tree, [d % tree.height for d in indices], channel)
        size = max_h
        cur_indices = indices
        for tree in fri.trees:
            size >>= params.log_folding_arity
            cur_indices = sorted({d % size for d in cur_indices})
            lmcs.prove_batch(tree, cur_indices, channel)
