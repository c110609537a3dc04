"""Lifted STARK prover orchestration.

Mirrors ``prove()`` (crates/lifted-stark/src/prover/mod.rs:230-578) with this
framework's device layout:

1.  Order AIRs by ascending trace height (stable on instance index) and bind
    the statement + shape into Fiat-Shamir.
2.  Commit main traces: per-trace coset LDE (blowup B, canonical per-height
    shifts) into one lifted LMCS tree.
3.  Sample aux randomness, build aux (LogUp) traces, check external
    assertions, commit aux, send aux values.
4.  Sample α (constraint fold) and β (AIR accumulation); per AIR evaluate
    the α-folded constraints on its native quotient coset (a strided view of
    its committed LDE — the natural-order equivalent of the bit-reversed
    prefix trick, commit.rs:95-106), divide by Z_H, upsample to D_max, and
    Horner-accumulate with β under cyclic lifting.
5.  Commit the quotient: interpolate, split into D contiguous degree-<N
    chunks (strided in bit-reversed coefficient order — no permutation),
    LDE all chunks in one batched NTT, commit.
6.  Sample the OOD point z ∉ H ∪ sK; open [main, aux, quotient] at
    [z, z·ω_H] through the PCS (DEEP + FRI + queries).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..field.goldilocks import (
    Fp,
    Fp2,
    fp2_add,
    fp2_broadcast_to,
    fp2_from_pairs_u64,
    fp2_mul,
    fp2_mul_base,
    fp2_tile,
    fp2_to_pairs_u64,
    fp_concat,
    fp_from_u64,
    fp_inv,
    fp_mul,
    fp_sub,
)
from ..merkle import lmcs
from ..ntt import ntt
from ..transcript.challenger import DuplexChallenger, ProverChannel, TranscriptData
from . import pcs
from .air import Air, Expr, Folder, MultiAir, VectorBackend
from .domains import LiftedDomain, log_quotient_degree
from .params import PcsParams
from ..utils.tracing import span


@dataclass
class Statement:
    """Verifier-visible statement: the AIRs + shared public inputs."""

    multi_air: MultiAir
    publics: list
    aux_inputs: list = field(default_factory=list)

    def observe(self, challenger, log_heights) -> None:
        """FS binding of statement + shape (prover/mod.rs:284-292)."""
        self.multi_air.observe(challenger, self.publics, self.aux_inputs)
        challenger.observe(len(self.multi_air.airs))
        for lh in log_heights:
            challenger.observe(lh)


@dataclass
class Proof:
    log_heights: list  # instance order
    data: TranscriptData

    def size_in_bytes(self) -> int:
        return self.data.size_in_bytes() + len(self.log_heights)


@dataclass
class StarkOutput:
    digest: list
    proof: Proof


def proof_order(log_heights: list) -> list:
    """Instance indices sorted by (log_height, instance index) ascending
    (order.rs:49)."""
    return sorted(range(len(log_heights)), key=lambda i: (log_heights[i], i))


def _ext_const_vec(v: tuple, shape) -> Fp2:
    return fp2_broadcast_to(
        fp2_from_pairs_u64(np.array(v, dtype=np.uint64)), shape
    )


def commit_traces(
    matrices: list, log_blowup: int, hash=lmcs.POSEIDON2_HASH
) -> lmcs.LmcsTree:
    """LDE each trace on its canonical coset and commit into one tree.

    Accepts host numpy u64 matrices or device-resident ``Fp`` matrices
    (avoids a host→device copy when the trace is produced on device).

    Under an active :func:`miden_tpu.dist.context.use_mesh`, the max-height
    LDE runs as the explicitly-sharded NTT (butterfly stage exchange over
    ICI) and the tree as per-shard local subtrees + collective top layers."""
    from ..dist.context import active_mesh

    mesh = active_mesh()
    max_n = max(m.shape[0] for m in matrices)
    d = mesh.devices.size if mesh is not None else 1
    ldes = []
    for m in matrices:
        n, w = m.shape
        if w == 0:
            ldes.append(Fp(jnp.zeros((n << log_blowup, 0), dtype=jnp.uint32),
                           jnp.zeros((n << log_blowup, 0), dtype=jnp.uint32)))
            continue
        mf = m if isinstance(m, Fp) else fp_from_u64(m)
        shift = gl.canonical_lde_shift((n.bit_length() - 1) + log_blowup)
        if mesh is not None and n == max_n and n % d == 0 and n // d >= 2:
            from ..dist.ntt_dist import coset_lde_sharded

            ldes.append(coset_lde_sharded(mf, log_blowup, shift, mesh))
        else:
            ldes.append(ntt.coset_lde_jit(mf, log_blowup, shift))
    if (
        mesh is not None
        and (max_n << log_blowup) % d == 0
        and hash.name == "poseidon2"
    ):
        from ..dist.lmcs_dist import build_tree_sharded

        return build_tree_sharded(ldes, mesh)
    return lmcs.build_tree(ldes, hash=hash)


def _periodic_on_domain(pattern, n, log_d, shift) -> Fp:
    """Periodic column values over the quotient eval domain (size n·2^log_d).

    The period-p pattern defines h of degree < p with h(ω_p^i) = pattern[i];
    values at x^{n/p} for x over (shift, n·D) tile with period p·D."""
    p = len(pattern)
    s_eff = gl.exp_power_of_2(shift, (n // p).bit_length() - 1)
    evals = fp_from_u64(np.asarray(pattern, dtype=np.uint64)[:, None])
    small = ntt.coset_lde(evals, log_d, s_eff)  # (p·D, 1)
    reps = n // p
    return Fp(jnp.tile(small.lo[:, 0], reps), jnp.tile(small.hi[:, 0], reps))


def evaluate_quotient(
    air: Air,
    domain: LiftedDomain,
    main_lde: Fp,
    aux_lde: Fp,
    log_d: int,
    alpha: Fp2,
    publics: Fp,
    randomness: Fp2,
    aux_values: Fp2,
    pp_lde: Fp | None = None,
) -> Fp2:
    """α-folded constraint evaluation / Z_H over the native quotient coset
    (prover/constraints/mod.rs:40-130, vectorized + jitted per AIR/shape).

    α / randomness / aux values are device arrays (Fp2 scalars / (k,)),
    publics a device Fp (n_pub,) — no host round-trip. ``pp_lde`` is the
    committed preprocessed LDE when the AIR declares preprocessed columns
    (it shares the max coset with the main trace, prover/mod.rs:463-476)."""
    import os as _os

    if (
        _os.environ.get("MIDEN_TPU_INTERP") == "1"
        or _jax.default_backend() == "cpu"
        or getattr(air, "prefer_interp", False)
        # large domains: the fused graph materializes several (width, n·D)
        # extension temporaries at once (~0.9 GB each at 2^20) and OOMs the
        # 16 GB chip next to the retained LDEs; the bytecode evaluator's
        # peak is its register file
        or (domain.trace_height << log_d) >= (1 << 21)
    ):
        # bytecode evaluator: O(1) compiled-program size — required on the
        # CPU test mesh where XLA cannot compile the fused VM-AIR graph,
        # and chosen by AIRs whose fused graph would cost minutes of
        # compile per shape (the VM constraint system; prefer_interp)
        return _evaluate_quotient_interp(
            air, domain, log_d, main_lde, aux_lde, alpha, publics, randomness,
            aux_values, pp_lde,
        )
    return _evaluate_quotient_dev(
        air, domain, log_d, main_lde, aux_lde, alpha, publics, randomness,
        aux_values, pp_lde,
    )


def _evaluate_quotient_interp(
    air, domain, log_d, main_lde, aux_lde, alpha, publics, randomness,
    aux_values, pp_lde=None,
):
    """Same domain prep as _evaluate_quotient_dev, constraint evaluation via
    the recorded bytecode program (stark/interp.py)."""
    from . import interp

    n = domain.trace_height
    d = 1 << log_d
    nd = n * d
    stride = domain.lde_height // nd
    shift = domain.lde_shift

    main_gj = main_lde[::stride]
    if aux_lde is not None and aux_lde.shape[1]:
        aux_gj = aux_lde[::stride]
    else:
        zero = jnp.zeros((nd, 0), dtype=jnp.uint32)
        aux_gj = Fp(zero, zero)
    if pp_lde is not None:
        pp_gj = pp_lde[::stride]
    else:
        zero = jnp.zeros((nd, 0), dtype=jnp.uint32)
        pp_gj = Fp(zero, zero)

    pts = pcs.coset_points(nd.bit_length() - 1, shift)
    sn = gl.exp_power_of_2(shift, domain.log_trace_height)
    wd = gl.two_adic_generator(log_d) if log_d else 1
    z_vals = []
    v = sn
    for _ in range(d):
        z_vals.append(gl.sub(v, 1))
        v = gl.mul(v, wd)
    zf = fp_from_u64(np.asarray(z_vals, dtype=np.uint64))
    z_tile = Fp(jnp.tile(zf.lo, n), jnp.tile(zf.hi, n))
    one = pcs._bconst(1, (nd,))
    w_inv = gl.inv(domain.trace_generator)
    first_den = fp_inv(fp_sub(pts, one))
    last_den_raw = fp_sub(pts, pcs._bconst(w_inv, (nd,)))
    last_den = fp_inv(last_den_raw)
    selectors = (
        fp_mul(z_tile, first_den),
        fp_mul(z_tile, last_den),
        last_den_raw,
    )
    periodic = [
        _periodic_on_domain(p, n, log_d, shift) for p in air.periodic_columns
    ]
    acc = interp.evaluate_folded_constraints(
        air, main_gj, aux_gj, selectors,
        publics, randomness, aux_values, periodic, alpha,
        pp=pp_gj if pp_lde is not None else None, next_offset=d,
    )
    # fused divide by Z_H — D distinct values, inverted host-side
    inv_z = [gl.inv(zv) for zv in z_vals]
    invf = fp_from_u64(np.asarray(inv_z, dtype=np.uint64))
    inv_tile = Fp(jnp.tile(invf.lo, n), jnp.tile(invf.hi, n))
    return fp2_mul_base(acc, inv_tile)


from functools import partial as _partial
import jax as _jax


@_partial(_jax.jit, static_argnums=(0, 1, 2))
def _evaluate_quotient_dev(
    air: Air,
    domain: LiftedDomain,
    log_d: int,
    main_lde: Fp,
    aux_lde: Fp,
    alpha: Fp2,
    publics: Fp,
    randomness: Fp2,
    aux_values: Fp2,
    pp_lde: Fp | None = None,
) -> Fp2:
    n = domain.trace_height
    d = 1 << log_d
    nd = n * d
    stride = domain.lde_height // nd
    shift = domain.lde_shift

    main_gj = main_lde[::stride]
    main_next = Fp(
        jnp.roll(main_gj.lo, -d, axis=0), jnp.roll(main_gj.hi, -d, axis=0)
    )
    aux_gj = aux_lde[::stride] if aux_lde is not None else None
    aux_next = (
        Fp(jnp.roll(aux_gj.lo, -d, axis=0), jnp.roll(aux_gj.hi, -d, axis=0))
        if aux_gj is not None
        else None
    )
    pp_gj = pp_lde[::stride] if pp_lde is not None else None
    pp_next = (
        Fp(jnp.roll(pp_gj.lo, -d, axis=0), jnp.roll(pp_gj.hi, -d, axis=0))
        if pp_gj is not None
        else None
    )

    backend = VectorBackend((nd,))

    def main_fn(col, offset=0):
        src = main_gj if offset == 0 else main_next
        return Expr(backend, "base", src[:, col])

    def aux_fn(col, offset=0):
        src = aux_gj if offset == 0 else aux_next
        val = Fp2(src[:, 2 * col], src[:, 2 * col + 1])
        return Expr(backend, "ext", val)

    def preprocessed_fn(col, offset=0):
        src = pp_gj if offset == 0 else pp_next
        return Expr(backend, "base", src[:, col])

    # Selectors over the coset: Z_H(x_i) = shift^n·ω_D^{i mod D} − 1 has D
    # distinct values (host ints); denominators batch-inverted on device.
    pts = pcs.coset_points(nd.bit_length() - 1, shift)
    sn = gl.exp_power_of_2(shift, domain.log_trace_height)
    wd = gl.two_adic_generator(log_d) if log_d else 1
    z_vals = []
    v = sn
    for _ in range(d):
        z_vals.append(gl.sub(v, 1))
        v = gl.mul(v, wd)
    z_tile = Fp(
        jnp.tile(fp_from_u64(np.asarray(z_vals, dtype=np.uint64)).lo, n),
        jnp.tile(fp_from_u64(np.asarray(z_vals, dtype=np.uint64)).hi, n),
    )
    one = pcs._bconst(1, (nd,))
    w_inv = gl.inv(domain.trace_generator)
    first_den = fp_inv(fp_sub(pts, one))
    last_den_raw = fp_sub(pts, pcs._bconst(w_inv, (nd,)))
    last_den = fp_inv(last_den_raw)
    sels = (
        Expr(backend, "base", fp_mul(z_tile, first_den)),
        Expr(backend, "base", fp_mul(z_tile, last_den)),
        Expr(backend, "base", last_den_raw),
    )

    periodic = [
        Expr(backend, "base", _periodic_on_domain(p, n, log_d, shift))
        for p in air.periodic_columns
    ]
    pubs = [
        Expr(backend, "base", publics[i]) for i in range(publics.shape[0])
    ]
    rand_e = [
        Expr(backend, "ext", randomness[i])
        for i in range(randomness.shape[0])
    ]
    auxv_e = [
        Expr(backend, "ext", aux_values[i])
        for i in range(aux_values.shape[0])
    ]
    alpha_e = Expr(backend, "ext", alpha)

    folder = Folder(
        backend,
        main_fn=main_fn,
        aux_fn=aux_fn,
        preprocessed_fn=preprocessed_fn,
        periodic=periodic,
        publics=pubs,
        randomness=rand_e,
        aux_values=auxv_e,
        selectors=sels,
        alpha=alpha_e,
    )
    air.eval(folder)
    acc = folder.acc
    assert acc is not None, "AIR produced no constraints"
    if acc.kind == "base":
        acc = Expr(backend, "ext", Fp2(acc.val, fp_sub(acc.val, acc.val)))
    # Fused divide by Z_H: only D distinct values, batch-inverted host-side.
    inv_z = [gl.inv(zv) for zv in z_vals]
    inv_tile = Fp(
        jnp.tile(fp_from_u64(np.asarray(inv_z, dtype=np.uint64)).lo, n),
        jnp.tile(fp_from_u64(np.asarray(inv_z, dtype=np.uint64)).hi, n),
    )
    return fp2_mul_base(acc.val, inv_tile)


@_jax.jit
def _ext_to_2col(evals: Fp2) -> Fp:
    return Fp(
        jnp.stack([evals.c0.lo, evals.c1.lo], axis=1),
        jnp.stack([evals.c0.hi, evals.c1.hi], axis=1),
    )


@_partial(_jax.jit, static_argnums=(1, 2))
def upsample_evals(evals: Fp2, shift: int, added_bits: int) -> Fp2:
    """LDE ext evals (natural, shift s) from size L to L·2^added_bits on the
    same shift (quotient.rs:45 upsample)."""
    comp = _ext_to_2col(evals)
    coeffs = ntt.coset_interpolate_bitrev(comp, shift)
    out = ntt.evaluate_coeffs_on_coset(coeffs, added_bits, shift)
    return Fp2(out[:, 0], out[:, 1])


@_partial(_jax.jit, static_argnums=(0,))
def _accumulate_step(reps: int, acc: Fp2, q: Fp2, beta: Fp2) -> Fp2:
    """acc ← lift(acc)·β + q (Horner across AIRs under cyclic lifting)."""
    target = acc.shape[0] * reps
    return fp2_add(
        fp2_mul(fp2_tile(acc, reps), fp2_broadcast_to(beta, (target,))), q
    )


@_partial(_jax.jit, static_argnums=(1, 2, 3))
def _quotient_chunks_dev(acc: Fp2, domain: LiftedDomain, log_d: int, log_blowup: int) -> Fp:
    n = domain.trace_height
    d = 1 << log_d
    shift = domain.lde_shift
    comp = _ext_to_2col(acc)  # (N·D, 2)
    coeffs_br = ntt.coset_interpolate_bitrev(comp, shift)
    # Contiguous chunk t (natural coeffs [tN, (t+1)N)) = stride-D slice of the
    # bit-reversed order starting at bitrev_D(t): view (N, D) per component.
    lo = coeffs_br.lo.reshape(n, d, 2)
    hi = coeffs_br.hi.reshape(n, d, 2)
    br = [int(format(t, f"0{log_d}b")[::-1], 2) if log_d else 0 for t in range(d)]
    cols_lo = [lo[:, br[t], c] for t in range(d) for c in (0, 1)]
    cols_hi = [hi[:, br[t], c] for t in range(d) for c in (0, 1)]
    chunk_coeffs = Fp(jnp.stack(cols_lo, axis=1), jnp.stack(cols_hi, axis=1))
    return ntt.evaluate_coeffs_on_coset(chunk_coeffs, log_blowup, shift)


def commit_quotient(
    acc: Fp2,
    domain: LiftedDomain,
    log_d: int,
    log_blowup: int,
    hash=lmcs.POSEIDON2_HASH,
) -> lmcs.LmcsTree:
    """Split Q (evals over (s_K, N·D)) into D contiguous degree-<N chunks and
    commit their LDEs on (s_K, N·B) as one 2D-column matrix
    (quotient.rs:143-216's fused transform, batched in one NTT)."""
    from ..dist.context import active_mesh

    chunks = _quotient_chunks_dev(acc, domain, log_d, log_blowup)
    mesh = active_mesh()
    if (
        mesh is not None
        and chunks.shape[0] % mesh.devices.size == 0
        and hash.name == "poseidon2"
    ):
        from ..dist.lmcs_dist import build_tree_sharded

        return build_tree_sharded([chunks], mesh)
    return lmcs.build_tree([chunks], hash=hash)


def _fp2_stack(scalars: list) -> Fp2:
    """Stack Fp2 () scalars into an Fp2 (k,) array (k may be 0)."""
    if not scalars:
        return fp2_from_pairs_u64(np.zeros((0, 2), dtype=np.uint64))
    return Fp2(
        Fp(
            jnp.stack([s.c0.lo for s in scalars]),
            jnp.stack([s.c0.hi for s in scalars]),
        ),
        Fp(
            jnp.stack([s.c1.lo for s in scalars]),
            jnp.stack([s.c1.hi for s in scalars]),
        ),
    )


def _ood_valid_flag(domain: LiftedDomain, z: Fp2):
    """Device boolean: z ∉ {0} ∪ H ∪ sK (domain.rs:539-560).

    The prover samples the OOD point once and asserts validity at the final
    readback instead of rejection-looping (rejection probability ≈ 2^-103;
    the verifier's replay performs the identical check)."""
    from ..field.goldilocks import fp2_exp_power_of_2, fp_equal, fp_const, fp2_mul_base

    def is_one(v: Fp2):
        return (
            fp_equal(v.c0, fp_const(1))
            & fp_equal(v.c1, fp_const(0))
        )

    def is_zero(v: Fp2):
        return fp_equal(v.c0, fp_const(0)) & fp_equal(v.c1, fp_const(0))

    in_h = is_one(fp2_exp_power_of_2(z, domain.log_trace_height))
    zs = fp2_mul_base(z, fp_const(gl.inv(domain.lde_shift)))
    in_k = is_one(fp2_exp_power_of_2(zs, domain.log_lde_height))
    return ~is_zero(z) & ~in_h & ~in_k


def prove(
    params: PcsParams,
    statement: Statement,
    traces: list,
    challenger: DuplexChallenger,
    preprocessed=None,
) -> StarkOutput:
    """Prove a multi-AIR statement. ``traces[i]``: numpy u64 (n_i, width_i)
    or device Fp, instance order. The challenger must be pre-bound to
    protocol parameters (see air/src/config.rs observe_protocol_params).

    ``preprocessed``: the :class:`~miden_tpu.stark.preprocessed.Preprocessed`
    bundle, required exactly when some AIR declares preprocessed columns.
    Its commitment is observed into Fiat-Shamir before the statement
    (prover/mod.rs:282-285) but never enters the transcript — the verifier
    holds it as trusted setup input.

    The Fiat-Shamir state machine runs on a device-resident challenger
    (:mod:`miden_tpu.transcript.device_challenger`): the entire pipeline
    through query-index sampling is one asynchronous device dependency
    graph, read back in a single blocking transfer (plus one more for the
    query-phase opening gathers)."""
    from ..transcript.device_challenger import DeviceChallenger, DeviceProverChannel

    from .fused import prove_fused, use_fused

    if use_fused(statement):
        return prove_fused(params, statement, traces, challenger, preprocessed)

    airs = statement.multi_air.airs
    assert len(airs) == len(traces)
    log_blowup = params.log_blowup
    hash_cfg = params.lmcs_hash()
    log_heights = [t.shape[0].bit_length() - 1 for t in traces]
    for t, a in zip(traces, airs):
        assert tuple(t.shape) == (1 << (t.shape[0].bit_length() - 1), a.width)

    order = proof_order(log_heights)
    max_log_h = max(log_heights)
    max_domain = LiftedDomain.canonical(max_log_h, log_blowup)
    domains = [
        max_domain.sub_domain(log_heights[i]) for i in order
    ]

    expected_pp = any(a.preprocessed_width > 0 for a in airs)
    if (preprocessed is not None) != expected_pp:
        raise ValueError(
            "preprocessed bundle must be supplied exactly when some AIR "
            "declares preprocessed columns"
        )
    if preprocessed is not None:
        from .preprocessed import validate_preprocessed

        validate_preprocessed(statement, traces, preprocessed, params)

    dch = DeviceChallenger.from_host(challenger)
    if preprocessed is not None:
        dch.observe_arr(preprocessed.tree.root_dev())
    statement.observe(dch, log_heights)
    channel = DeviceProverChannel(dch)

    # Per-AIR quotient degree; the shared D is the max.
    log_ds = [log_quotient_degree(airs[i].constraint_degree()) for i in order]
    log_d = max(log_ds)
    assert log_d <= log_blowup, "constraint degree exceeds blowup"

    # 1. Commit main traces (proof order).
    with span("commit to main traces"):
        main_tree = commit_traces(
            [traces[i] for i in order], log_blowup, hash=hash_cfg
        )
    channel.send_commitment(main_tree.root_dev())

    # 2. Randomness → aux traces (built in instance order) → external
    #    assertions → commit (proof order) → send aux values.
    max_rand = max((a.num_randomness for a in airs), default=0)
    randomness = [channel.sample_ext() for _ in range(max_rand)]
    # Airs whose aux builders run host-side (e.g. the per-row VM bus
    # builders) need the sampled randomness as host ints: one small early
    # readback. Device-mode builders (aux_on_device = True) keep the
    # pipeline fully asynchronous.
    from .air import aux_on_device_now

    host_aux = any(
        (a.aux_width or a.num_aux_values) and not aux_on_device_now(a)
        for a in airs
    )
    if host_aux and max_rand:
        pairs = fp2_to_pairs_u64(_fp2_stack(randomness))
        rand_host = [(int(p[0]), int(p[1])) for p in pairs]
    else:
        rand_host = None
    with span("build aux traces"):
        aux_pairs = []
        for a, t in zip(airs, traces):
            r = (
                randomness[: a.num_randomness]
                if aux_on_device_now(a)
                else (rand_host or [])[: a.num_randomness]
            )
            aux_pairs.append(
                a.build_aux_trace(t, statement.publics, statement.aux_inputs, r)
            )
    # Normalize aux values to device Fp2 (k,) per AIR; keep host copies when
    # available for the (host-side) external assertion check.
    aux_values_inst = []
    aux_values_host = []
    for (_, vals) in aux_pairs:
        if isinstance(vals, Fp2):
            aux_values_inst.append(vals)
            aux_values_host.append(None)
        else:
            aux_values_host.append([tuple(int(x) for x in v) for v in vals])
            aux_values_inst.append(
                fp2_from_pairs_u64(
                    np.asarray(vals, dtype=np.uint64).reshape(len(vals), 2)
                )
            )
    if rand_host is not None and all(v is not None for v in aux_values_host):
        assertions = statement.multi_air.eval_external(
            rand_host, aux_values_host, log_heights
        )
        for k, v in enumerate(assertions):
            if tuple(v) != (0, 0):
                raise ValueError(f"external assertion {k} is non-zero: {v}")
    aux_flat = []
    for i in order:
        aux_t = aux_pairs[i][0]  # numpy (n, aw, 2) or device Fp (n, 2·aw)
        if isinstance(aux_t, Fp):
            aux_flat.append(aux_t)
        else:
            n, aw, _ = aux_t.shape
            aux_flat.append(
                fp_from_u64(np.ascontiguousarray(aux_t.reshape(n, 2 * aw)))
            )
    with span("commit to aux traces"):
        aux_tree = commit_traces(aux_flat, log_blowup, hash=hash_cfg)
    channel.send_commitment(aux_tree.root_dev())
    aux_values = [aux_values_inst[i] for i in order]
    for vals in aux_values:
        channel.send_ext_slice(vals)

    # 3. Constraint fold / accumulation challenges.
    alpha = channel.sample_ext()
    beta = channel.sample_ext()

    pub_d = fp_from_u64(
        np.asarray([int(p) % gl.P for p in statement.publics], dtype=np.uint64)
    )
    rand_d = _fp2_stack(randomness)

    # 4. Per-AIR quotient evaluation + Horner accumulation under lifting.
    pp_for_air = preprocessed.trace_index_for_air() if preprocessed else {}
    acc = None
    for k, i in enumerate(order):
      with span("evaluate constraints", instance=k):
        air = airs[i]
        dom = domains[k]
        q = evaluate_quotient(
            air,
            dom,
            main_tree.matrices[k],
            aux_tree.matrices[k] if air.aux_width else None,
            log_ds[k],
            alpha,
            pub_d,
            rand_d[: air.num_randomness],
            aux_values[k],
            (
                preprocessed.tree.matrices[pp_for_air[i]]
                if air.preprocessed_width
                else None
            ),
        )
        if log_ds[k] < log_d:
            q = upsample_evals(q, dom.lde_shift, log_d - log_ds[k])
        target = dom.trace_height << log_d
        if acc is None:
            acc = q
        else:
            reps = target // acc.shape[0]
            acc = _accumulate_step(reps, acc, q, beta)
    # 5. Commit quotient.
    with span("commit to quotient poly chunks"):
        quotient_tree = commit_quotient(
            acc, max_domain, log_d, log_blowup, hash=hash_cfg
        )
    channel.send_commitment(quotient_tree.root_dev())

    # 6. OOD point + PCS opening at [z, z·ω_H].
    z = channel.sample_ext()
    channel.check("ood point outside domains", _ood_valid_flag(max_domain, z))
    h = max_domain.trace_generator
    from ..field.goldilocks import fp_const as _fp_const

    z_next = fp2_mul_base(z, _fp_const(h))
    # Opened tree group order: [preprocessed?, main, aux, quotient]
    # (prover/mod.rs:552-554).
    input_trees = ([preprocessed.tree] if preprocessed else []) + [
        main_tree, aux_tree, quotient_tree,
    ]
    with span("open"):
        fri_trees, idx_arr = pcs.open_with_channel(
            params,
            max_domain,
            input_trees,
            [z, z_next],
            channel,
        )

    # --- THE blocking readback: transcript + query indices in one transfer.
    with span("transcript readback"):
        idx_host = channel.materialize(extra=idx_arr)
    mask = (1 << max_domain.log_lde_height) - 1
    idx_raw = [int(v) & mask for v in idx_host]

    return _query_phase_and_finalize(
        params, max_domain, input_trees, fri_trees, idx_raw, channel,
        log_heights, idx_arr=idx_arr,
    )


@_partial(_jax.jit, static_argnums=(0,))
def _masked_idx(mask: int, idx_arr: Fp):
    return (idx_arr.lo & jnp.uint32(mask)).astype(jnp.int32)


def _query_phase_and_finalize(
    params, max_domain, input_trees, fri_trees, idx_raw, channel, log_heights,
    idx_arr=None,
) -> StarkOutput:
    """Shared proof tail (eager + fused paths): open every committed tree
    at the query indices — ONE jitted full-path gather dispatch per tree
    (value-independent shapes, executable reused across proofs), one
    readback, then host-side hint assembly."""
    with span("query phase"):
        mask = (1 << max_domain.log_lde_height) - 1
        if idx_arr is not None:
            idx_dev = _masked_idx(mask, idx_arr)
        else:
            idx_dev = jnp.asarray(idx_raw, jnp.int32)
        flats, metas, raws = [], [], []
        for tree in input_trees:
            flat, meta = lmcs.gather_query_data(tree, idx_dev)
            flats.append(flat)
            metas.append(meta)
            raws.append(idx_raw)
        size = max_domain.lde_height
        cur_idx, cur_raw = idx_dev, idx_raw
        for tree in fri_trees:
            size >>= params.log_folding_arity
            cur_idx = jnp.bitwise_and(cur_idx, jnp.int32(size - 1))
            cur_raw = [d & (size - 1) for d in cur_raw]
            flat, meta = lmcs.gather_query_data(tree, cur_idx)
            flats.append(flat)
            metas.append(meta)
            raws.append(cur_raw)
        from ..field.goldilocks import fp_to_u64 as _fp_to_u64

        big = fp_concat([f for f in flats], axis=0)
        host_vals = _fp_to_u64(big)  # second (final) blocking readback
        off = 0
        for flat, meta, raw in zip(flats, metas, raws):
            n = flat.shape[0]
            lmcs.emit_opening_hints(
                channel, host_vals[off : off + n], meta, raw
            )
            off += n

    digest, data = channel.finalize()
    return StarkOutput(
        digest=digest, proof=Proof(log_heights=log_heights, data=data)
    )
