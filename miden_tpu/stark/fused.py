"""Phase-fused prover: the whole pipeline as a handful of jitted dispatches.

On the TPU-behind-a-tunnel deployment every *eager* JAX op costs ~5 ms of
link latency while a jitted dispatch costs ~30 µs. The round-2 prover issued
thousands of eager glue ops between its jitted kernels — challenger
duplexing, ``fp2_powers`` chains, per-matrix slicing, FRI round choreography
— giving a size-independent 6–27 s host-side floor per proof (measured at
2^10 and 2^14 alike). This module removes that floor by compiling the whole
pipeline into **five jitted phase functions** with zero eager ops between
them:

  1. ``main``:     FS statement binding + main-trace LDE + LMCS commit
  2. ``aux``:      randomness → device aux (LogUp) builders → aux commit → α,β
  3. ``quotient``: constraint eval + Horner accumulation + quotient commit → z
  4. ``open``:     OOD claims, DEEP quotient, all FRI rounds, PoW grinds,
                   query-index sampling
  5. ``final``:    transcript digest + ONE flat payload for a single readback

The :class:`~miden_tpu.transcript.device_challenger.DeviceChallenger` state
machine threads through the phases as ``(state (12,), ibuf (k,), obuf_n)``
— ``obuf`` is always ``state[:8]`` whenever non-empty, so the sponge state
serializes losslessly at any phase boundary. Transcript entries recorded
inside a phase come back as jit outputs; their kinds/labels are captured at
trace time (static per statement signature).

Each phase corresponds to the same pipeline steps as the eager
:func:`miden_tpu.stark.prover.prove` (reference
crates/lifted-stark/src/prover/mod.rs:230-578) and produces bit-identical
transcripts — pinned by tests/test_fused.py.

Requires every AIR's aux builder to run on device (``aux_on_device`` or no
aux); statements with host-side aux builders fall back to the eager path.
"""

from __future__ import annotations

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gl
from ..field.goldilocks import (
    Fp,
    Fp2,
    fp2_from_pairs_u64,
    fp2_mul_base,
    fp_concat,
    fp_const,
    fp_from_u64,
    fp_to_u64,
)
from ..merkle import lmcs
from ..transcript.device_challenger import (
    RATE,
    DeviceChallenger,
    DeviceProverChannel,
)
from ..utils.tracing import span
from . import pcs
from .domains import LiftedDomain, log_quotient_degree

_STATEMENT_TOKENS = itertools.count()

#: (statement_token, phase_name, extra) -> (jitted fn, trace-time meta dict)
_PHASE_CACHE: dict = {}


def use_fused(statement) -> bool:
    """Fused path policy: on unless disabled, off on the CPU test backend
    (per-shape compile cost dominates tiny test proofs) unless forced, and
    only when every aux builder runs on device."""
    env = os.environ.get("MIDEN_TPU_FUSED", "")
    if env == "0":
        return False
    from .air import aux_on_device_now

    airs = statement.multi_air.airs
    device_ok = all(
        not (a.aux_width or a.num_aux_values) or aux_on_device_now(a)
        for a in airs
    )
    if not device_ok:
        return False
    if env == "1":
        return True
    return jax.default_backend() != "cpu"


def _statement_token(statement) -> int:
    tok = getattr(statement, "_fused_token", None)
    if tok is None:
        tok = next(_STATEMENT_TOKENS)
        statement._fused_token = tok
    return tok


def _phase(key, obuf_n_in: int, body):
    """Lift a channel-mutating ``body(channel, args) -> out`` into a pure
    jitted function threading the challenger state and returning the
    recorded transcript entries / checks as outputs."""
    hit = _PHASE_CACHE.get(key)
    if hit is not None:
        return hit
    meta: dict = {}

    def pure(state: Fp, ibuf: Fp, args):
        dch = DeviceChallenger(state, ibuf)
        if obuf_n_in:
            dch.obuf = dch.state[:RATE]
            dch.obuf_n = obuf_n_in
        ch = DeviceProverChannel(dch)
        out = body(ch, args)
        meta["kinds"] = tuple(k for (k, _a) in ch._entries)
        meta["labels"] = tuple(l for (l, _f) in ch._checks)
        meta["obuf_n_out"] = dch.obuf_n
        ents = tuple(a for (_k, a) in ch._entries)
        flags = tuple(jnp.asarray(f) for (_l, f) in ch._checks)
        return out, ents, flags, dch.state, dch.ibuf

    fn = jax.jit(pure)
    _PHASE_CACHE[key] = (fn, meta)
    return fn, meta


def prove_fused(params, statement, traces, challenger, preprocessed=None):
    """Drop-in fused twin of :func:`miden_tpu.stark.prover.prove`."""
    from .prover import (
        Proof,
        StarkOutput,
        _fp2_stack,
        _ood_valid_flag,
        _query_phase_and_finalize,
        commit_quotient,
        commit_traces,
        evaluate_quotient,
        proof_order,
        upsample_evals,
        _accumulate_step,
    )

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
    domains = [max_domain.sub_domain(log_heights[i]) for i in order]
    log_ds = [log_quotient_degree(airs[i].constraint_degree()) for i in order]
    log_d = max(log_ds)
    assert log_d <= log_blowup, "constraint degree exceeds blowup"

    expected_pp = any(a.preprocessed_width > 0 for a in airs)
    if (preprocessed is not None) != expected_pp:
        raise ValueError(
            "preprocessed bundle must be supplied exactly when some AIR "
            "declares preprocessed columns"
        )
    if preprocessed is not None:
        from .preprocessed import validate_preprocessed

        validate_preprocessed(statement, traces, preprocessed, params)

    traces_fp = tuple(t if isinstance(t, Fp) else fp_from_u64(t) for t in traces)
    pub_d = fp_from_u64(
        np.asarray([int(p) % gl.P for p in statement.publics], dtype=np.uint64)
    )
    max_rand = max((a.num_randomness for a in airs), default=0)
    pp_for_air = preprocessed.trace_index_for_air() if preprocessed else {}

    # Mesh path: shard the trace-row inputs; the commit bodies route to the
    # explicitly-sharded NTT/Merkle twins (context hook, read at trace
    # time) and every other phase partitions under GSPMD from the sharded
    # inputs. Transcript state stays replicated. Same 10-phase structure,
    # bit-identical transcript (tests/test_dist.py pins it).
    from ..dist.context import active_mesh

    mesh = active_mesh()
    if mesh is not None:
        from ..dist.mesh import replicate, shard_rows

        d = mesh.devices.size
        traces_fp = tuple(
            shard_rows(t, mesh)
            if t.shape[0] % d == 0 and t.shape[0] // d >= 2 and t.shape[1]
            else t
            for t in traces_fp
        )
        pub_d = replicate(pub_d, mesh)

    skey = (
        _statement_token(statement),
        params,
        tuple(log_heights),
        preprocessed is not None,
        None
        if mesh is None
        else tuple(int(dv.id) for dv in mesh.devices.flat),
    )

    # --- driver state ------------------------------------------------------
    entries: list = []  # (kind, device Fp array), transcript order
    checks: list = []  # (label, device bool)
    state = fp_from_u64(np.asarray(challenger.state, dtype=np.uint64))
    ibuf = fp_from_u64(
        np.asarray(challenger.input_buffer or [], dtype=np.uint64)
    )
    obuf_n = len(challenger.output_buffer)

    def run(name, body, args):
        nonlocal state, ibuf, obuf_n
        fn, meta = _phase((skey, name), obuf_n, body)
        with span(f"fused phase: {name}"):
            # the remote compile service (axon tunnel) intermittently drops
            # connections on large-phase compiles ("response body closed",
            # HTTP 500); the compile itself is deterministic, so retry —
            # a transient drop must not void a long bench sweep
            for attempt in range(3):
                try:
                    out, ents, flags, state, ibuf = fn(state, ibuf, args)
                    break
                except jax.errors.JaxRuntimeError as exc:
                    transient = "remote_compile" in str(exc)
                    if not transient or attempt == 2:
                        raise
                    import time as _time

                    _time.sleep(5.0 * (attempt + 1))
        entries.extend(zip(meta["kinds"], ents))
        checks.extend(zip(meta["labels"], flags))
        obuf_n = meta["obuf_n_out"]
        return out

    # Above ~2^19 the per-phase graphs grow past what the remote compile
    # service reliably handles (~100 MB MLIR uploads die with broken pipes
    # and multi-hour compiles); split LDEs / tree builds / per-instance
    # constraint evaluation into their own phases there. Smaller sizes keep
    # the coarser (already-cached) phase structure.
    # Statements can lower the fine-split threshold (fused_fine_log_h on
    # the MultiAir): the real VM statement's wider aux/chiplet set OOMs
    # the 16 GB chip at 2^18 under the coarse split (phase-local LDE
    # temporaries stay live across the whole phase graph), while the
    # synthetic shaped statement keeps the coarser cached structure.
    fine_at = getattr(statement.multi_air, "fused_fine_log_h", 19)
    fine = (
        max_log_h >= min(19, fine_at)
        or os.environ.get("MIDEN_TPU_FUSED_FINE") == "1"
    )

    def _lde_one(ch, args):
        (m,) = args
        n, w = m.shape
        if w == 0:
            return Fp(
                jnp.zeros((n << log_blowup, 0), jnp.uint32),
                jnp.zeros((n << log_blowup, 0), jnp.uint32),
            )
        shift = gl.canonical_lde_shift((n.bit_length() - 1) + log_blowup)
        from ..ntt import ntt

        return ntt.coset_lde_jit(m, log_blowup, shift)

    # --- phase 1: statement binding + main commit --------------------------
    def body_bind(ch, args):
        (pp_root,) = args
        if pp_root is not None:
            ch.challenger.observe_arr(pp_root)
        statement.observe(ch.challenger, log_heights)
        return ()

    def body_main(ch, args):
        traces_t, pp_root = args
        if pp_root is not None:
            ch.challenger.observe_arr(pp_root)
        statement.observe(ch.challenger, log_heights)
        tree = commit_traces(
            [traces_t[i] for i in order], log_blowup, hash=hash_cfg
        )
        ch.send_commitment(tree.root_dev())
        return tree

    def body_tree(ch, args):
        # return ONLY the digest layers: a jitted phase copies every output
        # buffer, so returning the whole tree held the 4 GB of LDE matrices
        # TWICE at 2^20 (9.1 GB live at phase exit — OOMed the auxbuild
        # executable load); the host-side LmcsTree below aliases the
        # original LDE buffers instead
        ldes = list(args)
        tree = lmcs.build_tree(ldes, hash=hash_cfg)
        ch.send_commitment(tree.root_dev())
        return tuple(tree.layers)

    def _tree_from(ldes, layers) -> lmcs.LmcsTree:
        return lmcs.LmcsTree(
            matrices=list(ldes),
            heights=[m.shape[0] for m in ldes],
            widths=[m.shape[1] for m in ldes],
            layers=list(layers),
        )

    pp_root = preprocessed.tree.root_dev() if preprocessed is not None else None
    if fine:
        run("bind", body_bind, (pp_root,))
        main_ldes = [
            run(f"lde{k}", _lde_one, (traces_fp[i],))
            for k, i in enumerate(order)
        ]
        main_layers = run("mtree", body_tree, tuple(main_ldes))
        main_tree = _tree_from(main_ldes, main_layers)
    else:
        main_tree = run("main", body_main, (traces_fp, pp_root))

    # --- phase 2: aux randomness + aux commit + fold challenges ------------
    def body_aux(ch, args):
        (traces_t,) = args
        randomness = [ch.sample_ext() for _ in range(max_rand)]
        aux_flat_inst, aux_values_inst = [], []
        for a, t in zip(airs, traces_t):
            aux_t, vals = a.build_aux_trace(
                t,
                statement.publics,
                statement.aux_inputs,
                randomness[: a.num_randomness],
            )
            if not isinstance(aux_t, Fp):
                arr = np.asarray(aux_t, dtype=np.uint64)
                n = arr.shape[0] if arr.ndim else t.shape[0]
                aux_t = fp_from_u64(
                    np.ascontiguousarray(arr.reshape(n, -1))
                )
            if not isinstance(vals, Fp2):
                vals = fp2_from_pairs_u64(
                    np.asarray(vals, dtype=np.uint64).reshape(len(vals), 2)
                )
            aux_flat_inst.append(aux_t)
            aux_values_inst.append(vals)
        tree = commit_traces(
            [aux_flat_inst[i] for i in order], log_blowup, hash=hash_cfg
        )
        ch.send_commitment(tree.root_dev())
        aux_values = [aux_values_inst[i] for i in order]
        for vals in aux_values:
            ch.send_ext_slice(vals)
        alpha = ch.sample_ext()
        beta = ch.sample_ext()
        return tree, tuple(aux_values), _fp2_stack(randomness), alpha, beta

    def body_auxbuild(ch, args):
        (traces_t,) = args
        randomness = [ch.sample_ext() for _ in range(max_rand)]
        aux_flat_inst, aux_values_inst = [], []
        for a, t in zip(airs, traces_t):
            aux_t, vals = a.build_aux_trace(
                t,
                statement.publics,
                statement.aux_inputs,
                randomness[: a.num_randomness],
            )
            if not isinstance(aux_t, Fp):
                arr = np.asarray(aux_t, dtype=np.uint64)
                n = arr.shape[0] if arr.ndim else t.shape[0]
                aux_t = fp_from_u64(np.ascontiguousarray(arr.reshape(n, -1)))
            if not isinstance(vals, Fp2):
                vals = fp2_from_pairs_u64(
                    np.asarray(vals, dtype=np.uint64).reshape(len(vals), 2)
                )
            aux_flat_inst.append(aux_t)
            aux_values_inst.append(vals)
        return tuple(aux_flat_inst), tuple(aux_values_inst), _fp2_stack(randomness)

    def body_auxfinish(ch, args):
        tree, aux_values_inst = args
        ch.send_commitment(tree.root_dev())
        aux_values = [aux_values_inst[i] for i in order]
        for vals in aux_values:
            ch.send_ext_slice(vals)
        alpha = ch.sample_ext()
        beta = ch.sample_ext()
        return tuple(aux_values), alpha, beta

    def body_tree_nosend(ch, args):
        return tuple(lmcs.build_tree(list(args), hash=hash_cfg).layers)

    if fine:
        aux_flat_inst, aux_values_inst, rand_d = run(
            "auxbuild", body_auxbuild, (traces_fp,)
        )
        aux_ldes = [
            run(f"auxlde{k}", _lde_one, (aux_flat_inst[i],))
            for k, i in enumerate(order)
        ]
        aux_layers = run("auxtree", body_tree_nosend, tuple(aux_ldes))
        aux_tree = _tree_from(aux_ldes, aux_layers)
        del aux_flat_inst  # pre-LDE aux traces are no longer needed
        aux_values, alpha, beta = run(
            "auxfinish", body_auxfinish, (aux_tree, aux_values_inst)
        )
    else:
        aux_tree, aux_values, rand_d, alpha, beta = run(
            "aux", body_aux, (traces_fp,)
        )

    # --- phase 3: constraint eval + quotient commit + OOD point ------------
    def body_quot(ch, args):
        main_t, aux_t, pp_mats, alpha, beta, rand_d, aux_vals = args
        acc = None
        for k, i in enumerate(order):
            air = airs[i]
            dom = domains[k]
            q = evaluate_quotient(
                air,
                dom,
                main_t.matrices[k],
                aux_t.matrices[k] if air.aux_width else None,
                log_ds[k],
                alpha,
                pub_d,
                rand_d[: air.num_randomness],
                aux_vals[k],
                pp_mats[pp_for_air[i]] if air.preprocessed_width else None,
            )
            if log_ds[k] < log_d:
                q = upsample_evals(q, dom.lde_shift, log_d - log_ds[k])
            target = dom.trace_height << log_d
            if acc is None:
                acc = q
            else:
                acc = _accumulate_step(target // acc.shape[0], acc, q, beta)
        qtree = commit_quotient(
            acc, max_domain, log_d, log_blowup, hash=hash_cfg
        )
        ch.send_commitment(qtree.root_dev())
        z = ch.sample_ext()
        ch.check("ood point outside domains", _ood_valid_flag(max_domain, z))
        return qtree, z

    pp_mats = tuple(preprocessed.tree.matrices) if preprocessed else ()
    if fine:
        def _quot_one(ch, args, k=None, i=None):
            main_m, aux_m, pp_m, alpha, beta, rand_d, aux_v, acc = args
            air = airs[i]
            dom = domains[k]
            q = evaluate_quotient(
                air, dom, main_m, aux_m, log_ds[k], alpha, pub_d,
                rand_d[: air.num_randomness], aux_v, pp_m,
            )
            if log_ds[k] < log_d:
                q = upsample_evals(q, dom.lde_shift, log_d - log_ds[k])
            target = dom.trace_height << log_d
            if acc is None:
                return q
            return _accumulate_step(target // acc.shape[0], acc, q, beta)

        acc = None
        for k, i in enumerate(order):
            import functools as _ft

            acc = run(
                f"quot{k}",
                _ft.partial(_quot_one, k=k, i=i),
                (
                    main_tree.matrices[k],
                    aux_tree.matrices[k] if airs[i].aux_width else None,
                    pp_mats[pp_for_air[i]] if airs[i].preprocessed_width else None,
                    alpha, beta, rand_d, aux_values[k], acc,
                ),
            )

        def body_qcommit(ch, args):
            (acc,) = args
            qtree = commit_quotient(
                acc, max_domain, log_d, log_blowup, hash=hash_cfg
            )
            ch.send_commitment(qtree.root_dev())
            z = ch.sample_ext()
            ch.check("ood point outside domains", _ood_valid_flag(max_domain, z))
            return qtree, z

        quotient_tree, z = run("qcommit", body_qcommit, (acc,))
        # nothing below reads the pre-LDE traces or the quotient
        # accumulator; at 2^20 every freed buffer matters (the committed
        # trees alone hold ~7.5 GB through the DEEP/FRI phases)
        del acc, traces_fp, pub_d, rand_d
    else:
        quotient_tree, z = run(
            "quotient",
            body_quot,
            (main_tree, aux_tree, pp_mats, alpha, beta, rand_d, aux_values),
        )

    # --- phases 4..: PCS opening, split finely: whole-opening graphs
    # compile super-linearly (XLA), so claims / DEEP / each FRI round /
    # final run as separate jitted phases (still zero eager ops between).
    input_trees = ([preprocessed.tree] if preprocessed else []) + [
        main_tree,
        aux_tree,
        quotient_tree,
    ]

    # Coset point tables for the claims/DEEP phases, computed eagerly ONCE
    # and threaded through the phase arguments: captured concrete tables
    # become multi-MB MLIR constants (compile-wall bloat; materializing
    # them OOMed the 2^20 claims phase — see pcs._bary_weights_dev).
    pts_keys = sorted(
        {
            (h.bit_length() - 1, gl.canonical_lde_shift(h.bit_length() - 1))
            for t in input_trees
            for h in t.heights
        }
        | {(max_domain.log_lde_height, max_domain.lde_shift % gl.P)}
    )
    pts_tables = tuple(pcs.coset_points(*k) for k in pts_keys)

    def body_claims(ch, args):
        trees, z, tables = args
        points = dict(zip(pts_keys, tables))
        z_next = fp2_mul_base(z, fp_const(max_domain.trace_generator))
        zs = [z, z_next]
        claims = pcs.compute_deep_claims(list(trees), zs, points=points)
        from ..field.goldilocks import fp2_concat

        for per_tree in claims.evals:
            ch.send_ext_slice(fp2_concat(per_tree, axis=0))
        return tuple(tuple(pt) for pt in claims.evals), tuple(zs)

    if fine:
        # One claims phase PER TREE: inside a single phase XLA schedules
        # the per-matrix barycentric evals concurrently (no data deps),
        # stacking several multi-100 MB chunk temporaries while the
        # committed trees already hold ~7.5 GB — OOMed the chip at 2^20.
        # Separate phases serialize by construction.
        per_tree_evals = []
        zs = None
        for t_i, tree in enumerate(input_trees):
            def body_claims_one(ch, args):
                tree_, z, tables = args
                points = dict(zip(pts_keys, tables))
                z_next = fp2_mul_base(
                    z, fp_const(max_domain.trace_generator)
                )
                zs_l = [z, z_next]
                claims = pcs.compute_deep_claims(
                    [tree_], zs_l, points=points,
                    max_height=max_domain.lde_height,
                )
                return (claims.evals[0][0], claims.evals[1][0]), tuple(zs_l)

            pair, zs = run(
                f"claims{t_i}", body_claims_one, (tree, z, pts_tables)
            )
            per_tree_evals.append(pair)

        def body_claims_send(ch, args):
            (pairs,) = args
            evals = [[pt[p] for pt in pairs] for p in range(2)]
            from ..field.goldilocks import fp2_concat

            for per_t in evals:
                ch.send_ext_slice(fp2_concat(per_t, axis=0))
            return tuple(tuple(pt) for pt in evals)

        claim_evals = run(
            "claimsend", body_claims_send, (tuple(per_tree_evals),)
        )
    else:
        claim_evals, zs = run(
            "claims", body_claims, (tuple(input_trees), z, pts_tables)
        )

    def body_deep(ch, args):
        trees, claim_evals, zs, tables = args
        points = dict(zip(pts_keys, tables))
        claims = pcs.DeepClaims(
            evals=[list(pt) for pt in claim_evals],
            aligned_widths=[
                [lmcs.aligned_width(w) for w in t.widths] for t in trees
            ],
        )
        ch.grind(params.deep_pow_bits)
        alpha = ch.sample_ext()
        beta = ch.sample_ext()
        deep_evals = pcs.deep_compose(
            max_domain, list(trees), claims, list(zs), alpha, beta,
            points=points,
        )
        return deep_evals, pcs.fri_x_inv_init(params, max_domain)

    cur, x_inv = run(
        "deep", body_deep, (tuple(input_trees), claim_evals, zs, pts_tables)
    )

    n_rounds = pcs.fri_num_rounds(params, max_domain)
    fri_trees = []
    for r in range(n_rounds):
        def body_fri(ch, args, r=r):
            cur, x_inv = args
            return pcs.fri_round(params, cur, x_inv, ch, r == n_rounds - 1)

        tree, cur, x_inv = run(f"fri{r}", body_fri, (cur, x_inv))
        fri_trees.append(tree)

    def body_tail(ch, args):
        (cur,) = args
        pcs.fri_final(params, max_domain, cur, ch)
        ch.grind(params.query_pow_bits)
        idx_scalars = [ch.sample() for _ in range(params.num_queries)]
        return Fp(
            jnp.stack([s.lo for s in idx_scalars]),
            jnp.stack([s.hi for s in idx_scalars]),
        )

    idx_arr = run("tail", body_tail, (cur,))

    # --- phase 5: digest + flat payload ------------------------------------
    def body_final(ch, args):
        ents, idx, flags = args
        digest = ch.challenger.finalize()
        parts = [a.reshape(-1) for a in ents]
        parts.append(digest.reshape(-1))
        parts.append(idx.reshape(-1))
        if flags:
            parts.append(
                Fp(
                    jnp.stack([jnp.asarray(f, jnp.uint32) for f in flags]),
                    jnp.zeros((len(flags),), jnp.uint32),
                )
            )
        return fp_concat(parts)

    payload = run(
        "final",
        body_final,
        (
            tuple(a for (_k, a) in entries),
            idx_arr,
            tuple(f for (_l, f) in checks),
        ),
    )

    # --- THE blocking readback --------------------------------------------
    with span("transcript readback"):
        host = fp_to_u64(payload)

    off = 0
    fields: list = []
    commitments: list = []
    for kind, arr in entries:
        n = int(np.prod(arr.shape))
        vals = host[off : off + n]
        off += n
        if kind == "f":
            fields.extend(int(v) for v in vals)
        else:
            commitments.append(tuple(int(v) for v in vals))
    digest_vals = [int(v) for v in host[off : off + 4]]
    off += 4
    nq = int(np.prod(idx_arr.shape))
    idx_host = host[off : off + nq]
    off += nq
    if checks:
        for (label, _f), v in zip(checks, host[off : off + len(checks)]):
            if not int(v):
                raise AssertionError(f"device-side check failed: {label}")
        off += len(checks)
    assert off == len(host)

    # channel in post-materialize state for the query-phase hint stream
    channel = DeviceProverChannel.__new__(DeviceProverChannel)
    channel.challenger = None
    channel._entries = []
    channel._checks = []
    channel._host_fields = fields
    channel._host_commitments = commitments
    channel._digest = digest_vals

    mask = (1 << max_domain.log_lde_height) - 1
    idx_raw = [int(v) & mask for v in idx_host]

    return _query_phase_and_finalize(
        params,
        max_domain,
        input_trees,
        list(fri_trees),
        idx_raw,
        channel,
        log_heights,
        idx_arr=idx_arr,
    )
