"""Roofline BPTT: custom-VJP trajectory with deferred coupling gradients.

The performance problem this solves: differentiating ``lax.scan`` over a step
containing ``W @ src(y)`` makes the backward scan carry the FULL ``(N, N)``
weight cotangent, accumulating ``outer(delta_t, src_t)`` every step -- at
N=10k that is an 800 MB float32 read-modify-write per step, ~400 GB of HBM
traffic per 500-step epoch, dwarfing the two unavoidable passes over ``W``
(forward matvec + backward transposed matvec).  Measured round 1: 2.36 s /
epoch = 2.1e6 trained neuron-updates/s, 57x below the forward roofline.

The fix is the classical BPTT factorization: the weight gradient is

    dW = sum_t delta_t (.) src_t = Delta^T @ Src

so the backward scan only needs to EMIT the per-step matvec-output cotangent
``delta_t`` (an (N,) vector) and the (recomputed/saved) coupling source
``src_t``; the (N, N) contraction happens ONCE after the scan as a single
(N, T) x (T, N) matmul on the MXU (~2TN^2 flops, milliseconds).  Per-step
HBM traffic drops to exactly one pass over ``W`` forward (W @ src) and one
backward (W^T @ delta) -- the speed of light for dense-coupled BPTT.

This is expressed as a ``jax.custom_vjp`` over the whole trajectory
``traj(weights, args, y0, xs) -> (yT, outs)``:

- forward: one scan, saving the per-step state ``y_t`` (T x n_vars*N) and the
  matvec results ``s_in_t`` (T x N per coupling) as residuals -- O(T*N)
  memory, NOT O(T*N^2);
- backward: one reverse scan carrying the state cotangent.  Per step it
  re-runs the elementwise step VJP (two small ``jax.vjp`` calls: the
  coupling-free step and the source readers) plus one ``W^T`` matvec per
  coupling, and emits ``delta_t``; afterwards each ``dW`` is one matmul.

Surrogate spike gradients, detached hard resets, and pre/post-update output
semantics follow each node class exactly (nodes.py make_step); gradient
parity with the plain autodiff-through-scan path is pinned by
tests/test_bptt_fast.py (1e-9 in float64, trajectory-identical forward).

Scope (ValueError otherwise, callers fall back to plain autodiff): DSL-built
RateNet / SpikeResetNet / SpikeNet / MultiSpikeResetNet with Euler
integration (plus Heun on RateNet: both stage matvec cotangents are emitted
and dW gains a second post-scan matmul per coupling),
at least one coupling matrix in float32 / bfloat16(_master)
(frozen-int8 coupling is inference-only; 'int8_master' trains quantized
via ops/quant.py), and coupling sources / algebraic outputs that depend on
states+params only.  Population reductions (mean()/sum(), e.g. the iku
mean-field recovery) are supported: the trajectory evaluates the
coupling-free step on the FULL population, so reductions are global.

Reference training semantics: /root/reference/rectipy/network.py:603-707
(_bptt_epochs), nodes.py:382-392 (spike/reset interleaving).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

__all__ = ["make_coupled_traj", "make_coupled_traj_prepped"]


def _make_matvec(cast: str | None):
    """Coupling contraction 4-tuple ``(prep, mv, mv_t, grad_w)`` matching
    dsl.lower._coupling_matvec numerics.  ``prep(w)`` is evaluated by the
    trajectories ONCE before each scan (precision casts / quantization are
    loop-invariant but XLA's LICM does not reliably hoist them out of the
    scan body -- measured +82% epoch time for int8 requantization left
    inline); ``mv``/``mv_t`` consume the prepped representation."""
    if cast == "int8":  # int8_master quantized training (ops/quant.py)
        from .quant import int8_master_ops

        return int8_master_ops()
    if cast == "int4":  # int4_master quantized training (ops/quant.py)
        from .quant import int4_master_ops

        return int4_master_ops()

    def prep(w):
        if cast == "bf16" and w.dtype not in (jnp.bfloat16, jnp.float16):
            return w.astype(jnp.bfloat16)
        return w

    def mv(w, src):
        if cast == "bf16" or w.dtype in (jnp.bfloat16, jnp.float16):
            cd = jnp.bfloat16 if cast == "bf16" else w.dtype
            out = jax.lax.dot_general(
                w.astype(cd), src.astype(cd),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.astype(src.dtype)
        return w @ src

    def mv_t(w, delta):
        """W^T @ delta with the same precision policy as the forward matvec."""
        if cast == "bf16" or w.dtype in (jnp.bfloat16, jnp.float16):
            cd = jnp.bfloat16 if cast == "bf16" else w.dtype
            out = jax.lax.dot_general(
                w.astype(cd), delta.astype(cd),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.astype(delta.dtype)
        return w.T @ delta

    def grad_w(deltas, srcs):
        """dW = Delta^T @ Src over the time axis -- ONE matmul, f32 accum."""
        if cast == "bf16":
            return jax.lax.dot_general(
                deltas.astype(jnp.bfloat16), srcs.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return jax.lax.dot_general(
            deltas, srcs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(deltas.dtype)

    return prep, mv, mv_t, grad_w


def _make_sparse_matvec(cast: str | None, cols):
    """Block-sparse analogs of the three coupling contractions.  ``cols`` is
    the static (n_br, cb) block-column table (structure never changes, so it
    folds into the program as a constant)."""
    import numpy as onp

    cd = jnp.bfloat16 if cast == "bf16" else None

    def maybe(x, w):
        if cd is not None or w.dtype == jnp.bfloat16:
            return x.astype(jnp.bfloat16)
        return x

    def mv(w, src):
        from .sparse import block_sparse_matvec

        cast_dtype = jnp.bfloat16 if (cd is not None or w.dtype == jnp.bfloat16) else None
        return block_sparse_matvec(w, cols, src, cast_dtype=cast_dtype)

    import os

    # read at BUILD time and baked into the jitted closures (changing the env
    # var after a trajectory is built has no effect); the transposed table is
    # only constructed when the gather variant is actually selected
    bwd_mode = os.environ.get("RECTIPY_SPARSE_BWD", "scatter")
    rows_T = slot_T = mask_T = M_onehot = None
    if bwd_mode == "gather":
        from .quant import _transposed_block_table

        rows_T, slot_T, mask_T = _transposed_block_table(onp.asarray(cols))
    elif bwd_mode == "onehot":
        from .quant import _onehot_col_matrix

        M_onehot = _onehot_col_matrix(onp.asarray(cols))

    def mv_t(w, delta):
        """A^T @ delta for a SQUARE block-sparse A (recurrent coupling).
        'scatter' (default): contract in forward layout and scatter-add the
        small (n_br, cb, bs) contributions -- ONE pass over the tiles.
        'onehot': the same contraction, but the column-block reduction is a
        matmul against a constant one-hot membership matrix (no scatter).
        'gather': gather each source block's incoming tiles via the
        transposed structure -- XLA materializes a copy of the whole tile
        tensor per step, measured 5x slower at N=100k (5985 vs 1169
        ms/epoch).  All are gradient-identical; RECTIPY_SPARSE_BWD
        overrides."""
        n_br, cb, bs, _ = w.shape
        d_blk = delta.reshape(n_br, bs)
        if bwd_mode != "gather":
            contrib = jnp.einsum("rcij,ri->rcj", maybe(w, w), maybe(d_blk, w),
                                 preferred_element_type=jnp.float32)
            if bwd_mode == "onehot":
                out = jnp.einsum("kj,kq->qj", contrib.reshape(n_br * cb, bs),
                                 M_onehot)
            else:
                out = jnp.zeros((n_br, bs), dtype=jnp.float32).at[cols].add(contrib)
            return out.reshape(-1).astype(delta.dtype)
        G = w[rows_T, slot_T]              # (n_bc, cb_t, bs, bs)
        D = d_blk[rows_T] * mask_T[..., None].astype(d_blk.dtype)
        out = jnp.einsum("qcij,qci->qj", maybe(G, w), maybe(D, w),
                         preferred_element_type=jnp.float32)
        return out.reshape(-1).astype(delta.dtype)

    def grad_w(deltas, srcs):
        """dA[r, c] = sum_t delta_t[row-block r] (.) src_t[block cols[r, c]]:
        one batched contraction over the saved trajectories."""
        T = deltas.shape[0]
        n_br, cb = cols.shape
        bs = deltas.shape[1] // n_br
        d_blk = deltas.reshape(T, n_br, bs)
        s_blk = srcs.reshape(T, -1, bs)[:, cols]  # (T, n_br, cb, bs)
        if cd is not None:
            d_blk = d_blk.astype(jnp.bfloat16)
            s_blk = s_blk.astype(jnp.bfloat16)
        return jnp.einsum("tri,trcj->rcij", d_blk, s_blk,
                          preferred_element_type=jnp.float32)

    def prep(w):
        if cd is not None and w.dtype not in (jnp.bfloat16, jnp.int8):
            return w.astype(jnp.bfloat16)
        return w

    return prep, mv, mv_t, grad_w


def make_coupled_traj(node, remat_steps: int = 0) -> Tuple[Callable, List[str]]:
    """Build ``traj(weights: dict, args: dict, y0, xs) -> (yT, outs)`` with a
    custom VJP deferring every coupling-weight gradient to one post-scan
    matmul.  Returns ``(traj, weight_keys)``.

    ``weights`` maps each coupling key to its matrix (the trainable master
    copy); ``args`` holds every other vector-field argument; ``xs`` is the
    ``(T, n_in)`` external-drive series fed to the node's input variable.

    ``remat_steps=K`` (Euler only, T divisible by K) checkpoints the
    trajectory in K-step chunks: the forward saves only chunk-entry states
    (O(T/K) memory instead of O(T) residuals) and the backward recomputes
    each chunk's residuals before its reverse sweep -- one extra forward
    matvec pass over W (~+50% epoch time), the custom-VJP analog of
    ``jax.checkpoint``, at the deferred-gradient roofline instead of plain
    autodiff's (N, N)-accumulator backward.
    """
    p = _node_pieces(node)
    if p.heun:
        if remat_steps > 1:
            raise ValueError("Deferred-gradient BPTT with remat_steps is "
                             "Euler-only (Heun uses plain autodiff when "
                             "checkpointing is requested).")
        return _make_heun_traj(p)
    return _make_euler_traj(p, remat_steps=remat_steps)


def _split_args(args):
    """(differentiable, auxiliary) partition: integer leaves (e.g. the
    block-sparse column tables) get float0 cotangents, never gradients."""
    diff, aux = {}, {}
    for k, v in args.items():
        (diff if jnp.issubdtype(jnp.result_type(v), jnp.inexact) else aux)[k] = v
    return diff, aux


def _node_pieces(node, allow_no_coupling: bool = False):
    """Validate a node for deferred-gradient BPTT and build the reusable
    per-population machinery: coupling source readers, the coupling-free
    step function, and the per-coupling contraction triples.  Shared by the
    single-population trajectory below and the multi-population graph
    trajectory (ops/graph_bptt.py).

    ``allow_no_coupling``: the GRAPH trajectory admits populations with NO
    internal coupling matrix (``weights=None`` nodes whose entire coupling
    rides on edges -- e.g. the block-sparse feedback showcase); the
    single-population trajectory keeps the requirement (with no couplings
    there is nothing to defer)."""
    from types import SimpleNamespace

    vf = getattr(node, "_vf", None)
    if vf is None or vf.tile_func is None:
        raise ValueError(
            "Deferred-gradient BPTT requires a DSL-built node (raw-constructor "
            "nodes use plain autodiff)."
        )
    if getattr(node, "_fused_attached", False):
        raise ValueError("Deferred-gradient BPTT requires the standard (unpadded) "
                         "state layout; build a fresh node without a fused kernel.")
    cls_name = type(node).__name__
    if cls_name not in ("RateNet", "SpikeResetNet", "SpikeNet", "MultiSpikeResetNet"):
        raise ValueError(f"Deferred-gradient BPTT does not support {cls_name} nodes")
    integrator = getattr(node, "integrator", "euler")
    if integrator not in ("euler", "heun"):
        raise ValueError(f"Deferred-gradient BPTT does not support integrator={integrator!r}")
    heun = integrator == "heun"  # nodes.py restricts heun to RateNet (no spikes)

    wkeys = [wk for _, _, wk in vf.couplings]
    if not wkeys and not allow_no_coupling:
        raise ValueError("Deferred-gradient BPTT requires at least one coupling matrix")
    for wk in wkeys:
        if node._args[wk].dtype == jnp.int8:
            # frozen int8 AND frozen int4 both store int8 carriers at rest
            raise ValueError("frozen quantized (int8/int4) coupling is "
                             "inference-only; train with float32, "
                             "bfloat16_master, int8_master, or int4_master "
                             "coupling")
    # allow_global=True: the trajectories evaluate readers on the FULL
    # population, so mean()/sum() reduction templates (e.g. iku mean-field
    # recovery) are admitted -- the reductions compute true population values
    src_readers = []
    for src, _tgt, _wk in vf.couplings:
        rd = (vf.make_tile_reader(src, allow_global=True)
              if vf.make_tile_reader else None)
        if rd is None:
            raise ValueError(
                "Deferred-gradient BPTT requires every coupling source to be a "
                "state variable or an algebraic of states/params only."
            )
        src_readers.append(rd)
    out_reader_alg = None
    if node._out_alg is not None:
        out_reader_alg = vf.make_tile_reader(node._out_alg, allow_global=True)
        if out_reader_alg is None:
            raise ValueError("Deferred-gradient BPTT requires an algebraic output "
                             "to depend on states/params only.")

    n = vf.n
    dt = node.dt
    state_order = list(vf.state_order)
    slices = [(q,) + tuple(vf.var_map[q]) for q in state_order]
    tgt_names = [tgt for _, tgt, _ in vf.couplings]
    tile_func = vf.tile_func
    inp_key = node._inp_key
    post_out = cls_name in ("SpikeNet", "MultiSpikeResetNet")
    # per-coupling contraction triples: dense matmuls or block-sparse
    # gather/scatter contractions (the column tables are static structure)
    preps, mvs, mv_ts, grad_ws = [], [], [], []
    for wk in wkeys:
        if node._args[wk].ndim == 4:
            if vf.coupling_cast == "int8":
                from .quant import make_block_int8_ops

                ops4 = make_block_int8_ops(node._args[wk + "__cols"])
            else:
                ops4 = _make_sparse_matvec(vf.coupling_cast,
                                           jnp.asarray(node._args[wk + "__cols"]))
        else:
            ops4 = _make_matvec(vf.coupling_cast)
        preps.append(ops4[0])
        mvs.append(ops4[1])
        mv_ts.append(ops4[2])
        grad_ws.append(ops4[3])

    # spiking configuration per node class (see nodes.py make_step of each)
    spike_fn = getattr(node, "spike", None)
    thresh = float(getattr(node, "_thresh", 0.0))
    reset_val = float(getattr(node, "_reset_val", 0.0))
    if cls_name == "SpikeResetNet":
        spike_specs = [((node._spike_key,), (node._reset_lo, node._reset_hi), True)]
    elif cls_name == "SpikeNet":
        spike_specs = [((node._spike_key, node._reset_key),
                        (node._spike_lo, node._spike_hi), False)]
    elif cls_name == "MultiSpikeResetNet":
        spike_specs = [((k,), (lo, hi), True)
                       for k, (lo, hi) in zip(node._spike_keys, node._segments)]
    else:
        spike_specs = []
    hard_reset_multi = cls_name == "MultiSpikeResetNet"
    out_lo, out_hi = (node._start, node._stop)

    def split_states(y):
        return {q: y[lo:hi] for q, lo, hi in slices}

    def src_fn(y, args):
        """Coupling source rows -- elementwise in the state."""
        states = split_states(y)
        return tuple(jnp.broadcast_to(rd(states, args), (n,)).astype(y.dtype)
                     for rd in src_readers)

    def step_x(y, s_ins, x, args):
        """One Euler step with the coupling matvec results supplied
        externally; mirrors the node class's make_step exactly."""
        states = split_states(y)
        a2 = dict(args)
        a2[inp_key] = x
        ext: Dict[str, jnp.ndarray] = {}
        for tgt, s_in in zip(tgt_names, s_ins):
            ext[tgt] = ext.get(tgt, 0.0) + s_in
        resets = []
        for keys, (lo, hi), hard in spike_specs:
            spikes = spike_fn(y[lo:hi] - thresh)
            if cls_name == "SpikeResetNet":
                reset = jax.lax.stop_gradient(spikes)
                a2[keys[0]] = spikes / dt
                resets.append(((lo, hi), reset))
            elif cls_name == "SpikeNet":
                sp = spikes / dt
                a2[keys[0]] = sp
                a2[keys[1]] = jax.lax.stop_gradient(sp)
            else:  # MultiSpikeResetNet
                resets.append(((lo, hi), jax.lax.stop_gradient(spikes)))
                a2[keys[0]] = spikes / dt

        d = tile_func(states, a2, ext)
        new_states = {q: states[q] + dt * d[q] for q in state_order}
        y_new = jnp.concatenate([new_states[q] for q in state_order])
        for (lo, hi), reset in resets:
            seg = y_new[lo:hi]
            if hard_reset_multi:
                seg = jnp.where(reset > 0.0, reset_val, seg)
            else:
                seg = seg * (1.0 - reset) + reset * reset_val
            y_new = y_new.at[lo:hi].set(seg)

        if out_reader_alg is not None:
            states_out = split_states(y_new) if post_out else states
            out = jnp.broadcast_to(out_reader_alg(states_out, a2), (n,))
        else:
            out = (y_new if post_out else y)[out_lo:out_hi]
        return y_new, out

    def out_pre(y, a2):
        """The node's output as read from the PRE-step state (valid only for
        pre-update-output classes, i.e. post_out=False)."""
        if out_reader_alg is not None:
            return jnp.broadcast_to(out_reader_alg(split_states(y), a2), (n,))
        return y[out_lo:out_hi]

    return SimpleNamespace(
        heun=heun, wkeys=wkeys, src_fn=src_fn, step_x=step_x,
        preps=preps, mvs=mvs,
        mv_ts=mv_ts, grad_ws=grad_ws, n=n, dt=dt, state_order=state_order,
        split_states=split_states, tile_func=tile_func, tgt_names=tgt_names,
        inp_key=inp_key, out_reader_alg=out_reader_alg, out_lo=out_lo,
        out_hi=out_hi, src_readers=src_readers, post_out=post_out,
        out_pre=out_pre, cls_name=cls_name)


def heun_fns(p):
    """Heun (RK2) stage functions for a node-pieces bundle: ``src2_fn(y, s1,
    x, args)`` -- the coupling sources at the full-Euler midpoint (a function
    of the stage-1 matvec results, so its VJP routes cotangents into both) --
    and ``step_x2(y, s1, s2, x, args)`` mirroring
    RateNet.make_step(integrator='heun').  Shared by the single-population
    trajectory and the multi-population graph trajectory."""
    (src_readers, n, dt, state_order, split_states, tile_func, tgt_names,
     inp_key, out_reader_alg, out_lo, out_hi) = (
        p.src_readers, p.n, p.dt, p.state_order, p.split_states, p.tile_func,
        p.tgt_names, p.inp_key, p.out_reader_alg, p.out_lo, p.out_hi)

    def _ext_of(s_ins):
        ext: Dict[str, jnp.ndarray] = {}
        for tgt, s_in in zip(tgt_names, s_ins):
            ext[tgt] = ext.get(tgt, 0.0) + s_in
        return ext

    def _deriv(states, s_ins, x, args):
        a2 = dict(args)
        a2[inp_key] = x
        return a2, tile_func(states, a2, _ext_of(s_ins))

    def _mid(y, s1, x, args):
        states = split_states(y)
        a2, d1 = _deriv(states, s1, x, args)
        mid = {q: states[q] + dt * d1[q] for q in state_order}
        return states, a2, d1, mid

    def src2_fn(y, s1, x, args):
        _, _, _, mid = _mid(y, s1, x, args)
        return tuple(jnp.broadcast_to(rd(mid, args), (n,)).astype(y.dtype)
                     for rd in src_readers)

    def step_x2(y, s1, s2, x, args):
        states, a2, d1, mid = _mid(y, s1, x, args)
        _, d2 = _deriv(mid, s2, x, args)
        new_states = {q: states[q] + (dt * 0.5) * (d1[q] + d2[q])
                      for q in state_order}
        y_new = jnp.concatenate([new_states[q] for q in state_order])
        if out_reader_alg is not None:
            out = jnp.broadcast_to(out_reader_alg(states, a2), (n,))
        else:
            out = y[out_lo:out_hi]
        return y_new, out

    return src2_fn, step_x2


def _make_heun_traj(p):
    wkeys, src_fn, preps, mvs, mv_ts, grad_ws = (
        p.wkeys, p.src_fn, p.preps, p.mvs, p.mv_ts, p.grad_ws)
    if True:
        # Heun (RK2) needs TWO coupling matvecs per step -- at y and at the
        # full-Euler midpoint y_mid = y + dt*k1.  The deferred factorization
        # extends stage-wise: the backward scan emits BOTH per-stage matvec
        # cotangents, and dW = Delta1^T @ Src1 + Delta2^T @ Src2 (two post-
        # scan matmuls per coupling).  The midpoint is recomputed where
        # needed (elementwise, XLA CSEs the duplicates inside one scan body).
        src2_fn, step_x2 = heun_fns(p)

        def _prep_all(weights):
            # precision casts / quantization of the loop-invariant masters,
            # evaluated OUTSIDE the scans (XLA's LICM does not reliably
            # hoist them; see _make_matvec)
            return tuple(preps[i](weights[wk]) for i, wk in enumerate(wkeys))

        def _mv_all(wp, srcs):
            return tuple(mvs[i](wp[i], s) for i, s in enumerate(srcs))

        def _mv_t_all(wp, deltas):
            return tuple(mv_ts[i](wp[i], d) for i, d in enumerate(deltas))

        @jax.custom_vjp
        def traj(weights, args, y0, xs):
            wp = _prep_all(weights)

            def body(y, x):
                s1 = _mv_all(wp, src_fn(y, args))
                s2 = _mv_all(wp, src2_fn(y, s1, x, args))
                return step_x2(y, s1, s2, x, args)

            yT, outs = jax.lax.scan(body, y0, xs)
            return yT, outs

        def traj_fwd(weights, args, y0, xs):
            wp = _prep_all(weights)

            def body(y, x):
                srcs1 = src_fn(y, args)
                s1 = _mv_all(wp, srcs1)
                srcs2 = src2_fn(y, s1, x, args)
                s2 = _mv_all(wp, srcs2)
                y_new, out = step_x2(y, s1, s2, x, args)
                return y_new, (out, y, srcs1, srcs2, s1, s2)

            yT, (outs, ys, srcs1_t, srcs2_t, s1_t, s2_t) = jax.lax.scan(body, y0, xs)
            # wp rides along as a residual: re-prepping in the backward would
            # re-run the (N, N) cast/quantization a second time per epoch
            return (yT, outs), (weights, wp, args, xs, ys, srcs1_t, srcs2_t,
                                s1_t, s2_t)

        def traj_bwd(res, cots):
            weights, wp, args, xs, ys, srcs1_t, srcs2_t, s1_t, s2_t = res
            cot_yT, cot_outs = cots
            diff_args, aux_args = _split_args(args)
            d_args0 = jax.tree.map(jnp.zeros_like, diff_args)

            def step_x2_d(y, s1, s2, x, dargs):
                return step_x2(y, s1, s2, x, {**aux_args, **dargs})

            def src2_fn_d(y, s1, x, dargs):
                return src2_fn(y, s1, x, {**aux_args, **dargs})

            def src_fn_d(y, dargs):
                return src_fn(y, {**aux_args, **dargs})

            def body(carry, per_t):
                lam, d_args = carry
                y_t, s1_, s2_, x_t, cot_out_t = per_t
                # stage C (reverse of forward stage order): VJP of the
                # coupling-free Heun update -- yields the stage-2 delta
                _, vjp_step = jax.vjp(step_x2_d, y_t, s1_, s2_, x_t, diff_args)
                dyA, ds1A, delta2, dxA, dargsA = vjp_step((lam, cot_out_t))
                # stage B: route the stage-2 source cotangent back through
                # the midpoint (depends on y AND the stage-1 matvec results)
                gsrc2 = _mv_t_all(wp, delta2)
                _, vjp_src2 = jax.vjp(src2_fn_d, y_t, s1_, x_t, diff_args)
                dyB, ds1B, dxB, dargsB = vjp_src2(gsrc2)
                delta1 = tuple(a + b for a, b in zip(ds1A, ds1B))
                # stage A: stage-1 sources read the pre-step state directly
                gsrc1 = _mv_t_all(wp, delta1)
                _, vjp_src1 = jax.vjp(src_fn_d, y_t, diff_args)
                dyC, dargsC = vjp_src1(gsrc1)
                lam_prev = dyA + dyB + dyC
                d_x = dxA + dxB
                for dpart in (dargsA, dargsB, dargsC):
                    d_args = jax.tree.map(jnp.add, d_args, dpart)
                return (lam_prev, d_args), (delta1, delta2, d_x)

            (lam0, d_args), (deltas1_t, deltas2_t, d_xs) = jax.lax.scan(
                body, (cot_yT, d_args0), (ys, s1_t, s2_t, xs, cot_outs), reverse=True)
            d_weights = {}
            for i, wk in enumerate(wkeys):
                dw = (grad_ws[i](deltas1_t[i], srcs1_t[i])
                      + grad_ws[i](deltas2_t[i], srcs2_t[i]))
                d_weights[wk] = dw.astype(weights[wk].dtype)
            import numpy as onp

            d_args_full = dict(d_args)
            for k, v in aux_args.items():
                d_args_full[k] = onp.zeros(jnp.shape(v), dtype=jax.dtypes.float0)
            return d_weights, d_args_full, lam0, d_xs

        traj.defvjp(traj_fwd, traj_bwd)
        return traj, wkeys


def _make_euler_traj(p, remat_steps: int = 0):
    wkeys, src_fn, step_x, preps, mvs, mv_ts, grad_ws = (
        p.wkeys, p.src_fn, p.step_x, p.preps, p.mvs, p.mv_ts, p.grad_ws)
    K = len(wkeys)
    R = int(remat_steps)
    # scan unroll factor: the trajectory bodies are dominated by one matvec
    # plus a tail of small elementwise/reduction kernels whose launch
    # overhead is per-iteration; unrolling lets XLA fuse across steps and
    # amortize it.  Read at BUILD time (baked into the jitted programs).
    import os

    U = max(1, int(os.environ.get("RECTIPY_SCAN_UNROLL", "1")))

    def _scan(f, init, xs, reverse=False):
        return jax.lax.scan(f, init, xs, reverse=reverse, unroll=U)

    def _prep_all(weights):
        # loop-invariant precision prep (cast/quantize), outside the scans
        return tuple(preps[i](weights[wk]) for i, wk in enumerate(wkeys))

    def _fwd_step(wp, args, y, x, with_residuals):
        srcs = src_fn(y, args)
        s_ins = tuple(mvs[i](wp[i], s) for i, s in enumerate(srcs))
        y_new, out = step_x(y, s_ins, x, args)
        if with_residuals:
            # residuals: the pre-step state and the matvec results -- O(N)
            # per step, so the backward pass never re-touches W to rebuild
            # its forward locals
            return y_new, (out, y, srcs, s_ins)
        return y_new, out

    def _make_bwd_body(wp, diff_args, aux_args):
        """Reverse-sweep step shared by the full and chunked backwards."""

        def step_x_d(y, s_ins, x, dargs):
            return step_x(y, s_ins, x, {**aux_args, **dargs})

        def src_fn_d(y, dargs):
            return src_fn(y, {**aux_args, **dargs})

        def body(carry, per_t):
            lam, d_args = carry
            y_t, s_in_t, x_t, cot_out_t = per_t
            # stage A: VJP of the coupling-free step
            _, vjp_step = jax.vjp(step_x_d, y_t, s_in_t, x_t, diff_args)
            dy1, d_s_in, d_x, d_args_step = vjp_step((lam, cot_out_t))
            # stage B: cotangent through the matvec inputs and source readers
            deltas = d_s_in  # per-coupling matvec-output cotangents, emitted
            gsrc = tuple(mv_ts[i](wp[i], d) for i, d in enumerate(deltas))
            _, vjp_src = jax.vjp(src_fn_d, y_t, diff_args)
            dy2, d_args_src = vjp_src(gsrc)
            lam_prev = dy1 + dy2
            d_args = jax.tree.map(jnp.add, d_args,
                                  jax.tree.map(jnp.add, d_args_step, d_args_src))
            return (lam_prev, d_args), (deltas, d_x)

        return body

    def _finish_d_args(d_args, aux_args):
        import numpy as onp

        d_args_full = dict(d_args)
        for k, v in aux_args.items():  # float0 cotangents for integer leaves
            d_args_full[k] = onp.zeros(jnp.shape(v), dtype=jax.dtypes.float0)
        return d_args_full

    @jax.custom_vjp
    def traj(weights, args, y0, xs):
        wp = _prep_all(weights)

        def body(y, x):
            return _fwd_step(wp, args, y, x, with_residuals=False)

        yT, outs = _scan(body, y0, xs)
        return yT, outs

    if R > 1:
        # checkpointed trajectory: the forward saves only chunk-entry states;
        # the backward recomputes each chunk's O(N)-per-step residuals before
        # its reverse sweep and accumulates the per-chunk dW contractions
        def traj_fwd(weights, args, y0, xs):
            T = xs.shape[0]
            if T % R:
                raise ValueError(
                    f"remat_steps={R} must divide the trajectory length {T}")
            wp = _prep_all(weights)
            xs_c = xs.reshape(T // R, R, *xs.shape[1:])

            def chunk(y, xc):
                def body(y, x):
                    return _fwd_step(wp, args, y, x, with_residuals=False)

                y_end, outs = _scan(body, y, xc)
                return y_end, (outs, y)

            yT, (outs_c, y_starts) = jax.lax.scan(chunk, y0, xs_c)
            outs = outs_c.reshape(T, *outs_c.shape[2:])
            return (yT, outs), (weights, wp, args, xs, y_starts)

        def traj_bwd(res, cots):
            weights, wp, args, xs, y_starts = res
            cot_yT, cot_outs = cots
            diff_args, aux_args = _split_args(args)
            d_args0 = jax.tree.map(jnp.zeros_like, diff_args)
            body = _make_bwd_body(wp, diff_args, aux_args)
            T = xs.shape[0]
            n_c = T // R
            xs_c = xs.reshape(n_c, R, *xs.shape[1:])
            cot_outs_c = cot_outs.reshape(n_c, R, *cot_outs.shape[1:])
            # per-coupling gradient accumulators in grad_w's own output
            # dtype/shape (f32 for quantized/bf16 paths, state dtype for f32)
            dW0 = {}
            for i, wk in enumerate(wkeys):
                seg = jax.ShapeDtypeStruct((R, p.n), y_starts.dtype)
                shp = jax.eval_shape(grad_ws[i], seg, seg)
                dW0[wk] = jnp.zeros(shp.shape, shp.dtype)

            def chunk_bwd(carry, per_c):
                lam, d_args, dW = carry
                y_start, xc, cotc = per_c

                def fwd_body(y, x):
                    y_new, (out, y_res, srcs, s_ins) = _fwd_step(
                        wp, args, y, x, with_residuals=True)
                    del out
                    return y_new, (y_res, srcs, s_ins)

                _, (ys, srcs_t, s_ins_t) = _scan(fwd_body, y_start, xc)
                (lam, d_args), (deltas_t, d_xc) = _scan(
                    body, (lam, d_args), (ys, s_ins_t, xc, cotc), reverse=True)
                dW = {wk: dW[wk] + grad_ws[i](deltas_t[i], srcs_t[i])
                      for i, wk in enumerate(wkeys)}
                return (lam, d_args, dW), d_xc

            (lam0, d_args, dW), d_xs_c = jax.lax.scan(
                chunk_bwd, (cot_yT, d_args0, dW0),
                (y_starts, xs_c, cot_outs_c), reverse=True)
            d_xs = d_xs_c.reshape(T, *d_xs_c.shape[2:])
            d_weights = {wk: dW[wk].astype(weights[wk].dtype) for wk in wkeys}
            return (d_weights, _finish_d_args(d_args, aux_args), lam0, d_xs)

        traj.defvjp(traj_fwd, traj_bwd)
        return traj, wkeys

    def traj_fwd(weights, args, y0, xs):
        wp = _prep_all(weights)

        def body(y, x):
            return _fwd_step(wp, args, y, x, with_residuals=True)

        yT, (outs, ys, srcs_t, s_ins_t) = _scan(body, y0, xs)
        # wp rides along as a residual: re-prepping in the backward would
        # re-run the (N, N) cast/quantization a second time per epoch
        return (yT, outs), (weights, wp, args, xs, ys, srcs_t, s_ins_t)

    def traj_bwd(res, cots):
        weights, wp, args, xs, ys, srcs_t, s_ins_t = res
        cot_yT, cot_outs = cots
        diff_args, aux_args = _split_args(args)
        d_args0 = jax.tree.map(jnp.zeros_like, diff_args)
        body = _make_bwd_body(wp, diff_args, aux_args)

        (lam0, d_args), (deltas_t, d_xs) = _scan(
            body, (cot_yT, d_args0), (ys, s_ins_t, xs, cot_outs), reverse=True)
        # the deferred contraction: dW_i = Delta_i^T @ Src_i, one matmul each
        d_weights = {wk: grad_ws[i](deltas_t[i], srcs_t[i]).astype(weights[wk].dtype)
                     for i, wk in enumerate(wkeys)}
        return d_weights, _finish_d_args(d_args, aux_args), lam0, d_xs

    traj.defvjp(traj_fwd, traj_bwd)
    return traj, wkeys


def make_coupled_traj_prepped(node):
    """Like :func:`make_coupled_traj` but the coupling-precision prep
    (cast / int8 quantization of each master) is HOISTED OUT of the
    trajectory: ``traj_p(wp, weights, args, y0, xs)`` consumes the prepped
    representations directly while gradients still attach to the f32
    masters in ``weights`` (the custom VJP computes the same deferred
    ``dW = Delta^T @ Src`` contraction; the forward never reads ``weights``).

    Used by the fused-adam training path (network._build_epoch_programs +
    ops/fused_opt.py): the optimizer update requantizes the master it just
    produced in the SAME fused pass, and the resulting ``(wq, scale)`` pair
    rides the epoch-scan carry into the next epoch -- removing the ~4 ms
    per-epoch `quantize_rows` from the N=10k epoch program entirely.
    Bit-identical to the unfused sequence (same master -> same prep).

    Euler only, no remat (callers fall back to the standard trajectory).
    Returns ``(traj_p, wkeys, preps)`` where ``preps[i](W)`` builds the
    initial prepped representation for ``wkeys[i]``.
    """
    p = _node_pieces(node)
    if p.heun:
        raise ValueError("prepped-coupling BPTT is Euler-only")
    traj_p = _make_euler_traj_prepped(p)
    return traj_p, p.wkeys, p.preps


def _zero_prep_cotangent(wp):
    """Zero cotangents for a prepped-representation pytree: float0 for
    integer leaves (int8 tensors), zeros for float leaves (scales)."""
    import numpy as onp

    def zero(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.zeros_like(x)
        return onp.zeros(jnp.shape(x), dtype=jax.dtypes.float0)

    return jax.tree.map(zero, wp)


def _make_euler_traj_prepped(p):
    wkeys, src_fn, step_x, mvs, mv_ts, grad_ws = (
        p.wkeys, p.src_fn, p.step_x, p.mvs, p.mv_ts, p.grad_ws)
    import os

    U = max(1, int(os.environ.get("RECTIPY_SCAN_UNROLL", "1")))

    def _scan(f, init, xs, reverse=False):
        return jax.lax.scan(f, init, xs, reverse=reverse, unroll=U)

    def _fwd_step(wp, args, y, x, with_residuals):
        srcs = src_fn(y, args)
        s_ins = tuple(mvs[i](wp[i], s) for i, s in enumerate(srcs))
        y_new, out = step_x(y, s_ins, x, args)
        if with_residuals:
            return y_new, (out, y, srcs, s_ins)
        return y_new, out

    def _make_bwd_body(wp, diff_args, aux_args):
        def step_x_d(y, s_ins, x, dargs):
            return step_x(y, s_ins, x, {**aux_args, **dargs})

        def src_fn_d(y, dargs):
            return src_fn(y, {**aux_args, **dargs})

        def body(carry, per_t):
            lam, d_args = carry
            y_t, s_in_t, x_t, cot_out_t = per_t
            _, vjp_step = jax.vjp(step_x_d, y_t, s_in_t, x_t, diff_args)
            dy1, d_s_in, d_x, d_args_step = vjp_step((lam, cot_out_t))
            deltas = d_s_in
            gsrc = tuple(mv_ts[i](wp[i], d) for i, d in enumerate(deltas))
            _, vjp_src = jax.vjp(src_fn_d, y_t, diff_args)
            dy2, d_args_src = vjp_src(gsrc)
            lam_prev = dy1 + dy2
            d_args = jax.tree.map(jnp.add, d_args,
                                  jax.tree.map(jnp.add, d_args_step, d_args_src))
            return (lam_prev, d_args), (deltas, d_x)

        return body

    def _finish_d_args(d_args, aux_args):
        import numpy as onp

        d_args_full = dict(d_args)
        for k, v in aux_args.items():
            d_args_full[k] = onp.zeros(jnp.shape(v), dtype=jax.dtypes.float0)
        return d_args_full

    @jax.custom_vjp
    def traj_p(wp, weights, args, y0, xs):
        def body(y, x):
            return _fwd_step(wp, args, y, x, with_residuals=False)

        yT, outs = _scan(body, y0, xs)
        return yT, outs

    def traj_p_fwd(wp, weights, args, y0, xs):
        def body(y, x):
            return _fwd_step(wp, args, y, x, with_residuals=True)

        yT, (outs, ys, srcs_t, s_ins_t) = _scan(body, y0, xs)
        return (yT, outs), (wp, weights, args, xs, ys, srcs_t, s_ins_t)

    def traj_p_bwd(res, cots):
        wp, weights, args, xs, ys, srcs_t, s_ins_t = res
        cot_yT, cot_outs = cots
        diff_args, aux_args = _split_args(args)
        d_args0 = jax.tree.map(jnp.zeros_like, diff_args)
        body = _make_bwd_body(wp, diff_args, aux_args)

        (lam0, d_args), (deltas_t, d_xs) = _scan(
            body, (cot_yT, d_args0), (ys, s_ins_t, xs, cot_outs), reverse=True)
        d_weights = {wk: grad_ws[i](deltas_t[i], srcs_t[i]).astype(weights[wk].dtype)
                     for i, wk in enumerate(wkeys)}
        return (_zero_prep_cotangent(wp), d_weights,
                _finish_d_args(d_args, aux_args), lam0, d_xs)

    traj_p.defvjp(traj_p_fwd, traj_p_bwd)
    return traj_p
