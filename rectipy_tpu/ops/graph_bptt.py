"""Deferred-gradient BPTT for multi-population graphs.

Generalizes ops/bptt.py's single-population trajectory to any DAG of
DSL-built populations and instant (function) nodes connected by
linear-family edges (stateless projections, masked, delay-buffer, synaptic
filter).  Every "big" linear contraction inside
the scan -- each population's recurrent coupling matvec AND each inter-node
edge projection -- is lifted to a *stage*: the forward scan saves only the
per-step stage inputs and outputs (O(N) per step), the backward scan emits
the per-stage matvec cotangents, and every weight gradient becomes ONE
post-scan ``Delta^T @ Src`` matmul on the MXU.  Plain autodiff would instead
carry an ``(n_out, n_in)`` cotangent accumulator through the backward scan
for every trained coupling and edge -- at N=10k that is the difference
between ~2% and ~full HBM-roofline training throughput (see ops/bptt.py).

Stage semantics: stages are ordered along the network's topological node
order.  Stage ``j``'s input (its *source* vector) is an elementwise function
``producer_j(Y, svals[:j], x, args)`` of the pre-step node states, the
results of earlier stages, and the external drive -- e.g. the source of an
edge leaving a post-update-output spiking population is that population's
stepped output, which depends on the population's own coupling stages.  The
backward pass peels stages in reverse: the VJP of the coupling-free
composite yields each stage's partial cotangent, every finalized
``delta_j`` is pushed through ``W_j^T`` and the producer VJP into earlier
stages' cotangents and the state cotangent.  This is the K-stage
generalization of the 2-stage Heun backward in ops/bptt.py.

Feedback edges (FeedbackNetwork) are supported: the previous-step source
output is part of the scan carry ``{"Y": states, "fb": prev outputs}``, each
feedback edge is a stage whose producer reads the carried value, and the
post-step carry update re-reads every source's post-update output -- so
trained feedback weights also get the one-matmul gradient.

Scope (ValueError otherwise; fit_bptt falls back to plain autodiff):
DSL-built populations (Euler all classes; Heun RateNets get two stages per
coupling), InstantNode function nodes, and the full linear edge family --
Linear / LinearMasked (trainable OR frozen masks -- the mask cotangent is
emitted explicitly from the deferred dE) / LinearMemory / LinearFilter /
LinearMemoryFilter (any max_delay: the filter is ONE ring-buffer stage) /
BlockSparseLinear (optionally with per-block conduction delays: the
trajectory carries a cursor-free ROLLED history buffer, converted to/from
the edge's circular (hist, t) form at the call boundary, and the block
gradient is ONE post-scan batched tile contraction) -- as regular or
feedback edges.  Gradient parity with plain autodiff is pinned by
tests/test_graph_bptt.py (f64).

Reference training semantics: /root/reference/rectipy/network.py:603-707.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .bptt import _make_matvec, _make_sparse_matvec, _node_pieces

__all__ = ["make_graph_traj"]


def _split_nested(d):
    """Partition a nested dict pytree into (inexact, integer) leaf trees;
    both sides keep the full dict skeleton so they merge losslessly."""
    diff, aux = {}, {}
    for k, v in d.items():
        if isinstance(v, dict):
            dv, av = _split_nested(v)
            diff[k], aux[k] = dv, av
        elif jnp.issubdtype(jnp.result_type(v), jnp.inexact):
            diff[k] = v
        else:
            aux[k] = v
    return diff, aux


def _merge_nested(diff, aux):
    out = {}
    for k, v in diff.items():
        out[k] = _merge_nested(v, aux.get(k, {})) if isinstance(v, dict) else v
    for k, v in aux.items():
        if isinstance(v, dict):
            if k not in out:
                out[k] = _merge_nested({}, v)
        elif k not in out:
            out[k] = v
    return out


def _merge_float0(d_diff, aux):
    """Rebuild the full args cotangent: real gradients for inexact leaves,
    float0 zeros for integer leaves (custom_vjp contract)."""
    import numpy as onp

    out = {}
    for k, v in d_diff.items():
        out[k] = _merge_float0(v, aux.get(k, {})) if isinstance(v, dict) else v
    for k, v in aux.items():
        if isinstance(v, dict):
            if k not in out:
                out[k] = _merge_float0({}, v)
        elif k not in out:
            out[k] = onp.zeros(jnp.shape(v), dtype=jax.dtypes.float0)
    return out


def _edge_ops(w):
    """Contraction 4-tuple (prep, mv, mv_t, grad_w) for a linear edge:
    (n_out, n_in) matvec or 1-D diagonal gains (per-source elementwise)."""
    if w.ndim == 1:
        def prep(w):
            return w

        def mv(w, s):
            return w * s

        def mv_t(w, d):
            return w * d

        def grad_w(deltas, srcs):
            return jnp.einsum("ti,ti->i", deltas, srcs)

        return prep, mv, mv_t, grad_w
    return _make_matvec(None)


def _filter_matrix_ops():
    """Contraction 4-tuple for a synaptic filter applied to the WHOLE (n, D)
    rolled delay buffer in one stage: ``F @ buf`` is a single (n, n) x (n, D)
    matmul per step whatever the delay depth, and ``dF`` is ONE post-scan
    contraction of the saved (T, n, D) trajectories.  This replaces the
    per-buffer-slot stage decomposition (one stage per delay slot, capped at
    16) -- max_delay no longer bounds the deferred path."""

    def prep(w):
        return w

    def mv(w, s):
        return w @ s

    def mv_t(w, d):
        return w.T @ d

    def grad_w(deltas, srcs):
        return jnp.einsum("tid,tjd->ij", deltas, srcs)

    return prep, mv, mv_t, grad_w


def _block_edge_ops(e):
    """Contraction 4-tuple for a ``BlockSparseLinear`` edge.  The stage
    source is the DELAY-RESOLVED ``(n_br, cb, bs)`` block stack the producer
    gathered (edges.py BlockSparseLinear.make_step), so ``mv``/``grad_w``
    are pure batched contractions on the MXU and ``mv_t`` emits the
    per-tile cotangent in gathered form -- the producer's own VJP scatters
    it back into the history buffer / source vector.  ``block_dtype``
    mirrors the edge's in-step cast (bf16-master semantics: the master and
    the saved stage records stay full precision; the contractions run on
    reduced-precision operands with f32+ accumulation).
    ``block_dtype='int8_master'``: the stage prep quantizes the master once
    per scan (per-output-row int8 + scales) and the contractions run int8
    with dynamic activation scales + f32 master gradients -- exactly the
    node-level int8_master machinery in gathered-stack form
    (ops/quant.make_block_int8_stack_ops)."""
    dtype = jnp.dtype(e.dtype)
    if getattr(e, "_int8_master", False):
        from .quant import make_block_int8_stack_ops

        qprep, qmv, qmv_t, qgrad_w = make_block_int8_stack_ops()

        def mv8(wp, s_blk):
            return qmv(wp, s_blk).astype(dtype)

        def mv_t8(wp, delta):
            return qmv_t(wp, delta).astype(dtype)

        return qprep, mv8, mv_t8, qgrad_w
    bd = e.block_dtype
    acc = jnp.result_type(dtype, jnp.float32)

    def mb(x):
        return x.astype(bd) if bd is not None else x

    def prep(w):
        return mb(w)

    def mv(w, s_blk):
        y = jnp.einsum("rcij,rcj->ri", w, mb(s_blk),
                       preferred_element_type=acc)
        return y.reshape(-1).astype(dtype)

    def mv_t(w, delta):
        n_br, cb, b, _ = w.shape
        d_blk = delta.reshape(n_br, b)
        ds = jnp.einsum("rcij,ri->rcj", w, mb(d_blk),
                        preferred_element_type=acc)
        return ds.astype(dtype)

    def grad_w(deltas, srcs):
        # deltas (T, n_out), srcs (T, n_br, cb, bs): ONE post-scan batched
        # contraction replaces the per-step (n_br, cb, bs, bs) gradient
        # accumulator plain autodiff carries through the backward scan
        T, n_br = deltas.shape[0], srcs.shape[1]
        d_blk = deltas.reshape(T, n_br, -1)
        return jnp.einsum("tri,trcj->rcij", mb(d_blk), mb(srcs),
                          preferred_element_type=acc)

    return prep, mv, mv_t, grad_w


def make_graph_traj(net, remat_steps: int = 0) -> Tuple[Callable, SimpleNamespace]:
    """Build ``traj(weights, args, Y0, xs) -> (YT, outs)`` for the whole
    compiled network, with a custom VJP deferring every coupling- and
    edge-weight gradient to one post-scan matmul.

    - ``weights``: flat dict keyed by ``"n:<label>:<wkey>"`` (population
      couplings) and ``"e:<ekey>"`` (edge weights).
    - ``args``: ``{"nodes": {label: {...}}, "edges": {ekey: {...}}}`` --
      every other parameter (masks ride in ``edges``; trainable masks get
      their cotangent from the deferred dE).
    - ``Y0``: dict of per-population state vectors; ``xs``: ``(T, n_in)``.

    Returns ``(traj, spec)``; ``spec.weight_paths`` lists
    ``(flatkey, kind, label, key)`` for each deferred weight so callers can
    assemble the ``weights`` dict from the network params pytree.

    ``remat_steps=K`` (T divisible by K) checkpoints the trajectory in
    K-step chunks: the forward saves only chunk-entry carries, the backward
    recomputes each chunk's stage residuals -- O(T/K) memory at the
    deferred-gradient roofline (see ops/bptt.py).
    """
    from ..edges import Linear, LinearMasked
    from ..network import _ekey
    from ..nodes import InstantNode

    R = int(remat_steps)
    if net._compiled is None:
        net.compile()
    order = list(net._compiled["order"])
    preds = {n: sorted(net.graph.predecessors(n)) for n in order}
    out_node = net._out_node
    # feedback edges (FeedbackNetwork): the previous-step source output is
    # part of the scan carry; each fb edge becomes a stage whose producer
    # reads that carried value, and the post-step carry update re-reads the
    # source's post-update output (network.py make_step fb semantics)
    fb_edges = net._fb_edge_list()  # [(u, v, edge_obj)]
    fb_by_target: Dict[str, list] = {}
    for u, v, _e in fb_edges:
        fb_by_target.setdefault(v, []).append(u)
    fb_sources = sorted({u for u, _, _ in fb_edges})
    has_fb = bool(fb_edges)

    progs: Dict[str, SimpleNamespace] = {}
    inst_steps: Dict[str, Callable] = {}
    for lbl in order:
        node = net.get_node(lbl)
        if isinstance(node, InstantNode):
            inst_steps[lbl] = node.make_step()
        else:
            # Euler or Heun (2-stage) pieces; coupling-free populations
            # (weights=None, all coupling on edges) are admitted here
            progs[lbl] = _node_pieces(node, allow_no_coupling=True)
    if not progs:
        raise ValueError("Deferred-gradient graph BPTT requires at least one "
                         "DSL-built population.")

    # validate edges: linear projections (optionally with delay buffers or a
    # synaptic filter state -- those join the scan carry)
    from ..edges import (BlockSparseLinear, LinearFilter, LinearMemory,
                         LinearMemoryFilter)

    def _check_edge(u, n, e):
        if type(e) not in (Linear, LinearMasked, LinearMemory, LinearFilter,
                           LinearMemoryFilter, BlockSparseLinear):
            raise ValueError(
                f"Deferred-gradient graph BPTT requires linear-family edges; "
                f"edge {u}->{n} is {type(e).__name__}.")

    for n in order:
        for u in preds[n]:
            _check_edge(u, n, net.get_edge(u, n))
    for u, v, e in fb_edges:
        _check_edge(u, v, e)

    # ---------------------------------------------------------------- stages
    # built along the topological order; producer_j sees (C, svals[:j], x,
    # args) where C = {"Y": node states, "fb": carried feedback outputs} is
    # the scan carry and svals are earlier stage results
    stages: List[SimpleNamespace] = []
    stage_idx: Dict[tuple, int] = {}
    inp_expr: Dict[str, Callable] = {}
    out_expr: Dict[str, Callable] = {}
    weight_paths: List[tuple] = []

    estate_update: Dict[str, Callable] = {}  # ekey -> new edge state expr
    # network-edge-state <-> trajectory-carry conversions (identity for the
    # rolled LinearMemory/Filter buffers; BlockSparseLinear's circular
    # (hist, t) converts to a rolled cursor-free buffer, see _edge_stage)
    estate_pack: Dict[str, Callable] = {}
    estate_unpack: Dict[str, Callable] = {}
    heun_steppers: Dict[str, Callable] = {}  # label -> step_x2 (Heun pops)

    def _ident_eff():
        def eff(wv, args):
            return wv

        def deff(dE, wv, args):
            return dE

        return eff, deff

    def _block_edge_stage(u, nname, e, producer, ek):
        """Stage for a :class:`BlockSparseLinear` edge (optionally with
        per-block conduction delays).  The producer emits the delay-resolved
        ``(n_br, cb, bs)`` gathered block stack; the W stage is the batched
        tile contraction (see ``_block_edge_ops``).

        Delay state: the edge's own circular ``(hist, t)`` pair cannot ride
        the differentiated carry (the int32 cursor would put float0
        cotangents through the hand-written reverse sweep), so the
        TRAJECTORY carries a cursor-free ROLLED buffer -- newest column 0,
        delay ``d`` read at column ``d``, i.e. a STATIC ``cols * D1 + d``
        flat gather table -- and ``spec.estate_pack/estate_unpack`` convert
        at the trajectory boundary (two O(hist) gathers per call).  The
        roll costs one extra buffer rewrite per step; the gather indices
        become program constants."""
        import numpy as onp

        bs_, nb_in, D1 = e.bs, e.nb_in, e._D1
        cols_np = onp.asarray(e.cols)
        n_br, cb = cols_np.shape
        prep_b, mv_b, mv_t_b, grad_w_b = _block_edge_ops(e)
        eff_b, deff_b = _ident_eff()
        if e.delays is None:
            cols_j = jnp.asarray(cols_np)
            edtype = jnp.dtype(e.dtype)

            def b_producer(C, svals, x, args, producer=producer):
                # cast BEFORE the gather (make_step parity); also pins the
                # stage-output/cotangent dtype to the edge dtype
                xv = producer(C, svals, x, args)
                return xv.reshape(nb_in, bs_).astype(edtype)[cols_j]
        else:
            flat = jnp.asarray(cols_np * D1 + onp.asarray(e.delays))

            def buf_new(C, svals, x, args, producer=producer, ek=ek):
                xv = producer(C, svals, x, args)
                buf = jnp.roll(C["E"][ek], 1, axis=1)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, xv.reshape(nb_in, bs_).astype(buf.dtype), 0, axis=1)

            estate_update[ek] = buf_new

            def b_producer(C, svals, x, args, buf_new=buf_new):
                return buf_new(C, svals, x, args).reshape(nb_in * D1, bs_)[flat]

            def b_pack(state, D1=D1):
                # circular slot s holds x(latest t' < t with t' mod D1 == s);
                # rolled[:, j] = x(t - 1 - j) (unwritten slots stay zero)
                hist, t = state
                idx = jnp.mod(t - 1 - jnp.arange(D1), D1)
                return hist[:, idx]

            def b_unpack(rolled, orig, T, D1=D1):
                # inverse permutation at t' = t + T; chunks shorter than the
                # buffer leave the never-written tail as the zeros it holds
                _, t0 = orig
                t1 = t0 + T
                idx = jnp.mod(t1 - 1 - jnp.arange(D1), D1)
                hist = jnp.zeros_like(rolled).at[:, idx].set(rolled)
                return (hist, t1)

            estate_pack[ek] = b_pack
            estate_unpack[ek] = b_unpack
        st = SimpleNamespace(flatkey=f"e:{ek}", prep=prep_b, mv=mv_b,
                             mv_t=mv_t_b, grad_w=grad_w_b, eff=eff_b,
                             deff=deff_b, producer=b_producer,
                             dims=(e.n_out, e.n_in),
                             shapes=((e.n_out,), (n_br, cb, bs_)))
        return [(st, ("edges", ek, "weights"))]

    def _edge_stage(u, nname, e, producer):
        """Stage(s) for one edge.  Stateless Linear/LinearMasked: one W-matvec
        stage of the source output.  LinearMemory: the W stage projects slot 0
        of the shifted+written delay buffer (buffer carried in C['E']).
        LinearFilter: an extra filter-matvec stage of the carried y, then the
        W stage of ``y' = F@y + x`` -- both weights deferred.  Returns a list
        of (stage, path) pairs; the last stage is the edge's output."""
        ek = _ekey(u, nname)
        if type(e) is BlockSparseLinear:
            return _block_edge_stage(u, nname, e, producer, ek)
        w = e.params["weights"]
        # contraction ops dispatch on the EFFECTIVE weight: LinearMasked's
        # w * mask is always 2-D (the mask is (n_out, n_in) by construction)
        # even when w holds 1-D diagonal gains, matching make_step's
        # (w * mask) @ x semantics
        wprep, mv, mv_t, grad_w = _edge_ops(
            e.params["mask"] if type(e) is LinearMasked else w)
        out = []

        if type(e) is LinearMemoryFilter:
            # buf' = F @ roll(buf) masked-written with x: ONE ring-buffer
            # filter stage -- the producer reads the whole rolled (n, D)
            # carried buffer and the stage matmuls F against it, so the stage
            # count (and compile time) is independent of max_delay.  The W
            # stage projects slot 0 of the written buffer; mirrors
            # LinearMemoryFilter.make_step / reference edges.py:144-147.
            wm = e._write_mask
            D1 = int(wm.shape[1])
            fprep, fmv, fmv_t, fgrad_w = _filter_matrix_ops()
            feff, fdeff = _ident_eff()

            def f_producer(C, svals, x, args, ek=ek):
                return jnp.roll(C["E"][ek], -1, axis=1)  # (n, D) rolled buffer

            fst = SimpleNamespace(flatkey=f"ef:{ek}", prep=fprep, mv=fmv,
                                  mv_t=fmv_t, grad_w=fgrad_w, eff=feff,
                                  deff=fdeff, producer=f_producer,
                                  dims=(e.n_in, e.n_in),
                                  shapes=((e.n_in, D1), (e.n_in, D1)))
            fidx = len(stages) + len(out)
            out.append((fst, ("edges", ek, "filter")))

            def buf_new(C, svals, x, args, producer=producer, fidx=fidx, wm=wm):
                x_u = producer(C, svals, x, args)
                return svals[fidx] * (1.0 - wm) + wm * x_u[:, None]

            estate_update[ek] = buf_new

            def producer(C, svals, x, args, buf_new=buf_new):
                return buf_new(C, svals, x, args)[:, 0]
        elif type(e) is LinearMemory:
            wm = e._write_mask

            def buf_new(C, svals, x, args, producer=producer, ek=ek, wm=wm):
                x_u = producer(C, svals, x, args)
                buf = C["E"][ek]
                return jnp.roll(buf, -1, axis=1) * (1.0 - wm) + wm * x_u[:, None]

            estate_update[ek] = buf_new

            def producer(C, svals, x, args, buf_new=buf_new):
                return buf_new(C, svals, x, args)[:, 0]
        elif type(e) is LinearFilter:
            fprep, fmv, fmv_t, fgrad_w = _edge_ops(e.params["filter"])

            def f_producer(C, svals, x, args, ek=ek):
                return C["E"][ek]  # carried filter state y

            feff, fdeff = _ident_eff()
            fst = SimpleNamespace(flatkey=f"ef:{ek}", prep=fprep, mv=fmv,
                                  mv_t=fmv_t, grad_w=fgrad_w, eff=feff,
                                  deff=fdeff, producer=f_producer,
                                  dims=(e.n_in, e.n_in))
            fidx = len(stages) + len(out)
            out.append((fst, ("edges", ek, "filter")))

            def y_new(C, svals, x, args, producer=producer, fidx=fidx):
                return svals[fidx] + producer(C, svals, x, args)

            estate_update[ek] = y_new
            producer = y_new

        mask_path = None
        if type(e) is LinearMasked:
            diag_w = w.ndim == 1  # eff[i, j] = w[j] * m[i, j]

            def eff(wv, args, ek=ek):
                return wv * args["edges"][ek]["mask"]

            def deff(dE, wv, args, ek=ek, diag=diag_w):
                d = dE * args["edges"][ek]["mask"]
                # 1-D gains: reduce the 2-D effective-weight cotangent back
                # to the per-source axis (d eff[i,j] / d w[j] = m[i,j])
                return d.sum(axis=0) if diag else d

            # the mask multiply runs in _prep_all, OUTSIDE the differentiated
            # region, so its cotangent must be emitted explicitly from the
            # same raw dE: d(w*m)/dm = w -> dmask = dE * w (added into d_args
            # at this path by the backwards below).  Trainable masks
            # therefore get the same one-contraction deferred gradient as
            # the weights (reference analog: edges.py:173-174).
            mask_path = ("edges", ek, "mask")
        else:
            eff, deff = _ident_eff()

        out.append((SimpleNamespace(flatkey=f"e:{ek}", prep=wprep, mv=mv,
                                    mv_t=mv_t, grad_w=grad_w, eff=eff,
                                    deff=deff, producer=producer,
                                    dims=(e.n_out, e.n_in),
                                    mask_path=mask_path),
                    ("edges", ek, "weights")))
        return out

    def _coupling_stage(lbl, i):
        p = progs[lbl]
        wk = p.wkeys[i]
        node = net.get_node(lbl)
        if node._args[wk].ndim == 4:
            if node._vf.coupling_cast == "int8":
                from .quant import make_block_int8_ops

                prep, mv, mv_t, grad_w = make_block_int8_ops(
                    node._args[wk + "__cols"])
            else:
                prep, mv, mv_t, grad_w = _make_sparse_matvec(
                    node._vf.coupling_cast, jnp.asarray(node._args[wk + "__cols"]))
        else:
            prep, mv, mv_t, grad_w = _make_matvec(node._vf.coupling_cast)
        rd = p.src_readers[i]
        n_, split = p.n, p.split_states

        def producer(C, svals, x, args, lbl=lbl, rd=rd, n_=n_, split=split):
            y = C["Y"][lbl]
            return jnp.broadcast_to(rd(split(y), args["nodes"][lbl]),
                                    (n_,)).astype(y.dtype)

        def eff(wv, args):
            return wv

        def deff(dE, wv, args):
            return dE

        return SimpleNamespace(flatkey=f"n:{lbl}:{wk}", prep=prep, mv=mv,
                               mv_t=mv_t, grad_w=grad_w, eff=eff, deff=deff,
                               producer=producer, dims=(p.n, p.n)), ("nodes", lbl, wk)

    # feedback-edge stages first: their producers read only the carried
    # previous-step value, so they depend on no other stage
    for u, v, e in fb_edges:
        def fb_producer(C, svals, x, args, u=u):
            return C["fb"][u]

        for st, path in _edge_stage(u, v, e, fb_producer):
            stage_idx[("fb", u, v)] = len(stages)  # last stage = edge output
            stages.append(st)
            weight_paths.append((st.flatkey,) + path)

    for nname in order:
        # 1. stages for this node's input edges (producers = source outputs)
        for u in preds[nname]:
            for st, path in _edge_stage(u, nname, net.get_edge(u, nname),
                                        out_expr[u]):
                stage_idx[("e", u, nname)] = len(stages)  # last = edge output
                stages.append(st)
                weight_paths.append((st.flatkey,) + path)

        # 2. this node's input expression: regular edges (sorted preds
        # order) then feedback contributions, summed exactly as the composed
        # step does (network.py make_step) for bit-parity
        idxs = tuple(stage_idx[("e", u, nname)] for u in preds[nname])
        fb_idxs = tuple(stage_idx[("fb", u, nname)]
                        for u in fb_by_target.get(nname, []))
        if idxs or fb_idxs:
            first = (idxs + fb_idxs)[0]

            def inp_fn(C, svals, x, args, idxs=idxs, fb_idxs=fb_idxs,
                       first=first, ext=not idxs):
                v = x + svals[first] if ext else svals[first]
                for j in (idxs + fb_idxs)[1:]:
                    v = v + svals[j]
                return v

            # NOTE: pred-less nodes still receive the external drive x even
            # when they have feedback edges (network.py make_step: inp = x,
            # then fb contributions are added)
        else:
            def inp_fn(C, svals, x, args):
                return x
        inp_expr[nname] = inp_fn

        # 3. coupling stages (stage-1 producers read this node's pre-step
        # state only; Heun populations add stage-2 producers reading the
        # full-Euler midpoint, a function of the stage-1 results and input)
        if nname in progs:
            pk = progs[nname]
            nw = len(pk.wkeys)
            for i in range(nw):
                st, path = _coupling_stage(nname, i)
                stage_idx[("c", nname, i)] = len(stages)
                stages.append(st)
                weight_paths.append((st.flatkey,) + path)
            if pk.heun:
                from .bptt import heun_fns

                src2_fn, step_x2 = heun_fns(pk)
                heun_steppers[nname] = step_x2
                c1 = tuple(stage_idx[("c", nname, i)] for i in range(nw))
                for i in range(nw):
                    base, path = _coupling_stage(nname, i)

                    def producer2(C, svals, x, args, nname=nname, c1=c1,
                                  src2_fn=src2_fn, i=i):
                        s1 = tuple(svals[j] for j in c1)
                        return src2_fn(C["Y"][nname], s1,
                                       inp_expr[nname](C, svals, x, args),
                                       args["nodes"][nname])[i]

                    st2 = SimpleNamespace(**{**vars(base),
                                             "producer": producer2})
                    stage_idx[("c2", nname, i)] = len(stages)
                    stages.append(st2)
                    weight_paths.append((st2.flatkey,) + path)

        # 4. this node's output expression
        if nname in inst_steps:
            def out_fn(C, svals, x, args, nname=nname):
                _, out = inst_steps[nname](None, args["nodes"].get(nname, {}),
                                           inp_expr[nname](C, svals, x, args))
                return out
        elif progs[nname].post_out:
            cidx = tuple(stage_idx[("c", nname, i)]
                         for i in range(len(progs[nname].wkeys)))

            def out_fn(C, svals, x, args, nname=nname, cidx=cidx):
                s_ins = tuple(svals[j] for j in cidx)
                _, out = progs[nname].step_x(
                    C["Y"][nname], s_ins, inp_expr[nname](C, svals, x, args),
                    args["nodes"][nname])
                return out
        else:
            def out_fn(C, svals, x, args, nname=nname):
                return progs[nname].out_pre(C["Y"][nname],
                                            args["nodes"][nname])
        out_expr[nname] = out_fn

    S = len(stages)
    pop_cidx = {lbl: tuple(stage_idx[("c", lbl, i)]
                           for i in range(len(progs[lbl].wkeys)))
                for lbl in progs}
    pop_c2idx = {lbl: tuple(stage_idx[("c2", lbl, i)]
                            for i in range(len(progs[lbl].wkeys)))
                 for lbl in progs if progs[lbl].heun}

    def final(C, svals, x, args):
        """Coupling-free composite step: advance every population one
        Euler/Heun step with the stage results supplied externally, and read
        the network output."""
        Y_new = {}
        for lbl in order:
            if lbl in progs:
                s_ins = tuple(svals[j] for j in pop_cidx[lbl])
                inp = inp_expr[lbl](C, svals, x, args)
                if lbl in heun_steppers:
                    s2 = tuple(svals[j] for j in pop_c2idx[lbl])
                    y_new, _ = heun_steppers[lbl](C["Y"][lbl], s_ins, s2,
                                                  inp, args["nodes"][lbl])
                else:
                    y_new, _ = progs[lbl].step_x(C["Y"][lbl], s_ins, inp,
                                                 args["nodes"][lbl])
                Y_new[lbl] = y_new
        out = out_expr[out_node](C, svals, x, args)
        # next-step feedback: re-read each source's POST-update output
        # (network.py make_step fb semantics: fb_readers on the stepped state)
        new_fb = {}
        for u in fb_sources:
            if u in progs:
                new_fb[u] = progs[u].out_pre(Y_new[u], args["nodes"][u])
            else:
                new_fb[u] = out_expr[u](C, svals, x, args)
        new_E = {ek: upd(C, svals, x, args) for ek, upd in estate_update.items()}
        return {"Y": Y_new, "fb": new_fb, "E": new_E}, out

    def _prep_all(weights, args):
        """Per-stage effective weights (masking) + precision prep
        (casts/quantization), evaluated ONCE outside each scan -- XLA's LICM
        does not reliably hoist these loop-invariant transforms."""
        return tuple(st.prep(st.eff(weights[st.flatkey], args))
                     for st in stages)

    @jax.custom_vjp
    def traj_core(weights, args, C0, xs):
        wp = _prep_all(weights, args)

        def body(C, x):
            svals = []
            for j, st in enumerate(stages):
                src = st.producer(C, tuple(svals), x, args)
                svals.append(st.mv(wp[j], src))
            return final(C, tuple(svals), x, args)

        CT, outs = jax.lax.scan(body, C0, xs)
        return CT, outs

    def traj_fwd(weights, args, C0, xs):
        wp = _prep_all(weights, args)

        def body(C, x):
            srcs, svals = [], []
            for j, st in enumerate(stages):
                src = st.producer(C, tuple(svals), x, args)
                srcs.append(src)
                svals.append(st.mv(wp[j], src))
            C_new, out = final(C, tuple(svals), x, args)
            return C_new, (out, C, tuple(srcs), tuple(svals))

        CT, (outs, Ys, srcs_t, svals_t) = jax.lax.scan(body, C0, xs)
        # wp rides along as a residual: re-prepping in the backward would
        # re-run the per-stage masking + cast/quantization a second time
        return (CT, outs), (weights, wp, args, xs, Ys, srcs_t, svals_t)

    def _make_bwd_body(wp, diff_args, aux_args):
        """Reverse-sweep step shared by the full and chunked backwards."""

        def final_d(Y, svals, x, dargs):
            return final(Y, svals, x, _merge_nested(dargs, aux_args))

        producers_d = []
        for st in stages:
            def prod_d(Y, sv_prefix, x, dargs, st=st):
                return st.producer(Y, sv_prefix, x,
                                   _merge_nested(dargs, aux_args))

            producers_d.append(prod_d)

        def body(carry, per_t):
            lam, d_args = carry
            Y_t, svals_, x_t, cot_out_t = per_t
            _, vjp_fin = jax.vjp(final_d, Y_t, svals_, x_t, diff_args)
            dY, dsv, d_x, dargsF = vjp_fin((lam, cot_out_t))
            acc = list(dsv)
            d_args = jax.tree.map(jnp.add, d_args, dargsF)
            for j in reversed(range(S)):
                delta_j = acc[j]
                g_j = stages[j].mv_t(wp[j], delta_j)
                _, vjp_p = jax.vjp(producers_d[j], Y_t, svals_[:j], x_t,
                                   diff_args)
                dY_j, dsv_j, dx_j, dargs_j = vjp_p(g_j)
                dY = jax.tree.map(jnp.add, dY, dY_j)
                for i in range(j):
                    acc[i] = acc[i] + dsv_j[i]
                d_x = d_x + dx_j
                d_args = jax.tree.map(jnp.add, d_args, dargs_j)
            return (dY, d_args), (tuple(acc), d_x)

        return body

    def traj_bwd(res, cots):
        weights, wp, args, xs, Ys, srcs_t, svals_t = res
        cot_YT, cot_outs = cots
        diff_args, aux_args = _split_nested(args)
        d_args0 = jax.tree.map(jnp.zeros_like, diff_args)
        body = _make_bwd_body(wp, diff_args, aux_args)

        (lam0, d_args), (deltas_t, d_xs) = jax.lax.scan(
            body, (cot_YT, d_args0), (Ys, svals_t, xs, cot_outs),
            reverse=True)
        full_args = _merge_nested(diff_args, aux_args)
        d_weights = {}
        for j, st in enumerate(stages):
            dE = st.grad_w(deltas_t[j], srcs_t[j])
            w = weights[st.flatkey]
            dw = st.deff(dE, w, full_args).astype(w.dtype)
            # Heun couplings appear as TWO stages with the same flatkey:
            # their contributions accumulate
            d_weights[st.flatkey] = (d_weights[st.flatkey] + dw
                                     if st.flatkey in d_weights else dw)
            mp = getattr(st, "mask_path", None)
            if mp is not None:  # trainable-mask cotangent: dmask = dE * w
                sec, lbl, key = mp
                leaf = d_args[sec][lbl][key]
                d_args[sec][lbl][key] = leaf + (dE * w).astype(leaf.dtype)
        return d_weights, _merge_float0(d_args, aux_args), lam0, d_xs

    if R > 1:
        # checkpointed trajectory (same scheme as ops/bptt.py Euler): the
        # forward saves only chunk-entry CARRIES (incl. feedback values and
        # edge buffers), the backward recomputes each chunk's stage
        # residuals and accumulates raw per-stage dE contributions per
        # flatkey (deff -- masking -- is linear, so it applies once at the
        # end to the total)
        def traj_fwd_ck(weights, args, C0, xs):
            T = xs.shape[0]
            if T % R:
                raise ValueError(
                    f"remat_steps={R} must divide the trajectory length {T}")
            wp = _prep_all(weights, args)
            xs_c = xs.reshape(T // R, R, *xs.shape[1:])

            def chunk(C, xc):
                def b(C, x):
                    svals = []
                    for j, st in enumerate(stages):
                        src = st.producer(C, tuple(svals), x, args)
                        svals.append(st.mv(wp[j], src))
                    return final(C, tuple(svals), x, args)

                C_end, outs = jax.lax.scan(b, C, xc)
                return C_end, (outs, C)

            CT, (outs_c, C_starts) = jax.lax.scan(chunk, C0, xs_c)
            outs = outs_c.reshape(T, *outs_c.shape[2:])
            return (CT, outs), (weights, wp, args, xs, C_starts)

        def traj_bwd_ck(res, cots):
            weights, wp, args, xs, C_starts = res
            cot_CT, cot_outs = cots
            diff_args, aux_args = _split_nested(args)
            d_args0 = jax.tree.map(jnp.zeros_like, diff_args)
            body = _make_bwd_body(wp, diff_args, aux_args)
            T = xs.shape[0]
            n_c = T // R
            xs_c = xs.reshape(n_c, R, *xs.shape[1:])
            cot_outs_c = cot_outs.reshape(n_c, R, *cot_outs.shape[1:])
            st_dtype = jax.tree.leaves(C_starts["Y"])[0].dtype
            dE0, fk_stage = {}, {}
            for st in stages:
                if st.flatkey in dE0:
                    continue
                # per-step stage shapes: (out, src) vectors by default, full
                # matrices for ring-buffer filter stages
                osh, ssh = getattr(st, "shapes",
                                   ((st.dims[0],), (st.dims[1],)))
                shp = jax.eval_shape(st.grad_w,
                                     jax.ShapeDtypeStruct((R,) + tuple(osh), st_dtype),
                                     jax.ShapeDtypeStruct((R,) + tuple(ssh), st_dtype))
                dE0[st.flatkey] = jnp.zeros(shp.shape, shp.dtype)
                fk_stage[st.flatkey] = st

            def chunk_bwd(carry, per_c):
                lam, d_args, dE = carry
                C_start, xc, cotc = per_c

                def fwd_body(C, x):
                    srcs, svals = [], []
                    for j, st in enumerate(stages):
                        src = st.producer(C, tuple(svals), x, args)
                        srcs.append(src)
                        svals.append(st.mv(wp[j], src))
                    C_new, _ = final(C, tuple(svals), x, args)
                    return C_new, (C, tuple(srcs), tuple(svals))

                _, (Cs, srcs_t, svals_t) = jax.lax.scan(fwd_body, C_start, xc)
                (lam, d_args), (deltas_t, d_xc) = jax.lax.scan(
                    body, (lam, d_args), (Cs, svals_t, xc, cotc), reverse=True)
                dE = dict(dE)
                for j, st in enumerate(stages):
                    dE[st.flatkey] = dE[st.flatkey] + st.grad_w(deltas_t[j],
                                                                srcs_t[j])
                return (lam, d_args, dE), d_xc

            (lam0, d_args, dE), d_xs_c = jax.lax.scan(
                chunk_bwd, (cot_CT, d_args0, dE0),
                (C_starts, xs_c, cot_outs_c), reverse=True)
            d_xs = d_xs_c.reshape(T, *d_xs_c.shape[2:])
            full_args = _merge_nested(diff_args, aux_args)
            d_weights = {fk: fk_stage[fk].deff(dE[fk], weights[fk], full_args)
                         .astype(weights[fk].dtype) for fk in dE}
            for fk, st in fk_stage.items():
                mp = getattr(st, "mask_path", None)
                if mp is not None:  # trainable-mask cotangent: dmask = dE * w
                    sec, lbl, key = mp
                    leaf = d_args[sec][lbl][key]
                    d_args[sec][lbl][key] = leaf + (dE[fk] * weights[fk]).astype(leaf.dtype)
            return d_weights, _merge_float0(d_args, aux_args), lam0, d_xs

        traj_core.defvjp(traj_fwd_ck, traj_bwd_ck)
    else:
        traj_core.defvjp(traj_fwd, traj_bwd)
    needs_carry = has_fb or bool(estate_update)
    _ident = lambda s: s  # noqa: E731 -- rolled buffers ARE the carry form
    spec = SimpleNamespace(weight_paths=weight_paths,
                           pop_labels=sorted(progs.keys()),
                           has_fb=has_fb,
                           stateful_edges=sorted(estate_update.keys()),
                           estate_pack={ek: estate_pack.get(ek, _ident)
                                        for ek in estate_update},
                           estate_unpack={ek: estate_unpack.get(
                               ek, lambda s, orig, T: s)
                               for ek in estate_update},
                           needs_carry=needs_carry)
    if needs_carry:
        # feedback networks / stateful edges: the caller passes the full
        # carry ``{"Y": states, "fb": prev outputs, "E": edge buffers}`` and
        # gets the final carry back
        return traj_core, spec

    def traj(weights, args, Y0, xs):
        """Stateless-edge, no-feedback API: carry is just the node-state dict."""
        CT, outs = traj_core(weights, args, {"Y": Y0, "fb": {}, "E": {}}, xs)
        return CT["Y"], outs

    return traj, spec
