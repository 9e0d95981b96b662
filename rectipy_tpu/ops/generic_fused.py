"""Generic fused Pallas step for single-coupling population nodes.

Generalizes the hand-written QIF kernel (ops/kernels.py): the elementwise
tail is the node's own lowered ``tile_func`` (dsl/lower.py), so any template
without population reductions gets the fused path -- LIF, QIF(+SFA), theta,
custom user templates -- with spiking semantics layered per node class.

Scope (ValueError otherwise): RateNet, SpikeResetNet, SpikeNet and
MultiSpikeResetNet nodes with Euler integration, float32 state, one or more
coupling matrices (e.g. E/I circuits built via CircuitTemplate with several
``add_edges_from_matrix`` calls) whose sources are state variables or
algebraics of states/params only.  Output may be a state variable or such an
algebraic (pre-/post-update semantics follow the node class).  RateNet also
supports ``integrator='heun'`` (derivative-mode kernel called twice per
step, mirroring the XLA Heun path's two vector-field evaluations).
Mean-field templates (population reductions) and int8 coupling run on the
XLA path (which matches this kernel's steady-state throughput anyway -- the
fused path's win is ~30x faster compilation).

Design (same shape as the QIF kernel): grid ``(j, k)`` over output and
contraction tiles, matvec accumulating in VMEM scratch on the MXU, tile_func
tail once per output tile. Scalar parameters are baked at attach time —
``set_param`` on one raises with guidance (rebuild the node to change it);
per-neuron parameters and couplings stream as padded row blocks that
``set_param`` refreshes transparently.
The node state is re-laid-out into padded contiguous blocks (state stays
padded across the whole scan; see attach_fused_qif_step).

Not compatible with multi-chip sharding (Pallas custom calls do not
auto-partition under GSPMD) -- use the XLA step for ``parallel.sharded_run``.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import _round_up, pad_coupling

__all__ = ["attach_generic_fused_step"]


def attach_generic_fused_step(node, tile: int = 512, weights_dtype=None,
                              interpret: bool = False) -> None:
    """Swap ``node``'s step for the generic fused Pallas kernel (see module
    docstring for the supported configuration)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if getattr(node, "_fused_attached", False):
        raise ValueError(
            "A fused step is already attached to this node; re-attaching would "
            "re-pad the already padded state. Rebuild the node to change the "
            "kernel configuration."
        )
    vf = getattr(node, "_vf", None)
    if vf is None or vf.tile_func is None or not getattr(vf, "tile_local", True):
        raise ValueError(
            "Generic fused step requires a DSL-built node without population "
            "reductions (mean()/sum() templates run on the XLA path -- their "
            "tile_func is global-only, a tiled mean() would be tile-local)."
        )
    cls_name = type(node).__name__
    if cls_name not in ("RateNet", "SpikeResetNet", "SpikeNet", "MultiSpikeResetNet"):
        raise ValueError(f"Generic fused step does not support {cls_name} nodes")
    integrator = getattr(node, "integrator", "euler")
    if integrator not in ("euler", "heun"):
        raise ValueError(
            f"Generic fused step does not support integrator={integrator!r} "
            "(rk4 runs on the XLA path)")
    heun_mode = integrator == "heun"
    if heun_mode and cls_name != "RateNet":
        # nodes.py enforces this at construction already; guard the seam too
        raise ValueError("integrator='heun' is only supported on RateNet nodes")
    wkeys = [k for k in vf.keys
             if (k == "weights" or k.startswith("weights_"))
             and not k.endswith("__scale") and not k.endswith("__cols")]
    if not wkeys:
        raise ValueError("Generic fused step requires at least one coupling matrix")
    for wk in wkeys:
        if node._args[wk].dtype == jnp.int8:
            raise ValueError("int8 coupling runs on the XLA path (STE quantization)")
        if node._args[wk].ndim != 2:
            raise ValueError("block-sparse coupling runs on the XLA path "
                             "(already gather-free and bandwidth-light)")
    if node.dtype != jnp.float32:
        raise ValueError("Generic fused step requires float32 node state")
    state_order: List[str] = list(vf.state_order)
    couplings = [(src, tgt, wk) for src, tgt, wk in vf.couplings if wk in wkeys]
    if sorted(wk for _, _, wk in couplings) != sorted(wkeys):
        raise ValueError("Coupling metadata does not match the node's weight keys")
    src_readers = []
    for src, _tgt, _wk in couplings:
        rd = vf.make_tile_reader(src) if vf.make_tile_reader else None
        if rd is None:
            raise ValueError(
                "Generic fused step requires every coupling source to be a state "
                "variable or an algebraic of states only (input-dependent sources "
                "run on the XLA path)."
            )
        src_readers.append(rd)
    out_reader = None
    if node._out_alg is not None:
        out_reader = vf.make_tile_reader(node._out_alg)
        if out_reader is None:
            raise ValueError(
                "Generic fused step requires an algebraic output to depend on "
                "states/params only (input-dependent outputs run on the XLA path)."
            )
    # SpikeNet/MultiSpikeResetNet return the POST-update output (nodes.py)
    post_out = cls_name in ("SpikeNet", "MultiSpikeResetNet")

    n = vf.n
    n_pad = _round_up(n, tile)
    n_j = n_pad // tile
    n_k = n_pad // tile
    dt = node.dt
    n_vars = len(state_order)
    tile_func = vf.tile_func
    K = len(couplings)
    tgt_names = [tgt for _, tgt, _ in couplings]
    inp_key = node._inp_key

    # partition args: per-neuron vectors stream as rows; scalars bake in
    vec_keys, scalars = [], {}
    for k in vf.keys:
        if k in wkeys or k == inp_key:
            continue
        val = node._args[k]
        if hasattr(val, "ndim") and val.ndim == 1:
            vec_keys.append(k)
        else:
            scalars[k] = float(val)

    # spiking configuration, unified across the node classes: a static list of
    # (args key receiving spikes/dt, state index of the threshold-condition
    # variable, hard-reset?, extra args keys also receiving spikes/dt).
    # SpikeNet injects into spike_var AND reset_var with NO hard reset (the
    # equations implement the reset); MultiSpikeResetNet hard-resets a list of
    # segments; semantics per nodes.py make_step of each class.
    def _var_idx(lo, hi):
        return next(i for i, q in enumerate(state_order)
                    if tuple(int(x) for x in vf.var_map[q]) == (int(lo), int(hi)))

    thresh = reset_val = None
    if cls_name == "SpikeResetNet":
        thresh, reset_val = float(node._thresh), float(node._reset_val)
        spike_specs = [(node._spike_key,
                        _var_idx(node._reset_lo, node._reset_hi), True, ())]
    elif cls_name == "SpikeNet":
        thresh = float(node._thresh)
        spike_specs = [(node._spike_key,
                        _var_idx(node._spike_lo, node._spike_hi), False,
                        (node._reset_key,))]
    elif cls_name == "MultiSpikeResetNet":
        thresh, reset_val = float(node._thresh), float(node._reset_val)
        spike_specs = [(k, _var_idx(lo, hi), True, ())
                       for k, (lo, hi) in zip(node._spike_keys, node._segments)]
    else:
        spike_specs = []

    def kernel(*refs):
        # layout: [src row (k-indexed)]*K, [wt]*K, drive,
        #         [state rows j-indexed]*V, [vec rows j-indexed]*P, outs*V, acc*K
        src_refs = refs[0:K]
        wt_refs = refs[K:2 * K]
        drive_ref = refs[2 * K]
        base = 2 * K + 1
        state_refs = refs[base:base + n_vars]
        vec_refs = refs[base + n_vars:base + n_vars + len(vec_keys)]
        out_refs = refs[base + n_vars + len(vec_keys):-K]
        accs = refs[-K:]
        kk = pl.program_id(1)

        @pl.when(kk == 0)
        def _():
            for acc in accs:
                acc[:] = jnp.zeros_like(acc)

        for c in range(K):
            accs[c][:] += jax.lax.dot_general(
                src_refs[c][:].astype(wt_refs[c].dtype), wt_refs[c][:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(kk == n_k - 1)
        def _():
            states = {q: state_refs[i][:] for i, q in enumerate(state_order)}
            a_tile = dict(scalars)
            for i, k in enumerate(vec_keys):
                a_tile[k] = vec_refs[i][:]
            # drive first, then SUM coupling accumulators into their targets
            # (two couplings may share a target; a coupling may target the
            # external-input variable itself)
            ext = {inp_key: drive_ref[:]}
            for c, tgt in enumerate(tgt_names):
                ext[tgt] = ext.get(tgt, 0.0) + accs[c][:]
            resets = {}
            for skey, vidx, hard, extra in spike_specs:
                vblk = states[state_order[vidx]]
                r = jnp.where(vblk - thresh >= 0.0, 1.0, 0.0).astype(vblk.dtype)
                if hard:
                    resets[vidx] = r
                for k2 in (skey,) + extra:
                    ext[k2] = ext.get(k2, 0.0) + r / dt
            d = tile_func(states, a_tile, ext)
            if heun_mode:
                # derivative mode: the RK2 combination happens in fused_step
                # (two kernel calls per step, as the XLA Heun path's two
                # vector-field evaluations)
                for i, q in enumerate(state_order):
                    out_refs[i][:] = d[q]
            else:
                for i, q in enumerate(state_order):
                    new = states[q] + dt * d[q]
                    if i in resets:
                        new = new * (1.0 - resets[i]) + resets[i] * reset_val
                    out_refs[i][:] = new

    j_blk = lambda: pl.BlockSpec((1, tile), lambda j, kk: (0, j), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((tile, tile), lambda j, kk: (kk, j), memory_space=pltpu.VMEM)

    if weights_dtype is None:
        weights_dtype = node._args[wkeys[0]].dtype
    k_blk = pl.BlockSpec((1, tile), lambda j, kk: (0, kk), memory_space=pltpu.VMEM)
    step_call = pl.pallas_call(
        kernel,
        grid=(n_j, n_k),
        in_specs=([k_blk] * K + [wt_spec] * K + [j_blk()]
                  + [j_blk()] * (n_vars + len(vec_keys))),
        out_specs=[j_blk()] * n_vars,
        out_shape=[jax.ShapeDtypeStruct((1, n_pad), jnp.float32)] * n_vars,
        scratch_shapes=[pltpu.VMEM((1, tile), jnp.float32)] * K,
        cost_estimate=pl.CostEstimate(
            flops=2 * K * n_pad * n_pad,
            bytes_accessed=K * n_pad * n_pad * np.dtype(weights_dtype).itemsize,
            transcendentals=n_pad,
        ),
        interpret=interpret,
    )

    # ---- padded state re-layout (same scheme as attach_fused_qif_step) -----
    orig_slices = {q: tuple(vf.var_map[q]) for q in state_order}

    def pad_y(y):
        return jnp.concatenate([
            jnp.pad(y[lo:hi], (0, n_pad - (hi - lo)))
            for (lo, hi) in (orig_slices[q] for q in state_order)])

    old_to_new = {orig_slices[q]: (i * n_pad, i * n_pad + n)
                  for i, q in enumerate(state_order)}
    node.y = pad_y(node.y)
    for key, spec in list(node._var_map.items()):
        if isinstance(spec, tuple) and tuple(spec) in old_to_new:
            node._var_map[key] = old_to_new[tuple(spec)]
    if isinstance(node._var_map.get("out"), tuple):
        node._start, node._stop = node._var_map["out"]
    if cls_name == "SpikeResetNet":
        node._reset_lo, node._reset_hi = node._var_map["reset_var"]
    elif cls_name == "SpikeNet":
        node._spike_lo, node._spike_hi = old_to_new[
            (int(node._spike_lo), int(node._spike_hi))]
    elif cls_name == "MultiSpikeResetNet":
        node._segments = [old_to_new[(int(lo), int(hi))]
                          for lo, hi in node._segments]

    for c, (_, _, wk) in enumerate(couplings):
        node._args[f"__wt_pad_{c}__"] = pad_coupling(
            np.asarray(node._args[wk], dtype=np.float32), tile=tile,
            weights_dtype=weights_dtype)
    for k in vec_keys:
        # pad per-neuron PARAMS with 1.0: templates routinely divide by them
        # (e.g. -v/tau) and a 0-padded divisor makes NaNs in the pad lanes.
        # Input placeholders (spike/reset/external slots) pad with 0.0 -- the
        # tile_func ADDS injections to the stored value, so a 1.0 pad would
        # drive the pad lanes with spurious input.
        pad_val = 0.0 if k in vf.input_vars else 1.0
        node._args[f"__row_{k}__"] = jnp.pad(
            jnp.asarray(node._args[k], jnp.float32), (0, n_pad - n),
            constant_values=pad_val).reshape(1, n_pad)
    for extra in ([f"__wt_pad_{c}__" for c in range(K)]
                  + [f"__row_{k}__" for k in vec_keys]):
        if extra not in node._keys:
            node._keys.append(extra)

    out_lo, out_hi = (node._start, node._stop) if node._out_alg is None else (0, 0)
    # pad lanes of coupling source rows are forced to 0: pad-lane dynamics are
    # not meaningful (padded params), and an inf/NaN there would poison REAL
    # output lanes through the matvec (0-weight x inf = NaN)
    _lane_ok = (jnp.arange(n_pad) < n).reshape(1, n_pad)

    def _read_src(rd, states_, a_full):
        row = jnp.broadcast_to(rd(states_, a_full), (1, n_pad)).astype(jnp.float32)
        return jnp.where(_lane_ok, row, 0.0)

    def _split_rows(y):
        return [jax.lax.dynamic_slice(y, (i * n_pad,), (n_pad,)).reshape(1, n_pad)
                for i in range(n_vars)]

    def fused_step_heun(y, args, x):
        rows = _split_rows(y)
        drive = jnp.pad(jnp.broadcast_to(x, (n,)).astype(jnp.float32),
                        (0, n_pad - n)).reshape(1, n_pad)
        vec_rows = [args[f"__row_{k}__"] for k in vec_keys]
        wt_pads = [args[f"__wt_pad_{c}__"] for c in range(K)]
        a_full = dict(scalars)
        for i, k in enumerate(vec_keys):
            a_full[k] = args[f"__row_{k}__"]

        def deriv(rows_):
            states_ = {q: rows_[i] for i, q in enumerate(state_order)}
            src_rows = [_read_src(rd, states_, a_full) for rd in src_readers]
            return step_call(*src_rows, *wt_pads, drive, *rows_, *vec_rows)

        k1 = deriv(rows)
        mid = [rows[i] + dt * k1[i] for i in range(n_vars)]
        k2 = deriv(mid)
        y_new = jnp.concatenate(
            [(rows[i] + (dt * 0.5) * (k1[i] + k2[i]))[0] for i in range(n_vars)])
        if out_reader is not None:  # RateNet output is PRE-update
            states_pre = {q: rows[i] for i, q in enumerate(state_order)}
            out = jnp.broadcast_to(out_reader(states_pre, a_full), (1, n_pad))[0, :n]
        else:
            out = y[out_lo:out_hi]
        return y_new, out

    def fused_step(y, args, x):
        rows = _split_rows(y)
        drive = jnp.pad(jnp.broadcast_to(x, (n,)).astype(jnp.float32),
                        (0, n_pad - n)).reshape(1, n_pad)
        vec_rows = [args[f"__row_{k}__"] for k in vec_keys]
        # each coupling source row is computed ONCE per step here (O(N)
        # elementwise, negligible vs the O(N^2) matvec); computing it per
        # k-tile inside the kernel would redo it n_j times per step
        states_full = {q: rows[i] for i, q in enumerate(state_order)}
        a_full = dict(scalars)
        for i, k in enumerate(vec_keys):
            a_full[k] = args[f"__row_{k}__"]
        src_rows = [_read_src(rd, states_full, a_full) for rd in src_readers]
        wt_pads = [args[f"__wt_pad_{c}__"] for c in range(K)]
        outs = step_call(*src_rows, *wt_pads, drive, *rows, *vec_rows)
        y_new = jnp.concatenate([o[0] for o in outs])
        # output semantics per node class: RateNet/SpikeResetNet read the
        # PRE-update state, SpikeNet/MultiSpikeResetNet the POST-update state
        if out_reader is not None:
            states_out = ({q: outs[i] for i, q in enumerate(state_order)}
                          if post_out else states_full)
            out = jnp.broadcast_to(out_reader(states_out, a_full),
                                   (1, n_pad))[0, :n]
        elif post_out:
            out = y_new[out_lo:out_hi]
        else:
            out = y[out_lo:out_hi]
        return y_new, out

    _orig_reset = node.reset

    def reset(y=None, idx=None, _orig=_orig_reset):
        if y is not None and idx is None:
            y = np.asarray(y)
            if y.shape == (n_vars * n,):
                y = np.asarray(pad_y(jnp.asarray(y, dtype=node.dtype)))
        return _orig(y=y, idx=idx)

    node.reset = reset
    node.make_step = (lambda: fused_step_heun) if heun_mode else (lambda: fused_step)
    node._jit_step = None  # invalidate the eager-forward cache (old step, old layout)
    node._step_version = getattr(node, "_step_version", 0) + 1
    # set_param refresh support (nodes.RateNet._refresh_fused_param):
    # per-neuron rows and couplings re-pad transparently; scalars are baked
    # into the kernel and set_param raises for them
    node._fused_pad_cfg = {
        "tile": tile, "weights_dtype": weights_dtype, "n": n, "n_pad": n_pad,
        "wkeys": [wk for _, _, wk in couplings],
        "input_vars": frozenset(vf.input_vars),
    }
    node._fused_attached = True
