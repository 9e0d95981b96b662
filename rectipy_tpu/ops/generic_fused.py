"""Generic fused Pallas step for single-coupling population nodes.

Generalizes the hand-written QIF kernel (ops/kernels.py): the elementwise
tail is the node's own lowered ``tile_func`` (dsl/lower.py), so any template
without population reductions gets the fused path -- LIF, QIF(+SFA), theta,
custom user templates -- with spiking semantics layered per node class.

Scope (ValueError otherwise): RateNet, SpikeResetNet, SpikeNet and
MultiSpikeResetNet nodes with Euler integration, float32 state, exactly one
coupling matrix whose source is a state variable or an algebraic of
states/params only.  Output may be a state variable or such an algebraic
(pre-/post-update semantics follow the node class).  Mean-field templates
(population reductions), Heun, and int8 coupling run on the XLA path (which
matches this kernel's steady-state throughput anyway -- the fused path's win
is ~30x faster compilation).

Design (same shape as the QIF kernel): grid ``(j, k)`` over output and
contraction tiles, matvec accumulating in VMEM scratch on the MXU, tile_func
tail once per output tile. Scalar parameters are baked at attach time
(re-attach after ``set_param``); per-neuron parameters stream as row blocks.
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
    if vf is None or vf.tile_func is None:
        raise ValueError(
            "Generic fused step requires a DSL-built node without population "
            "reductions (mean()/sum() templates run on the XLA path)."
        )
    if getattr(node, "integrator", "euler") != "euler":
        raise ValueError("Generic fused step supports integrator='euler' only")
    cls_name = type(node).__name__
    if cls_name not in ("RateNet", "SpikeResetNet", "SpikeNet", "MultiSpikeResetNet"):
        raise ValueError(f"Generic fused step does not support {cls_name} nodes")
    if node._args.get("weights") is not None and node._args["weights"].dtype == jnp.int8:
        raise ValueError("int8 coupling runs on the XLA path (STE quantization)")
    wkeys = [k for k in vf.keys
             if (k == "weights" or k.startswith("weights_")) and not k.endswith("__scale")]
    if wkeys != ["weights"]:
        raise ValueError("Generic fused step supports exactly one coupling matrix")
    if node.dtype != jnp.float32:
        raise ValueError("Generic fused step requires float32 node state")
    state_order: List[str] = list(vf.state_order)
    src_reader = vf.make_tile_reader(vf.source_var) if vf.make_tile_reader else None
    if src_reader is None:
        raise ValueError(
            "Generic fused step requires the coupling source to be a state "
            "variable or an algebraic of states only (input-dependent sources "
            "run on the XLA path)."
        )
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
    tgt_qname = vf.target_var
    inp_key = node._inp_key

    # partition args: per-neuron vectors stream as rows; scalars bake in
    vec_keys, scalars = [], {}
    for k in vf.keys:
        if k in ("weights", inp_key):
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
        # layout: src row (k-indexed), wt, drive, [state rows j-indexed]*V,
        #         [vec rows j-indexed]*P, outs*V, acc
        src_k_ref, wt_ref, drive_ref = refs[0], refs[1], refs[2]
        state_refs = refs[3:3 + n_vars]
        vec_refs = refs[3 + n_vars:3 + n_vars + len(vec_keys)]
        out_refs = refs[3 + n_vars + len(vec_keys):-1]
        acc = refs[-1]
        kk = pl.program_id(1)

        @pl.when(kk == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += jax.lax.dot_general(
            src_k_ref[:].astype(wt_ref.dtype), wt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(kk == n_k - 1)
        def _():
            states = {q: state_refs[i][:] for i, q in enumerate(state_order)}
            a_tile = dict(scalars)
            for i, k in enumerate(vec_keys):
                a_tile[k] = vec_refs[i][:]
            ext = {tgt_qname: acc[:], inp_key: drive_ref[:]}
            resets = {}
            for skey, vidx, hard, extra in spike_specs:
                vblk = states[state_order[vidx]]
                r = jnp.where(vblk - thresh >= 0.0, 1.0, 0.0).astype(vblk.dtype)
                if hard:
                    resets[vidx] = r
                for k2 in (skey,) + extra:
                    ext[k2] = ext.get(k2, 0.0) + r / dt
            d = tile_func(states, a_tile, ext)
            for i, q in enumerate(state_order):
                new = states[q] + dt * d[q]
                if i in resets:
                    new = new * (1.0 - resets[i]) + resets[i] * reset_val
                out_refs[i][:] = new

    j_blk = lambda: pl.BlockSpec((1, tile), lambda j, kk: (0, j), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((tile, tile), lambda j, kk: (kk, j), memory_space=pltpu.VMEM)

    W = np.asarray(node._args["weights"], dtype=np.float32)
    if weights_dtype is None:
        weights_dtype = node._args["weights"].dtype
    k_blk = pl.BlockSpec((1, tile), lambda j, kk: (0, kk), memory_space=pltpu.VMEM)
    step_call = pl.pallas_call(
        kernel,
        grid=(n_j, n_k),
        in_specs=[k_blk, wt_spec, j_blk()] + [j_blk()] * (n_vars + len(vec_keys)),
        out_specs=[j_blk()] * n_vars,
        out_shape=[jax.ShapeDtypeStruct((1, n_pad), jnp.float32)] * n_vars,
        scratch_shapes=[pltpu.VMEM((1, tile), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad,
            bytes_accessed=n_pad * n_pad * np.dtype(weights_dtype).itemsize,
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

    node._args["__wt_pad__"] = pad_coupling(W, tile=tile, weights_dtype=weights_dtype)
    for k in vec_keys:
        # pad per-neuron params with 1.0: templates routinely divide by them
        # (e.g. -v/tau) and a 0-padded divisor makes NaNs in the pad lanes,
        # which then poison the real lanes through the matvec (NaN * 0 = NaN)
        node._args[f"__row_{k}__"] = jnp.pad(
            jnp.asarray(node._args[k], jnp.float32), (0, n_pad - n),
            constant_values=1.0).reshape(1, n_pad)
    for extra in ["__wt_pad__"] + [f"__row_{k}__" for k in vec_keys]:
        if extra not in node._keys:
            node._keys.append(extra)

    out_lo, out_hi = (node._start, node._stop) if node._out_alg is None else (0, 0)

    def fused_step(y, args, x):
        rows = [jax.lax.dynamic_slice(y, (i * n_pad,), (n_pad,)).reshape(1, n_pad)
                for i in range(n_vars)]
        drive = jnp.pad(jnp.broadcast_to(x, (n,)).astype(jnp.float32),
                        (0, n_pad - n)).reshape(1, n_pad)
        vec_rows = [args[f"__row_{k}__"] for k in vec_keys]
        # the coupling source row is computed ONCE per step here (O(N)
        # elementwise, negligible vs the O(N^2) matvec); computing it per
        # k-tile inside the kernel would redo it n_j times per step
        states_full = {q: rows[i] for i, q in enumerate(state_order)}
        a_full = dict(scalars)
        for i, k in enumerate(vec_keys):
            a_full[k] = args[f"__row_{k}__"]
        src_row = src_reader(states_full, a_full).astype(jnp.float32)
        outs = step_call(src_row, args["__wt_pad__"], drive, *rows, *vec_rows)
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
    node.make_step = lambda: fused_step
    node._jit_step = None  # invalidate the eager-forward cache (old step, old layout)
    node._step_version = getattr(node, "_step_version", 0) + 1
    node._fused_attached = True
