"""Pallas TPU kernels for the hot per-step update.

The benchmark-dominant op is one explicit-Euler step of a QIF(+SFA) spiking
population with dense coupling: a bandwidth-bound ``W @ s`` matvec fused with
the elementwise vector field, threshold test, and hard reset
(reference semantics: /root/reference/rectipy/nodes.py:382-392 over
qif_sfa_op, /root/reference/neuron_model_templates/spiking_neurons/qif.yaml).

Design notes (see /opt/skills/guides/pallas_guide.md):
- The coupling matrix is stored TRANSPOSED ``Wt (N, N)`` and streamed
  column-block by column-block; each grid cell computes
  ``s_row (1,N) @ Wt_block (N,TILE) -> (1,TILE)`` on the MXU, keeping the
  result in the same (sublane=1, lane=TILE) layout as the per-neuron state
  blocks so the whole elementwise tail stays in registers/VMEM -- no
  transposes, one HBM pass over W per step (the speed-of-light bound).
- States live as (1, N) rows; per-neuron params (eta) are blocked alongside.
- ``Wt`` may be bfloat16 (half the HBM traffic => ~2x steps/s at large N);
  the matvec accumulates in float32 via ``preferred_element_type``.
- Scalar model parameters are static closure constants -- they fold into the
  compiled kernel.

The kernel is a forward fast path (simulation / benchmarking); training goes
through the differentiable lax path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_qif_sfa_pallas_step", "qif_sfa_reference_step",
           "pad_coupling", "attach_fused_qif_step"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def qif_sfa_reference_step(v, s, x, W, eta, inp, *, dt, tau, tau_s, tau_x, k, alpha,
                           thresh, v_reset):
    """Pure-jnp oracle of one QIF+SFA SpikeResetNet Euler step (for testing)."""
    spikes = jnp.heaviside(v - thresh, jnp.asarray(1.0, v.dtype)) / dt
    reset = spikes * dt  # 0/1 mask
    s_in = W @ s
    dv = (v * v + (eta - x) + inp) / tau + k * s_in
    ds = -s / tau_s + spikes
    dx = -x / tau_x + alpha * spikes
    v_new = (v + dt * dv) * (1.0 - reset) + reset * v_reset
    return v_new, s + dt * ds, x + dt * dx


def make_qif_sfa_pallas_step(n: int, *, dt: float, tau: float = 1.0, tau_s: float = 1.0,
                             tau_x: float = 10.0, k: float = 15.0, alpha: float = 0.05,
                             thresh: float = 1e2, v_reset: float = -1e2,
                             tile: int = 512, weights_dtype=jnp.float32,
                             interpret: bool = False):
    """Build a fused single-Euler-step function
    ``step(v, s, x, Wt, eta, inp) -> (v', s', x')`` as one Pallas kernel.

    ``Wt`` is the transposed coupling matrix, padded to ``(n_pad, n_pad)``
    with ``n_pad = round_up(n, tile)``; use :func:`pad_coupling`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = _round_up(n, tile)
    n_j = n_pad // tile  # output-row tiles
    n_k = n_pad // tile  # contraction tiles
    inv_dt = 1.0 / dt
    inv_tau = 1.0 / tau
    inv_tau_s = 1.0 / tau_s
    inv_tau_x = 1.0 / tau_x

    # Grid (j, k): j walks output tiles, k (innermost, sequential on-core)
    # walks the contraction; the matvec partial sums accumulate in a VMEM
    # scratch and the elementwise tail runs once per j at k == n_k-1.  W
    # blocks are (tile, tile): small enough to double-buffer within the
    # ~16 MB VMEM budget at any N.
    def kernel(s_k_ref, wt_ref, s_j_ref, v_ref, x_ref, eta_ref, inp_ref,
               v_out_ref, s_out_ref, x_out_ref, acc_ref):
        kk = pl.program_id(1)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            s_k_ref[:].astype(wt_ref.dtype), wt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(kk == n_k - 1)
        def _():
            v = v_ref[:]
            x = x_ref[:]
            s_blk = s_j_ref[:]
            s_in = acc_ref[:].astype(v.dtype)
            # forward spike test (0/1), scaled by 1/dt for the synaptic
            # drive; the hard reset uses the same (detached) mask
            reset = jnp.where(v - thresh >= 0.0, 1.0, 0.0).astype(v.dtype)
            spikes = reset * inv_dt
            dv = (v * v + (eta_ref[:] - x) + inp_ref[:]) * inv_tau + k * s_in
            ds = -s_blk * inv_tau_s + spikes
            dx = -x * inv_tau_x + alpha * spikes
            v_out_ref[:] = (v + dt * dv) * (1.0 - reset) + reset * v_reset
            s_out_ref[:] = s_blk + dt * ds
            x_out_ref[:] = x + dt * dx

    j_blk = lambda: pl.BlockSpec((1, tile), lambda j, kk: (0, j), memory_space=pltpu.VMEM)
    k_blk = pl.BlockSpec((1, tile), lambda j, kk: (0, kk), memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((tile, tile), lambda j, kk: (kk, j), memory_space=pltpu.VMEM)

    pallas_step = pl.pallas_call(
        kernel,
        grid=(n_j, n_k),
        in_specs=[k_blk, wt_spec, j_blk(), j_blk(), j_blk(), j_blk(), j_blk()],
        out_specs=[j_blk(), j_blk(), j_blk()],
        out_shape=[jax.ShapeDtypeStruct((1, n_pad), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((1, tile), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad,
            bytes_accessed=n_pad * n_pad * np.dtype(weights_dtype).itemsize + 6 * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def step(v, s, x, wt_pad, eta, inp):
        def row(a):
            return jnp.pad(a, (0, n_pad - n)).reshape(1, n_pad) if n_pad != n else a.reshape(1, n_pad)

        s_row = row(s)
        v2, s2, x2 = pallas_step(s_row, wt_pad, s_row, row(v), row(x), row(eta), row(inp))
        return v2[0, :n], s2[0, :n], x2[0, :n]

    return step


def pad_coupling(W: np.ndarray, tile: int = 512, weights_dtype=jnp.float32) -> jnp.ndarray:
    """Transpose + zero-pad the coupling matrix for the fused kernel."""
    n = W.shape[0]
    n_pad = _round_up(n, tile)
    Wt = np.zeros((n_pad, n_pad), dtype=np.float32)
    Wt[:n, :n] = np.asarray(W).T
    return jnp.asarray(Wt, dtype=weights_dtype)


def attach_fused_qif_step(node, tile: int = 512, weights_dtype=None,
                          interpret: bool = False) -> None:
    """Swap a qif / qif_sfa ``SpikeResetNet``'s step for the fused Pallas
    kernel (forward fast path; training still uses the differentiable lax
    path).

    Requirements: homogeneous scalar model parameters except ``eta`` (which
    may be a per-neuron array), ``output_var='s'``, and framework-managed
    reset on ``v``.  Raises ``ValueError`` when the node doesn't qualify.
    """
    if getattr(node, "_fused_attached", False):
        raise ValueError(
            "A fused step is already attached to this node; re-attaching would "
            "re-pad the already padded state. Rebuild the node to change the "
            "kernel configuration."
        )
    vm = node._var_map
    n = node._vf.n
    need = ["v", "s"]
    has_x = isinstance(vm.get("x"), tuple)
    for name in need:
        if not isinstance(vm.get(name), tuple):
            raise ValueError(f"Fused QIF step requires state variable {name!r}")
    sl = {name: vm[name] for name in (need + (["x"] if has_x else []))}
    if (node._start, node._stop) != sl["s"]:
        raise ValueError("Fused QIF step requires output_var='s'")
    if (node._reset_lo, node._reset_hi) != sl["v"]:
        raise ValueError("Fused QIF step requires reset_var='v'")

    def scalar(name, default=None):
        key = node._param_map.get(name)
        if key is None:
            if default is None:
                raise ValueError(f"Fused QIF step: parameter {name!r} not found")
            return float(default)
        val = node._args[key]
        if hasattr(val, "ndim") and val.ndim > 0:
            raise ValueError(f"Fused QIF step requires scalar {name!r}; got array")
        return float(val)

    W = np.asarray(node._args["weights"], dtype=np.float32)
    if weights_dtype is None:
        weights_dtype = node._args["weights"].dtype
    n_pad = _round_up(n, tile)
    # build the kernel at the padded size so its wrapper is a pure reshape;
    # the node's state is kept PADDED across the whole scan (measured: per-step
    # pad/unpad of the state rows costs ~35% of the step at N=10k)
    kernel = make_qif_sfa_pallas_step(
        n_pad, dt=node.dt, tau=scalar("tau"), tau_s=scalar("tau_s"),
        tau_x=scalar("tau_x", 1.0) if has_x else 1.0,
        k=scalar("k"), alpha=scalar("alpha", 0.0) if has_x else 0.0,
        thresh=node._thresh, v_reset=node._reset_val,
        tile=tile, weights_dtype=weights_dtype, interpret=interpret)
    node._args["__wt_pad__"] = pad_coupling(W, tile=tile, weights_dtype=weights_dtype)
    eta_key = node._param_map["eta"]
    eta_pad = jnp.pad(jnp.broadcast_to(node._args[eta_key], (n,)).astype(node.dtype),
                      (0, n_pad - n))
    node._args["__eta_pad__"] = eta_pad
    for key in ("__wt_pad__", "__eta_pad__"):
        if key not in node._keys:
            node._keys.append(key)

    # re-layout the node state: padded contiguous blocks [v | s | (x)]
    state_vars = sorted(sl.items(), key=lambda kv: kv[1][0])  # by old offset
    n_vars = len(state_vars)

    def pad_y(y):
        return jnp.concatenate([
            jnp.pad(y[lo:hi], (0, n_pad - n)) for _, (lo, hi) in state_vars])

    def unpad_y(yp):
        return jnp.concatenate([yp[i * n_pad:i * n_pad + n] for i in range(n_vars)])

    old_to_new = {}
    for i, (_, (lo, hi)) in enumerate(state_vars):
        old_to_new[(lo, hi)] = (i * n_pad, i * n_pad + n)
    for key, spec in list(node._var_map.items()):
        if isinstance(spec, tuple) and spec in old_to_new:
            node._var_map[key] = old_to_new[spec]
    node._start, node._stop = node._var_map["out"] if isinstance(
        node._var_map.get("out"), tuple) else (node._start, node._stop)
    node._reset_lo, node._reset_hi = node._var_map["reset_var"]
    node.y = pad_y(node.y)

    offs = {name: old_to_new[old] for (name, old) in state_vars}
    v_off = offs["v"][0]
    s_off = offs["s"][0]
    x_off = offs["x"][0] if has_x else None

    _orig_reset = node.reset

    def reset(y=None, idx=None, _orig=_orig_reset):
        """Reset accepting unpadded (V*n,) state vectors (pads internally)."""
        if y is not None and idx is None:
            y = np.asarray(y)
            if y.shape == (n_vars * n,):
                y = np.asarray(pad_y(jnp.asarray(y, dtype=node.dtype)))
        return _orig(y=y, idx=idx)

    node.reset = reset

    def fused_step(y, args, x):
        vp = jax.lax.dynamic_slice(y, (v_off,), (n_pad,))
        sp = jax.lax.dynamic_slice(y, (s_off,), (n_pad,))
        xp = jax.lax.dynamic_slice(y, (x_off,), (n_pad,)) if has_x else jnp.zeros_like(vp)
        out = sp[:n]  # pre-update output, as the reference
        inp = jnp.pad(jnp.broadcast_to(x, (n,)).astype(vp.dtype), (0, n_pad - n))
        v2, s2, x2 = kernel(vp, sp, xp, args["__wt_pad__"], args["__eta_pad__"], inp)
        parts = [v2, s2] + ([x2] if has_x else [])
        return jnp.concatenate(parts), out

    node.make_step = lambda: fused_step
    node._jit_step = None  # invalidate the eager-forward cache (old step, old layout)
    node._step_version = getattr(node, "_step_version", 0) + 1
    node._fused_unpad = unpad_y  # for tooling that needs the logical state
    # set_param refresh support (nodes.RateNet._refresh_fused_param): eta
    # and the coupling re-pad transparently; the other scalars are baked
    # into the kernel and set_param raises for them
    node._fused_pad_cfg = {"tile": tile, "weights_dtype": weights_dtype,
                           "n": n, "n_pad": n_pad, "wkeys": ["weights"],
                           "eta_key": eta_key}
    node._fused_attached = True
