"""AOT export / serving: compile once, serve without the model definition.

The reference has no deployment story at all (SURVEY.md §5: its runtime IS
the Python process that built the model; /root/reference/rectipy/network.py
keeps torch modules alive for every forward).  Here a compiled network
integration program is exported ONCE as a portable StableHLO artifact
(:mod:`jax.export`) together with a parameter/state snapshot, and served
later by any process with jax installed -- no YAML templates, no DSL
lowering, no :class:`~rectipy_tpu.network.Network` object, not even
``rectipy_tpu`` on the path.  This is the TPU-native equivalent of a
TorchScript/SavedModel serving bundle.

Usage::

    # build side (model definition available)
    net = Network(dt); net.add_diffeq_node(...); ...
    export_network(net, "/path/bundle", T=1000, platforms=["cpu", "tpu"])

    # serving side (only jax + numpy needed)
    from rectipy_tpu.serving import load_network   # or vendor this module
    model = load_network("/path/bundle")
    outs = model(inputs)          # (T, m) -> (R, n_out); state carries over
    model.reset()                 # back to the exported state snapshot

Design notes (TPU-first):

- The exported program is the SAME fused windowed ``lax.scan`` the library
  runs internally -- one device dispatch per ``T``-step call, weight-precision
  prep (e.g. int8 quantization) hoisted outside the scan.
- Parameters and state cross the export boundary as a FLAT LIST of arrays:
  the serving side never needs the params/state treedef (dict keys, edge
  ring-buffer tuples, ...), so the snapshot is a plain ``.npz`` of ordered
  leaves and the bundle has zero pickle / zero custom deserialization.
- ``platforms=["cpu", "tpu"]`` lowers once for both; the artifact is then
  placement-agnostic (serve replicas on CPU hosts, the fleet on TPU).
- Calls are stateful by convention, functional underneath: ``model(inputs)``
  feeds the carried state leaves back in, exactly like chained
  :meth:`Network.run` calls share an Observer.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["export_network", "load_network", "ServedNetwork"]

_PROGRAM = "program.stablehlo.bin"
_SNAPSHOT = "snapshot.npz"
_META = "meta.json"
_FORMAT_VERSION = 1


def _serve_fn(net, sampling_steps: int, batch: Optional[int] = None):
    """Pure ``(leaves, inputs(T, m)) -> (leaves', outputs(R, n_out))`` over
    the network's fused step; ``R = T`` for ``sampling_steps == 1``, else
    contiguous ``sampling_steps``-window means (``R = T // sampling_steps``,
    trailing partial window dropped).  With ``batch=B`` the program is the
    vmapped ensemble (:meth:`Network.run_batch` semantics): state leaves gain
    a leading trial axis, params stay shared, inputs/outputs are
    ``(B, T, m)`` / ``(B, R, n_out)`` and the per-step coupling matvecs batch
    into MXU matmuls."""
    step = net.make_step()
    params0 = net.parameters_pytree()
    state0 = net.init_state()
    if batch:
        state0 = jax.tree.map(
            lambda l: jnp.broadcast_to(jnp.asarray(l),
                                       (int(batch),) + jnp.shape(l)), state0)
    treedef = jax.tree.structure((params0, state0))
    s = int(sampling_steps)

    def serve(leaves, inputs):
        params, state = jax.tree.unflatten(treedef, leaves)
        prepped = net._prep_params(params)  # once per call, outside the scan

        def one(state, inputs):
            def body(st, x):
                st, out, _ = step(st, prepped, x)
                return st, out

            stateT, outs = jax.lax.scan(body, state, inputs)
            if s > 1:
                R = outs.shape[0] // s
                outs = outs[: R * s].reshape(R, s, -1).mean(axis=1)
            return stateT, outs

        if batch:
            stateT, outs = jax.vmap(one)(state, inputs)
        else:
            stateT, outs = one(state, inputs)
        # ORIGINAL (unprepped) param leaves pass through unchanged; only the
        # state leaves advance -- the carried list keeps one fixed layout
        new_leaves = jax.tree.leaves((params, stateT))
        return new_leaves, outs

    example = jax.tree.leaves((params0, state0))
    return serve, example


def export_network(net, path: str, T: int, sampling_steps: int = 1,
                   n_in: Optional[int] = None, batch: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None) -> str:
    """Export ``net``'s ``T``-step integration program + a params/state
    snapshot as a self-contained serving bundle at directory ``path``.

    ``platforms``: lowering targets (e.g. ``["cpu", "tpu"]``); default is the
    current backend only.  The input signature is fixed at ``(T, n_in)`` in
    the network dtype; ``n_in=1`` exports the single-channel common-drive
    idiom (a ``(T, 1)`` input broadcast across the input population, the
    same broadcast :meth:`Network.run` accepts).  ``batch=B`` exports the
    vmapped ``B``-trial ensemble program (:meth:`Network.run_batch`
    semantics: shared params, per-trial state, ``(B, T, n_in)`` inputs) --
    one artifact serving a whole ensemble per dispatch.

    Returns ``path``.  Reference has no analog (no persistence, no export --
    SURVEY.md §5).
    """
    from jax import export as jax_export

    net.compile()
    T = int(T)
    if T < 1:
        raise ValueError(f"T={T} must be >= 1")
    if batch is not None and int(batch) < 1:
        raise ValueError(f"batch={batch} must be >= 1")
    serve, example_leaves = _serve_fn(net, sampling_steps, batch)
    m = int(net.n_in) if n_in is None else int(n_in)
    if m not in (1, int(net.n_in)):
        raise ValueError(f"n_in={m} must be 1 (broadcast) or the input node "
                         f"width {net.n_in}")
    in_shape = (T, m) if batch is None else (int(batch), T, m)
    in_sds = jax.ShapeDtypeStruct(in_shape, net.dtype)
    leaf_sds = [jax.ShapeDtypeStruct(jnp.shape(l), jnp.asarray(l).dtype)
                for l in example_leaves]
    exp = jax_export.export(
        jax.jit(serve),
        platforms=list(platforms) if platforms is not None else None,
    )(leaf_sds, in_sds)
    blob = exp.serialize()

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PROGRAM), "wb") as f:
        f.write(bytes(blob))
    np.savez(os.path.join(path, _SNAPSHOT),
             **{f"leaf_{i:05d}": np.asarray(l)
                for i, l in enumerate(example_leaves)})
    meta = {
        "format_version": _FORMAT_VERSION,
        "T": T,
        "n_in": m,
        "n_out": int(net.n_out),
        "sampling_steps": int(sampling_steps),
        "batch": int(batch) if batch is not None else None,
        "dt": float(net.dt),
        "dtype": str(np.dtype(net.dtype)),
        "n_leaves": len(example_leaves),
        "platforms": list(exp.platforms),
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return path


class ServedNetwork:
    """A loaded serving bundle: a compiled integration program + carried
    leaves.  ``model(inputs)`` advances the state; :meth:`reset` restores the
    exported snapshot.  Needs only jax + numpy (deliberately no rectipy_tpu
    imports beyond this module)."""

    def __init__(self, exported, leaves, meta: dict):
        self._exported = exported
        self._leaves0 = list(leaves)
        self._leaves = list(leaves)
        self.meta = dict(meta)

    @property
    def T(self) -> int:
        return self.meta["T"]

    @property
    def n_in(self) -> int:
        return self.meta["n_in"]

    @property
    def n_out(self) -> int:
        return self.meta["n_out"]

    def __call__(self, inputs) -> np.ndarray:
        """One exported-program invocation: ``(T, n_in)`` inputs ->
        ``(R, n_out)`` outputs; the carried state advances (chain calls for
        longer horizons, exactly like chained ``Network.run`` windows)."""
        inputs = jnp.asarray(inputs, dtype=self.meta["dtype"])
        expect = (self.meta["T"], self.meta["n_in"])
        if self.meta.get("batch"):
            expect = (self.meta["batch"],) + expect
        if inputs.shape != expect:
            raise ValueError(
                f"ServedNetwork expects inputs of the exported shape {expect} "
                f"(the program is ahead-of-time compiled), got {inputs.shape}")
        new_leaves, outs = self._exported.call(self._leaves, inputs)
        self._leaves = list(new_leaves)
        return np.asarray(outs)

    def reset(self) -> None:
        """Restore the exported parameter/state snapshot."""
        self._leaves = list(self._leaves0)


def load_network(path: str) -> ServedNetwork:
    """Load a bundle written by :func:`export_network`."""
    from jax import export as jax_export

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"Unsupported bundle format {meta.get('format_version')} "
                         f"at {path!r} (this build reads {_FORMAT_VERSION})")
    with open(os.path.join(path, _PROGRAM), "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    data = np.load(os.path.join(path, _SNAPSHOT))
    leaves = [jnp.asarray(data[f"leaf_{i:05d}"]) for i in range(meta["n_leaves"])]
    return ServedNetwork(exported, leaves, meta)
