"""Checkpoint / resume for networks and training runs.

The reference has no persistence (SURVEY.md §5: in-memory ``Network.state`` +
``reset`` only).  Here full (params, state, opt_state, metadata) snapshots are
saved with Orbax when available, with a numpy ``.npz`` fallback, so long
training runs survive restarts.

Usage::

    save_network(net, "/path/ckpt")            # params + node/edge state
    restore_network(net, "/path/ckpt")         # in-place restore

    ckpt = TrainCheckpointer("/path/ckpts")    # rolling training snapshots
    ckpt.save(step, train=train, opt_state=opt_state, state=state)
    # restore needs a structure template (same pytree shape as was saved):
    step, pieces = ckpt.restore_latest(
        {"train": train, "opt_state": opt_state, "state": state})
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_network", "restore_network", "save_pytree", "restore_pytree",
           "TrainCheckpointer"]


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(tree, path: str) -> None:
    """Persist a pytree of arrays.  Orbax when importable, .npz otherwise.

    Only import/version drift triggers the silent fallback; a genuinely
    failing Orbax save surfaces after cleaning up its partial directory (so a
    later restore can never prefer a corrupt Orbax dir over a good .npz)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    if ocp is not None:
        abspath = os.path.abspath(path)
        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(abspath, tree, force=True)
            ckptr.wait_until_finished()
            return
        except (AttributeError, TypeError):  # orbax API drift -> portable fallback
            if os.path.isdir(abspath):
                import shutil

                shutil.rmtree(abspath, ignore_errors=True)
        except Exception:
            if os.path.isdir(abspath):
                import shutil

                shutil.rmtree(abspath, ignore_errors=True)
            raise
    np.savez(path if path.endswith(".npz") else path + ".npz", **_flatten_with_paths(tree))


def restore_pytree(template, path: str):
    """Restore a pytree saved by :func:`save_pytree` into ``template``'s
    structure (leaf shapes/dtypes from the template)."""
    npz_sibling = path if path.endswith(".npz") else path + ".npz"
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            return ckptr.restore(os.path.abspath(path), template)
        except Exception as e:
            # a good .npz written alongside (fallback save) wins over a
            # corrupt/partial Orbax dir; otherwise surface the user's actual
            # error (e.g. shape mismatch with the template) clearly
            if not os.path.exists(npz_sibling):
                raise ValueError(
                    f"Failed to restore checkpoint {path!r} into the given template "
                    f"(shape/dtype/structure mismatch?): {e}"
                ) from e
    npz_path = npz_sibling
    if not os.path.exists(npz_path):
        raise FileNotFoundError(f"No checkpoint found at {path!r} (neither Orbax dir nor {npz_path})")
    data = np.load(npz_path)
    flat = _flatten_with_paths(template)
    restored = {}
    for key, leaf in flat.items():
        if key not in data:
            raise KeyError(f"Checkpoint {npz_path} is missing leaf {key!r}")
        restored[key] = data[key]
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_entries, leaf in leaves_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_entries)
        arr = restored[key]
        new_leaves.append(jnp.asarray(arr, dtype=getattr(leaf, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _canonicalize_plastic_edges(tree: dict) -> None:
    """Add the lazily-created STDP eligibility trace to every plastic edge
    missing it (zeros, exactly the lazy init in Network.fit_stdp) so that
    snapshot and template structures always match regardless of whether a
    network has run reward-modulated STDP yet.  In place; host-side numpy
    only (never materializes device zeros)."""
    for edge_params in tree.get("params", {}).get("edges", {}).values():
        if ("x_pre" in edge_params and "x_post" in edge_params
                and "elig" not in edge_params):
            w = edge_params["weights"]
            edge_params["elig"] = np.zeros(np.shape(w), dtype=np.asarray(w).dtype)


def _all_edges(net):
    # graph edges first; a feedback edge sharing (u, v) with a graph edge is
    # skipped (its params already collide in parameters_pytree, and
    # restore's get_edge resolves graph-first -- first-wins keeps the
    # sidecar consistent with where the attributes would be written back)
    seen = set()
    for u, v in list(net.graph.edges):
        seen.add((u, v))
        yield u, v, net.get_edge(u, v)
    for u, v, edge in net._fb_edge_list():
        if (u, v) not in seen:
            yield u, v, edge


def _homeo_sidecar(net) -> dict:
    """Homeostatic-scaling side-state (`fit_stdp(homeostasis_steps=)`) of
    every 2-D STDP edge: the per-row target and the global schedule phase
    live as edge ATTRIBUTES (not params -- they must not ride into device
    programs), so snapshots carry them in a deterministic sidecar section.
    Edges that never ran homeostasis get `set=False` + zero placeholders so
    the pytree structure depends only on the network, never on history."""
    side = {}
    for u, v, edge in _all_edges(net):
        p = getattr(edge, "params", None)
        if not (p and "x_pre" in p and "x_post" in p
                and np.ndim(p.get("weights")) == 2):
            continue
        tgt = getattr(edge, "_homeo_target", None)
        # shape/dtype only -- never np.asarray the weights (a dense N=10k
        # STDP edge would round-trip 400 MB over the tunnel just for a
        # placeholder's metadata)
        w = p["weights"]
        w_dt = np.dtype(getattr(w, "dtype", np.float32))
        side[f"{u}->{v}"] = {
            "set": np.asarray(tgt is not None),
            "phase": np.asarray(int(getattr(edge, "_homeo_phase", 0)),
                                dtype=np.int32),
            "target": (np.asarray(tgt) if tgt is not None
                       else np.zeros(np.shape(w)[0], dtype=w_dt)),
        }
    return side


def save_network(net, path: str) -> None:
    """Snapshot a Network's parameters and state (nodes, edges, feedback),
    plus plasticity side-state (STDP eligibility canonicalized into params;
    homeostasis target/phase in a sidecar section)."""
    net.compile()
    payload = {"params": net.parameters_pytree(), "state": net.init_state()}
    _canonicalize_plastic_edges(payload)
    homeo = _homeo_sidecar(net)
    if homeo:
        payload["homeo"] = homeo
    save_pytree(payload, path)


def restore_network(net, path: str) -> None:
    """Restore a snapshot produced by :func:`save_network` into ``net``."""
    net.compile()

    def _template(with_elig: bool, with_homeo: bool) -> dict:
        t = {"params": net.parameters_pytree(), "state": net.init_state()}
        if with_elig:
            _canonicalize_plastic_edges(t)
        if with_homeo:
            homeo = _homeo_sidecar(net)
            if homeo:
                t["homeo"] = homeo
        return t

    # fallback chain for snapshots from older layouts (no homeo sidecar /
    # no canonicalized eligibility)
    payload = None
    for with_elig, with_homeo in ((True, True), (True, False), (False, False)):
        try:
            payload = restore_pytree(_template(with_elig, with_homeo), path)
            break
        except (ValueError, KeyError):
            if (with_elig, with_homeo) == (False, False):
                raise
    net._write_back(state=payload["state"], params=payload["params"])
    if "homeo" in payload:
        for ekey, side in payload["homeo"].items():
            u, v = ekey.split("->", 1)
            edge = net.get_edge(u, v)
            if bool(np.asarray(side["set"])):
                edge._homeo_target = jnp.asarray(side["target"])
                edge._homeo_phase = int(np.asarray(side["phase"]))
            else:  # snapshot taken before any homeostatic fit on this edge
                for attr in ("_homeo_target", "_homeo_phase"):
                    if hasattr(edge, attr):
                        delattr(edge, attr)
    else:
        # legacy snapshot with no homeo sidecar: clear any schedule state
        # from the live net -- resuming the PRE-restore schedule against
        # restored weights would silently scale toward the wrong target
        # (next fit_stdp re-derives, the pre-sidecar behavior)
        for _, _, edge in _all_edges(net):
            for attr in ("_homeo_target", "_homeo_phase"):
                if hasattr(edge, attr):
                    delattr(edge, attr)
    # an all-zero eligibility trace is identical to the lazy init -- drop it
    # so a never-reward-trained edge does not carry a dead (n_out, n_in)
    # zeros array into every program
    for u, v in list(getattr(net, "graph").edges) + [
            (u, v) for u, v, _ in net._fb_edge_list()]:
        edge = net.get_edge(u, v)
        elig = edge.params.get("elig") if hasattr(edge, "params") else None
        if elig is not None and not np.any(np.asarray(elig)):
            del edge.params["elig"]


class TrainCheckpointer:
    """Rolling step-indexed checkpoints of (train params, opt state, model
    state) with a JSON manifest -- resume support for long fits."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:012d}")

    def save(self, step: int, **pieces) -> str:
        path = self._path(step)
        save_pytree(pieces, path)
        manifest = os.path.join(self.directory, "manifest.json")
        steps = self.all_steps() + [step]
        steps = sorted(set(steps))
        # prune old checkpoints beyond `keep`
        for old in steps[:-self.keep] if self.keep else []:
            for suffix in ("", ".npz"):
                p = self._path(old) + suffix
                if os.path.isfile(p):
                    os.remove(p)
                elif os.path.isdir(p):
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)
            steps.remove(old)
        with open(manifest, "w") as f:
            json.dump({"steps": steps}, f)
        return path

    def all_steps(self) -> list:
        manifest = os.path.join(self.directory, "manifest.json")
        if os.path.exists(manifest):
            with open(manifest) as f:
                return list(json.load(f).get("steps", []))
        steps = []
        for name in os.listdir(self.directory):
            m = re.match(r"step_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(set(steps))

    def restore_latest(self, template: dict) -> Tuple[Optional[int], Optional[dict]]:
        steps = self.all_steps()
        if not steps:
            return None, None
        step = steps[-1]
        return step, restore_pytree(template, self._path(step))
