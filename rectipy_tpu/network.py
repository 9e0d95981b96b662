"""Network: graph container, fused-step compiler, and training orchestrators.

API-parity with the reference Network/FeedbackNetwork
(/root/reference/rectipy/network.py) on a fundamentally different execution
model.  The reference evaluates the graph with per-step Python recursion over
a networkx DiGraph (network.py:962-981) -- one tiny tensor op per node per dt.
Here ``compile()`` resolves the graph ONCE, at trace time, into a single pure
step function ``step(state, params, x) -> (state', out, taps)``; trajectories
are ``jax.lax.scan`` over that step, training is ``jax.grad`` through the
scan, and the whole fit/run happens in one XLA program on device:

- ``run``      -> a nested window scan with exact reference recording
                  semantics (mean-downsampled buffers, cutoff)
- ``fit_bptt`` -> scan over update chunks (truncated BPTT via stop_gradient
                  on the carried state) or over epochs; optax inside the scan
- ``fit_rls``  -> scan carrying the (W, P) recursive-least-squares state
- ``fit_ridge``-> one scan + closed-form solve

Known reference bugs intentionally not replicated (SURVEY.md §2.1):
fan-in summation through ``torch.tensor([...])`` breaking gradients
(network.py:968) -- we sum functionally; ``_rls_epoch`` loss bookkeeping
(network.py:1059/1086).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from time import perf_counter
from typing import Callable, Dict, Iterator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from networkx import DiGraph

from .edges import (RLS, STDP, BlockSparseSTDP, Linear, LinearFilter, LinearMasked, LinearMemory,
                    LinearMemoryFilter, LinearMemoryMatrix, LinearSTP,
                    BlockSparseLinear)
from .inputs import InputSpec
from .nodes import InstantNode, RateNet, SpikeNet, SpikeResetNet, resolve_dtype
from .observer import Observer
from .train import get_loss_function, get_optimizer
from .utility import add_op_name, retrieve_from_dict

# epochs per on-device scan chunk in fit_bptt(verbose=False); fixed so that
# at most two training programs compile regardless of the epoch count
_EPOCH_SCAN_CHUNK = 8


class _LRUCache(OrderedDict):
    """Bounded access-ordered cache for composed step closures and jitted
    training/run programs.  Without a bound, a session sweeping T,
    sampling_steps, or optimizer configs retains one traced program per
    distinct key for the network's lifetime (compile() flushes on graph
    changes, but normal fits never do).  64 entries is far above any regular
    workload (the bench uses < 10) while capping host memory."""

    def __init__(self, maxsize: int = 64):
        super().__init__()
        self.maxsize = maxsize

    def __getitem__(self, key):
        val = super().__getitem__(key)
        self.move_to_end(key)
        return val

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self.move_to_end(key)
        while len(self) > self.maxsize:
            self.popitem(last=False)


def _graph_weights_args(gspec, params):
    """Split a params pytree into the graph trajectory's (weights, args):
    deferred stage weights keyed by flatkey, everything else in the nested
    args tree (see ops/graph_bptt.make_graph_traj)."""
    wpaths = gspec.weight_paths
    excl = {(kind, label, key) for _, kind, label, key in wpaths}
    weights = {fk: params[kind][label][key] for fk, kind, label, key in wpaths}
    args = {sec: {lbl: {k: v for k, v in sub.items()
                        if (sec, lbl, k) not in excl}
                  for lbl, sub in params[sec].items()}
            for sec in ("nodes", "edges")}
    return weights, args

__all__ = ["Network", "FeedbackNetwork"]


def _ekey(u: str, v: str) -> str:
    return f"{u}->{v}"


def _best_start(losses) -> int:
    """Index of the lowest FINITE loss; diverged (NaN/inf) starts never win.

    ``np.argmin`` would return a NaN position (NaN poisons the min
    reduction), silently selecting a diverged start's parameters in
    :meth:`Network.fit_bptt_multistart`.  All-non-finite falls back to 0.
    """
    losses = np.asarray(losses, dtype=np.float64)
    finite = np.isfinite(losses)
    if not finite.any():
        return 0
    return int(np.argmin(np.where(finite, losses, np.inf)))


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class Network:
    """Main user interface for building, simulating, and training networks of
    differential-equation nodes, function nodes, and linear edges."""

    def __init__(self, dt: float, device: str = "cpu", dtype=jnp.float32):
        self.graph = DiGraph()
        self.device = device  # accepted for API parity; placement is XLA's job
        self.dtype = resolve_dtype(dtype)
        self.dt = dt
        self._var_map: Dict[str, str] = {}
        self._in_node: Optional[str] = None
        self._out_node: Optional[str] = None
        self._train_edge: tuple = ()
        self._compiled = None  # (order, step_fn cache key data)
        self._step_cache: Dict[tuple, Callable] = _LRUCache()
        self._fb_store: Dict[str, jnp.ndarray] = {}  # prev-step feedback outputs

    # ------------------------------------------------------------- container
    def __getitem__(self, item):
        if isinstance(item, tuple):
            return self.graph[item[0]][item[1]]
        return self.graph.nodes[item]

    def __iter__(self):
        for n in self.graph.nodes:
            yield self[n]

    def __len__(self):
        return len(self.graph.nodes)

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    @property
    def n_out(self) -> int:
        """Output width of the network's unique output node.  An uncompilable
        graph raises the compile error rather than reporting width 0
        (reference semantics, /root/reference/rectipy/network.py:439-460)."""
        if self._out_node is None:
            self.compile()
        return self[self._out_node]["n_out"]

    @property
    def n_in(self) -> int:
        """Input width of the network's unique input node.  Raises on an
        uncompilable graph (reference semantics,
        /root/reference/rectipy/network.py:439-460)."""
        if self._in_node is None:
            self.compile()
        return self[self._in_node]["n_in"]

    @property
    def nodes(self):
        return self.graph.nodes

    @property
    def state(self) -> dict:
        """State vectors of each differential-equation node."""
        states = {}
        for n in self.nodes:
            node = self.get_node(n)
            if hasattr(node, "y"):
                states[n] = node.y
        return states

    def get_node(self, node: str) -> Union[InstantNode, RateNet]:
        return self[node]["node"]

    def get_edge(self, source: str, target: str) -> Linear:
        return self[source, target]["edge"]

    def get_var(self, node: str, var: str):
        try:
            return self.get_node(node)[self._relabel_var(var)]
        except KeyError:
            return self[node][var]

    def set_var(self, node: str, var: str, val):
        try:
            n = self.get_node(node)
        except KeyError:
            raise KeyError(f"Node {node!r} does not exist in the network.")
        var = self._relabel_var(var)
        try:
            n.set_param(var, val)
        except KeyError:
            # state variable: functional slice update
            spec = getattr(n, "_var_map", {}).get(var)
            if spec is None:
                raise KeyError(f"Variable {var} was not found on node {node}.")
            lo, hi = (spec if isinstance(spec, tuple) else (spec, spec + 1))
            n.y = n.y.at[lo:hi].set(jnp.asarray(val, dtype=n.y.dtype))
        # no cache invalidation: parameters and state are jit OPERANDS, so new
        # values (and even new shapes) re-dispatch/retrace automatically; only
        # graph-structure changes require recompilation

    # -------------------------------------------------------------- building
    @classmethod
    def from_yaml(cls, node, weights=None, dt: float = 1e-3, source_var: str = None,
                  target_var: str = None, input_var: str = None, output_var: str = None,
                  device: str = "cpu", dtype=jnp.float32, label: str = "rnn",
                  train_params: list = None, **kwargs) -> "Network":
        """Legacy one-call constructor (older reference API generation, used in
        documentation/rl_example.py / rls_example.py): build a Network with a
        single diffeq node from a YAML template."""
        net = cls(dt, device=device, dtype=dtype)
        net.add_diffeq_node(label, node, input_var=input_var, output_var=output_var,
                            weights=weights, source_var=source_var, target_var=target_var,
                            train_params=train_params, **kwargs)
        return net

    def add_input_layer(self, m: int, weights=None, train: Optional[str] = None,
                        **kwargs) -> Linear:
        """Legacy helper: add an identity input node of width ``m`` wired to
        the network's current input-most node."""
        self.compile()
        target = self._in_node
        self.add_func_node("input_layer", m, activation_function="identity")
        return self.add_edge("input_layer", target, weights=weights, train=train, **kwargs)

    def add_output_layer(self, k: int, weights=None, train: Optional[str] = None,
                         activation_function: str = "identity", **kwargs) -> Linear:
        """Legacy helper: add an activation output node of width ``k`` wired
        from the network's current output-most node."""
        self.compile()
        source = self._out_node
        self.add_func_node("output_layer", k, activation_function=activation_function)
        return self.add_edge(source, "output_layer", weights=weights, train=train, **kwargs)

    def add_node(self, label: str, node, node_type: str, op: str = None, **node_attrs) -> None:
        """Insert a pre-built node instance into the graph."""
        if op:
            for p in getattr(node, "parameter_names", []):
                add_op_name(op, p, self._var_map)
            for v in getattr(node, "variable_names", []):
                add_op_name(op, v, self._var_map)
        self.graph.add_node(label, node=node, node_type=node_type, n_out=node.n_out,
                            n_in=node.n_in, **node_attrs)
        self._invalidate()

    def add_diffeq_node(self, label: str, node, input_var: str, output_var: str,
                        weights: np.ndarray = None, source_var: str = None,
                        target_var: str = None, spike_var: Union[str, list] = None,
                        reset_var: Union[str, list] = None, reset: bool = True,
                        op: str = None, train_params: list = None, **kwargs) -> RateNet:
        """Add a differential-equation population node built from a YAML template.

        Mirrors the reference signature (/root/reference/rectipy/network.py:213),
        including the `op` shorthand that prefixes bare variable names, the
        node-class dispatch on `spike_var`/`reset`, and `train_params`.
        Accepts `spike_def` as an alias for `reset_var` (used by newer
        reference examples, e.g. documentation/qif_example.py).
        """
        if reset_var is None and "spike_def" in kwargs:
            reset_var = kwargs.pop("spike_def")

        from .dsl.parser import CircuitTemplate

        if isinstance(node, CircuitTemplate) and node.heterogeneous:
            # circuits mixing different model equations cannot share one
            # vector field: auto-expand into one Network node per template
            # group, wired with inter-group Linear edges (beyond-reference;
            # PyRates circuits in the reference only replicate one template)
            return self._add_circuit_nodes(
                label, node, input_var=input_var, output_var=output_var,
                spike_var=spike_var, reset_var=reset_var, reset=reset, op=op,
                train_params=train_params, weights=weights,
                source_var=source_var, target_var=target_var, **kwargs)

        var_dict = {"svar": source_var, "tvar": target_var, "in_ext": input_var,
                    "out": output_var, "spike": spike_var, "reset": reset_var}
        if "record_vars" in kwargs:
            var_dict["record_vars"] = kwargs.pop("record_vars")

        if op is not None:
            for key, var in var_dict.copy().items():
                if key == "record_vars":
                    kwargs["var_mapping"] = {}
                    for v in var:
                        v_new = add_op_name(op, v, self._var_map)
                        kwargs["var_mapping"][v_new] = v_new
                elif isinstance(var, list):
                    var_dict[key] = [add_op_name(op, v, self._var_map) for v in var]
                else:
                    var_dict[key] = add_op_name(op, var, self._var_map)
            if train_params:
                train_params = [add_op_name(op, p, self._var_map) for p in train_params]
            if "node_vars" in kwargs:
                for key in list(kwargs["node_vars"]):
                    if "/" not in key:
                        kwargs["node_vars"][f"all/{op}/{key}"] = kwargs["node_vars"].pop(key)

        args = (node, var_dict["in_ext"], var_dict["out"])
        build_kwargs = {"weights": weights, "source_var": var_dict["svar"],
                        "target_var": var_dict["tvar"], "train_params": train_params,
                        "dt": self.dt}
        if spike_var is None:
            NodeClass = RateNet
        elif reset_var is None:
            raise ValueError(
                "To define a reservoir with a spiking neural network layer, please provide "
                "the name of the variable that should be reset after a spike occurred "
                "(`reset_var`)."
            )
        else:
            build_kwargs["spike_var"] = var_dict["spike"]
            build_kwargs["reset_var"] = var_dict["reset"]
            NodeClass = SpikeResetNet if reset else SpikeNet
        kwargs.update(build_kwargs)
        node_instance = NodeClass.from_pyrates(*args, **kwargs)
        self.add_node(label, node=node_instance, node_type="diff_eq", op=op)
        return node_instance

    def _add_circuit_nodes(self, label: str, circuit, input_var: str, output_var: str,
                           spike_var=None, reset_var=None, reset: bool = True,
                           op: str = None, train_params: list = None,
                           weights=None, source_var: str = None, target_var: str = None,
                           **kwargs) -> RateNet:
        """Expand a heterogeneous-equation CircuitTemplate into one Network
        node per structurally-homogeneous group, wired with inter-group
        Linear edges built from the circuit's weight-matrix blocks.

        Semantics: for each circuit edge ``(source_var, target_var, W)`` the
        block ``W[targets_of_group_i, sources_of_group_j]`` becomes either
        the group's own recurrent coupling (i == j) or a Network edge
        ``label.group_j -> label.group_i`` delivering into group i's
        ``target_var`` (the group node is built with that variable as its
        input channel).  External input drives the root group's
        ``input_var``; the circuit output is the sink group's
        ``output_var``.  Returns the output group's node instance.
        Beyond-reference (see CircuitTemplate docstring).
        """
        from .dsl.parser import TemplateError, _strip_node_prefix

        if op is not None:
            raise TemplateError(
                "The `op` shorthand is not supported for heterogeneous "
                "circuits (each group has its own operators); qualify "
                "variables as 'op/var'.")
        if weights is not None or source_var is not None or target_var is not None:
            raise TemplateError(
                "weights/source_var/target_var are not supported together "
                "with a heterogeneous CircuitTemplate; declare every "
                "coupling on the circuit via add_edges_from_matrix.")
        if "record_vars" in kwargs:
            raise TemplateError(
                "record_vars on add_diffeq_node is not supported for "
                "heterogeneous circuits; record at run() time with "
                "record_vars=[('<label>.<group>', '<var>', reduce)] on the "
                "expanded node labels.")
        node_vars = kwargs.pop("node_vars", kwargs.pop("node_values", None)) or {}
        groups = list(circuit.groups)
        gid = {id(g): k for k, g in enumerate(groups)}
        n_total = circuit.n

        # classify circuit edges into intra-group couplings and inter-group
        # Network edges; validate that the full matrices only populate the
        # (owner-target x owner-source) block.  Edge vars may carry a member
        # node-name prefix ('p3/li_op/r_in') when an op/var name exists on
        # several groups.
        intra = {k: [] for k in range(len(groups))}
        inter = []  # (src_gidx, tgt_gidx, tv, block)
        for sv_raw, tv_raw, W in circuit.edges:
            gs, sv = circuit.resolve_group(sv_raw)
            gt, tv = circuit.resolve_group(tv_raw)
            W = np.asarray(W)
            if W.shape != (n_total, n_total):
                raise TemplateError(
                    f"Circuit edge {sv!r}->{tv!r} weight matrix has shape "
                    f"{W.shape}; expected ({n_total}, {n_total}) over the "
                    f"full circuit index space.")
            block = W[np.ix_(gt.indices, gs.indices)]
            outside = W.copy()
            outside[np.ix_(gt.indices, gs.indices)] = 0.0
            if np.any(outside != 0.0):
                raise TemplateError(
                    f"Circuit edge {sv!r}->{tv!r}: weight entries outside the "
                    f"[{gt.name} targets x {gs.name} sources] block are "
                    f"nonzero but {sv!r}/{tv!r} only exist on those groups.")
            if gs is gt:
                intra[gid[id(gs)]].append((sv, tv, block))
            else:
                inter.append((gid[id(gs)], gid[id(gt)], sv, tv, block))

        # per-group input/output channels
        gi, input_var = circuit.resolve_group(input_var)
        go, output_var = circuit.resolve_group(output_var)
        g_in, g_out = gid[id(gi)], gid[id(go)]
        in_chan = {g_in: input_var}
        for si, ti, _sv, tv, _ in inter:
            if in_chan.setdefault(ti, tv) != tv:
                raise TemplateError(
                    f"Group {groups[ti].name!r} receives input at both "
                    f"{in_chan[ti]!r} and {tv!r}; a Network node has one "
                    "input channel -- give the group a single target "
                    "variable (or build the nodes by hand).")
        out_chan = {g_out: output_var}
        for si, ti, sv, _tv, _ in inter:
            if out_chan.setdefault(si, sv) != sv:
                raise TemplateError(
                    f"Group {groups[si].name!r} feeds edges from both "
                    f"{out_chan[si]!r} and {sv!r}; a Network node has one "
                    "output channel.")
        for k, g in enumerate(groups):
            if k not in in_chan:
                raise TemplateError(
                    f"Group {g.name!r} receives neither the external input "
                    f"({input_var!r}) nor any inter-group edge; the expanded "
                    "Network would have two input nodes. Drive it or couple "
                    "into it.")
            if k not in out_chan:
                raise TemplateError(
                    f"Group {g.name!r} neither provides the circuit output "
                    f"({output_var!r}) nor feeds any inter-group edge; the "
                    "expanded Network would have two output nodes.")
        if g_in in {ti for _, ti, _, _, _ in inter}:
            raise TemplateError(
                f"The externally-driven group {groups[g_in].name!r} also "
                "receives inter-group coupling; that needs two input "
                "channels on one node. Re-root the circuit or build the "
                "nodes by hand (FeedbackNetwork covers cyclic topologies).")
        # inter-group topology must be a DAG (cycles need FeedbackNetwork's
        # one-step-delayed edges)
        import networkx as nx

        gg = nx.DiGraph()
        gg.add_nodes_from(range(len(groups)))
        gg.add_edges_from((si, ti) for si, ti, _, _, _ in inter)
        if not nx.is_directed_acyclic_graph(gg):
            raise TemplateError(
                "The circuit's inter-group coupling is cyclic; express the "
                "cycle with FeedbackNetwork.add_edge(..., feedback=True) "
                "between hand-built nodes (one-step-delayed recurrence).")

        def _slice_overrides(g, src: dict) -> dict:
            out = {}
            for key, val in src.items():
                qkey = _strip_node_prefix(key)
                if not g.owns(qkey):
                    continue
                arr = np.asarray(val)
                if arr.ndim >= 1 and arr.shape[0] == n_total and g.n != n_total:
                    out[f"all/{qkey}"] = arr[g.indices]
                else:
                    out[f"all/{qkey}"] = val
            return out

        labels = {}
        built = {}
        for k, g in enumerate(groups):
            glabel = f"{label}.{g.name}"
            labels[k] = glabel
            gvars = _slice_overrides(g, g.node_vars)
            gvars.update(_slice_overrides(g, circuit.node_vars))  # update_var()
            gvars.update(_slice_overrides(g, node_vars))
            couplings = intra[k]
            gw = gsv = gtv = None
            extra = None
            if couplings:
                gsv, gtv, gw = couplings[0]
                extra = [(sv2, tv2, w2) for sv2, tv2, w2 in couplings[1:]] or None
            gkwargs = dict(kwargs)
            if extra:
                gkwargs["edges"] = list(gkwargs.get("edges") or []) + extra
            gkwargs["N"] = g.n
            gtrain = None
            if train_params:
                gtrain = [p for p in train_params
                          if p == "weights" and couplings
                          or (p != "weights" and g.owns(_strip_node_prefix(p)))]
                gtrain = gtrain or None
            spike_kw = {}
            g_spike = spike_var if (spike_var and g.owns(_strip_node_prefix(spike_var))) else None
            if g_spike:
                spike_kw = {"spike_var": g_spike, "reset_var": reset_var,
                            "reset": reset}
            built[k] = self.add_diffeq_node(
                glabel, g.template, input_var=in_chan[k], output_var=out_chan[k],
                weights=gw, source_var=gsv, target_var=gtv,
                train_params=gtrain, node_vars=gvars or None, **spike_kw,
                **gkwargs)
        for si, ti, _sv, _tv, block in inter:
            self.add_edge(labels[si], labels[ti], weights=jnp.asarray(
                block, dtype=self.dtype))
        self._invalidate()
        return built[g_out]

    def add_func_node(self, label: str, n: int, activation_function: str, **kwargs) -> InstantNode:
        """Add a stateless activation node: tanh/sigmoid/softmax/softmin/
        log_softmax/identity."""
        kwargs.pop("node_type", None)
        node = InstantNode(n, activation_function, **kwargs)
        self.add_node(label, node=node, node_type="func_instant")
        return node

    def add_edge(self, source: str, target: str, weights=None, train: Optional[str] = None,
                 edge_attrs: dict = None, **kwargs) -> Linear:
        """Add a linear edge.  Class dispatch on kwargs mirrors the reference
        (/root/reference/rectipy/network.py:372-380): `mask` -> LinearMasked,
        `delays` (+`filter_weights`) -> LinearMemory(Filter), 2-D `delays`
        matrix -> LinearMemoryMatrix (per-connection conduction delays, the
        whole-brain workload; beyond-reference), `filter_weights`
        -> LinearFilter, `tau_facil`/`tau_depress` (+ optional `U`) ->
        LinearSTP (Tsodyks-Markram short-term plasticity, beyond-reference),
        else Linear.  ``train`` in {None, 'gd', 'rls', 'eprop', 'stdp'}
        ('eprop' and 'stdp' are beyond-reference online rules; see
        fit_eprop / fit_stdp)."""
        edge_attrs = dict(edge_attrs or {})
        kwargs.pop("dtype", None)
        stp_req = {"tau_facil", "tau_depress"} & set(kwargs)
        if stp_req and ({"mask", "delays", "filter_weights"} & set(kwargs)):
            raise ValueError(
                "Short-term plasticity (tau_facil/tau_depress) cannot be combined "
                "with mask/delays/filter_weights on a single edge; chain two edges "
                "through an identity func-node instead.")
        if hasattr(weights, "blocks"):
            # BlockSparseCoupling weights -> block-sparse edge, optionally
            # with per-BLOCK conduction delays (population-scale companion
            # of the delay matrix; beyond-reference)
            if {"mask", "filter_weights"} & set(kwargs):
                raise ValueError(
                    "Block-sparse edges support only optional per-block "
                    "delays; chain a separate edge for masks/filters.")
            LinEdge = BlockSparseLinear
        elif "mask" in kwargs:
            LinEdge = LinearMasked
        elif "delays" in kwargs and np.ndim(kwargs["delays"]) == 2:
            # per-connection delay MATRIX (whole-brain/connectome workload;
            # beyond-reference -- the reference delay edge is per-source)
            if "filter_weights" in kwargs:
                raise ValueError(
                    "A 2-D delay matrix cannot be combined with filter_weights; "
                    "chain a LinearFilter edge through an identity func-node instead.")
            LinEdge = LinearMemoryMatrix
        elif "delays" in kwargs:
            LinEdge = LinearMemoryFilter if "filter_weights" in kwargs else LinearMemory
        elif "filter_weights" in kwargs:
            LinEdge = LinearFilter
        elif stp_req:
            LinEdge = LinearSTP
            kwargs["dt"] = self.dt
        else:
            LinEdge = Linear

        kwargs.update({"n_in": self[source]["n_out"], "n_out": self[target]["n_in"],
                       "weights": weights, "dtype": self.dtype})
        trainable = True
        if train is None:
            trainable = False
            edge = LinEdge(**kwargs, detach=True)
        elif train == "gd":
            edge = LinEdge(**kwargs, detach=False)
        elif train == "eprop":
            kwargs.pop("detach", None)
            # not gradient-trainable: the eprop delta-rule updates the weights
            # outside autograd, like the RLS edge
            trainable = False
            edge = LinEdge(**{k: v for k, v in kwargs.items()
                              if k in ("n_in", "n_out", "weights", "dtype")}, detach=True)
            self._train_edge = (source, target)
        elif train == "stdp":
            kwargs.pop("detach", None)
            # local plasticity outside autograd (like the RLS edge); the
            # pre/post spike trains drive the updates in fit_stdp's scan
            trainable = False
            stdp_keys = ("n_in", "n_out", "weights", "dtype", "tau_plus",
                         "tau_minus", "a_plus", "a_minus", "w_min", "w_max",
                         "soft_bounds", "w_dtype", "rng")
            structural = sorted({"delays", "mask", "filter_weights",
                                 "tau_facil", "tau_depress"} & set(kwargs))
            if structural:
                # never SILENTLY drop a structural request (dense edges
                # previously ignored e.g. delays= here): a plastic edge is
                # a plain projection -- the pair rule would need
                # per-synapse delayed/masked/filtered pre-spike trains
                raise ValueError(
                    f"{'/'.join(structural)} are not supported on a plastic "
                    "(train='stdp') edge; chain a separate delayed/masked/"
                    "filtered edge for the transmission structure and keep "
                    "the STDP edge a plain projection.")
            if hasattr(weights, "blocks"):
                # population-scale plasticity: the pair rule on fan-in
                # blocks (dense W is impossible at N >> 10k)
                edge = BlockSparseSTDP(**{k: v for k, v in kwargs.items()
                                          if k in stdp_keys + ("block_dtype",)})
            else:
                edge = STDP(**{k: v for k, v in kwargs.items()
                               if k in stdp_keys})
            self._train_edge = (source, target)
        elif train == "rls":
            kwargs.pop("detach", None)
            # the RLS inverse-correlation recursion is numerically fragile in
            # float32 over long horizons; default it to float64 (the
            # reference's own RLS default, edges.py:182) when x64 is enabled
            if jax.config.jax_enable_x64:
                kwargs["dtype"] = kwargs.get("rls_dtype", jnp.float64)
            edge = RLS(**{k: v for k, v in kwargs.items()
                          if k in ("n_in", "n_out", "weights", "dtype", "beta", "alpha")})
            self._train_edge = (source, target)
        else:
            raise ValueError(
                "Invalid option for keyword argument `train`. Please see the docstring of "
                "`Network.add_edge` for valid options."
            )
        self.graph.add_edge(source, target, edge=edge, trainable=trainable,
                            n_in=edge.n_in, n_out=edge.n_out, **edge_attrs)
        self._invalidate()
        return edge

    def pop_node(self, node: str):
        node_data = self.get_node(node)
        self.graph.remove_node(node)
        self._invalidate()
        return node_data

    def pop_edge(self, source: str, target: str):
        edge = self.get_edge(source, target)
        self.graph.remove_edge(source, target)
        self._invalidate()
        return edge

    def clear(self):
        for node in list(self.nodes):
            self.pop_node(node)

    # ------------------------------------------------------------- compiling
    def _invalidate(self):
        self._compiled = None
        self._in_node = None
        self._out_node = None
        self._step_cache.clear()

    def compile(self):
        """Identify the unique input and output nodes and freeze the
        evaluation order.  The fused step function itself is built lazily (and
        cached) per tap-set.  Idempotent: re-compiling an unchanged graph keeps
        the cached jitted programs (graph mutations invalidate them)."""
        if self._compiled is not None and self._in_node is not None:
            return self
        in_nodes = [n for n in self.graph.nodes if self.graph.in_degree(n) == 0]
        if len(in_nodes) != 1:
            raise ValueError(
                f"Unable to identify the input node of the Network. Nodes that have no "
                f"input edges: {in_nodes}. Make sure that exactly one such node without "
                f"input edges exists in the network."
            )
        self._in_node = in_nodes.pop()

        out_nodes = [n for n in self.graph.nodes if self.graph.out_degree(n) == 0]
        if len(out_nodes) != 1:
            raise ValueError(
                f"Unable to identify the output node of the Network. Nodes that have no "
                f"outgoing edges: {out_nodes}. Make sure that exactly one such node without "
                f"outgoing edges exists in the network."
            )
        self._out_node = out_nodes.pop()

        # evaluation set: ancestors of the output node (pull-based semantics,
        # reference network.py:954-960), in topological order
        import networkx as nx

        ancestors = nx.ancestors(self.graph, self._out_node) | {self._out_node}
        sub = self.graph.subgraph(ancestors)
        order = list(nx.topological_sort(sub))
        if self._in_node not in ancestors:
            raise ValueError("The input node is not connected to the output node.")
        self._compiled = {"order": order}
        self._step_cache.clear()
        return self

    def _fb_edge_list(self) -> list:
        return []  # overridden by FeedbackNetwork

    def _prep_params(self, params: dict) -> dict:
        """Once-per-scan parameter prep for the INFERENCE scans: each node
        (int8_master requantization, nodes.py ``prep_params``) and each edge
        (delay-matrix one-hot selectors, edges.py
        ``LinearMemoryMatrix.prep_params`` -- built on device so they are
        never program constants) may transform its own params outside the
        ``lax.scan`` -- evaluated inside the jitted run program, so it costs
        one pass per call, not per step.
        Training paths never use this (the deferred trajectories prep
        internally; the plain-autodiff fallback needs the per-step custom VJP
        for exact master gradients)."""
        nodes = {}
        any_prepped = False
        for n, sub in params["nodes"].items():
            prep = getattr(self.get_node(n), "prep_params", None)
            new = prep(sub) if prep is not None else sub
            any_prepped = any_prepped or new is not sub
            nodes[n] = new
        edges, e_prepped = self._prep_edge_params_dict(params)
        if not (any_prepped or e_prepped):
            return params
        return {**params, "nodes": nodes, "edges": edges}

    def _prep_edge_params_dict(self, params: dict) -> Tuple[dict, bool]:
        edges = {}
        any_prepped = False
        for k, sub in params.get("edges", {}).items():
            u, _, v = k.partition("->")
            prep = getattr(self.get_edge(u, v), "prep_params", None)
            new = prep(sub) if prep is not None else sub
            any_prepped = any_prepped or new is not sub
            edges[k] = new
        return edges, any_prepped

    def _prep_edge_params(self, params: dict) -> dict:
        """EDGE-only prep, safe inside differentiated trajectories: edge
        ``prep_params`` derives selectors from STATIC structure (e.g. the
        delay-matrix one-hots from the integer delays), never from trainable
        entries, so gradients are unaffected -- unlike node prep, which the
        plain-autodiff path must skip (int8 masters need the per-step
        custom-VJP matvec for exact master gradients)."""
        edges, prepped = self._prep_edge_params_dict(params)
        return {**params, "edges": edges} if prepped else params

    def _step_versions(self) -> tuple:
        """Per-node step versions: attaching a fused kernel bumps a node's
        version, invalidating every cached program composed from it."""
        order = self._compiled["order"] if self._compiled else sorted(self.graph.nodes)
        return tuple(getattr(self.get_node(n), "_step_version", 0) for n in order)

    def make_step(self, taps: Tuple[str, ...] = ()) -> Callable:
        """Build (and cache) the fused pure step function.

        ``step(state, params, x) -> (state', out, taps_dict)`` where ``state``
        and ``params`` are the pytrees produced by :meth:`init_state` /
        :meth:`parameters_pytree`.
        """
        if self._compiled is None:
            self.compile()
        order = self._compiled["order"]
        # key includes each node's step version so attaching a fused kernel
        # after a run invalidates the composed program
        key = (tuple(taps), self._step_versions())
        if key in self._step_cache:
            return self._step_cache[key]

        node_steps = {n: self.get_node(n).make_step() for n in order}
        preds = {n: sorted(self.graph.predecessors(n)) for n in order}
        edge_steps = {}
        for n in order:
            for u in preds[n]:
                edge_steps[(u, n)] = self.get_edge(u, n).make_step()
        fb_edges = self._fb_edge_list()  # [(u, v, edge_obj)]
        fb_steps = {(u, v): e.make_step() for u, v, e in fb_edges}
        fb_by_target: Dict[str, list] = {}
        for u, v, e in fb_edges:
            fb_by_target.setdefault(v, []).append(u)
        fb_sources = sorted({u for u, _, _ in fb_edges})
        out_node = self._out_node

        # post-update output readers for feedback sources (reference semantics:
        # feedback reads the source node's current out-slice, i.e. the
        # post-update value of the previous step; network.py:1354-1357)
        fb_readers = {}
        for u in fb_sources:
            node = self.get_node(u)
            if hasattr(node, "_make_out_reader"):
                fb_readers[u] = node._make_out_reader()
            else:
                fb_readers[u] = None  # instant node: use this step's output

        def step(state, params, x):
            nodes_st = dict(state["nodes"])
            edges_st = dict(state["edges"])
            fb_prev = state.get("fb", {})
            outs = {}
            for n in order:
                if preds[n]:
                    vals = []
                    for u in preds[n]:
                        k = _ekey(u, n)
                        es, val = edge_steps[(u, n)](edges_st[k], params["edges"][k], outs[u])
                        edges_st[k] = es
                        vals.append(val)
                    inp = vals[0]
                    for v in vals[1:]:
                        inp = inp + v  # functional fan-in sum (gradient-safe)
                else:
                    inp = x
                for u in fb_by_target.get(n, []):
                    k = _ekey(u, n)
                    es, val = fb_steps[(u, n)](edges_st[k], params["edges"][k], fb_prev[u])
                    edges_st[k] = es
                    inp = inp + val
                ns, out = node_steps[n](nodes_st[n], params["nodes"][n], inp)
                nodes_st[n] = ns
                outs[n] = out
            new_fb = {}
            for u in fb_sources:
                reader = fb_readers[u]
                if reader is None:
                    new_fb[u] = outs[u]
                else:
                    new_fb[u] = reader(nodes_st[u], params["nodes"][u])
            new_state = {"nodes": nodes_st, "edges": edges_st}
            if fb_sources or "fb" in state:
                new_state["fb"] = new_fb
            return new_state, outs[out_node], {t: outs[t] for t in taps}

        self._step_cache[key] = step
        return step

    def init_state(self) -> dict:
        """Current network state as a pytree (node states, edge states,
        previous-step feedback outputs)."""
        if self._compiled is None:
            self.compile()
        order = self._compiled["order"]
        state = {
            "nodes": {n: self.get_node(n).init_state() for n in order},
            "edges": {},
        }
        for n in order:
            for u in self.graph.predecessors(n):
                state["edges"][_ekey(u, n)] = self.get_edge(u, n).init_state()
        fb_edges = self._fb_edge_list()
        if fb_edges:
            fb = {}
            for u, v, e in fb_edges:
                state["edges"][_ekey(u, v)] = e.init_state()
                src_node = self.get_node(u)
                if u in self._fb_store:
                    fb[u] = self._fb_store[u]
                elif hasattr(src_node, "_make_out_reader"):
                    # reference semantics: feedback reads the source node's
                    # CURRENT out-slice (network.py:1354-1357 via
                    # nodes.py:92-99), so the first step of a run sees the
                    # output value of the initial state, not zeros
                    fb[u] = src_node._make_out_reader()(src_node.y, src_node._args)
                else:
                    fb_dtype = getattr(src_node, "dtype", self.dtype)
                    fb[u] = jnp.zeros(self[u]["n_out"], dtype=fb_dtype)
            state["fb"] = fb
        return state

    def parameters_pytree(self) -> dict:
        """All node/edge parameters as one pytree."""
        if self._compiled is None:
            self.compile()
        order = self._compiled["order"]
        params = {"nodes": {n: dict(self.get_node(n).args) for n in order}, "edges": {}}
        for n in order:
            for u in self.graph.predecessors(n):
                params["edges"][_ekey(u, n)] = dict(self.get_edge(u, n).params)
        for u, v, e in self._fb_edge_list():
            params["edges"][_ekey(u, v)] = dict(e.params)
        return params

    def describe(self) -> str:
        """Human-readable architecture summary: nodes (class, size,
        integrator, trainables), edges (class, weight shape/dtype, extra
        state), and parameter/state totals with the device-memory footprint.
        Beyond-reference ergonomics (the reference offers only
        ``Network.graph`` introspection); returns a string -- ``print(
        net.describe())``."""
        self.compile()
        order = self._compiled["order"]
        lines = [f"Network(dt={self.dt}, dtype={jnp.dtype(self.dtype).name}): "
                 f"{len(order)} node(s), input={self._in_node!r} (n_in={self.n_in}), "
                 f"output={self._out_node!r} (n_out={self.n_out})"]
        n_param = n_bytes = 0

        def _leaf_size(leaf):
            shape = np.shape(leaf)
            return int(np.prod(shape)) if shape else 1

        def _leaf_bytes(leaf):
            # metadata only -- np.asarray on a device leaf would round-trip
            # it over the tunnel (a 1M-neuron net holds GBs of blocks)
            return _leaf_size(leaf) * np.dtype(
                getattr(leaf, "dtype", np.float64)).itemsize

        def _leaf_stats(tree):
            leaves = jax.tree_util.tree_leaves(tree)
            return (sum(map(_leaf_size, leaves)),
                    sum(map(_leaf_bytes, leaves)))

        lines.append("nodes:")
        for label in order:
            node = self.get_node(label)
            args = getattr(node, "args", {}) or {}
            cnt, byt = _leaf_stats(args)
            n_param += cnt
            n_bytes += byt
            y = getattr(node, "y", None)
            size = (f"state={np.shape(y)[0]}" if y is not None
                    else f"n={getattr(node, 'n_in', '?')}")
            extra = ""
            integ = getattr(node, "integrator", None)
            if integ and integ != "euler":
                extra += f", integrator={integ}"
            train = getattr(node, "train_keys", [])
            if train:
                extra += f", train={list(train)}"
            lines.append(f"  {label}: {type(node).__name__} ({size}, "
                         f"{cnt:,} params{extra})")
            if y is not None:
                n_bytes += _leaf_bytes(y)
        edges = [(u, v, self.get_edge(u, v), "")
                 for v in order for u in self.graph.predecessors(v)]
        edges += [(u, v, e, " [feedback]") for u, v, e in self._fb_edge_list()]
        if edges:
            lines.append("edges:")
        for u, v, e, tag in edges:
            p = getattr(e, "params", {}) or {}
            cnt, byt = _leaf_stats(p)
            n_param += cnt
            n_bytes += byt
            w = p.get("weights")
            shape = ("x".join(map(str, np.shape(w))) if w is not None
                     and np.ndim(w) else "scalar")
            wdt = (np.dtype(getattr(w, "dtype", type(w))).name
                   if w is not None else "-")
            extras = [k for k in p if k != "weights"]
            train = getattr(e, "train_keys", [])
            lines.append(
                f"  {u} -> {v}{tag}: {type(e).__name__} ({shape} {wdt}"
                + (f", carry: {extras}" if extras else "")
                + (f", train={list(train)}" if train else "") + ")")
        params = self.parameters_pytree()
        t_cnt = 0
        for kind, label, key in self.trainable_paths():
            t_cnt += _leaf_size(params[kind][label][key])
        lines.append(f"totals: {n_param:,} parameters ({t_cnt:,} trainable), "
                     f"~{n_bytes/1e6:,.1f} MB params+state on device")
        return "\n".join(lines)

    def trainable_paths(self) -> List[tuple]:
        """Paths (kind, label, key) of trainable leaves in the params pytree."""
        if self._compiled is None:
            self.compile()
        paths = []
        for n in self._compiled["order"]:
            node = self.get_node(n)
            for k in getattr(node, "train_keys", []):
                paths.append(("nodes", n, k))
        seen = set()
        for n in self._compiled["order"]:
            for u in self.graph.predecessors(n):
                seen.add((u, n))
                for k in self.get_edge(u, n).train_keys:
                    paths.append(("edges", _ekey(u, n), k))
        for u, v, e in self._fb_edge_list():
            if (u, v) not in seen:
                for k in e.train_keys:
                    paths.append(("edges", _ekey(u, v), k))
        return paths

    @staticmethod
    def _partition(params: dict, paths: List[tuple]) -> Tuple[dict, dict]:
        """Split the params pytree into (trainable, frozen) sub-pytrees."""
        train = {"nodes": {}, "edges": {}}
        frozen = {"nodes": {k: dict(v) for k, v in params["nodes"].items()},
                  "edges": {k: dict(v) for k, v in params["edges"].items()}}
        for kind, label, key in paths:
            train[kind].setdefault(label, {})[key] = frozen[kind][label].pop(key)
        return train, frozen

    @staticmethod
    def _combine(train: dict, frozen: dict) -> dict:
        params = {"nodes": {k: dict(v) for k, v in frozen["nodes"].items()},
                  "edges": {k: dict(v) for k, v in frozen["edges"].items()}}
        for kind in ("nodes", "edges"):
            for label, sub in train[kind].items():
                params[kind].setdefault(label, {}).update(sub)
        return params

    def _node_n(self, label: str) -> int:
        node = self.get_node(label)
        vf = getattr(node, "_vf", None)
        return getattr(vf, "n", None) or self[label]["n_out"]

    def _mesh_place(self, tree: dict, mesh, model_axis: str = "model") -> dict:
        """Population-shard a state/params pytree over a ``jax.sharding.Mesh``
        (per-node population sizes; edge leaves shard with their target's
        width, feedback buffers with their source's).  Used by ``run`` /
        ``fit_bptt`` when ``mesh=`` is passed -- the one-call multichip API."""
        from .parallel import shard_network_arrays

        placed = dict(tree)
        placed["nodes"] = {
            label: shard_network_arrays(sub, self._node_n(label), mesh, model_axis)
            for label, sub in tree.get("nodes", {}).items()}
        if "edges" in tree:
            placed["edges"] = {}
            for k, sub in tree["edges"].items():
                u, v = k.split("->")
                placed["edges"][k] = shard_network_arrays(
                    sub, self[v]["n_in"], mesh, model_axis)
        if "fb" in tree:
            placed["fb"] = {
                u: shard_network_arrays(val, self[u]["n_out"], mesh, model_axis)
                for u, val in tree["fb"].items()}
        return placed

    @staticmethod
    def _mesh_replicate(x, mesh):
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(x, NamedSharding(mesh, PartitionSpec()))

    def _write_back(self, state: dict = None, params: dict = None):
        """Push scan results back into the mutable node/edge wrappers."""
        order = self._compiled["order"]
        if state is not None:
            if "fb" in state:
                self._fb_store = dict(state["fb"])
            for n in order:
                node = self.get_node(n)
                ns = state["nodes"].get(n)
                if ns is not None and hasattr(node, "set_state"):
                    node.set_state(ns)
            for k, es in state["edges"].items():
                if es is None:
                    continue
                u, v = k.split("->")
                edge = self.get_edge(u, v)
                if hasattr(edge, "set_state"):
                    edge.set_state(es)
        if params is not None:
            for n, sub in params["nodes"].items():
                node = self.get_node(n)
                for key, val in sub.items():
                    node._args[key] = val
            for k, sub in params["edges"].items():
                u, v = k.split("->")
                edge = self.get_edge(u, v)
                for key, val in sub.items():
                    edge.params[key] = val

    # ------------------------------------------------------------ simulation
    def forward(self, x):
        """Single eager step through the compiled network (updates the stored
        state).  For long trajectories prefer :meth:`run` -- one fused scan."""
        if self._compiled is None:
            self.compile()
        key = ("__forward__", self._step_versions())
        if key not in self._step_cache:
            step = self.make_step()
            self._step_cache[key] = jax.jit(step)
        state, out, _ = self._step_cache[key](self.init_state(), self.parameters_pytree(),
                                              jnp.asarray(x, dtype=self.dtype))
        self._write_back(state=state)
        return out

    def _resolve_record_vars(self, obs: Observer) -> list:
        """[(record key, node label, reader fn, reduce flag)] for scan recording."""
        resolved = []
        for (node_label, var), reduce in zip(obs.recorded_state_variables, obs.reduce_flags):
            node = self.get_node(node_label)
            var_r = self._relabel_var(var)
            spec = node._var_map.get(var_r)
            if spec is None:
                raise KeyError(f"Variable {var} was not found on node {node_label}.")
            if isinstance(spec, tuple):
                lo, hi = spec

                def reader(y, a, lo=lo, hi=hi):
                    return y[lo:hi]
            elif isinstance(spec, str):
                vf = node._vf

                def reader(y, a, vf=vf, q=spec):
                    return vf.read_var(q, y, a)
            else:
                def reader(y, a, i=spec):
                    return y[i]
            resolved.append(((node_label, var), node_label, reader, reduce))
        return resolved

    def run(self, inputs, sampling_steps: int = 1, cutoff: int = 0, verbose: bool = True,
            enable_grad: bool = True, **kwargs) -> Observer:
        """Integrate the input-driven network equations with one fused scan.

        Recording semantics match the reference exactly
        (/root/reference/rectipy/network.py:588-599): outputs are buffered
        from ``step >= cutoff`` and their mean is recorded whenever
        ``step % sampling_steps == 0``; ``record_vars`` snapshots node state
        at the record step (post-update).

        ``mesh=``: a ``jax.sharding.Mesh`` population-shards the run over the
        mesh's ``'model'`` axis (row-sharded couplings, sharded state and
        per-neuron parameters; XLA inserts the gather/psum collectives).
        Recording semantics are IDENTICAL to the single-device path -- same
        windowed scan, same Observer records.
        """
        del enable_grad  # gradients are taken functionally by the trainers
        mesh = kwargs.pop("mesh", None)
        spike_info = self._resolve_record_spikes(kwargs.pop("record_spikes", None))
        input_fn = None
        if isinstance(inputs, InputSpec):
            # on-device input generation (rectipy_tpu.inputs): the drive is
            # computed INSIDE the scan -- no (T, m) array is materialized or
            # transferred.  The spec's parameters ride as program arguments.
            spec = inputs
            if spec.batch is not None:
                raise ValueError(
                    "run() takes an unbatched input spec; a spec with per-trial "
                    "parameters (e.g. Noise with (B,) seeds) goes to run_batch().")
            in_fn, inputs, _, in_sig = spec.build(self.dt, self.dtype)
            steps = int(spec.steps)
            n_chan = int(spec.channels)
            input_fn = (in_fn, in_sig, steps)
        else:
            inputs = jnp.asarray(np.asarray(inputs), dtype=self.dtype)
            if inputs.ndim != 2:
                raise ValueError(f"`inputs` must be a (T, m) array; got shape {inputs.shape}")
            steps = int(inputs.shape[0])
            n_chan = int(inputs.shape[1])
        truncate_steps = int(kwargs.pop("truncate_steps", steps))

        self.compile()
        # single-channel inputs broadcast across the input node (the
        # documented common-drive idiom, e.g. a (T, 1) scalar drive onto an
        # N-neuron population; also keeps host->device traffic at (T, 1))
        if self.n_in and n_chan not in (1, self.n_in):
            raise ValueError(
                f"`inputs` has {n_chan} channels but the network input node "
                f"{self._in_node!r} expects {self.n_in} (or 1, broadcast)."
            )

        if "obs" in kwargs:
            obs = kwargs.pop("obs")
        else:
            obs = Observer(dt=self.dt, record_loss=kwargs.pop("record_loss", False), **kwargs)

        state0 = self.init_state()
        params = self.parameters_pytree()
        if mesh is not None:
            state0 = self._mesh_place(state0, mesh)
            params = self._mesh_place(params, mesh)
            if input_fn is None:
                inputs = self._mesh_replicate(inputs, mesh)
            else:  # spec parameters are tiny scalars/keys: replicate each leaf
                inputs = jax.tree.map(lambda x: self._mesh_replicate(x, mesh), inputs)
        stateT, rec_steps, rec_out, rec_vars = self._run_scan(
            state0, params, inputs, sampling_steps, cutoff, truncate_steps, obs,
            input_fn=input_fn, spike_info=spike_info)
        self._write_back(state=stateT)

        var_values = {key: vals for key, vals in rec_vars.items()}
        obs.record_batch(rec_steps, outputs=rec_out,
                         losses=np.zeros(len(rec_steps)) if obs.record_loss else None,
                         var_values=var_values)
        if verbose:
            print(f"Progress: {steps}/{steps} integration steps finished.")
        return obs

    def _run_scan(self, state0, params, inputs, sampling_steps, cutoff, truncate_steps,
                  obs, input_fn=None, spike_info=()):
        """Jitted integration with recording.

        ``input_fn``: optional ``(fn, sig, steps)`` from an on-device input
        spec (rectipy_tpu.inputs); ``inputs`` then carries the spec's
        parameter pytree instead of a (T, m) array.

        Fast path (no gradient truncation): a nested window scan -- the inner
        scan advances ``sampling_steps`` Euler steps accumulating the output
        buffer, the outer scan emits one record per window.  This keeps the
        scan body free of gathers/scatters (each would be a separate kernel
        launch per step on TPU); records leave as ordinary scan outputs.
        Falls back to a generic carried-record-buffer scan when
        ``truncate_steps`` is active.
        """
        steps = input_fn[2] if input_fn is not None else int(inputs.shape[0])
        if truncate_steps >= steps and steps > 1 and sampling_steps >= 1:
            return self._run_scan_windowed(state0, params, inputs, sampling_steps,
                                           cutoff, obs, input_fn=input_fn,
                                           spike_info=spike_info)
        return self._run_scan_generic(state0, params, inputs, sampling_steps, cutoff,
                                      truncate_steps, obs, input_fn=input_fn,
                                      spike_info=spike_info)

    def _resolve_record_spikes(self, labels):
        """``record_spikes=[node, ...]`` -> ((label, spike_reader), ...).
        Only spiking nodes (SpikeNet / SpikeResetNet / MultiSpikeResetNet)
        carry a spike decision to record."""
        info = []
        for label in labels or ():
            node = self.get_node(label)
            if not hasattr(node, "_make_spike_reader"):
                raise ValueError(
                    f"record_spikes: node {label!r} ({type(node).__name__}) is not "
                    "a spiking node; spike rasters exist for SpikeNet / "
                    "SpikeResetNet / MultiSpikeResetNet populations.")
            info.append((label, node._make_spike_reader()))
        return tuple(info)

    def _make_windowed_scan(self, state0, params, in_aval, sampling_steps, cutoff,
                            steps, obs, input_fn=None, spike_info=()):
        """Build the pure windowed-record scan function and its record
        metadata.  Shared by :meth:`run` (single trial) and
        :meth:`run_batch` (vmapped over the trial axis).

        ``input_fn``: on-device input generation (rectipy_tpu.inputs) --
        the scan's third argument becomes the spec's parameter pytree and
        each step's drive is computed as ``input_fn(step_idx, args)``
        inside the scan body (no (T, m) array exists anywhere).

        ``spike_info``: ``((label, spike_reader), ...)`` -- accumulates
        per-neuron spike COUNTS over each record window (raster at
        sampling resolution; the indicator is recomputed from the
        pre-update state, exactly the step's own spike decision)."""
        s = int(sampling_steps)
        rec_info = self._resolve_record_vars(obs)
        step = self.make_step()
        record_output = obs.record_output
        n_out = self.n_out
        out_aval = jax.eval_shape(lambda st, p, x: step(st, p, x)[1], state0, params, in_aval)
        dtype = out_aval.dtype
        n_win = (steps - 1) // s  # full windows after step 0
        tail = (steps - 1) - n_win * s

        def scan_fn(state0, params, inputs):
            params = self._prep_params(params)  # once per call, outside the scan

            def body(state, xt):
                if input_fn is None:
                    x_t, step_idx = xt
                else:
                    step_idx = xt
                    x_t = input_fn(step_idx, inputs)
                # spike decision from the PRE-update state (== the decision
                # the step itself takes this step)
                # indicators accumulate in f32 regardless of the node dtype
                # (a bf16 accumulator saturates window counts at 256)
                spk = tuple(reader(state["nodes"][label]).astype(jnp.float32)
                            for (label, reader) in spike_info)
                state, out, _ = step(state, params, x_t)
                in_window = step_idx >= cutoff
                masked = out * in_window if record_output else jnp.zeros((), dtype=dtype)
                spk = tuple(v * in_window for v in spk)
                return state, (masked, in_window.astype(jnp.int32), spk)

            def read_vars(state):
                vals = {}
                for (key, label, reader, reduce) in rec_info:
                    val = reader(state["nodes"][label], params["nodes"][label])
                    vals["var::" + "::".join(key)] = jnp.mean(val) if reduce else val
                return vals

            spk_zeros = tuple(
                jnp.zeros(np.shape(reader(state0["nodes"][label])), jnp.float32)
                for (label, reader) in spike_info)

            # step 0: its own record window (reference records at step 0)
            x0 = jnp.asarray(0) if input_fn is not None else (inputs[0], jnp.asarray(0))
            state, (o0, c0, spk0) = body(state0, x0)
            rec0 = (o0 / jnp.maximum(c0, 1) if record_output else None,
                    read_vars(state), spk0)

            def window(state, xt):
                def inner(carry, xt2):
                    state, acc, cnt, accs = carry
                    state, (o, c, spk) = body(state, xt2)
                    accs = tuple(a + v for a, v in zip(accs, spk))
                    return (state, acc + o, cnt + c, accs), None

                acc0 = jnp.zeros(n_out if record_output else (), dtype=dtype)
                (state, acc, cnt, accs), _ = jax.lax.scan(
                    inner, (state, acc0, jnp.asarray(0, jnp.int32), spk_zeros), xt)
                mean = acc / jnp.maximum(cnt, 1) if record_output else None
                return state, (mean, read_vars(state), accs)

            recs = None
            idx_w = (1 + jnp.arange(n_win * s)).reshape(n_win, s)
            if n_win:
                if input_fn is None:
                    inp_w = inputs[1:1 + n_win * s].reshape(n_win, s, -1)
                    state, recs = jax.lax.scan(window, state, (inp_w, idx_w))
                else:
                    state, recs = jax.lax.scan(window, state, idx_w)
            if tail:
                def tail_body(state, xt):
                    if input_fn is None:
                        x_t = xt
                    else:
                        x_t = input_fn(xt, inputs)
                    state, _, _ = step(state, params, x_t)
                    return state, None

                tail_xs = (inputs[1 + n_win * s:] if input_fn is None
                           else jnp.arange(1 + n_win * s, steps))
                state, _ = jax.lax.scan(tail_body, state, tail_xs)
            return state, rec0, recs

        return scan_fn, rec_info, record_output

    @staticmethod
    def _assemble_windowed_records(rec0, recs, rec_info, record_output, rec_steps_all,
                                   cutoff, n_out, axis: int = 0, spike_info=()):
        """Host-side record assembly: step 0 + window ends, filtered by
        cutoff, along record axis ``axis`` (0 single-trial, 1 batched)."""
        keep = np.asarray([t >= cutoff for t in rec_steps_all])
        if record_output:
            parts = [np.expand_dims(np.asarray(rec0[0]), axis)]
            if recs is not None:
                parts.append(np.asarray(recs[0]))
            outs = np.compress(keep, np.concatenate(parts, axis=axis), axis=axis)
        else:
            outs = None
        rec_vars = {}
        for (key, _, _, _) in rec_info:
            k = "var::" + "::".join(key)
            parts = [np.expand_dims(np.asarray(rec0[1][k]), axis)]
            if recs is not None:
                parts.append(np.asarray(recs[1][k]))
            rec_vars[key] = np.compress(keep, np.concatenate(parts, axis=axis), axis=axis)
        for i, (label, _) in enumerate(spike_info):
            parts = [np.expand_dims(np.asarray(rec0[2][i]), axis)]
            if recs is not None:
                parts.append(np.asarray(recs[2][i]))
            counts = np.compress(keep, np.concatenate(parts, axis=axis), axis=axis)
            rec_vars[(label, "spikes")] = np.rint(counts).astype(np.int32)
        return outs, rec_vars

    def _run_scan_windowed(self, state0, params, inputs, sampling_steps, cutoff, obs,
                           input_fn=None, spike_info=()):
        if input_fn is not None:
            in_fn, in_sig, steps = input_fn
            in_aval = jax.eval_shape(lambda a: in_fn(jnp.asarray(0), a), inputs)
        else:
            in_fn, in_sig, steps = None, None, int(inputs.shape[0])
            in_aval = inputs[0]
        s = int(sampling_steps)
        rec_steps_all = [t for t in range(steps) if t % s == 0]
        rec_steps_host = np.asarray([t for t in rec_steps_all if t >= cutoff], dtype=np.int64)
        scan_fn, rec_info, record_output = self._make_windowed_scan(
            state0, params, in_aval, s, cutoff, steps, obs, input_fn=in_fn,
            spike_info=spike_info)
        # cache the jitted scan per configuration: re-wrapping a fresh closure
        # in jax.jit on every run() forces a full host-side retrace per call
        # (measured ~0.8 s/call at N=10k -- larger than the device time)
        cache_key = ("run_windowed", s, cutoff, steps, record_output, in_sig,
                     self._step_versions(),
                     tuple(label for (label, _) in spike_info),
                     tuple((key, reduce) for (key, _, _, reduce) in rec_info))
        if cache_key not in self._step_cache:
            self._step_cache[cache_key] = jax.jit(scan_fn)
        stateT, rec0, recs = self._step_cache[cache_key](state0, params, inputs)

        # Nothing is transferred to host unless actually recorded (the out
        # transfer alone costs ~0.8 s/run over the device tunnel at N=10k).
        outs, rec_vars = self._assemble_windowed_records(
            rec0, recs, rec_info, record_output, rec_steps_all, cutoff, self.n_out,
            spike_info=spike_info)
        return stateT, rec_steps_host, outs, rec_vars

    def _run_scan_generic(self, state0, params, inputs, sampling_steps, cutoff,
                          truncate_steps, obs, input_fn=None, spike_info=()):
        """Generic carried-record-buffer scan (supports truncate_steps)."""
        if input_fn is not None:
            in_fn, in_sig, steps = input_fn
            in_aval = jax.eval_shape(lambda a: in_fn(jnp.asarray(0), a), inputs)
        else:
            in_fn, in_sig, steps = None, None, int(inputs.shape[0])
            in_aval = inputs[0]
        rec_steps_host = np.asarray(
            [s for s in range(steps) if s >= cutoff and s % sampling_steps == 0], dtype=np.int64)
        n_rec = len(rec_steps_host)
        rec_info = self._resolve_record_vars(obs)
        step = self.make_step()
        n_out = self.n_out
        # the network-level dtype (edge math) and node dtypes may differ (the
        # reference defaults Network to float32 but nodes to float64); record
        # buffers must match the actual fused-step output type
        out_aval = jax.eval_shape(lambda s, p, x: step(s, p, x)[1], state0, params, in_aval)
        dtype = out_aval.dtype
        truncating = truncate_steps < steps

        def scan_fn(state0, params, inputs):
            params = self._prep_params(params)  # once per call, outside the scan
            rec0 = {
                "out": jnp.zeros((n_rec, n_out), dtype=dtype),
            }
            var_shapes = {}
            for (key, label, reader, reduce) in rec_info:
                probe = reader(state0["nodes"][label], params["nodes"][label])
                shape = () if reduce else probe.shape
                rec0["var::" + "::".join(key)] = jnp.zeros((n_rec,) + shape, dtype=probe.dtype)
                var_shapes[key] = shape
            spk_zeros = {}
            for (label, reader) in spike_info:
                probe = reader(state0["nodes"][label])
                # f32 count accumulation regardless of the node dtype (bf16
                # would saturate window counts at 256)
                rec0["spk::" + label] = jnp.zeros((n_rec,) + probe.shape, jnp.float32)
                spk_zeros[label] = jnp.zeros(probe.shape, jnp.float32)

            def body(carry, xt):
                state, buf_sum, buf_cnt, buf_spk, recs, rec_i = carry
                if in_fn is None:
                    x_t, step_idx = xt
                else:
                    step_idx = xt
                    x_t = in_fn(step_idx, inputs)
                in_window = step_idx >= cutoff
                buf_spk = dict(buf_spk)
                for (label, reader) in spike_info:  # pre-update spike decision
                    buf_spk[label] = buf_spk[label] + \
                        reader(state["nodes"][label]).astype(jnp.float32) * in_window
                state, out, _ = step(state, params, x_t)
                buf_sum = jnp.where(in_window, buf_sum + out, buf_sum)
                buf_cnt = jnp.where(in_window, buf_cnt + 1, buf_cnt)
                do_rec = in_window & (step_idx % sampling_steps == 0)
                mean_out = buf_sum / jnp.maximum(buf_cnt, 1)
                idx = jnp.minimum(rec_i, n_rec - 1)
                recs = dict(recs)
                recs["out"] = recs["out"].at[idx].set(
                    jnp.where(do_rec, mean_out, recs["out"][idx]))
                for (key, label, reader, reduce) in rec_info:
                    val = reader(state["nodes"][label], params["nodes"][label])
                    if reduce:
                        val = jnp.mean(val)
                    rkey = "var::" + "::".join(key)
                    recs[rkey] = recs[rkey].at[idx].set(
                        jnp.where(do_rec, val, recs[rkey][idx]))
                for (label, _) in spike_info:
                    rkey = "spk::" + label
                    recs[rkey] = recs[rkey].at[idx].set(
                        jnp.where(do_rec, buf_spk[label], recs[rkey][idx]))
                    buf_spk[label] = jnp.where(do_rec, jnp.zeros_like(buf_spk[label]),
                                               buf_spk[label])
                buf_sum = jnp.where(do_rec, jnp.zeros_like(buf_sum), buf_sum)
                buf_cnt = jnp.where(do_rec, 0, buf_cnt)
                rec_i = rec_i + do_rec.astype(jnp.int32)
                if truncating:
                    trunc = (step_idx % truncate_steps) == (truncate_steps - 1)
                    state = _tree_where(trunc, jax.lax.stop_gradient(state), state)
                return (state, buf_sum, buf_cnt, buf_spk, recs, rec_i), None

            init = (state0, jnp.zeros(n_out, dtype=dtype), jnp.asarray(0, dtype=jnp.int32),
                    spk_zeros, rec0, jnp.asarray(0, dtype=jnp.int32))
            xs = jnp.arange(steps) if in_fn is not None else (inputs, jnp.arange(steps))
            (stateT, _, _, _, recs, _), _ = jax.lax.scan(body, init, xs)
            return stateT, recs

        cache_key = ("run_generic", sampling_steps, cutoff, steps, truncate_steps,
                     in_sig, self._step_versions(),
                     tuple(label for (label, _) in spike_info),
                     tuple((key, reduce) for (key, _, _, reduce) in rec_info))
        if cache_key not in self._step_cache:
            self._step_cache[cache_key] = jax.jit(scan_fn)
        stateT, recs = self._step_cache[cache_key](state0, params, inputs)
        rec_out = np.asarray(recs["out"]) if n_rec else np.zeros((0, n_out))
        rec_vars = {}
        for (key, label, reader, reduce) in rec_info:
            rec_vars[key] = np.asarray(recs["var::" + "::".join(key)])
        for (label, _) in spike_info:
            rec_vars[(label, "spikes")] = np.rint(
                np.asarray(recs["spk::" + label])).astype(np.int32)
        return stateT, rec_steps_host, rec_out, rec_vars

    def run_batch(self, inputs, sampling_steps: int = 1, cutoff: int = 0,
                  verbose: bool = False, **kwargs) -> dict:
        """Integrate a BATCH of independent trials in one vmapped scan.

        ``inputs``: ``(B, T, m)``.  Every trial starts from the network's
        current state.  Returns ``{"steps": (R,), "out": (B, R, n_out),
        (node, var): (B, R, ...)}`` with the same recording semantics as
        :meth:`run`.  No reference analog -- trial parallelism is free on TPU
        (and shards over the 'data' mesh axis; see rectipy_tpu.parallel).
        The network state is left unchanged (trials would disagree).

        ``batch_vars`` (optional): ``{(node, var): values}`` sweeps node
        PARAMETERS across the trials -- ``values`` is ``(B,)`` (one scalar
        per trial) or ``(B, n)`` (per-neuron per trial); every trial ``b``
        integrates with its own ``values[b]``.  The TPU-native bifurcation
        / parameter-sweep workload: one vmapped program evaluates the whole
        sweep (couplings sweep too -- precision prep runs per trial inside
        the program).  Keys of the form ``("edge", source, target, param)``
        sweep EDGE parameters the same way (``"weights"``, a
        ``mode='interp'`` edge's float ``"delays"`` matrix, masks) --
        per-trial connectomes in one program, and the surface
        :meth:`fit_es` evolves gradient-free.  Composes with ``mesh=``:
        swept leaves shard over the ``'data'`` axis with their trials.

        All B trials run in ONE vmapped scan (a single XLA program; batched
        matvecs become matmuls on the MXU).  Falls back to a per-trial loop
        only for T == 1, where the windowed scan doesn't apply.
        """
        mesh = kwargs.pop("mesh", None)
        batch_vars = kwargs.pop("batch_vars", None)
        spike_info = self._resolve_record_spikes(kwargs.pop("record_spikes", None))
        input_fn, in_axes_tree = None, 0
        if isinstance(inputs, InputSpec):
            # on-device drive: per-trial noise realizations (Noise with (B,)
            # seeds) or one shared drive swept over batch_vars -- either way
            # no (B, T, m) array is materialized or transferred.
            spec = inputs
            in_fn, inputs, in_axes_tree, in_sig = spec.build(self.dt, self.dtype)
            T = int(spec.steps)
            B = spec.batch
            if B is None:
                if not batch_vars:
                    raise ValueError(
                        "run_batch with an unbatched input spec needs batch_vars "
                        "(or make the spec per-trial, e.g. Noise with (B,) seeds).")
                B = int(np.shape(next(iter(batch_vars.values())))[0])
                in_axes_tree = jax.tree.map(lambda _: None, in_axes_tree)
            if self.n_in and spec.channels not in (1, self.n_in):
                raise ValueError(
                    f"input spec has {spec.channels} channels but the network "
                    f"input node expects {self.n_in} (or 1, broadcast).")
            input_fn = (in_fn, in_sig, T)
        else:
            # staging rule: device arrays of the right dtype pass through
            # untouched (np.asarray would silently round-trip them to host
            # and re-transfer every call)
            if not (isinstance(inputs, jnp.ndarray) and inputs.dtype == self.dtype):
                inputs = jnp.asarray(np.asarray(inputs), dtype=self.dtype)
            if inputs.ndim == 2 and batch_vars:
                # one SHARED (T, m) drive swept over batch_vars: staged once,
                # vmapped with in_axes=None -- no (B, T, m) duplication
                B, T = int(np.shape(next(iter(batch_vars.values())))[0]), int(inputs.shape[0])
                in_axes_tree = None
            elif inputs.ndim != 3:
                raise ValueError(
                    f"run_batch expects (B, T, m) inputs -- or shared (T, m) "
                    f"inputs with batch_vars -- got {inputs.shape}")
            else:
                B, T = int(inputs.shape[0]), int(inputs.shape[1])
        self.compile()
        obs = Observer(dt=self.dt, record_loss=kwargs.pop("record_loss", False), **kwargs)
        state0 = self.init_state()
        params = self.parameters_pytree()
        p_axes = None
        if batch_vars:
            p_axes = jax.tree.map(lambda _: None, params)
            swept = []
            for k, vals in batch_vars.items():
                # node params, exact paths, or ("edge", src, tgt, param)
                # EDGE sweeps (frozen weights / interp delay matrices /
                # masks) -- the gradient-free connectome-fitting surface
                sec, label, key = self._sweep_path("batch_vars", k)
                cur = jnp.asarray(params[sec][label][key])
                if not isinstance(vals, jnp.ndarray):  # staging pass-through
                    vals = np.asarray(vals)
                vals = jnp.asarray(vals, dtype=cur.dtype)
                if vals.shape[0] != B:
                    raise ValueError(
                        f"batch_vars[{k}]: leading dimension "
                        f"{vals.shape[0]} != batch size {B}")
                # trailing shape is NOT pinned to the current leaf: a scalar
                # parameter legitimately sweeps with per-neuron (B, n) values
                # (it broadcasts inside the program)
                params[sec][label][key] = vals
                p_axes[sec][label][key] = 0
                if sec == "edges" and key == "delays":
                    edge = self.get_edge(*label.split("->"))
                    if getattr(edge, "_interp_impl", None) == "hat":
                        import warnings

                        warnings.warn(
                            "Sweeping per-trial DELAY matrices on a hat-read "
                            "interp edge streams one (n, m, max_delay+1) hat "
                            "tensor PER TRIAL -- measured 7x slower per "
                            "generation than the factored2 read at M=90/"
                            "pop=16 (single-trial they tie). Build the edge "
                            "with add_edge(..., mode='interp', "
                            "interp_impl='factored2') for delay-sweep "
                            "ensembles.", stacklevel=2)
                swept.append((sec, label, key))
            swept = tuple(sorted(swept))
        if mesh is not None:
            # dp x mp in one call: trials shard over the mesh's 'data' axis,
            # the population over 'model' (same placement rules as run(mesh=));
            # GSPMD lays the collectives, records are identical to single-device
            from jax.sharding import NamedSharding, PartitionSpec

            state0 = self._mesh_place(state0, mesh)
            params = self._mesh_place(params, mesh)
            n_data = mesh.shape.get("data", 1)
            if n_data > 1 and B % n_data == 0:
                batch_spec = PartitionSpec("data", None, None)
            else:
                batch_spec = PartitionSpec()
                if n_data > 1:
                    import warnings

                    warnings.warn(
                        f"run_batch: batch size {B} does not divide the mesh's "
                        f"'data' axis ({n_data}); trials run REPLICATED (no "
                        f"data parallelism). Pad the batch to a multiple of "
                        f"{n_data} to shard it.", stacklevel=2)
            if batch_vars:
                # swept parameter leaves (B, ...) shard over 'data' WITH the
                # trials they belong to (replicated when B doesn't divide)
                for sec, label, key in swept:
                    leaf = params[sec][label][key]
                    spec_p = (PartitionSpec("data", *([None] * (leaf.ndim - 1)))
                              if batch_spec != PartitionSpec() else PartitionSpec())
                    params[sec][label][key] = jax.device_put(
                        leaf, NamedSharding(mesh, spec_p))
            if input_fn is None:
                in_spec = (PartitionSpec() if in_axes_tree is None  # shared (T, m)
                           else batch_spec)
                inputs = jax.device_put(inputs, NamedSharding(mesh, in_spec))
            else:
                # per-trial spec leaves (axis 0 = trials) shard over 'data';
                # shared leaves replicate (they are tiny scalars/keys)
                def _place_leaf(leaf, axis):
                    spec_p = (PartitionSpec("data", *([None] * (np.ndim(leaf) - 1)))
                              if axis == 0 and batch_spec != PartitionSpec()
                              else PartitionSpec())
                    return jax.device_put(leaf, NamedSharding(mesh, spec_p))

                inputs = jax.tree.map(lambda axis, leaf: _place_leaf(leaf, axis),
                                      in_axes_tree, inputs,
                                      is_leaf=lambda x: x is None)

        results = {}
        if T <= 1:  # degenerate horizon: loop trials through the generic path
            outs_all, vars_all, steps_host = [], None, None
            for b in range(B):
                pb = params
                if batch_vars:  # per-trial parameter overrides
                    pb = {**params,
                          "nodes": {n: dict(s) for n, s in params["nodes"].items()},
                          "edges": {e: dict(s) for e, s in params["edges"].items()}}
                    for sec, label, key in swept:
                        pb[sec][label][key] = params[sec][label][key][b]
                if input_fn is None:
                    in_b = inputs if in_axes_tree is None else inputs[b]
                else:  # slice per-trial spec leaves; shared leaves pass through
                    in_b = jax.tree.map(
                        lambda axis, leaf: leaf[b] if axis == 0 else leaf,
                        in_axes_tree, inputs, is_leaf=lambda x: x is None)
                _, steps_host, rec_out, rec_vars = self._run_scan(
                    state0, pb, in_b, sampling_steps, cutoff, T, obs,
                    input_fn=input_fn, spike_info=spike_info)
                outs_all.append(rec_out)
                if vars_all is None:
                    vars_all = {k: [] for k in rec_vars}
                for k, v in rec_vars.items():
                    vars_all[k].append(v)
            results["steps"] = steps_host
            if outs_all and outs_all[0] is not None:
                results["out"] = np.stack(outs_all)
            for k, v in (vars_all or {}).items():
                results[k] = np.stack(v)
            if verbose:
                print(f"Progress: {B} trials x {T} steps finished.")
            return results

        s = int(sampling_steps)
        rec_steps_all = [t for t in range(T) if t % s == 0]
        # the scan builder probes shapes with ONE trial's params (batched
        # sweep leaves sliced to trial 0); the vmap axes carry the sweep
        params0 = params
        if batch_vars:
            params0 = {**params,
                       "nodes": {n: dict(sb) for n, sb in params["nodes"].items()},
                       "edges": {e: dict(sb) for e, sb in params["edges"].items()}}
            for sec, label, key in swept:
                params0[sec][label][key] = params[sec][label][key][0]
        if input_fn is None:
            in_aval = inputs[0] if in_axes_tree is None else inputs[0, 0]
            in_sig, in_fn_only = ("shared" if in_axes_tree is None else None), None
        else:
            in_fn_only, in_sig, _ = input_fn
            in_args0 = jax.tree.map(
                lambda axis, leaf: leaf[0] if axis == 0 else leaf,
                in_axes_tree, inputs, is_leaf=lambda x: x is None)
            in_aval = jax.eval_shape(lambda a: in_fn_only(jnp.asarray(0), a), in_args0)
        scan_fn, rec_info, record_output = self._make_windowed_scan(
            state0, params0, in_aval, s, cutoff, T, obs, input_fn=in_fn_only,
            spike_info=spike_info)
        cache_key = ("run_batch", B, s, cutoff, T, record_output, in_sig,
                     self._step_versions(),
                     tuple(label for (label, _) in spike_info),
                     tuple((key, reduce) for (key, _, _, reduce) in rec_info),
                     swept if batch_vars else ())
        if cache_key not in self._step_cache:
            self._step_cache[cache_key] = jax.jit(
                jax.vmap(scan_fn, in_axes=(None, p_axes, in_axes_tree)))
        _, rec0, recs = self._step_cache[cache_key](state0, params, inputs)
        outs, rec_vars = self._assemble_windowed_records(
            rec0, recs, rec_info, record_output, rec_steps_all, cutoff,
            self.n_out, axis=1, spike_info=spike_info)
        results["steps"] = np.asarray([t for t in rec_steps_all if t >= cutoff],
                                      dtype=np.int64)
        if outs is not None:
            results["out"] = outs
        results.update(rec_vars)
        if verbose:
            print(f"Progress: {B} trials x {T} steps finished.")
        return results

    # -------------------------------------------------------------- training
    def parameters(self, recurse: bool = True) -> Iterator:
        """Yields the trainable parameters of the network model."""
        for n in self.graph:
            yield from self.get_node(n).parameters(recurse=recurse)
        for s, t in self.graph.edges:
            yield from self.graph[s][t]["edge"].parameters()

    def detach(self, requires_grad: bool = True, detach_params: bool = False) -> None:
        for node in self.nodes:
            n = self.get_node(node)
            if hasattr(n, "y"):
                n.detach(requires_grad=requires_grad, detach_params=detach_params)

    def reset(self, state: dict = None):
        """Reset node states (optionally to the given per-node vectors)."""
        # drop carried feedback outputs: the next run's first-step feedback is
        # re-derived from the (freshly reset) source-node states, matching the
        # reference where feedback always reads the live out-slice
        self._fb_store = {}
        for node in self.nodes:
            n = self.get_node(node)
            if hasattr(n, "y"):
                if state and node in state:
                    n.reset(y=state[node])
                else:
                    n.reset()

    @staticmethod
    def _scalar_key(value):
        """A by-VALUE key component for an optimizer/loss kwarg, or None when
        the value is not a plain scalar/str/bool (repr of e.g. a large numpy
        array elides content and could collide across configs -- such configs
        are simply not cached)."""
        if value is None or isinstance(value, (bool, int, float, str)):
            return (type(value).__name__, value)
        if isinstance(value, (tuple, list)):
            parts = tuple(Network._scalar_key(v) for v in value)
            return None if any(p is None for p in parts) else ("seq", parts)
        try:  # dtype-like kwargs (e.g. adam mu_dtype=jnp.bfloat16) key by name
            return ("dtype", np.dtype(value).name)
        except TypeError:
            return None

    def _train_prog_key(self, optimizer, loss, optimizer_kwargs, loss_kwargs):
        """Cache-key component for the jitted training programs: the
        optimizer/loss CONFIG baked into their closures.  The learning rate
        is NOT part of the key -- get_optimizer injects it into opt_state
        (optax.inject_hyperparams), so one compiled program serves every lr.
        Non-string (callable) configs, or kwargs holding anything other than
        scalars/strings/tuples of scalars, return None = no caching."""
        if not (isinstance(optimizer, str) and isinstance(loss, str)):
            return None
        parts = []
        for kw in (optimizer_kwargs, loss_kwargs):
            items = []
            for k in sorted(kw or {}):
                vk = self._scalar_key((kw or {})[k])
                if vk is None:
                    return None
                items.append((k, vk))
            parts.append(tuple(items))
        return (optimizer, parts[0], loss, parts[1])

    def fit_bptt(self, inputs, targets, optimizer: str = "sgd", optimizer_kwargs: dict = None,
                 loss: str = "mse", loss_kwargs: dict = None, lr: float = 1e-3,
                 sampling_steps: int = 1, update_steps: int = 100, verbose: bool = True,
                 **kwargs) -> Observer:
        """Backpropagation through time, fully on device.

        Two modes, as in the reference (/root/reference/rectipy/network.py:603):

        - epoch mode (``inputs`` is a list or a 3D array ``(epochs, T, m)``):
          one optimizer update per epoch on the loss over the (downsampled)
          epoch trajectory; state resets to the pre-training state each epoch.
        - step mode (2D array ``(T, m)``): truncated BPTT -- one update every
          ``update_steps`` steps, state carried with stop_gradient between
          update chunks; the whole optimization is a single lax.scan.

        ``remat_steps=k`` (epoch mode) checkpoints the trajectory in k-step
        chunks: activation memory drops from O(T) to O(T/k + k) at the cost
        of one recomputed forward pass -- the TPU-native way to fit long
        trajectories in HBM (no reference analog; SURVEY.md §5).  On Euler
        chain networks (T divisible by k) this composes with the deferred-
        gradient trajectory (chunked custom VJP: roofline speed AND low
        memory); other topologies honor the request via the plain
        ``jax.checkpoint`` path under ``fused_bptt='auto'``.

        ``fused_bptt`` (epoch mode, default ``'auto'``): use a deferred-
        gradient custom-VJP trajectory -- every coupling/edge weight
        gradient becomes ONE post-scan matmul instead of an (N, N)
        accumulation per step, which is the difference between ~2% and
        ~full HBM-roofline training throughput at N=10k.  Chain networks
        ``[instants] -> population -> [instants]`` use the single-population
        trajectory (ops/bptt.py; pre/post stages hoist out of the scan);
        general multi-population DAGs with stateless Linear/LinearMasked
        edges use the stage-graph trajectory (ops/graph_bptt.py).  ``True``
        forces a fast path (raising if unsupported), ``False`` disables.
        Gradients match plain autodiff to 1e-9 (f64).

        Plain-adam epoch fits of a single trained dense ``int8_master``
        coupling can additionally fuse the optimizer tail (adam update +
        next epoch's per-row requantization) into one pass over the
        ``(N, N)`` arrays via ``RECTIPY_FUSED_ADAM=pallas|xla``
        (ops/fused_opt.py).  Loss curves are identical to the optax
        sequence, but the path is OFF by default: paired on-chip A/B
        (benchmarks/ab_fused_adam.py) measured it slower end-to-end than
        the split schedule, which XLA already fuses inside the epoch
        program.
        """
        self.compile()
        loss_fn = get_loss_function(loss, loss_kwargs=loss_kwargs)
        opt = get_optimizer(optimizer, lr, optimizer_kwargs=optimizer_kwargs)
        retrieve_from_dict(["closure", "retain_graph"], kwargs)  # torch-only knobs
        obs_kwargs = retrieve_from_dict(["record_output", "record_loss", "record_vars"], kwargs)
        obs = Observer(dt=self.dt, **obs_kwargs)

        paths = self.trainable_paths()
        if not paths:
            raise ValueError("No trainable parameters in the network; pass `train_params` "
                             "to add_diffeq_node or train='gd' to add_edge.")
        mesh = kwargs.pop("mesh", None)
        params = self.parameters_pytree()
        state0 = self.init_state()
        if mesh is not None:
            # one-call multichip training: population-shard params/state; the
            # whole value_and_grad + optax step then runs under GSPMD
            params = self._mesh_place(params, mesh)
            state0 = self._mesh_place(state0, mesh)
        train, frozen = self._partition(params, paths)
        opt_state = opt.init(train)
        step = self.make_step()

        remat_steps = int(kwargs.pop("remat_steps", 0))
        t0 = perf_counter()
        epoch_mode = isinstance(inputs, list) or (
            hasattr(inputs, "ndim") and np.asarray(inputs).ndim == 3)
        if epoch_mode:
            if len(inputs) != len(targets):
                raise ValueError(
                    "Wrong dimensions of input and target output. Please make sure that "
                    "`inputs` and `targets` agree in the first dimension (epochs)."
                )
            prog_key = self._train_prog_key(optimizer, loss, optimizer_kwargs,
                                             loss_kwargs)
            # plain adam (only b1/b2/eps overrides, scalar lr) qualifies for
            # the fused adam + requantize tail on int8_master chain fits; a
            # callable lr schedule must stay on optax (inject_hyperparams
            # re-evaluates it per step, the fused carry would freeze it).
            # RECTIPY_FUSED_ADAM is read LIVE here and rides the cfg into
            # the program cache key, so flipping it between fits rebuilds
            # instead of silently reusing the other path's cached programs.
            # Default is OFF: paired on-chip A/B (benchmarks/ab_fused_adam.py,
            # v5e 2026-08-18) measured the fused epoch SLOWER than the split
            # schedule (pallas 99.1 ms vs split 92.5 ms; xla-fused 94.0) --
            # XLA already fuses the adam update with next epoch's
            # quantize_rows inside the chunk-scan program (the split tail
            # measures 7.6 ms in one jit, not the 12.8 ms two-kernel anatomy
            # the fusion was designed against), and threading (wq, scale)
            # through the carry costs more than the ~0.5 ms the Pallas
            # kernel saves standalone.  'pallas'/'xla' remain as explicit
            # experimental opt-ins.
            fused_opt_cfg = None
            okw = dict(optimizer_kwargs or {})
            fused_mode = os.environ.get("RECTIPY_FUSED_ADAM", "off")
            if (optimizer == "adam" and not callable(lr)
                    and fused_mode not in ("off", "auto")
                    and set(okw) <= {"b1", "b2", "eps"}):
                try:
                    fused_opt_cfg = {k: float(okw.get(k, d)) for k, d in
                                     (("b1", 0.9), ("b2", 0.999), ("eps", 1e-8))}
                    fused_opt_cfg["mode"] = fused_mode
                except (TypeError, ValueError):
                    fused_opt_cfg = None  # schedule/array kwargs: optax path
            fused_bptt = kwargs.pop("fused_bptt", "auto")

            def epochs(tr, os_, ins, tgts):
                return self._bptt_epochs(step, loss_fn, opt, tr, frozen, os_,
                                         state0, ins, tgts, sampling_steps,
                                         verbose, remat_steps=remat_steps,
                                         fused_bptt=fused_bptt, mesh=mesh,
                                         prog_key=prog_key,
                                         fused_opt_cfg=fused_opt_cfg)

            # Reference parity: _bptt_epochs returns the LAST epoch's run
            # Observer (out/steps/record_vars with the weights after K-1
            # updates), /root/reference/rectipy/network.py:983-1014.  The
            # recording forward costs an extra pass over the last epoch, so
            # it runs only when recording is EXPLICITLY requested -- the
            # default epoch fit stays pure training programs (the documented
            # deviation: obs holds only epoch_loss/epochs then).
            rec_requested = bool(obs_kwargs.get("record_vars")) or bool(
                obs_kwargs.get("record_output", False))
            if rec_requested and len(inputs) >= 1:
                head_in, head_tgt = list(inputs[:-1]), list(targets[:-1])
                losses = []
                if head_in:
                    train, opt_state, losses = epochs(train, opt_state,
                                                      head_in, head_tgt)
                # the recorded forward sees the weights after K-1 updates,
                # exactly the forward the reference's last-epoch run records
                self._write_back(params=self._combine(train, frozen))
                run_kw = {k: v for k, v in obs_kwargs.items()
                          if k in ("record_output", "record_vars")}
                obs = self.run(inputs[-1], sampling_steps=sampling_steps,
                               verbose=False, mesh=mesh, **run_kw)
                self._write_back(state=state0)  # reference resets per epoch
                train, opt_state, last = epochs(train, opt_state,
                                                [inputs[-1]], [targets[-1]])
                losses = list(losses) + list(last)
            else:
                train, opt_state, losses = epochs(train, opt_state,
                                                  inputs, targets)
            obs.save("epoch_loss", losses)
            obs.save("epochs", np.arange(len(losses)))
        else:
            inputs = jnp.asarray(np.asarray(inputs), dtype=self.dtype)
            targets = jnp.asarray(np.asarray(targets), dtype=self.dtype)
            if inputs.shape[0] != targets.shape[0]:
                raise ValueError(
                    "Wrong dimensions of input and target output. Please make sure that "
                    "`inputs` and `targets` agree in the first dimension."
                )
            if mesh is not None:
                inputs = self._mesh_replicate(inputs, mesh)
                targets = self._mesh_replicate(targets, mesh)
            prog_key = self._train_prog_key(optimizer, loss, optimizer_kwargs,
                                             loss_kwargs)
            train, stateT, rec = self._bptt_steps(step, loss_fn, opt, train, frozen, opt_state,
                                                  state0, inputs, targets, update_steps,
                                                  sampling_steps, obs,
                                                  fused_bptt=kwargs.pop("fused_bptt", "auto"),
                                                  prog_key=prog_key)
            self._write_back(state=stateT)
            obs.record_batch(rec["steps"], outputs=rec["out"], losses=rec["loss"],
                             var_values=rec.get("vars"))
        self._write_back(params=self._combine(train, frozen))
        if verbose:
            print(f"Finished optimization after {perf_counter() - t0} s.")
        return obs

    _CLASS_LOSSES = ("nll", "ce")  # integer class labels: (B, R) targets

    def _sweep_path(self, name, k):
        """Resolve a ``batch_vars`` / ``fit_es`` ``fit_vars`` key to a
        params-pytree path ``("nodes"|"edges", label_or_ekey, param)``.
        Accepted forms: ``(node, var)``; an exact path 3-tuple; or
        ``("edge", source, target, param)`` addressing an EDGE parameter
        (``"weights"``, a ``mode='interp'`` delay matrix ``"delays"``, a
        ``"mask"``, ...).  Integer-delay edges keep their delays as static
        gather structure, not a parameter -- sweeping/evolving delays needs
        the interp read."""
        k = tuple(k)
        if len(k) == 4 and k[0] == "edge":
            _, src, tgt, param = k
            edge = self.get_edge(src, tgt)  # raises with names if absent
            if param not in edge.params:
                extra = ""
                if param == "delays":
                    extra = (" -- integer-delay edges hold their delays as "
                             "static gather structure; build the edge with "
                             "mode='interp' to expose a sweepable/evolvable "
                             "float delay matrix")
                raise KeyError(
                    f"{name}: {param!r} is not a parameter of edge "
                    f"{src!r} -> {tgt!r} (available: {sorted(edge.params)})"
                    f"{extra}.")
            return ("edges", _ekey(src, tgt), param)
        if len(k) == 3 and k[0] in ("nodes", "edges"):
            # exact path form: validate it resolves NOW so callers fail
            # with names instead of a bare KeyError deep in a program build
            sec, label, key = k
            try:
                if sec == "nodes":
                    owner = getattr(self.get_node(label), "_args", {})
                else:
                    owner = self.get_edge(*label.split("->")).params
            except KeyError:
                raise KeyError(f"{name}: path {k} not found "
                               f"(no such {sec[:-1]} {label!r}).")
            if key not in owner:
                raise KeyError(
                    f"{name}: {key!r} is not a parameter of {sec[:-1]} "
                    f"{label!r} (path {k} not found).")
            return k
        nlabel, var = k
        node = self.get_node(nlabel)
        try:
            return ("nodes", nlabel, node._param_map[self._relabel_var(var)])
        except (AttributeError, KeyError):
            raise KeyError(f"{name}: {var!r} is not a parameter of node "
                           f"{nlabel!r}.")

    def _resolve_batch_vars(self, name, batch_vars, B, params):
        """Resolve a ``batch_vars`` mapping for the batched-trial trainers to
        a flat ``{(kind, label, key): (B, ...) device array}`` of per-trial
        FROZEN-parameter overrides.  Keys are ``(node, var)`` pairs (like
        :meth:`run_batch`) or exact trainable-style paths
        ``("nodes"|"edges", label, key)``; values are ``(B,)`` (one scalar
        per trial) or ``(B,) + leaf.shape``.  Trainable parameters are
        rejected -- per-trial TRAINED parameters are
        :meth:`fit_bptt_multistart`'s job (per-start), not a sweep's."""
        trainable = set(self.trainable_paths())
        fb = {}
        for k, vals in (batch_vars or {}).items():
            path = self._sweep_path(name, k)
            if path in trainable:
                raise ValueError(
                    f"{name}: batch_vars path {path} is TRAINABLE; per-trial "
                    f"sweeps apply to frozen parameters (per-start trainable "
                    f"inits are fit_bptt_multistart's start_inits).")
            try:
                leaf = jnp.asarray(params[path[0]][path[1]][path[2]])
            except KeyError:
                raise KeyError(f"{name}: batch_vars path {path} not found.")
            if not isinstance(vals, jnp.ndarray):  # staging pass-through rule
                vals = np.asarray(vals)
            vals = jnp.asarray(vals, dtype=leaf.dtype)
            if vals.shape not in ((B,), (B,) + leaf.shape):
                raise ValueError(
                    f"{name}: batch_vars[{k}] must have shape {(B,)} (scalar "
                    f"per trial) or {(B,) + leaf.shape}, got {vals.shape}")
            fb[path] = vals
        return fb

    def _batch_fit_setup(self, name, inputs, targets, batch_size, loss,
                         loss_fn, opt, optimizer, optimizer_kwargs,
                         loss_kwargs, sampling_steps, shuffle, seed,
                         n_epochs, kwargs):
        """Shared setup for the batched-trial trainers
        (:meth:`fit_bptt_batch` / :meth:`fit_bptt_multistart`): staging
        pass-through, shape validation, minibatch math, remat/fused
        resolution, the cached program 5-tuple (the cache key MUST stay
        byte-identical between the two callers -- they share the programs),
        and the per-epoch trial permutations (host numpy; callers stage).

        Returns ``(inputs, targets, B, T, n_mb, mb, shuffled, built,
        perms)``.
        """
        # device jnp arrays pass through UNTOUCHED (they are immutable):
        # coercing them via np.asarray would round-trip (B, T, m) to host
        # and re-stage it over the tunnel EVERY fit -- measured ~74 ms/epoch
        # per trial at N=10k (the whole batch-amortization win).  Host
        # numpy/list inputs still stage per fit by design (mutable).
        if not isinstance(inputs, jnp.ndarray):
            inputs = np.asarray(inputs)
        if not isinstance(targets, jnp.ndarray):
            targets = np.asarray(targets)
        ishape, tshape = np.shape(inputs), np.shape(targets)
        if len(ishape) != 3:
            raise ValueError(f"{name} expects (B, T, m) inputs, got {ishape}")
        expect_nd = 2 if loss in self._CLASS_LOSSES else 3
        if len(tshape) != expect_nd:
            raise ValueError(
                f"{name} expects targets of shape "
                f"{'(B, R) integer class labels' if expect_nd == 2 else '(B, R, n_out)'} "
                f"for loss={loss!r} (R = T // sampling_steps), got {tshape}")
        if tshape[0] != ishape[0]:
            raise ValueError(
                "Wrong dimensions of input and target output. Please make sure that "
                "`inputs` and `targets` agree in the first dimension (trials)."
            )
        B, T = int(ishape[0]), int(ishape[1])
        mb = B if batch_size is None else int(batch_size)
        if mb < 1 or B % mb:
            raise ValueError(f"batch_size={mb} must divide the number of trials B={B}")
        n_mb = B // mb

        remat_steps = int(kwargs.pop("remat_steps", 0))
        rk = remat_steps if (remat_steps > 1 and T % remat_steps == 0) else 0
        fused_bptt = kwargs.pop("fused_bptt", "auto")
        if remat_steps > 1 and rk == 0 and fused_bptt == "auto":
            fused_bptt = False  # non-divisible T: plain path handles remat
        shuffled = bool(shuffle) and n_mb > 1  # full-batch: order is moot
        accum = int(kwargs.pop("accum_steps", 1))
        if accum < 1 or mb % accum:
            raise ValueError(
                f"accum_steps={accum} must divide the minibatch size {mb} "
                f"(micro-batches of mb/accum_steps trials each).")

        prog_key = self._train_prog_key(optimizer, loss, optimizer_kwargs,
                                        loss_kwargs)
        cache_key = None
        if prog_key is not None:
            cache_key = ("bptt_batch", prog_key, sampling_steps, rk,
                         str(fused_bptt), remat_steps, self._step_versions(),
                         n_mb, mb, shuffled, accum)
        built = self._step_cache.get(cache_key) if cache_key is not None else None
        if built is None:
            built = self._build_batch_programs(self.make_step(), loss_fn, opt,
                                               fused_bptt, rk, remat_steps,
                                               sampling_steps, n_mb, mb,
                                               shuffled, accum=accum)
            if cache_key is not None:
                self._step_cache[cache_key] = built

        E = int(n_epochs)
        if shuffled:
            rng = np.random.default_rng(seed)
            perms = np.stack([rng.permutation(B) for _ in range(E)])
        else:
            perms = np.broadcast_to(np.arange(B), (E, B))
        return inputs, targets, B, T, n_mb, mb, shuffled, built, \
            np.ascontiguousarray(perms)

    def fit_bptt_batch(self, inputs, targets, n_epochs: int = 1,
                       batch_size: int = None, optimizer: str = "adam",
                       optimizer_kwargs: dict = None, loss: str = "mse",
                       loss_kwargs: dict = None, lr: float = 1e-3,
                       sampling_steps: int = 1, shuffle: bool = True,
                       seed: int = 0, verbose: bool = True,
                       **kwargs) -> Observer:
        """Minibatch BPTT over a batch of independent trials.

        ``inputs``: ``(B, T, m)`` -- B independent trials, each starting
        from the network's current state.  ``targets``: ``(B, R, n_out)``
        with ``R = T // sampling_steps``.  Every optimizer update takes the
        gradient of the MEAN loss over one minibatch of ``batch_size``
        trials (default: all B, i.e. full-batch gradient descent);
        ``n_epochs`` passes over the data, reshuffling trial order each
        epoch when ``shuffle`` (device-side permutation gather, seeded by
        ``seed``).

        No reference analog (the reference's epoch mode trains ONE trial
        per update, /root/reference/rectipy/network.py:603-707) -- this is
        the TPU-native ensemble trainer: the vmapped trajectory turns every
        per-step coupling matvec into a ``(batch, N) x (N, N)`` matmul on
        the MXU, and a whole epoch (scan over minibatches) or a chunk of
        epochs runs as ONE device program.  Composes with the deferred-
        gradient trajectories (``fused_bptt='auto'``), ``remat_steps``, and
        ``mesh=`` (dp x mp: the population shards over the mesh's 'model'
        axis; trials shard over 'data' whenever ``batch_size`` divides it,
        else they run replicated).

        ``batch_vars`` (optional): ``{(node, var): values}`` per-trial
        FROZEN-parameter overrides, exactly :meth:`run_batch`'s sweep
        surface (``values`` is ``(B,)`` or ``(B, n)``) -- trial ``b``
        integrates with its own ``values[b]`` while the TRAINED parameters
        stay shared across trials.  This is the heterogeneous-condition
        fitting workload (one coupling matrix trained across per-trial
        drives / excitabilities / subjects) in a single vmapped program.
        Swept paths must be frozen (per-start trainable inits are
        :meth:`fit_bptt_multistart`'s job).

        ``accum_steps`` (optional, default 1): micro-batch gradient
        accumulation -- each update's gradient is accumulated over
        ``accum_steps`` sequential micro-batches of
        ``batch_size/accum_steps`` trials inside the epoch program, then
        ONE optimizer step is taken.  Loss and gradients are EXACTLY the
        full-minibatch update (equal-size mean-of-means; regression-pinned
        on CPU), while residual memory is bounded by one micro-batch's
        trajectories -- the one-chip escape hatch when the trial batch
        OOMs (round-4 envelope: B=8 at N=100352) and no mesh 'data' axis
        is available to shard trials over.  Trades time for memory (the
        micro-batches run sequentially).

        Returns an Observer with ``epoch_loss`` (mean over minibatches,
        one per epoch), ``train_loss`` (one per update), and ``epochs``.
        The network's trained parameters are written back; its state is
        left unchanged (trials would disagree).
        """
        self.compile()
        loss_fn = get_loss_function(loss, loss_kwargs=loss_kwargs)
        opt = get_optimizer(optimizer, lr, optimizer_kwargs=optimizer_kwargs)
        obs = Observer(dt=self.dt, **retrieve_from_dict(["record_loss"], kwargs))

        paths = self.trainable_paths()
        if not paths:
            raise ValueError("No trainable parameters in the network; pass `train_params` "
                             "to add_diffeq_node or train='gd' to add_edge.")
        mesh = kwargs.pop("mesh", None)
        batch_vars = kwargs.pop("batch_vars", None)
        inputs, targets, B, T, n_mb, mb, shuffled, built, perms = \
            self._batch_fit_setup("fit_bptt_batch", inputs, targets,
                                  batch_size, loss, loss_fn, opt, optimizer,
                                  optimizer_kwargs, loss_kwargs,
                                  sampling_steps, shuffle, seed, n_epochs,
                                  kwargs)
        params = self.parameters_pytree()
        fb = self._resolve_batch_vars("fit_bptt_batch", batch_vars, B, params)
        state0 = self.init_state()
        if mesh is not None:
            params = self._mesh_place(params, mesh)
            state0 = self._mesh_place(state0, mesh)
        train, frozen = self._partition(params, paths)
        opt_state = opt.init(train)
        fit_single, fit_chunk, pack = built[:3]
        y0p = pack(state0)

        # dp x mp: trials shard over the mesh's 'data' axis when every
        # minibatch stays shard-aligned (mb % n_data == 0); the population
        # shards over 'model' via the placed params/state.  GSPMD lays the
        # collectives (incl. the shuffle's permutation gather).
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        shard_trials = n_data > 1 and mb % n_data == 0
        if n_data > 1 and not shard_trials:
            import warnings

            warnings.warn(
                f"fit_bptt_batch: batch_size {mb} does not divide the "
                f"mesh's 'data' axis ({n_data}); trials run REPLICATED "
                f"(no data parallelism).", stacklevel=2)

        def place(x, dtype, on_data=False):
            arr = jnp.asarray(x, dtype=dtype)
            if mesh is None:
                return jax.device_put(arr)
            if not (on_data and shard_trials):
                return self._mesh_replicate(arr, mesh)
            from jax.sharding import NamedSharding, PartitionSpec

            spec = PartitionSpec("data", *([None] * (arr.ndim - 1)))
            return jax.device_put(arr, NamedSharding(mesh, spec))

        inp = place(inputs, self.dtype, on_data=True)
        tgt = place(targets, self.dtype, on_data=True)
        fb = {k: place(v, v.dtype, on_data=True) for k, v in fb.items()}
        E = int(n_epochs)
        perms = place(perms, jnp.int32)

        t0 = perf_counter()
        loss_parts = []
        C = _EPOCH_SCAN_CHUNK
        if verbose:
            for epoch in range(E):
                train, opt_state, lvals = fit_single(train, frozen, fb,
                                                     opt_state, y0p, inp, tgt,
                                                     perms[epoch])
                loss_parts.append(lvals)
                print(f"Progress: {epoch + 1}/{E} training epochs finished.")
                print(f"Epoch loss: {float(jnp.mean(lvals))}.")
                print("")
        else:
            e = 0
            while E - e >= C:
                train, opt_state, lvals = fit_chunk(train, frozen, fb,
                                                    opt_state, y0p, inp, tgt,
                                                    perms[e:e + C])
                loss_parts.append(lvals.reshape(-1))
                e += C
            for epoch in range(e, E):
                train, opt_state, lvals = fit_single(train, frozen, fb,
                                                     opt_state, y0p, inp, tgt,
                                                     perms[epoch])
                loss_parts.append(lvals)
        # losses stay on device through the loop; one fetch here
        losses = np.asarray(jnp.concatenate(loss_parts)) if loss_parts else np.zeros(0)
        obs.save("train_loss", list(losses))
        obs.save("epoch_loss", list(losses.reshape(E, n_mb).mean(axis=1)) if E else [])
        obs.save("epochs", np.arange(E))
        self._write_back(params=self._combine(train, frozen))
        if verbose:
            print(f"Finished optimization after {perf_counter() - t0} s.")
        return obs

    def fit_bptt_multistart(self, inputs, targets, n_starts: int = 8,
                            start_inits: dict = None, init_scale: float = 0.1,
                            n_epochs: int = 1, batch_size: int = None,
                            optimizer: str = "adam", optimizer_kwargs: dict = None,
                            loss: str = "mse", loss_kwargs: dict = None,
                            lr: float = 1e-3, sampling_steps: int = 1,
                            shuffle: bool = True, seed: int = 0,
                            verbose: bool = True, **kwargs) -> Observer:
        """Multi-start BPTT: train ``n_starts`` independently-initialized
        copies of the network SIMULTANEOUSLY on the same trial batch, then
        keep the best.

        The standard methodology for fitting neural models with non-convex
        losses (escape local minima by restarting) -- on TPU the M
        optimizations advance in lockstep as one vmapped program (each
        trainable leaf gains a leading model axis; the staged trials are
        shared), so M starts cost far less than M sequential fits.  No
        reference analog.

        ``inputs``/``targets``/``batch_size``/``shuffle``/``batch_vars`` as
        in :meth:`fit_bptt_batch` (per-trial frozen overrides are shared by
        every start).  Start initializations: ``start_inits`` maps
        ``(node, param)`` (or an exact trainable path ``(kind, label, key)``)
        to an ``(n_starts, ...)`` array of initial values; any trainable
        leaf NOT listed starts at its current value for start 0 and at
        gaussian perturbations ``leaf + init_scale * std(leaf) * eps`` for
        the rest (seeded by ``seed``).

        Returns an Observer with ``epoch_loss`` (the winning start's curve),
        ``start_epoch_loss`` (per-epoch per-start), ``start_final_loss``,
        and ``best_start``.  The winning start's parameters are written back
        to the network.

        ``mesh=`` (mp x ensemble-parallel): the STARTS shard over the
        mesh's 'data' axis (each device group advances M/n_data independent
        optimizations; requires ``n_starts % n_data == 0``, else starts run
        replicated with a warning) and the population shards over 'model';
        the staged trial arrays replicate.
        """
        self.compile()
        loss_fn = get_loss_function(loss, loss_kwargs=loss_kwargs)
        opt = get_optimizer(optimizer, lr, optimizer_kwargs=optimizer_kwargs)
        obs = Observer(dt=self.dt, **retrieve_from_dict(["record_loss"], kwargs))
        mesh = kwargs.pop("mesh", None)

        paths = self.trainable_paths()
        if not paths:
            raise ValueError("No trainable parameters in the network; pass `train_params` "
                             "to add_diffeq_node or train='gd' to add_edge.")
        M = int(n_starts)
        if M < 1:
            raise ValueError(f"n_starts={M} must be >= 1")
        batch_vars = kwargs.pop("batch_vars", None)
        inputs, targets, B, T, n_mb, mb, shuffled, built, perms = \
            self._batch_fit_setup("fit_bptt_multistart", inputs, targets,
                                  batch_size, loss, loss_fn, opt, optimizer,
                                  optimizer_kwargs, loss_kwargs,
                                  sampling_steps, shuffle, seed, n_epochs,
                                  kwargs)
        params = self.parameters_pytree()
        if mesh is not None:
            params = self._mesh_place(params, mesh)
        train, frozen = self._partition(params, paths)
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        shard_starts = n_data > 1 and M % n_data == 0
        if n_data > 1 and not shard_starts:
            import warnings

            warnings.warn(
                f"fit_bptt_multistart: n_starts {M} does not divide the "
                f"mesh's 'data' axis ({n_data}); starts run REPLICATED "
                f"(no ensemble parallelism).", stacklevel=2)
        # resolve start_inits keys to exact trainable paths
        inits = {}
        for k, vals in (start_inits or {}).items():
            if len(k) == 3 and k[0] in ("nodes", "edges"):
                path = tuple(k)
            else:
                nlabel, var = k
                node = self.get_node(nlabel)
                try:
                    path = ("nodes", nlabel, node._param_map[self._relabel_var(var)])
                except (AttributeError, KeyError):
                    raise KeyError(f"start_inits: {var!r} is not a parameter "
                                   f"of node {nlabel!r}.")
            if path not in paths:
                raise KeyError(f"start_inits: {path} is not a trainable path "
                               f"(trainable: {paths}).")
            inits[path] = vals
        init_rng = np.random.default_rng(seed + 1)

        def place_stacked(stacked, leaf):
            # leading 'data' (start) axis composed with the leaf's existing
            # population spec from _mesh_place
            if mesh is None:
                return stacked
            from jax.sharding import NamedSharding, PartitionSpec

            base = (leaf.sharding.spec
                    if isinstance(getattr(leaf, "sharding", None), NamedSharding)
                    else PartitionSpec())
            lead = "data" if shard_starts else None
            return jax.device_put(
                stacked, NamedSharding(mesh, PartitionSpec(lead, *base)))

        def stack_leaf(kind, label, key, leaf):
            leaf = jnp.asarray(leaf)
            given = inits.get((kind, label, key))
            if given is not None:
                given = jnp.asarray(np.asarray(given), dtype=leaf.dtype)
                if given.shape != (M,) + leaf.shape:
                    raise ValueError(
                        f"start_inits[{(kind, label, key)}]: expected shape "
                        f"{(M,) + leaf.shape}, got {given.shape}")
                return place_stacked(given, leaf)
            scale = float(np.std(np.asarray(leaf, dtype=np.float64))) or 1.0
            # fill per start in f32: a one-shot standard_normal((M,)+shape)
            # would transiently hold the full stack in f64 (6.4 GB at
            # N=10k, M=8); this caps the f64 transient at ONE leaf.
            eps = np.empty((M,) + leaf.shape, dtype=np.float32)
            eps[0] = 0.0  # start 0 is the unperturbed current network
            for m in range(1, M):
                eps[m] = init_rng.standard_normal(leaf.shape)
            eps *= np.float32(init_scale * scale)
            return place_stacked(
                leaf[None] + jnp.asarray(eps, dtype=leaf.dtype), leaf)

        train_M = {kind: {label: {key: stack_leaf(kind, label, key, leaf)
                                  for key, leaf in sub.items()}
                          for label, sub in d.items()}
                   for kind, d in train.items()}
        opt_state = jax.vmap(opt.init)(train_M)
        state0 = self.init_state()
        if mesh is not None:
            state0 = self._mesh_place(state0, mesh)
        _, _, pack, fit_single_ms, fit_chunk_ms = built
        y0p = pack(state0)

        # per-trial frozen overrides replicate: the 'data' axis carries STARTS
        fb = self._resolve_batch_vars("fit_bptt_multistart", batch_vars, B,
                                      self.parameters_pytree())
        stage = ((lambda a: self._mesh_replicate(a, mesh))
                 if mesh is not None else jax.device_put)
        inp = stage(jnp.asarray(inputs, dtype=self.dtype))
        tgt = stage(jnp.asarray(targets, dtype=self.dtype))
        fb = {k: stage(v) for k, v in fb.items()}
        E = int(n_epochs)
        perms = stage(jnp.asarray(perms, jnp.int32))

        t0 = perf_counter()
        loss_parts = []
        C = _EPOCH_SCAN_CHUNK
        if verbose:
            for epoch in range(E):
                train_M, opt_state, lv = fit_single_ms(train_M, frozen, fb,
                                                       opt_state, y0p, inp,
                                                       tgt, perms[epoch])
                loss_parts.append(lv[None])  # (1, M, n_mb)
                lv_ep = np.asarray(jnp.mean(lv, axis=1))
                b = _best_start(lv_ep)
                print(f"Progress: {epoch + 1}/{E} training epochs finished.")
                print(f"Best-start epoch loss: {float(lv_ep[b])} (start {b}).")
                print("")
        else:
            e = 0
            while E - e >= C:
                train_M, opt_state, lv = fit_chunk_ms(train_M, frozen, fb,
                                                      opt_state, y0p, inp,
                                                      tgt, perms[e:e + C])
                loss_parts.append(lv)  # (C, M, n_mb)
                e += C
            for epoch in range(e, E):
                train_M, opt_state, lv = fit_single_ms(train_M, frozen, fb,
                                                       opt_state, y0p, inp,
                                                       tgt, perms[epoch])
                loss_parts.append(lv[None])
        losses = (np.asarray(jnp.concatenate(loss_parts, axis=0))
                  if loss_parts else np.zeros((0, M, 1)))
        per_epoch = losses.mean(axis=2)  # (E, M)
        final = per_epoch[-1] if E else np.zeros(M)
        best = _best_start(final) if E else 0
        obs.save("epoch_loss", list(per_epoch[:, best]))
        obs.save("start_epoch_loss", [per_epoch[ep] for ep in range(len(per_epoch))])
        obs.save("start_final_loss", list(final))
        obs.save("best_start", [best])
        obs.save("epochs", np.arange(E))
        train_best = jax.tree.map(lambda l: l[best], train_M)
        self._write_back(params=self._combine(train_best, frozen))
        if verbose:
            print(f"Finished optimization after {perf_counter() - t0} s "
                  f"(best start: {best}).")
        return obs

    @staticmethod
    def _make_es_losses(loss_fn, registry_loss: bool):
        """Per-candidate loss evaluator for fit_es.  Registry losses score
        the whole population in ONE jitted vmapped device program (a single
        relay round-trip instead of pop_size float() syncs; the jit cache
        persists across generations); user callables run on host numpy (they
        may use any non-jax code)."""
        if registry_loss:
            vec = jax.jit(jax.vmap(loss_fn, in_axes=(0, None)))

            def losses(out, targets):
                return np.asarray(vec(jnp.asarray(out), jnp.asarray(targets)),
                                  dtype=np.float64)
        else:
            def losses(out, targets):
                return np.asarray([float(loss_fn(out[b], targets))
                                   for b in range(out.shape[0])])
        return losses

    def fit_es(self, inputs, targets, fit_vars, n_generations: int = 50,
               pop_size: int = 16, sigma: float = 0.1, lr: float = 0.05,
               loss="mse", loss_kwargs: dict = None, sampling_steps: int = 1,
               cutoff: int = 0, antithetic: bool = True,
               rank_shaping: bool = True, sigma_decay: float = 1.0,
               bounds: dict = None, record_spikes=None,
               objective_key="out", seed: int = 0, verbose: bool = True,
               **kwargs) -> Observer:
        """Gradient-free parameter fitting by evolution strategies (OpenAI-ES
        / NES style).

        Beyond-reference trainer: the reference offers only gradient-based
        (fit_bptt), closed-form (fit_ridge), and RLS training -- there is no
        way to fit NODE parameters (excitabilities, time constants, coupling
        strengths) against a non-differentiable or chaotic objective.  This
        is the standard methodology for inverse problems on spiking /
        mean-field models, made cheap on TPU: every generation evaluates the
        WHOLE population of ``pop_size`` parameter candidates as one vmapped
        program (the cached :meth:`run_batch` sweep machinery), so a
        generation costs barely more than a single simulation.

        Per generation, candidates ``theta + sigma * eps_b`` are simulated
        from the network's CURRENT state, scored by ``loss`` on the recorded
        output, and the search point moves along the score-weighted
        perturbation average

            theta <- theta + lr / (pop_size * sigma) * sum_b u_b * eps_b

        with ``u_b`` the centered RANKS of the (negated) losses when
        ``rank_shaping`` (robust to outliers; Salimans et al. 2017) or the
        z-scored negated losses otherwise.  ``antithetic`` evaluates
        perturbations in +/- pairs (variance reduction; requires even
        ``pop_size``).

        ``fit_vars``: list of parameters to evolve -- ``(node, var)`` NODE
        parameters (scalar or per-neuron arrays) and/or ``("edge", source,
        target, param)`` EDGE parameters: coupling ``"weights"``, a
        ``mode='interp'`` edge's float ``"delays"`` matrix, a ``"mask"``
        (the same addressing ``run_batch(batch_vars=)`` accepts).
        Gradient-free connectome fitting: evolving a delay matrix or
        coupling gains where BPTT through long delay buffers or chaotic /
        spiking dynamics is impractical.  Integer-delay edges hold their
        delays as static gather structure -- build the edge with
        ``mode='interp'`` to expose an evolvable delay matrix (the read is
        exactly the one-hot at integer values).  ``bounds``: optional
        ``{fit_var_key: (lo, hi)}`` box constraints (applied to candidates
        and the search point; delays should be bounded to
        ``[0, max_delay]``).  ``inputs``: a ``(T, m)`` array (shared across candidates)
        or an unbatched on-device InputSpec.  ``targets``: ``(R, n_out)``
        (or broadcastable) against the ``sampling_steps``/``cutoff`` record
        grid.  ``loss``: a registry name (mse/l1/nll/ce/kld/hinge; the whole
        population is scored in one vmapped device program) or ANY callable
        ``(out_b, targets) -> scalar`` evaluated on host NUMPY arrays -- it
        is never differentiated, so spike counts, rate histograms, other
        discontinuous statistics, and non-jax code are all fair game.

        ``record_spikes=[node]`` + ``objective_key=(node, "spikes")`` score
        candidates on their per-window SPIKE-COUNT rasters instead of the
        network output (``objective_key`` picks any recorded series; default
        ``"out"``) -- fitting directly to spiking statistics, the canonical
        non-differentiable target.

        ``mesh=``: candidates shard over the mesh's ``'data'`` axis and the
        population over ``'model'`` (the ``run_batch`` placement rules; pick
        ``pop_size`` a multiple of the data axis).  The final B=1
        search-point evaluation runs unsharded.

        Returns an Observer with per-generation ``es_mean_loss`` /
        ``es_best_loss`` / ``es_sigma`` traces, ``es_best_ever_loss``, and
        ``es_final_loss`` (the score of the parameters actually written
        back).  The write-back picks the better of the final search point
        and the best evaluated candidate (``es_returned`` says which): the
        search point random-walks near convergence because the ``1/sigma``
        update grows as ``sigma_decay`` shrinks sigma -- keep ``lr``
        of the same order as ``sigma`` when decaying.  The network state is
        left unchanged (every candidate starts from the same state).
        """
        mesh = kwargs.pop("mesh", None)
        B = int(pop_size)
        if B < 2:
            raise ValueError("fit_es needs pop_size >= 2.")
        if antithetic and B % 2:
            raise ValueError("antithetic sampling needs an even pop_size.")
        if not fit_vars:
            raise ValueError("fit_vars must name at least one (node, var) "
                             "parameter to evolve.")
        fit_vars = [tuple(v) for v in fit_vars]
        for key in fit_vars:
            self._sweep_path("fit_es", key)  # fail early, with names
        if isinstance(objective_key, (list, tuple)):
            objective_key = tuple(objective_key)

        # one canonical getter/setter pair: every fit_vars form resolves
        # through _sweep_path, so node and edge parameters share one code
        # path (node writes go through node._args + the fused-kernel
        # refresh exactly as set_param does)
        def get_fit_var(key):
            sec, label, pkey = self._sweep_path("fit_es", key)
            if sec == "nodes":
                return self.get_node(label)._args[pkey]
            return self.get_edge(*label.split("->")).params[pkey]

        def set_fit_var(key, val):
            sec, label, pkey = self._sweep_path("fit_es", key)
            if sec == "nodes":
                node = self.get_node(label)
                cur = np.asarray(node._args[pkey])
                node._args[pkey] = jnp.asarray(
                    np.asarray(val, dtype=cur.dtype).reshape(cur.shape))
                if getattr(node, "_fused_attached", False):
                    node._refresh_fused_param(pkey)
            else:
                edge = self.get_edge(*label.split("->"))
                cur = np.asarray(edge.params[pkey])
                edge.params[pkey] = jnp.asarray(
                    np.asarray(val, dtype=cur.dtype).reshape(cur.shape))
        registry_loss = not callable(loss)
        if callable(loss):
            if loss_kwargs:
                base_loss = loss
                loss_fn = lambda p, t: base_loss(p, t, **loss_kwargs)  # noqa: E731
            else:
                loss_fn = loss
        else:
            loss_fn = get_loss_function(loss, loss_kwargs=loss_kwargs)
        self.compile()
        targets = np.asarray(targets)
        rng = np.random.default_rng(seed)

        theta = {key: np.asarray(get_fit_var(key), dtype=np.float64)
                 for key in fit_vars}
        bounds = {tuple(k): (float(lo), float(hi))
                  for k, (lo, hi) in (bounds or {}).items()}
        for key in bounds:
            if key not in theta:
                raise ValueError(f"bounds key {key} is not in fit_vars.")

        def clip(key, val):
            if key in bounds:
                lo, hi = bounds[key]
                return np.clip(val, lo, hi)
            return val

        theta = {k: clip(k, v) for k, v in theta.items()}
        if isinstance(inputs, InputSpec):
            if inputs.batch is not None:
                raise ValueError(
                    "fit_es needs an UNBATCHED input spec shared across "
                    "candidates (per-trial streams would randomize the "
                    "objective per candidate and break the final B=1 "
                    "evaluation).")
        else:
            if np.ndim(inputs) != 2:
                raise ValueError(
                    f"fit_es expects shared (T, m) inputs; got {np.shape(inputs)}")
            if not (isinstance(inputs, jnp.ndarray) and inputs.dtype == self.dtype):
                # stage the shared drive ONCE; run_batch passes device arrays
                # through and vmaps them with in_axes=None (no (B, T, m) copy
                # or per-generation re-transfer)
                inputs = jnp.asarray(np.asarray(inputs), dtype=self.dtype)
        rec_output = objective_key == "out"
        es_losses = self._make_es_losses(loss_fn, registry_loss)
        obs = Observer(dt=self.dt, record_output=False, record_loss=False)
        t0 = perf_counter()

        half = B // 2
        best_ever = (np.inf, None)
        mean_hist, best_hist, sigma_hist = [], [], []
        sig = float(sigma)
        for gen in range(int(n_generations)):
            eps = {}
            cands = {}
            for key, val in theta.items():
                if antithetic:
                    e = rng.standard_normal((half,) + val.shape)
                    e = np.concatenate([e, -e], axis=0)
                else:
                    e = rng.standard_normal((B,) + val.shape)
                eps[key] = e
                cands[key] = clip(key, val[None] + sig * e)
            results = self.run_batch(inputs, sampling_steps=sampling_steps,
                                     cutoff=cutoff, batch_vars=cands,
                                     record_spikes=record_spikes, mesh=mesh,
                                     record_output=rec_output, verbose=False)
            if gen == 0 and objective_key not in results:
                raise KeyError(
                    f"objective_key {objective_key!r} is not a recorded series "
                    f"(available: "
                    f"{sorted(repr(k) for k in results if k != 'steps')}); "
                    "spike objectives need record_spikes=[node] and "
                    "objective_key=(node, 'spikes').")
            out = np.asarray(results[objective_key])  # (B, R, ...)
            if gen == 0 and targets.shape not in ((out.shape[1],),
                                                  out.shape[1:]):
                try:
                    np.broadcast_shapes(targets.shape, out.shape[1:])
                except ValueError:
                    raise ValueError(
                        f"targets of shape {targets.shape} do not broadcast "
                        f"against the recorded output {out.shape[1:]} "
                        f"(records x n_out).")
            losses = es_losses(out, targets)
            finite = np.isfinite(losses)
            if not finite.any():
                # a whole diverged generation (stiff model + large sigma):
                # skip the update instead of crashing -- progress and the
                # best-ever candidate survive
                mean_hist.append(float("nan"))
                best_hist.append(float("nan"))
                sigma_hist.append(sig)
                sig *= float(sigma_decay)
                if verbose:
                    print(f"ES generation {gen}: all {B} candidates "
                          "non-finite; update skipped")
                continue
            gen_best = int(np.argmin(np.where(finite, losses, np.inf)))
            if losses[gen_best] < best_ever[0]:
                best_ever = (float(losses[gen_best]),
                             {k: np.array(c[gen_best]) for k, c in cands.items()})
            scores = np.where(finite, -losses, -np.inf)
            if rank_shaping:
                order = np.argsort(np.argsort(scores))  # rank 0 = worst
                u = order / (B - 1) - 0.5
            else:
                s_f = scores[finite]
                std = s_f.std() + 1e-12
                u = np.where(finite, (scores - s_f.mean()) / std, 0.0)
                u = np.where(np.isfinite(u), u, 0.0)
            for key in theta:
                g = np.tensordot(u, eps[key], axes=(0, 0)) / (B * sig)
                theta[key] = clip(key, theta[key] + lr * g)
            mean_hist.append(float(np.nanmean(np.where(finite, losses, np.nan))))
            best_hist.append(float(losses[gen_best]))
            sigma_hist.append(sig)
            sig *= float(sigma_decay)
            if verbose and (gen % max(1, n_generations // 10) == 0
                            or gen == n_generations - 1):
                print(f"ES generation {gen}: best {best_hist[-1]:.6g}, "
                      f"mean {mean_hist[-1]:.6g}, sigma {sig:.4g}")

        # score the final search point itself (one more B=1 sweep; the
        # network state must stay untouched, so no plain run() here)
        final_cand = {k: np.asarray(v)[None] for k, v in theta.items()}
        res_f = self.run_batch(inputs, sampling_steps=sampling_steps,
                               cutoff=cutoff, batch_vars=final_cand,
                               record_spikes=record_spikes,
                               record_output=rec_output, verbose=False)
        search_loss = float(es_losses(np.asarray(res_f[objective_key]),
                                      targets)[0])
        # write back whichever point actually scored best: the search point
        # random-walks near the optimum (the 1/sigma estimator grows as
        # sigma decays), while the best evaluated candidate is a certainty
        if best_ever[1] is not None and best_ever[0] < search_loss:
            fitted, final_loss, returned = best_ever[1], best_ever[0], "best_candidate"
        else:
            fitted, final_loss, returned = theta, search_loss, "search_point"
        for key, val in fitted.items():
            set_fit_var(key, val)
        obs.save("es_returned", returned)
        obs.save("es_search_point_loss", search_loss)
        obs.save("generations", np.arange(len(mean_hist)))
        obs.save("es_mean_loss", np.asarray(mean_hist))
        obs.save("es_best_loss", np.asarray(best_hist))
        obs.save("es_sigma", np.asarray(sigma_hist))
        obs.save("es_best_ever_loss", best_ever[0])
        obs.save("es_best_candidate", best_ever[1])
        obs.save("es_final_loss", final_loss)
        if verbose:
            print(f"Finished evolution-strategies optimization after "
                  f"{perf_counter() - t0} s.")
        return obs

    def _build_batch_programs(self, step, loss_fn, opt, fused_bptt, rk,
                              remat_steps, sampling_steps, n_mb, mb,
                              shuffled, accum=1):
        """Jitted batched-trial training programs for
        :meth:`fit_bptt_batch`: ``(fit_single, fit_chunk, pack)``.  Each
        update takes the mean loss over ``mb`` trials by vmapping the
        per-trial trajectory loss (per-step coupling matvecs batch into
        ``(mb, N) x (N, N)`` MXU matmuls); ``fit_single`` scans the
        ``n_mb`` minibatches of one epoch in one dispatch, ``fit_chunk``
        scans ``_EPOCH_SCAN_CHUNK`` whole epochs (with their trial
        permutations) in one.  ``shuffled``/``n_mb``/``mb`` are baked
        (covered by the fit_bptt_batch cache key).

        ``accum > 1``: micro-batch gradient ACCUMULATION -- each update's
        gradient is computed as the mean over ``accum`` sequential
        micro-batches of ``mb/accum`` trials (an inner scan whose carry is
        one trainables-sized gradient sum), so the per-update residual
        memory is that of ``mb/accum`` trials while loss and gradients
        equal the full-minibatch update exactly (mean-of-equal-means;
        regression-pinned).  This is the one-chip escape hatch when B
        trials OOM (round-4: B=8 at N=100k) and no 'data' mesh axis is
        available."""
        epoch_loss, pack, _ = self._build_epoch_loss(
            step, loss_fn, fused_bptt, rk, remat_steps, sampling_steps)

        def merged(frozen, f):
            """Frozen pytree with the per-trial overrides ``f`` (flat
            ``{(kind, label, key): leaf}``, already sliced to ONE trial under
            the vmap) spliced in.  Dict surgery at trace time only."""
            if not f:
                return frozen
            fz = {k: {lb: dict(s) for lb, s in d.items()}
                  for k, d in frozen.items()}
            for (kind, label, key), v in f.items():
                fz[kind][label][key] = v
            return fz

        def batch_loss(train, frozen, fb, y0p, inp, tgt):
            per_trial = jax.vmap(
                lambda f, i, t: epoch_loss(train, merged(frozen, f), y0p, i, t))
            return jnp.mean(per_trial(fb, inp, tgt))

        def _epoch(train, opt_state, frozen, fb, y0p, inp, tgt, perm):
            if shuffled:
                inp = jnp.take(inp, perm, axis=0)
                tgt = jnp.take(tgt, perm, axis=0)
                fb = {k: jnp.take(v, perm, axis=0) for k, v in fb.items()}
            inp = inp.reshape((n_mb, mb) + inp.shape[1:])
            tgt = tgt.reshape((n_mb, mb) + tgt.shape[1:])
            fb = {k: v.reshape((n_mb, mb) + v.shape[1:]) for k, v in fb.items()}

            def body(carry, it):
                tr, os_ = carry
                i_mb, t_mb, f_mb = it
                if accum > 1:
                    # micro-batch accumulation: mean loss/grads over `accum`
                    # sequential chunks of mb/accum trials == the full-mb
                    # update exactly (equal-size chunks); residual memory is
                    # bounded by ONE chunk's trajectories
                    mba = mb // accum
                    i_a = i_mb.reshape((accum, mba) + i_mb.shape[1:])
                    t_a = t_mb.reshape((accum, mba) + t_mb.shape[1:])
                    f_a = {k: v.reshape((accum, mba) + v.shape[1:])
                           for k, v in f_mb.items()}

                    def acc_body(g_carry, a_it):
                        gsum, lsum = g_carry
                        i_c, t_c, f_c = a_it
                        lv, g = jax.value_and_grad(batch_loss)(
                            tr, frozen, f_c, y0p, i_c, t_c)
                        return (jax.tree.map(jnp.add, gsum, g), lsum + lv), None

                    zero = jax.tree.map(jnp.zeros_like, tr)
                    (gsum, lsum), _ = jax.lax.scan(
                        acc_body, (zero, jnp.zeros(())), (i_a, t_a, f_a))
                    grads = jax.tree.map(lambda g: g / accum, gsum)
                    lval = lsum / accum
                else:
                    lval, grads = jax.value_and_grad(batch_loss)(
                        tr, frozen, f_mb, y0p, i_mb, t_mb)
                updates, os_ = opt.update(grads, os_, tr)
                return (optax.apply_updates(tr, updates), os_), lval

            (train, opt_state), lvals = jax.lax.scan(
                body, (train, opt_state), (inp, tgt, fb))
            return train, opt_state, lvals

        @jax.jit
        def fit_single(train, frozen, fb, opt_state, y0p, inp, tgt, perm):
            return _epoch(train, opt_state, frozen, fb, y0p, inp, tgt, perm)

        @jax.jit
        def fit_chunk(train, frozen, fb, opt_state, y0p, inp, tgt, perms):
            def ep(carry, perm):
                tr, os_ = carry
                tr, os_, lvals = _epoch(tr, os_, frozen, fb, y0p, inp, tgt, perm)
                return (tr, os_), lvals

            (train, opt_state), lvals = jax.lax.scan(
                ep, (train, opt_state), perms)
            return train, opt_state, lvals

        # multi-start (fit_bptt_multistart): the SAME epoch body vmapped
        # over a leading model axis on (train, opt_state) -- M independent
        # optimizations advance in lockstep, sharing the staged data (incl.
        # any per-trial frozen overrides)
        vep = jax.vmap(_epoch,
                       in_axes=(0, 0, None, None, None, None, None, None))

        @jax.jit
        def fit_single_ms(train, frozen, fb, opt_state, y0p, inp, tgt, perm):
            return vep(train, opt_state, frozen, fb, y0p, inp, tgt, perm)

        @jax.jit
        def fit_chunk_ms(train, frozen, fb, opt_state, y0p, inp, tgt, perms):
            def ep(carry, perm):
                tr, os_ = carry
                tr, os_, lvals = vep(tr, os_, frozen, fb, y0p, inp, tgt, perm)
                return (tr, os_), lvals

            (train, opt_state), lvals = jax.lax.scan(
                ep, (train, opt_state), perms)
            return train, opt_state, lvals  # (C, M, n_mb)

        return fit_single, fit_chunk, pack, fit_single_ms, fit_chunk_ms

    def _chain_decompose(self):
        """Decompose a chain network ``[instants...] -> diffeq -> [instants...]``
        (stateless Linear/LinearMasked edges only) into
        ``(label, apply_prefix, apply_suffix)``; None when the topology
        doesn't qualify.

        The pre/post stages are time-invariant and stateless, so for training
        they move OUTSIDE the scan entirely: the input projection becomes one
        (T, m) x (m, n) matmul before the trajectory and the readout one
        (T, n) x (n, k) after it -- their weight gradients then come from
        those single matmuls instead of per-step scan accumulation, and the
        population itself trains through the deferred-gradient trajectory.
        """
        order = self._compiled["order"]
        diffeq = [n for n in order if self[n].get("node_type") == "diff_eq"]
        if len(diffeq) != 1 or self._fb_edge_list():
            return None
        label = diffeq[0]
        for i, nname in enumerate(order):
            preds = sorted(self.graph.predecessors(nname))
            if preds != ([] if i == 0 else [order[i - 1]]):
                return None  # not a simple chain
            if nname != label and not isinstance(self.get_node(nname), InstantNode):
                return None
        # ops in chain order: each instant node's step, then its outgoing edge
        pre_ops, post_ops = [], []
        side_ops = pre_ops
        for i, nname in enumerate(order):
            if nname == label:
                side_ops = post_ops
            else:
                side_ops.append(("node", None, self.get_node(nname).make_step()))
            if i + 1 < len(order):
                edge = self.get_edge(nname, order[i + 1])
                if edge.init_state() is not None:
                    return None  # stateful edge (delay/filter): no fast path
                side_ops.append(("edge", _ekey(nname, order[i + 1]), edge.make_step()))

        def apply(ops, params, H):
            for kind, key, fn in ops:
                p = params["edges"][key] if kind == "edge" else {}
                H = jax.vmap(lambda h, p=p, fn=fn: fn(None, p, h)[1])(H)
            return H

        def apply_prefix(params, xs):
            return apply(pre_ops, params, xs)

        def apply_suffix(params, outs):
            return apply(post_ops, params, outs)

        return label, apply_prefix, apply_suffix

    def _build_epoch_loss(self, step, loss_fn, fused_bptt, rk, remat_steps,
                          sampling_steps):
        """Build the per-trajectory loss ``epoch_loss(train, frozen, y0p,
        inp, tgt)`` and its initial-state packer ``pack(state0)``; shared by
        the epoch-mode programs (:meth:`_build_epoch_programs`) and the
        batched-trial programs (:meth:`_build_batch_programs`).  Returns
        ``(epoch_loss, pack, chain_ctx)`` where ``chain_ctx`` (a dict, or
        None off the chain-trajectory path) carries what the fused-adam
        specialization needs.  Deferred-gradient fast paths: chain networks
        train through the single-population custom-VJP trajectory
        (ops/bptt.py, preferred -- pre/post stages hoist OUT of the scan
        entirely); general DAGs of populations fall through to the
        multi-stage graph trajectory (ops/graph_bptt.py); everything else
        uses plain autodiff."""
        combine = self._combine
        order = self._compiled["order"]
        traj = None
        gtraj = None
        if fused_bptt in ("auto", True):
            # the single-node shortcut must still exclude feedback edges --
            # the chain trajectory is fb-unaware, and silently dropping a
            # feedback self-edge from the trained forward was a real bug
            # (zero fb gradient, wrong loss; regression-tested)
            chain = ((order[0], None, None)
                     if len(order) == 1 and not self._fb_edge_list()
                     else self._chain_decompose())
            if chain is not None:
                label, apply_prefix, apply_suffix = chain
                try:
                    from .ops.bptt import make_coupled_traj

                    traj, traj_wkeys = make_coupled_traj(self.get_node(label),
                                                         remat_steps=rk)
                except (ValueError, AttributeError, KeyError):
                    traj = None
            if traj is None:
                try:
                    from .ops.graph_bptt import make_graph_traj

                    gtraj, gspec = make_graph_traj(self, remat_steps=rk)
                except (ValueError, AttributeError, KeyError):
                    if fused_bptt is True:
                        raise
                    gtraj = None

        def _downsample(outs):
            if sampling_steps > 1:
                T = outs.shape[0]
                n_keep = T // sampling_steps
                outs = outs[: n_keep * sampling_steps]
                outs = outs.reshape(n_keep, sampling_steps, -1).mean(axis=1)
            return outs

        chain_ctx = None
        if traj is not None:
            def pack(state0, label=label):
                return state0["nodes"][label]

            chain_ctx = {"label": label, "wkeys": traj_wkeys,
                         "apply_prefix": apply_prefix,
                         "apply_suffix": apply_suffix,
                         "downsample": _downsample}

            def epoch_loss(train, frozen, y0, inp, tgt):
                params = combine(train, frozen)
                nargs = params["nodes"][label]
                W = {k: nargs[k] for k in traj_wkeys}
                rest = {k: v for k, v in nargs.items() if k not in traj_wkeys}
                xs = apply_prefix(params, inp) if apply_prefix is not None else inp
                _, outs = traj(W, rest, y0, xs)
                if apply_suffix is not None:
                    outs = apply_suffix(params, outs)
                return loss_fn(_downsample(outs), tgt)
        elif gtraj is not None:
            def pack(state0, gspec=gspec):
                Y0 = {lbl: state0["nodes"][lbl] for lbl in gspec.pop_labels}
                if gspec.needs_carry:  # feedback outputs / edge buffers carried
                    Y0 = {"Y": Y0, "fb": state0.get("fb", {}),
                          "E": {ek: gspec.estate_pack[ek](state0["edges"][ek])
                                for ek in gspec.stateful_edges}}
                return Y0

            def epoch_loss(train, frozen, Y0, inp, tgt):
                weights, args = _graph_weights_args(gspec, combine(train, frozen))
                _, outs = gtraj(weights, args, Y0, inp)
                return loss_fn(_downsample(outs), tgt)
        else:
            def pack(state0):
                return state0

            def epoch_loss(train, frozen, state0, inp, tgt):
                # hoist gradient-neutral edge selectors (delay-matrix
                # one-hots) out of the differentiated scan; node prep must
                # NOT run here (int8 masters need per-step custom VJP)
                params = self._prep_edge_params(combine(train, frozen))

                def body(state, x_t):
                    state, out, _ = step(state, params, x_t)
                    return state, out

                if remat_steps > 1 and inp.shape[0] % remat_steps == 0:
                    # gradient checkpointing: rematerialize each segment's
                    # forward pass in the backward sweep instead of storing
                    # every step
                    n_seg = inp.shape[0] // remat_steps

                    @jax.checkpoint
                    def segment(state, inp_seg):
                        return jax.lax.scan(body, state, inp_seg)

                    _, outs = jax.lax.scan(segment, state0,
                                           inp.reshape(n_seg, remat_steps, -1))
                    outs = outs.reshape(inp.shape[0], -1)
                else:
                    _, outs = jax.lax.scan(body, state0, inp)
                return loss_fn(_downsample(outs), tgt)

        return epoch_loss, pack, chain_ctx

    def _build_epoch_programs(self, step, loss_fn, opt, fused_bptt, rk,
                              remat_steps, sampling_steps, fused_opt_cfg=None,
                              train_paths=()):
        """Build the jitted epoch-mode training programs:
        ``(update, update_chunk, pack, init_opt)`` where ``pack(state0)``
        extracts the initial-state argument the programs expect and
        ``init_opt`` (or None) converts the optax opt_state into the fused
        optimizer carry.  Loss/trajectory construction lives in
        :meth:`_build_epoch_loss`.

        ``fused_opt_cfg`` (a ``{'b1','b2','eps'}`` dict when the fit uses
        plain adam, else None) enables the fused adam + requantize tail for
        a trained single dense int8_master coupling: the adam update and the
        next epoch's row quantization run as ONE pass over the (N, N)
        arrays (ops/fused_opt.py), and the produced ``(wq, scale)`` rides
        the optimizer-state carry into the next epoch's trajectory -- the
        per-epoch `quantize_rows` prep disappears from the epoch program.
        Update sequence is bit-compatible with the unfused path (same
        master -> same quantization; adam formulas mirror optax.adam)."""
        epoch_loss, pack, chain_ctx = self._build_epoch_loss(
            step, loss_fn, fused_bptt, rk, remat_steps, sampling_steps)
        if chain_ctx is not None:
            fused = self._build_fused_adam_programs(
                chain_ctx["label"], chain_ctx["wkeys"],
                chain_ctx["apply_prefix"], chain_ctx["apply_suffix"], loss_fn,
                chain_ctx["downsample"], pack, fused_opt_cfg, rk, train_paths)
            if fused is not None:
                return fused

        @jax.jit
        def update(train, frozen, opt_state, y0p, inp, tgt):
            lval, grads = jax.value_and_grad(epoch_loss)(train, frozen, y0p, inp, tgt)
            updates, opt_state = opt.update(grads, opt_state, train)
            return optax.apply_updates(train, updates), opt_state, lval

        # multi-epoch on-device scan over the SAME staged (inp, tgt) pair:
        # a whole chunk of epochs is one dispatch, removing the per-epoch
        # host round-trip (~60 ms/epoch over a tunneled chip).  The chunk
        # size is FIXED so at most two programs ever compile (the chunk scan
        # and the single update), whatever the epoch count.  Update sequence
        # is identical to the per-epoch loop (regression-tested).
        C = _EPOCH_SCAN_CHUNK

        @jax.jit
        def update_chunk(train, frozen, opt_state, y0p, inp, tgt):
            def body(carry, _):
                tr, os_ = carry
                lval, grads = jax.value_and_grad(epoch_loss)(tr, frozen, y0p,
                                                             inp, tgt)
                updates, os_ = opt.update(grads, os_, tr)
                return (optax.apply_updates(tr, updates), os_), lval

            (train, opt_state), lvals = jax.lax.scan(
                body, (train, opt_state), None, length=C)
            return train, opt_state, lvals

        return update, update_chunk, pack, None

    def _build_fused_adam_programs(self, label, traj_wkeys, apply_prefix,
                                   apply_suffix, loss_fn, _downsample, pack,
                                   fused_opt_cfg, rk, train_paths):
        """The fused adam + requantize epoch programs (see
        _build_epoch_programs docstring), or None when ineligible.
        Eligibility: plain-adam fit (``fused_opt_cfg`` given), no remat, a
        single dense 2-D int8_master coupling that IS trained, Euler chain.
        The ``(wq, scale)`` quantization pair rides INSIDE the optimizer
        state ``(count, mu, nu, lr, wp)`` so the caller's threading of
        ``opt_state`` through update calls needs no changes."""
        if fused_opt_cfg is None or rk != 0 or len(traj_wkeys) != 1:
            return None
        wkey = traj_wkeys[0]
        wpath = f"nodes/{label}/{wkey}"
        if wpath not in train_paths:
            return None  # frozen coupling: nothing for adam to requantize
        node = self.get_node(label)
        vf = getattr(node, "_vf", None)
        if (vf is None or vf.coupling_cast != "int8"
                or node._args[wkey].ndim != 2):
            return None
        try:
            from .ops.bptt import make_coupled_traj_prepped

            traj_p, _, preps = make_coupled_traj_prepped(node)
        except ValueError:
            return None
        from .ops.fused_opt import adam_requant

        prep_w = preps[0]
        combine = self._combine
        b1 = float(fused_opt_cfg.get("b1", 0.9))
        b2 = float(fused_opt_cfg.get("b2", 0.999))
        eps = float(fused_opt_cfg.get("eps", 1e-8))
        mode = fused_opt_cfg.get("mode", "auto")

        def epoch_loss_p(train, frozen, wp, y0, inp, tgt):
            params = combine(train, frozen)
            nargs = params["nodes"][label]
            W = {wkey: nargs[wkey]}
            rest = {k: v for k, v in nargs.items() if k not in traj_wkeys}
            xs = apply_prefix(params, inp) if apply_prefix is not None else inp
            _, outs = traj_p((wp,), W, rest, y0, xs)
            if apply_suffix is not None:
                outs = apply_suffix(params, outs)
            return loss_fn(_downsample(outs), tgt)

        def _set_in(tree, path, val):
            if not path:
                return val
            out = dict(tree)
            out[path[0]] = _set_in(tree[path[0]], path[1:], val)
            return out

        leaf_path = ("nodes", label, wkey)

        def apply_f(grads, osf, train):
            count, mu0, nu0, lr, _wp = osf
            count = count + 1
            cf = count.astype(jnp.float32)
            bc1 = 1.0 - b1 ** cf
            bc2 = 1.0 - b2 ** cf
            # the coupling leaf: one fused pass producing next epoch's
            # quantization alongside the update (Pallas on TPU)
            Wm = train["nodes"][label][wkey]
            gW = grads["nodes"][label][wkey]
            mW = mu0["nodes"][label][wkey]
            nW = nu0["nodes"][label][wkey]
            W2, m2, n2, wq, scale = adam_requant(
                Wm, mW, nW, gW, bc1, bc2, lr, b1=b1, b2=b2, eps=eps, mode=mode)
            # every non-coupling leaf: exact optax.adam formulas (the
            # coupling leaf's duplicate here is dead code XLA eliminates,
            # overridden just below)
            mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, mu0, grads)
            nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * (g * g),
                              nu0, grads)
            train = jax.tree.map(
                lambda w, m, v: w - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
                train, mu, nu)
            train = _set_in(train, leaf_path, W2)
            mu = _set_in(mu, leaf_path, m2)
            nu = _set_in(nu, leaf_path, n2)
            return train, (count, mu, nu, lr, (wq, scale))

        @jax.jit
        def update(train, frozen, osf, y0p, inp, tgt):
            lval, grads = jax.value_and_grad(epoch_loss_p)(
                train, frozen, osf[4], y0p, inp, tgt)
            train, osf = apply_f(grads, osf, train)
            return train, osf, lval

        C = _EPOCH_SCAN_CHUNK

        @jax.jit
        def update_chunk(train, frozen, osf, y0p, inp, tgt):
            def body(carry, _):
                tr, os_ = carry
                lval, grads = jax.value_and_grad(epoch_loss_p)(
                    tr, frozen, os_[4], y0p, inp, tgt)
                tr, os_ = apply_f(grads, os_, tr)
                return (tr, os_), lval

            (train, osf), lvals = jax.lax.scan(
                body, (train, osf), None, length=C)
            return train, osf, lvals

        @jax.jit
        def init_opt(train, opt_state):
            # lr from the optax inject_hyperparams state (a traced VALUE, so
            # lr sweeps keep reusing these programs); fresh adam moments;
            # the initial quantization pair from the current master
            lr = jnp.asarray(opt_state.hyperparams["learning_rate"])
            mu = jax.tree.map(jnp.zeros_like, train)
            nu = jax.tree.map(jnp.zeros_like, train)
            wp = prep_w(train["nodes"][label][wkey])
            return (jnp.zeros((), jnp.int32), mu, nu, lr, wp)

        return update, update_chunk, pack, init_opt

    def _bptt_epochs(self, step, loss_fn, opt, train, frozen, opt_state, state0,
                     inputs, targets, sampling_steps, verbose, remat_steps: int = 0,
                     fused_bptt="auto", mesh=None, prog_key=None,
                     fused_opt_cfg=None):

        # a remat request composes with the CHAIN trajectory (chunked
        # checkpointing inside the custom VJP, Euler only, T % K == 0);
        # other topologies honor the memory request via the plain
        # (jax.checkpoint) path under 'auto'
        T0 = int(np.asarray(inputs[0]).shape[0]) if len(inputs) else 0
        rk = remat_steps if (remat_steps > 1 and T0 and T0 % remat_steps == 0) else 0
        if remat_steps > 1 and rk == 0 and fused_bptt == "auto":
            fused_bptt = False  # non-divisible T: plain path handles remat

        # the jitted update programs (and the trajectory builds they capture)
        # are CACHED across fit_bptt calls: rebuilding a fresh jax.jit closure
        # per fit forces a full host-side retrace+lowering of the T-step scan
        # every call (~0.5-1 s at N=10k -- measured 141 -> ~95 ms/epoch once
        # cached).  Everything value-like (trainable/frozen params, initial
        # state) is an ARGUMENT of the cached programs, never a closure
        # constant; the key covers everything baked into the closures.
        # the fused adam + requant path needs the trained-leaf structure
        # (which leaves adam updates) and is built only for unsharded fits
        from jax.tree_util import tree_flatten_with_path

        train_paths = tuple(sorted(
            "/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in tree_flatten_with_path(train)[0]))
        if mesh is not None:
            fused_opt_cfg = None  # GSPMD path: keep the pure-optax programs
        cache_key = None
        if prog_key is not None:
            fused_key = (None if fused_opt_cfg is None
                         else tuple(sorted(fused_opt_cfg.items())))
            cache_key = ("bptt_epochs", prog_key, T0, sampling_steps, rk,
                         str(fused_bptt), remat_steps, self._step_versions(),
                         fused_key, train_paths)
        built = self._step_cache.get(cache_key) if cache_key is not None else None
        if built is None:
            built = self._build_epoch_programs(step, loss_fn, opt, fused_bptt,
                                               rk, remat_steps, sampling_steps,
                                               fused_opt_cfg=fused_opt_cfg,
                                               train_paths=train_paths)
            if cache_key is not None:
                self._step_cache[cache_key] = built
        update, update_chunk, pack, init_opt = built
        if init_opt is not None and hasattr(opt_state, "hyperparams"):
            # fused carry (count, mu, nu, lr, (wq, scale)) replaces the optax
            # state; the initial quantization pair preps ONCE per fit here.
            # An opt_state WITHOUT .hyperparams is already a fused carry from
            # a previous _bptt_epochs call (the recording-parity path splits
            # one fit into two calls) -- pass it through untouched.
            opt_state = init_opt(train, opt_state)
        y0p = pack(state0)
        C = _EPOCH_SCAN_CHUNK

        losses = []
        n_epochs = len(inputs)
        # de-duplicate epoch arrays by identity: repeated-epoch training
        # ([inp]*K, the common workload shape) must transfer host->device
        # ONCE, not per epoch -- on a tunneled device the 2x20 MB per-epoch
        # transfer at N=10k costs ~1.7 s/epoch, 5x the actual compute.
        # Arrays that are ALREADY on device with the right dtype are used
        # as-is (jax arrays are immutable, so no defensive copy is needed):
        # pre-staging inputs as jnp arrays lets repeated fits skip the
        # host->device transfer entirely (~60 ms/epoch at n_ep=16 over the
        # tunnel).  Host numpy arrays still re-stage per fit by design --
        # they are mutable.
        # the cache entry holds (source object, staged array): keeping the
        # source alive is LOAD-BEARING -- id() of a temporary view (e.g.
        # inputs[epoch] of a 3D array) is only unique while the view lives,
        # and CPython reuses freed addresses (observed: a target view
        # aliasing the previously staged input -> silently corrupt training)
        dev_cache: Dict[int, tuple] = {}

        def stage(x):
            key = id(x)
            hit = dev_cache.get(key)
            if hit is None:
                if isinstance(x, jnp.ndarray) and x.dtype == self.dtype:
                    arr = x
                else:
                    arr = jnp.asarray(np.asarray(x), dtype=self.dtype)
                hit = (x, self._mesh_replicate(arr, mesh) if mesh is not None
                       else jax.device_put(arr))
                dev_cache[key] = hit
            return hit[1]

        if not verbose:
            # group consecutive epochs sharing the same staged arrays and run
            # each maximal run as one on-device scan
            runs: List[list] = []
            for epoch in range(n_epochs):
                inp, tgt = stage(inputs[epoch]), stage(targets[epoch])
                if runs and runs[-1][0] is inp and runs[-1][1] is tgt:
                    runs[-1][2] += 1
                else:
                    runs.append([inp, tgt, 1])
            loss_parts = []
            for inp, tgt, k in runs:
                while k >= C:
                    train, opt_state, lvals = update_chunk(train, frozen, opt_state,
                                                           y0p, inp, tgt)
                    loss_parts.append(lvals)
                    k -= C
                for _ in range(k):
                    train, opt_state, lval = update(train, frozen, opt_state,
                                                    y0p, inp, tgt)
                    loss_parts.append(lval[None] if jnp.ndim(lval) == 0 else lval)
            if loss_parts:
                losses = [float(x) for x in np.asarray(jnp.concatenate(loss_parts))]
            return train, opt_state, losses

        for epoch in range(n_epochs):
            inp = stage(inputs[epoch])
            tgt = stage(targets[epoch])
            train, opt_state, lval = update(train, frozen, opt_state, y0p, inp, tgt)
            # keep losses on device: a per-epoch float() blocks the dispatch
            # pipeline on a device round-trip (~170 ms/epoch over a tunneled
            # chip -- 35% of the epoch at N=10k); fetch once after the loop
            losses.append(lval)
            if verbose:
                print(f"Progress: {epoch + 1}/{n_epochs} training epochs finished.")
                print(f"Epoch loss: {float(lval)}.")
                print("")
        if losses:
            losses = [float(x) for x in np.asarray(jnp.stack(losses))]
        return train, opt_state, losses

    def _bptt_steps(self, step, loss_fn, opt, train, frozen, opt_state, state0,
                    inputs, targets, update_steps, sampling_steps, obs=None,
                    fused_bptt="auto", prog_key=None):
        combine = self._combine
        T = int(inputs.shape[0])
        u = int(update_steps)
        n_upd = T // u
        n_out = self.n_out
        rec_info = self._resolve_record_vars(obs) if obs is not None else []

        # deferred-gradient fast path for truncated BPTT: each update chunk
        # is a T=update_steps trajectory, so chain networks route it through
        # the custom-VJP trajectory (ops/bptt.py) exactly like epoch mode --
        # unless per-step variable recording is requested (the trajectory
        # only emits outputs)
        def _build_chunk_loss():
            traj_fast = None
            gtraj_fast = None
            order = self._compiled["order"]
            if not rec_info and fused_bptt in ("auto", True):
                chain = ((order[0], None, None)
                         if len(order) == 1 and not self._fb_edge_list()
                         else self._chain_decompose())
                if chain is not None:
                    f_label, f_prefix, f_suffix = chain
                    try:
                        from .ops.bptt import make_coupled_traj

                        traj_fast, traj_fast_wkeys = make_coupled_traj(self.get_node(f_label))
                    except (ValueError, AttributeError, KeyError):
                        traj_fast = None
                if traj_fast is None:
                    try:
                        from .ops.graph_bptt import make_graph_traj

                        gtraj_fast, gspec_fast = make_graph_traj(self)
                    except (ValueError, AttributeError, KeyError):
                        if fused_bptt is True:
                            raise
                        gtraj_fast = None

            if traj_fast is not None:
                def chunk_loss(train, frozen, state, inp_c, tgt_c):
                    params = combine(train, frozen)
                    nargs = params["nodes"][f_label]
                    W = {k: nargs[k] for k in traj_fast_wkeys}
                    rest = {k: v for k, v in nargs.items() if k not in traj_fast_wkeys}
                    xs = f_prefix(params, inp_c) if f_prefix is not None else inp_c
                    yT, outs = traj_fast(W, rest, state["nodes"][f_label], xs)
                    if f_suffix is not None:
                        outs = f_suffix(params, outs)
                    new_state = {"nodes": {**state["nodes"], f_label: yT},
                                 "edges": state["edges"]}
                    return loss_fn(outs, tgt_c), (new_state, outs, ())
            elif gtraj_fast is not None:
                def chunk_loss(train, frozen, state, inp_c, tgt_c):
                    weights, args = _graph_weights_args(gspec_fast,
                                                        combine(train, frozen))
                    Y = {lbl: state["nodes"][lbl] for lbl in gspec_fast.pop_labels}
                    if gspec_fast.needs_carry:
                        C0 = {"Y": Y, "fb": state.get("fb", {}),
                              "E": {ek: gspec_fast.estate_pack[ek](
                                  state["edges"][ek])
                                    for ek in gspec_fast.stateful_edges}}
                        CT, outs = gtraj_fast(weights, args, C0, inp_c)
                        new_E = {ek: gspec_fast.estate_unpack[ek](
                            CT["E"][ek], state["edges"][ek], inp_c.shape[0])
                            for ek in gspec_fast.stateful_edges}
                        new_state = {"nodes": {**state["nodes"], **CT["Y"]},
                                     "edges": {**state["edges"], **new_E}}
                        if "fb" in state:
                            new_state["fb"] = CT["fb"]
                    else:
                        YT, outs = gtraj_fast(weights, args, Y, inp_c)
                        new_state = {"nodes": {**state["nodes"], **YT},
                                     "edges": state["edges"]}
                    return loss_fn(outs, tgt_c), (new_state, outs, ())
            else:
                def chunk_loss(train, frozen, state, inp_c, tgt_c):
                    # hoist gradient-neutral edge selectors out of the
                    # differentiated chunk scan (same as the epoch path)
                    params = self._prep_edge_params(combine(train, frozen))

                    def body(state, x_t):
                        state, out, _ = step(state, params, x_t)
                        vals = tuple(
                            (jnp.mean(reader(state["nodes"][label], params["nodes"][label]))
                             if reduce else reader(state["nodes"][label], params["nodes"][label]))
                            for (_, label, reader, reduce) in rec_info)
                        return state, (out, vals)

                    state, (preds, vals) = jax.lax.scan(body, state, inp_c)
                    return loss_fn(preds, tgt_c), (state, preds, vals)
            return chunk_loss

        def _fwd_body(params):
            def body(state, x_t):
                state, out, _ = step(state, params, x_t)
                vals = tuple(
                    (jnp.mean(reader(state["nodes"][label], params["nodes"][label]))
                     if reduce else reader(state["nodes"][label], params["nodes"][label]))
                    for (_, label, reader, reduce) in rec_info)
                return state, (out, vals)

            return body

        if n_upd == 0:
            # fewer steps than one update chunk: forward-only (the reference
            # also never updates before `update_steps` steps have elapsed),
            # but outputs are still recorded on the global sampling grid with
            # zero loss (reference network.py:1042-1047: error stays 0.0)
            params = self._prep_edge_params(combine(train, frozen))
            stateT, (outs, vals) = jax.lax.scan(_fwd_body(params), state0, inputs)
            keep = np.arange(0, T, sampling_steps)
            var_values = {key: np.asarray(vals[i])[keep]
                          for i, (key, _, _, _) in enumerate(rec_info)}
            return train, stateT, {"steps": keep, "out": np.asarray(outs)[keep],
                                   "loss": np.zeros(len(keep)), "vars": var_values}

        # recording follows the reference's GLOBAL grid `step % sampling_steps
        # == 0` (network.py:1044-1047).  When sampling_steps divides
        # update_steps the per-chunk local grid coincides with the global one
        # and records can be subsampled inside the scan (less HBM + transfer);
        # otherwise the scan emits every step and the grid is applied on host.
        s = int(sampling_steps)
        emit_sub = (u % s == 0)

        # the jitted program is cached across fit calls (inputs/targets and
        # all params/state are ARGUMENTS): repeated step-mode fits with fresh
        # same-shape data -- the RL-style workload -- skip the host retrace
        cache_key = None
        if prog_key is not None:
            cache_key = ("bptt_steps", prog_key, T, u, s, n_out, str(fused_bptt),
                         tuple((key, reduce) for (key, _, _, reduce) in rec_info),
                         self._step_versions())
        train_all = self._step_cache.get(cache_key) if cache_key is not None else None
        if train_all is None:
            chunk_loss = _build_chunk_loss()

            @jax.jit
            def train_all(train, frozen, opt_state, state, inputs, targets):
                inp_chunks = inputs[: n_upd * u].reshape(n_upd, u, -1)
                tgt_chunks = targets[: n_upd * u].reshape(n_upd, u, -1)

                def chunk(carry, xt):
                    train, opt_state, state = carry
                    inp_c, tgt_c = xt
                    (lval, (state, preds, vals)), grads = jax.value_and_grad(
                        chunk_loss, has_aux=True)(train, frozen, state, inp_c, tgt_c)
                    updates, opt_state = opt.update(grads, opt_state, train)
                    train = optax.apply_updates(train, updates)
                    state = jax.lax.stop_gradient(state)  # truncated BPTT boundary
                    if emit_sub:
                        preds = preds[::s]
                        vals = tuple(v[::s] for v in vals)
                    return (train, opt_state, state), (lval, preds, vals)

                (train, opt_state, state), (losses, preds, vals) = jax.lax.scan(
                    chunk, (train, opt_state, state), (inp_chunks, tgt_chunks))
                return train, opt_state, state, losses, preds, vals

            if cache_key is not None:
                self._step_cache[cache_key] = train_all

        train, opt_state, stateT, losses, preds, vals = train_all(
            train, frozen, opt_state, state0, inputs, targets)
        body_T = n_upd * u
        if emit_sub:
            rec_steps = np.arange(0, body_T, s)
            preds = np.asarray(preds).reshape(-1, n_out)
            vals_flat = [np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:]) for v in vals]
        else:
            keep = np.arange(0, body_T, s)
            preds = np.asarray(preds).reshape(body_T, n_out)[keep]
            vals_flat = [np.asarray(v).reshape((body_T,) + np.asarray(v).shape[2:])[keep]
                         for v in vals]
            rec_steps = keep

        # leftover steps (< update_steps) run forward without an update but
        # are still recorded on the global grid (the reference records every
        # `step % sampling_steps == 0` over the FULL horizon)
        rem = T - body_T
        if rem > 0:
            params = combine(train, frozen)
            stateT, (rem_out, rem_vals) = jax.lax.scan(_fwd_body(params), stateT,
                                                       inputs[body_T:])
            rem_keep = np.asarray([t for t in range(body_T, T) if t % s == 0], dtype=int)
            if len(rem_keep):
                preds = np.concatenate([preds, np.asarray(rem_out)[rem_keep - body_T]])
                vals_flat = [np.concatenate([vf_, np.asarray(rv)[rem_keep - body_T]])
                             for vf_, rv in zip(vals_flat, rem_vals)]
                rec_steps = np.concatenate([rec_steps, rem_keep])

        # recorded loss at step t is the error value current at that step:
        # losses update at chunk boundaries (step % u == u-1), so t carries the
        # loss of the last COMPLETED chunk (0.0 before the first update) --
        # reference network.py:1035-1047 ordering (update, then record)
        losses = np.asarray(losses)
        upd_done = np.minimum((rec_steps + 1) // u, n_upd)
        rec_losses = np.where(upd_done >= 1, losses[upd_done - 1], 0.0)
        var_values = {key: vals_flat[i] for i, (key, _, _, _) in enumerate(rec_info)}
        return train, stateT, {"steps": rec_steps, "out": preds, "loss": rec_losses,
                               "vars": var_values}

    def fit_ridge(self, inputs, targets, sampling_steps: int = 100, alpha: float = 1e-4,
                  verbose: bool = True, add_readout_node: bool = True, **kwargs) -> Observer:
        """Closed-form ridge-regression readout on the network trajectory:
        ``w_out = (X^T X + alpha*I)^-1 X^T y``
        (/root/reference/rectipy/network.py:765-767)."""
        targets = jnp.asarray(np.asarray(targets), dtype=self.dtype)
        if np.asarray(inputs).shape[0] != targets.shape[0]:
            raise ValueError(
                "Wrong dimensions of input and target output. Please make sure that `inputs` "
                "and `targets` agree in the first dimension."
            )
        self.compile()

        t0 = perf_counter()
        obs = self.run(inputs=inputs, sampling_steps=sampling_steps, verbose=verbose, **kwargs)
        if verbose:
            print(f"Finished network state collection after {perf_counter() - t0} s.")

        t0 = perf_counter()
        X = jnp.asarray(obs.to_numpy("out"), dtype=self.dtype)
        rec_steps = np.asarray(obs["steps"])
        y_t = targets[jnp.asarray(rec_steps)] if X.shape[0] != targets.shape[0] else targets
        gram = X.T @ X + alpha * jnp.eye(X.shape[1], dtype=self.dtype)
        w_out = jnp.linalg.solve(gram, X.T @ y_t)
        y = X @ w_out
        if verbose:
            print(f"Finished fitting of read-out weights after {perf_counter() - t0} s.")

        if add_readout_node:
            prev_out = self._out_node
            self.add_func_node("readout", n=int(w_out.shape[1]), activation_function="identity")
            self.add_edge(prev_out, target="readout", weights=w_out.T)

        obs.save("y", y)
        obs.save("w_out", w_out)
        return obs

    def fit_rls(self, inputs, targets, update_steps: int = 1, sampling_steps: int = 100,
                verbose: bool = True, **kwargs) -> Observer:
        """Online recursive-least-squares training of the edge added with
        ``train='rls'``: one scan carrying (W, P)
        (/root/reference/rectipy/network.py:786, edges.py:227-234)."""
        if not self._train_edge:
            raise ValueError("No RLS-trainable edge in the network; add one with "
                             "add_edge(..., train='rls').")
        self.compile()
        mesh = kwargs.pop("mesh", None)
        obs_kwargs = retrieve_from_dict(["record_output", "record_loss", "record_vars"], kwargs)
        obs = Observer(dt=self.dt, **obs_kwargs)

        t0 = perf_counter()
        if isinstance(inputs, list):
            if len(inputs) != len(targets):
                raise ValueError(
                    "Wrong dimensions of input and target output. Please make sure that "
                    "`inputs` and `targets` agree in the first dimension (epochs)."
                )
            y0 = self.state
            # stage epoch arrays ONCE per distinct array (repeated-epoch
            # training must not re-transfer host->device every epoch) and keep
            # per-epoch losses on device -- a per-epoch float() blocks the
            # dispatch pipeline on a device round-trip (~170 ms/epoch over a
            # tunneled chip; same rule as _bptt_epochs)
            dev_cache: Dict[int, tuple] = {}

            def stage(x):
                # entry = (source, staged): the held source reference keeps
                # id(x) valid (temporary views get their address reused)
                k = id(x)
                hit = dev_cache.get(k)
                if hit is None:
                    if isinstance(x, jnp.ndarray) and x.dtype == self.dtype:
                        hit = (x, x)  # already on device; jax arrays are immutable
                    else:
                        hit = (x, jnp.asarray(np.asarray(x), dtype=self.dtype))
                    dev_cache[k] = hit
                return hit[1]

            epoch_losses = []
            for epoch in range(len(inputs)):
                _, loss = self._rls_scan(stage(inputs[epoch]), stage(targets[epoch]),
                                         update_steps, sampling_steps, obs, record=False,
                                         mesh=mesh, sync=False)
                epoch_losses.append(loss)
                self.reset(y0)
                if verbose:
                    print(f"Progress: {epoch + 1}/{len(inputs)} training epochs finished.")
                    print(f"Epoch loss: {float(loss)}.")
                    print("")
            if epoch_losses:
                epoch_losses = [float(x) for x in np.asarray(jnp.stack(epoch_losses))]
                rls_edge = self.get_edge(*self._train_edge)
                rls_edge.loss = epoch_losses[-1]
            obs.save("epoch_loss", epoch_losses)
            obs.save("epochs", np.arange(len(inputs)))
        else:
            inputs = np.asarray(inputs)
            targets = np.asarray(targets)
            if inputs.shape[0] != targets.shape[0]:
                raise ValueError(
                    "Wrong dimensions of input and target output. Please make sure that "
                    "`inputs` and `targets` agree in the first dimension."
                )
            self._rls_scan(inputs, targets, update_steps, sampling_steps, obs, record=True,
                           mesh=mesh)
        if verbose:
            print(f"Finished optimization after {perf_counter() - t0} s.")
        return obs

    def _rls_scan(self, inputs, targets, update_steps, sampling_steps, obs, record=True,
                  mesh=None, sync=True):
        """One RLS training scan.  ``sync=False`` (epoch mode) keeps the loss
        on device and skips the per-call ``float()`` so repeated epochs
        pipeline without host round-trips; the jitted scan program is cached
        per configuration (a fresh ``jax.jit`` wrapper per call would force a
        full host-side retrace every epoch)."""
        src, tgt_node = self._train_edge
        rls_edge: RLS = self.get_edge(src, tgt_node)
        ekey = _ekey(src, tgt_node)
        update = RLS.update_fn(rls_edge.beta)
        step = self.make_step(taps=(src, tgt_node))
        params = self.parameters_pytree()
        state0 = self.init_state()
        inputs = jnp.asarray(inputs, dtype=self.dtype)
        targets = jnp.asarray(targets, dtype=self.dtype)
        if mesh is not None:
            state0 = self._mesh_place(state0, mesh)
            params = self._mesh_place(params, mesh)
            inputs = self._mesh_replicate(inputs, mesh)
            targets = self._mesh_replicate(targets, mesh)
        steps = int(inputs.shape[0])

        rec_steps_host = np.arange(0, steps, sampling_steps)
        n_rec = len(rec_steps_host)
        n_out = self.n_out
        out_aval = jax.eval_shape(
            lambda s, p, x: step(s, p, x)[1], state0, params, inputs[0])
        w_dtype = rls_edge.params["weights"].dtype
        # record_vars parity: the reference's _rls records state-variable
        # snapshots at every record step (network.py:1119)
        var_info = self._resolve_record_vars(obs) if record else []
        var_avals = tuple(
            jax.eval_shape(reader, state0["nodes"][lbl], params["nodes"][lbl])
            for (_, lbl, reader, _) in var_info)

        def scan_all(state0, params, W, P, inputs, targets):
            # gradient-free trainer: the inference prep is numerics-safe
            # (prepped int8 == per-step custom-VJP matvec, bit-identical)
            # and hoists e.g. delay-matrix selectors out of the scan
            params = self._prep_params(params)
            rec_out0 = jnp.zeros((n_rec, n_out), dtype=out_aval.dtype)
            rec_loss0 = jnp.zeros((n_rec,), dtype=w_dtype)
            rec_var0 = tuple(
                jnp.zeros((n_rec,) if reduce else (n_rec,) + av.shape, dtype=av.dtype)
                for (_, _, _, reduce), av in zip(var_info, var_avals))

            def body(carry, xt):
                state, W, P, loss, rec_out, rec_loss, rec_var, rec_i = carry
                x_t, y_t, step_idx = xt
                p = dict(params)
                p["edges"] = dict(params["edges"])
                p["edges"][ekey] = dict(params["edges"][ekey])
                p["edges"][ekey]["weights"] = W
                state, out, taps = step(state, p, x_t)
                do_upd = (step_idx % update_steps) == 0
                W_new, P_new, new_loss = update(
                    W, P, taps[src].astype(w_dtype), y_t.astype(w_dtype),
                    taps[tgt_node].astype(w_dtype))
                W = _tree_where(do_upd, W_new, W)
                P = _tree_where(do_upd, P_new, P)
                loss = jnp.where(do_upd, new_loss, loss)
                do_rec = (step_idx % sampling_steps) == 0
                idx = jnp.minimum(rec_i, max(n_rec - 1, 0))
                rec_out = rec_out.at[idx].set(jnp.where(do_rec, out, rec_out[idx]))
                rec_loss = rec_loss.at[idx].set(jnp.where(do_rec, loss, rec_loss[idx]))
                new_rec_var = []
                for r, (key, lbl, reader, reduce) in zip(rec_var, var_info):
                    val = reader(state["nodes"][lbl], p["nodes"][lbl])
                    val = val.mean() if reduce else val
                    new_rec_var.append(r.at[idx].set(jnp.where(do_rec, val, r[idx])))
                rec_var = tuple(new_rec_var)
                rec_i = rec_i + do_rec.astype(jnp.int32)
                return (state, W, P, loss, rec_out, rec_loss, rec_var, rec_i), None

            init = (state0, W, P, jnp.asarray(0.0, dtype=w_dtype), rec_out0, rec_loss0,
                    rec_var0, jnp.asarray(0, dtype=jnp.int32))
            (stateT, W, P, loss, rec_out, rec_loss, rec_var, _), _ = jax.lax.scan(
                body, init, (inputs, targets, jnp.arange(steps)))
            return stateT, W, P, loss, rec_out, rec_loss, rec_var

        cache_key = ("rls_scan", ekey, float(rls_edge.beta), str(w_dtype),
                     update_steps, sampling_steps, steps, n_rec,
                     tuple(key for key, _, _, _ in var_info),
                     self._step_versions())
        if cache_key not in self._step_cache:
            self._step_cache[cache_key] = jax.jit(scan_all)
        stateT, W, P, loss, rec_out, rec_loss, rec_var = self._step_cache[cache_key](
            state0, params, rls_edge.params["weights"], rls_edge.params["P"], inputs, targets)
        rls_edge.params["weights"] = W
        rls_edge.params["P"] = P
        if sync:
            rls_edge.loss = float(loss)
        self._write_back(state=stateT)
        if record:
            var_values = {key: np.asarray(vals)
                          for (key, _, _, _), vals in zip(var_info, rec_var)}
            obs.record_batch(rec_steps_host, outputs=rec_out, losses=rec_loss,
                             var_values=var_values or None)
        return stateT, loss

    def fit_stdp(self, inputs, sampling_steps: int = 100, reward=None,
                 tau_e: float = None, homeostasis_steps: int = None,
                 homeostasis_target=None, verbose: bool = True,
                 **kwargs) -> Observer:
        """Online spike-timing-dependent plasticity on the edge added with
        ``add_edge(..., train='stdp')``.

        Beyond-reference trainer: the reference's online rules are RLS
        (/root/reference/rectipy/network.py:786) and the NotImplementedError
        e-prop stub (network.py:858-896); it ships no local Hebbian
        plasticity.  Unsupervised (no targets): both endpoint nodes must be
        spiking populations, and the pre-/post-synaptic spike indicators fed
        to the pair rule are each step's OWN spike decisions (the exact
        pre-update surrogate-forward indicators ``record_spikes`` records).
        The weights and both eligibility traces ride the scan carry (one
        fused on-device program, like fit_rls's (W, P)); traces persist on
        the edge so chunked calls continue plasticity seamlessly.  With a
        :class:`~rectipy_tpu.ops.sparse.BlockSparseCoupling` as the edge
        weights the plastic tensor is the fan-in blocks
        (:class:`~rectipy_tpu.edges.BlockSparseSTDP`) -- plasticity at
        N=100k+ where a dense W cannot exist; everything here (reward mode,
        homeostasis, chunking) composes identically.

        ``inputs``: a ``(T, m)`` array or an on-device
        :class:`rectipy_tpu.inputs.InputSpec` (e.g. ``Poisson`` drive --
        nothing is materialized or transferred).

        ``reward``: optional ``(T,)`` per-step reward/neuromodulator signal
        switching to REWARD-MODULATED (three-factor) STDP -- Izhikevich's
        2007 distal-reward rule: the pair increments charge an eligibility
        trace ``E`` (decay ``tau_e``, default ``10 * max(tau_plus,
        tau_minus)``) and the weights move only by ``r_t * E`` (hard
        bounds).  The eligibility trace persists on the edge
        (``params['elig']``) so chunked calls continue seamlessly.

        ``homeostasis_steps``: optional period (in integration steps) of
        multiplicative synaptic scaling (Turrigiano-style homeostasis, the
        standard stabilizer of Hebbian drift): every period, each
        postsynaptic row's above-floor mass is rescaled to
        ``homeostasis_target`` --

            W_i <- clip(w_min + (W_i - w_min) * target_i / sum(W_i - w_min))

        so the STDP-learned RELATIVE structure survives while total input
        strength per neuron stays fixed (competitive receptive-field
        formation instead of runaway potentiation).  ``homeostasis_target``
        defaults to each row's above-floor sum at the FIRST scaled fit --
        it is remembered on the edge so chunked calls keep one target;
        pass it explicitly for full reproducibility across processes.  The
        scaling SCHEDULE also persists across chunked calls (the global
        step phase rides on the edge), so arbitrary chunk lengths reproduce
        one long call exactly.  Calls ALIGNED to the period (steps and
        current phase both multiples of ``homeostasis_steps``) take a
        segmented-scan fast path where the (n, n) scaling pass runs once
        per period instead of riding every step (the per-step form costs
        ~+29% at N=10k dense -- reduce-then-rescale is inherently a second
        pass over W); dynamics are identical, but ``w_mean``/``w_min``/
        ``w_max`` recorded AT a scaling step then show pre-scaling weights.
        Requires 2-D weights or a block-sparse
        plastic edge (1-D diagonal edges have no row mass).  Targets refer
        to the STORED ``(n_out, n_in)`` rows -- mind that a square matrix
        passed to ``add_edge`` is auto-transposed on construction (reference
        parity, /root/reference/rectipy/edges.py:22-23), so the default
        targets are the passed matrix's COLUMN sums.  On a block edge the
        row of postsynaptic neuron ``r*bs + i`` spans block entries
        ``[r, :, i, :]`` and targets are ``(n_out,)`` in neuron order.

        Records the usual output windows; per-window weight statistics are
        saved under ``"w_mean"`` / ``"w_min"`` / ``"w_max"`` (plus
        ``"w_steps"``), and the final weights live on the edge.
        ``record_spikes=[node, ...]`` additionally accumulates per-neuron
        spike COUNTS over each ``sampling_steps`` window into Observer key
        ``(node, "spikes")`` -- activity and weight drift co-recorded in the
        same program (a plasticity experiment's standard readout).
        """
        if not self._train_edge:
            raise ValueError("No STDP-trainable edge in the network; add one with "
                             "add_edge(..., train='stdp').")
        self.compile()
        spike_info = self._resolve_record_spikes(kwargs.pop("record_spikes", None))
        src, tgt_node = self._train_edge
        edge = self.get_edge(src, tgt_node)
        if not isinstance(edge, (STDP, BlockSparseSTDP)):
            raise ValueError(
                f"fit_stdp: the registered train edge {src!r} -> {tgt_node!r} is a "
                f"{type(edge).__name__}, not an STDP edge; add it with "
                "add_edge(..., train='stdp').")
        blocky = isinstance(edge, BlockSparseSTDP)
        for label, want in ((src, edge.n_in), (tgt_node, edge.n_out)):
            node = self.get_node(label)
            if not hasattr(node, "_make_spike_reader"):
                raise ValueError(
                    f"fit_stdp: node {label!r} ({type(node).__name__}) is not a "
                    "spiking node; STDP needs pre- and post-synaptic spike trains "
                    "(SpikeNet / SpikeResetNet / MultiSpikeResetNet populations).")
            got = int(jax.eval_shape(node._make_spike_reader(), node.y).shape[0])
            if got != want:
                # fail here with names rather than as an opaque shape error
                # inside the jitted scan (e.g. a multi-compartment node whose
                # concatenated spike segments exceed the edge width)
                raise ValueError(
                    f"fit_stdp: node {label!r} emits a {got}-wide spike vector but "
                    f"the STDP edge {src!r} -> {tgt_node!r} expects {want}.")
        mesh = kwargs.pop("mesh", None)
        obs_kwargs = retrieve_from_dict(["record_output", "record_loss", "record_vars"],
                                        kwargs)
        obs = Observer(dt=self.dt, **obs_kwargs)
        t0 = perf_counter()

        ekey = _ekey(src, tgt_node)
        pre_read = self.get_node(src)._make_spike_reader()
        post_read = self.get_node(tgt_node)._make_spike_reader()
        w_dtype = edge.params["weights"].dtype
        reward_mode = reward is not None
        if reward_mode:
            if edge.soft_bounds:
                raise ValueError(
                    "reward-modulated STDP uses hard bounds (the reward changes "
                    "sign); construct the edge with soft_bounds=False.")
            if tau_e is None:
                tau_e = 10.0 * max(edge.tau_plus, edge.tau_minus)
            tau_e = float(tau_e)
            update = edge.reward_update_fn(self.dt, tau_e)
            # staging rule: device arrays pass through untouched (np.asarray
            # would round-trip them to host every call)
            if not (isinstance(reward, jnp.ndarray) and reward.dtype == w_dtype
                    and reward.ndim == 1):
                reward = jnp.asarray(np.asarray(reward), dtype=w_dtype).ravel()
            E0 = edge.params.get("elig")
            if E0 is None:
                E0 = jnp.zeros_like(edge.params["weights"])
        else:
            if tau_e is not None:
                raise ValueError(
                    "tau_e only applies to reward-modulated STDP; pass the "
                    "per-step reward= signal as well (or drop tau_e).")
            update = edge.update_fn(self.dt)
        h_steps = 0
        h_target = jnp.zeros((), dtype=w_dtype)  # unused dummy
        if homeostasis_steps is not None:
            h_steps = int(homeostasis_steps)
            if h_steps <= 0:
                raise ValueError("homeostasis_steps must be a positive integer.")
            if not blocky and edge.params["weights"].ndim != 2:
                raise ValueError(
                    "homeostatic synaptic scaling needs 2-D edge weights (rows "
                    "= postsynaptic neurons); 1-D diagonal edges have no row "
                    "mass to normalize.")
            if homeostasis_target is None:
                homeostasis_target = getattr(edge, "_homeo_target", None)
            if homeostasis_target is None:
                # per-postsynaptic-neuron above-floor mass; for block edges
                # neuron r*bs+i's row lives at [r, :, i, :] of the blocks
                homeostasis_target = (
                    (edge.params["weights"] - edge.w_min).sum(axis=(1, 3)).ravel()
                    if blocky else
                    (edge.params["weights"] - edge.w_min).sum(axis=1))
            h_target = jnp.asarray(homeostasis_target, dtype=w_dtype)
            if h_target.ndim == 0:
                h_target = jnp.full(edge.n_out, h_target, dtype=w_dtype)
            if h_target.shape != (edge.n_out,):
                raise ValueError(
                    f"homeostasis_target must be a scalar or ({edge.n_out},) "
                    f"per-row array; got shape {np.shape(homeostasis_target)}.")
            edge._homeo_target = h_target  # one target across chunked calls
        elif homeostasis_target is not None:
            raise ValueError(
                "homeostasis_target only applies with homeostasis_steps set.")
        # global scaling phase: chunked calls continue the schedule of one
        # long call (an argument, not baked -- no recompile per chunk)
        h_phase_val = int(getattr(edge, "_homeo_phase", 0)) if h_steps else 0
        step = self.make_step()
        params = self.parameters_pytree()
        state0 = self.init_state()

        input_fn = None
        in_sig = ()
        if isinstance(inputs, InputSpec):
            spec = inputs
            if spec.batch is not None:
                raise ValueError("fit_stdp takes an unbatched input spec; per-trial "
                                 "parameters have no meaning for a single scan.")
            in_fn, inputs, _, in_sig = spec.build(self.dt, self.dtype)
            steps = int(spec.steps)
            n_chan = int(spec.channels)
            input_fn = in_fn
        else:
            # staging rule: device arrays of the right dtype pass through
            # untouched (np.asarray would silently round-trip them to host)
            if not (isinstance(inputs, jnp.ndarray) and inputs.dtype == self.dtype
                    and inputs.ndim == 2):
                inputs = jnp.asarray(np.asarray(inputs), dtype=self.dtype)
            if inputs.ndim != 2:
                raise ValueError(f"`inputs` must be a (T, m) array; got shape {inputs.shape}")
            steps = int(inputs.shape[0])
            n_chan = int(inputs.shape[1])
        if self.n_in and n_chan not in (1, self.n_in):
            raise ValueError(
                f"`inputs` has {n_chan} channels but the network input node "
                f"{self._in_node!r} expects {self.n_in} (or 1, broadcast).")
        if reward_mode and reward.shape[0] != steps:
            raise ValueError(
                f"`reward` must hold one value per step: got {reward.shape[0]} "
                f"rewards for {steps} steps.")

        # ALIGNED homeostasis fast path: when the call starts on a scaling
        # boundary and covers whole scaling periods, the scan is segmented
        # at the boundaries (outer scan over periods, inner scan over steps)
        # and the (n, n) scaling pass runs once per PERIOD instead of riding
        # every step.  The per-step lax.cond variant is select-converted on
        # TPU (+29% measured at N=10k dense, benchmarks/stdp_scale.py)
        # because reduce-then-rescale inherently needs a second pass over W
        # -- segmentation is the only real fix.  Unaligned calls (chunk
        # lengths not multiples of homeostasis_steps) keep the cond path;
        # dynamics are identical either way (scaling between step t and
        # t+1), the one observable difference being that w_mean/w_min/w_max
        # recorded AT a scaling step show pre-scaling weights on this path.
        segmented = bool(h_steps) and h_phase_val % h_steps == 0 \
            and steps % h_steps == 0 and steps >= h_steps

        if mesh is not None:
            state0 = self._mesh_place(state0, mesh)
            params = self._mesh_place(params, mesh)
            if input_fn is None:
                inputs = self._mesh_replicate(inputs, mesh)
            else:
                inputs = jax.tree.map(lambda x: self._mesh_replicate(x, mesh), inputs)
            if reward_mode:
                reward = self._mesh_replicate(reward, mesh)

        rec_steps_host = np.arange(0, steps, sampling_steps)
        n_rec = len(rec_steps_host)
        n_out = self.n_out
        in_aval = (jax.eval_shape(lambda a: input_fn(0, a), inputs) if input_fn is not None
                   else jax.eval_shape(lambda x: x[0], inputs))
        out_aval = jax.eval_shape(lambda s, p, x: step(s, p, x)[1], state0, params, in_aval)
        spk_widths = tuple(
            int(jax.eval_shape(reader, state0["nodes"][label]).shape[0])
            for (label, reader) in spike_info)
        # record_vars: post-update state snapshots at record steps (same
        # semantics as run(), network.py docstring at :932)
        var_info = self._resolve_record_vars(obs)
        var_avals = tuple(
            jax.eval_shape(reader, state0["nodes"][lbl], params["nodes"][lbl])
            for (_, lbl, reader, _) in var_info)

        def scan_all(state0, params, W, E, x_pre, x_post, inputs, reward,
                     h_target, h_phase):
            params = self._prep_params(params)  # gradient-free: prep is safe

            def _scale_rows(Wv):
                above = Wv - edge.w_min
                if blocky:
                    # postsynaptic row (r, i) spans block entries [r, :, i, :]
                    mass = above.sum(axis=(1, 3))            # (n_br, bs)
                    scale = h_target.reshape(mass.shape) / (mass + 1e-12)
                    return jnp.clip(
                        edge.w_min + above * scale[:, None, :, None],
                        edge.w_min, edge.w_max)
                scale = h_target / (above.sum(axis=1) + 1e-12)
                return jnp.clip(edge.w_min + above * scale[:, None],
                                edge.w_min, edge.w_max)

            rec_out0 = jnp.zeros((n_rec, n_out), dtype=out_aval.dtype)
            rec_w0 = jnp.zeros((n_rec, 3), dtype=w_dtype)
            # per-window spike-count accumulators (f32: bf16 saturates at 256)
            acc0 = tuple(jnp.zeros(w, dtype=jnp.float32) for w in spk_widths)
            rec_spk0 = tuple(jnp.zeros((n_rec, w), dtype=jnp.float32) for w in spk_widths)
            rec_var0 = tuple(
                jnp.zeros((n_rec,) if reduce else (n_rec,) + av.shape, dtype=av.dtype)
                for (_, _, _, reduce), av in zip(var_info, var_avals))

            def body(carry, xt):
                (state, W, E, x_pre, x_post, rec_out, rec_w, acc, rec_spk,
                 rec_var, rec_i) = carry
                if input_fn is None:
                    if reward_mode:
                        x_t, r_t, step_idx = xt
                    else:
                        x_t, step_idx = xt
                else:
                    if reward_mode:
                        r_t, step_idx = xt
                    else:
                        step_idx = xt
                    x_t = input_fn(step_idx, inputs)
                # this step's own spike decisions (pre-update state)
                spk_pre = pre_read(state["nodes"][src]).astype(w_dtype)
                spk_post = post_read(state["nodes"][tgt_node]).astype(w_dtype)
                rec_indicators = tuple(
                    reader(state["nodes"][label]).astype(jnp.float32)
                    for (label, reader) in spike_info)
                p = dict(params)
                p["edges"] = dict(params["edges"])
                p["edges"][ekey] = dict(params["edges"][ekey])
                p["edges"][ekey]["weights"] = W
                state, out, _ = step(state, p, x_t)
                if reward_mode:
                    W, E, x_pre, x_post = update(W, E, x_pre, x_post, spk_pre,
                                                 spk_post, r_t)
                else:
                    W, x_pre, x_post = update(W, x_pre, x_post, spk_pre, spk_post)
                if h_steps and not segmented:
                    # multiplicative synaptic scaling every h_steps steps:
                    # above-floor row mass renormalized to the target (clip
                    # keeps the bounds honored when scaling up).  h_phase
                    # carries the GLOBAL step count across chunked calls so
                    # chunking never shifts the scaling schedule; lax.cond
                    # (not where) keeps the extra (n, n) pass off the
                    # roofline-bound steps that don't scale.  (On the
                    # aligned fast path scaling runs between scan segments
                    # instead -- see `segmented` above.)
                    do_h = ((step_idx + h_phase) % h_steps) == (h_steps - 1)
                    W = jax.lax.cond(do_h, _scale_rows, lambda Wv: Wv, W)
                acc = tuple(a + s for a, s in zip(acc, rec_indicators))
                do_rec = (step_idx % sampling_steps) == 0
                idx = jnp.minimum(rec_i, max(n_rec - 1, 0))
                rec_out = rec_out.at[idx].set(jnp.where(do_rec, out, rec_out[idx]))
                # computed every step, but free: XLA fuses the reductions into
                # the update's W pass (measured -- the dense benchmark hits the
                # f32 read+write roofline, benchmarks/stdp_scale.py)
                w_stats = jnp.stack([W.mean(), W.min(), W.max()]).astype(w_dtype)
                rec_w = rec_w.at[idx].set(jnp.where(do_rec, w_stats, rec_w[idx]))
                # spike counts cover the window ENDING at each record step
                # (inclusive); the accumulator resets after every write
                rec_spk = tuple(r.at[idx].set(jnp.where(do_rec, a, r[idx]))
                                for r, a in zip(rec_spk, acc))
                acc = tuple(jnp.where(do_rec, jnp.zeros_like(a), a) for a in acc)
                new_rec_var = []
                for r, (key, lbl, reader, reduce) in zip(rec_var, var_info):
                    val = reader(state["nodes"][lbl], p["nodes"][lbl])
                    val = val.mean() if reduce else val
                    new_rec_var.append(r.at[idx].set(jnp.where(do_rec, val, r[idx])))
                rec_var = tuple(new_rec_var)
                rec_i = rec_i + do_rec.astype(jnp.int32)
                return (state, W, E, x_pre, x_post, rec_out, rec_w, acc, rec_spk,
                        rec_var, rec_i), None

            idx_seq = jnp.arange(steps)
            if input_fn is not None:
                xs = (reward, idx_seq) if reward_mode else idx_seq
            else:
                xs = (inputs, reward, idx_seq) if reward_mode else (inputs, idx_seq)
            init = (state0, W, E, x_pre, x_post, rec_out0, rec_w0, acc0, rec_spk0,
                    rec_var0, jnp.asarray(0, dtype=jnp.int32))
            if segmented:
                # outer scan over whole scaling periods; the (n, n) scaling
                # pass runs once per period, between inner scans (identical
                # dynamics to the cond path: step t scales after its update,
                # step t+1 integrates with scaled W)
                n_seg = steps // h_steps
                xs_seg = jax.tree.map(
                    lambda a: a.reshape((n_seg, h_steps) + a.shape[1:]), xs)

                def period(carry, xseg):
                    carry, _ = jax.lax.scan(body, carry, xseg)
                    (state, W, E, x_pre, x_post, rec_out, rec_w, acc, rec_spk,
                     rec_var, rec_i) = carry
                    W = _scale_rows(W)
                    return (state, W, E, x_pre, x_post, rec_out, rec_w, acc,
                            rec_spk, rec_var, rec_i), None

                (stateT, W, E, x_pre, x_post, rec_out, rec_w, _, rec_spk,
                 rec_var, _), _ = jax.lax.scan(period, init, xs_seg)
            else:
                (stateT, W, E, x_pre, x_post, rec_out, rec_w, _, rec_spk,
                 rec_var, _), _ = jax.lax.scan(body, init, xs)
            return stateT, W, E, x_pre, x_post, rec_out, rec_w, rec_spk, rec_var

        cache_key = ("stdp_scan", ekey, str(w_dtype), edge.tau_plus, edge.tau_minus,
                     edge.a_plus, edge.a_minus, edge.w_min, edge.w_max,
                     edge.soft_bounds, sampling_steps, steps, n_rec, in_sig,
                     reward_mode, tau_e if reward_mode else None, h_steps, segmented,
                     tuple(label for label, _ in spike_info),
                     tuple(key for key, _, _, _ in var_info),
                     self._step_versions())
        if cache_key not in self._step_cache:
            self._step_cache[cache_key] = jax.jit(scan_all)
        if not reward_mode:
            E0 = jnp.zeros((), dtype=w_dtype)  # unused dummy
            reward = jnp.zeros((), dtype=w_dtype)
        if mesh is not None and h_steps:
            h_target = self._mesh_replicate(h_target, mesh)
        stateT, W, E, x_pre, x_post, rec_out, rec_w, rec_spk, rec_var = \
            self._step_cache[cache_key](
                state0, params, edge.params["weights"], E0, edge.params["x_pre"],
                edge.params["x_post"], inputs, reward, h_target,
                jnp.asarray(h_phase_val, dtype=jnp.int32))
        if h_steps:
            edge._homeo_phase = (h_phase_val + steps) % h_steps
        edge.params["weights"] = W
        edge.params["x_pre"] = x_pre
        edge.params["x_post"] = x_post
        if reward_mode:
            edge.params["elig"] = E
        self._write_back(state=stateT)
        var_values = {(label, "spikes"): np.rint(np.asarray(counts)).astype(np.int32)
                      for (label, _), counts in zip(spike_info, rec_spk)}
        for (key, _, _, _), vals in zip(var_info, rec_var):
            var_values[key] = np.asarray(vals)
        obs.record_batch(rec_steps_host, outputs=rec_out,
                         losses=np.zeros(n_rec) if obs.record_loss else None,
                         var_values=var_values or None)
        rec_w = np.asarray(rec_w)
        obs.save("w_steps", rec_steps_host)
        obs.save("w_mean", rec_w[:, 0])
        obs.save("w_min", rec_w[:, 1])
        obs.save("w_max", rec_w[:, 2])
        if verbose:
            print(f"Finished STDP optimization after {perf_counter() - t0} s.")
        return obs

    def fit_eprop(self, inputs, targets, feedback_weights: np.ndarray = None,
                  epsilon: float = 0.99, delta: float = 0.9, update_steps: int = 1,
                  sampling_steps: int = 100, lr: float = 1e-2, decay: float = 0.0,
                  normalize: bool = False, verbose: bool = True, **kwargs) -> Observer:
        """Online three-factor (e-prop-style) learning of the readout edge.

        The reference declares this method but raises NotImplementedError
        (/root/reference/rectipy/network.py:858-896); this is a working
        implementation of its documented intent: per step, a running average
        of the residual (rate ``epsilon``) is combined with an eligibility
        trace of the presynaptic activity (rate ``delta``) into a local
        delta-rule update

            err_bar <- epsilon * err_bar + (1 - epsilon) * (y* - y)
            elig    <- delta * elig + (1 - delta) * r_pre
            W       <- W + lr * outer(err_bar, elig)      every `update_steps`

        run as one on-device scan.  Register the trained edge with
        ``add_edge(..., train='eprop')`` (or reuse an ``'rls'`` edge).

        ``normalize=True`` switches the update to NLMS: the outer product is
        divided by the eligibility energy ``1e-8 + elig @ elig``, making
        ``lr`` a dimensionless relaxation factor in (0, 2) instead of a
        quantity that must be tuned against the reservoir's activity scale.
        Plain LMS diverges when ``lr * ||r_pre||^2`` exceeds the stability
        bound (e.g. the instantaneous rule ``epsilon=delta=0`` at lr=0.5 on
        a tanh reservoir); the normalized rule stays stable at the same
        settings (regression-tested).  For reaching the ridge optimum on
        strongly correlated features, use ``fit_rls`` (full whitening) --
        any LMS-family rule carries irreducible misadjustment there.

        ``feedback_weights`` (shape ``(n_in, n_out)``) implements the
        reference-documented output->population feedback: the carried
        learning signal ``err_bar`` is broadcast back into the network input
        each step (``x_t + feedback_weights @ err_bar``, feedback-alignment
        style -- causal, since err_bar lags the current output by one step).
        For *learned* output feedback use a FeedbackNetwork edge instead
        (``add_edge(out, rnn, weights=W_fb, feedback=True)``).
        """
        if not self._train_edge:
            raise ValueError("No online-trainable edge; add one with "
                             "add_edge(..., train='eprop') or train='rls'.")
        self.compile()
        obs_kwargs = retrieve_from_dict(["record_output", "record_loss", "record_vars"], kwargs)
        obs = Observer(dt=self.dt, **obs_kwargs)

        mesh = kwargs.pop("mesh", None)
        src, tgt_node = self._train_edge
        edge = self.get_edge(src, tgt_node)
        ekey = _ekey(src, tgt_node)
        step = self.make_step(taps=(src, tgt_node))
        params = self.parameters_pytree()
        state0 = self.init_state()
        inputs = jnp.asarray(np.asarray(inputs), dtype=self.dtype)
        targets = jnp.asarray(np.asarray(targets), dtype=self.dtype)
        if mesh is not None:
            state0 = self._mesh_place(state0, mesh)
            params = self._mesh_place(params, mesh)
            inputs = self._mesh_replicate(inputs, mesh)
            targets = self._mesh_replicate(targets, mesh)
        if inputs.shape[0] != targets.shape[0]:
            raise ValueError(
                "Wrong dimensions of input and target output. Please make sure that "
                "`inputs` and `targets` agree in the first dimension."
            )
        steps = int(inputs.shape[0])
        w_dtype = edge.params["weights"].dtype
        rec_steps_host = np.arange(0, steps, sampling_steps)
        n_rec = len(rec_steps_host)
        n_out = self.n_out
        err_dim = int(edge.params["weights"].shape[0])
        fb = None
        if feedback_weights is not None:
            fb = jnp.asarray(np.asarray(feedback_weights), dtype=self.dtype)
            if fb.shape != (self.n_in, err_dim):
                raise ValueError(
                    f"feedback_weights must have shape (n_in, n_out) = "
                    f"({self.n_in}, {err_dim}); got {tuple(fb.shape)}."
                )

        # cached across calls (online/RL workloads re-fit repeatedly with
        # fresh same-shape data; a fresh jax.jit per call would retrace the
        # whole scan).  Everything value-like is an argument; the key covers
        # the baked-in hyperparameters and grids.
        use_fb = fb is not None
        # the scalar hyperparameters ride as ARGUMENTS (one program serves
        # every lr/epsilon/delta/decay value -- schedules/sweeps don't leak
        # a compiled program per value); only structure/grids key the cache
        # record_vars: per-record-step state snapshots, like _rls_scan
        var_info = self._resolve_record_vars(obs)
        var_avals = tuple(
            jax.eval_shape(reader, state0["nodes"][lbl], params["nodes"][lbl])
            for (_, lbl, reader, _) in var_info)
        cache_key = ("eprop_scan", ekey, steps, int(update_steps),
                     int(sampling_steps), bool(normalize), use_fb,
                     str(w_dtype), tuple(key for key, _, _, _ in var_info),
                     self._step_versions())
        cached = self._step_cache.get(cache_key)
        # hyperparameters and accumulators never drop BELOW float32 even for
        # a low-precision readout: smoothing constants like epsilon=0.99 lose
        # ~17% of (1 - epsilon) when rounded to bfloat16.  A float64 readout
        # keeps f64 traces (promote, don't truncate).
        acc_dtype = jnp.promote_types(w_dtype, jnp.float32)
        if cached is not None:
            scan_all = cached
        else:
            @jax.jit
            def scan_all(state0, params, W, fb_arg, hp, inputs, targets):
              params = self._prep_params(params)  # gradient-free: prep safe
              lr, epsilon, delta, decay = hp
              err_bar0 = jnp.zeros(W.shape[0], dtype=acc_dtype)
              elig0 = jnp.zeros(W.shape[1], dtype=acc_dtype)
              rec_out0 = jnp.zeros((n_rec, n_out), dtype=w_dtype)
              rec_loss0 = jnp.zeros((n_rec,), dtype=acc_dtype)
              rec_var0 = tuple(
                  jnp.zeros((n_rec,) if reduce else (n_rec,) + av.shape, dtype=av.dtype)
                  for (_, _, _, reduce), av in zip(var_info, var_avals))

              def body(carry, xt):
                  state, W, err_bar, elig, rec_out, rec_loss, rec_var, rec_i = carry
                  x_t, y_t, step_idx = xt
                  p = dict(params)
                  p["edges"] = dict(params["edges"])
                  p["edges"][ekey] = dict(params["edges"][ekey])
                  p["edges"][ekey]["weights"] = W
                  if use_fb:
                      x_t = x_t + (fb_arg @ err_bar.astype(self.dtype))
                  state, out, taps = step(state, p, x_t)
                  err = y_t.astype(acc_dtype) - taps[tgt_node].astype(acc_dtype)
                  err_bar = epsilon * err_bar + (1.0 - epsilon) * err
                  elig = delta * elig + (1.0 - delta) * taps[src].astype(acc_dtype)
                  do_upd = (step_idx % update_steps) == 0
                  gate = jnp.where(do_upd, lr, 0.0)
                  # `decay` L2-regularizes the online rule: without it the delta
                  # rule grows weight mass along near-collinear reservoir
                  # directions that only cancel while updates keep correcting --
                  # the frozen readout then diverges at test time
                  upd = jnp.outer(err_bar, elig)
                  if normalize:  # NLMS: step size relative to eligibility energy
                      upd = upd / (1e-8 + elig @ elig)
                  W = (W.astype(acc_dtype) * (1.0 - gate * decay)
                       + gate * upd).astype(w_dtype)
                  loss = err @ err
                  do_rec = (step_idx % sampling_steps) == 0
                  idx = jnp.minimum(rec_i, max(n_rec - 1, 0))
                  rec_out = rec_out.at[idx].set(jnp.where(do_rec, out.astype(w_dtype),
                                                          rec_out[idx]))
                  rec_loss = rec_loss.at[idx].set(jnp.where(do_rec, loss, rec_loss[idx]))
                  new_rec_var = []
                  for r, (key, lbl, reader, reduce) in zip(rec_var, var_info):
                      val = reader(state["nodes"][lbl], p["nodes"][lbl])
                      val = val.mean() if reduce else val
                      new_rec_var.append(r.at[idx].set(jnp.where(do_rec, val, r[idx])))
                  rec_var = tuple(new_rec_var)
                  rec_i = rec_i + do_rec.astype(jnp.int32)
                  return (state, W, err_bar, elig, rec_out, rec_loss, rec_var,
                          rec_i), None

              init = (state0, W, err_bar0, elig0, rec_out0, rec_loss0, rec_var0,
                      jnp.asarray(0, dtype=jnp.int32))
              (stateT, W, _, _, rec_out, rec_loss, rec_var, _), _ = jax.lax.scan(
                  body, init, (inputs, targets, jnp.arange(steps)))
              return stateT, W, rec_out, rec_loss, rec_var

            self._step_cache[cache_key] = scan_all

        t0 = perf_counter()
        fb_arg = fb if use_fb else jnp.zeros((), dtype=self.dtype)
        hp = jnp.asarray([lr, epsilon, delta, decay], dtype=acc_dtype)
        stateT, W, rec_out, rec_loss, rec_var = scan_all(
            state0, params, edge.params["weights"], fb_arg, hp, inputs, targets)
        edge.params["weights"] = W
        self._write_back(state=stateT)
        var_values = {key: np.asarray(vals)
                      for (key, _, _, _), vals in zip(var_info, rec_var)}
        obs.record_batch(rec_steps_host, outputs=rec_out, losses=rec_loss,
                         var_values=var_values or None)
        if verbose:
            print(f"Finished optimization after {perf_counter() - t0} s.")
        return obs

    def test(self, inputs, targets, loss: str = "mse", loss_kwargs: dict = None,
             sampling_steps: int = 100, verbose: bool = True, **kwargs) -> tuple:
        """Run with frozen parameters and return (Observer, loss on the
        recorded outputs).  When sampling_steps > 1 the targets are
        downsampled to the recorded steps."""
        targets = jnp.asarray(np.asarray(targets), dtype=self.dtype)
        loss_fn = get_loss_function(loss, loss_kwargs=loss_kwargs)
        obs = self.run(inputs=inputs, sampling_steps=sampling_steps, verbose=verbose, **kwargs)
        output = jnp.asarray(obs.to_numpy("out"), dtype=self.dtype)
        if output.shape[0] != targets.shape[0]:
            targets = targets[jnp.asarray(np.asarray(obs["steps"]))]
        loss_val = loss_fn(output, targets)
        return obs, float(loss_val)

    # -------------------------------------------------------------- internal
    def _relabel_var(self, var: str) -> str:
        return self._var_map.get(var, var)


class FeedbackNetwork(Network):
    """Network variant supporting cyclic graphs via feedback edges: an edge
    added with ``feedback=True`` carries the source node's previous-step
    output (one-step-delayed recurrence between nodes;
    /root/reference/rectipy/network.py:1196-1357)."""

    def __init__(self, dt: float, device: str = "cpu", dtype=jnp.float32):
        super().__init__(dt, device, dtype)
        self._fb_graph: Optional[DiGraph] = None

    def compile(self):
        if self._fb_graph is not None:
            for edge in self._fb_graph.edges:
                self.graph.add_edge(edge[0], edge[1], **self._fb_graph[edge[0]][edge[1]])
            self._fb_graph = None

        ffwd_edges, fb_edges = [], []
        for edge in self.graph.edges:
            if self.graph[edge[0]][edge[1]].get("feedback"):
                fb_edges.append(edge)
            else:
                ffwd_edges.append(edge)

        fb = DiGraph()
        for u, v in fb_edges:
            fb.add_node(u, **self.graph.nodes[u])
            fb.add_node(v, **self.graph.nodes[v])
            fb.add_edge(u, v, **self.graph[u][v])
        g_fwd = DiGraph()
        for n, attrs in self.graph.nodes(data=True):
            g_fwd.add_node(n, **attrs)
        for u, v in ffwd_edges:
            g_fwd.add_edge(u, v, **self.graph[u][v])
        self._fb_graph = fb
        self.graph = g_fwd
        return super().compile()

    def add_edge(self, source: str, target: str, weights=None, train: Optional[str] = None,
                 feedback: bool = False, edge_attrs: dict = None, **kwargs) -> Linear:
        edge_attrs = dict(edge_attrs or {})
        edge_attrs["feedback"] = feedback
        return super().add_edge(source, target, weights=weights, train=train,
                                edge_attrs=edge_attrs, **kwargs)

    def get_edge(self, source: str, target: str) -> Linear:
        try:
            return super().get_edge(source, target)
        except KeyError:
            return self._fb_graph[source][target]["edge"]

    def pop_edge(self, source: str, target: str):
        # after compile() feedback edges live in _fb_graph, not self.graph --
        # the base remove_edge would raise NetworkXError for them
        if (self._fb_graph is not None and not self.graph.has_edge(source, target)
                and self._fb_graph.has_edge(source, target)):
            edge = self._fb_graph[source][target]["edge"]
            self._fb_graph.remove_edge(source, target)
            self._invalidate()
            return edge
        return super().pop_edge(source, target)

    def get_node(self, node: str):
        try:
            return super().get_node(node)
        except KeyError:
            return self._fb_graph.nodes[node]["node"]

    def _fb_edge_list(self) -> list:
        if self._fb_graph is None:
            return []
        return [(u, v, self._fb_graph[u][v]["edge"]) for u, v in self._fb_graph.edges]

    def parameters(self, recurse: bool = True) -> Iterator:
        yield from super().parameters(recurse=recurse)
        if self._fb_graph is not None:
            for s, t in self._fb_graph.edges:
                yield from self._fb_graph[s][t]["edge"].parameters()
