"""Template -> JAX vector-field lowering.

This replaces the reference's build-time PyRates code generation
(``/root/reference/rectipy/nodes.py:233-262``: replicate a NodeTemplate N
times into a CircuitTemplate, add edges from a weight matrix, then
``get_run_func(backend='torch')``).  Unlike PyRates we never unroll N node
copies -- the population is vectorized *symbolically*: every variable is an
``(N,)`` array, the recurrent coupling is a single ``W @ source`` matvec, and
``mean()`` reductions act over the neuron axis.  The result is a pure,
jittable ``f(t, y, args) -> dy`` with static shapes, exactly what
``jax.lax.scan``/``jax.grad`` need.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .expr import CONSTANTS, evaluate, free_symbols, parse, split_equation
from .parser import NodeTemplate, OperatorTemplate, TemplateError, _strip_node_prefix


@dataclass
class LoweredVar:
    """A fully-qualified (``op/var``) variable of the lowered population."""

    op: str
    var: str
    kind: str  # 'state' | 'algebraic' | 'input' | 'param'
    default: float = 0.0
    rhs_ast: Optional[tuple] = None  # for state (ODE RHS) and algebraic vars

    @property
    def qname(self) -> str:
        return f"{self.op}/{self.var}"


@dataclass
class VectorField:
    """A lowered neuron population: pure vector field plus its metadata.

    Mirrors what the reference gets back from
    ``CircuitTemplate.get_run_func`` -- ``(func, args, keys,
    state_var_indices)`` -- but in functional-JAX form: ``args`` is a dict
    pytree and the function is pure.
    """

    n: int
    dtype: jnp.dtype
    func: Callable  # func(t, y, args: dict) -> dy
    args: Dict[str, jnp.ndarray]  # default parameter/input values (pytree leaves)
    keys: List[str]  # deterministic arg ordering
    y0: jnp.ndarray  # flat initial state, contiguous per-variable blocks
    var_map: Dict[str, Tuple[int, int]]  # state var -> (start, stop) slice into y
    param_map: Dict[str, str]  # user-facing name -> args key
    input_vars: List[str]  # args keys that are input placeholders
    source_var: Optional[str] = None
    target_var: Optional[str] = None
    read_var: Optional[Callable] = None  # read_var(qname, y, args) -> (N,) value
    alg_vars: List[str] = field(default_factory=list)  # algebraic (non-state) variables
    tile_func: Optional[Callable] = None  # tile-local vector field (see lower())
    tile_local: bool = True  # False when reductions make tile_func global-only
    state_order: List[str] = field(default_factory=list)
    make_tile_reader: Optional[Callable] = None  # qname -> tile reader or None
    couplings: List[Tuple[str, str, str]] = field(default_factory=list)  # (src, tgt, wkey)
    coupling_cast: Optional[str] = None  # 'bf16' for bfloat16_master lowering
    prep_args: Optional[Callable] = None  # once-per-scan args prep (int8_master)


@jax.custom_jvp
def _int8_matvec(w_q, x):
    """int8 x int8 matvec with int32 accumulation; ``x`` must hold integral
    values in [-127, 127] (STE-rounded upstream)."""
    acc = jax.lax.dot_general(
        w_q, x.astype(jnp.int8),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32)


@_int8_matvec.defjvp
def _int8_matvec_jvp(primals, tangents):
    w_q, x = primals
    _, dx = tangents
    # linear in dx (dequantized weights); w_q is a frozen int8 leaf
    return _int8_matvec(w_q, x), w_q.astype(jnp.float32) @ dx


@jax.custom_jvp
def _int4_matvec(w_q4, x):
    """int4 x int8 matvec with int32 accumulation; ``w_q4`` already cast to
    int4 (by prep, outside the scan), ``x`` STE-rounded to [-127, 127]."""
    acc = jax.lax.dot_general(
        w_q4, x.astype(jnp.int8),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32)


@_int4_matvec.defjvp
def _int4_matvec_jvp(primals, tangents):
    w_q4, x = primals
    _, dx = tangents
    return _int4_matvec(w_q4, x), w_q4.astype(jnp.float32) @ dx


def _qualify(name: str, ops: List[OperatorTemplate]) -> str:
    """Resolve a possibly-bare variable name to ``op/var``."""
    if name is None:
        raise TemplateError("Variable name is None")
    if "/" in name:
        parts = name.split("/")
        if len(parts) >= 2:
            return "/".join(parts[-2:])  # strip any 'all/' node prefix
    matches = [op.name for op in ops if name in op.variables]
    if not matches:
        raise KeyError(f"Variable {name!r} not found in operators {[op.name for op in ops]}")
    if len(matches) > 1:
        raise KeyError(f"Variable {name!r} is ambiguous across operators {matches}; qualify as 'op/var'")
    return f"{matches[0]}/{name}"


def lower(
    node: Union[str, NodeTemplate],
    n: int = None,
    weights: Optional[np.ndarray] = None,
    source_var: Optional[str] = None,
    target_var: Optional[str] = None,
    node_vars: Optional[dict] = None,
    dtype=jnp.float32,
    edges: Optional[List[Tuple[str, str, np.ndarray]]] = None,
    coupling_dtype=None,
) -> VectorField:
    """Lower a node template replicated over ``n`` neurons into a VectorField.

    Parameters mirror ``RateNet._circuit_from_yaml``
    (``/root/reference/rectipy/nodes.py:233-262``): ``weights`` is the ``N x N``
    recurrent coupling realized as ``target_var += weights @ source_var``;
    ``node_vars`` overrides parameter values or initial states with scalars or
    per-neuron arrays (keys may be ``all/op/var``, ``op/var`` or ``var``).
    ``edges`` optionally adds further (source_var, target_var, weight-matrix)
    couplings beyond the primary one.

    ``coupling_dtype`` (e.g. ``jnp.bfloat16``) stores the coupling matrices in
    reduced precision: the N x N matvec is the HBM-bandwidth-bound hot op, so
    halving its bytes nearly doubles steps/s on TPU; accumulation stays
    float32 via ``preferred_element_type``.
    """
    from .parser import CircuitTemplate

    if isinstance(node, CircuitTemplate):
        # prebuilt circuit: extract size, primary coupling, and overrides
        circuit = node
        if circuit.heterogeneous:
            raise TemplateError(
                f"Circuit {circuit.name!r} mixes node templates with different "
                "equations and cannot lower to one vector field. Pass it to "
                "Network.add_diffeq_node, which auto-expands it into one "
                "Network node per template group wired with inter-group edges "
                "(or build the separate Network nodes yourself with add_edge)."
            )
        node = circuit.node_template
        n = n or circuit.n
        if circuit.edges and weights is None:
            sv0, tv0, weights = circuit.edges[0]
            source_var, target_var = _strip_node_prefix(sv0), _strip_node_prefix(tv0)
            extra = [(_strip_node_prefix(sv), _strip_node_prefix(tv), w)
                     for sv, tv, w in circuit.edges[1:]]
            edges = list(edges or []) + extra
        if circuit.node_vars:
            merged = dict(circuit.node_vars)
            merged.update(node_vars or {})
            node_vars = merged
    if isinstance(node, str):
        node = NodeTemplate.from_yaml(node)
    ops = node.operators
    if not ops:
        raise TemplateError(f"Node template {node.name!r} has no operators")

    if weights is not None:
        if not hasattr(weights, "blocks"):  # BlockSparseCoupling passes through
            weights = np.asarray(weights)
        if weights.ndim != 2 or weights.shape[0] != weights.shape[1]:
            raise ValueError(f"Recurrent weights must be square, got {weights.shape}")
        if n is None:
            n = weights.shape[0]
        elif n != weights.shape[0]:
            raise ValueError(f"weights shape {weights.shape} does not match N={n}")
    if n is None:
        raise ValueError("Either `weights` or `N` must be provided to size the population")

    # ------------------------------------------------------------------ classify
    lowered: Dict[str, LoweredVar] = {}
    state_order: List[str] = []
    for op in ops:
        eq_lhs = {}
        for eq in op.equations:
            lhs, is_ode, rhs = split_equation(eq)
            if lhs not in op.variables:
                raise TemplateError(
                    f"Equation LHS {lhs!r} of operator {op.name!r} is not declared in its variables"
                )
            eq_lhs[lhs] = (is_ode, rhs)
            # state-vector layout follows equation order within each operator
            if is_ode and f"{op.name}/{lhs}" not in state_order:
                state_order.append(f"{op.name}/{lhs}")
        for vname, spec in op.variables.items():
            qname = f"{op.name}/{vname}"
            if vname in eq_lhs:
                is_ode, rhs = eq_lhs[vname]
                kind = "state" if is_ode else "algebraic"
                lowered[qname] = LoweredVar(op.name, vname, kind, spec.default, rhs)
            elif spec.role == "input":
                lowered[qname] = LoweredVar(op.name, vname, "input", spec.default)
            else:
                lowered[qname] = LoweredVar(op.name, vname, "param", spec.default)
        # symbols used in equations must all be declared
        for eq in op.equations:
            _, _, rhs = split_equation(eq)
            for sym in free_symbols(rhs):
                if sym not in op.variables and sym not in CONSTANTS:
                    raise KeyError(
                        f"Symbol {sym!r} in operator {op.name!r} equations is undeclared"
                    )

    # ----------------------------------------------------------- coupling setup
    all_edges: List[Tuple[str, str, Optional[np.ndarray], str]] = []  # (src, tgt, W, args_key)
    if weights is not None:
        if source_var is None or target_var is None:
            raise ValueError(
                "If synaptic weights are passed (`weights`), please provide the names of the "
                "source and target variable that should be connected via `weights`."
            )
        sv = _qualify(source_var, ops)
        tv = _qualify(target_var, ops)
        if sv not in lowered:
            raise KeyError(f"Source variable {sv!r} not found in node template")
        if tv not in lowered or lowered[tv].kind != "input":
            raise KeyError(f"Target variable {tv!r} is not an input variable of the node template")
        all_edges.append((sv, tv, weights, "weights"))
    for i, (esv, etv, ew) in enumerate(edges or []):
        if not hasattr(ew, "blocks"):
            ew = np.asarray(ew)
        all_edges.append((_qualify(esv, ops), _qualify(etv, ops), ew, f"weights_{i}"))

    # intra-node operator wiring: an input var of op B is driven by the output
    # var of the same bare name on another op (PyRates operator-chaining).
    wiring: Dict[str, str] = {}
    out_by_name: Dict[str, str] = {}
    for op in ops:
        for vname, spec in op.variables.items():
            if spec.role == "output":
                out_by_name[vname] = f"{op.name}/{vname}"
    for qname, lv in lowered.items():
        if lv.kind == "input" and lv.var in out_by_name and out_by_name[lv.var] != qname:
            wiring[qname] = out_by_name[lv.var]

    # --------------------------------------------------------------- args & y0
    node_vars = dict(node_vars or {})
    overrides: Dict[str, np.ndarray] = {}
    for key, val in node_vars.items():
        parts = key.split("/")
        if parts[0] == "all":
            parts = parts[1:]
        if len(parts) == 2:
            qname = "/".join(parts)
        else:
            qname = _qualify(parts[-1], ops)
        if qname not in lowered:
            raise KeyError(f"node_vars key {key!r} does not match any variable")
        overrides[qname] = np.asarray(val)

    def _vectorize(value, default_scalar):
        arr = np.asarray(value if value is not None else default_scalar, dtype=np.float64)
        if arr.ndim == 0:
            return jnp.asarray(arr, dtype=dtype)  # scalar param stays scalar
        if arr.shape == (n,):
            return jnp.asarray(arr, dtype=dtype)
        if arr.size == 1:
            return jnp.asarray(arr.reshape(()), dtype=dtype)
        raise ValueError(f"Override with shape {arr.shape} incompatible with N={n}")

    args: Dict[str, jnp.ndarray] = {}
    keys: List[str] = []
    input_vars: List[str] = []
    for qname, lv in lowered.items():
        if lv.kind == "param":
            args[qname] = _vectorize(overrides.get(qname), lv.default)
            keys.append(qname)
        elif lv.kind == "input":
            # inputs always materialize as (N,) placeholders so external feeds broadcast
            base = overrides.get(qname)
            if base is None:
                args[qname] = jnp.full((n,), lv.default, dtype=dtype)
            else:
                args[qname] = jnp.broadcast_to(_vectorize(base, lv.default), (n,)).astype(dtype)
            keys.append(qname)
            input_vars.append(qname)
    # 'bfloat16_master': store/train float32 master weights but run the matvec
    # in bf16 (the cast is loop-invariant, so XLA hoists it out of the scan);
    # gradients flow through the cast back to the f32 master -- the standard
    # mixed-precision training pattern.
    master_bf16 = str(coupling_dtype) in ("bfloat16_master", "bf16_master")
    # 'int8_master': float master weights, per-row int8 requantization hoisted
    # out of the scan, int8 x int8 matvec with STE gradients (ops/quant.py)
    master_int8 = str(coupling_dtype) == "int8_master"
    # 'int4_master' / frozen int4: one notch below int8 -- weights in [-7, 7]
    # (stored as int8 carriers at rest; int4 cannot cross jit/staging
    # boundaries on the axon relay), cast to int4 by prep INSIDE the program,
    # int4 x int8 matvec on the MXU (ops/quant.py int4 section)
    master_int4 = str(coupling_dtype) == "int4_master"
    int4_coupling = str(coupling_dtype) in ("int4", str(jnp.int4))
    w_dtype = (dtype if (master_bf16 or master_int8 or master_int4
                         or int4_coupling) else (coupling_dtype or dtype))
    int8_coupling = w_dtype == jnp.int8
    w_scales: Dict[str, jnp.ndarray] = {}
    block_q_mv: Dict[str, Callable] = {}  # int8_master block-sparse matvecs
    master_dense_keys: List[str] = []  # int8/int4_master dense couplings (prep_args)
    int4_frozen_keys: List[str] = []  # frozen int4 couplings (prep_args cast)

    def _check_int8_fan_in(n_in: int, wkey: str):
        # int8 x int8 accumulates in int32: worst case 127*127*n_in per output
        from ..ops.quant import INT8_DOT_MAX_FAN_IN

        if n_in >= INT8_DOT_MAX_FAN_IN:
            raise ValueError(
                f"Dense int8 coupling {wkey!r} has fan-in {n_in} >= "
                f"{INT8_DOT_MAX_FAN_IN}, which can overflow the int32 "
                f"accumulator in the worst case. Use a block-sparse coupling "
                f"(fan-in bounded per row) or bfloat16/float32 at this size.")
    def _check_int4_fan_in(n_in: int, wkey: str):
        from ..ops.quant import INT4_DOT_MAX_FAN_IN

        if n_in >= INT4_DOT_MAX_FAN_IN:
            raise ValueError(
                f"Dense int4 coupling {wkey!r} has fan-in {n_in} >= "
                f"{INT4_DOT_MAX_FAN_IN}, which can overflow the int32 "
                f"accumulator in the worst case.")

    for _, _, W, wkey in all_edges:
        if hasattr(W, "blocks") and (master_int4 or int4_coupling):
            raise NotImplementedError(
                "int4 coupling is dense-only; use 'int8_master'/'int8' for "
                "block-sparse couplings (their fan-in is already bounded per "
                "row, so the int8 weight stream is the proven fast path).")
        if hasattr(W, "blocks") and master_int8:
            # int8_master blocks: float master blocks + a build-time STE
            # quantized matvec (the block structure is concrete here, so the
            # transposed table for the backward is built once)
            from ..ops.quant import make_block_int8_master_matvec

            args[wkey] = jnp.asarray(W.blocks, dtype=dtype)
            args[wkey + "__cols"] = jnp.asarray(W.cols, dtype=jnp.int32)
            keys.extend([wkey, wkey + "__cols"])
            block_q_mv[wkey] = make_block_int8_master_matvec(W.cols)
            continue
        if hasattr(W, "blocks"):
            # block-sparse coupling (ops/sparse.py): blocks stream at w_dtype,
            # the block-column index table rides along as an int32 arg
            if int8_coupling:
                # symmetric per-output-row int8, like the dense path: each
                # global output row i = r*bs + i_local gets its own scale.
                # Quantized ON DEVICE: numpy's round() ufunc on this class of
                # host measures ~1.4 us/element (141 s for a dense 10k x 10k
                # master!) while staging the f32 tensor and quantizing on the
                # accelerator costs ~1 s total; the f32 staging buffer is
                # dropped right after.
                from ..ops.quant import quantize_blocks_jit

                b32 = jnp.asarray(np.asarray(W.blocks, dtype=np.float32))
                wq, scale = quantize_blocks_jit(b32)
                del b32
                args[wkey] = wq
                args[wkey + "__scale"] = scale
                keys.append(wkey + "__scale")
                w_scales[wkey] = args[wkey + "__scale"]
            else:
                args[wkey] = jnp.asarray(W.blocks, dtype=w_dtype)
            args[wkey + "__cols"] = jnp.asarray(W.cols, dtype=jnp.int32)
            keys.extend([wkey, wkey + "__cols"])
            continue
        if int8_coupling:
            # symmetric per-row int8 quantization: W ~ scale[:, None] * W_q.
            # The matvec runs int8 x int8 on the MXU (native on v5e+), halving
            # HBM traffic again vs bf16; the dynamic activation scale costs
            # one O(N) reduction per step.
            _check_int8_fan_in(int(np.shape(W)[1]), wkey)
            # quantized ON DEVICE (see the block-sparse branch above: numpy's
            # round() on a (10k, 10k) master costs minutes on this host class;
            # ship f32, quantize in ~ms, drop the f32 staging buffer)
            from ..ops.quant import quantize_rows_jit

            W32 = jnp.asarray(np.asarray(W, dtype=np.float32))
            wq, scale = quantize_rows_jit(W32)
            del W32
            args[wkey] = wq
            args[wkey + "__scale"] = scale
            keys.extend([wkey, wkey + "__scale"])
            w_scales[wkey] = args[wkey + "__scale"]
        elif int4_coupling:
            # frozen int4: per-row [-7, 7] quantization, int8 CARRIER at rest
            # (int4 cannot cross staging boundaries on the axon relay); the
            # int4 cast happens in prep_args, inside the program
            _check_int4_fan_in(int(np.shape(W)[1]), wkey)
            from ..ops.quant import quantize_rows_i4_jit

            W32 = jnp.asarray(np.asarray(W, dtype=np.float32))
            wq, scale = quantize_rows_i4_jit(W32)
            del W32
            args[wkey] = wq
            args[wkey + "__scale"] = scale
            keys.extend([wkey, wkey + "__scale"])
            w_scales[wkey] = args[wkey + "__scale"]
            int4_frozen_keys.append(wkey)
        else:
            if master_int8:
                _check_int8_fan_in(int(np.shape(W)[1]), wkey)
                master_dense_keys.append(wkey)
            elif master_int4:
                _check_int4_fan_in(int(np.shape(W)[1]), wkey)
                master_dense_keys.append(wkey)
            args[wkey] = jnp.asarray(W, dtype=w_dtype)
            keys.append(wkey)

    # int8_master inference prep: requantize the float master ONCE per scan
    # (network._prep_params calls this inside the jitted run program, outside
    # the lax.scan -- XLA's LICM does not reliably hoist the requantization
    # from the scan body, measured +82% step time inline).  The prepped
    # (wq, scale) pairs ride along in args under reserved "__q"/"__qs" keys;
    # _coupling_matvec picks them up.  Inference-only: the plain-autodiff
    # TRAINING fallback keeps the per-step custom-VJP matvec so master-weight
    # gradients stay exact (the deferred trajectories prep internally).
    prep_args = None
    if master_int8 and (master_dense_keys or block_q_mv):
        _block_keys = sorted(block_q_mv.keys())

        def prep_args(a: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
            from ..ops.quant import quantize_blocks, quantize_rows

            a = dict(a)
            for wk in master_dense_keys:
                a[wk + "__q"], a[wk + "__qs"] = quantize_rows(a[wk])
            for wk in _block_keys:
                a[wk + "__q"], a[wk + "__qs"] = quantize_blocks(a[wk])
            return a
    elif master_int4 and master_dense_keys:

        def prep_args(a: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
            from ..ops.quant import _i4_prep

            a = dict(a)
            for wk in master_dense_keys:
                a[wk + "__q"], a[wk + "__qs"] = _i4_prep(a[wk])
            return a
    elif int4_frozen_keys:
        _i4_keys = list(int4_frozen_keys)

        def prep_args(a: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
            # loop-invariant int8-carrier -> int4 cast, hoisted out of the
            # scan (LICM does not reliably hoist precision transforms)
            a = dict(a)
            for wk in _i4_keys:
                a[wk + "__q4"] = a[wk].astype(jnp.int4)
            return a

    int4_frozen = frozenset(int4_frozen_keys)

    def _coupling_matvec(w, src, a=None, wkey=None):
        if (master_int4 and a is not None and wkey is not None
                and wkey + "__q" in a):
            # prepped int4_master path (inference scans)
            from ..ops.quant import _mv4_prepped

            wp = (a[wkey + "__q"], a[wkey + "__qs"])
            return _mv4_prepped(wp, src).astype(src.dtype)
        if master_int4 and w.ndim == 2 and wkey not in int4_frozen:
            # plain-autodiff training fallback: per-step STE custom VJP
            from ..ops.quant import int4_master_matvec

            return int4_master_matvec(w, src).astype(src.dtype)
        if wkey in int4_frozen:
            # frozen int4: STE-round activations to int8, int4 x int8 dot.
            # Prefer the prepped int4 cast; fall back to an in-body cast
            # (correct, just slower) if prep was not applied.
            w4 = (a[wkey + "__q4"] if a is not None and wkey + "__q4" in a
                  else w.astype(jnp.int4))
            s_max = jnp.maximum(jnp.max(jnp.abs(src)), 1e-30)
            s_scale = jax.lax.stop_gradient(s_max / 127.0)
            scaled = src / s_scale
            rounded = scaled + jax.lax.stop_gradient(
                jnp.clip(jnp.round(scaled), -127, 127) - scaled)
            return (_int4_matvec(w4, rounded) * a[wkey + "__scale"]
                    * s_scale).astype(src.dtype)
        if (master_int8 and a is not None and wkey is not None
                and wkey + "__q" in a):
            # prepped int8_master path (inference scans): int8 matvec from
            # the hoisted (wq, scale) pair -- same numerics as the per-step
            # custom-VJP matvec's forward
            wp = (a[wkey + "__q"], a[wkey + "__qs"])
            if wp[0].ndim == 4:
                from ..ops.quant import block_int8_mv

                return block_int8_mv(wp, a[wkey + "__cols"], src)
            from ..ops.quant import _mv_prepped

            return _mv_prepped(wp, src).astype(src.dtype)
        if wkey in block_q_mv:  # int8_master block-sparse (ops/quant.py)
            return block_q_mv[wkey](w, src).astype(src.dtype)
        if w.ndim == 4:  # block-sparse (ops/sparse.py)
            from ..ops.sparse import block_sparse_matvec

            if w.dtype == jnp.int8:
                # int8 x int8 block contraction with int32 accumulation and
                # the same dynamic-activation-scale STE as the dense path
                n_br, cb, bs, _ = w.shape
                s_max = jnp.maximum(jnp.max(jnp.abs(src)), 1e-30)
                s_scale = jax.lax.stop_gradient(s_max / 127.0)
                scaled = src / s_scale
                rounded = scaled + jax.lax.stop_gradient(
                    jnp.clip(jnp.round(scaled), -127, 127) - scaled)
                s_blk = rounded.reshape(-1, bs)[a[wkey + "__cols"]].astype(jnp.int8)
                acc = jnp.einsum("rcij,rcj->ri", w, s_blk,
                                 preferred_element_type=jnp.int32)
                out = acc.astype(jnp.float32) * a[wkey + "__scale"] * s_scale
                return out.reshape(n_br * bs).astype(src.dtype)
            cast = jnp.bfloat16 if (master_bf16 or w.dtype == jnp.bfloat16) else None
            return block_sparse_matvec(w, a[wkey + "__cols"], src, cast_dtype=cast)
        if master_int8 and w.ndim == 2:
            from ..ops.quant import int8_master_matvec

            return int8_master_matvec(w, src).astype(src.dtype)
        if w.dtype == jnp.int8:
            s_max = jnp.maximum(jnp.max(jnp.abs(src)), 1e-30)
            s_scale = jax.lax.stop_gradient(s_max / 127.0)
            scaled = src / s_scale
            # straight-through estimator: forward rounds to int8, backward
            # passes the gradient through unquantized (round() is zero-grad
            # a.e., which would silently kill BPTT through the coupling)
            rounded = scaled + jax.lax.stop_gradient(
                jnp.clip(jnp.round(scaled), -127, 127) - scaled)
            return (_int8_matvec(w, rounded) * a[wkey + "__scale"] * s_scale).astype(src.dtype)
        if master_bf16 or w.dtype in (jnp.bfloat16, jnp.float16):
            cast_dtype = jnp.bfloat16 if master_bf16 else w.dtype
            out = jax.lax.dot_general(
                w.astype(cast_dtype), src.astype(cast_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.astype(src.dtype)
        return w @ src

    # initial state, contiguous per-variable blocks
    y0_parts = []
    var_map: Dict[str, Tuple[int, int]] = {}
    offset = 0
    for qname in state_order:
        lv = lowered[qname]
        init = overrides.get(qname)
        if init is None:
            block = np.full((n,), lv.default, dtype=np.float64)
        else:
            block = np.broadcast_to(np.asarray(init, dtype=np.float64), (n,))
        y0_parts.append(block)
        var_map[qname] = (offset, offset + n)
        offset += n
    y0 = jnp.asarray(np.concatenate(y0_parts) if y0_parts else np.zeros((0,)), dtype=dtype)

    # ------------------------------------------------------- evaluation schedule
    # Topologically order input + algebraic evaluations.  Dependencies:
    #   algebraic var -> free symbols within its own op
    #   input var     -> wiring source and edge sources
    pending: Dict[str, set] = {}
    for qname, lv in lowered.items():
        if lv.kind == "algebraic":
            deps = set()
            for sym in free_symbols(lv.rhs_ast):
                if sym in CONSTANTS and f"{lv.op}/{sym}" not in lowered:
                    continue
                dep = f"{lv.op}/{sym}"
                if lowered[dep].kind in ("algebraic", "input"):
                    deps.add(dep)
            pending[qname] = deps
        elif lv.kind == "input":
            deps = set()
            if qname in wiring and lowered[wiring[qname]].kind in ("algebraic", "input"):
                deps.add(wiring[qname])
            for esv, etv, _, _ in all_edges:
                if etv == qname and lowered[esv].kind in ("algebraic", "input"):
                    deps.add(esv)
            pending[qname] = deps
    schedule: List[str] = []
    while pending:
        ready = [q for q, deps in pending.items() if not deps]
        if not ready:
            raise TemplateError(
                f"Cyclic instantaneous dependency among variables {sorted(pending)}"
            )
        for q in sorted(ready):
            schedule.append(q)
            del pending[q]
            for deps in pending.values():
                deps.discard(q)

    edge_by_target: Dict[str, List[Tuple[str, str]]] = {}
    for esv, etv, _, wkey in all_edges:
        edge_by_target.setdefault(etv, []).append((esv, wkey))

    state_slices = [(q, var_map[q]) for q in state_order]
    ode_rhs = [(q, lowered[q].rhs_ast, lowered[q].op) for q in state_order]
    alg_items = {q: (lowered[q].rhs_ast, lowered[q].op) for q in schedule if lowered[q].kind == "algebraic"}

    def _build_env(y, a: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Trace-time evaluation of all state slices, inputs and algebraic vars."""
        env: Dict[str, jnp.ndarray] = {}
        for qname, (lo, hi) in state_slices:
            env[qname] = y[lo:hi]
        for k in keys:
            env[k] = a[k]

        def op_env(opname):
            scoped = {}
            for q, v in env.items():
                o, _, bare = q.partition("/")
                if o == opname:
                    scoped[bare] = v
            return scoped

        for qname in schedule:
            lv = lowered[qname]
            if lv.kind == "algebraic":
                rhs_ast, opname = alg_items[qname]
                env[qname] = evaluate(rhs_ast, op_env(opname))
            else:  # input: placeholder + wiring + coupling
                val = env[qname]
                if qname in wiring:
                    val = val + env[wiring[qname]]
                for esv, wkey in edge_by_target.get(qname, []):
                    val = val + _coupling_matvec(a[wkey], env[esv], a, wkey)
                env[qname] = val
        env["__op_env__"] = op_env  # type: ignore[assignment]
        return env

    def func(t, y, a: Dict[str, jnp.ndarray]):
        del t  # autonomous systems only (matches the reference's Euler call f(0, y, ...))
        env = _build_env(y, a)
        op_env = env.pop("__op_env__")
        dy_parts = []
        for qname, rhs_ast, opname in ode_rhs:
            dv = evaluate(rhs_ast, op_env(opname))
            dy_parts.append(jnp.broadcast_to(dv, (n,)))
        return jnp.concatenate(dy_parts) if dy_parts else jnp.zeros_like(y)

    alg_names = [q for q in schedule if lowered[q].kind == "algebraic"]

    # ---- tile-local variant (for fused kernels) -----------------------------
    # Evaluates the same schedule on per-tile blocks: states/params arrive as
    # tile slices and every coupling contribution is supplied precomputed via
    # ``ext`` (the matvec needs the full population and happens outside).
    # Population reductions (mean/sum/min/max over neurons) are global, so
    # templates using them are flagged tile_local=False: the trajectories may
    # still call tile_func on the FULL population, tiled callers must refuse.
    def _uses_reduction(ast) -> bool:
        tag = ast[0]
        if tag == "call":
            if ast[1] in ("mean", "sum", "min", "max"):
                return True
            return any(_uses_reduction(x) for x in ast[2])
        if tag == "neg":
            return _uses_reduction(ast[1])
        if tag == "bin":
            return _uses_reduction(ast[2]) or _uses_reduction(ast[3])
        return False

    any_reduction = any(
        lv.rhs_ast is not None and _uses_reduction(lv.rhs_ast) for lv in lowered.values())

    def tile_func(states: Dict[str, jnp.ndarray], a_tile: Dict[str, jnp.ndarray],
                  ext: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        env: Dict[str, jnp.ndarray] = dict(states)
        for k in keys:
            if k in a_tile:
                env[k] = a_tile[k]

        def op_env(opname):
            scoped = {}
            for q, v in env.items():
                o, _, bare = q.partition("/")
                if o == opname:
                    scoped[bare] = v
            return scoped

        for qname in schedule:
            lv = lowered[qname]
            if lv.kind == "algebraic":
                rhs_ast, opname = alg_items[qname]
                env[qname] = evaluate(rhs_ast, op_env(opname))
            else:
                val = env.get(qname, jnp.asarray(lv.default))
                if qname in wiring:
                    val = val + env[wiring[qname]]
                if qname in ext:
                    val = val + ext[qname]
                env[qname] = val
        shape = next(iter(states.values())).shape
        out = {}
        for qname, rhs_ast, opname in ode_rhs:
            out[qname] = jnp.broadcast_to(evaluate(rhs_ast, op_env(opname)), shape)
        return out

    # Reduction templates keep tile_func -- evaluated on the FULL (N,)
    # population by the deferred-gradient trajectories (ops/bptt.py,
    # ops/graph_bptt.py) the reductions are the true population means -- but
    # are NOT tile-local: the fused Pallas kernels (ops/generic_fused.py)
    # must refuse them (a tile-wise mean() would silently be tile-local).
    tile_is_local = not any_reduction

    def make_tile_reader(qname: str, allow_global: bool = False):
        """Reader for a state or algebraic variable that depends
        (transitively) only on states/params -- returns None when the chain
        touches an input variable (coupling/external values are global).
        ``allow_global=True`` (the trajectories, which evaluate on the full
        population) additionally admits reduction-using templates; the
        default refuses them (tile-local callers)."""
        if any_reduction and not allow_global:
            return None
        if qname in var_map:
            return lambda states, a_tile: states[qname]
        if qname not in lowered or lowered[qname].kind != "algebraic":
            return None

        # transitive dependency check: coupling/externally-driven input vars
        # are global; inputs that are only intra-node WIRING pass through
        def deps_ok(q, seen=()):
            lv = lowered[q]
            if lv.kind in ("state", "param"):
                return True
            if lv.kind == "input":
                if q in edge_by_target:
                    return False  # coupling-driven: needs the global matvec
                if q in wiring:
                    return deps_ok(wiring[q], seen + (q,))
                return True  # pure external placeholder (tile-sliceable)
            for sym in free_symbols(lv.rhs_ast):
                if sym in CONSTANTS and f"{lv.op}/{sym}" not in lowered:
                    continue
                dep = f"{lv.op}/{sym}"
                if dep in seen:
                    continue
                if not deps_ok(dep, seen + (q,)):
                    return False
            return True

        if not deps_ok(qname):
            return None

        def reader(states: Dict[str, jnp.ndarray], a_tile: Dict[str, jnp.ndarray]):
            env: Dict[str, jnp.ndarray] = dict(states)
            for k in keys:
                if k in a_tile:
                    env[k] = a_tile[k]

            def op_env(opname):
                return {q.partition("/")[2]: v for q, v in env.items()
                        if q.partition("/")[0] == opname}

            for q in schedule:
                lv = lowered[q]
                if lv.kind == "algebraic":
                    rhs_ast, opname = alg_items[q]
                    env[q] = evaluate(rhs_ast, op_env(opname))
                elif lv.kind == "input" and q in wiring:
                    env[q] = env.get(q, jnp.asarray(lv.default)) + env[wiring[q]]
                if q == qname:
                    break
            return env[qname]

        return reader

    def read_var(qname: str, y, a: Dict[str, jnp.ndarray]):
        """Read the current value of a state, algebraic, or input variable.

        ``vmap_full`` (below) binds late, so bare state-variable aliases work.
        """
        if qname in vmap_full:
            lo, hi = vmap_full[qname]
            return y[lo:hi]
        env = _build_env(y, a)
        env.pop("__op_env__")
        if qname not in env:
            raise KeyError(f"Variable {qname!r} not found in lowered population")
        return jnp.broadcast_to(env[qname], (n,))

    # user-facing name maps: qualified plus unambiguous bare names
    param_map: Dict[str, str] = {}
    for k in keys:
        param_map[k] = k
    bare_counts: Dict[str, int] = {}
    for k in keys:
        bare = k.split("/")[-1]
        bare_counts[bare] = bare_counts.get(bare, 0) + 1
    for k in keys:
        bare = k.split("/")[-1]
        if bare_counts[bare] == 1 and bare not in param_map:
            param_map[bare] = k
    vmap_full = dict(var_map)
    bare_counts = {}
    for k in var_map:
        bare = k.split("/")[-1]
        bare_counts[bare] = bare_counts.get(bare, 0) + 1
    for k in list(var_map):
        bare = k.split("/")[-1]
        if bare_counts[bare] == 1 and bare not in vmap_full:
            vmap_full[bare] = var_map[k]

    return VectorField(
        n=n,
        dtype=dtype,
        func=func,
        args=args,
        keys=keys,
        y0=y0,
        var_map=vmap_full,
        param_map=param_map,
        input_vars=input_vars,
        source_var=_qualify(source_var, ops) if source_var else None,
        target_var=_qualify(target_var, ops) if target_var else None,
        read_var=read_var,
        alg_vars=alg_names,
        tile_func=tile_func,
        tile_local=tile_is_local,
        state_order=list(state_order),
        make_tile_reader=make_tile_reader,
        couplings=[(esv, etv, wkey) for esv, etv, _, wkey in all_edges],
        coupling_cast=("bf16" if master_bf16 else
                       ("int8" if master_int8 else
                        ("int4" if master_int4 else None))),
        prep_args=prep_args,
    )
