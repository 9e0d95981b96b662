"""Dynamical-systems analysis: Jacobians, fixed points, linear stability.

Beyond-reference subsystem (the reference offers simulation and training
only; its users fall back to external tooling for the stability analysis
that motivates mean-field models in the first place).  Because every
lowered vector field is a pure JAX function, the Jacobian is one
``jax.jacobian`` call -- no finite differences, no re-derivation -- and a
damped Newton iteration on ``f(y) = 0`` gives machine-precision fixed
points whose eigenvalues classify the local dynamics.

All functions operate on the SMOOTH flow of one diffeq node (resets and
spike events are discontinuous and excluded) with the external input held
constant -- exactly the autonomous system whose linearization the standard
analyses (focus/node classification, Hopf detection, slow-manifold
reduction) require.  Works for any template: rate, mean-field, conductance
-based.

    from rectipy_tpu.analysis import fixed_point, stability
    y_star = fixed_point(net, inputs=2.0)
    eigs = stability(net, y=y_star, inputs=2.0)   # Re<0 -> locally stable

Reference: no analog (checked /root/reference/rectipy -- simulation and
training only).
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["autonomous_field", "jacobian", "basins", "fixed_point",
           "stability", "lyapunov_spectrum", "lyapunov_direct", "limit_cycle",
           "phase_plane"]


def _resolve_node(net, node: Optional[str]):
    """The diffeq node to analyze (explicit label, or the unique one)."""
    if node is not None:
        return node, net.get_node(node)
    # diffeq nodes carry a state vector y; InstantNodes only have func
    diffeq = [n for n in net.nodes if hasattr(net.get_node(n), "y")]
    if len(diffeq) != 1:
        raise ValueError(
            f"Network has {len(diffeq)} differential-equation nodes "
            f"({diffeq}); pass node=<label> to pick one.")
    return diffeq[0], net.get_node(diffeq[0])


def _check_closed_loop(net, label: str, open_loop: bool):
    """Edge-driven inputs are FROZEN at their stored values by the
    autonomous field -- analyzing a node whose recurrence arrives through
    graph/feedback edges would silently drop that coupling from the
    Jacobian, so refuse unless the caller opts in."""
    if open_loop:
        return
    preds = list(net.graph.predecessors(label))
    fb = [(u, v) for u, v, _ in getattr(net, "_fb_edge_list", lambda: [])()
          if v == label]
    if preds or fb:
        raise ValueError(
            f"Node {label!r} receives inputs through graph edges "
            f"({preds + fb}); the analysis functions freeze those at their "
            "stored values and would return the OPEN-LOOP linearization. "
            "Analyze a node whose recurrence lives in its own coupling "
            "(weights=/edges= on add_diffeq_node), or pass open_loop=True "
            "to accept the open-loop analysis deliberately.")


def autonomous_field(net, node: str = None, inputs=None, open_loop: bool = False):
    """``(f, y)``: the node's autonomous vector field ``f(y) -> dy/dt`` with
    the external input held constant at ``inputs`` (scalar or ``(n_in,)``;
    default: the input slot's stored value, normally zeros), plus the
    node's current state vector.  Couplings declared ON the node
    (``weights=`` / ``edges=`` of ``add_diffeq_node``) are part of the
    flow; inputs arriving through graph/feedback edges are NOT (they are
    frozen constants) -- such nodes raise unless ``open_loop=True``."""
    label, nd = _resolve_node(net, node)
    _check_closed_loop(net, label, open_loop)
    args = dict(nd.args)
    if inputs is not None:
        cur = args[nd._inp_key]
        inp = jnp.asarray(inputs, dtype=nd.dtype)
        args[nd._inp_key] = jnp.broadcast_to(inp, np.shape(cur)) \
            if np.ndim(cur) else inp.reshape(())
    func = nd.func

    def f(y):
        return func(0.0, y, args)

    return f, nd.y


def _node_programs(nd):
    """Jitted (f, jacobian, newton) programs for a node, CACHED on the node
    object (CLAUDE.md rule: cache jitted closures -- remote compiles are
    expensive, and a 20-point continuation would otherwise recompile per
    point).  ``args`` ride as arguments, so parameter changes (continued
    eta, different inputs) reuse the same compiled programs."""
    cache = nd.__dict__.setdefault("_analysis_programs", {})
    if "f" not in cache:  # keyed entries (lyap/monodromy) share this dict
        func = nd.func

        def f(y, args):
            return func(0.0, y, args)

        def jac(y, args):
            return jax.jacobian(lambda yy: func(0.0, yy, args))(y)

        def newton(y, args, tol, damping, max_iter):
            # whole damped-Newton loop ON DEVICE: one dispatch per solve,
            # no per-iteration host round-trips
            def resid(yv):
                return jnp.max(jnp.abs(f(yv, args)))

            def cond(carry):
                yv, it = carry
                return (it < max_iter) & (resid(yv) > tol * (1.0 + jnp.max(jnp.abs(yv))))

            def body(carry):
                yv, it = carry
                step = jnp.linalg.solve(jac(yv, args), f(yv, args))
                return yv - damping * step, it + 1

            y_star, iters = jax.lax.while_loop(cond, body, (y, jnp.asarray(0)))
            return y_star, resid(y_star), iters

        cache["f"] = jax.jit(f)
        cache["jac"] = jax.jit(jac)
        cache["newton"] = jax.jit(newton)
    return cache


def _field_args(net, node, inputs, open_loop):
    label, nd = _resolve_node(net, node)
    _check_closed_loop(net, label, open_loop)
    args = dict(nd.args)
    if inputs is not None:
        cur = args[nd._inp_key]
        inp = jnp.asarray(inputs, dtype=nd.dtype)
        args[nd._inp_key] = jnp.broadcast_to(inp, np.shape(cur)) \
            if np.ndim(cur) else inp.reshape(())
    return nd, args


def jacobian(net, node: str = None, y=None, inputs=None,
             open_loop: bool = False) -> jnp.ndarray:
    """Jacobian ``df/dy`` of the node's smooth flow at state ``y`` (default:
    the node's current state) -- exact, via ``jax.jacobian``."""
    nd, args = _field_args(net, node, inputs, open_loop)
    y = nd.y if y is None else jnp.asarray(y, dtype=nd.y.dtype)
    return _node_programs(nd)["jac"](y, args)


def fixed_point(net, node: str = None, y0=None, inputs=None, tol: float = None,
                max_iter: int = 100, damping: float = 1.0,
                open_loop: bool = False) -> jnp.ndarray:
    """Damped Newton solve of ``f(y) = 0`` from ``y0`` (default: the node's
    current state).  The whole iteration runs as one cached on-device
    program (continuations over a parameter pay one compile total).
    Raises if the residual does not reach ``tol * (1 + |y*|)`` within
    ``max_iter`` iterations (try a smaller ``damping`` or a better ``y0``
    -- e.g. the tail of a short ``run``).  ``tol`` defaults to
    ``1000 * eps`` of the node's dtype (~1e-4 in float32, ~2e-11 in
    float64 -- use a float64 network for tight equilibria)."""
    nd, args = _field_args(net, node, inputs, open_loop)
    y = nd.y if y0 is None else jnp.asarray(y0, dtype=nd.y.dtype)
    if tol is None:
        tol = 1000.0 * float(jnp.finfo(y.dtype).eps)
    y_star, resid, iters = _node_programs(nd)["newton"](
        y, args, jnp.asarray(tol, dtype=y.dtype),
        jnp.asarray(damping, dtype=y.dtype), int(max_iter))
    resid = float(resid)
    if not (resid <= tol * (1.0 + float(jnp.max(jnp.abs(y_star))))) \
            or not np.isfinite(resid):
        raise RuntimeError(
            f"fixed_point: Newton did not converge in {max_iter} iterations "
            f"(max |f| = {resid:.3e}); try damping < 1 or a closer y0.")
    return y_star


def _flow_map(nd):
    """``m(y, args, dt) -> y_next``: ONE step of the node's OWN integrator
    (euler/heun/rk4, matching nodes.py:make_step exactly) on the smooth
    flow — so trajectory-based analyses characterize the same discrete map
    ``run()`` integrates."""
    func = nd.func
    integ = getattr(nd, "integrator", "euler")
    if integ == "heun":
        def m(y, args, dt):
            k1 = func(0.0, y, args)
            k2 = func(0.0, y + dt * k1, args)
            return y + (dt * 0.5) * (k1 + k2)
    elif integ == "rk4":
        def m(y, args, dt):
            k1 = func(0.0, y, args)
            k2 = func(0.0, y + (dt * 0.5) * k1, args)
            k3 = func(0.0, y + (dt * 0.5) * k2, args)
            k4 = func(0.0, y + dt * k3, args)
            return y + (dt / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)
    else:
        def m(y, args, dt):
            return y + dt * func(0.0, y, args)
    return m


def _check_smooth_trajectory(nd, fn_name: str):
    """Trajectory-based analyses integrate the RESET-FREE flow; on spiking
    nodes that flow is not what ``run()`` simulates (QIF's v^2 escapes in
    finite time without the reset) — refuse with the right pointer."""
    from .nodes import RateNet

    if type(nd) is not RateNet and isinstance(nd, RateNet):
        raise ValueError(
            f"{fn_name} integrates the node's smooth (reset-free) flow, but "
            f"{type(nd).__name__} dynamics are reset-dominated — the "
            "reset-free trajectory diverges or is meaningless. Use "
            "lyapunov_direct(net), which evolves the FULL network step "
            "(spikes and resets included), instead.")


def _lyap_program(nd, k: int, n_blocks: int, reorth: int, transient: int):
    """Jitted Benettin iteration: evolve the state with the node's own
    integrator map while co-evolving ``k`` tangent vectors through the
    map's EXACT differential (one jvp per column, no dense Jacobian),
    QR-reorthonormalizing every ``reorth`` steps and accumulating
    ``log|diag R|``.  One device program for the whole estimate; cached on
    the node like the Newton solver."""
    cache = nd.__dict__.setdefault("_analysis_programs", {})
    key = ("lyap", k, n_blocks, reorth, transient)
    if key not in cache:
        fmap = _flow_map(nd)

        def run(y, Q, args, dt):
            def advance(yy, _):
                return fmap(yy, args, dt), None

            def step(carry, _):
                yy, Qm = carry
                jQ = jax.vmap(
                    lambda q: jax.jvp(lambda v: fmap(v, args, dt), (yy,), (q,))[1],
                    in_axes=1, out_axes=1)(Qm)
                return (fmap(yy, args, dt), jQ), None

            def block(carry, _):
                yy, Qm, acc = carry
                (yy, Qm), _ = jax.lax.scan(step, (yy, Qm), None, length=reorth)
                Qm, R = jnp.linalg.qr(Qm)
                d = jnp.abs(jnp.diagonal(R))
                tiny = jnp.asarray(jnp.finfo(d.dtype).tiny, dtype=d.dtype)
                return (yy, Qm, acc + jnp.log(jnp.maximum(d, tiny))), None

            if transient:
                y, _ = jax.lax.scan(advance, y, None, length=transient)
            acc0 = jnp.zeros(k, dtype=y.dtype)
            (_, _, acc), _ = jax.lax.scan(block, (y, Q, acc0), None,
                                          length=n_blocks)
            return acc / (n_blocks * reorth * dt)

        cache[key] = jax.jit(run)
    return cache[key]


def lyapunov_spectrum(net, node: str = None, k: int = 1, steps: int = 50_000,
                      transient: int = 0, reorth: int = 10, y0=None,
                      inputs=None, seed: int = 0,
                      open_loop: bool = False) -> np.ndarray:
    """Leading ``k`` Lyapunov exponents of the node's simulated dynamics
    (Benettin/QR method), in descending order, units of 1/time.

    The exponents are those of the DISCRETE map the framework integrates
    (the node's own euler/heun/rk4 step, reference Euler semantics at
    /root/reference/rectipy/nodes.py:166-170), propagated through its
    exact differential — so they converge to the flow's exponents as
    ``dt`` is refined and are exact for what ``run()`` actually simulates.
    Smooth flows only: spiking (reset) nodes raise — use
    :func:`lyapunov_direct` for those.  Quantized couplings are fine HERE
    (the STE custom-VJP yields the smoothed differential of the
    quantized-valued map — checked: the Jacobian shifts only by the weight
    quantization itself), unlike in the finite-difference
    :func:`lyapunov_direct`, which rejects them.  ``lambda_max > 0`` = chaos
    (e.g. the Sompolinsky-Crisanti-Sommers transition of random tanh-rate
    networks at gain g > 1, tested); a limit cycle shows a leading
    exponent ~0 (neutral along the flow) with the rest negative.

    ``steps`` map applications after ``transient`` warmup steps (from
    ``y0``/the node's current state); external input frozen at ``inputs``
    (see :func:`autonomous_field` — smooth flows only, spiking resets are
    discontinuous and excluded).  ``reorth``: steps between QR
    reorthonormalizations (shorten for strongly expanding systems).
    ``seed`` draws the initial orthonormal tangent frame.  The whole
    estimate runs as ONE cached on-device program per (k, steps, reorth,
    transient) shape — parameter sweeps (exponent vs gain) recompile
    nothing.
    """
    nd, args = _field_args(net, node, inputs, open_loop)
    _check_smooth_trajectory(nd, "lyapunov_spectrum")
    y = nd.y if y0 is None else jnp.asarray(y0, dtype=nd.y.dtype)
    n = int(y.shape[0])
    if not 1 <= k <= n:
        raise ValueError(f"k must be in [1, {n}] (state dimension), got {k}")
    if steps < reorth:
        raise ValueError(f"steps ({steps}) must be >= reorth ({reorth})")
    if steps % reorth:
        warnings.warn(f"lyapunov_spectrum: using {steps - steps % reorth} of "
                      f"the requested {steps} steps (steps % reorth dropped)",
                      stacklevel=2)
    n_blocks = steps // reorth
    rng = np.random.default_rng(seed)
    Q0, _ = np.linalg.qr(rng.standard_normal((n, k)))
    prog = _lyap_program(nd, k, n_blocks, int(reorth), int(transient))
    lam = prog(y, jnp.asarray(Q0, dtype=y.dtype), args,
               jnp.asarray(net.dt, dtype=y.dtype))
    lam = np.asarray(lam, dtype=np.float64)
    if not np.all(np.isfinite(lam)):
        raise RuntimeError(
            f"lyapunov_spectrum diverged (exponents {lam}); the trajectory "
            "likely blew up — reduce dt, add a transient, or start from an "
            "attractor state.")
    return np.sort(lam)[::-1]


def phase_plane(net, node: str = None, dims=(0, 1), bounds=None,
                n_grid: int = 41, y_fixed=None, inputs=None,
                open_loop: bool = False) -> dict:
    """Vector field of the node's smooth flow sampled on a 2-D grid — the
    phase-plane/nullcline workhorse for the planar models (FitzHugh-Nagumo,
    Morris-Lecar, Wilson-Cowan, MPR, Hindmarsh-Rose fast subsystem).

    ``dims``: the two state-vector indices spanning the plane; every other
    coordinate is held at ``y_fixed`` (default: the node's current state).
    ``bounds``: ``((x_min, x_max), (y_min, y_max))``; defaults to ±2 around
    the current state's values on ``dims``.  The whole ``n_grid²`` grid is
    evaluated as one vmapped device call.

    Returns ``{"x", "y"}`` (the 1-D grid axes) and ``{"dx", "dy"}`` —
    ``(n_grid, n_grid)`` arrays of the two flow components, indexed
    ``[i_y, i_x]`` (matplotlib ``quiver``/``streamplot`` convention, so
    ``plt.streamplot(r["x"], r["y"], r["dx"], r["dy"])`` works directly);
    nullclines are the zero contours, e.g.
    ``plt.contour(r["x"], r["y"], r["dx"], levels=[0])``.
    """
    nd, args = _field_args(net, node, inputs, open_loop)
    y0 = nd.y if y_fixed is None else jnp.asarray(y_fixed, dtype=nd.y.dtype)
    n = int(y0.shape[0])
    i, j = int(dims[0]), int(dims[1])
    if not (0 <= i < n and 0 <= j < n and i != j):
        raise ValueError(f"dims must be two distinct indices in [0, {n}), got {dims}")
    if bounds is None:
        ci, cj = float(y0[i]), float(y0[j])
        bounds = ((ci - 2.0, ci + 2.0), (cj - 2.0, cj + 2.0))
    xs = np.linspace(*bounds[0], n_grid)
    ys = np.linspace(*bounds[1], n_grid)
    X, Y = np.meshgrid(xs, ys)  # [i_y, i_x]
    pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], axis=1), dtype=y0.dtype)
    # program cached per (dims, grid size); grid values / base state / args
    # ride as arguments, so bound or parameter sweeps recompile nothing
    cache = nd.__dict__.setdefault("_analysis_programs", {})
    key = ("phase_plane", i, j, n_grid)
    if key not in cache:
        func = nd.func

        def grid_field(pts, y_base, args):
            def f_at(p):
                y = y_base.at[i].set(p[0]).at[j].set(p[1])
                dy = func(0.0, y, args)
                return jnp.stack([dy[i], dy[j]])

            return jax.vmap(f_at)(pts)

        cache[key] = jax.jit(grid_field)
    d = np.asarray(cache[key](pts, y0, args))
    return {"x": xs, "y": ys,
            "dx": d[:, 0].reshape(n_grid, n_grid),
            "dy": d[:, 1].reshape(n_grid, n_grid)}


def basins(net, node: str = None, ics=None, attractors=None, inputs=None,
           steps: int = 50_000, tol: float = 1e-3, open_loop: bool = False):
    """Basin-of-attraction classification: integrate the node's smooth flow
    from every initial condition and assign each endpoint to the nearest
    attractor.

    ``ics``: ``(B, n_state)`` initial conditions (e.g. a meshgrid over two
    coordinates with the rest held at the current state).  ``attractors``:
    list/array of attractor state vectors — typically `fixed_point` results
    from several warm starts (stable ones; handing in a saddle will
    classify its stable manifold's measure-zero neighborhood as a basin).
    All ``B`` trajectories run as ONE vmapped device scan of the node's own
    integrator map (cached on the node; ics/attractors/params are program
    arguments, so grids and parameter sweeps recompile nothing).

    Returns ``(labels, endpoints)``: ``labels[b]`` is the index into
    ``attractors`` whose max-norm relative distance to the endpoint is
    smallest AND below ``tol`` — else ``-1`` (diverged, on a limit cycle,
    or still in transit; raise ``steps`` or ``tol``).  Like the other
    trajectory analyses this integrates the RESET-FREE flow and refuses
    spiking nodes (use the full-network `lyapunov_direct` machinery for
    those regimes).
    """
    nd, args = _field_args(net, node, inputs, open_loop)
    _check_smooth_trajectory(nd, "basins")
    if ics is None or attractors is None:
        raise ValueError("basins needs ics (B, n_state) and a list of "
                         "attractor state vectors (see fixed_point).")
    ics = jnp.asarray(ics, dtype=nd.y.dtype)
    attrs = jnp.asarray(attractors, dtype=nd.y.dtype)
    if ics.ndim != 2 or ics.shape[1] != nd.y.shape[0]:
        raise ValueError(f"ics must be (B, {nd.y.shape[0]}); got {ics.shape}")
    if attrs.ndim != 2 or attrs.shape[1] != nd.y.shape[0]:
        raise ValueError(
            f"attractors must be (K, {nd.y.shape[0]}); got {attrs.shape}")
    cache = nd.__dict__.setdefault("_analysis_programs", {})
    key = ("basins", int(steps))
    if key not in cache:
        fmap = _flow_map(nd)

        def endpoints(ics, args, dt):
            def roll(y, _):
                return fmap(y, args, dt), None

            def one(y0):
                y, _ = jax.lax.scan(roll, y0, None, length=steps)
                return y

            return jax.vmap(one)(ics)

        cache[key] = jax.jit(endpoints)
    ends = cache[key](ics, args, jnp.asarray(net.dt, dtype=nd.y.dtype))
    # relative max-norm distance endpoint -> each attractor
    scale = 1.0 + jnp.max(jnp.abs(attrs), axis=1)              # (K,)
    dist = jnp.max(jnp.abs(ends[:, None, :] - attrs[None]), axis=2) / scale
    best = jnp.argmin(dist, axis=1)
    ok = jnp.min(dist, axis=1) <= tol
    labels = jnp.where(ok & jnp.all(jnp.isfinite(ends), axis=1), best, -1)
    return np.asarray(labels), np.asarray(ends)


def _traj_program(nd, steps: int, transient: int):
    """Jitted trajectory collector: ``transient`` warmup steps WITHOUT
    recording (no wasted device buffer or host transfer), then ``steps``
    recorded states, via the node's own integrator map."""
    cache = nd.__dict__.setdefault("_analysis_programs", {})
    key = ("traj", steps, transient)
    if key not in cache:
        fmap = _flow_map(nd)

        def run(y, args, dt):
            def warm(yy, _):
                return fmap(yy, args, dt), None

            def rec(yy, _):
                yn = fmap(yy, args, dt)
                return yn, yn

            if transient:
                y, _ = jax.lax.scan(warm, y, None, length=transient)
            _, ys = jax.lax.scan(rec, y, None, length=steps)
            return ys

        cache[key] = jax.jit(run)
    return cache[key]


def _monodromy_program(nd, k_steps: int):
    """Jitted Jacobian of the ``k_steps``-fold integrator map (the
    monodromy matrix when ``k_steps`` spans one period)."""
    cache = nd.__dict__.setdefault("_analysis_programs", {})
    key = ("monodromy", k_steps)
    if key not in cache:
        fmap = _flow_map(nd)

        def flow(y, args, dt):
            def advance(yy, _):
                return fmap(yy, args, dt), None

            yT, _ = jax.lax.scan(advance, y, None, length=k_steps)
            return yT

        cache[key] = jax.jit(
            lambda y, args, dt: jax.jacobian(flow)(y, args, dt))
    return cache[key]


def _is_inexact(leaf) -> bool:
    return jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact)


def lyapunov_direct(net, inputs=None, steps: int = 100_000, renorm: int = 100,
                    transient: int = 10_000, eps: float = None,
                    seed: int = 0) -> float:
    """Largest Lyapunov exponent of the FULL network by the direct
    (two-trajectory / Benettin-distance) method — works where the tangent
    method (:func:`lyapunov_spectrum`) cannot: spiking populations with
    resets, delay/filter edges, feedback networks.  Two copies of the
    complete network state (every node, edge buffer, and feedback value)
    evolve through the compiled fused step under the same constant input;
    every ``renorm`` steps the copies' separation is measured, its log
    accumulated, and the perturbed copy pulled back to distance ``eps``
    along the current difference direction.

    ``inputs``: constant drive (scalar or ``(n_in,)``; default zeros) —
    the standard protocol for autonomous chaos measures.  ``eps`` is the
    ABSOLUTE renormalization distance; the default is ``1e-6`` (float64) /
    ``1e-4`` (float32) of the post-transient state RMS, computed on
    device.  Returns the exponent in 1/time units for the simulated
    discrete system (the Euler/reset map ``run()`` computes).
    Cross-validated against the tangent method on smooth networks (tests:
    4% agreement at N=128).

    The estimate starts from the network's CURRENT state (after the
    ``transient``); an exactly invariant start (e.g. the all-zeros fresh
    tanh network — a fixed point) never leaves it, so you measure THAT
    point's expansion rate, not the attractor's (measured: +2.04 = the
    unstable fixed point's leading eigenvalue where the attractor's
    exponent is +0.14).  Reach the attractor first: ``reset(y=...)`` to a
    generic state or ``run()`` a warmup.

    HARD-RESET CAVEAT (measured, see tests): a threshold crossing
    misaligned between the copies makes their separation jump to O(reset
    amplitude) and collapse again once both have reset.  If ``eps`` is too
    small, the collapse bottoms out at the floating-point noise floor
    before the expansion is repaid, and if ``renorm`` is too short, the
    pull-back banks the jump before the realignment — both bias the
    estimate POSITIVE (an uncoupled tonic QIF ensemble, true lambda ~ 0,
    read +0.25 at renorm=20 with machine-scale eps, and ~0 at the
    defaults).  For spiking networks keep ``renorm`` at least a typical
    inter-spike interval and confirm the estimate is stable when you halve
    ``eps`` and double ``renorm``.
    """
    net.compile()
    # quantized couplings make the step a STAIRCASE in the state: below the
    # quantization quantum the two copies compute identical matvec outputs
    # and the difference dynamics is pure leak (measured: a lambda ~ -0.003
    # net read -0.27 under bfloat16 coupling and -0.74 under int8_master).
    # Chaos measurement needs the full-precision map.
    for label in net.nodes:
        nd = net.get_node(label)
        vf = getattr(nd, "_vf", None)
        cast = getattr(vf, "coupling_cast", None) if vf is not None else None
        quant = bool(cast)
        for v in getattr(nd, "args", {}).values():
            if hasattr(v, "dtype") and np.ndim(v) >= 2 and \
                    jnp.asarray(v).dtype.name in ("bfloat16", "int8", "int4"):
                quant = True
        if quant:
            raise ValueError(
                f"lyapunov_direct: node {label!r} uses a quantized coupling "
                f"({cast or 'low-precision weights'}); the quantization "
                "staircase flattens separations below its quantum and biases "
                "the exponent strongly negative. Rebuild the node without "
                "coupling_dtype= (full precision) to measure chaos.")
    state0 = net.init_state()
    params = net.parameters_pytree()
    leaves = [l for l in jax.tree_util.tree_leaves(state0) if _is_inexact(l)]
    if not leaves:
        raise ValueError("network has no continuous state to perturb")
    dtype = jnp.result_type(*leaves)
    x = jnp.zeros(net.n_in, dtype=dtype) if inputs is None else \
        jnp.broadcast_to(jnp.asarray(inputs, dtype=dtype), (net.n_in,))
    if eps is None:
        eps_in, eps_rel = (1e-6 if jnp.finfo(dtype).bits >= 64 else 1e-4), 1.0
    else:
        eps_in, eps_rel = float(eps), 0.0
    if steps < renorm:
        raise ValueError(f"steps ({steps}) must be >= renorm ({renorm})")
    if steps % renorm:
        warnings.warn(f"lyapunov_direct: using {steps - steps % renorm} of "
                      f"the requested {steps} steps (steps % renorm dropped)",
                      stacklevel=2)
    n_blocks = steps // renorm

    # deterministic unit perturbation over the inexact leaves, scaled to eps
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten(state0)
    d_flat = [rng.standard_normal(np.shape(l)) if _is_inexact(l)
              else np.zeros_like(np.asarray(l)) for l in flat]
    nrm0 = np.sqrt(sum(float(np.sum(d * d)) for d, l in zip(d_flat, flat)
                       if _is_inexact(l)))
    d0 = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(d / nrm0, dtype=jnp.asarray(l).dtype)
                  if _is_inexact(l) else jnp.asarray(np.zeros_like(np.asarray(l)))
                  for d, l in zip(d_flat, flat)])

    cache = net.__dict__.setdefault("_analysis_programs", {})
    key = ("lyap_direct", n_blocks, int(renorm), int(transient),
           net._step_versions())
    if key not in cache:
        step = net.make_step()

        def run(state, params, x, d0, eps_in, eps_rel):
            # once-per-call parameter prep (int8_master requantization etc.)
            # exactly like run()/run_batch -- without it the quantized
            # couplings would re-quantize the float master EVERY step, in
            # BOTH trajectory copies (+82% per inline pass, CLAUDE.md)
            params = net._prep_params(params)

            def advance(s, _):
                return step(s, params, x)[0], None

            if transient:
                state, _ = jax.lax.scan(advance, state, None, length=transient)
            # default eps: relative to the post-transient state RMS (floored
            # so a silent network cannot produce eps = 0)
            sq = [jnp.sum(l.astype(jnp.float32) ** 2)
                  for l in jax.tree_util.tree_leaves(state) if _is_inexact(l)]
            count = sum(int(np.prod(np.shape(l)))
                        for l in jax.tree_util.tree_leaves(state)
                        if _is_inexact(l))
            rms = jnp.sqrt(jnp.sum(jnp.stack(sq)) / count)
            scale = jnp.maximum(rms, jnp.asarray(1e-6, jnp.float32))
            eps_v = eps_in * jnp.where(eps_rel > 0, scale, 1.0)
            pert = jax.tree.map(
                lambda a, d: a + eps_v.astype(a.dtype) * d if _is_inexact(a) else a,
                state, d0)

            def rel_sq_dist(s1, s2):
                # distances measured in units of eps (differences divided by
                # eps in the leaf dtype BEFORE squaring -- eps^2 would
                # underflow f32 for float64 states)
                parts = jax.tree_util.tree_leaves(jax.tree.map(
                    lambda a, b: jnp.sum(
                        ((b - a) / eps_v.astype(a.dtype)) ** 2
                    ).astype(jnp.float32)
                    if _is_inexact(a) else jnp.asarray(0.0, jnp.float32),
                    s1, s2))
                return jnp.sum(jnp.stack(parts))

            def block(carry, _):
                s1, s2, acc = carry

                def both(c, _):
                    a, b = c
                    return (step(a, params, x)[0], step(b, params, x)[0]), None

                (s1, s2), _ = jax.lax.scan(both, (s1, s2), None, length=renorm)
                nrm = jnp.sqrt(rel_sq_dist(s1, s2))  # separation / eps
                tiny = jnp.asarray(jnp.finfo(jnp.float32).tiny, jnp.float32)
                acc = acc + jnp.log(jnp.maximum(nrm, tiny))
                scale = 1.0 / jnp.maximum(nrm, tiny)
                # pull the copy back to distance eps; exact (int/bool) leaves
                # reset to the fiducial trajectory's values
                s2 = jax.tree.map(
                    lambda a, b: a + scale.astype(a.dtype) * (b - a)
                    if _is_inexact(a) else a, s1, s2)
                return (s1, s2, acc), None

            acc0 = jnp.asarray(0.0, jnp.float32)
            (_, _, acc), _ = jax.lax.scan(block, (state, pert, acc0), None,
                                          length=n_blocks)
            return acc

        cache[key] = jax.jit(run)
    acc = cache[key](state0, params, jnp.asarray(x), d0,
                     jnp.asarray(eps_in, jnp.float32),
                     jnp.asarray(eps_rel, jnp.float32))
    lam = float(acc) / (n_blocks * renorm * float(net.dt))
    if not np.isfinite(lam):
        raise RuntimeError(
            f"lyapunov_direct diverged (exponent {lam}); the trajectory "
            "likely blew up — reduce dt or check the drive.")
    return lam


def limit_cycle(net, node: str = None, y0=None, inputs=None,
                steps: int = 100_000, transient: int = None, coord: int = None,
                open_loop: bool = False) -> dict:
    """Locate a stable limit cycle of the node's simulated dynamics and
    characterize it: period, a point on the cycle, and the Floquet
    multipliers of the one-period monodromy matrix.

    Method: simulate ``transient`` steps (default ``steps``) to reach the
    attractor, record ``steps`` more, detect the period from upward
    mean-crossings of coordinate ``coord`` (default: the state dimension
    with the largest variance) with linear interpolation between steps,
    then evaluate the monodromy ``M = d(flow_K)/dy`` at a cycle point via
    ``jax.jacobian`` through the K-step scan (K = rounded period steps).

    Returns a dict: ``period`` (time units) and ``period_steps`` (float,
    sub-step resolution), ``y_star`` (a state on the cycle), ``multipliers``
    (complex, sorted by descending magnitude — one is ~1, the neutral
    direction along the flow; the rest inside the unit circle for a stable
    cycle), and ``exponents`` (``log|multiplier| / period`` — comparable to
    :func:`lyapunov_spectrum`, cross-validated in tests).  Accuracy is
    O(dt) of the Euler discretization plus the K-rounding (<= half a step
    over one period).  Raises if no sustained oscillation is detected
    (fewer than 4 crossings, or vanishing amplitude — use
    :func:`fixed_point`/:func:`stability` for equilibria).
    """
    nd, args = _field_args(net, node, inputs, open_loop)
    _check_smooth_trajectory(nd, "limit_cycle")
    y = nd.y if y0 is None else jnp.asarray(y0, dtype=nd.y.dtype)
    if transient is None:
        transient = steps
    dt = jnp.asarray(net.dt, dtype=y.dtype)
    traj = _traj_program(nd, int(steps), int(transient))
    ys = np.asarray(traj(y, args, dt), dtype=np.float64)
    if not np.all(np.isfinite(ys)):
        raise RuntimeError("limit_cycle: trajectory diverged; reduce dt or "
                           "start closer to the attractor.")
    if coord is None:
        coord = int(np.argmax(ys.var(axis=0)))
    x = ys[:, coord]
    mean, amp = x.mean(), x.max() - x.min()
    scale = max(abs(x.max()), abs(x.min()), 1.0)
    if amp < 1e-6 * scale:
        raise RuntimeError(
            f"limit_cycle: coordinate {coord} has vanishing amplitude "
            f"({amp:.2e}) — the trajectory settled to an equilibrium; use "
            "fixed_point()/stability() instead.")
    below = x[:-1] < mean
    up = np.nonzero(below & (x[1:] >= mean))[0]
    if len(up) < 4:
        raise RuntimeError(
            f"limit_cycle: only {len(up)} upward mean-crossings in {steps} "
            "steps — no sustained oscillation detected (or the window is "
            "shorter than a few periods; raise steps).")
    # sub-step crossing times by linear interpolation
    frac = (mean - x[up]) / (x[up + 1] - x[up])
    t_cross = up + frac
    period_steps = float(np.diff(t_cross).mean())
    k = int(round(period_steps))
    # monodromy at the state nearest a crossing (well on the attractor)
    i_star = int(up[len(up) // 2])
    y_star = jnp.asarray(ys[i_star], dtype=nd.y.dtype)
    M = np.asarray(_monodromy_program(nd, k)(y_star, args, dt),
                   dtype=np.float64)
    mult = np.linalg.eigvals(M)
    mult = mult[np.argsort(-np.abs(mult))]
    period = period_steps * float(net.dt)
    return {
        "period": period,
        "period_steps": period_steps,
        "y_star": np.asarray(y_star),
        "multipliers": mult,
        "exponents": np.log(np.maximum(np.abs(mult), 1e-300)) / period,
    }


def stability(net, node: str = None, y=None, inputs=None,
              open_loop: bool = False) -> np.ndarray:
    """Eigenvalues of the Jacobian at ``y`` (default: current state), sorted
    by descending real part.  All ``Re < 0`` -> locally asymptotically
    stable; a complex leading pair -> focus/spiral (its imaginary part is
    the local angular frequency); a positive real part at a fixed point ->
    locally unstable (e.g. inside a limit cycle)."""
    J = np.asarray(jacobian(net, node, y, inputs, open_loop=open_loop),
                   dtype=np.float64)
    eigs = np.linalg.eigvals(J)
    return eigs[np.argsort(-eigs.real)]
