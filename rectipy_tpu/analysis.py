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

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["autonomous_field", "jacobian", "fixed_point", "stability"]


def _resolve_node(net, node: Optional[str]):
    """The diffeq node to analyze (explicit label, or the unique one)."""
    if node is not None:
        return net.get_node(node)
    # diffeq nodes carry a state vector y; InstantNodes only have func
    diffeq = [n for n in net.nodes if hasattr(net.get_node(n), "y")]
    if len(diffeq) != 1:
        raise ValueError(
            f"Network has {len(diffeq)} differential-equation nodes "
            f"({diffeq}); pass node=<label> to pick one.")
    return net.get_node(diffeq[0])


def autonomous_field(net, node: str = None, inputs=None):
    """``(f, y)``: the node's autonomous vector field ``f(y) -> dy/dt`` with
    the external input held constant at ``inputs`` (scalar or ``(n_in,)``;
    default: the input slot's stored value, normally zeros), plus the
    node's current state vector."""
    nd = _resolve_node(net, node)
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


def jacobian(net, node: str = None, y=None, inputs=None) -> jnp.ndarray:
    """Jacobian ``df/dy`` of the node's smooth flow at state ``y`` (default:
    the node's current state) -- exact, via ``jax.jacobian``."""
    f, y_cur = autonomous_field(net, node, inputs)
    y = y_cur if y is None else jnp.asarray(y, dtype=y_cur.dtype)
    return jax.jacobian(f)(y)


def fixed_point(net, node: str = None, y0=None, inputs=None, tol: float = None,
                max_iter: int = 100, damping: float = 1.0) -> jnp.ndarray:
    """Damped Newton solve of ``f(y) = 0`` from ``y0`` (default: the node's
    current state).  Returns the fixed point; raises if the residual does
    not reach ``tol * (1 + |y*|)`` within ``max_iter`` iterations (try a
    smaller ``damping`` or a better ``y0`` -- e.g. the tail of a short
    ``run``).  ``tol`` defaults to ``1000 * eps`` of the node's dtype
    (~1e-4 in float32, ~2e-11 in float64 -- use a float64 network for
    tight equilibria)."""
    f, y_cur = autonomous_field(net, node, inputs)
    y = y_cur if y0 is None else jnp.asarray(y0, dtype=y_cur.dtype)
    if tol is None:
        tol = 1000.0 * float(jnp.finfo(y.dtype).eps)
    jac = jax.jit(jax.jacobian(f))
    fj = jax.jit(f)
    for _ in range(int(max_iter)):
        r = fj(y)
        if float(jnp.max(jnp.abs(r))) <= tol * (1.0 + float(jnp.max(jnp.abs(y)))):
            return y
        step = jnp.linalg.solve(jac(y), r)
        y = y - damping * step
    resid = float(jnp.max(jnp.abs(fj(y))))
    raise RuntimeError(
        f"fixed_point: Newton did not converge in {max_iter} iterations "
        f"(max |f| = {resid:.3e}); try damping < 1 or a closer y0.")


def stability(net, node: str = None, y=None, inputs=None) -> np.ndarray:
    """Eigenvalues of the Jacobian at ``y`` (default: current state), sorted
    by descending real part.  All ``Re < 0`` -> locally asymptotically
    stable; a complex leading pair -> focus/spiral (its imaginary part is
    the local angular frequency); a positive real part at a fixed point ->
    locally unstable (e.g. inside a limit cycle)."""
    J = np.asarray(jacobian(net, node, y, inputs), dtype=np.float64)
    eigs = np.linalg.eigvals(J)
    return eigs[np.argsort(-eigs.real)]
