"""Surrogate-gradient spike nonlinearity.

JAX ``custom_vjp`` equivalent of the reference's ``Spike``
``torch.autograd.Function`` (/root/reference/rectipy/nodes.py:468-481):

- forward: ``heaviside(x, center)`` -- 0 for x<0, ``center`` at x==0, 1 for x>0
- backward: fast-sigmoid / SuperSpike-style ``g / (1 + slope*|x|)**2``

``slope``/``center`` are static per-node hyperparameters (the reference stores
them as mutable class attributes, /root/reference/rectipy/nodes.py:303-306);
here they are closed over by a factory so each node gets its own pure spike
function and gradients flow only through ``x``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def make_spike_fn(slope: float = 10.0, center: float = 1.0):
    """Build ``spike(x) = heaviside(x, center)`` with surrogate VJP
    ``g / (1 + slope*|x|)**2``."""
    slope = float(slope)
    center = float(center)

    @jax.custom_vjp
    def spike_fn(x):
        return jnp.heaviside(x, jnp.asarray(center, dtype=x.dtype))

    def fwd(x):
        return spike_fn(x), x

    def bwd(x, g):
        denom = 1.0 + slope * jnp.abs(x)
        return (g / (denom * denom),)

    spike_fn.defvjp(fwd, bwd)
    return spike_fn


def spike(x, slope: float = 10.0, center: float = 1.0):
    """Functional form: surrogate-gradient heaviside spike."""
    return make_spike_fn(slope, center)(x)


def default_spike_slope(spike_threshold: float, spike_reset: float) -> float:
    """Reference default: ``100 / |threshold - reset|``
    (/root/reference/rectipy/nodes.py:304)."""
    return 100.0 / abs(float(spike_threshold) - float(spike_reset))
