"""Numerical-failure detection helpers.

The reference has no failure-detection subsystem (SURVEY.md §5).  Long
explicit-Euler integrations of stiff spiking models can silently blow up;
these helpers make that loud.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["enable_nan_checks", "check_finite_state", "find_nonfinite"]


@contextlib.contextmanager
def enable_nan_checks():
    """Context manager: raise on any NaN produced inside jitted code
    (wraps ``jax_debug_nans``; disables itself on exit)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def find_nonfinite(tree) -> Dict[str, int]:
    """Count non-finite entries per pytree leaf (empty dict == all finite)."""
    bad = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            continue
        n_bad = int(jnp.sum(~jnp.isfinite(jnp.asarray(leaf))))
        if n_bad:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            bad[key] = n_bad
    return bad


def check_finite_state(net, raise_on_failure: bool = True) -> Dict[str, int]:
    """Check every node/edge state and parameter of a Network for NaN/inf.

    Returns {leaf path: count} of offending leaves; raises FloatingPointError
    by default when any are found.
    """
    net.compile()
    bad = find_nonfinite({"state": net.init_state(), "params": net.parameters_pytree()})
    if bad and raise_on_failure:
        raise FloatingPointError(
            f"Non-finite values detected in network state/parameters: {bad}. "
            f"Consider a smaller dt or reduced coupling strength."
        )
    return bad
