"""Loss functions for Network.fit_bptt / Network.test.

Mirrors the reference's torch.nn loss menu
(/root/reference/rectipy/network.py:1166-1193) with jnp implementations that
match torch's default 'mean' reduction semantics.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["get_loss_function"]


def _mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def _l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def _nll(pred, target):
    """Negative log-likelihood on log-probability inputs; integer class targets
    (torch.nn.NLLLoss semantics)."""
    target = target.astype(jnp.int32)
    return -jnp.mean(jnp.take_along_axis(pred, target[:, None], axis=-1))


def _ce(pred, target):
    """Cross entropy on unnormalized logits.  Integer class targets or
    one-hot/probability targets (torch.nn.CrossEntropyLoss semantics)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    if target.ndim == pred.ndim - 1 or jnp.issubdtype(target.dtype, jnp.integer):
        target = target.astype(jnp.int32)
        return -jnp.mean(jnp.take_along_axis(logp, target[:, None], axis=-1))
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def _kld(pred, target):
    """KL divergence, pred given as log-probabilities (torch.nn.KLDivLoss
    with default 'mean' reduction: elementwise mean)."""
    return jnp.mean(target * (jnp.log(jnp.clip(target, 1e-38)) - pred))


def _hinge(pred, target, margin: float = 1.0):
    """Hinge embedding loss (torch.nn.HingeEmbeddingLoss): target in {-1, 1}."""
    loss = jnp.where(target > 0, pred, jnp.maximum(0.0, margin - pred))
    return jnp.mean(loss)


_LOSSES = {"mse": _mse, "l1": _l1, "nll": _nll, "ce": _ce, "kld": _kld, "hinge": _hinge}


def get_loss_function(loss: str, loss_kwargs: dict = None) -> Callable:
    """Resolve a loss name to ``loss(pred, target) -> scalar``."""
    loss_kwargs = loss_kwargs or {}
    try:
        fn = _LOSSES[loss]
    except KeyError:
        raise ValueError(
            "Invalid loss function choice. Please see the documentation of the "
            "`Network.fit_bptt()` method for valid options."
        )
    if loss_kwargs:
        base = fn
        return lambda p, t: base(p, t, **loss_kwargs)
    return fn
