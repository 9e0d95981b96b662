"""Optimizer factories: thin optax wrappers.

Mirrors the reference's torch.optim menu
(/root/reference/rectipy/network.py:1138-1164): sgd, adam, adamw, adagrad,
adadelta, adamax, rmsprop, rprop.
"""

from __future__ import annotations

import optax

__all__ = ["get_optimizer"]

_FACTORIES = {
    "sgd": optax.sgd,
    "adam": optax.adam,
    "adamw": optax.adamw,
    "adagrad": optax.adagrad,
    "adadelta": optax.adadelta,
    "adamax": optax.adamax,
    "rmsprop": optax.rmsprop,
    "rprop": optax.rprop,
}

# map common torch-style kwarg names onto optax equivalents
_KWARG_ALIASES = {
    "rprop": {"etas": ("eta_minus", "eta_plus"), "step_sizes": ("min_step_size", "max_step_size")},
    "sgd": {"momentum": "momentum"},
}


def get_optimizer(optimizer: str, lr: float, optimizer_kwargs: dict = None) -> optax.GradientTransformation:
    """Resolve an optimizer name to an optax GradientTransformation."""
    optimizer_kwargs = dict(optimizer_kwargs or {})
    try:
        factory = _FACTORIES[optimizer]
    except KeyError:
        raise ValueError(
            "Invalid optimizer choice. Please see the documentation of the "
            "`Network.fit_bptt()` method for valid options."
        )
    aliases = _KWARG_ALIASES.get(optimizer, {})
    for torch_name, optax_name in aliases.items():
        if torch_name in optimizer_kwargs:
            val = optimizer_kwargs.pop(torch_name)
            if isinstance(optax_name, tuple):
                for sub_name, sub_val in zip(optax_name, val):
                    optimizer_kwargs[sub_name] = sub_val
            else:
                optimizer_kwargs[optax_name] = val
    # inject_hyperparams moves the learning rate (and numeric kwargs) into
    # opt_state.hyperparams: they become traced VALUES instead of
    # compile-time constants, so the cached jitted training programs
    # (network._bptt_epochs/_bptt_steps) serve every lr -- an lr sweep or
    # schedule reuses ONE compiled program instead of leaking one per value
    return optax.inject_hyperparams(factory)(learning_rate=lr, **optimizer_kwargs)
