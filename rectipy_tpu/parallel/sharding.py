"""Mesh construction and GSPMD shardings for neuron-population parallelism.

Design (SURVEY.md §2.9 / §7.6): the natural "tensor parallelism" of this
workload is sharding the neuron population -- every per-neuron vector
(states, heterogeneous parameters, inputs) is split over the ``model`` mesh
axis and the ``N x N`` coupling matrix is row-sharded ``P('model', None)``.
The per-step matvec then computes local output rows after an all-gather of
the source rates, which XLA inserts automatically from the sharding
annotations; trial/epoch batches ride the ``data`` axis with gradient psums
likewise auto-inserted.  No hand-written collectives are needed at this
layer -- annotate, jit, let GSPMD lay the collectives on ICI.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_network_arrays", "sharded_run", "sharded_train_step"]


def make_mesh(n_devices: Optional[int] = None, data: int = 1,
              axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    """Create a 2D (data, model) device mesh over the first ``n_devices``
    devices; ``model = n_devices / data``."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"Requested {n_devices} devices, only {len(devices)} available")
    if n_devices % data != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by data={data}")
    model = n_devices // data
    dev_array = np.asarray(devices[:n_devices]).reshape(data, model)
    return Mesh(dev_array, axis_names)


def _leaf_spec(leaf, n: int, model_axis: str) -> P:
    """Population-sharding rule: (N,N) -> row-sharded; (N,) -> sharded;
    block-sparse couplings shard on the block-row axis; everything else
    replicated."""
    shape = getattr(leaf, "shape", ())
    if len(shape) == 4 and shape[0] * shape[2] == n and shape[2] == shape[3]:
        # block-sparse coupling blocks (n_br, cb, bs, bs): row-shard
        return P(model_axis, None, None, None)
    if len(shape) == 2 and jnp.issubdtype(getattr(leaf, "dtype", jnp.float32),
                                          jnp.integer) and shape[0] and n % shape[0] == 0:
        # block-sparse column-index table (n_br, cb): shard WITH its blocks
        return P(model_axis, None)
    if len(shape) == 2 and shape[0] == n:
        return P(model_axis, None)
    if len(shape) == 1 and shape[0] == n:
        return P(model_axis)
    if len(shape) == 1 and shape[0] % n == 0 and shape[0] > 0:
        # flattened multi-variable state vector (V*N,): contiguous blocks of N
        # stay aligned with the model shards when N % n_model == 0
        return P(model_axis)
    return P()


def shard_network_arrays(tree, n: int, mesh: Mesh, model_axis: str = "model"):
    """Place a params/state pytree on the mesh with population sharding.

    ``n`` is the population size; per-neuron leaves shard over ``model_axis``,
    scalars and non-population arrays replicate.
    """
    n_model = mesh.shape[model_axis]

    def place(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        spec = _leaf_spec(leaf, n, model_axis)
        # only shard when every sharded dim divides evenly; replicate otherwise
        for dim, name in zip(leaf.shape, spec):
            if name is not None and dim % n_model != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def sharded_run(net, mesh: Mesh, model_axis: str = "model") -> Callable:
    """Build a jitted multi-chip trajectory runner for a compiled network.

    Returns ``run(state, params, inputs) -> (state', outputs)`` with the
    population sharded over ``model_axis``.  Place state/params with
    :func:`shard_network_arrays` first; GSPMD propagates the shardings
    through the scan.
    """
    step = net.make_step()

    @jax.jit
    def run(state, params, inputs):
        def body(state, x_t):
            state, out, _ = step(state, params, x_t)
            return state, out

        return jax.lax.scan(body, state, inputs)

    return run


def sharded_train_step(net, loss_fn: Callable, optimizer, mesh: Mesh,
                       model_axis: str = "model", data_axis: str = "data") -> Callable:
    """Build the full multi-chip BPTT training step.

    ``train_step(train, frozen, opt_state, state0, inputs, targets) ->
    (train', opt_state', loss)`` where ``inputs``/``targets`` carry a leading
    batch axis sharded over ``data_axis`` (trial parallelism) and all
    population arrays shard over ``model_axis``.  Gradients are averaged over
    the batch; GSPMD inserts the cross-data psum.
    """
    step = net.make_step()
    combine = net._combine

    def trajectory_loss(train, frozen, state0, inp, tgt):
        params = combine(train, frozen)

        def body(state, x_t):
            state, out, _ = step(state, params, x_t)
            return state, out

        _, outs = jax.lax.scan(body, state0, inp)
        return loss_fn(outs, tgt)

    def batched_loss(train, frozen, state0, inputs, targets):
        per_trial = jax.vmap(lambda i, t: trajectory_loss(train, frozen, state0, i, t))
        return jnp.mean(per_trial(inputs, targets))

    @jax.jit
    def train_step(train, frozen, opt_state, state0, inputs, targets):
        lval, grads = jax.value_and_grad(batched_loss)(train, frozen, state0, inputs, targets)
        updates, opt_state = optimizer.update(grads, opt_state, train)
        import optax

        train = optax.apply_updates(train, updates)
        return train, opt_state, lval

    return train_step
