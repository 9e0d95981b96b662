"""Multi-chip population sharding (new capability; no reference analog):
row-shard the N x N coupling and the state over the 'model' mesh axis, batch
trials over 'data', and run the full BPTT training step under GSPMD.

Run on CPU for a virtual mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/multichip_sharding.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rectipy_tpu import Network
from rectipy_tpu.parallel import make_mesh, shard_network_arrays, sharded_train_step
from rectipy_tpu.train import get_loss_function, get_optimizer

N = 512  # population size, divisible by the model axis
rng = np.random.default_rng(0)
W = rng.normal(size=(N, N)) / np.sqrt(N)

net = Network(1e-2)
net.add_diffeq_node("rnn", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                    weights=W, input_var="li_op/I_ext", output_var="li_op/v",
                    source_var="tanh_op/r", target_var="li_op/r_in",
                    train_params=["weights"])
net.compile()

n_dev = len(jax.devices())
mesh = make_mesh(n_dev, data=2 if n_dev % 2 == 0 and n_dev > 1 else 1)
print("mesh:", dict(mesh.shape))

params = net.parameters_pytree()
train, frozen = net._partition(params, net.trainable_paths())
train = shard_network_arrays(train, N, mesh)
frozen = shard_network_arrays(frozen, N, mesh)
state0 = shard_network_arrays(net.init_state(), N, mesh)

opt = get_optimizer("adam", 1e-3)
opt_state = opt.init(train)
step = sharded_train_step(net, get_loss_function("mse"), opt, mesh)

batch, T = 8, 64
inputs = jax.device_put(jnp.asarray(rng.normal(size=(batch, T, N)), dtype=net.dtype),
                        NamedSharding(mesh, P("data", None, None)))
targets = jax.device_put(jnp.zeros((batch, T, N), dtype=net.dtype),
                         NamedSharding(mesh, P("data", None, None)))

with mesh:
    for i in range(5):
        train, opt_state, loss = step(train, frozen, opt_state, state0, inputs, targets)
        print(f"step {i}: loss={float(loss):.6f}")

# ---------------------------------------------------------------- one-call API
# The same sharding through the PUBLIC interface (round 2): pass mesh= to
# run/fit_bptt/fit_rls/fit_eprop. Observer records equal the single-device
# run; training goes through the deferred-gradient trajectory under GSPMD
# (per step: ONE all-gather forward + ONE all-reduce backward -- see
# tests/test_parallel.py::test_sharded_training_step_collective_budget).
net2 = Network(1e-2)
net2.add_diffeq_node("rnn", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                     weights=W, input_var="li_op/I_ext", output_var="li_op/v",
                     source_var="tanh_op/r", target_var="li_op/r_in",
                     train_params=["weights"])
inp1 = rng.normal(size=(200, N)).astype(np.float32)
obs = net2.run(inp1, sampling_steps=10, verbose=False, mesh=mesh)
print("one-call run(mesh=):", obs.to_numpy("out").shape)
obs = net2.fit_bptt([inp1] * 3, [np.zeros((200, N), np.float32)] * 3,
                    optimizer="adam", lr=1e-3, verbose=False, mesh=mesh)
print("one-call fit_bptt(mesh=) losses:", [f"{l:.5f}" for l in obs["epoch_loss"]])
