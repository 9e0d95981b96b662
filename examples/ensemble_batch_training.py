"""Ensemble (minibatch) BPTT with Network.fit_bptt_batch: train one RNN on a
BATCH of teacher trajectories at once.  Each adam update takes the gradient
of the mean loss over a minibatch of trials -- on TPU the vmapped trajectory
turns every per-step coupling matvec into a (batch, N) x (N, N) MXU matmul,
so a batch of B trials trains far faster than B sequential fits (measured:
see benchmarks/batch_train_throughput.py).

No reference analog: the reference's fit_bptt (epoch mode,
/root/reference/rectipy/network.py:603-707) trains one trial per update.
"""

import os

import numpy as np

from rectipy_tpu import Network

node = "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh"
N = int(os.environ.get("EBT_N", 100))
rng = np.random.default_rng(1)
J0 = rng.normal(size=(N, N))
J0 /= np.max(np.abs(np.linalg.eigvals(J0)))
dt = 1e-2
node_vars = {"all/li_op/eta": 2.0, "all/li_op/tau": 12.0, "all/li_op/k": 2.0}

# teacher: B sinusoidal drives at different frequencies -> B trajectories
teacher = Network(dt)
teacher.add_diffeq_node("tanh", node=node, weights=J0, source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="li_op/v", float_precision="float64",
                        node_vars=node_vars)
B, T = int(os.environ.get("EBT_B", 8)), int(os.environ.get("EBT_T", 1000))
time = np.arange(T) * dt
freqs = np.linspace(0.1, 0.4, B)
inputs = np.stack([(np.sin(2 * np.pi * f * time) * 10.0)[:, None]
                   * np.ones((1, N)) for f in freqs])          # (B, T, N)
targets = teacher.run_batch(inputs, verbose=False)["out"]      # (B, T, N)

# learner: different coupling, trained on ALL B trajectories jointly --
# minibatches of 4 trials, reshuffled each epoch
J1 = rng.normal(size=(N, N))
J1 /= np.max(np.abs(np.linalg.eigvals(J1)))
learner = Network(dt)
learner.add_diffeq_node("tanh", node=node, weights=J1, source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="li_op/v", float_precision="float64",
                        node_vars=node_vars, train_params=["weights"])
obs = learner.fit_bptt_batch(inputs, targets,
                             n_epochs=int(os.environ.get("EBT_EPOCHS", 40)),
                             batch_size=4,
                             optimizer="adam", lr=5e-3, seed=0, verbose=False)
losses = np.asarray(obs["epoch_loss"])
print(f"epoch loss: {losses[0]:.4f} -> {losses[-1]:.4f} over {len(losses)} epochs")
assert losses[-1] < 0.5 * losses[0]

# generalization: an unseen frequency between the training ones
f_test = 0.25
inp_test = (np.sin(2 * np.pi * f_test * time) * 10.0)[:, None] * np.ones((1, N))
tgt_test = teacher.run(inp_test, verbose=False).to_numpy("out")
out_test = learner.run(inp_test, verbose=False).to_numpy("out")
mse = float(np.mean((out_test - tgt_test) ** 2))
print(f"held-out frequency {f_test} Hz MSE: {mse:.4f}")
