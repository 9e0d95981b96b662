"""Teacher/student BPTT on a tanh rate-neuron RNN: train the recurrent weight
matrix so the learner reproduces the teacher's trajectory -- the workload of
the reference's documentation/bptt_rate_neurons.py.  Each training epoch is a
single jitted value_and_grad through the full scan."""

import os

import numpy as np

from rectipy_tpu import Network

node = "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh"
N = int(os.environ.get("BRN_N", 200))
k, eta = 2.0, 2.0
rng = np.random.default_rng(1)
tau = rng.uniform(10.0, 20.0, size=(N,))
J0 = rng.normal(size=(N, N))
J0 /= np.max(np.abs(np.linalg.eigvals(J0)))
dt = 1e-2
node_vars = {"all/li_op/eta": eta, "all/li_op/tau": tau, "all/li_op/k": k}

# teacher network
target_net = Network(dt)
target_net.add_diffeq_node("tanh", node=node, weights=J0, source_var="tanh_op/r",
                           target_var="li_op/r_in", input_var="li_op/I_ext",
                           output_var="li_op/v", float_precision="float64",
                           node_vars=node_vars)

# teacher trajectory under a sinusoidal drive
T = float(os.environ.get("BRN_T", 100.0))
steps = int(T / dt)
time = np.linspace(0, T, steps)
inp = (np.sin(2.0 * np.pi * 0.2 * time) * 10.0)[:, None] * np.ones((1, N))
target = target_net.run(inp, sampling_steps=1, verbose=False).to_numpy("out")

# learner with a different random coupling, trained on the recurrent weights
J1 = rng.normal(size=(N, N))
J1 /= np.max(np.abs(np.linalg.eigvals(J1)))
learner_net = Network(dt)
learner_net.add_diffeq_node("tanh", node=node, weights=J1, source_var="tanh_op/r",
                            target_var="li_op/r_in", input_var="li_op/I_ext",
                            output_var="li_op/v", float_precision="float64",
                            train_params=["weights"], node_vars=node_vars)

n_epochs = int(os.environ.get("BRN_EPOCHS", 100))
train_obs = learner_net.fit_bptt(np.tile(inp, (n_epochs, 1, 1)),
                                 np.tile(target, (n_epochs, 1, 1)),
                                 optimizer="rmsprop", lr=1e-4)

fitted_obs = learner_net.run(inp, sampling_steps=1, verbose=False)

if __name__ == "__main__":
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(nrows=3, figsize=(10, 6))
    train_obs.plot("epoch_loss", x="epochs", ax=axes[0])
    fitted_obs.plot("out", ax=axes[1])
    axes[1].set_title("fitted")
    target_net.reset()
    target_net.run(inp, sampling_steps=1, verbose=False).plot("out", ax=axes[2])
    axes[2].set_title("target")
    plt.show()
