"""Reservoir computing with a ridge-regression readout and WTA scoring -- the
workload of the reference's documentation/ridge_example.py (syllable
classification from a tanh reservoir)."""

import os

import numpy as np

from rectipy_tpu import Network, input_connections, random_connectivity, wta_score

# reservoir parameters
N, p, Delta_in, J = int(os.environ.get("RIDGE_N", 100)), 0.1, 2.0, 2.0
m = 5  # input channels
signals = [[0, 2, 1], [4, 2, 3], [3, 2, 0]]
k = len(signals)

# training protocol
T_init = float(os.environ.get("RIDGE_TINIT", 100.0))
T_syll, n_reps = 1.0, int(os.environ.get("RIDGE_REPS", 50))
n_syll = len(signals[0])
dt = 1e-3
n_epochs = int(os.environ.get("RIDGE_EPOCHS", 6))
train_epochs = n_epochs - 1

epoch_steps = int(T_syll * n_syll * n_reps / dt)
syll_steps = int(T_syll / dt)
init_steps = int(T_init / dt)

rng = np.random.default_rng(3)
inp = np.zeros((n_epochs, epoch_steps, m))
targets = np.zeros((n_epochs, epoch_steps, k))
for epoch in range(n_epochs):
    for rep in range(n_reps):
        choice = rng.integers(k)
        s = signals[choice]
        for idx in range(n_syll):
            lo = (rep * n_syll + idx) * syll_steps
            inp[epoch, lo:lo + syll_steps, s[idx]] = 1.0
        targets[epoch, rep * n_syll * syll_steps:(rep + 1) * n_syll * syll_steps, choice] = 1.0

W = random_connectivity(N, N, p, normalize=True, rng=rng)
W_in = input_connections(N, m, 0.5, variance=Delta_in, zero_mean=True, rng=rng)

net = Network(dt=dt)
net.add_diffeq_node("tanh", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                    weights=W * J, source_var="tanh_op/r", target_var="li_op/r_in",
                    input_var="li_op/I_ext", output_var="li_op/v",
                    float_precision="float64")

# wash out the initial condition
net.run(np.zeros((init_steps, 1)), verbose=False, sampling_steps=init_steps + 1)

net.add_func_node("inp", m, activation_function="identity")
net.add_edge("inp", "tanh", weights=W_in)

# per-epoch ridge fits, averaged
coeffs = []
for j in range(train_epochs):
    obs = net.fit_ridge(inputs=inp[j], targets=targets[j], sampling_steps=1,
                        verbose=False, add_readout_node=False, alpha=1e-4)
    coeffs.append(obs.to_numpy("w_out"))
    print(f"Epoch #{j + 1} finished.")

w_out = np.mean(coeffs, axis=0)
net.add_func_node("readout", k, activation_function="identity")
net.add_edge("tanh", "readout", weights=w_out.T)

obs, test_loss = net.test(inp[train_epochs], targets[train_epochs], loss="mse",
                          record_output=True, sampling_steps=1, verbose=False)
wta = wta_score(obs.to_numpy("out"), targets[train_epochs])
print(f"Finished. Loss on test data set: {test_loss}. WTA score: {wta}.")
