"""Feedforward LIF spiking layer with trained input/output weights via BPTT
through surrogate spike gradients -- the workload of the reference's
documentation/bptt_spiking_neurons_ffwd.py."""

import os

import numpy as np

from rectipy_tpu import Network

node = "rectipy_tpu.models.spiking_neurons.lif.lif"
N, n_in, n_out = int(os.environ.get("FFWD_N", 100)), 2, 3
rng = np.random.default_rng(2)
tau = rng.uniform(10.0, 15.0, size=(N,))
node_vars = {"eta": 10.0, "tau": tau, "tau_s": 5.0, "k": 2.0}
v_thr, v_reset = 10.0, -10.0
J0 = np.zeros((N, N))
dt = 1e-2

W_in = rng.normal(size=(N, n_in))
W_out = rng.normal(size=(n_out, N))
W_in_0 = rng.normal(size=(N, n_in))
W_out_0 = rng.normal(size=(n_out, N))


def build(w_in, w_out, train):
    net = Network(dt)
    net.add_diffeq_node("lif", node=node, weights=J0, source_var="s",
                        spike_def="v", spike_var="spike", target_var="s_in",
                        input_var="I_ext", output_var="s", op="lif_op",
                        float_precision="float64", node_vars=dict(node_vars),
                        spike_threshold=v_thr, spike_reset=v_reset)
    net.add_func_node("inp", n_in, activation_function="identity")
    net.add_edge("inp", "lif", weights=w_in, train=train)
    net.add_func_node("out", n_out, activation_function="identity")
    net.add_edge("lif", "out", weights=w_out, train=train)
    net.compile()
    return net


# teacher targets
T = float(os.environ.get("FFWD_T", 100.0))
steps = int(T / dt)
time = np.linspace(0, T, steps)
inputs = np.stack([np.sin(time * 2.0 * np.pi * w) for w in (0.03, 0.05)], axis=1)
teacher = build(W_in, W_out, None)
targets = teacher.run(inputs, sampling_steps=1, verbose=False).to_numpy("out")

# train the learner's input and output weights (Rprop, one update per epoch)
learner = build(W_in_0, W_out_0, "gd")
epochs = int(os.environ.get("FFWD_EPOCHS", 100))
obs = learner.fit_bptt([inputs] * epochs, [targets] * epochs, optimizer="rprop",
                       lr=0.05, optimizer_kwargs={"etas": (0.5, 1.1),
                                                  "step_sizes": (1e-6, 0.9)})
loss_hist = obs["epoch_loss"]
print(f"loss: {loss_hist[0]:.4f} -> {loss_hist[-1]:.4f}")

if __name__ == "__main__":
    import matplotlib.pyplot as plt

    predictions = learner.run(inputs, sampling_steps=1, verbose=False).to_numpy("out")
    fig, axes = plt.subplots(nrows=n_out + 1, figsize=(10, 8))
    axes[0].plot(loss_hist)
    axes[0].set_title("Loss")
    for idx in range(n_out):
        axes[idx + 1].plot(predictions[:, idx], label="prediction")
        axes[idx + 1].plot(targets[:, idx], label="target")
        axes[idx + 1].legend()
    plt.tight_layout()
    plt.show()
