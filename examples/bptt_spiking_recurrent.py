"""Teacher/student recurrent LIF network trained with BPTT.

Port of the reference workload
/root/reference/documentation/bptt_spiking_neurons_recurrent.py:77-98
(BASELINE.md configs[2]): a spiking LIF reservoir with random recurrent
coupling generates target dynamics; a learner network with different initial
recurrent weights J and readout W_out recovers them by backpropagation
through time across the surrogate spike gradient -- BOTH the recurrent node
weights and the readout edge train.

Differences from the reference script: training runs as fit_bptt epoch mode
(one fused scan + update per epoch, state auto-reset) instead of a Python
loop of run()/backward()/reset(); sizes default smaller so the example
finishes in seconds (env knobs restore the reference scale).

Run: python examples/bptt_spiking_recurrent.py
"""

import os
import sys

try:  # prefer the installed package (pip install -e .)
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from rectipy_tpu import Network

node = "neuron_model_templates.spiking_neurons.lif.lif"
N = int(os.environ.get("LIF_N", 10))
T_steps = int(os.environ.get("LIF_STEPS", 4_000))  # reference: 20_000
epochs = int(os.environ.get("LIF_EPOCHS", 300))    # reference: up to 1000
epsilon = 1.0  # reference convergence criterion (MSE)

rng = np.random.default_rng(42)
k, tau_s, eta = 2.0, 5.0, 10.0
tau = rng.uniform(10.0, 20.0, size=(N,))
v_thr, v_reset, dt = 10.0, -10.0, 5e-3
node_vars = {"eta": eta, "tau": tau, "tau_s": tau_s, "k": k}

n_in, n_out = 2, 3
W_in = rng.standard_normal((N, n_in))
J = rng.standard_normal((N, N))
J_0 = rng.standard_normal((N, N))
W_out = rng.standard_normal((n_out, N))
W_out_0 = rng.standard_normal((n_out, N))


def build(J_mat, W_out_mat, train):
    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("lif", node=node, weights=J_mat, source_var="s",
                        reset_var="v", spike_var="spike", target_var="s_in",
                        input_var="I_ext", output_var="s", clear=True,
                        float_precision="float64", op="lif_op", node_vars=node_vars,
                        spike_threshold=v_thr, spike_reset=v_reset,
                        train_params=["weights"] if train else None)
    net.add_func_node("inp", n_in, activation_function="identity")
    net.add_edge("inp", "lif", weights=W_in, train=None)
    net.add_func_node("out", n_out, activation_function="identity")
    net.add_edge("lif", "out", weights=W_out_mat, train="gd" if train else None)
    net.compile()
    return net


# sinusoidal drive (reference lines 60-66)
time_ax = np.arange(T_steps) * dt
inputs = np.stack([np.sin(time_ax * 2.0 * np.pi * omega) * 40.0
                   for omega in (0.03, 0.05)], axis=1)

teacher = build(J, W_out, train=False)
targets = teacher.run(inputs, sampling_steps=1, verbose=False).to_numpy("out")
assert targets.max() > 0, "teacher produced no spiking output"

learner = build(J_0, W_out_0, train=True)
obs = learner.fit_bptt([inputs] * epochs, [targets] * epochs, optimizer="adadelta",
                       lr=0.5, optimizer_kwargs={"rho": 0.9, "eps": 1e-6},
                       loss="mse", verbose=False)
losses = obs["epoch_loss"]
print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f} over {len(losses)} epochs")

# loss-curve sanity (the reference's loose-tolerance convergence style,
# /root/reference/rectipy_tests/test_network.py:342-420)
assert losses[-1] < 0.5 * losses[0], "BPTT did not reduce the loss by half"
assert all(np.isfinite(losses))

J_1 = np.asarray(learner.get_var("lif", "weights"))
W_out_1 = np.asarray(learner.get_edge("lif", "out").weights)
print(f"|dJ|_max = {np.abs(J_1 - J_0).max():.4f}, "
      f"|dW_out|_max = {np.abs(W_out_1 - W_out_0).max():.4f}")
assert np.abs(J_1 - J_0).max() > 1e-4, "recurrent weights did not train"
assert np.abs(W_out_1 - W_out_0).max() > 1e-4, "readout weights did not train"

if os.environ.get("PLOT", "0") == "1":
    import matplotlib.pyplot as plt

    preds = learner.run(inputs, sampling_steps=1, verbose=False).to_numpy("out")
    fig, axes = plt.subplots(nrows=n_out + 1, figsize=(10, 8))
    axes[0].plot(losses)
    axes[0].set_title("Loss")
    for idx in range(n_out):
        axes[idx + 1].plot(preds[:, idx], label="prediction")
        axes[idx + 1].plot(targets[:, idx], label="target")
        axes[idx + 1].legend()
    plt.tight_layout()
    plt.show()
print("OK")
