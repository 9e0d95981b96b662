"""Online FORCE learning with recursive least squares -- the workload of the
reference's documentation/rls_example.py: a tanh reservoir whose readout
weights are adapted online to output the product of two input sines.  The
entire RLS recursion runs as one on-device scan carrying (W, P)."""

import os

import numpy as np

from rectipy_tpu import Network

N, m = int(os.environ.get("RLS_N", 600)), 2
rng = np.random.default_rng(4)
tau = rng.uniform(10.0, 20.0, size=(N,))
J0 = rng.normal(size=(N, N))
J0 /= np.max(np.abs(np.linalg.eigvals(J0)))
dt = 1e-2

net = Network(dt)
net.add_diffeq_node("tanh", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                    weights=J0, source_var="tanh_op/r", target_var="li_op/r_in",
                    input_var="li_op/I_ext", output_var="tanh_op/r",
                    float_precision="float64",
                    node_vars={"all/li_op/k": 0.8, "all/li_op/tau": tau,
                               "all/li_op/v": rng.normal(size=N)})
net.add_func_node("inp", m, activation_function="identity")
net.add_edge("inp", "tanh", weights=rng.normal(size=(N, m)))
net.add_func_node("readout", 1, activation_function="identity")
net.add_edge("tanh", "readout", train="rls", beta=0.99, alpha=1.0)

# input: two sines; target: their normalized product
steps = int(os.environ.get("RLS_STEPS", 100_000))
f1, f2, amp = 0.2, 0.02, 1.5
time = np.linspace(0, steps * dt, num=steps)
inp = np.stack([np.sin(2 * np.pi * f1 * time) * amp,
                np.sin(2 * np.pi * f2 * time) * amp], axis=1)
target = (inp[:, :1] * inp[:, 1:]) / amp

obs = net.fit_rls(inp, targets=target, update_steps=100, verbose=True,
                  record_output=True, record_loss=True, sampling_steps=1000)

test_steps = min(int(os.environ.get("RLS_TEST_STEPS", 20_000)), steps)
obs2, loss = net.test(inp[:test_steps], target[:test_steps], record_output=True,
                      sampling_steps=10, verbose=False)
print(f"test loss: {loss}")

if __name__ == "__main__":
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(nrows=3, figsize=(12, 8))
    obs2.plot("out", ax=axes[0])
    axes[0].set_title("predictions (testing)")
    axes[1].plot(target[:test_steps:10])
    axes[1].set_title("targets (testing)")
    obs.plot("loss", ax=axes[2])
    axes[2].set_title("loss (training)")
    plt.tight_layout()
    plt.show()
