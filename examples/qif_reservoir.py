"""QIF spiking reservoir driven by a step input, recording mean synaptic
activity -- the workload of the reference's documentation/qif_example.py,
expressed in rectipy_tpu.  The whole 400k-step integration is one fused
lax.scan on device."""

import os

import numpy as np

from rectipy_tpu import Network, random_connectivity

# network parameters
N = int(os.environ.get("QR_N", 1000))
p = 0.1
rng = np.random.default_rng(0)
W = random_connectivity(N, N, p, normalize=True, rng=rng)
eta, Delta, alpha, k = -5.0, 1.0, 0.0, 15.0
etas = eta + Delta * np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))
v_theta = 1e3

# extrinsic input: a step of amplitude 3 over the middle half of the run
T, dt = float(os.environ.get("QR_T", 40.0)), 1e-4
steps = int(T / dt)
inp = np.zeros((steps, 1))
inp[steps // 4: 3 * steps // 4, 0] = 3.0

# build the network
net = Network(dt)
net.add_diffeq_node(
    "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", weights=W,
    source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
    spike_def="v", spike_var="spike", op="qif_sfa_op",
    spike_threshold=v_theta, spike_reset=-v_theta,
    node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": alpha,
               "all/qif_sfa_op/k": k},
    coupling_dtype="bfloat16",  # TPU fast path: halves coupling HBM traffic
)
net.add_func_node("inp", 1, activation_function="tanh")
net.add_edge("inp", "qif")

# simulate, recording the population-mean synaptic activation every 100 steps
obs = net.run(inp, record_output=False, record_vars=[("qif", "s", True)],
              sampling_steps=100)

if __name__ == "__main__":
    obs.plot(("qif", "s"))
    import matplotlib.pyplot as plt

    plt.show()
