"""Two LIF populations coupled with an excitatory feedforward and an
inhibitory feedback edge -- the workload of the reference's
documentation/rnn_tryout.py, using FeedbackNetwork's one-step-delayed
feedback semantics."""

import os

import numpy as np

from rectipy_tpu import FeedbackNetwork

dt = 1e-2
net = FeedbackNetwork(dt)

N, k = int(os.environ.get("FBP_N", 100)), 10.0
neuron = "rectipy_tpu.models.spiking_neurons.lif.lif"
rng = np.random.default_rng(5)
for label in ("p1", "p2"):
    net.add_diffeq_node(label, node=neuron, input_var="I_ext", output_var="s",
                        weights=rng.normal(size=(N, N)), source_var="s",
                        target_var="s_in", op="lif_op", spike_var="spike",
                        spike_def="v")

# excitatory feedforward p1 -> p2, inhibitory feedback p2 -> p1
net.add_edge("p1", "p2", weights=k * rng.random((N, N)), train=None)
net.add_edge("p2", "p1", weights=-10 * k * rng.random((N, N)), feedback=True)

steps = int(os.environ.get("FBP_STEPS", 10_000))
inp = np.zeros((steps, 1)) + 100.0
obs = net.run(inputs=inp, sampling_steps=10)

if __name__ == "__main__":
    import matplotlib.pyplot as plt

    out = obs.to_numpy("out")
    plt.plot(np.mean(out, axis=1))
    plt.show()
