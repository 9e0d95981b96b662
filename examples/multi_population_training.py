"""End-to-end training of a multi-population circuit through the
deferred-gradient GRAPH trajectory (ops/graph_bptt.py).

Architecture (a shape the reference could express but only train at
plain-autodiff speed): an input layer projects onto an excitatory QIF
spiking population; its spikes drive an inhibitory rate population through a
trained projection; the rate population feeds a tanh readout, and a trained
FEEDBACK edge closes the loop back onto the spiking population.  Every
trained weight -- both recurrent couplings, the inter-population
projection, the readout, and the feedback matrix -- gets its gradient from
ONE post-scan matmul instead of a per-step (N, N) accumulation, so training
runs at the coupling-matvec HBM roofline (PARITY.md §6: 138 ms/epoch at
N=10k dense, 847 ms at N=100k block-sparse).

Run on CPU (seconds) or TPU:
    python examples/multi_population_training.py
Env: MPT_N1/MPT_N2/MPT_T/MPT_EPOCHS.

Reference training semantics: /root/reference/rectipy/network.py:603-707.
"""

import os
import sys
import time

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import FeedbackNetwork

QIF = "neuron_model_templates.spiking_neurons.qif.qif"
TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"

n1 = int(os.environ.get("MPT_N1", 200))   # excitatory spiking population
n2 = int(os.environ.get("MPT_N2", 100))   # inhibitory rate population
n_in, n_out = 3, 2
T = int(os.environ.get("MPT_T", 400))
n_epochs = int(os.environ.get("MPT_EPOCHS", 30))
rng = np.random.default_rng(0)

etas = 3.0 + rng.random(n1)   # shared by teacher and student
W_in = rng.normal(size=(n1, n_in))


def build(seed, train):
    r = np.random.default_rng(seed)
    net = FeedbackNetwork(1e-2, dtype="float32")
    net.add_func_node("inp", n_in, activation_function="identity")
    net.add_diffeq_node(
        "exc", QIF, weights=np.abs(r.normal(size=(n1, n1))) * (2.0 / n1),
        input_var="I_ext", output_var="s", source_var="s", target_var="s_in",
        op="qif_op", spike_var="spike", spike_def="v",
        spike_threshold=100.0, spike_reset=-100.0,
        node_vars={"all/qif_op/eta": etas},
        train_params=["weights"] if train else None)
    net.add_diffeq_node(
        "inh", TANH, weights=r.normal(size=(n2, n2)) * 0.2,
        input_var="li_op/I_ext", output_var="li_op/v",
        source_var="tanh_op/r", target_var="li_op/r_in",
        train_params=["weights"] if train else None)
    net.add_func_node("out", n_out, activation_function="tanh")
    net.add_edge("inp", "exc", weights=W_in)
    net.add_edge("exc", "inh", weights=r.normal(size=(n2, n1)) * 0.5,
                 train="gd" if train else None)
    net.add_edge("inh", "out", weights=r.normal(size=(n_out, n2)) * 0.5,
                 train="gd" if train else None)
    # inhibitory feedback onto the spiking population (1-step delay)
    net.add_edge("inh", "exc", weights=r.normal(size=(n1, n2)) * -0.05,
                 feedback=True, train="gd" if train else None)
    net.compile()
    return net


# teacher-student: the target is a TEACHER circuit's output on the same
# drive, so a matching parameterization exists and the loss floor is ~0
t_ax = np.arange(T) * 1e-2
inp = np.stack([np.sin(2 * np.pi * 0.7 * t_ax),
                np.cos(2 * np.pi * 0.3 * t_ax),
                np.ones(T) * 2.0], axis=1).astype(np.float32)
teacher = build(seed=1, train=False)
tgt = teacher.run(inp, verbose=False).to_numpy("out").astype(np.float32)
net = build(seed=2, train=True)

t0 = time.perf_counter()
obs = net.fit_bptt([inp] * n_epochs, [tgt] * n_epochs, optimizer="adam",
                   lr=2e-3, verbose=False, fused_bptt=True)
wall = time.perf_counter() - t0
losses = np.asarray(obs["epoch_loss"])
print(f"{n_epochs} epochs x {T} steps, populations ({n1} spiking + {n2} rate) "
      f"in {wall:.1f}s; loss {losses[0]:.5f} -> {losses[-1]:.5f}")
assert np.isfinite(losses).all()
assert losses[-1] < losses[0] * float(os.environ.get("MPT_TOL", "0.8")), \
    "training did not converge"

obs2 = net.run(inp, verbose=False, record_vars=[("exc", "s", True)])
out = obs2.to_numpy("out")
mse = float(np.mean((out - tgt) ** 2))
print(f"post-training test mse {mse:.5f}; mean spiking activity "
      f"{float(np.mean(obs2.to_numpy(('exc', 's')))):.4f}")
