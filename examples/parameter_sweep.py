"""Bifurcation diagram in one program: sweep QIF excitability (eta) across
trials with run_batch(batch_vars=...) -- every trial integrates with its own
eta, the whole sweep is one vmapped scan (batched coupling matvecs run as
MXU matmuls), and the firing-rate curve over eta falls out of one call.

The reference would loop B separate runs in Python; here B=64 points of an
N=1000 network sweep cost barely more than one run.
"""

import os

import numpy as np

from rectipy_tpu import Network

N = int(os.environ.get("PS_N", 1000))
B = int(os.environ.get("PS_B", 64))
T = int(os.environ.get("PS_T", 20_000))
dt = 1e-3
rng = np.random.default_rng(0)
W = (rng.random((N, N)) < 0.1) * (1.5 / (0.1 * N))

net = Network(dt)
net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                    weights=W, source_var="s", target_var="s_in",
                    input_var="I_ext", output_var="s", op="qif_op",
                    spike_var="spike", spike_def="v",
                    spike_threshold=1e2, spike_reset=-1e2,
                    float_precision="float32")

etas = np.linspace(-10.0, 10.0, B)
res = net.run_batch(np.zeros((B, T, 1), dtype=np.float32),  # (B,T,1) broadcasts; (B,T,N) would stage 5 GB
                    batch_vars={("qif", "eta"): etas},
                    record_output=False, record_vars=[("qif", "s", True)],
                    sampling_steps=100, cutoff=T // 2, verbose=False)
rates = np.asarray(res[("qif", "s")]).mean(axis=(1,))  # (B,) mean-field rate

print("eta -> mean network activity s (bifurcation curve):")
for e, r in zip(etas[::8], rates[::8]):
    print(f"  eta={e:+6.2f}  s={float(np.mean(r)):.4f}")
onset = etas[np.argmax(np.asarray([float(np.mean(r)) for r in rates]) > 1e-3)]
print(f"firing onset near eta ~ {onset:.2f}")
