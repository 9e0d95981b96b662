"""Unsupervised STDP on a recurrent spiking population (beyond reference).

A QIF population with a plastic recurrent self-edge learns its own
connectivity from a Poisson drive: `add_edge(..., feedback=True,
train='stdp')` + `Network.fit_stdp` run the pair-based all-to-all trace rule
(Morrison, Diesmann & Gerstner 2008) as ONE fused on-device scan -- the
weight matrix and both eligibility traces ride the scan carry, and the
pre-/post-synaptic spike trains are the integrator's own per-step spike
decisions.  The reference has no local plasticity rule at all (its online
trainers are RLS, /root/reference/rectipy/network.py:786, and the
NotImplementedError e-prop stub, network.py:858-896) and would have to step
this in Python.

The classic outcome with soft bounds: the weight distribution, initialized
uniform, drifts toward a unimodal competitive equilibrium while the
population rate stays bounded (depression dominates, a_minus > a_plus).

Usage:
    python examples/stdp_plasticity.py          # TPU
    STDP_N=500 STDP_T=50000 python examples/stdp_plasticity.py
"""

import os
import sys

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import FeedbackNetwork, Poisson

N = int(os.environ.get("STDP_N", 200))
T = int(os.environ.get("STDP_T", 20_000))
dt = 1e-3
CHUNK = T // 2                               # two chunked calls == one long run

rng = np.random.default_rng(1)
net = FeedbackNetwork(dt)
net.add_diffeq_node(
    "qif", "rectipy_tpu.models.spiking_neurons.qif.qif", weights=np.zeros((N, N)),
    source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
    spike_var="spike", reset_var="v", spike_threshold=100.0, spike_reset=-100.0,
    node_vars={"all/qif_op/eta": rng.uniform(-2.0, 1.0, N)})

# plastic recurrent coupling: one-step-delayed self-edge, soft-bounded STDP
w0 = rng.uniform(0.0, 0.4, size=(N, N))
net.add_edge("qif", "qif", feedback=True, train="stdp", weights=w0,
             tau_plus=20e-3, tau_minus=20e-3, a_plus=5e-3, a_minus=6e-3,
             w_min=0.0, w_max=0.5, soft_bounds=True)

drive = Poisson(CHUNK, channels=N, rate=40.0, amp=15.0, seed=3)

# chunked plasticity: traces, weights and network state persist on the edge,
# so the second call continues the first bit-exactly (regression-tested);
# spec.shifted(CHUNK) continues the Poisson stream in global time
# STDP_HOMEO=<steps> interleaves Turrigiano-style multiplicative synaptic
# scaling: each postsynaptic row's mass is pinned to its initial sum every
# <steps> steps, so the competitive structure forms WITHOUT total-input
# drift (the target and schedule persist across the chunked calls)
homeo = int(os.environ.get("STDP_HOMEO", "0")) or None
obs1 = net.fit_stdp(drive, sampling_steps=200, verbose=False,
                    homeostasis_steps=homeo)
obs2 = net.fit_stdp(drive.shifted(CHUNK), sampling_steps=200, verbose=False,
                    homeostasis_steps=homeo)
W = np.asarray(net.get_edge("qif", "qif").params["weights"])
if homeo:
    # NOTE reference-parity: square weight matrices are auto-transposed on
    # edge construction, so the stored rows are w0's COLUMNS
    drift = np.max(np.abs(W.sum(axis=1) - w0.sum(axis=0)))
    print(f"homeostasis (every {homeo} steps): max row-sum drift {drift:.2e}")

w_mean = np.concatenate([np.asarray(obs1["w_mean"]), np.asarray(obs2["w_mean"])])
print(f"STDP on N={N} recurrent QIF, T={T} steps (one fused scan)")
print(f"w_mean trajectory: {w_mean[0]:.4f} -> {w_mean[-1]:.4f} "
      f"(init {w0.mean():.4f}); bounds [0, 0.5] respected: "
      f"{W.min() >= 0.0 and W.max() <= 0.5}")
hist, _ = np.histogram(W, bins=5, range=(0.0, 0.5))
print(f"final weight histogram (5 bins over [0, 0.5]): {hist}")
assert np.all(np.isfinite(W))
if homeo:
    # row sums are pinned by design; the STRUCTURE must still reorganize
    assert np.max(np.abs(W - w0.T)) > 1e-3, "weights never moved"  # stored = w0.T
else:
    assert abs(float(w_mean[-1]) - w0.mean()) > 1e-4, "weights never moved"

if os.environ.get("STDP_PLOT", "0") == "1":
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(10, 4))
    w_steps = np.concatenate([np.asarray(obs1["w_steps"]),
                              np.asarray(obs2["w_steps"]) + CHUNK])
    ax0.plot(w_steps * dt, w_mean)
    ax0.set_xlabel("time")
    ax0.set_ylabel("mean recurrent weight")
    ax1.hist(W.ravel(), bins=40, range=(0.0, 0.5), color="k")
    ax1.set_xlabel("weight")
    ax1.set_ylabel("count")
    fig.tight_layout()
    fig.savefig("/tmp/stdp_weights.png", dpi=120)
    print("wrote /tmp/stdp_weights.png")
