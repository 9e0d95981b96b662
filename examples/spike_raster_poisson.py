"""Spike rasters from an on-device Poisson-driven spiking ensemble.

The canonical in-vivo-like experiment the reference cannot express in one
program: a QIF population driven by extrinsic Poisson spike trains, with
exact per-neuron spike rasters recorded -- and the whole trial ensemble
(one Poisson realization per trial) as ONE compiled vmapped scan.

Everything stays on device: the Poisson input is generated inside the scan
(`rectipy_tpu.inputs.Poisson`, zero host->device transfer) and the raster
is accumulated inside the scan (`record_spikes=`, the integrator's own
per-step spike decision -- nothing between samples is missed).  The
reference would need a host-materialized (B, T, N) input array and can
only sample state variables (/root/reference/rectipy/observer.py:79-105).

Usage:
    python examples/spike_raster_poisson.py                 # TPU
    RASTER_N=200 RASTER_B=4 python examples/spike_raster_poisson.py
"""

import os
import sys

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import Network, Poisson, random_connectivity

N = int(os.environ.get("RASTER_N", 1000))
B = int(os.environ.get("RASTER_B", 16))     # Poisson realizations (trials)
T, dt = 2000, 1e-2
s = 10                                      # raster bin width (steps)

rng = np.random.default_rng(0)
W = random_connectivity(N, N, 0.05, normalize=True, rng=rng) * 2.0
etas = 1.0 + 0.5 * rng.standard_normal(N)   # mostly subthreshold without input

net = Network(dt)
net.add_diffeq_node(
    "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", weights=W,
    source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
    spike_var="spike", spike_def="v", op="qif_sfa_op",
    spike_threshold=100.0, spike_reset=-100.0,
    node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": 0.1,
               "all/qif_sfa_op/k": 5.0})

# B independent Poisson realizations, generated on device ((B,) seeds);
# rate ramps nothing -- steady 8 Hz trains, amplitude 20
drive = Poisson(T, channels=N, rate=8.0, amp=20.0, seed=np.arange(B))

res = net.run_batch(drive, sampling_steps=s, record_output=False,
                    record_spikes=["qif"], record_vars=[("qif", "s", True)])
counts = res[("qif", "spikes")]             # (B, T//s, N) int32 raster bins
rate = counts.sum(axis=2) / (N * s * dt)    # (B, bins) population rate (Hz)

print(f"raster: {counts.shape} int32 bins; total spikes/trial "
      f"min={counts.sum(axis=(1, 2)).min()} max={counts.sum(axis=(1, 2)).max()}")
print(f"population rate: mean {rate.mean():.3f} Hz, trial-to-trial std of the "
      f"time-mean {rate.mean(axis=1).std():.4f} Hz")
assert counts.sum() > 0, "silent network -- raise the Poisson rate/amp"

# PSTH across realizations (the standard analysis): mean rate per bin
psth = rate.mean(axis=0)
print(f"PSTH: {psth.shape[0]} bins, peak {psth.max():.3f} Hz at bin {psth.argmax()}")

if os.environ.get("RASTER_PLOT", "0") == "1":
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax0, ax1) = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    t_bins, n_idx = np.nonzero(counts[0])
    ax0.scatter(t_bins * s * dt, n_idx, s=1, c="k")
    ax0.set_ylabel("neuron")
    ax1.plot(np.arange(len(psth)) * s * dt, psth)
    ax1.set_xlabel("time")
    ax1.set_ylabel("PSTH (Hz)")
    fig.savefig("/tmp/spike_raster.png", dpi=120)
    print("wrote /tmp/spike_raster.png")
