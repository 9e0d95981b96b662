"""Spike-train and signal statistics on a delay-coupled feedforward pair.

The standard electrophysiology analysis chain, end-to-end on device: two
QIF populations where `a` is rhythmically driven (constant + sine) and
projects to `b` through a DELAYED edge (the reference's `LinearMemory`
semantics, /root/reference/rectipy/edges.py:68-94).  One compiled run
records exact spike rasters for both populations plus their synaptic
activations; the Observer then answers the three questions an
experimentalist asks of such a pair:

1. How do the neurons fire? -- `isi_stats` (ISI mean/CV: tonic vs
   irregular), `rates`, `psth`.
2. Do the populations share a rhythm? -- `coherence` peaks at the drive
   frequency.
3. Who leads whom, and by how much? -- `xcorr` peak at a POSITIVE lag
   (`a` leads `b`) at least the axonal delay (plus b's synaptic lag).

The reference can only sample state variables and leaves all statistics
to the user (/root/reference/rectipy/observer.py:119-128).

Time is in MILLISECONDS (dt = 0.1 ms, tau = 15 ms): explicit Euler on the
QIF needs dt << tau/|v_reset|, so second-scale units with +-100 resets
would demand a 100x smaller step (the first post-reset step would
otherwise overshoot the whole trajectory).

Usage:
    python examples/spike_statistics.py                  # TPU
    SPK_N=64 SPK_T=8000 python examples/spike_statistics.py   # toy/CPU
"""

import os
import sys

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import Network
from rectipy_tpu.inputs import Constant, Sine
from rectipy_tpu.utility import random_connectivity

N = int(os.environ.get("SPK_N", 500))
T = int(os.environ.get("SPK_T", 40_000))         # 4 s at dt = 0.1 ms
dt = 0.1                                         # ms
f0 = 0.004                                       # drive rhythm: 4 Hz in 1/ms
d_steps = int(os.environ.get("SPK_DELAY", 300))  # axonal delay a -> b: 30 ms
QIF = "rectipy_tpu.models.spiking_neurons.qif.qif"

rng = np.random.default_rng(0)


def add_pop(net, label, eta_mean):
    W = random_connectivity(N, N, 0.1, normalize=True, rng=rng) * 0.05
    net.add_diffeq_node(
        label, QIF, weights=W, source_var="s", target_var="s_in",
        input_var="I_ext", output_var="s", op="qif_op", spike_var="spike",
        reset_var="v", spike_threshold=100.0, spike_reset=-100.0,
        # 15 ms membranes: period = pi*tau/sqrt(eta_eff) -> tens of Hz
        node_vars={"all/qif_op/eta": eta_mean + 0.3 * rng.standard_normal(N),
                   "all/qif_op/tau": 15.0, "all/qif_op/tau_s": 5.0})


net = Network(dt)
add_pop(net, "a", eta_mean=1.0)            # suprathreshold: tonic firing
add_pop(net, "b", eta_mean=-2.0)           # subthreshold: fires only when driven
# delayed feedforward projection a -> b (ring-buffer edge); scale set so
# a's rhythmic synaptic output swings b across threshold
# (the inter-node edge feeds b's I_ext: I_ext ~ w * rate_a * tau_s)
net.add_edge("a", "b", weights=random_connectivity(N, N, 0.2, normalize=True,
                                                   rng=rng) * 25.0,
             delays=np.full(N, d_steps))

drive = Constant(T, channels=1, value=2.0) + Sine(T, channels=1, freq=f0, amp=1.5)
obs = net.run(drive, sampling_steps=10, verbose=False,   # 1 ms record grid
              record_spikes=["a", "b"],
              record_vars=[("a", "s", False), ("b", "s", False)])

# 1. firing statistics ------------------------------------------------------
for label in ("a", "b"):
    st = obs.isi_stats(label)
    r = obs.rates(label) * 1e3             # 1/ms -> Hz
    alive = np.isfinite(st["cv"])
    print(f"[{label}] rate {r.mean():.1f} Hz | ISI CV "
          f"{np.nanmean(st['cv']):.3f} over {alive.sum()}/{N} neurons "
          f"(mean ISI {np.nanmean(st['mean_isi']):.1f} ms)")
times, psth_a = obs.psth("a")
_, psth_b = obs.psth("b")
assert obs.rates("a").mean() * 1e3 > 5.0, "population a must fire tonically"
assert obs.rates("b").mean() * 1e3 > 1.0, "population b must be driven to fire"

# 2. shared rhythm ----------------------------------------------------------
# (NOTE this pair is fully deterministic given the drive, so coherence is
# high across the whole band; with independent noise sources per
# population only the shared rhythm would survive -- the discriminating
# case is regression-tested in tests/test_coverage_extras.py)
freqs, cxy = obs.coherence(("a", "s"), ("b", "s"),
                           nperseg=min(1024, len(times)))
i0 = np.argmin(np.abs(freqs - f0))
print(f"coherence at the {f0*1e3:.0f} Hz drive: {cxy[i0]:.3f}")
assert cxy[i0] > 0.6, "populations must share the drive rhythm"

# 3. directionality and delay ----------------------------------------------
lags, corr = obs.xcorr(("a", "s"), ("b", "s"), max_lag=150)
peak_lag = lags[np.argmax(corr)]
print(f"xcorr peak at {peak_lag:+.0f} ms (axonal delay {d_steps*dt:.0f} ms "
      f"+ b's synaptic lag), corr {corr.max():.3f}")
assert peak_lag > 0, "a must LEAD b (positive-lag peak)"
assert peak_lag >= d_steps * dt - 1e-9, "lead must be at least the axonal delay"

if os.environ.get("SPK_PLOT", "0") == "1":
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(8, 8), sharex=False)
    obs.raster("a", ax=axes[0])
    axes[1].plot(times, psth_a, label="a")
    axes[1].plot(times, psth_b, label="b")
    axes[1].set_ylabel("PSTH (1/ms)"); axes[1].legend()
    axes[2].plot(lags, corr)
    axes[2].axvline(d_steps * dt, ls="--", c="k", lw=0.8)
    axes[2].set_xlabel("lag (ms)"); axes[2].set_ylabel("xcorr a->b")
    fig.tight_layout(); fig.savefig("/tmp/spike_statistics.png", dpi=120)
    print("wrote /tmp/spike_statistics.png")
