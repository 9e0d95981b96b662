"""Population-scale online plasticity: block-sparse STDP at N=100k.

A dense plastic coupling cannot exist at this size (the (N, N) weight
matrix alone is 40 GB at N=100352) -- the reference framework has no
plasticity of any kind, and even here plasticity only reaches this scale
because the plastic tensor is the fan-in block structure
(:class:`rectipy_tpu.edges.BlockSparseSTDP`): traces stay O(N) vectors and
the LTP/LTD outer products become per-block outer products fused into the
block tensor's per-step read-modify-write (measured 3.91e7 nu/s on a v5e,
benchmarks/stdp_scale.py).

The experiment: a QIF population whose ONLY recurrent coupling is the
plastic block edge, driven by a Poisson drive generated on device.  STDP
with hard-bounded weights plus Turrigiano homeostatic scaling (every
``STDPB_HOMEO`` steps each neuron's above-floor input mass renormalizes to
its initial value), recording spike rasters and weight statistics in the
same scan program.

Run: python examples/stdp_100k_blocks.py
Env: STDPB_N (100352), STDPB_BS (512), STDPB_FAN (1000), STDPB_T (2000),
     STDPB_HOMEO (500)
"""

import os
import sys

try:  # prefer the installed package (pip install -e .)
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import FeedbackNetwork, Poisson
from rectipy_tpu.edges import BlockSparseSTDP
from rectipy_tpu.ops.sparse import block_random_connectivity

N = int(os.environ.get("STDPB_N", 100_352))
BS = int(os.environ.get("STDPB_BS", 512))
FAN = int(os.environ.get("STDPB_FAN", 1000))
T = int(os.environ.get("STDPB_T", 2000))
HOMEO = int(os.environ.get("STDPB_HOMEO", 500))
dt = 1e-4

rng = np.random.default_rng(7)
A = block_random_connectivity(N, N, FAN, block_size=BS, seed=7)
# scatter the sampled synapses to U(0, 15/fan_in)
A.blocks *= rng.random(A.blocks.shape, dtype=np.float32) * 15.0

net = FeedbackNetwork(dt)
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))
net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                    weights=None, n=N, input_var="I_ext", output_var="s",
                    spike_var="spike", reset_var="v",
                    spike_threshold=1e2, spike_reset=-1e2,
                    node_vars={"all/qif_op/eta": etas})
net.add_edge("qif", "qif", feedback=True, train="stdp", weights=A,
             tau_plus=10 * dt, tau_minus=10 * dt,
             a_plus=1e-3 / FAN, a_minus=1.2e-3 / FAN,
             w_min=0.0, w_max=30.0 / FAN, soft_bounds=False)
edge = net.get_edge("qif", "qif")
assert isinstance(edge, BlockSparseSTDP)
W0 = np.asarray(edge.params["weights"])
mass0 = W0.sum(axis=(1, 3)).ravel()  # per-neuron input mass

drive = Poisson(T, channels=1, rate=50.0, amp=10.0, seed=1)
obs = net.fit_stdp(drive, sampling_steps=max(1, T // 20), verbose=False,
                   homeostasis_steps=HOMEO, record_spikes=["qif"])

W1 = np.asarray(edge.params["weights"])
spk = obs.to_numpy(("qif", "spikes"))
w_mean = np.asarray(obs["w_mean"])
drift = np.abs(W1 - W0).max()
mass1 = W1.sum(axis=(1, 3)).ravel()
print(f"N={N} fan_in={FAN}: plastic block tensor "
      f"{W1.nbytes / 2**30:.2f} GiB (dense would be {N*N*4 / 2**30:.0f} GiB)")
print(f"{T} steps: total spikes {int(spk.sum())}, |dW|max {drift:.3e}, "
      f"w_mean {w_mean[0]:.5f} -> {w_mean[-1]:.5f}")
aligned = (T % HOMEO) == 0
print(f"homeostasis ({'aligned segmented' if aligned else 'per-step cond'} "
      f"path): max per-neuron input-mass drift "
      f"{np.abs(mass1 - mass0).max():.2e} (target: ~0)")
assert np.all(np.isfinite(W1))
assert spk.sum() > 0, "population stayed silent"
assert drift > 0, "plasticity never moved a weight"
if aligned:
    # final step is a scaling boundary: masses are freshly pinned
    np.testing.assert_allclose(mass1, mass0, rtol=1e-3)
print("OK")
