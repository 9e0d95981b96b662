"""Million-neuron BPTT probe: frozen block-sparse coupling + trainable O(N)
parameters (per-neuron delayed-feedback gains and the input projection).

The full-coupling int8_master training path cannot exist at N=1e6 on one
chip (f32 master 8 GB + two adam moments = 24 GB), but the scientifically
common configuration -- a FROZEN random reservoir with trainable low-rank /
diagonal parameters -- only carries O(N) trainables.  The graph trajectory
already emits stage cotangents for diagonal gains and edge weights, so this
measures whether the residual stack fits and what an epoch costs.

Usage:
    MT_N=1000448 MT_T=200 MT_EPOCHS=8 python benchmarks/million_train.py
    MT_REMAT=50 ... # chunked residuals for longer T
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from rectipy_tpu import FeedbackNetwork
from rectipy_tpu.ops.sparse import block_random_connectivity

BS = 512
N = int(os.environ.get("MT_N", 1_000_448))
T = int(os.environ.get("MT_T", 200))
EPOCHS = int(os.environ.get("MT_EPOCHS", 8))
REMAT = int(os.environ.get("MT_REMAT", 0))
dt = 1e-3

print(f"device={jax.devices()[0]} N={N} T={T} epochs={EPOCHS} remat={REMAT}", flush=True)

t0 = time.perf_counter()
A = block_random_connectivity(N, N, 1000, block_size=BS, seed=0)
print(f"sampled coupling in {time.perf_counter() - t0:.1f}s", flush=True)

rng = np.random.default_rng(1)
# spiking regime WITHIN the horizon (QIF period ~ pi/sqrt(eta) time units;
# eta=1000 -> ~100 steps at dt=1e-3): a silent population has exactly-zero
# coupling/gain gradients
ETA = float(os.environ.get("MT_ETA", 1000.0))
etas = ETA + 0.2 * ETA * rng.standard_normal(N)
delays = rng.integers(0, 4, size=N)

net = FeedbackNetwork(dt)
net.add_func_node("inp", 1, activation_function="identity")
net.add_diffeq_node(
    "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", weights=A,
    source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
    spike_var="spike", spike_def="v", op="qif_sfa_op",
    spike_threshold=1e2, spike_reset=-1e2,
    node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": 0.05,
               "all/qif_sfa_op/k": 15.0},
    coupling_dtype="int8",  # FROZEN reservoir: no master, no moments
)
net.add_edge("inp", "qif", weights=rng.normal(size=(N, 1)).astype(np.float32),
             train="gd")
net.add_edge("qif", "qif", weights=np.full(N, 0.3, dtype=np.float32),
             delays=delays, feedback=True, train="gd")
net.compile()
del A

inp = np.zeros((T, 1), dtype=np.float32)
inp[T // 4:, 0] = 3.0
tgt = (0.05 + 0.01 * np.sin(np.linspace(0, 8 * np.pi, T))
       )[:, None].astype(np.float32) * np.ones((1, N), dtype=np.float32)

kw = {}
if REMAT:
    kw["remat_steps"] = REMAT
t0 = time.perf_counter()
obs = net.fit_bptt([inp] * EPOCHS, [tgt] * EPOCHS, optimizer="adam", lr=1e-3,
                   verbose=False, **kw)
wall = time.perf_counter() - t0
losses = np.asarray(obs["epoch_loss"], dtype=float)
print(f"fit (incl. compile): {wall:.1f}s; losses {losses[:3]} ... {losses[-1]:.6f}",
      flush=True)
assert np.isfinite(losses).all()
assert losses[-1] < losses[0], "loss did not decrease"

# timed epochs on the cached program
t0 = time.perf_counter()
obs = net.fit_bptt([inp] * EPOCHS, [tgt] * EPOCHS, optimizer="adam", lr=1e-3,
                   verbose=False, **kw)
wall = time.perf_counter() - t0
per_epoch = wall / EPOCHS
print(f"cached fit: {wall:.1f}s = {per_epoch * 1e3:.0f} ms/epoch -> "
      f"{T * N / per_epoch:.3e} trained neuron-updates/s", flush=True)
