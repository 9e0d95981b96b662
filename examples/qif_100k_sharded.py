"""Stretch config (BASELINE.md configs[4]): a 100k-neuron QIF population with
heterogeneous delayed self-feedback (DDE ring buffer), block-sparse coupling.

This runs at its NOMINAL size on a single 16 GB v5e chip: the fan-in-1000
coupling is block-sparse (ops/sparse.py) -- 0.4 GB bf16 streamed per step
instead of the 20 GB dense matrix that cannot exist on chip -- and the
per-neuron delay feedback is a diagonal LinearMemory edge (O(N) state, no
(N, N) identity).  On a pod the same program row-shards the blocks over the
ICI mesh (see tests/test_sparse.py::test_sparse_sharded_run...).

Usage:
    QIF_N=100000 QIF_T=2000 python examples/qif_100k_sharded.py   # real TPU
    # ONE MILLION neurons on one 16 GB chip (2 GB int8 block stream,
    # 3.4e8 nu/s measured; the C++ sampler builds the graph in ~60s):
    QIF_N=1000000 QIF_T=2000 QIF_COUPLING=int8 python examples/qif_100k_sharded.py
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    QIF_N=2048 QIF_T=200 python examples/qif_100k_sharded.py      # CPU mesh
    # TRAIN the coupling + feedback gains at nominal N (deferred-gradient
    # graph trajectory; 847 ms/epoch with int8_master blocks on one v5e):
    QIF_TRAIN=1 QIF_FWD=0 QIF_COUPLING=int8_master \
    python examples/qif_100k_sharded.py
"""

import os
import sys
import time

try:  # prefer the installed package (pip install -e .)
    import rectipy_tpu  # noqa: F401
except ImportError:  # fallback: run from a source checkout
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

BS = int(os.environ.get("QIF_BS", 512))
N_req = int(os.environ.get("QIF_N", 100_000))
N = ((N_req + BS - 1) // BS) * BS  # round up to the block grid
T = int(os.environ.get("QIF_T", 2_000))
FAN_IN = max(4, min(1000, N // 8))
dt = 1e-4

print(f"N={N} (requested {N_req}), fan-in={FAN_IN}, block={BS}, T={T}", flush=True)
t0 = time.perf_counter()
A = block_random_connectivity(N, N, FAN_IN, block_size=BS, seed=0)
print(f"sampled block-sparse coupling in {time.perf_counter() - t0:.1f}s: "
      f"blocks {A.blocks.shape} "
      f"({os.environ.get('QIF_COUPLING', 'bfloat16')} on device)", flush=True)

rng = np.random.default_rng(1)
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))
delays = rng.integers(0, 8, size=N)  # heterogeneous integer delays (in steps)

net = FeedbackNetwork(dt)
net.add_func_node("inp", 1, activation_function="identity")
net.add_diffeq_node(
    "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", weights=A,
    source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
    spike_var="spike", spike_def="v", op="qif_sfa_op",
    spike_threshold=1e2, spike_reset=-1e2,
    node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": 0.05,
               "all/qif_sfa_op/k": 15.0},
    coupling_dtype=os.environ.get("QIF_COUPLING", "bfloat16"),
)
# common scalar drive projected onto the population (keeps host->device
# input traffic at (T, 1) instead of (T, N))
net.add_edge("inp", "qif", weights=rng.normal(size=(N, 1)).astype(np.float32))
# delayed self-feedback: per-neuron integer delays through a DDE ring buffer,
# diagonal gains (the TPU-native form of the reference's LinearMemory DDE,
# /root/reference/rectipy/edges.py:85-94)
net.add_edge("qif", "qif", weights=np.full(N, 0.3, dtype=np.float32),
             delays=delays, feedback=True)
net.compile()

inputs = np.zeros((T, 1), dtype=np.float32)
inputs[T // 4:, 0] = 3.0

print(f"device={jax.devices()[0]}", flush=True)
RUN_FWD = os.environ.get("QIF_FWD", "1") == "1"
t0 = time.perf_counter()
if RUN_FWD:
    obs = net.run(inputs[: min(T, 200)], record_output=False, sampling_steps=100,
                  record_vars=[("qif", "s", True)], verbose=False)
    print(f"first run (incl. compile): {time.perf_counter() - t0:.1f}s", flush=True)

    net.reset()
    t0 = time.perf_counter()
    obs = net.run(inputs, record_output=False, sampling_steps=100,
                  record_vars=[("qif", "s", True)], verbose=False)
    wall = time.perf_counter() - t0
    s_mean = obs.to_numpy(("qif", "s"))
    assert np.all(np.isfinite(s_mean)), "non-finite dynamics"
    print(f"{T} steps x {N} neurons in {wall:.2f}s -> "
          f"{T * N / wall:.3e} neuron-updates/s; mean(s) in "
          f"[{s_mean.min():.5f}, {s_mean.max():.5f}]", flush=True)

# ---------------------------------------------------------------- training
# QIF_TRAIN=1: train the block-sparse coupling AND the diagonal feedback
# gains at the nominal N through the deferred-gradient graph trajectory
# (ops/graph_bptt.py) -- plain autodiff would carry the full coupling
# cotangent through the backward scan, which cannot exist at N=100k.
if os.environ.get("QIF_TRAIN", "0") == "1":
    T_tr = int(os.environ.get("QIF_TRAIN_T", 500))
    n_ep = int(os.environ.get("QIF_TRAIN_EPOCHS", 8))
    rng_t = np.random.default_rng(2)
    inp_tr = np.zeros((T_tr, 1), dtype=np.float32)
    inp_tr[T_tr // 4:, 0] = 3.0
    tgt_tr = (0.05 + 0.01 * np.sin(np.linspace(0, 8 * np.pi, T_tr))
              )[:, None].astype(np.float32) * np.ones((1, N), dtype=np.float32)

    # a fresh network with the coupling + feedback gains marked trainable.
    # Training needs ACTIVITY inside the horizon: the coupling gradient is
    # delta (x) s, so a silent population (the dt=1e-4 long-simulation
    # regime above: QIF period >> 500 steps) has exactly-zero coupling
    # gradients.  The training demo therefore runs in a spiking regime --
    # dt=1e-3 and suprathreshold etas (QIF period ~ pi/sqrt(eta) ~ 300
    # steps), the same scales as the reference's BPTT workload
    # (/root/reference/documentation/bptt_spiking_neurons_recurrent.py).
    dt_tr = 1e-3
    etas_tr = 100.0 + 20.0 * rng_t.standard_normal(N)
    net2 = FeedbackNetwork(dt_tr)
    net2.add_func_node("inp", 1, activation_function="identity")
    net2.add_diffeq_node(
        "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", weights=A,
        source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
        spike_var="spike", spike_def="v", op="qif_sfa_op",
        spike_threshold=1e2, spike_reset=-1e2,
        node_vars={"all/qif_sfa_op/eta": etas_tr, "all/qif_sfa_op/alpha": 0.05,
                   "all/qif_sfa_op/k": 15.0},
        coupling_dtype=os.environ.get("QIF_COUPLING", "bfloat16"),
        train_params=["weights"],
    )
    net2.add_edge("inp", "qif", weights=rng.normal(size=(N, 1)).astype(np.float32))
    net2.add_edge("qif", "qif", weights=np.full(N, 0.3, dtype=np.float32),
                  delays=delays, feedback=True, train="gd")
    net2.compile()

    # QIF_TRAIN_REMAT=K: chunked checkpointing inside the graph trajectory
    # (O(T/K) residual memory) -- enables long horizons (QIF_TRAIN_T=2000+)
    # where full residuals (~5.4 MB/step at this N) would crowd out HBM
    remat = int(os.environ.get("QIF_TRAIN_REMAT", 0))
    # pre-stage the epoch arrays on device ONCE (the (T, N) target is 200 MB
    # at this N -- re-transferring it every fit over a tunneled chip costs
    # seconds) and warm with the SAME epoch count as the timed fit so the
    # exact programs (incl. the 8-epoch chunk scan) compile outside the clock
    import jax
    import jax.numpy as jnp

    inp_d = jax.device_put(jnp.asarray(inp_tr))
    tgt_d = jax.device_put(jnp.asarray(tgt_tr))
    lr_tr = float(os.environ.get("QIF_TRAIN_LR", 1e-3))
    t0 = time.perf_counter()
    obs = net2.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam",
                        lr=lr_tr, verbose=False, fused_bptt=True,
                        remat_steps=remat)
    print(f"train warmup ({n_ep} epochs + compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    obs = net2.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam",
                        lr=lr_tr, verbose=False, fused_bptt=True,
                        remat_steps=remat)
    wall = time.perf_counter() - t0
    losses = np.asarray(obs["epoch_loss"])
    print(f"TRAINED {n_ep} epochs x {T_tr} steps x {N} neurons in {wall:.2f}s "
          f"-> {wall / n_ep * 1e3:.0f} ms/epoch = "
          f"{T_tr * N * n_ep / wall:.3e} trained neuron-updates/s; "
          f"loss {losses[0]:.6e} -> {losses[-1]:.6e}", flush=True)
    assert np.all(np.isfinite(losses)), "non-finite training loss"
