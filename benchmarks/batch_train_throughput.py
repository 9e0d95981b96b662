"""Ensemble (batched-trial) TRAINING throughput at N=10k QIF (v5e).

fit_bptt_batch takes each adam update over the mean loss of B independent
trials via the vmapped deferred-gradient trajectory: the forward coupling
matvec AND the backward transposed matvec become (B, N) x (N, N) matmuls
that amortize the weight stream over the batch, so aggregate TRAINED
neuron-updates/s should scale past the single-trial 5.4e7 headline until
residual/activation traffic saturates HBM.  No reference analog (the
reference trains one trial per epoch, torch-CPU).

Workload mirrors bench.py's qif-BPTT north-star (N=10k, T=500, dt=5e-3,
int8_master coupling, adam), batched over B trials per update.

Protocol: CLAUDE.md rules — fit_* fetches losses to host internally, so
wall-clock per fit is a reliable device timing; best-of-several; epoch
counts are multiples of network._EPOCH_SCAN_CHUNK=8 so exactly two
programs compile per B.
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

t00 = time.perf_counter()


def lap(m):
    print(f"[{time.perf_counter()-t00:7.1f}s] {m}", flush=True)


for a in range(40):
    try:
        lap(f"backend: {jax.devices()}"); break
    except Exception as e:
        lap(f"unavailable ({type(e).__name__}); sleep 120"); time.sleep(120)
else:
    sys.exit("relay never came back")

from rectipy_tpu import Network

N = int(os.environ.get("N", 10_000))
T = int(os.environ.get("STEPS", 500))
DT = 5e-3
COUPLING = os.environ.get("COUPLING", "int8_master")
N_EP = int(os.environ.get("N_EP", 16))
REMAT = int(os.environ.get("REMAT", 0))  # remat_steps: trade a recomputed
# forward for O(T/k + k) residual memory -- lets B grow past the HBM cap
rng = np.random.default_rng(2)
W = (rng.random((N, N)) < 0.1) * (1.0 / (0.1 * N))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))

net = Network(DT)
net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                    weights=W, source_var="s", target_var="s_in",
                    input_var="I_ext", output_var="s", op="qif_op",
                    spike_var="spike", spike_def="v",
                    spike_threshold=1e2, spike_reset=-1e2,
                    node_vars={"all/qif_op/eta": etas},
                    coupling_dtype=COUPLING, train_params=["weights"])
lap("network built")

for B in (int(x) for x in os.environ.get("BATCHES", "1,4,8,16").split(",")):
    ins = jax.device_put(jnp.asarray(
        rng.normal(size=(B, T, N)), dtype=jnp.float32))
    tgt = jax.device_put(jnp.asarray(
        rng.normal(size=(B, T, N)), dtype=jnp.float32))
    jax.block_until_ready((ins, tgt))
    lap(f"[B={B:3d}] staged 2x{ins.nbytes / 2**20:.0f} MB trial arrays")
    kw = {"remat_steps": REMAT} if REMAT else {}
    t0 = time.perf_counter()
    net.fit_bptt_batch(ins, tgt, n_epochs=N_EP, optimizer="adam", lr=1e-4,
                       verbose=False, **kw)
    warm = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        obs = net.fit_bptt_batch(ins, tgt, n_epochs=N_EP, optimizer="adam",
                                 lr=1e-4, verbose=False, **kw)
        best = min(best, (time.perf_counter() - t0) / N_EP)
    el = np.asarray(obs["epoch_loss"])
    assert np.all(np.isfinite(el))
    lap(f"[B={B:3d}] warmup {warm:5.1f}s; best {best*1e3:7.1f} ms/epoch -> "
        f"{B*T*N/best:.3e} aggregate trained nu/s "
        f"(per-trial {T*N/best:.2e}; loss {el[0]:.4f}->{el[-1]:.4f})")
