"""Ensemble (batched-trial) TRAINING throughput at the N=100352 block-sparse
flagship (v5e, one chip).

fit_bptt_batch over the qif_100k_sharded.py training topology (block-sparse
fan-in-1000 coupling + trained delayed-feedback gains, int8_master, T=500):
each adam update takes the mean loss over B trials via the VMAPPED deferred
graph trajectory, so the sparse block matvecs become (B, bs) x (bs, bs)
batched matmuls that amortize the 100 MB int8 weight stream.  The question
is how far B scales before the per-trial residual traffic (the (N,) stage
records the backward needs) hits the HBM/16 GB cap -- single-trial trained
N=100k is 357 ms/epoch = 1.40e8 nu/s (benchmarks/ab_sparse_bwd.py).

Protocol: CLAUDE.md rules -- fit_* fetches losses internally (wall-clock is
a reliable device timing); best-of-several; n_epochs a multiple of the
8-epoch chunk so exactly two programs compile per B; trial inputs stay
(B, T, 1) (the input edge broadcasts -- an (B, T, N) input would re-stage
hundreds of MB per fit).

Env: BATCHES=1,2,4  N_EP=8  REMAT=0  T=500  ACCUM=1

ACCUM=k (round 5): micro-batch gradient accumulation -- the one-chip escape
past the B=4 envelope (B=8 OOMs plain AND remat): each update accumulates
grads over k sequential micro-batches of B/k trials (exact same update;
tests/test_bptt_batch.py pins it), so residual memory is one micro-batch's
while the optimizer still steps on the full-B gradient.
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

from rectipy_tpu import FeedbackNetwork
from rectipy_tpu.ops.sparse import block_random_connectivity

BS, N, FAN_IN = 512, 100_352, 1000
T = int(os.environ.get("T", 500))
N_EP = int(os.environ.get("N_EP", 8))
REMAT = int(os.environ.get("REMAT", 0))
A = block_random_connectivity(N, N, FAN_IN, block_size=BS, seed=0)
rng = np.random.default_rng(0)
rng_t = np.random.default_rng(2)
delays = rng.integers(1, 10, size=N)
etas_tr = 100.0 + 20.0 * rng_t.standard_normal(N)
in_w = rng.normal(size=(N, 1)).astype(np.float32)

net = FeedbackNetwork(1e-3)
net.add_func_node("inp", 1, activation_function="identity")
net.add_diffeq_node(
    "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", weights=A,
    source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
    spike_var="spike", spike_def="v", op="qif_sfa_op",
    spike_threshold=1e2, spike_reset=-1e2,
    node_vars={"all/qif_sfa_op/eta": etas_tr, "all/qif_sfa_op/alpha": 0.05,
               "all/qif_sfa_op/k": 15.0},
    coupling_dtype="int8_master", train_params=["weights"])
net.add_edge("inp", "qif", weights=in_w)
net.add_edge("qif", "qif", weights=np.full(N, 0.3, dtype=np.float32),
             delays=delays, feedback=True, train="gd")
net.compile()
lap("network built")

# per-trial (T, 1) step input + (T, N) target, jittered per trial so the
# trials are genuinely independent
tgt_base = (0.05 + 0.01 * np.sin(np.linspace(0, 8 * np.pi, T))
            )[:, None].astype(np.float32) * np.ones((1, N), dtype=np.float32)

for B in (int(x) for x in os.environ.get("BATCHES", "1,2,4").split(",")):
    ins = np.zeros((B, T, 1), dtype=np.float32)
    ins[:, T // 4:, 0] = 3.0 + 0.1 * rng.standard_normal((B, 1))
    tgt = tgt_base[None] * (1.0 + 0.02 * rng.standard_normal((B, 1, 1))
                            ).astype(np.float32)
    ins = jax.device_put(jnp.asarray(ins))
    tgt = jax.device_put(jnp.asarray(tgt))
    jax.block_until_ready((ins, tgt))
    lap(f"[B={B:2d}] staged {tgt.nbytes / 2**20:.0f} MB targets")
    kw = {"remat_steps": REMAT} if REMAT else {}
    accum = int(os.environ.get("ACCUM", 1))
    if accum > 1:
        kw["accum_steps"] = accum
    try:
        t0 = time.perf_counter()
        net.fit_bptt_batch(ins, tgt, n_epochs=N_EP, optimizer="adam",
                           lr=1e-3, verbose=False, **kw)
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            obs = net.fit_bptt_batch(ins, tgt, n_epochs=N_EP,
                                     optimizer="adam", lr=1e-3,
                                     verbose=False, **kw)
            best = min(best, (time.perf_counter() - t0) / N_EP)
        el = np.asarray(obs["epoch_loss"])
        assert np.all(np.isfinite(el))
        lap(f"[B={B:2d}] warmup {warm:5.1f}s; best {best*1e3:7.1f} ms/epoch -> "
            f"{B*T*N/best:.3e} aggregate trained nu/s "
            f"(per-trial {T*N/best:.2e}; loss {el[0]:.6f}->{el[-1]:.6f})")
    except Exception as e:
        lap(f"[B={B:2d}] FAILED: {type(e).__name__}: {e}")
        break
