"""Interleaved A/B: block-sparse transposed-contraction backward variants
(RECTIPY_SPARSE_BWD=scatter vs onehot) on the N=100352 trained epoch.

RECTIPY_SPARSE_BWD is read at BUILD time and baked into the trajectory
closures, so each mode gets its own FeedbackNetwork; fits then alternate
round-robin so both modes sample the same relay drift (the fused-adam
lesson: sequential phase timing cannot resolve ms-scale differences).
fit_bptt fetches epoch losses to host inside the call, so wall-clock per
fit is a reliable device timing.

Workload: examples/qif_100k_sharded.py QIF_TRAIN=1 (block-sparse fan-in-1000
coupling + trained delayed-feedback gains, int8_master, T=500, 8 epochs).
"""
import os, statistics, sys, time

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
T_tr, n_ep = 500, 8
A = block_random_connectivity(N, N, FAN_IN, block_size=BS, seed=0)
rng = np.random.default_rng(0)
rng_t = np.random.default_rng(2)
delays = rng.integers(1, 10, size=N)
inp_tr = np.zeros((T_tr, 1), dtype=np.float32)
inp_tr[T_tr // 4:, 0] = 3.0
tgt_tr = (0.05 + 0.01 * np.sin(np.linspace(0, 8 * np.pi, T_tr))
          )[:, None].astype(np.float32) * np.ones((1, N), dtype=np.float32)
etas_tr = 100.0 + 20.0 * rng_t.standard_normal(N)
in_w = rng.normal(size=(N, 1)).astype(np.float32)
lap("workload built")


def build(mode):
    os.environ["RECTIPY_SPARSE_BWD"] = mode
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
    return net


MODES = os.environ.get("MODES", "scatter,onehot").split(",")
nets = {}
for mode in MODES:
    t0 = time.perf_counter()
    nets[mode] = build(mode)
    lap(f"built[{mode}] {time.perf_counter()-t0:.1f}s")

inp_d = jax.device_put(jnp.asarray(inp_tr))
tgt_d = jax.device_put(jnp.asarray(tgt_tr))
lap("epoch arrays staged")


def fit(mode):
    t0 = time.perf_counter()
    obs = nets[mode].fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam",
                              lr=1e-3, verbose=False, fused_bptt=True)
    return time.perf_counter() - t0, np.asarray(obs["epoch_loss"])


for mode in MODES:
    dt_s, losses = fit(mode)
    lap(f"warmup[{mode}] {dt_s:.1f}s; losses {losses[0]:.6f} -> {losses[-1]:.6f}")

samples = {m: [] for m in MODES}
ROUNDS = int(os.environ.get("ROUNDS", "5"))
for r in range(ROUNDS):
    for mode in MODES:
        dt_s, _ = fit(mode)
        samples[mode].append(dt_s / n_ep * 1e3)
    lap(f"round {r}: " + "  ".join(f"{m}={samples[m][-1]:.0f}ms" for m in MODES))

for mode in MODES:
    s = samples[mode]
    lap(f"[{mode}] best {min(s):.0f} ms/epoch ({T_tr*N/(min(s)/1e3):.3e} nu/s)  "
        f"median {statistics.median(s):.0f}  all {[f'{x:.0f}' for x in s]}")
