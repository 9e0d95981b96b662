"""Isolate where batched-trial training time goes at N=10k (v5e).

fit_bptt_batch measured ~74 ms/trial flat beyond B=4 (no batch
amortization), while run_batch inference amortizes superbly.  This probe
interleaves modes round-robin (CLAUDE.md protocol: minute-scale relay
drift swamps sequential comparisons) to find the non-amortizing component:

- int8 B=8 vs B=1  (the measured pathology)
- bf16 B=8         (is it the quantized transposed matvec?)
- plain B=8        (is it the deferred custom-VJP trajectory?)
- fwd B=8          (forward-only run_batch on the same workload = the
                    amortizing baseline)
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
B = int(os.environ.get("B", 8))
DT = 5e-3
N_EP = 8
rng = np.random.default_rng(2)
W = (rng.random((N, N)) < 0.1) * (1.0 / (0.1 * N))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))


def make_net(coupling, trained=True):
    net = Network(DT)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_op",
                        spike_var="spike", spike_def="v",
                        spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_op/eta": etas},
                        coupling_dtype=coupling,
                        train_params=["weights"] if trained else None)
    return net


ins_b = jax.device_put(jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32))
tgt_b = jax.device_put(jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32))
ins_1, tgt_1 = ins_b[:1], tgt_b[:1]
jax.block_until_ready((ins_b, tgt_b, ins_1, tgt_1))
lap("staged")

net_i8 = make_net("int8_master")
net_bf = make_net("bf16_master")
net_pl = make_net("int8_master")
net_fw = make_net("int8", trained=False)

modes = {
    "int8 B=8   ": lambda: net_i8.fit_bptt_batch(ins_b, tgt_b, n_epochs=N_EP,
                                                 optimizer="adam", lr=1e-4,
                                                 verbose=False),
    "int8 B=1   ": lambda: net_i8.fit_bptt_batch(ins_1, tgt_1, n_epochs=N_EP,
                                                 optimizer="adam", lr=1e-4,
                                                 verbose=False),
    "bf16 B=8   ": lambda: net_bf.fit_bptt_batch(ins_b, tgt_b, n_epochs=N_EP,
                                                 optimizer="adam", lr=1e-4,
                                                 verbose=False),
    "plain B=8  ": lambda: net_pl.fit_bptt_batch(ins_b, tgt_b, n_epochs=N_EP,
                                                 optimizer="adam", lr=1e-4,
                                                 verbose=False,
                                                 fused_bptt=False),
    "fwd B=8    ": lambda: net_fw.run_batch(np.asarray(ins_b),
                                            record_output=False,
                                            record_vars=[("qif", "s", True)],
                                            sampling_steps=100, verbose=False),
}

for name, fn in modes.items():
    t0 = time.perf_counter()
    fn()
    lap(f"[warmup] {name} {time.perf_counter()-t0:6.1f}s")

best = {k: float("inf") for k in modes}
for r in range(3):
    for name, fn in modes.items():
        t0 = time.perf_counter()
        fn()
        # fwd is ONE T-step pass (== one epoch's forward); fits are N_EP
        dt_ep = (time.perf_counter() - t0) / (1 if name.startswith("fwd") else N_EP)
        best[name] = min(best[name], dt_ep)
        lap(f"[round {r}] {name} {dt_ep*1e3:7.1f} ms/epoch")

lap("=== best of 3 (ms/epoch) ===")
for name, v in best.items():
    lap(f"  {name} {v*1e3:7.1f}")
