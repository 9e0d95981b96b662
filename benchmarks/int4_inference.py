"""int4 vs int8 frozen-coupling inference throughput at N=10k QIF (v5e).

The headline forward path is weight-stream-bound (the int8 W fits in VMEM
and streams once per step); int4 halves those bytes.  This script measures
the bench workload (bench.py bench_rebuild) under both coupling dtypes and
checks the int4 dynamics stay correlated with int8/f32.

Protocol: CLAUDE.md rules -- one TPU process, host-fetch sync (run() fetches
internally), best-of-several.
"""
import sys, time

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

N, STEPS, DT = int(__import__("os").environ.get("N", 10_000)), int(__import__("os").environ.get("STEPS", 100_000)), 1e-4
rng = np.random.default_rng(42)
W = (rng.random((N, N)) < 0.1) * (1.0 / (0.1 * N))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))
inp = np.zeros((STEPS, 1), dtype=np.float32)
lap("workload built")

results = {}
for cd in ("int8", "int4"):
    net = Network(DT)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_sfa_op",
                        spike_var="spike", spike_def="v",
                        spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_sfa_op/eta": etas},
                        coupling_dtype=cd)
    t0 = time.perf_counter()
    net.run(inp[:STEPS], record_output=False, record_vars=[("qif", "s", True)],
            sampling_steps=100, verbose=False)
    lap(f"[{cd}] first run (compile/cache-load) {time.perf_counter()-t0:.1f}s")
    best, s_mean = float("inf"), None
    for _ in range(3):
        net.reset()
        t0 = time.perf_counter()
        obs = net.run(inp, record_output=False, record_vars=[("qif", "s", True)],
                      sampling_steps=100, verbose=False)
        best = min(best, time.perf_counter() - t0)
        s_mean = obs.to_numpy(("qif", "s")).ravel()
    results[cd] = (best, s_mean)
    lap(f"[{cd}] best {best:.3f}s -> {STEPS*N/best:.3e} nu/s; "
        f"mean-s range [{s_mean.min():.4f}, {s_mean.max():.4f}]")

c = np.corrcoef(results["int8"][1], results["int4"][1])[0, 1]
lap(f"corr(mean-s int8, int4) = {c:.6f}")
lap(f"speedup int4/int8 = {results['int8'][0]/results['int4'][0]:.2f}x")
