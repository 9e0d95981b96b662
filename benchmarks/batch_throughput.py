"""Ensemble (batched-trial) inference throughput at N=10k QIF+SFA (v5e).

run_batch integrates B independent trials in one vmapped scan: the per-step
coupling contraction becomes W @ S with S (N, B) -- a matmul that amortizes
the weight stream over B trials, so aggregate neuron-updates/s should scale
well past the single-trajectory headline until compute/activation traffic
saturates.  This measures that curve (the single-trajectory case is the
bench.py headline; no reference analog exists -- torch-CPU would loop).

Protocol: CLAUDE.md rules (run_batch fetches records to host internally, so
wall-clock per call is a reliable device timing; best-of-several).
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
STEPS = int(os.environ.get("STEPS", 10_000))
DT = 1e-4
rng = np.random.default_rng(42)
W = (rng.random((N, N)) < 0.1) * (1.0 / (0.1 * N))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))

net = Network(DT)
net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa",
                    weights=W, source_var="s", target_var="s_in",
                    input_var="I_ext", output_var="s", op="qif_sfa_op",
                    spike_var="spike", spike_def="v",
                    spike_threshold=1e2, spike_reset=-1e2,
                    node_vars={"all/qif_sfa_op/eta": etas},
                    coupling_dtype=os.environ.get("COUPLING", "int8"))
lap("network built")

for B in (int(x) for x in os.environ.get("BATCHES", "1,4,16,64").split(",")):
    inp = np.zeros((B, STEPS, 1), dtype=np.float32)
    t0 = time.perf_counter()
    net.run_batch(inp, record_output=False, record_vars=[("qif", "s", True)],
                  sampling_steps=100, verbose=False)
    warm = time.perf_counter() - t0
    best, res = float("inf"), None
    for _ in range(3):
        t0 = time.perf_counter()
        res = net.run_batch(inp, record_output=False,
                            record_vars=[("qif", "s", True)],
                            sampling_steps=100, verbose=False)
        best = min(best, time.perf_counter() - t0)
    s_mean = res[("qif", "s")]
    assert np.all(np.isfinite(s_mean))
    lap(f"[B={B:3d}] warmup {warm:5.1f}s; best {best:6.3f}s -> "
        f"{B*STEPS*N/best:.3e} aggregate nu/s "
        f"({STEPS/best:.0f} steps/s; per-trial {STEPS*N/best:.2e})")
