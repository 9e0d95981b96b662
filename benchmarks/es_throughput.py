"""fit_es generation cost at the headline scale (N=10k QIF+SFA, v5e).

The claim to validate on hardware: one ES generation (pop_size candidates
simulated + scored) rides the SAME vmapped program as a run_batch sweep, so
its device cost tracks the B-trial ensemble envelope (benchmarks/
batch_throughput.py) rather than pop_size x single runs.  Measures
wall-clock per generation vs pop size, plus the equivalent aggregate
neuron-updates/s, against a single plain run of the same horizon.

Protocol: CLAUDE.md rules -- fit_es fetches records to host every
generation, so per-generation wall clock is a reliable device timing;
best-of-several generations; exact-program warmup (generation 0 compiles).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

t00 = time.perf_counter()


def lap(m):
    print(f"[{time.perf_counter()-t00:7.1f}s] {m}", flush=True)


for a in range(40):
    try:
        lap(f"backend: {jax.devices()}")
        break
    except Exception as e:
        lap(f"unavailable ({type(e).__name__}); sleep 120")
        time.sleep(120)
else:
    sys.exit("relay never came back")

from rectipy_tpu import Network

N = int(os.environ.get("N", 10_000))
STEPS = int(os.environ.get("STEPS", 2_000))
DT = 1e-4
rng = np.random.default_rng(42)
W = (rng.random((N, N)) < 0.1) * (1.0 / (0.1 * N))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))


def build():
    net = Network(DT)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_sfa_op",
                        spike_var="spike", spike_def="v",
                        spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_sfa_op/eta": etas},
                        coupling_dtype=os.environ.get("COUPLING", "int8"))
    return net


net = build()
lap("network built")
inp = np.zeros((STEPS, 1), dtype=np.float32)

# single plain-run reference at the same horizon
t0 = time.perf_counter()
net.run(inp, sampling_steps=100, record_output=False,
        record_vars=[("qif", "s", True)], verbose=False)
lap(f"single run warmup {time.perf_counter()-t0:5.1f}s")
best_run = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    net.run(inp, sampling_steps=100, record_output=False,
            record_vars=[("qif", "s", True)], verbose=False)
    best_run = min(best_run, time.perf_counter() - t0)
lap(f"single run best {best_run:6.3f}s ({STEPS*N/best_run:.3e} nu/s)")

targets = np.zeros((STEPS // 100, 1), dtype=np.float32)
for POP in (int(x) for x in os.environ.get("POPS", "8,16,32").split(",")):
    gens_t = []

    class _Clock:
        """Per-generation wall clock via the loss callable (called POP times
        per generation, first call stamps the generation start)."""
        def __init__(self):
            self.marks = []
            self.calls = 0

        def loss(self, out, tgt):
            if self.calls % POP == 0:
                self.marks.append(time.perf_counter())
            self.calls += 1
            return float(np.mean((np.asarray(out).mean(axis=1, keepdims=True)
                                  - np.asarray(tgt)) ** 2))

    clk = _Clock()
    n_gens = 6
    t0 = time.perf_counter()
    net.fit_es(inp, targets, fit_vars=[("qif", "qif_sfa_op/eta")],
               loss=clk.loss, n_generations=n_gens, pop_size=POP, sigma=0.5,
               lr=0.1, sampling_steps=100, seed=0, verbose=False)
    total = time.perf_counter() - t0
    # generation k device time ~ mark[k+1] - mark[k] (mark = first loss call
    # right after the batched fetch); last gen bounded by total
    gaps = np.diff(np.asarray(clk.marks))
    best_gen = float(np.min(gaps)) if len(gaps) else total / n_gens
    lap(f"[pop={POP:3d}] {n_gens} generations in {total:6.2f}s; best gen "
        f"{best_gen:6.3f}s = {POP*STEPS*N/best_gen:.3e} aggregate nu/s "
        f"({best_gen/best_run:.2f}x a single run for {POP}x candidates)")
