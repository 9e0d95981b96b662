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


POPS = [int(x) for x in os.environ.get("POPS", "8,16,32").split(",") if x]
if os.environ.get("ES_NODE", "1") != "1":
    POPS = []
if POPS:
    net = build()
    lap("network built")
inp = np.zeros((STEPS, 1), dtype=np.float32)

if POPS:
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
for POP in POPS:
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

# ---------------------------------------------------------------- edge phase
# Gradient-free CONNECTOME fitting cost (round-5): ES over an interp-mode
# per-connection delay matrix at the whole-brain M=90 scale -- the workload
# where BPTT through 1000-step buffers is impractical (chaotic/spiking
# regimes) and fit_es over ("edge", src, tgt, "delays") is the tool.  Each
# generation = ONE vmapped run_batch with per-candidate delay matrices (the
# hat selectors build per trial inside the program).
if os.environ.get("ES_EDGE", "1") == "1":
    from rectipy_tpu import FeedbackNetwork

    M_E = int(os.environ.get("ES_M", 90))
    T_E = int(os.environ.get("ES_T", 2000))
    DMAX_E = int(os.environ.get("ES_DMAX", 1054))
    POP_E = int(os.environ.get("ES_EDGE_POP", 16))
    rng_e = np.random.default_rng(3)
    d0 = rng_e.integers(0, DMAX_E + 1, size=(M_E, M_E)).astype(float)
    W_e = (rng_e.standard_normal((M_E, M_E)) / M_E).astype(np.float32)

    def build_wb():
        net = FeedbackNetwork(1e-3)
        net.add_diffeq_node(
            "wb", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((M_E, M_E)), source_var="tanh_op/r",
            target_var="li_op/r_in", input_var="li_op/I_ext",
            output_var="li_op/v",
            node_vars={"all/li_op/eta": 1.0, "all/li_op/tau": 10.0,
                       "all/li_op/k": 1.0})
        # factored2: per-candidate delay sweeps stream one selector tensor
        # per trial, where the hat's nm(D+1) measured 7x slower generations
        impl = os.environ.get("ES_INTERP_IMPL", "factored2")
        net.add_edge("wb", "wb", weights=W_e, delays=d0, mode="interp",
                     max_delay=DMAX_E, feedback=True, interp_impl=impl)
        net.compile()
        return net

    wb = build_wb()
    inp_e = rng_e.normal(size=(T_E, M_E)).astype(np.float32) * 0.5
    t0 = time.perf_counter()
    wb.run(inp_e, sampling_steps=100, verbose=False)
    lap(f"[edge] single WB run warmup {time.perf_counter()-t0:5.1f}s")
    best_wb = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        wb.run(inp_e, sampling_steps=100, verbose=False)
        best_wb = min(best_wb, time.perf_counter() - t0)
    lap(f"[edge] single WB run best {best_wb:6.3f}s "
        f"({T_E/best_wb:,.0f} steps/s, M={M_E}, span {DMAX_E})")

    tgt_e = np.zeros((T_E // 100, M_E), dtype=np.float32)

    class _EClock:
        def __init__(self, pop):
            self.pop, self.marks, self.calls = pop, [], 0

        def loss(self, out, tgt):
            if self.calls % self.pop == 0:
                self.marks.append(time.perf_counter())
            self.calls += 1
            return float(np.mean((np.asarray(out) - np.asarray(tgt)) ** 2))

    clk = _EClock(POP_E)
    n_gens = 5
    t0 = time.perf_counter()
    wb.fit_es(inp_e, tgt_e,
              fit_vars=[("edge", "wb", "wb", "delays")],
              bounds={("edge", "wb", "wb", "delays"): (0.0, float(DMAX_E))},
              loss=clk.loss, n_generations=n_gens, pop_size=POP_E,
              sigma=20.0, lr=10.0, sampling_steps=100, seed=0, verbose=False)
    total = time.perf_counter() - t0
    gaps = np.diff(np.asarray(clk.marks))
    best_gen = float(np.min(gaps)) if len(gaps) else total / n_gens
    lap(f"[edge pop={POP_E}] {n_gens} delay-matrix ES generations in "
        f"{total:6.2f}s; best gen {best_gen:6.3f}s = "
        f"{best_gen/best_wb:.2f}x a single run for {POP_E}x candidate "
        f"connectomes ({M_E}x{M_E} delays evolved gradient-free)")
