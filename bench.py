"""Headline benchmark: neuron-updates/sec, N=10k QIF spiking reservoir.

Protocol (BASELINE.md): the reference publishes no numbers, so the baseline is
the reference's own execution model measured here -- a per-step Python loop
over torch-CPU float64 ops (vector field + surrogate spike + hard reset +
dense coupling matvec), exactly the reference hot path
(/root/reference/rectipy/network.py:588-599, nodes.py:382-392).  The rebuild
side runs the same dynamics as ONE jitted lax.scan on the default JAX device
(TPU under the driver).

Ordering is cheapest-first so a relay stall can never evict a metric from the
record (round 3 lost the rate-BPTT secondary to a 349 s stall misattributed
to compilation):
  1. headline run (ours) + torch-CPU baseline sample 1 -> print headline JSON
  2. qif-BPTT ours (north star)           -> flush superset line
  3. rate-BPTT ours + its torch baseline  -> flush superset line
  4. torch-CPU baseline sample 2          -> re-print with hardened ratio
  5. qif-BPTT torch-CPU (the slow phase)  -> final superset line
Every line is a superset of the previous, so whichever line the driver parses
last is the most complete record.

Baseline hardening: the torch-CPU baseline is sampled TWICE, separated by the
TPU training phases, and the ratio uses the FASTEST sample.  CPU contention
errors are one-sided (contention only slows the baseline, inflating our
ratio), so max(samples) is the self-validating conservative choice; both
samples are recorded in the JSON and a >20% spread triggers a third sample
and a `baseline_unstable` flag.

Persistent-cache visibility: jax's compiler logs are tapped so hit/miss and
cache-write outcomes for every program appear in the bench log -- the round-3
"the run program never persists" hypothesis was wrong (the key is stable and
hits across processes; verified 2026-08-17), and this keeps attribution
honest if behavior ever changes.
"""

import json
import logging
import os
import sys
import time

import numpy as np

_T_START = time.perf_counter()
# wall-clock budget for the OPTIONAL secondary metrics: the headline always
# runs to completion and prints first; each secondary is skipped when the
# elapsed total exceeds this (round-2 lesson: the driver timeout hit while a
# secondary was compiling and the already-measured headline was lost)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1200))
# the NORTH-STAR secondary (qif BPTT, BASELINE.md) gets a more generous gate:
# its own cost is small once programs are cached (~20 s + the torch loop),
# and losing it to a slow headline phase loses the round's key training
# metric.  Its partial result (trained nu/s) flushes BEFORE the torch loop.
NORTHSTAR_BUDGET_S = float(os.environ.get("BENCH_NORTHSTAR_BUDGET_S", 1800))


def _elapsed():
    return time.perf_counter() - _T_START

N = int(os.environ.get("BENCH_N", 10_000))
# 20k steps ~ 2s device time per timed run: long enough to amortize dispatch
# overhead (sustained rate; 1M-step chunked validation hit 1.02e8 nu/s), short
# enough to stay well under the device-relay execution limit
STEPS = int(os.environ.get("BENCH_STEPS", 20_000))
# 30 steps x best-of-3 keeps torch-CPU timing noise under ~10% (10 steps gave
# run-to-run baseline swings of 1.3e5..1.9e5 nu/s -> vs_baseline 618 vs 953)
BASELINE_STEPS = int(os.environ.get("BENCH_BASELINE_STEPS", 30))
# coupling precision ladder (the N x N matvec is HBM-bound, so bytes ~= time;
# states and accumulation stay float32 in every mode):
#   float32: 1.06e7 nu/s | bfloat16: 3.6e7 (the HBM roofline, ~720 GB/s) |
#   int8 (per-row scales + dynamic activation scale): 1.2e8 -- above-HBM
#   effective streaming because the 95 MB int8 W resides in VMEM;
#   trajectory correlation vs f32 > 0.999 (tests/test_dsl.py).
COUPLING = os.environ.get("BENCH_COUPLING", "int8")
# fused Pallas step vs the standard XLA scan body.  With cached compiled
# programs both are within ~5% of the bandwidth roofline; XLA is slightly
# faster at steady state (3.20e7 vs 3.00e7 nu/s at N=10k) while the Pallas
# path compiles 30x faster (2.5s vs 83s).  Default: best steady-state.
PALLAS = os.environ.get("BENCH_PALLAS", "0") == "1"
TILE = int(os.environ.get("BENCH_TILE", 512))
DT = 1e-4


def log(msg):
    # elapsed-stamped: the tunneled relay can stall minutes between phases
    # (first op after heavy use), so the tail must show WHERE time went
    print(f"[{_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


class _CacheLogTap(logging.Handler):
    """Re-emit jax's persistent-cache hit/miss/write log lines through
    log(), so the bench record attributes every compile honestly."""

    _MARKERS = ("Persistent compilation cache hit",
                "Persistent compilation cache miss",
                "Not writing persistent cache entry",
                "Error writing persistent compilation cache")

    def emit(self, record):
        msg = record.getMessage()
        if any(m in msg for m in self._MARKERS) and "jit__" not in msg:
            log(f"[jax-cache] {msg}")


def _tap_jax_cache_logs():
    for name in ("jax._src.compiler", "jax._src.compilation_cache"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        # own the handler list: jax attaches its own DEBUG stream handler to
        # these loggers, which would spray every compiler step into stderr
        lg.handlers[:] = [_CacheLogTap()]
        lg.propagate = False


def build_inputs(steps):
    inp = np.zeros((steps, 1), dtype=np.float32)
    inp[steps // 4: 3 * steps // 4, 0] = 3.0
    return inp


def bench_rebuild(W, etas):
    import jax

    # persistent compilation cache: the remote-compile service has 4s-470s
    # variance for identical programs; cached executables skip it entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _tap_jax_cache_logs()

    from rectipy_tpu import Network

    net = Network(DT)
    net.add_diffeq_node(
        "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa",
        weights=W, source_var="s", target_var="s_in", input_var="I_ext",
        output_var="s", spike_var="spike", spike_def="v", op="qif_sfa_op",
        spike_threshold=1e2, spike_reset=-1e2,
        node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": 0.05,
                   "all/qif_sfa_op/k": 15.0},
        coupling_dtype=COUPLING)
    net.add_func_node("inp", 1, activation_function="tanh")
    net.add_edge("inp", "qif")
    net.compile()
    if PALLAS:
        try:
            from rectipy_tpu.ops.kernels import attach_fused_qif_step

            attach_fused_qif_step(net.get_node("qif"), tile=TILE)
            log("[rebuild] using fused Pallas step kernel")
        except (ValueError, ImportError) as e:
            log(f"[rebuild] pallas fast path unavailable, using XLA path: {e}")

    inputs = build_inputs(STEPS)
    log(f"[rebuild] device={jax.devices()[0]} N={N} steps={STEPS} dtype={net.dtype}")

    # absorb the relay rewarm stall on ops of increasing size: after heavy
    # TPU use the relay's first SUBSTANTIAL operation can block for minutes
    # even when a trivial op returns in <1s (round 3 measured 0.51s for
    # jnp.zeros(8) followed by 349s for the first real run of a
    # CACHE-HITTING program -- the stall is in the relay, not the compiler)
    import jax.numpy as jnp
    t0 = time.perf_counter()
    jnp.zeros((8,)).block_until_ready()
    log(f"[rebuild] first device op (relay warm): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    big = jnp.asarray(np.zeros((4096, 4096), dtype=np.float32))  # 64 MB stage
    (big @ big[:, :8]).block_until_ready()
    log(f"[rebuild] big transfer+matmul (stall absorber): {time.perf_counter() - t0:.2f}s")
    del big

    # warmup (compile or cache-load) on a full-length run, then timed runs
    t0 = time.perf_counter()
    net.run(build_inputs(STEPS), record_output=False,
            record_vars=[("qif", "s", True)], sampling_steps=100, verbose=False)
    log(f"[rebuild] first run (incl. compile/cache-load): {time.perf_counter() - t0:.2f}s")

    best = float("inf")
    s_mean = None
    for _ in range(3):
        net.reset()
        t0 = time.perf_counter()
        obs = net.run(inputs, record_output=False,
                      record_vars=[("qif", "s", True)], sampling_steps=100, verbose=False)
        dt_run = time.perf_counter() - t0
        best = min(best, dt_run)
        s_mean = obs.to_numpy(("qif", "s"))
    assert np.all(np.isfinite(s_mean)), "rebuild produced non-finite dynamics"
    ups = STEPS * N / best
    log(f"[rebuild] best {best:.3f}s -> {ups:.3e} neuron-updates/s; "
        f"mean(s) range [{s_mean.min():.4f}, {s_mean.max():.4f}]")
    return ups


def bench_torch_baseline(W, etas, tag=""):
    """Reference execution model: per-step Python loop, torch-CPU float64."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    Wt = torch.tensor(W, dtype=torch.float64)
    eta_t = torch.tensor(etas, dtype=torch.float64)
    v = torch.full((N,), -2.0, dtype=torch.float64)
    s = torch.zeros(N, dtype=torch.float64)
    x_sfa = torch.zeros(N, dtype=torch.float64)
    thresh, v_reset = 1e2, -1e2
    k, alpha, tau_x = 15.0, 0.05, 10.0
    inp = torch.zeros(N, dtype=torch.float64)

    steps = BASELINE_STEPS
    best = float("inf")
    for _rep in range(3):  # best-of-3: favors the baseline (conservative ratio)
        t0 = time.perf_counter()
        for _ in range(steps):
            spikes = torch.heaviside(v - thresh, torch.tensor(1.0, dtype=torch.float64)) / DT
            reset = spikes.detach()
            s_in = Wt @ s
            dv = (v * v + (eta_t - x_sfa) + inp) / 1.0 + k * s_in
            ds = -s / 1.0 + spikes
            dx = -x_sfa / tau_x + alpha * spikes
            v = v + DT * dv
            s = s + DT * ds
            x_sfa = x_sfa + DT * dx
            v = v * (1.0 - reset * DT) + (reset * DT) * v_reset
        best = min(best, time.perf_counter() - t0)
    ups = steps * N / best
    log(f"[torch-cpu baseline{tag}] {steps} steps in {best:.2f}s (best of 3) -> "
        f"{ups:.3e} neuron-updates/s")
    return ups


def bench_rate_bptt():
    """Secondary BASELINE.md metric: BPTT wall-clock/epoch on the
    bptt_rate_neurons workload (N=200 teacher/student,
    /root/reference/documentation/bptt_rate_neurons.py:42-45), ours vs the
    reference execution model (torch-CPU per-step loop with autograd)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from rectipy_tpu import Network

    n, T, dt = 200, 2500, 1e-2
    rng = np.random.default_rng(1)
    W0 = rng.normal(size=(n, n))
    W0 /= np.max(np.abs(np.linalg.eigvals(W0)))
    tau = rng.uniform(10.0, 20.0, size=(n,))
    node_vars = {"all/li_op/eta": 2.0, "all/li_op/tau": tau, "all/li_op/k": 2.0}
    time_ax = np.linspace(0, T * dt, T)
    inp = (np.sin(2 * np.pi * 0.2 * time_ax) * 10.0)[:, None] * np.ones((1, n))
    tgt = rng.normal(size=(T, n))

    net = Network(dt)
    net.add_diffeq_node("tanh", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                        weights=W0, source_var="tanh_op/r", target_var="li_op/r_in",
                        input_var="li_op/I_ext", output_var="li_op/v",
                        train_params=["weights"], node_vars=node_vars)
    # n_ep is a multiple of network._EPOCH_SCAN_CHUNK (8) so the fit runs as
    # pure chunk scans: exactly ONE XLA program, and the warmup fit compiles
    # the SAME program the timed fit runs (the round-2 regression was timing
    # a 10-epoch fit warmed with 2 epochs -- the 8-epoch chunk program
    # compiled inside the clock)
    n_ep = 8
    inp_d = jax.device_put(jnp.asarray(inp, dtype=jnp.float32))  # pre-staged once
    tgt_d = jax.device_put(jnp.asarray(tgt, dtype=jnp.float32))
    t0 = _t.perf_counter()
    net.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="rmsprop", lr=1e-4,
                 verbose=False)
    warm = _t.perf_counter() - t0
    ours_epoch = float("inf")
    # best-of-4: at ~10 ms/epoch the tunneled-dispatch variance dominates
    # (round-5 run measured 13.7 ms where history says 7.7-8.8 -- the OURS
    # side, not the torch baseline, is the noisy term of this ratio; each
    # extra sample costs ~0.1 s)
    for _ in range(4):
        t0 = _t.perf_counter()
        net.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="rmsprop", lr=1e-4,
                     verbose=False)
        ours_epoch = min(ours_epoch, (_t.perf_counter() - t0) / n_ep)
    log(f"[rate-bptt ours] warmup({n_ep}ep+compile) {warm:.2f}s; {ours_epoch * 1e3:.1f} "
        f"ms/epoch (N={n}, T={T})")

    # torch-CPU reference model: per-step loop, autograd through the epoch.
    # Hardened like the headline baseline (round-4 VERDICT weak #1: a single
    # sample swung the recorded ratio 3x, 41x vs 74-134x): best-of-3 FULL
    # epochs, all samples recorded, fastest wins (CPU contention is
    # one-sided -- it can only slow torch and inflate our ratio).
    import torch

    tau_t = torch.tensor(tau, dtype=torch.float64)
    inp_t = torch.tensor(inp, dtype=torch.float64)
    tgt_t = torch.tensor(tgt, dtype=torch.float64)
    torch_samples = []
    for _rep in range(3):
        Wt = torch.tensor(W0, dtype=torch.float64, requires_grad=True)
        opt = torch.optim.RMSprop([Wt], lr=1e-4)
        t0 = _t.perf_counter()
        v = torch.zeros(n, dtype=torch.float64)
        outs = []
        for step in range(T):
            outs.append(v)
            dv = -v / tau_t + 2.0 * (Wt @ torch.tanh(v)) + inp_t[step] + 2.0
            v = v + dt * dv
        loss = torch.mean((torch.stack(outs) - tgt_t) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_samples.append(_t.perf_counter() - t0)
    torch_epoch = min(torch_samples)
    log(f"[rate-bptt torch-cpu] {torch_epoch * 1e3:.1f} ms/epoch (best of 3: "
        f"{[round(s * 1e3, 1) for s in torch_samples]}) -> "
        f"ours is {torch_epoch / ours_epoch:.1f}x faster")
    return ours_epoch, torch_epoch, torch_samples


def bench_spiking_bptt_ours():
    """North-star metric (BASELINE.md), OURS side: QIF BPTT trained
    neuron-updates/sec.  N=10k recurrent spiking net, trained recurrent
    weights through surrogate gradients; one update per epoch.  Returns
    (trained nu/s, context) -- the slow torch-CPU side runs separately at
    the very end of the bench (bench_spiking_bptt_torch)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from rectipy_tpu import Network

    n = int(os.environ.get("BENCH_BPTT_N", 10_000))
    T, dt = 500, 5e-3
    thresh, v_reset = 1e2, -1e2
    rng = np.random.default_rng(2)
    W = (rng.random((n, n)) < 0.1) * (1.0 / (0.1 * n))
    etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, n + 1) - n - 1) / (n + 1))
    inp = rng.normal(size=(T, n)).astype(np.float64)
    tgt = rng.normal(size=(T, n)).astype(np.float64)

    # quantized training: f32 master weights, per-row int8 requantization
    # hoisted out of the scan, int8 matvecs forward AND backward with STE
    # gradients (ops/quant.py) -- 93 ms/epoch vs bf16_master's 330 ms at
    # N=10k (round-3: cached jitted programs + pre-staged device arrays cut
    # the round-2 138 ms by another third); loss curves match to 4 decimals
    # (trajectory corr > 0.9999 vs f32)
    train_coupling = os.environ.get("BENCH_BPTT_COUPLING", "int8_master")
    net = Network(dt)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_op",
                        spike_var="spike", spike_def="v",
                        spike_threshold=thresh, spike_reset=v_reset,
                        node_vars={"all/qif_op/eta": etas},
                        coupling_dtype=train_coupling,
                        train_params=["weights"])
    n_ep = 16  # two full on-device epoch-scan chunks (network._EPOCH_SCAN_CHUNK=8)
    # pre-stage the epoch arrays on device ONCE (jnp arrays pass through
    # fit_bptt's staging untouched): repeated fits then pay zero
    # host->device transfer, and the cached jitted programs (no per-fit
    # retrace) run at the chunk-scan rate
    t0 = _t.perf_counter()
    inp_d = jax.device_put(jnp.asarray(inp, dtype=jnp.float32))
    tgt_d = jax.device_put(jnp.asarray(tgt, dtype=jnp.float32))
    jax.block_until_ready((inp_d, tgt_d))
    log(f"[qif-bptt] staged 2x{inp_d.nbytes / 2 ** 20:.0f} MB epoch arrays in "
        f"{_t.perf_counter() - t0:.1f}s")
    t0 = _t.perf_counter()
    # warm BOTH training programs (the 8-epoch scan chunk and the single
    # update) with a full-length run so the timed region is compile-free
    net.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam", lr=1e-4, verbose=False)
    warm = _t.perf_counter() - t0
    # best-of-2: single-run variance over the tunneled chip is large
    # (373-608 ms/epoch measured for the same program)
    ours_epoch = float("inf")
    for _ in range(2):
        t0 = _t.perf_counter()
        net.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam", lr=1e-4, verbose=False)
        ours_epoch = min(ours_epoch, (_t.perf_counter() - t0) / n_ep)
    log(f"[qif-bptt ours] warmup {warm:.2f}s; {ours_epoch * 1e3:.1f} ms/epoch "
        f"(N={n}, T={T}, {train_coupling}) -> {T * n / ours_epoch:.3e} trained "
        f"neuron-updates/s (deferred-gradient custom-VJP path; round-1 plain "
        f"autodiff was 2364 ms, round-2 int8_master 138 ms, round-3 92.5 ms)")
    ctx = {"n": n, "T": T, "dt": dt, "thresh": thresh, "v_reset": v_reset,
           "W": W, "etas": etas, "inp": inp, "tgt": tgt, "ours_epoch": ours_epoch}
    return T * n / ours_epoch, ctx


def bench_ensemble_bptt(ctx):
    """Ensemble-training secondary: fit_bptt_batch on the north-star QIF
    workload with B=32 trials per adam update (the vmapped deferred
    trajectory batches the coupling contractions into (B, N) x (N, N) MXU
    matmuls).  Measured 1.10e9 aggregate trained nu/s = ~20x the
    single-trial trained metric on one chip (PARITY.md §6;
    benchmarks/batch_train_throughput.py has the full B curve).  Runs dead
    last under the normal budget: it can only cost itself."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from rectipy_tpu import Network

    n, T, dt = ctx["n"], ctx["T"], ctx["dt"]
    B = int(os.environ.get("BENCH_ENSEMBLE_B", 32))
    n_ep = 8  # one on-device epoch-scan chunk
    net = Network(dt)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                        weights=ctx["W"], source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_op",
                        spike_var="spike", spike_def="v",
                        spike_threshold=ctx["thresh"], spike_reset=ctx["v_reset"],
                        node_vars={"all/qif_op/eta": ctx["etas"]},
                        coupling_dtype=os.environ.get("BENCH_BPTT_COUPLING",
                                                      "int8_master"),
                        train_params=["weights"])
    rng = np.random.default_rng(7)
    t0 = _t.perf_counter()
    ins = jax.device_put(jnp.asarray(rng.normal(size=(B, T, n)), jnp.float32))
    tgt = jax.device_put(jnp.asarray(rng.normal(size=(B, T, n)), jnp.float32))
    jax.block_until_ready((ins, tgt))
    log(f"[ensemble-bptt] staged 2x{ins.nbytes / 2 ** 20:.0f} MB trial arrays "
        f"in {_t.perf_counter() - t0:.1f}s")
    t0 = _t.perf_counter()
    net.fit_bptt_batch(ins, tgt, n_epochs=n_ep, optimizer="adam", lr=1e-4,
                       verbose=False)
    warm = _t.perf_counter() - t0
    ours_epoch = float("inf")
    for _ in range(2):
        t0 = _t.perf_counter()
        net.fit_bptt_batch(ins, tgt, n_epochs=n_ep, optimizer="adam", lr=1e-4,
                           verbose=False)
        ours_epoch = min(ours_epoch, (_t.perf_counter() - t0) / n_ep)
    agg = B * T * n / ours_epoch
    log(f"[ensemble-bptt] warmup {warm:.1f}s; {ours_epoch * 1e3:.1f} ms/epoch "
        f"at B={B} -> {agg:.3e} aggregate trained neuron-updates/s "
        f"({agg / (T * n / ctx['ours_epoch']):.1f}x the single-trial trained metric)")
    return agg, B


def bench_spiking_bptt_torch(ctx):
    """North-star metric, TORCH side: reference execution model (per-step
    Python loop over torch-CPU ops with autograd through surrogate spikes).
    The slowest bench phase (extrapolated epoch ~ 2100 s measured over 20
    steps) -- runs LAST so it can only ever cost itself."""
    import time as _t

    import torch

    n, T, dt = ctx["n"], ctx["T"], ctx["dt"]
    thresh, v_reset = ctx["thresh"], ctx["v_reset"]
    slope = 100.0 / abs(thresh - v_reset)
    # torch-CPU epoch is extrapolated from a short run; per-step cost is
    # linear (one dense matvec + elementwise), so a handful of steps
    # estimates the epoch as well as 50 while bounding the phase's
    # wall-clock.  Like the headline baseline, CPU contention is one-sided
    # (it can only inflate the torch time and our ratio), so the scaled part
    # is measured TWICE at half length and the FASTEST sample extrapolates
    # (round-4 observed a 2.9x inflated single sample -> 65554x; the honest
    # figure is ~22-25,000x).
    torch_T = int(os.environ.get("BENCH_BPTT_TORCH_T", 10))
    attempts = int(os.environ.get("BENCH_BPTT_TORCH_ATTEMPTS", 2))

    class Spike(torch.autograd.Function):
        @staticmethod
        def forward(ctx_, z):
            ctx_.save_for_backward(z)
            return torch.heaviside(z, torch.tensor(1.0, dtype=torch.float64))

        @staticmethod
        def backward(ctx_, g):
            (z,) = ctx_.saved_tensors
            return g / (1.0 + slope * torch.abs(z)) ** 2

    eta_t = torch.tensor(ctx["etas"])
    inp_t = torch.tensor(ctx["inp"])
    t_scaled = float("inf")
    t_fixed = 0.0
    for _ in range(attempts):
        Wt = torch.tensor(ctx["W"], dtype=torch.float64, requires_grad=True)
        opt = torch.optim.Adam([Wt], lr=1e-4)
        t0 = _t.perf_counter()
        v = torch.full((n,), -2.0, dtype=torch.float64)
        s = torch.zeros(n, dtype=torch.float64)
        preds = []
        for step in range(torch_T):
            spikes = Spike.apply(v - thresh)
            reset = spikes.detach()
            preds.append(s)
            dv = (v * v + eta_t + inp_t[step]) + Wt @ s
            ds = -s + spikes / dt
            v_new = v + dt * dv
            s = s + dt * ds
            v = v_new * (1.0 - reset) + reset * v_reset
        loss = torch.mean((torch.stack(preds) - torch.tensor(ctx["tgt"][:torch_T])) ** 2)
        opt.zero_grad()
        loss.backward()
        t1 = _t.perf_counter()  # forward+loss+backward: linear in steps
        opt.step()  # one (N,N) adam step: FIXED per epoch, must not be scaled
        if t1 - t0 < t_scaled:
            t_scaled = t1 - t0
            t_fixed = _t.perf_counter() - t1
    torch_epoch = t_scaled * (T / torch_T) + t_fixed
    ours_epoch = ctx["ours_epoch"]
    log(f"[qif-bptt torch-cpu] {torch_epoch * 1e3:.1f} ms/epoch (extrapolated from "
        f"fastest of {attempts}x{torch_T} steps) -> ours is "
        f"{torch_epoch / ours_epoch:.1f}x faster "
        f"({T * n / torch_epoch:.3e} trained neuron-updates/s)")
    return torch_epoch / ours_epoch


def _wait_for_backend():
    """Wait (bounded) for the TPU relay to accept a backend init: the relay
    goes UNAVAILABLE for minutes after a worker crash and needs ~60s+ to
    rewarm -- observed init attempts that block 45 min then raise.  Without
    this, a bench launched into that window records rc!=0 and the round
    loses its scoreboard."""
    import jax

    budget = float(os.environ.get("BENCH_BACKEND_WAIT_S", 1800))
    t0 = time.perf_counter()
    attempt = 0
    while True:
        try:
            devs = jax.devices()
            log(f"[backend] up after {time.perf_counter() - t0:.0f}s: {devs}")
            return
        except Exception as e:
            attempt += 1
            waited = time.perf_counter() - t0
            if waited > budget:
                log(f"[backend] still unavailable after {waited:.0f}s "
                    f"({attempt} attempts); proceeding (will fail naturally)")
                return
            log(f"[backend] attempt {attempt} unavailable "
                f"({type(e).__name__}); retrying in 90s")
            time.sleep(90)


def main():
    _wait_for_backend()
    rng = np.random.default_rng(0)
    # 10% density random coupling, row-normalized (qif_example.py workload)
    W = np.zeros((N, N), dtype=np.float64)
    n_conns = max(1, int(N * 0.1))
    cols = np.argsort(rng.random((N, N)), axis=1)[:, :n_conns]
    W[np.repeat(np.arange(N), n_conns), cols.ravel()] = 1.0 / n_conns
    etas = -5.0 + 1.0 * np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))

    ours = bench_rebuild(W, etas)
    base_samples = [bench_torch_baseline(W, etas, tag=" #1")]
    result = {
        "metric": f"neuron-updates/sec, N={N} QIF+SFA reservoir (dt=1e-4, "
                  f"{COUPLING} coupling, f32 states/accumulation)",
        "value": round(ours, 1),
        "unit": "neuron-updates/s",
        "vs_baseline": round(ours / max(base_samples), 2),
    }
    # print+flush the headline IMMEDIATELY: every phase below re-prints the
    # full superset line, so whether the driver parses the first or the last
    # JSON line it gets a complete record (round 2 lost its measured headline
    # to a driver timeout during a secondary).
    print(json.dumps(result), flush=True)
    qif_ctx = None
    if os.environ.get("BENCH_BPTT", "1") == "1":
        # north-star OURS first (BASELINE.md: QIF BPTT vs torch-CPU): its
        # trained nu/s flushes as soon as it is measured.
        if _elapsed() < NORTHSTAR_BUDGET_S:
            try:
                trained_ups, qif_ctx = bench_spiking_bptt_ours()
                result["bptt_trained_nu_per_s"] = round(trained_ups, 1)
                print(json.dumps(result), flush=True)
            except Exception as e:  # secondary must never break the headline
                log(f"[qif-bptt] ours-side benchmark failed: {e}")
        else:
            log(f"[qif-bptt] skipped: {_elapsed():.0f}s elapsed > "
                f"{NORTHSTAR_BUDGET_S:.0f}s north-star budget")
        if _elapsed() < BUDGET_S:
            try:
                rate_ours, rate_torch, rate_samples = bench_rate_bptt()
                result["bptt_rate_ms_per_epoch"] = round(rate_ours * 1e3, 1)
                result["bptt_rate_vs_torch_cpu"] = round(rate_torch / rate_ours, 2)
                result["rate_torch_samples_ms"] = [round(s * 1e3, 1)
                                                   for s in rate_samples]
                print(json.dumps(result), flush=True)
            except Exception as e:
                log(f"[rate-bptt] secondary benchmark failed: {e}")
        else:
            log(f"[rate-bptt] skipped: {_elapsed():.0f}s elapsed > {BUDGET_S:.0f}s budget")

    # second, TPU-phase-separated torch-CPU baseline sample: contention is
    # one-sided (it can only slow the baseline and inflate our ratio), so the
    # hardened ratio uses the FASTEST sample; a >20% spread triggers a third
    base_samples.append(bench_torch_baseline(W, etas, tag=" #2"))
    if min(base_samples) / max(base_samples) < 0.8:
        log("[torch-cpu baseline] samples disagree >20% (CPU contention); re-sampling")
        base_samples.append(bench_torch_baseline(W, etas, tag=" #3"))
        result["baseline_unstable"] = True
    result["baseline_nu_per_s_samples"] = [round(b, 1) for b in base_samples]
    result["vs_baseline"] = round(ours / max(base_samples), 2)
    print(json.dumps(result), flush=True)

    # the SLOWEST phase runs dead last: it can only ever cost itself
    if qif_ctx is not None:
        if _elapsed() < NORTHSTAR_BUDGET_S:
            try:
                trained_vs = bench_spiking_bptt_torch(qif_ctx)
                result["bptt_vs_torch_cpu"] = round(trained_vs, 2)
                print(json.dumps(result), flush=True)
            except Exception as e:
                log(f"[qif-bptt] torch-side benchmark failed: {e}")
        else:
            log(f"[qif-bptt torch] skipped: {_elapsed():.0f}s elapsed > "
                f"{NORTHSTAR_BUDGET_S:.0f}s north-star budget")
        # ensemble-training secondary dead last (TPU-only, no torch phase
        # left to contaminate): fit_bptt_batch at B=32 on the same workload
        if os.environ.get("BENCH_ENSEMBLE", "1") == "1" and _elapsed() < BUDGET_S:
            try:
                agg, ens_b = bench_ensemble_bptt(qif_ctx)
                result[f"ensemble_trained_nu_per_s_B{ens_b}"] = round(agg, 1)
                print(json.dumps(result), flush=True)
            except Exception as e:
                log(f"[ensemble-bptt] secondary benchmark failed: {e}")
        elif os.environ.get("BENCH_ENSEMBLE", "1") == "1":
            log(f"[ensemble-bptt] skipped: {_elapsed():.0f}s elapsed > "
                f"{BUDGET_S:.0f}s budget")
    log(f"[bench] total wall-clock {_elapsed():.0f}s")


if __name__ == "__main__":
    main()
