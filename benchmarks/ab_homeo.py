"""Interleaved A/B: homeostatic vs plain dense STDP at N=10k on the TPU.

What this validates: the ALIGNED segmented-scan homeostasis path (scaling
once per period between inner scans) removes the +29% overhead the
per-step lax.cond form paid (cond is select-converted on TPU, so the
reduce-then-rescale second pass over the (N, N) W rode every step --
measured 3.64 -> 4.70 s per 2k steps, CLAUDE.md table).

Protocol (CLAUDE.md): interleave the two modes round-robin (minute-scale
relay drift swamps sequential phase comparisons); warmups execute the
exact timed programs; best-of-k per mode; fit_stdp fetches records to
host internally, so wall-clock per call is a reliable device timing.

Usage: python benchmarks/ab_homeo.py   (env: N, STEPS, H, REPS)
"""
import os, sys, time

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
        lap(f"backend: {jax.devices()}"); break
    except Exception as e:
        lap(f"unavailable ({type(e).__name__}); sleep 120"); time.sleep(120)
else:
    sys.exit("relay never came back")

from rectipy_tpu import FeedbackNetwork, Poisson

N = int(os.environ.get("N", 10_000))
STEPS = int(os.environ.get("STEPS", 2_000))
H = int(os.environ.get("H", 500))  # STEPS % H == 0 -> aligned fast path
REPS = int(os.environ.get("REPS", 4))
DT = 1e-4
assert STEPS % H == 0, "pick H dividing STEPS so the aligned path engages"


def build():
    rng = np.random.default_rng(7)
    net = FeedbackNetwork(DT)
    etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                        weights=None, n=N,
                        input_var="I_ext", output_var="s", spike_var="spike",
                        reset_var="v", spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_op/eta": etas})
    w0 = rng.uniform(0.0, 15.0 / N, size=(N, N)).astype(np.float32)
    # homeostasis needs hard bounds? no -- but it needs 2-D weights; use the
    # same edge config as stdp_scale's dense regime
    net.add_edge("qif", "qif", feedback=True, train="stdp", weights=w0,
                 tau_plus=10 * DT, tau_minus=10 * DT,
                 a_plus=1e-3 / N, a_minus=1.2e-3 / N,
                 w_min=0.0, w_max=30.0 / N, soft_bounds=True)
    return net


drive = Poisson(STEPS, channels=1, rate=50.0, amp=10.0, seed=1)
nets = {"plain": build(), "homeo": build()}
kw = {"plain": {}, "homeo": {"homeostasis_steps": H}}

for label, net in nets.items():  # warmup = the exact timed program
    t0 = time.perf_counter()
    net.fit_stdp(drive, sampling_steps=STEPS, verbose=False, **kw[label])
    lap(f"[{label}] warmup (incl. compile) {time.perf_counter()-t0:.1f}s")

best = {"plain": np.inf, "homeo": np.inf}
for r in range(REPS):
    for label, net in nets.items():
        t0 = time.perf_counter()
        net.fit_stdp(drive.shifted((r + 1) * STEPS), sampling_steps=STEPS,
                     verbose=False, **kw[label])
        el = time.perf_counter() - t0
        best[label] = min(best[label], el)
        lap(f"rep {r} [{label}]: {el*1e3:.1f} ms ({N*STEPS/el:.3e} nu/s)")

W = np.asarray(nets["homeo"].get_edge("qif", "qif").params["weights"])
assert np.all(np.isfinite(W)), "non-finite plastic weights"
over = best["homeo"] / best["plain"] - 1.0
lap(f"BEST plain {best['plain']*1e3:.1f} ms | homeo(aligned, H={H}) "
    f"{best['homeo']*1e3:.1f} ms -> overhead {over*100:+.1f}% "
    f"(cond path measured +29%)")
print(f'{{"stdp_plain_ms": {best["plain"]*1e3:.1f}, '
      f'"stdp_homeo_aligned_ms": {best["homeo"]*1e3:.1f}, '
      f'"overhead_pct": {over*100:.1f}, "N": {N}, "H": {H}}}', flush=True)
