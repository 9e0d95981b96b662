"""Online STDP throughput on the TPU (v5e): the cost of per-step plasticity.

Two regimes:
- DENSE recurrent STDP at N (default 10k): the (N, N) weight matrix rides
  the scan carry, so every step pays a full W read+write plus two rank-N
  outer-product accumulations -- ~3x the inference weight traffic.  This is
  the physics of dense online plasticity (no deferral possible: W(t) feeds
  the dynamics at t+1).
- DIAGONAL (1-D gains) recurrent STDP at N_DIAG (default 100k): the O(N)
  form -- per-neuron self-feedback gains -- where plasticity is nearly free.

Protocol: CLAUDE.md rules -- fit_stdp fetches records to host internally,
so wall-clock per call is a reliable device timing; warmups execute the
exact timed program; best-of-several.

Usage: python benchmarks/stdp_scale.py   (env: N, N_DIAG, STEPS, REPS)
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

from rectipy_tpu import FeedbackNetwork, Poisson

N = int(os.environ.get("N", 10_000))
N_DIAG = int(os.environ.get("N_DIAG", 100_000))
STEPS = int(os.environ.get("STEPS", 2_000))
REPS = int(os.environ.get("REPS", 4))
DT = 1e-4


def build(n, diagonal):
    rng = np.random.default_rng(7)
    net = FeedbackNetwork(DT)
    etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, n + 1) - n - 1) / (n + 1))
    # weights=None: the ONLY coupling is the plastic self-edge (a zeros
    # static coupling would add a dead (N, N) matvec to every step AND a
    # 37 GB argument at N=100k)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                        weights=None, n=n,
                        input_var="I_ext", output_var="s", spike_var="spike",
                        reset_var="v", spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_op/eta": etas})
    w0 = (rng.uniform(0.0, 15.0 / n, size=n) if diagonal
          else rng.uniform(0.0, 15.0 / n, size=(n, n)).astype(np.float32))
    net.add_edge("qif", "qif", feedback=True, train="stdp", weights=w0,
                 tau_plus=10 * DT, tau_minus=10 * DT, a_plus=1e-3 / n, a_minus=1.2e-3 / n,
                 w_min=0.0, w_max=30.0 / n, soft_bounds=True)
    return net


def measure(label, n, diagonal):
    net = build(n, diagonal)
    drive = Poisson(STEPS, channels=1, rate=50.0, amp=10.0, seed=1)
    lap(f"[{label}] N={n} STEPS={STEPS} warmup (incl. compile)...")
    t0 = time.perf_counter()
    net.fit_stdp(drive, sampling_steps=STEPS, verbose=False)
    lap(f"[{label}] warmup {time.perf_counter()-t0:.1f}s")
    best = np.inf
    for r in range(REPS):
        t0 = time.perf_counter()
        net.fit_stdp(drive.shifted((r + 1) * STEPS), sampling_steps=STEPS, verbose=False)
        el = time.perf_counter() - t0
        best = min(best, el)
        lap(f"[{label}] rep {r}: {el*1e3:.1f} ms ({n*STEPS/el:.3e} nu/s)")
    W = np.asarray(net.get_edge("qif", "qif").params["weights"])
    assert np.all(np.isfinite(W)), "non-finite plastic weights"
    nu = n * STEPS / best
    ms_step = best / STEPS * 1e3
    lap(f"[{label}] BEST {best*1e3:.1f} ms = {nu:.3e} nu/s ({ms_step:.3f} ms/step)")
    return nu


nu_dense = measure("dense", N, diagonal=False)
nu_diag = measure("diag", N_DIAG, diagonal=True)
print(f'{{"stdp_dense_nu_per_s": {nu_dense:.4g}, "N": {N}, '
      f'"stdp_diag_nu_per_s": {nu_diag:.4g}, "N_diag": {N_DIAG}}}', flush=True)
