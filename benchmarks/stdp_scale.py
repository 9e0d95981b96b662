"""Online STDP throughput on the TPU (v5e): the cost of per-step plasticity.

Four regimes:
- DENSE recurrent STDP at N (default 10k): the (N, N) weight matrix rides
  the scan carry, so every step pays a full W read+write plus two rank-N
  outer-product accumulations -- ~3x the inference weight traffic.  This is
  the physics of dense online plasticity (no deferral possible: W(t) feeds
  the dynamics at t+1).
- DENSE with w_dtype=bfloat16 (STDP_BF16=1): the plastic-W carry at half
  the bytes -- the A/B for whether the f32 carry roofline halves.
- DIAGONAL (1-D gains) recurrent STDP at N_DIAG (default 100k): the O(N)
  form -- per-neuron self-feedback gains -- where plasticity is nearly free.
- BLOCK-SPARSE at N_BLOCK (default 100352, fan-in 1000): plasticity at the
  showcase scale where dense W cannot exist (40 GB); the plastic tensor is
  the 0.4 GB fan-in blocks, so the per-step W r+w is ~100x smaller than
  dense-at-100k would be.  STDP_BLOCK=0 skips it.

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
N_BLOCK = int(os.environ.get("N_BLOCK", 100_352))
STEPS = int(os.environ.get("STEPS", 2_000))
REPS = int(os.environ.get("REPS", 4))
DT = 1e-4


def build(n, diagonal, block=False, w_dtype=None):
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
    fan_in = 1000
    if block:
        from rectipy_tpu.ops.sparse import block_random_connectivity

        t0 = time.perf_counter()
        w0 = block_random_connectivity(n, n, fan_in, block_size=512, seed=7)
        # sampled entries are 1/fan_in; scatter them to U(0, 15/fan_in) --
        # the per-synapse analog of the dense U(0, 15/n) init
        w0.blocks *= rng.random(w0.blocks.shape, dtype=np.float32) * 15.0
        lap(f"sampled {w0.blocks.shape} blocks in {time.perf_counter()-t0:.1f}s")
        scale = fan_in
    else:
        w0 = (rng.uniform(0.0, 15.0 / n, size=n) if diagonal
              else rng.uniform(0.0, 15.0 / n, size=(n, n)).astype(np.float32))
        scale = n
    kw = {"w_dtype": w_dtype} if w_dtype else {}
    net.add_edge("qif", "qif", feedback=True, train="stdp", weights=w0,
                 tau_plus=10 * DT, tau_minus=10 * DT, a_plus=1e-3 / scale,
                 a_minus=1.2e-3 / scale, w_min=0.0, w_max=30.0 / scale,
                 soft_bounds=True, **kw)
    return net


def measure(label, n, diagonal, block=False, w_dtype=None):
    net = build(n, diagonal, block=block, w_dtype=w_dtype)
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


out = {}
if os.environ.get("STDP_DENSE", "1") == "1":
    out["stdp_dense_nu_per_s"] = measure("dense", N, diagonal=False)
    out["N"] = N
if os.environ.get("STDP_BF16", "0") == "1":
    # A/B: reduced-precision plastic-W carry (halves the roofline traffic)
    out["stdp_dense_bf16_nu_per_s"] = measure(
        "dense-bf16", N, diagonal=False, w_dtype=jnp.bfloat16)
if os.environ.get("STDP_DIAG", "1") == "1":
    out["stdp_diag_nu_per_s"] = measure("diag", N_DIAG, diagonal=True)
    out["N_diag"] = N_DIAG
if os.environ.get("STDP_BLOCK", "1") == "1":
    # plasticity at the block-sparse showcase scale (dense is impossible)
    out["stdp_block_nu_per_s"] = measure("block", N_BLOCK, diagonal=False,
                                         block=True)
    out["N_block"] = N_BLOCK
if os.environ.get("STDP_BLOCK_BF16", "0") == "1":
    # reduced-precision plastic-block carry: halves the 12 GB/step block
    # traffic; numerics caveat as w_dtype (increments near bf16 eps)
    out["stdp_block_bf16_nu_per_s"] = measure(
        "block-bf16", N_BLOCK, diagonal=False, block=True,
        w_dtype=jnp.bfloat16)
import json

print(json.dumps(out), flush=True)
