"""Whole-brain throughput: per-connection delay matrices on the TPU.

Measures `examples/whole_brain_delays.py`'s workload class at atlas scales:
M Jansen-Rit regions coupled through an (M, M) connectome with
distance-derived per-connection delays (LinearMemoryMatrix).  For each M it
times the delayed network and the same network with an instantaneous dense
edge (the delay-machinery overhead), best-of-K with the relay-variance
protocol (warmup executes the exact timed program; run() fetches results
internally, so wall timing is sync-safe).

The reference cannot express this workload (per-source delays only) and
would step it from Python; the interesting numbers here are steps/s and
the delay overhead factor.

Usage:
    WB_MS=90,512,998 WB_T=10000 WB_REPS=4 python benchmarks/whole_brain_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

t00 = time.perf_counter()


def lap(msg):
    print(f"[{time.perf_counter() - t00:7.1f}s] {msg}", flush=True)


for attempt in range(40):
    try:
        d = jax.devices()
        lap(f"backend up: {d}")
        break
    except Exception:
        lap(f"attempt {attempt}: backend unavailable; sleep 120s")
        time.sleep(120)

from rectipy_tpu import FeedbackNetwork

JR = "rectipy_tpu.models.mean_field.jansen_rit.jansen_rit"
MS = [int(x) for x in os.environ.get("WB_MS", "90,998").split(",")]
T = int(os.environ.get("WB_T", 10_000))
REPS = int(os.environ.get("WB_REPS", 4))
SPEED = 2.0
dt = 1e-4

for M in MS:
    rng = np.random.default_rng(0)
    pos = rng.uniform(0.0, 0.14, size=(M, 3))
    dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    W = np.exp(-dist / 0.06)
    np.fill_diagonal(W, 0.0)
    W /= W.sum(axis=0, keepdims=True)  # in-strength (square W auto-transposes)
    D = np.rint(dist / SPEED / dt).astype(int)
    np.fill_diagonal(D, 0)
    taues = rng.uniform(8e-3, 13e-3, size=M)

    def build(delays, mode=None, train=None):
        net = FeedbackNetwork(dt)
        net.add_diffeq_node("brain", JR, weights=np.zeros((M, M)),
                            source_var="m_py", target_var="r_in",
                            input_var="r_in", output_var="m_py",
                            verbose=False, clear=True, file_name="wb_bench",
                            node_vars={"all/jr_op/tau_e": taues})
        kw = {"delays": delays} if delays is not None else {}
        if mode is not None:
            kw["mode"] = mode
        net.add_edge("brain", "brain", weights=40.0 * W, feedback=True,
                     train=train, **kw)
        net.compile()
        return net

    onehot_elems = M * M * (int(D.max()) + 1)
    variants = [("factored", D, "factored"), ("gather", D, "gather")]
    if onehot_elems <= 2 ** 26:  # 256 MB f32 constant cap for the A/B
        variants.insert(0, ("onehot", D, "onehot"))
    variants.append(("instantaneous", None, None))
    if os.environ.get("WB_FWD", "1") != "1":  # skip to the training phases
        variants = []
    for label, delays, mode in variants:
        # the M~1000 gather program runs minutes of device time at full T --
        # past the relay's ~1-2 min crash threshold (CLAUDE.md); shorten it
        T_run = min(T, 2000) if (label == "gather" and M >= 512) else T
        inp = np.zeros((T_run, M))
        net = build(delays, mode)
        t0 = time.perf_counter()
        obs = net.run(inp, sampling_steps=100, verbose=False)
        t_first = time.perf_counter() - t0
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            obs = net.run(inp, sampling_steps=100, verbose=False)
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
            assert np.all(np.isfinite(obs.to_numpy("out")))
        sps = T_run / best
        extra = (f"  buffer ({M},{int(D.max()) + 1}), "
                 f"{np.unique(D).size} distinct delays" if delays is not None else "")
        lap(f"M={M:4d} {label:>14}: first {t_first:7.2f}s, best {best:6.3f}s "
            f"= {sps:9.0f} steps/s = {sps * M:.3e} region-updates/s{extra}")

    B = int(os.environ.get("WB_BATCH", "0"))
    if B > 1:
        # ensemble of connectome trials: the one-hot selector stream is
        # UNBATCHED under vmap (prep runs on shared params), so B trials
        # amortize it -- the whole-brain sweep/ensemble workload
        net = build(D, "factored")
        T_b = int(os.environ.get("WB_BATCH_T", min(T, 2000)))
        rng3 = np.random.default_rng(2)
        binp = rng3.normal(size=(B, T_b, M)).astype(np.float32) * 2.0
        # pre-stage ONCE: host numpy (B, T, M) re-stages over the tunnel
        # every call by design (mutable); at B=8/M=998 that is 64 MB/call
        # of pure transfer inflating the per-call wall clock (round-5
        # anatomy, benchmarks/ab_wb_ensemble.py)
        import jax as _jax
        import jax.numpy as _jnp

        binp = _jax.device_put(_jnp.asarray(binp))
        _jax.block_until_ready(binp)
        t0 = time.perf_counter()
        res = net.run_batch(binp, sampling_steps=100, verbose=False)
        t_first = time.perf_counter() - t0
        best = None
        for _ in range(max(REPS, 2)):
            t0 = time.perf_counter()
            res = net.run_batch(binp, sampling_steps=100, verbose=False)
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
        assert np.all(np.isfinite(res["out"]))
        agg = B * T_b / best * M
        lap(f"M={M:4d} ENSEMBLE B={B} factored: first {t_first:7.2f}s, "
            f"best {best:6.3f}s = {T_b / best:7.0f} steps/s/trial = "
            f"{agg:.3e} aggregate region-updates/s")

    remat = int(os.environ.get("WB_TRAIN_REMAT", "0"))
    if os.environ.get("WB_TRAIN", "0") == "1" and (M <= 512 or remat > 1):
        # connectome-weight fitting through the factored selectors (the
        # plain-autodiff path preps them outside the differentiated scan).
        # Plain-autodiff residuals are ~T * (M, max_delay) buffers: M=998 at
        # T=2000 would need ~9 GB of saved carries -- TVB scale needs
        # WB_TRAIN_REMAT (chunked gradient checkpointing)
        T_tr = int(os.environ.get("WB_TRAIN_T", 2000))
        net = build(D, "factored", train="gd")
        rng2 = np.random.default_rng(1)
        inp = rng2.normal(size=(T_tr, M)) * 5.0
        tgt = np.asarray(net.run(inp, verbose=False).to_numpy("out"))
        # perturb the INTERNAL weights 5% (the setter does not apply the
        # square auto-transpose the constructor did, so scaling the stored
        # matrix is the only orientation-safe perturbation)
        edge = net.get_edge("brain", "brain")
        edge.weights = np.asarray(edge.weights) * 1.05
        n_ep = 16
        kw = {"remat_steps": remat} if remat > 1 else {}
        t0 = time.perf_counter()
        obs = net.fit_bptt([inp] * n_ep, [tgt] * n_ep, optimizer="adam",
                           lr=1e-3, verbose=False, **kw)
        wall = time.perf_counter() - t0
        losses = [float(l) for l in obs["epoch_loss"]]
        t0 = time.perf_counter()
        obs = net.fit_bptt([inp] * n_ep, [tgt] * n_ep, optimizer="adam",
                           lr=1e-3, verbose=False, **kw)
        wall2 = time.perf_counter() - t0
        tag = f" remat={remat}" if remat > 1 else ""
        lap(f"M={M:4d} TRAIN factored{tag}: {wall:6.2f}s first fit, "
            f"{wall2 / n_ep * 1e3:7.1f} ms/epoch warm (T={T_tr}); "
            f"losses {losses[0]:.3e} -> {losses[-1]:.3e}")
        assert losses[-1] < losses[0], "training did not reduce the loss"

    if os.environ.get("WB_TRAIN_DELAYS", "0") == "1" and (M <= 512 or remat > 1):
        # DIFFERENTIABLE delays: weights AND the fractional delay matrix
        # trained jointly (mode='interp'; the (M, M, max_delay+1) hat tensor
        # is rebuilt once per epoch inside the loss, not per step).  Past
        # RECTIPY_DELAY_HAT_LIMIT the edge switches to the two-point
        # factored read automatically -- TVB scale (M=998, ~1157-step delay
        # span) trains with WB_TRAIN_REMAT (plain residuals would be
        # ~T * (M, Q*S) buffers, ~9 GB at T=2000)
        T_tr = int(os.environ.get("WB_TRAIN_T", 2000))
        net = FeedbackNetwork(dt)
        net.add_diffeq_node("brain", JR, weights=np.zeros((M, M)),
                            source_var="m_py", target_var="r_in",
                            input_var="r_in", output_var="m_py",
                            verbose=False, clear=True, file_name="wb_bench",
                            node_vars={"all/jr_op/tau_e": taues})
        net.add_edge("brain", "brain", weights=40.0 * W, feedback=True,
                     delays=(dist / SPEED / dt), mode="interp",
                     train="gd", train_delays=True,
                     max_delay=int(np.ceil(dist.max() / SPEED / dt)))
        net.compile()
        rng4 = np.random.default_rng(3)
        inp = rng4.normal(size=(T_tr, M)) * 5.0
        tgt = np.asarray(net.run(inp, verbose=False).to_numpy("out"))
        edge = net.get_edge("brain", "brain")
        edge.params["delays"] = edge.params["delays"] * 1.1  # 10% delay error
        n_ep = 16
        kw = {"remat_steps": remat} if remat > 1 else {}
        t0 = time.perf_counter()
        obs = net.fit_bptt([inp] * n_ep, [tgt] * n_ep, optimizer="adam",
                           lr=1e-2, verbose=False, **kw)
        wall = time.perf_counter() - t0
        losses = [float(l) for l in obs["epoch_loss"]]
        t0 = time.perf_counter()
        obs = net.fit_bptt([inp] * n_ep, [tgt] * n_ep, optimizer="adam",
                           lr=1e-2, verbose=False, **kw)
        wall2 = time.perf_counter() - t0
        tag = f" remat={remat}" if remat > 1 else ""
        lap(f"M={M:4d} TRAIN-DELAYS interp[{edge._interp_impl}]{tag}: "
            f"{wall:6.2f}s first fit, {wall2 / n_ep * 1e3:7.1f} ms/epoch warm "
            f"(T={T_tr}, weights+delays trained); "
            f"losses {losses[0]:.3e} -> {losses[-1]:.3e}")
        assert losses[-1] < losses[0], "delay training did not reduce the loss"
