"""N=100k spatially-embedded QIF: block-sparse recurrent coupling with
per-BLOCK conduction delays (BlockSparseLinear) -- the population-scale
companion of the whole-brain delay matrix.

Workload: 100,352 QIF-SFA neurons on a ring of 196 512-neuron patches; every
neuron receives fan_in=1000 connections from 4 source patches; each
(target-patch, source-patch) pair carries one conduction delay d =
ring-distance/velocity (0..D_MAX steps).  All recurrent coupling rides the
delayed feedback edge (node-internal weights=None), so the per-step cost IS
the delayed block stream: the circular (nb, D1, bs) history gather + the
N*fan_in block contraction.

Variants (interleaved round-robin per CLAUDE.md protocol):
  zero-delay   BlockSparseLinear(delays=None)  -- stream floor, no history
  delayed f32  per-block delays, f32 blocks (822 MB/step stream)
  delayed bf16 per-block delays, block_dtype=bfloat16 (411 MB/step stream)

A BD_TRAIN=1 phase measures a TRAINED epoch through the delayed blocks:
fit_bptt with train='gd' on the edge.  BD_TRAIN_FUSED selects the path:
'auto' (default; the deferred-gradient graph trajectory, which saves the
(T, n_br, cb, bs) gathered stage records and contracts the block gradient
ONCE after the backward scan), 'plain' (plain autodiff: XLA carries the
822 MB block-gradient accumulator through the backward scan), or 'both'
(interleaved A/B per CLAUDE.md protocol).  BD_TRAIN_REMAT=K chunks the
residuals.

Usage:
    BD_N=100352 BD_T=2000 BD_REPS=4 BD_DMAX=64 python benchmarks/block_delay_scale.py
    BD_FWD=0 BD_TRAIN=1 BD_TRAIN_T=500 python benchmarks/block_delay_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("BD_CPU"):  # smoke-test on CPU (sitecustomize pins axon)
    jax.config.update("jax_platforms", "cpu")

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
        lap(f"backend up: {jax.devices()}")
        break
    except Exception as e:
        lap(f"attempt {attempt}: backend unavailable ({type(e).__name__}); sleep 120s")
        time.sleep(120)
else:
    sys.exit("relay never came back")

from rectipy_tpu import FeedbackNetwork
from rectipy_tpu.inputs import Pulse
from rectipy_tpu.ops.sparse import block_random_connectivity

BS = 512
N = int(os.environ.get("BD_N", 100_352))
T = int(os.environ.get("BD_T", 2000))
REPS = int(os.environ.get("BD_REPS", 4))
D_MAX = int(os.environ.get("BD_DMAX", 64))
dt = 1e-3

nb = N // BS
t0 = time.perf_counter()
A = block_random_connectivity(N, N, 1000, block_size=BS, seed=0)
lap(f"sampled {nb}x{A.cols.shape[1]} blocks in {time.perf_counter() - t0:.1f}s")

# ring geometry: delay = shortest ring distance between patches, scaled to
# [0, D_MAX] (the farthest sampled pair sets D_MAX)
ring = np.abs(A.cols - np.arange(nb)[:, None])
ring = np.minimum(ring, nb - ring).astype(float)
d_blk = np.rint(ring / max(ring.max(), 1.0) * D_MAX).astype(int)
lap(f"delays: span {d_blk.min()}..{d_blk.max()} steps, "
    f"{len(np.unique(d_blk))} distinct")

rng = np.random.default_rng(1)
etas = 1000.0 + 200.0 * rng.standard_normal(N)


def build(delays, **ekw):
    net = FeedbackNetwork(dt)
    net.add_diffeq_node(
        "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", n=N,
        input_var="I_ext", output_var="s",
        spike_var="spike", spike_def="v", op="qif_sfa_op",
        spike_threshold=1e2, spike_reset=-1e2,
        node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": 0.05,
                   "all/qif_sfa_op/k": 15.0})
    # all recurrent coupling through the (optionally delayed) block edge
    net.add_edge("qif", "qif", weights=A, delays=delays, feedback=True, **ekw)
    net.compile()
    return net


drive = Pulse(T, channels=1, t_on=T // 8, t_off=T, amp=3.0)


def run1(net):
    obs = net.run(drive, record_output=False, sampling_steps=100,
                  record_vars=[("qif", "s", True)], verbose=False)
    s = np.asarray(obs.to_numpy(("qif", "s")))
    assert np.all(np.isfinite(s)), "non-finite dynamics"
    return s


if os.environ.get("BD_FWD", "1") == "1":
    variants = [
        ("zero-delay", build(None)),
        ("delay f32", build(d_blk)),
        ("delay bf16", build(d_blk, block_dtype="bfloat16")),
        # round 5: quantized stream (prep-quantized frozen fast path)
        ("delay int8", build(d_blk, block_dtype="int8_master")),
    ]

    outs = {}
    for label, net in variants:
        t0 = time.perf_counter()
        outs[label] = run1(net)
        lap(f"{label}: first run (incl. compile) "
            f"{time.perf_counter() - t0:7.1f}s")

    times = {label: [] for label, _ in variants}
    for r in range(REPS):
        for label, net in variants:
            t0 = time.perf_counter()
            run1(net)
            times[label].append(time.perf_counter() - t0)
        lap(f"round {r}: " + "  ".join(f"{lb} {times[lb][-1]:6.2f}s"
                                       for lb, _ in variants))

    for label, _ in variants:
        ts = sorted(times[label])
        best = ts[0]
        bpw = 2 if "bf16" in label else (1 if "int8" in label else 4)
        gbps = N * 1024 * bpw * T / best / 1e9  # cb=4 x bs=512 per-row stream
        lap(f"{label:>12}: best {best:6.2f}s  median {ts[len(ts) // 2]:6.2f}s"
            f"  = {T * N / best:.3e} nu/s  ({gbps:.0f} GB/s block stream)")

    a = outs["delay f32"].ravel()
    lap(f"corr(delay f32, delay bf16) = "
        f"{np.corrcoef(a, outs['delay bf16'].ravel())[0, 1]:.6f}")
    lap(f"mean activity: zero-delay {outs['zero-delay'].mean():.4f}, "
        f"delayed {outs['delay f32'].mean():.4f}")

if os.environ.get("BD_TRAIN", "0") == "1":
    # TRAINED epoch through the per-block-delayed edge
    import jax.numpy as jnp

    T_tr = int(os.environ.get("BD_TRAIN_T", 500))
    remat = int(os.environ.get("BD_TRAIN_REMAT", "0"))
    fused_sel = os.environ.get("BD_TRAIN_FUSED", "auto")
    lr = float(os.environ.get("BD_TRAIN_LR", 1e-3))
    n_ep = 8

    def build_train():
        net = FeedbackNetwork(dt)
        net.add_func_node("inp", 1, activation_function="identity")
        net.add_diffeq_node(
            "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", n=N,
            input_var="I_ext", output_var="s",
            spike_var="spike", spike_def="v", op="qif_sfa_op",
            spike_threshold=1e2, spike_reset=-1e2,
            node_vars={"all/qif_sfa_op/eta": etas,
                       "all/qif_sfa_op/alpha": 0.05,
                       "all/qif_sfa_op/k": 15.0})
        # fresh generator: 'both' mode builds twice and the nets must match
        net.add_edge("inp", "qif", weights=np.random.default_rng(7).normal(
            size=(N, 1)).astype(np.float32))
        ekw = {}
        if os.environ.get("BD_TRAIN_BDTYPE"):  # e.g. bfloat16 block stream
            ekw["block_dtype"] = os.environ["BD_TRAIN_BDTYPE"]
        net.add_edge("qif", "qif", weights=A, delays=d_blk, feedback=True,
                     train="gd", **ekw)
        net.compile()
        return net

    ins = np.zeros((T_tr, 1), dtype=np.float32)
    ins[T_tr // 4:, 0] = 3.0
    modes = (["auto", "plain"] if fused_sel == "both" else [fused_sel])
    nets, losses0 = {}, {}
    tgt = np.asarray(build_train().run(ins, verbose=False).to_numpy("out"))
    for m in modes:  # students are fresh (never run) and identical
        net_t = build_train()
        edge = net_t.get_edge("qif", "qif")
        edge.weights = edge.weights * 1.05  # 5% teacher-student perturbation
        nets[m] = net_t
    ins_d = jax.device_put(jnp.asarray(ins))
    tgt_d = jax.device_put(jnp.asarray(tgt))
    jax.block_until_ready((ins_d, tgt_d))
    lap(f"train: staged {tgt_d.nbytes / 2**20:.0f} MB targets (T={T_tr})")
    kw = {"remat_steps": remat} if remat > 1 else {}
    for m in modes:
        fb = {"auto": "auto", "plain": False}[m]
        t0 = time.perf_counter()
        obs = nets[m].fit_bptt([ins_d] * n_ep, [tgt_d] * n_ep,
                               optimizer="adam", lr=lr, verbose=False,
                               fused_bptt=fb, **kw)
        lap(f"train[{m}]: first fit (incl. compile) "
            f"{time.perf_counter() - t0:6.1f}s")
        losses0[m] = [float(l) for l in obs["epoch_loss"]]
    best = {m: float("inf") for m in modes}
    for r in range(3):  # interleave modes round-robin (CLAUDE.md protocol)
        for m in modes:
            fb = {"auto": "auto", "plain": False}[m]
            t0 = time.perf_counter()
            nets[m].fit_bptt([ins_d] * n_ep, [tgt_d] * n_ep, optimizer="adam",
                             lr=lr, verbose=False, fused_bptt=fb, **kw)
            best[m] = min(best[m], (time.perf_counter() - t0) / n_ep)
    tag = f" remat={remat}" if remat > 1 else ""
    for m in modes:
        ls = losses0[m]
        lap(f"TRAIN block-delay[{m}]{tag}: best {best[m] * 1e3:7.1f} ms/epoch"
            f" = {T_tr * N / best[m]:.3e} trained nu/s (T={T_tr}); "
            f"losses {ls[0]:.4e} -> {ls[-1]:.4e}")
        assert ls[-1] < ls[0], "training did not reduce the loss"
