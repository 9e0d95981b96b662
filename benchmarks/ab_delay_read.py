"""Interleaved A/B: delay-matrix read precision (read_dtype) and fine-digit
width (fine_s) at whole-brain scale.

Round-4 notes hypothesized two rebalancing levers for the factored delayed
read (see NOTES_NEXT_ROUND.md "Known gaps / ideas for round 5"):

1. bf16 selectors halve the dominant nm(Q+S) selector stream IF XLA's mixed
   einsum doesn't insert a full-size convert -- `read_dtype='bfloat16'` now
   builds AND contracts the one-hot selectors in bf16 (selection stays exact;
   only the buffer values round once, the same tier as a bf16 dense coupling).
2. Batched ensembles are dominated by the PER-TRIAL (B, n, m, S) intermediate
   while the selector stream is shared across trials, so a smaller S
   (`fine_s`) should rebalance them (bytes model: ~1.4x at B=8, S 15 -> 5).

MEASURED OUTCOME (v5e, M=998, D-span 1157, 2026-08-20): both REFUTED.
bf16 reads are perf-neutral (single 0.593 f32 vs 0.611 bf16 best per 2k
steps; B=8 T=2000 bf16 slightly ahead, 2.580 vs 2.695 s -- noise); fine_s=5
is ~2.4x SLOWER single-trial (1.402 vs 0.593) and ~1.2x slower at B=8
(0.899 -> 0.777/0.657) -- XLA does not materialize the per-trial t1 the
bytes model assumed.  corr(f32, *) = 1.000000 everywhere.  Defaults stand.

Modes are interleaved round-robin (minute-scale relay drift swamps
sequential comparisons -- CLAUDE.md protocol); run() fetches results
internally, so wall timing is sync-safe.

Usage:
    AB_M=998 AB_T=2000 AB_REPS=5 AB_BATCH=8 python benchmarks/ab_delay_read.py
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
M = int(os.environ.get("AB_M", 998))
T = int(os.environ.get("AB_T", 2000))
REPS = int(os.environ.get("AB_REPS", 5))
B = int(os.environ.get("AB_BATCH", 8))
SPEED = 2.0
dt = 1e-4

rng = np.random.default_rng(0)
pos = rng.uniform(0.0, 0.14, size=(M, 3))
dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
W = np.exp(-dist / 0.06)
np.fill_diagonal(W, 0.0)
W /= W.sum(axis=0, keepdims=True)
D = np.rint(dist / SPEED / dt).astype(int)
np.fill_diagonal(D, 0)
taues = rng.uniform(8e-3, 13e-3, size=M)


def build(**kw):
    net = FeedbackNetwork(dt)
    net.add_diffeq_node("brain", JR, weights=np.zeros((M, M)),
                        source_var="m_py", target_var="r_in",
                        input_var="r_in", output_var="m_py",
                        verbose=False, clear=True, file_name="ab_delay_read",
                        node_vars={"all/jr_op/tau_e": taues})
    net.add_edge("brain", "brain", weights=40.0 * W, feedback=True,
                 delays=D, mode="factored", **kw)
    net.compile()
    return net


def ab_phase(tag, variants, runner):
    """variants: list of (label, net). Warm each (exact timed program), then
    interleave REPS rounds; report best + median per variant."""
    outs = {}
    for label, net in variants:
        t0 = time.perf_counter()
        outs[label] = runner(net)
        lap(f"{tag} {label}: first (incl. compile) {time.perf_counter() - t0:7.2f}s")
    times = {label: [] for label, _ in variants}
    for r in range(REPS):
        for label, net in variants:
            t0 = time.perf_counter()
            runner(net)
            times[label].append(time.perf_counter() - t0)
        lap(f"{tag} round {r}: " + "  ".join(
            f"{lb} {times[lb][-1]:6.3f}s" for lb, _ in variants))
    for label, _ in variants:
        ts = sorted(times[label])
        lap(f"{tag} {label:>24}: best {ts[0]:6.3f}s  median {ts[len(ts) // 2]:6.3f}s"
            f"  = {T / ts[0]:7.0f} steps/s best")
    return outs


if os.environ.get("AB_SINGLE", "1") == "1":
    inp = np.zeros((T, M))

    def run1(net):
        obs = net.run(inp, sampling_steps=100, verbose=False)
        return np.asarray(obs.to_numpy("out"))

    variants = [
        ("f32", build()),
        ("bf16-read", build(read_dtype="bfloat16")),
        ("bf16-read S=5", build(read_dtype="bfloat16", fine_s=5)),
    ]
    outs = ab_phase(f"M={M} single", variants, run1)
    a = outs["f32"].ravel()
    for lb in list(outs)[1:]:
        b = outs[lb].ravel()
        lap(f"corr(f32, {lb}) = {np.corrcoef(a, b)[0, 1]:.6f}")

if B > 1:
    T_b = int(os.environ.get("AB_BATCH_T", 500))
    rngb = np.random.default_rng(2)
    binp = rngb.normal(size=(B, T_b, M)).astype(np.float32) * 2.0

    def runb(net):
        res = net.run_batch(binp, sampling_steps=100, verbose=False)
        return np.asarray(res["out"])

    T = T_b  # steps/s label
    variants = [
        ("f32 S=def", build()),
        ("f32 S=5", build(fine_s=5)),
        ("bf16 S=def", build(read_dtype="bfloat16")),
        ("bf16 S=5", build(read_dtype="bfloat16", fine_s=5)),
    ]
    outs = ab_phase(f"M={M} B={B}", variants, runb)
    a = outs["f32 S=def"].ravel()
    for lb in list(outs)[1:]:
        lap(f"corr(f32, {lb}) = {np.corrcoef(a, outs[lb].ravel())[0, 1]:.6f}")
