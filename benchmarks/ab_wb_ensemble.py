"""Anatomy of the M=998 whole-brain ensemble non-amortization (round-4
weak #5 / round-5 VERDICT item 8).

Measured round 4: B=8 `run_batch` at M=998 = 0.83x the SINGLE-trial
aggregate (337 steps/s/trial vs 3250 single) -- ensembles do not amortize
at TVB scale, unlike every other workload in the framework.  The smaller-S
rebalancing hypothesis was already REFUTED (fine_s=5 slower at B=8 too).

This probe isolates the factored delayed-read pipeline OUTSIDE the network
(raw jitted scans over the exact per-step ops) at B in {1, 8} and times
restructure candidates:

  shift   : buffer shift + write only (the (n, D1) concatenate)
  read0   : shift + coarse one-hot matmul t1 only
  V0      : current production read (t1 = ohq @ buf3, reduce with ohr, W)
  V1      : fine-digit-first contraction order (t2 = ohr . buf3, then ohq)
  V2      : single 3-operand einsum (XLA plans the factorization)
  V3      : W fused into one 4-operand einsum
  dense   : zero-delay reference (W @ x only)

Timing protocol (CLAUDE.md): the relay does not block and dedups identical
executions, so every timed program consumes a DIFFERENT input slice and the
clock stops on a host fetch of the result.  Interleaved round-robin over
variants, best of REPS.

Usage: python benchmarks/ab_wb_ensemble.py   (env: M, DMAX, T, REPS, BS=1,8)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("WB_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
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

M = int(os.environ.get("M", 998))
DMAX = int(os.environ.get("DMAX", 1157))
T = int(os.environ.get("T", 200))
REPS = int(os.environ.get("REPS", 3))
BATCHES = [int(x) for x in os.environ.get("BS", "1,8").split(",")]

D1 = DMAX + 1
S = max(1, int(round(np.sqrt(D1 / 5.0))))
Q = -(-D1 // S)
rng = np.random.default_rng(0)
d = rng.integers(0, DMAX + 1, size=(M, M))  # (n_in, n_out) layout (dT)
W = (rng.standard_normal((M, M)) / M).astype(np.float32)
lap(f"M={M} D1={D1} Q={Q} S={S}; selectors {M*M*(Q+S)*4/2**20:.0f} MB f32")

dq, dr = d // S, d % S
oh_q = jnp.asarray((dq[:, :, None] == np.arange(Q)[None, None, :])
                   .astype(np.float32))
oh_r = jnp.asarray((dr[:, :, None] == np.arange(S)[None, None, :])
                   .astype(np.float32))
Wd = jnp.asarray(W)
dT = jnp.asarray(d)


def shift(buf, x):
    return jnp.concatenate([x[:, None], buf[:, :-1]], axis=1)


def mk(step_fn, B):
    """Jitted T-step scan of one per-step variant; vmapped over B trials.
    The selectors/weights ride as ARGUMENTS (sel) -- 370 MB closure
    constants are rejected by the tunneled remote compile (HTTP 413,
    round-4 lesson)."""

    def scan_one(buf, xs, sel):
        def body(buf, x):
            buf, y = step_fn(buf, x, sel)
            return buf, jnp.sum(y)

        buf, ys = jax.lax.scan(body, buf, xs)
        return buf, jnp.sum(ys)

    if B == 1:
        return jax.jit(scan_one)
    return jax.jit(jax.vmap(scan_one, in_axes=(0, 0, None)))


def v_shift(buf, x, sel):
    buf = shift(buf, x)
    return buf, buf[:, 0]


def v_read0(buf, x, sel):
    oh_q, oh_r, Wd = sel
    buf = shift(buf, x)
    t1 = jnp.einsum("jia,jab->jib", oh_q, buf.reshape(M, Q, S))
    return buf, t1[:, :, 0].sum(axis=0)


def v0(buf, x, sel):  # production factored read
    oh_q, oh_r, Wd = sel
    buf = shift(buf, x)
    t1 = jnp.einsum("jia,jab->jib", oh_q, buf.reshape(M, Q, S))
    vals = jnp.einsum("jib,jib->ji", t1, oh_r)
    return buf, jnp.einsum("ij,ji->i", Wd, vals)


def v1(buf, x, sel):  # fine digit first
    oh_q, oh_r, Wd = sel
    buf = shift(buf, x)
    t2 = jnp.einsum("jib,jab->jia", oh_r, buf.reshape(M, Q, S))
    vals = jnp.einsum("jia,jia->ji", t2, oh_q)
    return buf, jnp.einsum("ij,ji->i", Wd, vals)


def v2(buf, x, sel):  # one 3-operand einsum
    oh_q, oh_r, Wd = sel
    buf = shift(buf, x)
    vals = jnp.einsum("jia,jab,jib->ji", oh_q, buf.reshape(M, Q, S), oh_r)
    return buf, jnp.einsum("ij,ji->i", Wd, vals)


def v3(buf, x, sel):  # W fused in
    oh_q, oh_r, Wd = sel
    buf = shift(buf, x)
    return buf, jnp.einsum("ij,jia,jab,jib->i", Wd, oh_q,
                           buf.reshape(M, Q, S), oh_r)


def v_dense(buf, x, sel):
    buf = shift(buf, x)
    return buf, sel[2] @ x


VARIANTS = [("shift", v_shift), ("read0", v_read0), ("V0-prod", v0),
            ("V1-rfirst", v1), ("V2-single", v2), ("V3-Wfused", v3),
            ("dense", v_dense)]

for B in BATCHES:
    fns = {}
    xs_all = jnp.asarray(rng.standard_normal(
        ((REPS + 1), B, T, M) if B > 1 else ((REPS + 1), T, M)),
        dtype=jnp.float32)
    buf0 = jnp.zeros((B, M, Q * S), jnp.float32) if B > 1 \
        else jnp.zeros((M, Q * S), jnp.float32)
    for name, fn in VARIANTS:
        fns[name] = mk(fn, B)
        t0 = time.perf_counter()
        _, s = fns[name](buf0, xs_all[0], (oh_q, oh_r, Wd))
        float(np.asarray(s).sum())  # host fetch = sync
        lap(f"[B={B}] {name:>10} warm (incl. compile) "
            f"{time.perf_counter()-t0:6.1f}s")
    best = {name: float("inf") for name, _ in VARIANTS}
    for r in range(REPS):  # interleaved round-robin, fresh inputs per rep
        for name, _ in VARIANTS:
            t0 = time.perf_counter()
            _, s = fns[name](buf0, xs_all[r + 1], (oh_q, oh_r, Wd))
            float(np.asarray(s).sum())
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, _ in VARIANTS:
        sps = T / best[name]
        agg = B * sps
        lap(f"[B={B}] {name:>10}: best {best[name]*1e3:8.1f} ms / {T} steps"
            f" = {sps:7.1f} steps/s ({agg:8.1f} aggregate trial-steps/s)")
