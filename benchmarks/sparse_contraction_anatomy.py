"""Anatomy of the N=100352 block-sparse step: time each contraction piece
and candidate reformulations.  (Run on the real TPU.)"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

t00 = time.perf_counter()
def lap(msg):
    print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", flush=True)

for attempt in range(40):
    try:
        d = jax.devices(); lap(f"backend up: {d}"); break
    except Exception as e:
        lap(f"attempt {attempt}: backend unavailable; sleep 120s"); time.sleep(120)

from rectipy_tpu.ops.sparse import block_random_connectivity
from rectipy_tpu.ops.quant import quantize_blocks, quant_vec

BS = 512
N = 100_352
FAN_IN = 1000
A = block_random_connectivity(N, N, FAN_IN, block_size=BS, seed=0)
n_br, cb = A.cols.shape
lap(f"structure: blocks {A.blocks.shape} cols {A.cols.shape}")

rng = np.random.default_rng(0)
blocks = jnp.asarray(A.blocks, dtype=jnp.float32)
bq, scale = jax.jit(quantize_blocks)(blocks)
cols = jnp.asarray(A.cols, dtype=jnp.int32)
src = jnp.asarray(rng.normal(size=N), dtype=jnp.float32)
delta = jnp.asarray(rng.normal(size=N), dtype=jnp.float32)
jax.block_until_ready((bq, scale, src, delta))
lap("staged")

def timeit(name, f, *args, reps=50):
    # CAVEAT (CLAUDE.md): jax.block_until_ready does not block on the axon
    # relay and identical program+input executions can be deduped, so these
    # micro timings are LOWER BOUNDS at best.  The host fetch below forces
    # the last dispatch; repeated identical calls before it may dedup.
    # Decision-grade comparisons must come from interleaved fit_bptt A/Bs
    # (benchmarks/ab_sparse_bwd.py) whose wall-clock includes a host fetch
    # per fit -- that A/B measured scatter == onehot (357 ms/epoch both) at
    # N=100352 despite whatever these micro numbers say.
    o = f(*args); np.asarray(jax.tree.leaves(o)[0].ravel()[:8])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
        np.asarray(jax.tree.leaves(o)[0].ravel()[:8])  # host-fetch sync
        best = min(best, (time.perf_counter()-t0)/reps)
    lap(f"  {name}: {best*1e6:.0f} us")
    return best

# ---- forward variants
@jax.jit
def fwd_current(bq, scale, src):
    xq, xs = quant_vec(src)
    s_blk = xq.reshape(-1, BS)[cols]
    acc = jnp.einsum("rcij,rcj->ri", bq, s_blk, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * scale * xs).reshape(-1)

# reshaped: (r, i, c*j) x (r, c*j) single batched matvec
bq_t = jnp.transpose(bq, (0, 2, 1, 3)).reshape(n_br, BS, cb*BS)
jax.block_until_ready(bq_t)

@jax.jit
def fwd_reshaped(bq_t, scale, src):
    xq, xs = quant_vec(src)
    s_blk = xq.reshape(-1, BS)[cols].reshape(n_br, cb*BS)
    acc = jnp.einsum("rik,rk->ri", bq_t, s_blk, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * scale * xs).reshape(-1)

o1 = fwd_current(bq, scale, src); o2 = fwd_reshaped(bq_t, scale, src)
print("  fwd variants agree:", bool(jnp.allclose(o1, o2)), flush=True)
timeit("fwd current (rcij,rcj->ri)", fwd_current, bq, scale, src)
timeit("fwd reshaped (rik,rk->ri)", fwd_reshaped, bq_t, scale, src)

# ---- backward (transposed) variants
@jax.jit
def bwd_scatter(bq, scale, delta):
    d_blk = delta.reshape(n_br, BS)
    v = scale.astype(delta.dtype) * d_blk
    vq, vs = quant_vec(v)
    vq_blk = vq.reshape(n_br, BS)
    contrib = jnp.einsum("rcij,ri->rcj", bq, vq_blk, preferred_element_type=jnp.int32)
    out = jnp.zeros((n_br, BS), dtype=jnp.float32).at[cols].add(contrib.astype(jnp.float32))
    return (out * vs).reshape(-1)

# one-hot matmul instead of scatter
M_np = np.zeros((n_br*cb, n_br), dtype=np.float32)
M_np[np.arange(n_br*cb), np.asarray(A.cols).ravel()] = 1.0
M = jnp.asarray(M_np)
jax.block_until_ready(M)

@jax.jit
def bwd_onehot(bq, scale, delta):
    d_blk = delta.reshape(n_br, BS)
    v = scale.astype(delta.dtype) * d_blk
    vq, vs = quant_vec(v)
    vq_blk = vq.reshape(n_br, BS)
    contrib = jnp.einsum("rcij,ri->rcj", bq, vq_blk, preferred_element_type=jnp.int32)
    out = jnp.einsum("kj,kq->qj", contrib.reshape(n_br*cb, BS).astype(jnp.float32), M)
    return (out * vs).reshape(-1)

b1 = bwd_scatter(bq, scale, delta); b2 = bwd_onehot(bq, scale, delta)
print("  bwd variants agree:", bool(jnp.allclose(b1, b2, rtol=1e-4)), flush=True)
timeit("bwd scatter-add", bwd_scatter, bq, scale, delta)
timeit("bwd one-hot matmul", bwd_onehot, bq, scale, delta)

# the einsum alone (no scatter/onehot): lower bound of the contraction
@jax.jit
def bwd_contrib_only(bq, delta):
    d_blk = delta.reshape(n_br, BS)
    vq, vs = quant_vec(d_blk)
    return jnp.einsum("rcij,ri->rcj", bq, vq.reshape(n_br, BS),
                      preferred_element_type=jnp.int32)
timeit("bwd contrib einsum only", bwd_contrib_only, bq, delta)

# forward einsum alone
@jax.jit
def fwd_contrib_only(bq, src):
    xq, xs = quant_vec(src)
    s_blk = xq.reshape(-1, BS)[cols]
    return jnp.einsum("rcij,rcj->ri", bq, s_blk, preferred_element_type=jnp.int32)
timeit("fwd einsum+gather only", fwd_contrib_only, bq, src)
lap("done")
