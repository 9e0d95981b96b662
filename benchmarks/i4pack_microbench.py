"""Packed-int4 Pallas matvec vs the int8 XLA matvec at HBM-streaming N.

Premise (NOTES round 4): XLA:TPU stores int4 one-value-per-byte in HBM, so
`coupling_dtype='int4'` never shrinks the weight stream (measured
perf-neutral, benchmarks/int4_inference.py).  This kernel packs TWO int4
values per byte by hand -- (n/2, n) uint8 over the contraction dim of the
transposed coupling -- and unpacks on-core (VPU shifts), so the HBM stream
halves where int8 spills out of VMEM (N >= ~12k).  Theoretical ceiling: 2x.

Packing layout: byte b[k, j] holds Wt[2k, j] (low nibble) and Wt[2k+1, j]
(high nibble), each offset-binary (value + 8).  The kernel computes
    acc += x_even @ (lo - 8) + x_odd @ (hi - 8)
with x_even/x_odd = x[0::2]/x[1::2] precomputed as (1, n/2) rows -- no
interleave inside the kernel.  f32 MXU dots: products are integers <= 8*127
and row sums <= 8*127*N < 2^24 for N <= 16k, so f32 accumulation is exact.

Protocol: CLAUDE.md relay rules -- the timed unit is a K-step lax.scan
whose carry feeds the next matvec (no dedup, no pipelining artifacts),
synced via host fetch; A/B interleaved round-robin; best-of-k.

Usage:
  python benchmarks/i4pack_microbench.py              # on the TPU
  I4P_INTERPRET=1 I4P_N=1024 python ...               # CPU correctness only
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

INTERPRET = os.environ.get("I4P_INTERPRET", "0") == "1"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

N = int(os.environ.get("I4P_N", 14336))      # multiple of 2*TILE
TILE = int(os.environ.get("I4P_TILE", 512))
K = int(os.environ.get("I4P_K", 200))        # scan steps per timed unit
REPS = int(os.environ.get("I4P_REPS", 4))

t00 = time.perf_counter()


def lap(m):
    print(f"[{time.perf_counter()-t00:7.1f}s] {m}", flush=True)


def make_i4pack_matvec(n, tile=512, interpret=False):
    """y(1,n) = x(1,n) @ Wt(n,n) with Wt int4-PACKED along the contraction:
    returns (matvec(xe, xo, wtp) -> (1, n) f32, pack(Wt_int) -> (n/2, n) u8).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n % (2 * tile) == 0, "n must be a multiple of 2*tile"
    n_j = n // tile          # output tiles
    n_k = n // tile          # contraction tiles (each reads tile/2 packed rows)

    def kernel(xe_ref, xo_ref, wtp_ref, out_ref, acc_ref):
        kk = pl.program_id(1)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = wtp_ref[:].astype(jnp.int32)          # (tile/2, tile) packed
        # bf16 MXU dots (2-4x the f32 issue rate) stay EXACT here: weights
        # are 4-bit ints, activations 7-bit ints, products accumulate in f32
        lo = ((w & 15) - 8).astype(jnp.bfloat16)  # rows 2k   of Wt
        hi = ((w >> 4) - 8).astype(jnp.bfloat16)  # rows 2k+1 of Wt
        acc_ref[:] += jax.lax.dot_general(
            xe_ref[:].astype(jnp.bfloat16), lo,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            xo_ref[:].astype(jnp.bfloat16), hi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(kk == n_k - 1)
        def _():
            out_ref[:] = acc_ref[:]

    half = tile // 2
    x_blk = pl.BlockSpec((1, half), lambda j, kk: (0, kk), memory_space=pltpu.VMEM)
    w_blk = pl.BlockSpec((half, tile), lambda j, kk: (kk, j), memory_space=pltpu.VMEM)
    o_blk = pl.BlockSpec((1, tile), lambda j, kk: (0, j), memory_space=pltpu.VMEM)

    mv = pl.pallas_call(
        kernel,
        grid=(n_j, n_k),
        in_specs=[x_blk, x_blk, w_blk],
        out_specs=o_blk,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, tile), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n, bytes_accessed=n * n // 2 + 3 * n * 4,
            transcendentals=0),
        interpret=interpret,
    )

    def pack(wt_int: np.ndarray) -> np.ndarray:
        """(n, n) int in [-8, 7] -> (n/2, n) uint8 (lo = even rows + 8)."""
        lo = (wt_int[0::2] + 8).astype(np.uint8)
        hi = (wt_int[1::2] + 8).astype(np.uint8)
        return (lo | (hi << 4)).astype(np.uint8)

    def matvec(xe, xo, wtp):
        return mv(xe.reshape(1, -1).astype(jnp.float32),
                  xo.reshape(1, -1).astype(jnp.float32), wtp)[0]

    return matvec, pack


# ---- correctness (any platform) -------------------------------------------
rng = np.random.default_rng(0)
n_c = 1024 if not INTERPRET else N
wt = rng.integers(-8, 8, size=(n_c, n_c)).astype(np.int32)
x = rng.integers(-127, 128, size=n_c).astype(np.int32)
mv_c, pack_c = make_i4pack_matvec(n_c, TILE if n_c % (2 * TILE) == 0 else 256,
                                  interpret=INTERPRET)
wtp_c = jnp.asarray(pack_c(wt))
got = np.asarray(mv_c(jnp.asarray(x[0::2]), jnp.asarray(x[1::2]), wtp_c))
want = x.astype(np.float64) @ wt.astype(np.float64)
np.testing.assert_allclose(got, want, rtol=0, atol=0)
lap(f"correctness OK at n={n_c} (exact)")
if INTERPRET:
    sys.exit(0)

# ---- throughput A/B on the chip -------------------------------------------
lap(f"backend: {jax.devices()}")
wt = rng.integers(-8, 8, size=(N, N)).astype(np.int32)
mv, pack = make_i4pack_matvec(N, TILE)
wtp = jnp.asarray(pack(wt))                    # (N/2, N) u8 = N*N/2 bytes
wq8 = jnp.asarray(wt.T.astype(np.int8))        # (N, N) int8 rows=outputs
x0 = jnp.asarray(rng.integers(-127, 128, size=N).astype(np.int8))


def requant(y):
    # carry feeds the next step: dynamic re-quantization like the real path
    s = jnp.maximum(jnp.max(jnp.abs(y)), 1e-30) / 127.0
    return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)


@jax.jit
def scan_i8(xq):
    def body(xq, _):
        y = jax.lax.dot_general(wq8, xq, dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32).astype(jnp.float32)
        return requant(y), ()
    xq, _ = jax.lax.scan(body, xq, None, length=K)
    return xq


@jax.jit
def scan_i4p(xq):
    def body(xq, _):
        y = mv(xq[0::2].astype(jnp.float32), xq[1::2].astype(jnp.float32), wtp)
        return requant(y), ()
    xq, _ = jax.lax.scan(body, xq, None, length=K)
    return xq


runs = {"int8-xla": scan_i8, "i4pack-pallas": scan_i4p}
xs = {k: x0 for k in runs}
for label, fn in runs.items():
    t0 = time.perf_counter()
    xs[label] = fn(xs[label])
    np.asarray(xs[label])  # host-fetch sync (block_until_ready lies on axon)
    lap(f"[{label}] warmup incl. compile: {time.perf_counter()-t0:.1f}s")

best = {k: np.inf for k in runs}
for r in range(REPS):
    for label, fn in runs.items():
        t0 = time.perf_counter()
        xs[label] = fn(xs[label])              # chained input: no dedup
        np.asarray(xs[label])
        el = (time.perf_counter() - t0) / K
        best[label] = min(best[label], el)
        lap(f"rep {r} [{label}]: {el*1e3:.3f} ms/step "
            f"({N*N/el/1e9:.0f} G elem/s)")

i8, i4 = best["int8-xla"], best["i4pack-pallas"]
bw8 = N * N / i8 / 1e9
bw4 = N * N / 2 / i4 / 1e9
lap(f"BEST int8 {i8*1e3:.3f} ms/step ({bw8:.0f} GB/s) | i4pack {i4*1e3:.3f} "
    f"ms/step ({bw4:.0f} GB/s HBM) -> speedup {i8/i4:.2f}x")
print(f'{{"N": {N}, "int8_ms": {i8*1e3:.3f}, "i4pack_ms": {i4*1e3:.3f}, '
      f'"speedup": {i8/i4:.2f}}}', flush=True)
