"""Fused Adam + int8 requantization for the quantized-master training path.

EXPERIMENTAL and OFF BY DEFAULT -- kept because the kernel is correct and
the negative result is instructive.  The design-time premise was that the
epoch's optimizer tail (optax adam on the (N, N) master + next epoch's
quantize_rows) streamed the arrays through multiple kernels at ~320 GB/s
(~12.8 ms of a 92.9 ms N=10k epoch).  On-chip measurement (v5e,
2026-08-18; benchmarks/ab_fused_adam.py + the chained-input tail probe)
showed that premise was a profiling artifact of SEPARATE dispatches:
inside the chunk-scan epoch program XLA already fuses the adam formulas
with the following quantize_rows -- the split tail is 7.62 ms in one jit
vs 7.14 ms for this Pallas kernel (both ~390-410 GB/s; the 3.5 ms
bytes/820 GB/s floor is not reachable for this access pattern on this
chip).  End-to-end, threading (wq, scale) through the optimizer-state
carry costs ~1.4 ms/epoch and embedding the Pallas call in the big
program another ~5 ms, so the fused epoch measures SLOWER than the split
schedule (pallas 99.1 ms, xla-fused 94.0 ms vs split 92.5 ms, paired
round-robin A/B).  Enable explicitly with RECTIPY_FUSED_ADAM=pallas|xla.

This module fuses the whole tail into ONE pass over the arrays:

    mu'  = b1*mu + (1-b1)*g
    nu'  = b2*nu + (1-b2)*g^2
    W'   = W - lr * (mu'/bc1) / (sqrt(nu'/bc2) + eps)     # optax.adam exactly
    amax = max(|W'|, axis=1)
    scale = max(amax, 1e-30) / 127                        # quantize_rows exactly
    wq   = clip(round(W'/scale), -127, 127).astype(int8)

reading (W, mu, nu, g) and writing (W', mu', nu', wq, scale) once each:
~2.9 GB of traffic at N=10k instead of the ~4.6 GB the split schedule moves.
The Pallas kernel streams row blocks (each block holds FULL rows so the
row-max reduction is single-pass); `adam_requant_xla` is the numerically
identical jnp fallback used on CPU and as the parity oracle.

The training-loop integration (network._build_epoch_programs) threads the
produced ``(wq, scale)`` pair into the NEXT epoch's trajectory via the
optimizer-state carry, so the per-epoch `quantize_rows` prep disappears from
the epoch program entirely -- epoch t+1 consumes the quantization epoch t's
update already paid for.  Bit-identical to the unfused sequence: the same
master produces the same (wq, scale) either way.

Reference training semantics: /root/reference/rectipy/network.py:603-707
(torch.optim.Adam step per epoch); the quantized-master scheme itself has no
reference analog (torch trains in f32).
"""

from __future__ import annotations

import functools
import os
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["adam_requant", "adam_requant_xla", "adam_leaf", "FUSED_ADAM_MODE"]

# module default when neither the call site nor the environment picks a mode:
# 'auto' = Pallas on TPU, jnp elsewhere.  adam_requant re-reads
# RECTIPY_FUSED_ADAM LIVE on every call (trace), so flipping the env var
# mid-session changes dispatch; the 'off' gate is honored by
# network.fit_bptt (which also keys its program cache on the mode).
FUSED_ADAM_MODE = "auto"


def adam_leaf(w, m, v, g, bc1, bc2, lr, b1, b2, eps):
    """One optax.adam step on a single leaf (exact formula parity with
    optax.scale_by_adam + scale_by_learning_rate): returns (w', m', v')."""
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * (g * g)
    mh = m / bc1
    vh = v / bc2
    return w - lr * mh / (jnp.sqrt(vh) + eps), m, v


def adam_requant_xla(w, m, v, g, bc1, bc2, lr, *, b1, b2, eps):
    """jnp reference: adam step on the f32 master + per-row int8
    requantization of the result.  Calls ops.quant.quantize_rows itself so
    the fused training path can never drift from the quantization the
    trajectory prep and inference prep use."""
    from .quant import quantize_rows

    w, m, v = adam_leaf(w, m, v, g, bc1, bc2, lr, b1, b2, eps)
    wq, scale = quantize_rows(w)
    return w, m, v, wq, scale


def _kernel(s_ref, w_ref, m_ref, v_ref, g_ref,
            w_out, m_out, v_out, wq_out, sc_out, *, b1, b2, eps):
    # s_ref: (1, 3) SMEM scalars [bc1, bc2, lr]; everything else: one
    # (BR, N) row block per array -- full rows, so the per-row max is a
    # single in-register reduction
    bc1 = s_ref[0, 0]
    bc2 = s_ref[0, 1]
    lr = s_ref[0, 2]
    g = g_ref[...]
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * (g * g)
    w = w_ref[...] - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    m_out[...] = m
    v_out[...] = v
    w_out[...] = w
    amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)      # (BR, 1)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    sc_out[...] = scale
    wq_out[...] = jnp.clip(jnp.round(w / scale), -127.0, 127.0).astype(jnp.int8)


def _build_pallas(n_rows: int, n_cols: int, dtype, *, b1, b2, eps,
                  block_rows: int | None = None):
    # full rows per block: at N=10k a (BR, N) f32 block is BR*40 KB and the
    # kernel keeps ~7 of them live; Mosaic's default scoped-VMEM budget is
    # 16 MB, so BR=16 (~9 MB live, 625 grid steps) is the sweet spot --
    # larger blocks OOM the scoped allocator, smaller ones don't stream
    # faster (measured)
    if block_rows is None:
        block_rows = int(os.environ.get("RECTIPY_FUSED_ADAM_BR", "16"))
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    br = min(block_rows, n_rows)
    grid = (-(-n_rows // br),)

    def row_blk(dt):
        return pl.BlockSpec((br, n_cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM), dt

    specs = [row_blk(dtype) for _ in range(4)]
    call = pl.pallas_call(
        partial(_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [s for s, _ in specs],
        out_specs=[specs[0][0], specs[1][0], specs[2][0],
                   pl.BlockSpec((br, n_cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((br, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
            jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
            jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
            jax.ShapeDtypeStruct((n_rows, n_cols), jnp.int8),
            jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
        ],
    )

    def run(w, m, v, g, bc1, bc2, lr):
        s = jnp.stack([bc1, bc2, lr]).astype(jnp.float32)[None, :]
        w, m, v, wq, sc = call(s, w, m, v, g)
        return w, m, v, wq, sc[:, 0]
    return run


@functools.lru_cache(maxsize=None)
def _pallas_shape_ok(n_rows: int, n_cols: int, dtype_str: str) -> bool:
    """One eager probe per (shape, dtype) per process: build and RUN the
    kernel on zeros.  'auto' mode falls back to the jnp path when Mosaic
    rejects the kernel (compile error, scoped-VMEM OOM at this shape, …)
    instead of crashing the enclosing training program -- a benchmark or a
    user fit must never die to an optional fast path."""
    try:
        dtype = jnp.dtype(dtype_str)
        run = _build_pallas(n_rows, n_cols, dtype, b1=0.9, b2=0.999, eps=1e-8)
        z = jnp.zeros((n_rows, n_cols), dtype)
        out = run(z, z, z, z, jnp.float32(1.0), jnp.float32(1.0),
                  jnp.float32(0.0))
        jax.block_until_ready(out)
        return True
    except Exception:
        return False


def adam_requant(w, m, v, g, bc1, bc2, lr, *, b1, b2, eps, mode=None):
    """Dispatch: the Pallas single-pass kernel on TPU, the jnp reference
    elsewhere (or when the mode is 'xla').  Same outputs either way:
    ``(w', m', v', wq, scale)`` with ``scale`` shaped ``(n_rows,)``.

    ``mode`` resolution: explicit argument (the training-path caller threads
    its cache-keyed mode through) > live ``RECTIPY_FUSED_ADAM`` env var >
    module default ``FUSED_ADAM_MODE``."""
    if mode is None:
        mode = os.environ.get("RECTIPY_FUSED_ADAM", FUSED_ADAM_MODE)
    use_pallas = mode in ("auto", "pallas")
    if use_pallas and mode == "auto":
        try:
            on_tpu = jax.default_backend() not in ("cpu",)
        except Exception:  # pragma: no cover - backend probing never raises
            on_tpu = False
        use_pallas = on_tpu and _pallas_shape_ok(
            int(w.shape[0]), int(w.shape[1]), str(w.dtype))
    if use_pallas:
        try:
            run = _build_pallas(w.shape[0], w.shape[1], w.dtype,
                                b1=b1, b2=b2, eps=eps)
            return run(w, m, v, g, jnp.asarray(bc1), jnp.asarray(bc2),
                       jnp.asarray(lr))
        except Exception:
            if mode == "pallas":
                raise
    return adam_requant_xla(w, m, v, g, bc1, bc2, lr, b1=b1, b2=b2, eps=eps)
