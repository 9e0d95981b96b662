"""int8 quantized-training coupling (``coupling_dtype='int8_master'``).

Mixed-precision training one notch below bf16_master: the float32 master
coupling is symmetrically quantized per output row ONCE per training step
(the quantization depends only on the loop-invariant master weights, so XLA
hoists it out of the time scan), the per-step matvec runs int8 x int8 on the
MXU with int32 accumulation, and gradients flow straight-through (STE):

    forward   out = (scale . (W_q @ q(src))) * s_src        ~  W @ src
    backward  dsrc = W_q^T (scale . delta) * s_delta        ~  W^T @ delta
              dW   = Delta^T @ Src (f32, deferred to one post-scan matmul
                     by ops/bptt.py; per-step outer product on the plain
                     autodiff path)

HBM traffic per scan step drops to ONE int8 pass over W forward and one
backward -- half of bf16_master, 4x less than f32.  The activation scales
are dynamic (one O(N) reduction per matvec, stop-gradient so the STE stays
exact-linear).  Spiking dynamics under int8 coupling were measured at
corr > 0.999 vs f32 at N=10k (PARITY.md); training quality is validated in
tests/test_bptt_fast.py::test_int8_master_* (loss curves track bf16_master).

Reference has no quantized-training analog; this exists to push the trained
neuron-updates/s headline past the bf16 HBM roofline (BASELINE.md metric).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_rows", "quant_vec", "int8_dot", "int8_dot_t",
           "int8_master_matvec", "int8_master_ops"]


def quantize_rows(w):
    """Symmetric per-output-row int8 quantization of a float master matrix."""
    amax = jnp.max(jnp.abs(w), axis=1)
    scale = (jnp.maximum(amax, 1e-30) / 127.0).astype(jnp.float32)
    wq = jnp.clip(jnp.round(w / scale[:, None].astype(w.dtype)),
                  -127, 127).astype(jnp.int8)
    return wq, scale


def quant_vec(x):
    """Dynamic symmetric quantization of an activation vector; the scale is
    stop-gradiented so the quantized matvec stays exactly linear in ``x``
    under STE."""
    s = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(x)), 1e-30) / 127.0).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x / s.astype(x.dtype)), -127, 127).astype(jnp.int8)
    return xq, s


def int8_dot(wq, xq):
    """(n_out, n_in) int8 @ (n_in,) int8 -> f32 (int32 accumulation)."""
    return jax.lax.dot_general(
        wq, xq, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)


def int8_dot_t(wq, vq):
    """W_q^T @ v_q without materializing the transpose."""
    return jax.lax.dot_general(
        wq, vq, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)


def _mv_prepped(wp, src):
    wq, ws = wp
    xq, xs = quant_vec(src)
    return (int8_dot(wq, xq) * ws * xs).astype(src.dtype)


def _mv_t_prepped(wp, delta):
    """W^T @ delta = W_q^T (scale . delta), delta row-scaled BEFORE dynamic
    quantization so one scalar activation scale suffices."""
    wq, ws = wp
    v = ws.astype(delta.dtype) * delta
    vq, vs = quant_vec(v)
    return (int8_dot_t(wq, vq) * vs).astype(delta.dtype)


def _mv(w, src):
    return _mv_prepped(quantize_rows(w), src)


def _mv_t(w, delta):
    return _mv_t_prepped(quantize_rows(w), delta)


def _grad_w(deltas, srcs):
    """dW = Delta^T @ Src in f32 (the master-weight gradient is NOT
    quantized -- STE passes it through at full precision)."""
    return jax.lax.dot_general(
        deltas.astype(jnp.float32), srcs.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def int8_master_ops():
    """(prep, mv, mv_t, grad_w) for the deferred-gradient trajectories.
    ``prep`` quantizes the master ONCE before each scan (the trajectories
    call it outside the scan body -- XLA's loop-invariant code motion does
    NOT reliably hoist the requantization, measured +82% epoch time when
    left inside); ``mv``/``mv_t`` take the prepped ``(wq, scale)`` pair."""
    return quantize_rows, _mv_prepped, _mv_t_prepped, _grad_w


@jax.custom_vjp
def int8_master_matvec(w, src):
    """STE quantized matvec for the plain autodiff path: forward int8,
    backward quantized W^T for dsrc and full-precision outer product for the
    master-weight gradient (same numerics as the deferred path's triple)."""
    return _mv(w, src)


def _imm_fwd(w, src):
    return _mv(w, src), (w, src)


def _imm_bwd(res, g):
    w, src = res
    dw = jnp.outer(g, src).astype(w.dtype)
    return dw, _mv_t(w, g)


int8_master_matvec.defvjp(_imm_fwd, _imm_bwd)
