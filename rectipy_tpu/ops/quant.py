"""int8 quantized-training coupling (``coupling_dtype='int8_master'``).

Mixed-precision training one notch below bf16_master: the float32 master
coupling is symmetrically quantized per output row ONCE per scan -- the
deferred trajectories (ops/bptt.py, ops/graph_bptt.py) and the inference
scans (network._prep_params) evaluate ``prep`` explicitly before the scan,
because XLA's loop-invariant code motion does NOT reliably hoist the
requantization out of a scan body (measured +82% epoch time when left
inline).  The per-step matvec runs int8 x int8 on the MXU with int32
accumulation, and gradients flow straight-through (STE):

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
           "int8_master_matvec", "int8_master_ops",
           "quantize_rows_i4", "int4_master_matvec", "int4_master_ops"]


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


# int8 x int8 products accumulate in int32: the worst-case per-output sum is
# 127*127*n_in, so fan-in must stay below INT8_DOT_MAX_FAN_IN ~ 1.33e5 to be
# overflow-safe.  Dense couplings are checked loudly at lowering time
# (dsl/lower.py); block-sparse fan-in is bounded by cb*bs per construction.
INT8_DOT_MAX_FAN_IN = (2**31 - 1) // (127 * 127)  # 133144


def int8_dot(wq, xq):
    """(n_out, n_in) int8 @ (n_in,) int8 -> f32 (int32 accumulation; fan-in
    must be < INT8_DOT_MAX_FAN_IN to be overflow-safe in the worst case)."""
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


# -------------------------------------------------------------------- int4
# One notch below int8: weights quantized per output row to [-7, 7], the
# matvec runs int4 x int8 on the MXU with int32 accumulation, activations
# keep the int8 dynamic-scale STE.  NOMINALLY halves the per-step
# weight-stream bytes, but measured PERF-NEUTRAL on the current toolchain
# (0.83x vs int8 at N=10k, 1.01x at N=14k -- XLA:TPU does not exploit the
# packing; benchmarks/int4_inference.py): this is a numerics /
# quantization-robustness option, not a speed option.  Two representation
# rules:
#
#   * AT REST the quantized weights are stored as **int8 holding [-7, 7]**:
#     int4 arrays cannot cross jit/staging boundaries on the axon relay
#     client (RecursionError on transfer, measured), and an int8 carrier is
#     portable everywhere.
#   * The int8 -> int4 cast is loop-invariant weight prep, so it MUST run in
#     ``prep`` outside the scan body (the same LICM rule as the int8_master
#     requantization): the trajectories and network._prep_params evaluate it
#     once per program call.
#
# Overflow bound: 7 * 127 * fan_in < 2^31.
INT4_DOT_MAX_FAN_IN = (2**31 - 1) // (7 * 127)  # 2_415_617


def quantize_rows_i4(w):
    """Symmetric per-output-row quantization to [-7, 7], int8 carrier."""
    amax = jnp.max(jnp.abs(w), axis=1)
    scale = (jnp.maximum(amax, 1e-30) / 7.0).astype(jnp.float32)
    wq = jnp.clip(jnp.round(w / scale[:, None].astype(w.dtype)),
                  -7, 7).astype(jnp.int8)
    return wq, scale


def _i4_prep(w):
    """int4_master prep: f32 master -> (int4 weights, per-row scale)."""
    wq, scale = quantize_rows_i4(w)
    return wq.astype(jnp.int4), scale


def int4_dot(wq4, xq):
    """(n_out, n_in) int4 @ (n_in,) int8 -> f32 (int32 accumulation)."""
    return jax.lax.dot_general(
        wq4, xq, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)


def int4_dot_t(wq4, vq):
    """W_q^T @ v_q without materializing the transpose."""
    return jax.lax.dot_general(
        wq4, vq, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)


def _mv4_prepped(wp, src):
    wq4, ws = wp
    xq, xs = quant_vec(src)
    return (int4_dot(wq4, xq) * ws * xs).astype(src.dtype)


def _mv4_t_prepped(wp, delta):
    wq4, ws = wp
    v = ws.astype(delta.dtype) * delta
    vq, vs = quant_vec(v)
    return (int4_dot_t(wq4, vq) * vs).astype(delta.dtype)


def int4_master_ops():
    """(prep, mv, mv_t, grad_w) for the deferred-gradient trajectories --
    the int4 counterpart of :func:`int8_master_ops` (same STE scheme, same
    full-precision master gradient)."""
    return _i4_prep, _mv4_prepped, _mv4_t_prepped, _grad_w


@jax.custom_vjp
def int4_master_matvec(w, src):
    """STE quantized matvec for the plain autodiff path (int4 counterpart
    of :func:`int8_master_matvec`)."""
    return _mv4_prepped(_i4_prep(w), src)


def _i4m_fwd(w, src):
    return _mv4_prepped(_i4_prep(w), src), (w, src)


def _i4m_bwd(res, g):
    w, src = res
    dw = jnp.outer(g, src).astype(w.dtype)
    return dw, _mv4_t_prepped(_i4_prep(w), g)


int4_master_matvec.defvjp(_i4m_fwd, _i4m_bwd)

quantize_rows_i4_jit = jax.jit(quantize_rows_i4)


# ---------------------------------------------------------------- block-sparse


def quantize_blocks(blocks):
    """Symmetric per-output-row int8 quantization of a block-sparse master
    tensor ``(n_br, cb, bs, bs)``: each global output row (r, i) gets one
    scale over its cb*bs stored inputs."""
    amax = jnp.max(jnp.abs(blocks), axis=(1, 3))  # (n_br, bs)
    scale = (jnp.maximum(amax, 1e-30) / 127.0).astype(jnp.float32)
    bq = jnp.clip(jnp.round(blocks / scale[:, None, :, None].astype(blocks.dtype)),
                  -127, 127).astype(jnp.int8)
    return bq, scale


# module-level jitted wrappers: dsl/lower.py quantizes each master ON DEVICE
# at network build time; a fresh jax.jit per build would retrace+recompile
# the quantization program for every Network (remote compiles run 4-472 s
# under congestion).  One wrapper per function = one compile per shape.
quantize_rows_jit = jax.jit(quantize_rows)
quantize_blocks_jit = jax.jit(quantize_blocks)


def block_int8_mv(wp, cols, src):
    """Forward block contraction from the prepped ``(bq, scale)`` pair:
    gather int8 source blocks, int8 x int8 einsum with int32 accumulation,
    per-row rescale.  Same math as the frozen-int8 block path in
    dsl/lower.py."""
    bq, scale = wp
    n_br, cb, bs, _ = bq.shape
    xq, xs = quant_vec(src)
    s_blk = xq.reshape(-1, bs)[cols]  # (n_br, cb, bs) int8
    acc = jnp.einsum("rcij,rcj->ri", bq, s_blk,
                     preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale * xs
    return out.reshape(n_br * bs).astype(src.dtype)


def _onehot_col_matrix(cols_np):
    """One-hot column-block membership matrix M of shape (n_br*cb, n_br):
    M[r*cb + slot, cols[r, slot]] = 1.  Turns the backward scatter-add over
    column blocks into a single MXU matmul (scatter is serialized on TPU;
    a matmul against a constant one-hot streams at full bandwidth)."""
    import numpy as onp

    n_br, cb = cols_np.shape
    M = onp.zeros((n_br * cb, n_br), dtype=onp.float32)
    M[onp.arange(n_br * cb), onp.asarray(cols_np).ravel()] = 1.0
    return jnp.asarray(M)


def _transposed_block_table(cols_np):
    """Transposed block structure for the gather backward: for each column
    block c, the (row-block, slot) pairs with cols[r, slot] == c, padded to
    the max in-degree.  Built lazily (gather mode only)."""
    import numpy as onp

    n_br, cb = cols_np.shape
    lists = [[] for _ in range(n_br)]  # square coupling
    for r in range(n_br):
        for j in range(cb):
            lists[int(cols_np[r, j])].append((r, j))
    cb_t = max(1, max(len(l) for l in lists))
    rows_T = onp.zeros((n_br, cb_t), dtype=onp.int32)
    slot_T = onp.zeros((n_br, cb_t), dtype=onp.int32)
    mask_T = onp.zeros((n_br, cb_t), dtype=onp.float32)
    for c, pairs in enumerate(lists):
        for k, (r, j) in enumerate(pairs):
            rows_T[c, k], slot_T[c, k], mask_T[c, k] = r, j, 1.0
    return jnp.asarray(rows_T), jnp.asarray(slot_T), jnp.asarray(mask_T)


def make_block_int8_ops(cols_np):
    """(prep, mv, mv_t, grad_w) for int8_master block-sparse couplings.
    ``cols_np`` must be CONCRETE (numpy) block structure.

    NOTE: RECTIPY_SPARSE_BWD is read HERE, at build time, and baked into the
    returned closures (same for ops/bptt._make_sparse_matvec) -- changing the
    env var after a trajectory/network is built has no effect on it."""
    import numpy as onp

    cols_np = onp.asarray(cols_np)
    n_br, cb = cols_np.shape
    cols = jnp.asarray(cols_np, dtype=jnp.int32)

    def mv(wp, src):
        return block_int8_mv(wp, cols, src)

    import os

    bwd_mode = os.environ.get("RECTIPY_SPARSE_BWD", "scatter")
    rows_T = slot_T = mask_T = M_onehot = None
    if bwd_mode == "gather":
        rows_T, slot_T, mask_T = _transposed_block_table(cols_np)
    elif bwd_mode == "onehot":
        M_onehot = _onehot_col_matrix(cols_np)

    def mv_t(wp, delta):
        """A^T @ delta: per-row scales fold into delta BEFORE the dynamic
        quantization.  'scatter' (default): int8 contraction in forward tile
        layout, small f32 scatter-add (one pass over the tiles -- the gather
        variant copies the whole tile tensor per step, 5x slower at N=100k,
        same finding as the bf16 path in ops/bptt.py).  'onehot': same
        contraction, but the column-block reduction is a matmul against the
        constant one-hot membership matrix instead of a scatter-add."""
        bq, scale = wp
        n_br_, cb_, bs, _ = bq.shape
        d_blk = delta.reshape(n_br_, bs)
        v = scale.astype(delta.dtype) * d_blk
        vq, vs = quant_vec(v)
        if bwd_mode != "gather":
            vq_blk = vq.reshape(n_br_, bs)
            contrib = jnp.einsum("rcij,ri->rcj", bq, vq_blk,
                                 preferred_element_type=jnp.int32)
            if bwd_mode == "onehot":
                out = jnp.einsum("kj,kq->qj",
                                 contrib.reshape(n_br_ * cb_, bs).astype(jnp.float32),
                                 M_onehot)
            else:
                out = jnp.zeros((n_br_, bs), dtype=jnp.float32).at[cols].add(
                    contrib.astype(jnp.float32))
            return (out * vs).reshape(-1).astype(delta.dtype)
        G = bq[rows_T, slot_T]                    # (n_bc, cb_t, bs, bs) int8
        D = vq[rows_T] * mask_T[..., None].astype(jnp.int8)
        acc = jnp.einsum("qcij,qci->qj", G, D,
                         preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * vs).reshape(-1).astype(delta.dtype)

    def grad_w(deltas, srcs):
        """dA[r, c] = sum_t delta_t[row r] (.) src_t[cols[r, c]] in f32 --
        the master gradient is never quantized (STE)."""
        T = deltas.shape[0]
        bs = deltas.shape[1] // n_br
        d_blk = deltas.reshape(T, n_br, bs).astype(jnp.float32)
        s_blk = srcs.reshape(T, -1, bs)[:, cols].astype(jnp.float32)
        return jnp.einsum("tri,trcj->rcij", d_blk, s_blk,
                          preferred_element_type=jnp.float32)

    return quantize_blocks, mv, mv_t, grad_w


def make_block_int8_master_matvec(cols_np):
    """STE quantized block-sparse matvec for the plain autodiff path (the
    deferred trajectories use make_block_int8_ops directly and prep once per
    scan).  ``cols_np`` must be concrete structure."""
    prep, mv, mv_t, grad_w = make_block_int8_ops(cols_np)

    @jax.custom_vjp
    def f(blocks, src):
        return mv(prep(blocks), src)

    def fwd(blocks, src):
        return mv(prep(blocks), src), (blocks, src)

    def bwd(res, g):
        blocks, src = res
        wp = prep(blocks)
        dblocks = grad_w(g[None, :], src[None, :])  # single-step contraction
        return dblocks.astype(blocks.dtype), mv_t(wp, g)

    f.defvjp(fwd, bwd)
    return f


def make_block_int8_stack_ops():
    """(prep, mv, mv_t, grad_w) for int8_master contractions on an
    ALREADY-GATHERED ``(n_br, cb, bs)`` source stack -- the
    :class:`~rectipy_tpu.edges.BlockSparseLinear` EDGE form, where the
    producer resolves per-block conduction delays from the history buffer
    BEFORE the contraction (ops/graph_bptt._block_edge_stage).  Same math
    as :func:`make_block_int8_ops` minus the source gather: per-output-row
    weight scales, one dynamic activation scale per step (stop-gradiented,
    so the contraction stays exactly linear in the sources under STE), f32
    master gradients (never quantized)."""

    def mv(wp, s_blk):
        bq, scale = wp
        n_br, cb, bs, _ = bq.shape
        xq, xs = quant_vec(s_blk)
        acc = jnp.einsum("rcij,rcj->ri", bq, xq,
                         preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * scale * xs).reshape(n_br * bs)

    def mv_t(wp, delta):
        """W^T @ delta in GATHERED form: per-row scales fold into delta
        before the dynamic quantization; the producer's own VJP scatters
        the (n_br, cb, bs) result back into the history buffer."""
        bq, scale = wp
        n_br, cb, bs, _ = bq.shape
        d_blk = delta.reshape(n_br, bs)
        v = scale * d_blk.astype(jnp.float32)
        vq, vs = quant_vec(v)
        contrib = jnp.einsum("rcij,ri->rcj", bq, vq,
                             preferred_element_type=jnp.int32)
        return contrib.astype(jnp.float32) * vs

    def grad_w(deltas, srcs):
        """dW[r, c] = sum_t delta_t[row r] (.) src_t[r, c] in f32 (STE)."""
        T, n_br = deltas.shape[0], srcs.shape[1]
        d_blk = deltas.reshape(T, n_br, -1).astype(jnp.float32)
        return jnp.einsum("tri,trcj->rcij", d_blk, srcs.astype(jnp.float32),
                          preferred_element_type=jnp.float32)

    return quantize_blocks, mv, mv_t, grad_w


def make_block_int8_stack_apply():
    """STE-wrapped single-step apply for the gathered-stack form: the
    plain-autodiff edge step quantizes the master IN-STEP (correctness
    first; the deferred graph trajectory hoists the quantization into its
    once-per-scan prep and is the fast path)."""
    prep, mv, mv_t, grad_w = make_block_int8_stack_ops()

    @jax.custom_vjp
    def f(blocks, s_blk):
        return mv(prep(blocks), s_blk)

    def fwd(blocks, s_blk):
        return mv(prep(blocks), s_blk), (blocks, s_blk)

    def bwd(res, g):
        blocks, s_blk = res
        wp = prep(blocks)
        dblocks = grad_w(g[None, :], s_blk[None])
        return dblocks.astype(blocks.dtype), mv_t(wp, g).astype(s_blk.dtype)

    f.defvjp(fwd, bwd)
    return f
