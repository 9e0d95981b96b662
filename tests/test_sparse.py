"""Block-sparse coupling (ops/sparse.py): generator invariants, matvec vs
dense oracle, Network trajectory parity vs the densified matrix, and
multi-device sharding equality -- the correctness basis for the N=100k
stretch config (BASELINE.json configs[4]) where the dense matrix cannot
exist (40 GB f32 vs 16 GB v5e HBM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network
from rectipy_tpu.ops.sparse import (BlockSparseCoupling, block_random_connectivity,
                                    block_sparse_matvec)

QIF = "rectipy_tpu.models.spiking_neurons.qif.qif_sfa"


def test_generator_invariants():
    n, fan_in, bs = 256, 24, 32
    A = block_random_connectivity(n, n, fan_in, block_size=bs, seed=3)
    W = A.to_dense()
    assert W.shape == (n, n)
    nnz = (W != 0).sum(axis=1)
    np.testing.assert_array_equal(nnz, fan_in)           # exact fan-in per row
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-6)  # row-normalized
    # every block-row restricted to its chosen source blocks
    for r in range(n // bs):
        used = {int(c) for c in np.nonzero(W[r * bs:(r + 1) * bs].any(axis=0))[0] // bs}
        assert used <= set(int(c) for c in A.cols[r])


def test_generator_backends_share_contract():
    # the C++ Floyd sampler (native/connectivity.cpp sample_block_fanin) and
    # the numpy argsort construction draw different samples but must satisfy
    # the same contract: exact fan-in, row normalization, block-local sources,
    # per-seed determinism.
    n, fan_in, bs = 256, 24, 32
    A_auto = block_random_connectivity(n, n, fan_in, block_size=bs, seed=9)
    A_np = block_random_connectivity(n, n, fan_in, block_size=bs, seed=9,
                                     backend="numpy")
    np.testing.assert_array_equal(A_auto.cols, A_np.cols)  # cols sampling shared
    for A in (A_auto, A_np):
        W = A.to_dense()
        np.testing.assert_array_equal((W != 0).sum(axis=1), fan_in)
        np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-6)
    again = block_random_connectivity(n, n, fan_in, block_size=bs, seed=9)
    np.testing.assert_array_equal(A_auto.blocks, again.blocks)
    other = block_random_connectivity(n, n, fan_in, block_size=bs, seed=10)
    assert not np.array_equal(A_auto.blocks, other.blocks)


def test_matvec_matches_dense():
    n, fan_in, bs = 192, 17, 32
    rng = np.random.default_rng(0)
    A = block_random_connectivity(n, n, fan_in, block_size=bs, seed=1)
    s = rng.normal(size=n).astype(np.float32)
    ours = np.asarray(block_sparse_matvec(jnp.asarray(A.blocks), jnp.asarray(A.cols),
                                          jnp.asarray(s)))
    ref = A.to_dense() @ s
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def _build_qif(weights, n, dtype=jnp.float64, coupling_dtype=None):
    etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, n + 1) - n - 1) / (n + 1))
    net = Network(1e-3, dtype=dtype)
    net.add_diffeq_node("qif", QIF, weights=weights, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_sfa_op",
                        spike_var="spike", spike_def="v",
                        spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_sfa_op/eta": etas,
                                   "all/qif_sfa_op/alpha": 0.05,
                                   "all/qif_sfa_op/k": 15.0},
                        coupling_dtype=coupling_dtype)
    return net


def test_network_trajectory_matches_densified():
    """A Network built with BlockSparseCoupling weights integrates the exact
    same dynamics as one built with the densified matrix (float64)."""
    n, fan_in, bs = 128, 12, 32
    A = block_random_connectivity(n, n, fan_in, block_size=bs, seed=2)
    T = 400
    inp = np.zeros((T, n))
    inp[T // 4:, :] = 3.0
    o_sparse = _build_qif(A, n).run(inp, sampling_steps=10,
                                    verbose=False).to_numpy("out")
    o_dense = _build_qif(A.to_dense().astype(np.float64), n).run(
        inp, sampling_steps=10, verbose=False).to_numpy("out")
    assert o_sparse.max() > 0, "no activity -> test is vacuous"
    np.testing.assert_allclose(o_sparse, o_dense, rtol=1e-9, atol=1e-12)


def test_sparse_sharded_run_matches_single_device():
    """Row-sharded block-sparse coupling over the 8-device CPU mesh produces
    the single-device trajectory (GSPMD gathers the source blocks)."""
    from rectipy_tpu.parallel import make_mesh, shard_network_arrays, sharded_run

    n, fan_in, bs = 256, 12, 32  # n_br = 8 -> one block-row per device
    A = block_random_connectivity(n, n, fan_in, block_size=bs, seed=4)
    T = 60
    inp = jnp.asarray(np.full((T, n), 2.0))

    net = _build_qif(A, n, dtype=jnp.float32)
    net.compile()
    state0 = net.init_state()
    params = net.parameters_pytree()
    run = sharded_run(net, make_mesh(len(jax.devices()), data=1))

    _, outs_single = run(state0, params, inp)

    mesh = make_mesh(len(jax.devices()), data=1)
    state_sh = shard_network_arrays(state0, n, mesh)
    params_sh = shard_network_arrays(params, n, mesh)
    blocks = params_sh["nodes"]["qif"]["weights"]
    assert blocks.sharding.spec[0] == "model", f"blocks not row-sharded: {blocks.sharding}"
    _, outs_sh = run(state_sh, params_sh, inp)
    np.testing.assert_allclose(np.asarray(outs_sh), np.asarray(outs_single),
                               rtol=1e-6, atol=1e-6)


def test_sparse_refuses_fused_kernel():
    n, bs = 128, 32
    A = block_random_connectivity(n, n, 8, block_size=bs, seed=5)
    net = _build_qif(A, n, dtype=jnp.float32)
    net.compile()
    from rectipy_tpu.ops.generic_fused import attach_generic_fused_step

    with pytest.raises(ValueError):
        attach_generic_fused_step(net.get_node("qif"), interpret=True)


def test_sparse_int8_matches_f32_dynamics():
    """int8 block-sparse coupling (per-output-row scales, dynamic activation
    scale, int32 accumulation): spiking dynamics track the f32 sparse run."""
    n, bs = 128, 32
    A = block_random_connectivity(n, n, 12, block_size=bs, seed=8)
    T = 800
    inp = np.full((T, n), 5.0, dtype=np.float32)
    o32 = _build_qif(A, n, dtype=jnp.float32).run(
        inp, sampling_steps=10, verbose=False).to_numpy("out")
    net8 = _build_qif(A, n, dtype=jnp.float32, coupling_dtype="int8")
    node = net8.get_node("qif")
    assert node["weights"].dtype == jnp.int8 and node["weights"].ndim == 4
    o8 = net8.run(inp, sampling_steps=10, verbose=False).to_numpy("out")
    assert o32.max() > 0
    corr = np.corrcoef(o32.ravel(), o8.ravel())[0, 1]
    assert corr > 0.999, f"int8 sparse trajectory diverged: corr={corr}"
    # training through int8-quantized coupling stays refused (STE is
    # inference-only), exactly as on the dense int8 path
    net_t = Network(1e-3, dtype=jnp.float32)
    with pytest.raises(ValueError):
        net_t.add_diffeq_node("qif", QIF, weights=A, source_var="s",
                              target_var="s_in", input_var="I_ext", output_var="s",
                              op="qif_sfa_op", spike_var="spike", spike_def="v",
                              coupling_dtype="int8", train_params=["weights"])


def test_sparse_bf16_master_casts_matvec():
    """coupling_dtype='bfloat16_master' keeps f32 blocks but the trajectory
    reflects bf16 matvec rounding (differs from f32, tracks it closely)."""
    n, bs = 128, 32
    A = block_random_connectivity(n, n, 12, block_size=bs, seed=6)
    T = 800
    inp = np.full((T, n), 5.0, dtype=np.float32)
    o32 = _build_qif(A, n, dtype=jnp.float32).run(
        inp, sampling_steps=10, verbose=False).to_numpy("out")
    net16 = _build_qif(A, n, dtype=jnp.float32, coupling_dtype="bfloat16_master")
    # master copy stays at full precision (node default; bf16 is cast per use)
    assert net16.get_node("qif")["weights"].dtype != jnp.bfloat16
    o16 = net16.run(inp, sampling_steps=10, verbose=False).to_numpy("out")
    assert o32.max() > 0
    corr = np.corrcoef(o32.ravel(), o16.ravel())[0, 1]
    assert corr > 0.999, f"bf16 sparse trajectory diverged: corr={corr}"


@pytest.mark.parametrize("mode", ["scatter", "gather", "onehot"])
def test_transposed_matvec_modes_match_dense(mode, monkeypatch):
    """All RECTIPY_SPARSE_BWD modes of the transposed block contraction
    (A^T @ delta) must match the densified oracle, for both the bf16/f32
    path (ops/bptt._make_sparse_matvec) and the int8_master path
    (ops/quant.make_block_int8_ops).  The env var is read at BUILD time."""
    monkeypatch.setenv("RECTIPY_SPARSE_BWD", mode)
    n, fan_in, bs = 128, 24, 16
    A = block_random_connectivity(n, n, fan_in, block_size=bs, seed=5)
    Wd = A.to_dense().astype(np.float64)
    rng = np.random.default_rng(6)
    delta = rng.normal(size=n)
    oracle = Wd.T @ delta

    from rectipy_tpu.ops.bptt import _make_sparse_matvec

    cols = jnp.asarray(A.cols, dtype=jnp.int32)
    mv_t = _make_sparse_matvec(None, cols)[2]
    got = np.asarray(mv_t(jnp.asarray(A.blocks, dtype=jnp.float64),
                          jnp.asarray(delta)))
    # the block contraction accumulates in f32 by design
    # (preferred_element_type), so the oracle comparison is f32-tight
    np.testing.assert_allclose(got, oracle, rtol=3e-5, atol=1e-7)

    from rectipy_tpu.ops.quant import make_block_int8_ops, quantize_blocks

    prep, mv, mv_t_q, grad_w = make_block_int8_ops(np.asarray(A.cols))
    wp = quantize_blocks(jnp.asarray(A.blocks, dtype=jnp.float32))
    got_q = np.asarray(mv_t_q(wp, jnp.asarray(delta, dtype=jnp.float32)))
    # int8 path: compare against the dequantized dense oracle (quantization
    # error dominates; the MODE must not add error beyond f32 ordering)
    bq, scale = wp
    n_br = A.cols.shape[0]
    Wq = np.zeros((n, n), dtype=np.float64)
    for r in range(n_br):
        for j, c in enumerate(np.asarray(A.cols)[r]):
            Wq[r*bs:(r+1)*bs, c*bs:(c+1)*bs] += (
                np.asarray(bq)[r, j].astype(np.float64)
                * np.asarray(scale)[r][:, None])
    from rectipy_tpu.ops.quant import quant_vec
    v = np.asarray(scale).reshape(n_br, bs) * delta.reshape(n_br, bs)
    vq, vs = quant_vec(jnp.asarray(v.reshape(-1), dtype=jnp.float32))
    # reconstruct the exact quantized oracle: sum_r bq[r]^T vq[r] * vs
    Bq = np.zeros((n, n))
    for r in range(n_br):
        for j, c in enumerate(np.asarray(A.cols)[r]):
            Bq[r*bs:(r+1)*bs, c*bs:(c+1)*bs] += np.asarray(bq)[r, j].astype(np.float64)
    oracle_q = (Bq.T @ np.asarray(vq).astype(np.float64)) * float(vs)
    np.testing.assert_allclose(got_q, oracle_q, rtol=1e-5, atol=1e-5)


def test_block_edge_int8_master_frozen_prep_equals_ste_step():
    """int8_master block edge: the FROZEN prep-quantized fast path (train=
    None, quantization hoisted once per call) produces the identical
    trajectory to the trainable edge's in-step STE apply -- both quantize
    the same master the same way."""
    import numpy as np
    import jax.numpy as jnp

    from rectipy_tpu import FeedbackNetwork
    from rectipy_tpu.ops.sparse import block_random_connectivity

    N, BS, T = 64, 16, 300
    QIF = "neuron_model_templates.spiking_neurons.qif.qif"

    def build(train):
        A = block_random_connectivity(N, N, 8, block_size=BS, seed=3)
        rng = np.random.default_rng(1)
        net = FeedbackNetwork(1e-3)
        net.add_func_node("inp", 1, activation_function="identity")
        net.add_diffeq_node(
            "qif", QIF, n=N, input_var="I_ext", output_var="s",
            spike_var="spike", spike_def="v", op="qif_op",
            spike_threshold=1e2, spike_reset=-1e2,
            node_vars={"all/qif_op/eta":
                       800.0 + 100.0 * rng.standard_normal(N)})
        net.add_edge("inp", "qif", weights=np.random.default_rng(7)
                     .normal(size=(N, 1)).astype(np.float32))
        net.add_edge("qif", "qif", weights=A, feedback=True, train=train,
                     block_dtype="int8_master")
        net.compile()
        return net

    ins = np.zeros((T, 1), dtype=np.float32)
    ins[T // 4:, 0] = 3.0
    out_frozen = build(None).run(ins, verbose=False).to_numpy("out")
    out_train = build("gd").run(ins, verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_train, out_frozen, rtol=1e-6, atol=1e-8)
    assert np.abs(out_frozen).max() > 0
