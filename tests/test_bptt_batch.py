"""Batched-trial BPTT (Network.fit_bptt_batch): minibatch ensemble training
with vmapped trajectories.  No reference analog (the reference's epoch mode
trains one trial per update, /root/reference/rectipy/network.py:603-707) --
correctness is pinned by EXACT equivalences against the trusted epoch-mode
sequences and plain autodiff at f64."""

import contextlib
import io

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
QIF = "neuron_model_templates.spiking_neurons.qif.qif"


def _chain_net(W0):
    net = Network(dt=1e-2)
    net.add_diffeq_node("p", TANH, weights=W0.copy(), source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="tanh_op/r", float_precision="float64",
                        train_params=["weights"])
    return net


def _trials(rng, B=4, T=30, n=6):
    return (rng.normal(size=(B, T, 1)), rng.normal(size=(B, T, n)) * 0.1)


def test_batch_b1_equals_repeated_epochs():
    """A single-trial full batch over K epochs IS the reference epoch mode
    with the trial repeated K times -- bitwise identical update sequence."""
    rng = np.random.default_rng(3)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng)
    a = _chain_net(W0)
    obs_a = a.fit_bptt_batch(ins[:1], tgts[:1], n_epochs=5, optimizer="sgd",
                             lr=1e-1, verbose=False)
    b = _chain_net(W0)
    obs_b = b.fit_bptt([ins[0]] * 5, [tgts[0]] * 5, optimizer="sgd", lr=1e-1,
                       verbose=False)
    np.testing.assert_allclose(np.asarray(a.get_var("p", "weights")),
                               np.asarray(b.get_var("p", "weights")),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(obs_a["epoch_loss"]),
                               np.asarray(obs_b["epoch_loss"]), rtol=1e-12)
    assert len(obs_a["train_loss"]) == 5


def test_batch_mb1_noshuffle_equals_epoch_mode():
    """batch_size=1, shuffle=False: the update sequence is exactly epoch
    mode over the trial list (each update sees one trial's loss)."""
    rng = np.random.default_rng(4)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng)
    a = _chain_net(W0)
    a.fit_bptt_batch(ins, tgts, n_epochs=1, batch_size=1, shuffle=False,
                     optimizer="sgd", lr=1e-1, verbose=False)
    b = _chain_net(W0)
    b.fit_bptt(list(ins), list(tgts), optimizer="sgd", lr=1e-1, verbose=False)
    np.testing.assert_allclose(np.asarray(a.get_var("p", "weights")),
                               np.asarray(b.get_var("p", "weights")),
                               rtol=0, atol=0)


def test_batch_deferred_matches_plain_autodiff():
    """The vmapped custom-VJP trajectory == vmapped plain autodiff (f64)."""
    rng = np.random.default_rng(5)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng)
    a = _chain_net(W0)
    a.fit_bptt_batch(ins, tgts, n_epochs=3, optimizer="sgd", lr=1e-1,
                     verbose=False, fused_bptt="auto")
    b = _chain_net(W0)
    b.fit_bptt_batch(ins, tgts, n_epochs=3, optimizer="sgd", lr=1e-1,
                     verbose=False, fused_bptt=False)
    np.testing.assert_allclose(np.asarray(a.get_var("p", "weights")),
                               np.asarray(b.get_var("p", "weights")),
                               rtol=1e-10, atol=1e-12)


def test_batch_chunked_equals_per_epoch_loop():
    """E > _EPOCH_SCAN_CHUNK exercises the chunk program; the update
    sequence must equal the per-epoch (verbose) loop bit-for-bit."""
    rng = np.random.default_rng(6)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng)
    a = _chain_net(W0)
    a.fit_bptt_batch(ins, tgts, n_epochs=9, batch_size=2, optimizer="adam",
                     lr=1e-2, seed=7, verbose=False)
    b = _chain_net(W0)
    with contextlib.redirect_stdout(io.StringIO()):
        b.fit_bptt_batch(ins, tgts, n_epochs=9, batch_size=2, optimizer="adam",
                         lr=1e-2, seed=7, verbose=True)
    np.testing.assert_allclose(np.asarray(a.get_var("p", "weights")),
                               np.asarray(b.get_var("p", "weights")),
                               rtol=0, atol=0)


def test_batch_shuffle_seeded_and_state_untouched():
    rng = np.random.default_rng(7)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng)
    a = _chain_net(W0)
    a.compile()
    state_before = np.asarray(a.state["p"])
    obs_a = a.fit_bptt_batch(ins, tgts, n_epochs=4, batch_size=2, seed=11,
                             lr=1e-2, verbose=False)
    np.testing.assert_array_equal(state_before, np.asarray(a.state["p"]))
    b = _chain_net(W0)
    obs_b = b.fit_bptt_batch(ins, tgts, n_epochs=4, batch_size=2, seed=11,
                             lr=1e-2, verbose=False)
    np.testing.assert_allclose(np.asarray(obs_a["train_loss"]),
                               np.asarray(obs_b["train_loss"]), rtol=0, atol=0)
    assert len(obs_a["train_loss"]) == 8  # 4 epochs x 2 minibatches
    assert len(obs_a["epoch_loss"]) == 4


def test_batch_training_reduces_loss_graph_path():
    """Multi-population DAG (graph trajectory) trains batched; deferred
    path matches plain autodiff on the final weights."""
    rng = np.random.default_rng(8)

    def build():
        r = np.random.default_rng(8)
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("pop1", QIF, weights=np.abs(r.normal(size=(8, 8))) * 0.4,
                            input_var="I_ext", output_var="s", source_var="s",
                            target_var="s_in", op="qif_op", spike_var="spike",
                            spike_def="v", spike_threshold=100.0,
                            spike_reset=-100.0,
                            node_vars={"all/qif_op/eta": 20.0 + r.random(8)},
                            train_params=["weights"])
        net.add_diffeq_node("pop2", TANH, weights=r.normal(size=(5, 5)) * 0.3,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            train_params=["weights"])
        net.add_edge("pop1", "pop2", weights=r.normal(size=(5, 8)) * 0.5,
                     train="gd")
        net.compile()
        return net

    # a spiking regime: a silent QIF population has exactly zero coupling
    # gradients (loss would be byte-identical across epochs)
    B, T = 3, 150
    ins = rng.normal(size=(B, T, 8)) * 2.0 + 5.0
    tgts = rng.normal(size=(B, T, 5)) * 0.1
    a = build()
    obs = a.fit_bptt_batch(ins, tgts, n_epochs=6, optimizer="adam", lr=5e-3,
                           verbose=False, fused_bptt=True)
    el = np.asarray(obs["epoch_loss"])
    assert el[-1] < el[0], "batched graph-path training did not reduce the loss"
    b = build()
    b.fit_bptt_batch(ins, tgts, n_epochs=6, optimizer="adam", lr=5e-3,
                     verbose=False, fused_bptt=False)
    np.testing.assert_allclose(np.asarray(a.get_var("pop1", "weights")),
                               np.asarray(b.get_var("pop1", "weights")),
                               rtol=1e-8, atol=1e-10)


def test_batch_blocksparse_deferred_matches_plain():
    """Ensemble training composes with block-sparse couplings (the N=100k
    flagship topology at small N): the vmapped deferred (graph) trajectory
    matches plain autodiff through the same BlockSparseCoupling network,
    and identical trials reproduce the B=1 fit exactly."""
    from rectipy_tpu.ops.sparse import block_random_connectivity

    rng = np.random.default_rng(11)
    n, fan_in, bs = 64, 8, 16
    A = block_random_connectivity(n, n, fan_in, block_size=bs, seed=3)

    def build():
        r = np.random.default_rng(11)
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("qif", QIF, weights=A,
                            input_var="I_ext", output_var="s", source_var="s",
                            target_var="s_in", op="qif_op", spike_var="spike",
                            spike_def="v", spike_threshold=100.0,
                            spike_reset=-100.0,
                            node_vars={"all/qif_op/eta": 20.0 + r.random(n)},
                            train_params=["weights"])
        net.compile()
        return net

    B, T = 3, 120
    ins = rng.normal(size=(B, T, n)) * 2.0 + 5.0
    tgts = rng.normal(size=(B, T, n)) * 0.1
    a = build()
    obs_a = a.fit_bptt_batch(ins, tgts, n_epochs=4, optimizer="adam", lr=5e-3,
                             verbose=False, fused_bptt=True)
    el = np.asarray(obs_a["epoch_loss"])
    assert el[-1] < el[0], "batched sparse training did not reduce the loss"
    b = build()
    obs_b = b.fit_bptt_batch(ins, tgts, n_epochs=4, optimizer="adam", lr=5e-3,
                             verbose=False, fused_bptt=False)
    np.testing.assert_allclose(el, np.asarray(obs_b["epoch_loss"]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(a.get_node("qif")["weights"]),
                               np.asarray(b.get_node("qif")["weights"]),
                               rtol=1e-8, atol=1e-10)
    assert np.abs(np.asarray(a.get_node("qif")["weights"])
                  - np.asarray(A.blocks)).max() > 1e-8, "weights did not train"
    # identical trials == single-trial fit (mean loss over copies)
    c = build()
    ins1, tgts1 = ins[:1], tgts[:1]
    obs_c = c.fit_bptt_batch(np.repeat(ins1, 2, 0), np.repeat(tgts1, 2, 0),
                             n_epochs=3, optimizer="adam", lr=5e-3,
                             verbose=False)
    d = build()
    obs_d = d.fit_bptt_batch(ins1, tgts1, n_epochs=3, optimizer="adam",
                             lr=5e-3, verbose=False)
    np.testing.assert_allclose(np.asarray(obs_c["epoch_loss"]),
                               np.asarray(obs_d["epoch_loss"]), rtol=1e-12)


def test_batch_remat_matches_full():
    rng = np.random.default_rng(9)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng, T=32)
    a = _chain_net(W0)
    a.fit_bptt_batch(ins, tgts, n_epochs=3, optimizer="sgd", lr=1e-1,
                     verbose=False, remat_steps=8)
    b = _chain_net(W0)
    b.fit_bptt_batch(ins, tgts, n_epochs=3, optimizer="sgd", lr=1e-1,
                     verbose=False)
    np.testing.assert_allclose(np.asarray(a.get_var("p", "weights")),
                               np.asarray(b.get_var("p", "weights")),
                               rtol=1e-10, atol=1e-12)


def test_batch_validation_errors():
    rng = np.random.default_rng(10)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng)
    net = _chain_net(W0)
    with pytest.raises(ValueError, match="batch_size"):
        net.fit_bptt_batch(ins, tgts, batch_size=3, verbose=False)
    with pytest.raises(ValueError, match="first dimension"):
        net.fit_bptt_batch(ins, tgts[:2], verbose=False)
    with pytest.raises(ValueError, match=r"\(B, T, m\)"):
        net.fit_bptt_batch(ins[0], tgts[0], verbose=False)
    frozen = Network(dt=1e-2)
    frozen.add_diffeq_node("p", TANH, weights=W0.copy(), source_var="tanh_op/r",
                           target_var="li_op/r_in", input_var="li_op/I_ext",
                           output_var="tanh_op/r", float_precision="float64")
    with pytest.raises(ValueError, match="No trainable parameters"):
        frozen.fit_bptt_batch(ins, tgts, verbose=False)
    # elementwise losses demand (B, R, n_out) targets -- a silently
    # broadcast (B, R) target would train against the wrong signal
    with pytest.raises(ValueError, match=r"\(B, R, n_out\)"):
        net.fit_bptt_batch(ins, tgts[:, :, 0], verbose=False)
    with pytest.raises(ValueError, match=r"\(B, R\) integer class labels"):
        net.fit_bptt_batch(ins, tgts, loss="ce", verbose=False)


@pytest.mark.parametrize("data", [1, 2])
def test_batch_mesh_matches_single_device(data):
    """fit_bptt_batch(mesh=): population-sharded (and, with a 'data' axis,
    trial-sharded) batched training must reproduce the unsharded update
    sequence."""
    from rectipy_tpu.parallel import make_mesh

    rng = np.random.default_rng(11)
    W0 = rng.normal(scale=0.3, size=(8, 8))
    B, T = 4, 24
    ins = rng.normal(size=(B, T, 1))
    tgts = rng.normal(size=(B, T, 8)) * 0.1

    def build():
        net = Network(dt=1e-2)
        net.add_diffeq_node("p", TANH, weights=W0.copy(),
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            input_var="li_op/I_ext", output_var="tanh_op/r",
                            float_precision="float64",
                            train_params=["weights"])
        return net

    a = build()
    a.fit_bptt_batch(ins, tgts, n_epochs=3, batch_size=2, optimizer="adam",
                     lr=1e-2, seed=5, verbose=False,
                     mesh=make_mesh(4, data=data))
    b = build()
    b.fit_bptt_batch(ins, tgts, n_epochs=3, batch_size=2, optimizer="adam",
                     lr=1e-2, seed=5, verbose=False)
    np.testing.assert_allclose(np.asarray(a.get_var("p", "weights")),
                               np.asarray(b.get_var("p", "weights")),
                               rtol=1e-12, atol=1e-14)


def test_batch_block_delay_edge_deferred_matches_plain():
    """Per-block-delayed BlockSparseLinear feedback edges under
    fit_bptt_batch: the VMAPPED graph trajectory (rolled delay-buffer carry,
    see ops/graph_bptt._block_edge_stage) matches plain autodiff exactly."""
    from types import SimpleNamespace

    from rectipy_tpu import FeedbackNetwork

    rng = np.random.default_rng(17)
    n_br = cb = 2
    bs, nb_in = 4, 2
    n = 8
    W = SimpleNamespace(
        blocks=0.15 * rng.standard_normal((n_br, cb, bs, bs)),
        cols=np.stack([rng.permutation(nb_in)[:cb] for _ in range(n_br)]))
    d_blk = rng.integers(0, 6, size=(n_br, cb))
    inp = rng.normal(size=(50, n))

    def build(fname):
        net = FeedbackNetwork(1e-2)
        net.add_diffeq_node(
            "pop", TANH, weights=np.zeros((n, n)), source_var="tanh_op/r",
            target_var="li_op/r_in", input_var="li_op/I_ext",
            output_var="li_op/v", verbose=False, clear=True,
            float_precision="float64", file_name=fname)
        net.add_edge("pop", "pop", weights=W, delays=d_blk, feedback=True,
                     train="gd", dtype=np.float64)
        net.compile()
        return net

    tgt = np.asarray(build("bde0").run(
        inp, verbose=False, sampling_steps=1).to_numpy("out"))
    B = 3
    ins = np.stack([inp] * B)
    tgts = np.stack([tgt] * B)
    res = {}
    for fused in (True, False):
        net = build(f"bde{fused}")
        e = net.get_edge("pop", "pop")
        e.weights = np.asarray(e.weights) * 1.3
        obs = net.fit_bptt_batch(ins, tgts, n_epochs=4, optimizer="sgd",
                                 lr=1e-2, verbose=False, fused_bptt=fused)
        res[fused] = (np.asarray(obs["epoch_loss"], dtype=float),
                      np.asarray(net.get_edge("pop", "pop").weights))
    np.testing.assert_allclose(res[True][0], res[False][0], rtol=1e-9)
    np.testing.assert_allclose(res[True][1], res[False][1],
                               rtol=1e-8, atol=1e-11)
    assert res[True][0][-1] < res[True][0][0]
    assert np.abs(res[True][1] - np.asarray(W.blocks) * 1.3).max() > 1e-9


@pytest.mark.parametrize("accum", [2, 4])
def test_batch_accum_steps_equals_full_minibatch(accum):
    """Micro-batch gradient accumulation (accum_steps=k) == the full-
    minibatch update exactly: equal-size mean-of-means, pinned at f64
    against the accum=1 program (losses AND trained weights)."""
    rng = np.random.default_rng(11)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng, B=8)
    a = _chain_net(W0)
    obs_a = a.fit_bptt_batch(ins, tgts, n_epochs=4, batch_size=4, seed=5,
                             optimizer="adam", lr=1e-2, verbose=False)
    b = _chain_net(W0)
    obs_b = b.fit_bptt_batch(ins, tgts, n_epochs=4, batch_size=4, seed=5,
                             optimizer="adam", lr=1e-2, verbose=False,
                             accum_steps=accum)
    np.testing.assert_allclose(np.asarray(obs_b["train_loss"]),
                               np.asarray(obs_a["train_loss"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b.get_var("p", "weights")),
                               np.asarray(a.get_var("p", "weights")),
                               rtol=1e-12)


def test_batch_accum_steps_composes_with_batch_vars_and_remat():
    """accum_steps slices the per-trial frozen overrides (batch_vars) along
    with the trials, and composes with remat_steps; exactness vs accum=1."""
    rng = np.random.default_rng(12)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng, B=4, T=30)
    etas = np.linspace(0.5, 2.0, 4)
    nets = []
    for accum in (1, 2):
        net = _chain_net(W0)
        net.fit_bptt_batch(ins, tgts, n_epochs=3, seed=2, optimizer="adam",
                           lr=1e-2, verbose=False, accum_steps=accum,
                           remat_steps=10, batch_vars={("p", "eta"): etas})
        nets.append(np.asarray(net.get_var("p", "weights")))
    np.testing.assert_allclose(nets[1], nets[0], rtol=1e-12)


def test_batch_accum_steps_validation():
    rng = np.random.default_rng(13)
    W0 = rng.normal(scale=0.3, size=(6, 6))
    ins, tgts = _trials(rng, B=4)
    net = _chain_net(W0)
    with pytest.raises(ValueError, match="accum_steps"):
        net.fit_bptt_batch(ins, tgts, verbose=False, accum_steps=3)
    with pytest.raises(ValueError, match="accum_steps"):
        net.fit_bptt_batch(ins, tgts, verbose=False, accum_steps=0)
