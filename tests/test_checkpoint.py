"""Checkpoint/resume tests: network snapshots round-trip and training resumes
bit-compatibly (capability absent in the reference; SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rectipy_tpu import Network
from rectipy_tpu.checkpoint import TrainCheckpointer, restore_network, save_network
from rectipy_tpu.train import get_optimizer

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"


def _build(n, W):
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", train_params=["weights"])
    net.compile()
    return net


def test_network_snapshot_roundtrip(tmp_path):
    n = 8
    rng = np.random.default_rng(0)
    W = rng.normal(size=(n, n)) * 0.3
    net = _build(n, W)
    inp = rng.normal(size=(30, n))
    net.run(inp, verbose=False)  # advance the state
    y_ref = np.asarray(net.get_node("rnn").y)

    save_network(net, str(tmp_path / "ckpt"))

    # fresh network restored from disk continues the exact same trajectory
    net2 = _build(n, np.zeros((n, n)))
    restore_network(net2, str(tmp_path / "ckpt"))
    np.testing.assert_allclose(np.asarray(net2.get_node("rnn").y), y_ref)
    np.testing.assert_allclose(np.asarray(net2.get_node("rnn")["weights"]), W)

    inp2 = rng.normal(size=(10, n))
    out_a = net.run(inp2, verbose=False).to_numpy("out")
    out_b = net2.run(inp2, verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_a, out_b, atol=1e-12)


def test_train_checkpointer_rolls_and_restores(tmp_path):
    ckpt = TrainCheckpointer(str(tmp_path / "ckpts"), keep=2)
    opt = get_optimizer("adam", 1e-3)
    train = {"w": jnp.arange(4.0)}
    opt_state = opt.init(train)
    for step in [10, 20, 30]:
        ckpt.save(step, train={"w": train["w"] + step}, opt_state=opt_state)
    assert ckpt.all_steps() == [20, 30]  # keep=2 pruned step 10
    step, pieces = ckpt.restore_latest({"train": {"w": train["w"]}, "opt_state": opt_state})
    assert step == 30
    np.testing.assert_allclose(np.asarray(pieces["train"]["w"]), np.arange(4.0) + 30)


def test_restore_missing_raises(tmp_path):
    ckpt = TrainCheckpointer(str(tmp_path / "empty"))
    step, pieces = ckpt.restore_latest({})
    assert step is None and pieces is None


def test_plastic_edge_state_roundtrip(tmp_path):
    """STDP weights, both pair traces, and the R-STDP eligibility trace are
    part of the network snapshot: plasticity resumes exactly after
    save/restore."""
    LIF = "neuron_model_templates.spiking_neurons.lif.lif"
    rng = np.random.default_rng(5)
    T = 120
    x = (rng.random((T, 2)) < 0.1) * 40.0
    r = rng.normal(0.0, 0.3, size=T)

    def build():
        net = Network(0.1, dtype=jnp.float64)
        net.add_func_node("inp", 2, activation_function="identity")
        for label, sel in (("pre", [[1.0, 0.0]]), ("post", [[0.0, 1.0]])):
            net.add_diffeq_node(label, LIF, weights=np.zeros((1, 1)), source_var="s",
                                target_var="s_in", input_var="I_ext", output_var="s",
                                op="lif_op", spike_var="spike", reset_var="v",
                                spike_threshold=1.0, spike_reset=0.0)
            net.add_edge("inp", label, weights=np.array(sel))
        net.add_edge("pre", "post", train="stdp", weights=np.full((1, 1), 0.3),
                     tau_plus=1.0, tau_minus=1.0, a_plus=0.05, a_minus=0.05,
                     w_min=0.0, w_max=1.0)
        return net

    # train a while (reward mode, so the eligibility trace exists), snapshot
    net = build()
    net.fit_stdp(x, reward=r, tau_e=4.0, sampling_steps=30, verbose=False)
    path = str(tmp_path / "plastic")
    save_network(net, path)
    edge = net.get_edge("pre", "post")
    saved = {k: np.asarray(v) for k, v in edge.params.items()}

    # restoring into a FRESH network reproduces edge params and continues
    # training identically to the uninterrupted original
    net2 = build()
    net2.fit_stdp(x, reward=r, tau_e=4.0, sampling_steps=30, verbose=False)  # warm shape
    net2 = build()
    restore_network(net2, path)
    edge2 = net2.get_edge("pre", "post")
    for k, v in saved.items():
        np.testing.assert_allclose(np.asarray(edge2.params[k]), v, rtol=0,
                                   err_msg=f"edge param {k} did not round-trip")

    net.fit_stdp(x, reward=r, tau_e=4.0, sampling_steps=30, verbose=False)
    net2.fit_stdp(x, reward=r, tau_e=4.0, sampling_steps=30, verbose=False)
    np.testing.assert_allclose(np.asarray(net2.get_edge("pre", "post").params["weights"]),
                               np.asarray(net.get_edge("pre", "post").params["weights"]),
                               rtol=0)


def test_homeostasis_schedule_roundtrip(tmp_path):
    """The homeostatic-scaling side-state (per-row target + global schedule
    phase, edge ATTRIBUTES) is part of the snapshot: a restored network
    continues the exact scaling schedule of the uninterrupted original."""
    LIF = "neuron_model_templates.spiking_neurons.lif.lif"
    rng = np.random.default_rng(9)
    T, h = 70, 16  # 70 % 16 != 0: phase 6 at the checkpoint
    x = (rng.random((T, 6)) < 0.15) * 40.0
    w0 = rng.uniform(0.1, 0.4, size=(2, 4))

    def build():
        net = Network(0.1, dtype=jnp.float64)
        net.add_func_node("inp", 6, activation_function="identity")
        for label, n, k in (("pre", 4, 0), ("post", 2, 4)):
            sel = np.eye(n, 6, k=k)
            net.add_diffeq_node(label, LIF, weights=np.zeros((n, n)), source_var="s",
                                target_var="s_in", input_var="I_ext", output_var="s",
                                op="lif_op", spike_var="spike", reset_var="v",
                                spike_threshold=1.0, spike_reset=0.0)
            net.add_edge("inp", label, weights=sel)
        net.add_edge("pre", "post", train="stdp", weights=w0, tau_plus=2.0,
                     tau_minus=2.0, a_plus=0.05, a_minus=0.04, w_min=0.0, w_max=1.0)
        return net

    # checkpointed run: chunk 1, snapshot, restore into a FRESH net, chunk 2
    net_b = build()
    net_b.fit_stdp(x[:40], sampling_steps=40, homeostasis_steps=h, verbose=False)
    path = str(tmp_path / "homeo")
    save_network(net_b, path)
    net_c = build()
    restore_network(net_c, path)
    edge_c = net_c.get_edge("pre", "post")
    assert int(edge_c._homeo_phase) == 40 % h
    np.testing.assert_allclose(np.asarray(edge_c._homeo_target),
                               (w0 - 0.0).sum(axis=1))

    net_c.fit_stdp(x[40:], sampling_steps=40, homeostasis_steps=h, verbose=False)
    # net_c's total protocol == one 70-step chunked run; replay it directly
    net_d = build()
    net_d.fit_stdp(x, sampling_steps=40, homeostasis_steps=h, verbose=False)
    np.testing.assert_allclose(
        np.asarray(net_c.get_edge("pre", "post").params["weights"]),
        np.asarray(net_d.get_edge("pre", "post").params["weights"]), rtol=1e-12)

    # a snapshot taken BEFORE any homeostatic fit restores to "no schedule"
    net_e = build()
    save_network(net_e, str(tmp_path / "fresh"))
    net_f = build()
    net_f._homeo_left_over = True  # unrelated attr must survive
    restore_network(net_f, str(tmp_path / "fresh"))
    edge_f = net_f.get_edge("pre", "post")
    assert not hasattr(edge_f, "_homeo_target")
    assert not hasattr(edge_f, "_homeo_phase")


def test_legacy_snapshot_clears_stale_homeo_schedule(tmp_path):
    """Restoring a pre-sidecar snapshot (params+state only) must CLEAR any
    live homeostasis schedule: resuming the pre-restore schedule against
    restored weights would scale rows toward the wrong target."""
    from rectipy_tpu.checkpoint import _canonicalize_plastic_edges, save_pytree

    LIF = "neuron_model_templates.spiking_neurons.lif.lif"
    rng = np.random.default_rng(11)
    x = (rng.random((48, 4)) < 0.2) * 40.0
    net = Network(0.1, dtype=jnp.float64)
    net.add_func_node("inp", 4, activation_function="identity")
    for label, k in (("pre", 0), ("post", 2)):
        net.add_diffeq_node(label, LIF, weights=np.zeros((2, 2)), source_var="s",
                            target_var="s_in", input_var="I_ext", output_var="s",
                            op="lif_op", spike_var="spike", reset_var="v",
                            spike_threshold=1.0, spike_reset=0.0)
        net.add_edge("inp", label, weights=np.eye(2, 4, k=k))
    net.add_edge("pre", "post", train="stdp", weights=np.full((2, 2), 0.3),
                 tau_plus=2.0, tau_minus=2.0, a_plus=0.05, a_minus=0.04,
                 w_min=0.0, w_max=1.0)
    net.fit_stdp(x, sampling_steps=24, homeostasis_steps=10, verbose=False)
    edge = net.get_edge("pre", "post")
    assert hasattr(edge, "_homeo_target")  # schedule live on the edge

    legacy = {"params": net.parameters_pytree(), "state": net.init_state()}
    _canonicalize_plastic_edges(legacy)       # exactly the old save layout
    save_pytree(legacy, str(tmp_path / "legacy"))
    restore_network(net, str(tmp_path / "legacy"))
    assert not hasattr(edge, "_homeo_target")
    assert not hasattr(edge, "_homeo_phase")
