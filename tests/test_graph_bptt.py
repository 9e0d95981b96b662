"""Multi-population deferred-gradient BPTT (ops/graph_bptt.py): the graph
trajectory's forward must match the composed network step exactly, and
gradients -- for population couplings, inter-population edge weights, masked
edges, and non-coupling node parameters -- must match plain autodiff at f64.
This pins the K-stage generalization of the single-population custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network
from rectipy_tpu.ops.graph_bptt import make_graph_traj

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
QIF = "neuron_model_templates.spiking_neurons.qif.qif"


def _two_pop_net(rng, n1=8, n2=6, n_in=3, n_out=2, masked=False,
                 train_eta=False):
    """inp -> qif(pop1, post-update spiking output) -> rate(pop2) -> out,
    with trained couplings on both populations and trained edges."""
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("inp", n_in, activation_function="identity")
    tp = ["weights", "eta"] if train_eta else ["weights"]
    net.add_diffeq_node("pop1", QIF, weights=np.abs(rng.normal(size=(n1, n1))) * 0.4,
                        input_var="I_ext", output_var="s", source_var="s",
                        target_var="s_in", op="qif_op", spike_var="spike",
                        spike_def="v", spike_threshold=100.0, spike_reset=-100.0,
                        node_vars={"all/qif_op/eta": 6.0 + rng.random(n1)},
                        train_params=tp)
    net.add_diffeq_node("pop2", TANH, weights=rng.normal(size=(n2, n2)) * 0.3,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        train_params=["weights"])
    net.add_func_node("out", n_out, activation_function="tanh")
    net.add_edge("inp", "pop1", weights=rng.normal(size=(n1, n_in)))
    if masked:
        mask = (rng.random((n2, n1)) < 0.5).astype(float)
        net.add_edge("pop1", "pop2", weights=rng.normal(size=(n2, n1)) * 0.5,
                     train="gd", edge_attr={"mask": mask})
    else:
        net.add_edge("pop1", "pop2", weights=rng.normal(size=(n2, n1)) * 0.5,
                     train="gd")
    net.add_edge("pop2", "out", weights=rng.normal(size=(n_out, n2)), train="gd")
    net.compile()
    return net


@pytest.mark.parametrize("masked", [False, True])
def test_graph_traj_forward_and_grad_parity(masked):
    rng = np.random.default_rng(21)
    net = _two_pop_net(rng, masked=masked)
    gtraj, spec = make_graph_traj(net)
    assert sorted(spec.pop_labels) == ["pop1", "pop2"]
    # 2 couplings + 3 edges = 5 deferred weights
    assert len(spec.weight_paths) == 5

    step = net.make_step()
    params = net.parameters_pytree()
    state0 = net.init_state()
    T, n_in = 200, 3
    xs = jnp.asarray(rng.normal(size=(T, n_in)) * 3.0)
    tgt = jnp.asarray(rng.normal(size=(T, 2)))

    wpaths = spec.weight_paths
    excl = {(kind, label, key) for _, kind, label, key in wpaths}
    weights0 = {fk: params[kind][label][key] for fk, kind, label, key in wpaths}
    args = {sec: {lbl: {k: v for k, v in sub.items()
                        if (sec, lbl, k) not in excl}
                  for lbl, sub in params[sec].items()}
            for sec in ("nodes", "edges")}
    Y0 = {lbl: state0["nodes"][lbl] for lbl in spec.pop_labels}

    def run_std(weights, xs_):
        p = {sec: {lbl: dict(sub) for lbl, sub in params[sec].items()}
             for sec in ("nodes", "edges")}
        for fk, kind, label, key in wpaths:
            p[kind][label][key] = weights[fk]

        def body(st, x):
            st, out, _ = step(st, p, x)
            return st, out

        stT, outs = jax.lax.scan(body, state0, xs_)
        return stT, outs

    _, outs_std = run_std(weights0, xs)
    YT, outs_f = gtraj(weights0, args, Y0, xs)
    np.testing.assert_array_equal(np.asarray(outs_f), np.asarray(outs_std))
    assert np.asarray(net.run(np.asarray(xs[:5]), verbose=False,
                              sampling_steps=1)["out"]).shape == (5, 2)

    def loss_std(weights, xs_):
        _, outs = run_std(weights, xs_)
        return jnp.mean((outs - tgt) ** 2)

    def loss_fast(weights, xs_):
        _, outs = gtraj(weights, args, Y0, xs_)
        return jnp.mean((outs - tgt) ** 2)

    g_std = jax.grad(loss_std, argnums=(0, 1))(weights0, xs)
    g_fast = jax.grad(loss_fast, argnums=(0, 1))(weights0, xs)
    for fk in weights0:
        a, b = np.asarray(g_std[0][fk]), np.asarray(g_fast[0][fk])
        assert np.abs(a).max() > 0, f"zero gradient for {fk} -> vacuous"
        np.testing.assert_allclose(b, a, atol=1e-6 * max(np.abs(a).max(), 1e-30),
                                   err_msg=fk)
    np.testing.assert_allclose(np.asarray(g_fast[1]), np.asarray(g_std[1]),
                               rtol=1e-9, atol=1e-12)


def test_fit_bptt_graph_matches_plain():
    """fit_bptt auto-selects the graph trajectory for multi-population
    networks; losses and ALL trained weights (couplings, edges, and a
    non-deferred node parameter) match plain autodiff."""
    rng = np.random.default_rng(22)
    T = 250
    inp = rng.normal(size=(T, 3)) * 3.0
    tgt = rng.normal(size=(T, 2)) * 0.1

    def fit(fused):
        rng_l = np.random.default_rng(22)
        net = _two_pop_net(rng_l, train_eta=True)
        obs = net.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_node("pop1")["weights"]),
                np.asarray(net.get_node("pop2")["weights"]),
                np.asarray(net.get_edge("pop1", "pop2").weights),
                np.asarray(net.get_node("pop1")["eta"]))

    res_fast = fit(True)
    res_std = fit(False)
    np.testing.assert_allclose(res_fast[0], res_std[0], rtol=1e-8)
    for a, b, name in zip(res_fast[1:], res_std[1:],
                          ["pop1 W", "pop2 W", "edge W", "eta"]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-9, err_msg=name)
    assert res_fast[0][-1] < res_fast[0][0], "training did not reduce the loss"


def test_graph_bptt_unsupported_falls_back():
    """Edges outside the linear family (here an RLS edge) are outside the
    deferred path's scope: fused_bptt=True raises, 'auto' silently falls
    back to plain autodiff and still trains."""
    rng = np.random.default_rng(23)
    n = 6

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("pop1", TANH, weights=rng.normal(size=(n, n)) * 0.2,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            train_params=["weights"])
        net.add_diffeq_node("pop2", TANH, weights=rng.normal(size=(n, n)) * 0.2,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in")
        net.add_edge("pop1", "pop2", weights=np.eye(n), train="rls")
        return net

    inp = rng.normal(size=(40, n))
    tgt = rng.normal(size=(40, n))
    with pytest.raises(ValueError):
        build().fit_bptt([inp], [tgt], verbose=False, fused_bptt=True)
    obs = build().fit_bptt([inp] * 2, [tgt] * 2, verbose=False, fused_bptt="auto")
    assert len(obs["epoch_loss"]) == 2


def test_graph_bptt_long_delay_memory_filter_matches_plain():
    """LinearMemoryFilter with max_delay >> 16 (the former per-slot stage
    cap): the single ring-buffer filter stage keeps the deferred path
    available at ANY delay depth -- make_graph_traj must accept it, and
    fit_bptt losses + trained weights AND filter must match plain autodiff
    at f64.  Reference semantics: rectipy/edges.py:144-147."""
    rng = np.random.default_rng(27)
    n = 6
    W1 = rng.normal(size=(n, n)) * 0.2
    We = rng.normal(size=(n, n)) * 0.4
    F0 = np.eye(n) * 0.8 + rng.normal(size=(n, n)) * 0.05
    delays = (np.arange(n) * 17) % 100 + 1  # max_delay = 86 -> D = 87 slots
    T = 120
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("pop1", TANH, weights=W1, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        net.add_diffeq_node("pop2", TANH, weights=W1.copy(),
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in")
        net.add_edge("pop1", "pop2", weights=We, train="gd", delays=delays,
                     filter_weights=F0)
        return net

    gtraj, spec = make_graph_traj(build().compile())  # must not raise
    assert any(fk.startswith("ef:") for fk, *_ in spec.weight_paths)

    def fit(fused):
        net = build()
        obs = net.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        e = net.get_edge("pop1", "pop2")
        return (np.asarray(obs["epoch_loss"]), np.asarray(e.weights),
                np.asarray(e.params["filter"]))

    l_fast, we_fast, f_fast = fit(True)
    l_std, we_std, f_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-8)
    np.testing.assert_allclose(we_fast, we_std, rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(f_fast, f_std, rtol=1e-5, atol=1e-10)
    assert np.abs(f_fast - F0).max() > 1e-8, "filter did not train"
    assert l_fast[-1] < l_fast[0]


@pytest.mark.parametrize("remat", [0, 40])
def test_graph_bptt_trainable_mask_matches_plain(remat):
    """Trainable-mask LinearMasked on the deferred path: the mask multiply
    runs outside the differentiated region (stage prep), so its cotangent is
    emitted explicitly as dmask = dE * W.  Gradients for BOTH the weights
    and the mask must match plain autodiff at f64, full and chunked."""
    rng = np.random.default_rng(28)
    net = Network(1e-2, dtype=jnp.float64)
    n1, n2 = 7, 5
    W1 = rng.normal(size=(n1, n1)) * 0.2
    We = rng.normal(size=(n2, n1)) * 0.5
    mask0 = rng.random((n2, n1))
    net.add_diffeq_node("pop1", TANH, weights=W1, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", train_params=["weights"])
    net.add_diffeq_node("pop2", TANH, weights=rng.normal(size=(n2, n2)) * 0.2,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_edge("pop1", "pop2", weights=We, train="gd", mask=mask0,
                 train_params=["weights", "mask"])
    net.compile()
    assert "mask" in net.get_edge("pop1", "pop2").train_keys

    gtraj, spec = make_graph_traj(net, remat_steps=remat)
    step = net.make_step()
    params = net.parameters_pytree()
    state0 = net.init_state()
    T = 80
    xs = jnp.asarray(rng.normal(size=(T, n1)))
    tgt = jnp.asarray(rng.normal(size=(T, n2)))

    wpaths = spec.weight_paths
    excl = {(kind, label, key) for _, kind, label, key in wpaths}
    weights0 = {fk: params[kind][label][key] for fk, kind, label, key in wpaths}
    args0 = {sec: {lbl: {k: v for k, v in sub.items()
                         if (sec, lbl, k) not in excl}
                   for lbl, sub in params[sec].items()}
             for sec in ("nodes", "edges")}
    Y0 = {lbl: state0["nodes"][lbl] for lbl in spec.pop_labels}

    def loss_std(weights, args):
        p = {sec: {lbl: dict(sub) for lbl, sub in args[sec].items()}
             for sec in ("nodes", "edges")}
        for fk, kind, label, key in wpaths:
            p[kind][label][key] = weights[fk]

        def body(st, x):
            st, out, _ = step(st, p, x)
            return st, out

        _, outs = jax.lax.scan(body, state0, xs)
        return jnp.mean((outs - tgt) ** 2)

    def loss_fast(weights, args):
        _, outs = gtraj(weights, args, Y0, xs)
        return jnp.mean((outs - tgt) ** 2)

    g_std = jax.grad(loss_std, argnums=(0, 1))(weights0, args0)
    g_fast = jax.grad(loss_fast, argnums=(0, 1))(weights0, args0)
    dm_std = np.asarray(g_std[1]["edges"]["pop1->pop2"]["mask"])
    dm_fast = np.asarray(g_fast[1]["edges"]["pop1->pop2"]["mask"])
    assert np.abs(dm_std).max() > 0, "mask gradient vacuous in the reference path"
    np.testing.assert_allclose(dm_fast, dm_std,
                               atol=1e-7 * max(np.abs(dm_std).max(), 1e-30))
    for fk in weights0:
        ref = np.asarray(g_std[0][fk])
        np.testing.assert_allclose(np.asarray(g_fast[0][fk]), ref,
                                   atol=1e-7 * max(np.abs(ref).max(), 1e-30),
                                   err_msg=fk)


@pytest.mark.parametrize("edge_kind", ["delay", "filter"])
def test_graph_bptt_stateful_edges_match_plain(edge_kind):
    """Delay (LinearMemory) and synaptic-filter (LinearFilter) edges join
    the scan carry: fit_bptt losses and trained weights -- including the
    deferred FILTER matrix -- match plain autodiff at f64."""
    rng = np.random.default_rng(25)
    n = 6
    W1 = rng.normal(size=(n, n)) * 0.2
    W2 = rng.normal(size=(n, n)) * 0.2
    We = rng.normal(size=(n, n)) * 0.4
    F0 = np.eye(n) * 0.8 + rng.normal(size=(n, n)) * 0.05
    T = 80
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("pop1", TANH, weights=W1, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        net.add_diffeq_node("pop2", TANH, weights=W2, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        if edge_kind == "delay":
            net.add_edge("pop1", "pop2", weights=We, train="gd",
                         delays=(np.arange(n) % 3) + 1)
        else:
            net.add_edge("pop1", "pop2", weights=We, train="gd",
                         filter_weights=F0)
        obs = net.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        e = net.get_edge("pop1", "pop2")
        flt = np.asarray(e.params["filter"]) if edge_kind == "filter" else None
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_node("pop1")["weights"]),
                np.asarray(e.weights), flt)

    l_fast, w1_fast, we_fast, f_fast = fit(True)
    l_std, w1_std, we_std, f_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-8)
    np.testing.assert_allclose(w1_fast, w1_std, rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(we_fast, we_std, rtol=1e-5, atol=1e-10)
    if edge_kind == "filter":
        np.testing.assert_allclose(f_fast, f_std, rtol=1e-5, atol=1e-10)
        assert np.abs(f_fast - F0).max() > 1e-6, "filter did not train"
    assert np.abs(we_fast - We).max() > 1e-5, "edge weights did not train"
    assert l_fast[-1] < l_fast[0]


def test_graph_traj_feedback_network_matches_plain():
    """FeedbackNetwork: the graph trajectory carries previous-step feedback
    outputs, forward matches the composed step bit-for-bit, and fit_bptt
    losses + trained weights (incl. the FEEDBACK edge) match plain autodiff."""
    from rectipy_tpu import FeedbackNetwork

    n = 6
    rng = np.random.default_rng(24)
    W1 = rng.normal(size=(n, n)) * 0.2
    W2 = rng.normal(size=(n, n)) * 0.2
    k_fb0 = rng.normal(size=(n, n)) * 0.1

    def build():
        net = FeedbackNetwork(1e-2, dtype=jnp.float64)
        for label, W in [("p1", W1), ("p2", W2)]:
            net.add_diffeq_node(label, TANH, weights=W, input_var="li_op/I_ext",
                                output_var="li_op/v", source_var="tanh_op/r",
                                target_var="li_op/r_in", train_params=["weights"])
        net.add_edge("p1", "p2", weights=np.eye(n))
        net.add_edge("p2", "p1", weights=k_fb0, feedback=True, train="gd")
        net.compile()
        return net

    # forward bit-parity of the raw trajectory vs the composed step
    net = build()
    gtraj, spec = make_graph_traj(net)
    assert spec.has_fb
    step = net.make_step()
    params = net.parameters_pytree()
    state0 = net.init_state()
    T = 80
    xs = jnp.asarray(rng.normal(size=(T, n)))
    wpaths = spec.weight_paths
    excl = {(kind, label, key) for _, kind, label, key in wpaths}
    weights0 = {fk: params[kind][label][key] for fk, kind, label, key in wpaths}
    args = {sec: {lbl: {k: v for k, v in sub.items()
                        if (sec, lbl, k) not in excl}
                  for lbl, sub in params[sec].items()}
            for sec in ("nodes", "edges")}
    C0 = {"Y": {lbl: state0["nodes"][lbl] for lbl in spec.pop_labels},
          "fb": state0["fb"], "E": {}}

    def body(st, x):
        st, out, _ = step(st, params, x)
        return st, out

    stT, outs_std = jax.lax.scan(body, state0, xs)
    CT, outs_f = gtraj(weights0, args, C0, xs)
    np.testing.assert_array_equal(np.asarray(outs_f), np.asarray(outs_std))
    for u in CT["fb"]:
        np.testing.assert_array_equal(np.asarray(CT["fb"][u]),
                                      np.asarray(stT["fb"][u]))

    # fit-level parity: losses and all trained weights
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def fit(fused):
        net = build()
        obs = net.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_node("p1")["weights"]),
                np.asarray(net.get_edge("p2", "p1").weights))

    l_fast, w1_fast, wfb_fast = fit(True)
    l_std, w1_std, wfb_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-8)
    np.testing.assert_allclose(w1_fast, w1_std, rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(wfb_fast, wfb_std, rtol=1e-5, atol=1e-10)
    assert np.abs(wfb_fast - k_fb0).max() > 1e-5, "feedback edge did not train"
    assert l_fast[-1] < l_fast[0]


def test_graph_bptt_blocksparse_delayed_feedback_matches_plain():
    """The N=100k flagship topology at small N: instant input -> block-sparse
    QIF population with a STATEFUL diagonal delayed self-feedback edge
    (FeedbackNetwork + LinearMemory).  The deferred path must train the
    block-sparse coupling and the diagonal feedback gains, matching plain
    autodiff at f64 -- this is the configuration that makes N=100k training
    feasible (plain autodiff would carry the full coupling cotangent)."""
    from rectipy_tpu import FeedbackNetwork
    from rectipy_tpu.ops.sparse import block_random_connectivity

    n, bs, T = 64, 16, 150
    rng = np.random.default_rng(26)
    A = block_random_connectivity(n, n, 8, block_size=bs, seed=4)
    etas = 2.0 + rng.random(n)
    delays = rng.integers(0, 4, size=n)
    inp = rng.normal(size=(T, 1)) * 2.0
    tgt = rng.normal(size=(T, n)) * 0.1
    W_in = rng.normal(size=(n, 1))

    def fit(fused):
        net = FeedbackNetwork(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", 1, activation_function="identity")
        net.add_diffeq_node("qif", QIF, weights=A, input_var="I_ext",
                            output_var="s", source_var="s", target_var="s_in",
                            op="qif_op", spike_var="spike", spike_def="v",
                            spike_threshold=100.0, spike_reset=-100.0,
                            node_vars={"all/qif_op/eta": etas},
                            train_params=["weights"])
        net.add_edge("inp", "qif", weights=W_in)
        net.add_edge("qif", "qif", weights=np.full(n, 0.3), delays=delays,
                     feedback=True, train="gd")
        obs = net.fit_bptt([inp] * 6, [tgt] * 6, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_node("qif")["weights"]),
                np.asarray(net.get_edge("qif", "qif").weights))

    l_fast, w_fast, g_fast = fit(True)
    l_std, w_std, g_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-8)
    np.testing.assert_allclose(w_fast, w_std, rtol=0.0,
                               atol=1e-5 * np.abs(w_std).max())
    np.testing.assert_allclose(g_fast, g_std, rtol=1e-5, atol=1e-10)
    assert g_fast.ndim == 1 and np.abs(g_fast - 0.3).max() > 1e-6, \
        "diagonal feedback gains did not train"
    assert np.abs(w_fast - np.asarray(A.blocks)).max() > 1e-6


def test_tbptt_step_mode_graph_trajectory_matches_plain():
    """Step mode (truncated BPTT) on a multi-population FEEDBACK network
    with a stateful delay edge routes through the graph trajectory: Observer
    records and trained weights match the plain path exactly."""
    from rectipy_tpu import FeedbackNetwork

    n, T = 6, 110
    rng = np.random.default_rng(27)
    W1 = rng.normal(size=(n, n)) * 0.2
    W2 = rng.normal(size=(n, n)) * 0.2
    k_fb = rng.normal(size=(n, n)) * 0.1
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def fit(fused):
        net = FeedbackNetwork(1e-2, dtype=jnp.float64)
        for label, W in [("p1", W1), ("p2", W2)]:
            net.add_diffeq_node(label, TANH, weights=W, input_var="li_op/I_ext",
                                output_var="li_op/v", source_var="tanh_op/r",
                                target_var="li_op/r_in", train_params=["weights"])
        net.add_edge("p1", "p2", weights=np.eye(n) * 0.8, train="gd",
                     delays=(np.arange(n) % 3) + 1)
        net.add_edge("p2", "p1", weights=k_fb, feedback=True, train="gd")
        obs = net.fit_bptt(inp, tgt, optimizer="adam", lr=1e-2,
                           update_steps=20, sampling_steps=4, verbose=False,
                           fused_bptt=fused)
        return (obs, np.asarray(net.get_node("p1")["weights"]),
                np.asarray(net.get_edge("p2", "p1").weights))

    obs_f, w1_f, wfb_f = fit(True)
    obs_s, w1_s, wfb_s = fit(False)
    np.testing.assert_array_equal(np.asarray(obs_f["steps"]),
                                  np.asarray(obs_s["steps"]))
    # f64 reduction-reordering drift compounds through the per-chunk adam
    # updates; measured max relative deviation ~1e-9
    np.testing.assert_allclose(obs_f.to_numpy("out"), obs_s.to_numpy("out"),
                               rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(np.asarray(obs_f["loss"]),
                               np.asarray(obs_s["loss"]), rtol=1e-7)
    np.testing.assert_allclose(w1_f, w1_s, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(wfb_f, wfb_s, rtol=1e-6, atol=1e-10)
    assert np.abs(wfb_f - k_fb).max() > 1e-5, "feedback edge did not train"


def test_graph_bptt_heun_populations_match_plain():
    """Heun (RK2) populations in a multi-population graph: each coupling
    contributes TWO stages (pre-state and midpoint sources) and their dW
    contributions accumulate.  Forward is bit-identical to the composed
    step; fit_bptt losses and trained weights match plain autodiff."""
    rng = np.random.default_rng(28)
    n, T = 8, 120
    W1 = rng.normal(size=(n, n)) * 0.3
    W2 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("p1", TANH, weights=W1, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"],
                            integrator="heun")
        net.add_diffeq_node("p2", TANH, weights=W2, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        net.add_edge("p1", "p2", weights=rng.normal(size=(n, n)) * 0.4, train="gd")
        net.compile()
        return net

    # forward bit-parity: graph trajectory vs composed step
    net = build()
    gtraj, spec = make_graph_traj(net)
    # p1 heun: 2 stages for its coupling (same flatkey twice) + p2 coupling + edge
    assert len(spec.weight_paths) == 4
    step = net.make_step()
    params = net.parameters_pytree()
    state0 = net.init_state()
    xs = jnp.asarray(inp)
    wpaths = spec.weight_paths
    excl = {(kind, label, key) for _, kind, label, key in wpaths}
    weights0 = {fk: params[kind][label][key] for fk, kind, label, key in wpaths}
    args = {sec: {lbl: {k: v for k, v in sub.items()
                        if (sec, lbl, k) not in excl}
                  for lbl, sub in params[sec].items()}
            for sec in ("nodes", "edges")}
    Y0 = {lbl: state0["nodes"][lbl] for lbl in spec.pop_labels}

    def body(st, x):
        st, out, _ = step(st, params, x)
        return st, out

    _, outs_std = jax.lax.scan(body, state0, xs)
    _, outs_f = gtraj(weights0, args, Y0, xs)
    np.testing.assert_array_equal(np.asarray(outs_f), np.asarray(outs_std))

    def fit(fused):
        net2 = Network(1e-2, dtype=jnp.float64)
        net2.add_diffeq_node("p1", TANH, weights=W1, input_var="li_op/I_ext",
                             output_var="li_op/v", source_var="tanh_op/r",
                             target_var="li_op/r_in", train_params=["weights"],
                             integrator="heun")
        net2.add_diffeq_node("p2", TANH, weights=W2, input_var="li_op/I_ext",
                             output_var="li_op/v", source_var="tanh_op/r",
                             target_var="li_op/r_in", train_params=["weights"])
        net2.add_edge("p1", "p2", weights=np.eye(n) * 0.5, train="gd")
        obs = net2.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                            verbose=False, fused_bptt=fused)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net2.get_node("p1")["weights"]),
                np.asarray(net2.get_edge("p1", "p2").weights))

    l_f, w1_f, we_f = fit(True)
    l_s, w1_s, we_s = fit(False)
    np.testing.assert_allclose(l_f, l_s, rtol=1e-8)
    np.testing.assert_allclose(w1_f, w1_s, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(we_f, we_s, rtol=1e-6, atol=1e-10)
    assert np.abs(w1_f - W1).max() > 1e-5, "heun population did not train"
    assert l_f[-1] < l_f[0]


def test_graph_bptt_memory_filter_edge_matches_plain():
    """LinearMemoryFilter (delays + synaptic filter in one edge): the filter
    applies per buffer slot, so the deferred path lifts one filter-matvec
    stage per slot (shared filter flatkey, accumulated dW) plus the W stage
    on the written slot 0.  fit_bptt losses and trained weights -- edge W
    AND the filter matrix -- match plain autodiff at f64."""
    rng = np.random.default_rng(29)
    n, T = 6, 90
    W1 = rng.normal(size=(n, n)) * 0.2
    We = rng.normal(size=(n, n)) * 0.4
    F0 = np.eye(n) * 0.7 + rng.normal(size=(n, n)) * 0.05
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("pop1", TANH, weights=W1, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        net.add_diffeq_node("pop2", TANH, weights=W1 * 0.5, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_edge("pop1", "pop2", weights=We, train="gd",
                     delays=(np.arange(n) % 3) + 1, filter_weights=F0)
        obs = net.fit_bptt([inp] * 6, [tgt] * 6, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        e = net.get_edge("pop1", "pop2")
        return (np.asarray(obs["epoch_loss"]), np.asarray(e.weights),
                np.asarray(e.params["filter"]))

    l_f, we_f, flt_f = fit(True)
    l_s, we_s, flt_s = fit(False)
    np.testing.assert_allclose(l_f, l_s, rtol=1e-8)
    np.testing.assert_allclose(we_f, we_s, rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(flt_f, flt_s, rtol=1e-5, atol=1e-10)
    assert np.abs(flt_f - F0).max() > 1e-6, "filter did not train"
    assert l_f[-1] < l_f[0]


def test_graph_traj_remat_matches_full():
    """Chunked graph trajectory (remat_steps=K): forward bit-identical and
    gradients equal the full-residual graph trajectory at f64, on a
    FeedbackNetwork with a stateful delay edge (the carry -- states, fb
    values, edge buffers -- checkpoints at chunk boundaries)."""
    from rectipy_tpu import FeedbackNetwork

    n, T, K = 6, 120, 30
    rng = np.random.default_rng(31)
    net = FeedbackNetwork(1e-2, dtype=jnp.float64)
    for label in ("p1", "p2"):
        net.add_diffeq_node(label, TANH, weights=rng.normal(size=(n, n)) * 0.2,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            train_params=["weights"])
    net.add_edge("p1", "p2", weights=rng.normal(size=(n, n)) * 0.4, train="gd",
                 delays=(np.arange(n) % 3) + 1)
    net.add_edge("p2", "p1", weights=rng.normal(size=(n, n)) * 0.1,
                 feedback=True, train="gd")
    net.compile()

    gtraj_f, spec = make_graph_traj(net)
    gtraj_c, spec_c = make_graph_traj(net, remat_steps=K)
    assert spec.needs_carry and spec_c.needs_carry

    params = net.parameters_pytree()
    state0 = net.init_state()
    wpaths = spec.weight_paths
    excl = {(kind, label, key) for _, kind, label, key in wpaths}
    weights0 = {fk: params[kind][label][key] for fk, kind, label, key in wpaths}
    args = {sec: {lbl: {k: v for k, v in sub.items()
                        if (sec, lbl, k) not in excl}
                  for lbl, sub in params[sec].items()}
            for sec in ("nodes", "edges")}
    C0 = {"Y": {lbl: state0["nodes"][lbl] for lbl in spec.pop_labels},
          "fb": state0["fb"],
          "E": {ek: state0["edges"][ek] for ek in spec.stateful_edges}}
    xs = jnp.asarray(rng.normal(size=(T, n)))
    tgt = jnp.asarray(rng.normal(size=(T, n)))

    CT_f, outs_f = gtraj_f(weights0, args, C0, xs)
    CT_c, outs_c = gtraj_c(weights0, args, C0, xs)
    np.testing.assert_array_equal(np.asarray(outs_c), np.asarray(outs_f))

    def loss(traj):
        def f(weights, xs_):
            _, outs = traj(weights, args, C0, xs_)
            return jnp.mean((outs - tgt) ** 2)

        return f

    g_f = jax.grad(loss(gtraj_f), argnums=(0, 1))(weights0, xs)
    g_c = jax.grad(loss(gtraj_c), argnums=(0, 1))(weights0, xs)
    for fk in weights0:
        a, b = np.asarray(g_f[0][fk]), np.asarray(g_c[0][fk])
        assert np.abs(a).max() > 0, f"zero grad for {fk}"
        np.testing.assert_allclose(b, a, atol=1e-9 * max(np.abs(a).max(), 1.0),
                                   err_msg=fk)
    np.testing.assert_allclose(np.asarray(g_c[1]), np.asarray(g_f[1]),
                               rtol=1e-10, atol=1e-14)


def test_fit_bptt_graph_remat_matches_full():
    """fit_bptt(remat_steps=) on a multi-population net routes through the
    CHUNKED graph trajectory and matches the full-residual fused run."""
    rng = np.random.default_rng(32)
    n, T = 8, 120
    W1 = rng.normal(size=(n, n)) * 0.2
    W2 = rng.normal(size=(n, n)) * 0.2
    We = rng.normal(size=(n, n)) * 0.4
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def fit(**kw):
        net = Network(1e-2, dtype=jnp.float64)
        for label, W in [("p1", W1), ("p2", W2)]:
            net.add_diffeq_node(label, TANH, weights=W, input_var="li_op/I_ext",
                                output_var="li_op/v", source_var="tanh_op/r",
                                target_var="li_op/r_in", train_params=["weights"])
        net.add_edge("p1", "p2", weights=We, train="gd")
        obs = net.fit_bptt([inp] * 4, [tgt] * 4, optimizer="adam", lr=1e-2,
                           verbose=False, **kw)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_node("p1")["weights"]),
                np.asarray(net.get_edge("p1", "p2").weights))

    l_f, w1_f, we_f = fit()
    l_c, w1_c, we_c = fit(remat_steps=30)
    np.testing.assert_allclose(l_c, l_f, rtol=1e-8)
    np.testing.assert_allclose(w1_c, w1_f, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(we_c, we_f, rtol=1e-6, atol=1e-10)
    assert l_f[-1] < l_f[0]


def test_graph_bptt_diagonal_masked_edge_matches_plain():
    """A LinearMasked edge with 1-D diagonal gains: the effective weight
    w * mask is 2-D (make_step's (w*mask) @ x semantics), so the deferred
    stage must use the matmul contraction and reduce the weight cotangent
    back to the per-source axis.  Regression: this configuration crashed
    while tracing the fused update program ('Cannot broadcast to shape with
    fewer dimensions')."""
    n, T, K = 6, 80, 4
    rng = np.random.default_rng(37)
    W0 = rng.normal(size=(n, n)) * 0.3
    gains = rng.uniform(0.5, 1.5, n)
    mask = (rng.random((n, n)) < 0.6).astype(float)
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.2

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("a", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        net.add_diffeq_node("b", TANH, weights=W0 * 0.5,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in")
        net.add_edge("a", "b", weights=gains, mask=mask, train="gd")
        obs = net.fit_bptt(inp, tgt, optimizer="adam", lr=1e-2,
                           update_steps=20, verbose=False, fused_bptt=fused)
        return (np.asarray(obs["loss"]),
                np.asarray(net.get_edge("a", "b").params["weights"]))

    l_f, w_f = fit(True)
    l_p, w_p = fit(False)
    assert w_f.ndim == 1, "diagonal gains must stay 1-D through training"
    np.testing.assert_allclose(l_f, l_p, rtol=1e-8)
    np.testing.assert_allclose(w_f, w_p, rtol=1e-6, atol=1e-10)
    assert np.abs(w_f - gains).max() > 1e-6, "masked diagonal edge did not train"


def test_single_population_feedback_self_edge_trains():
    """REGRESSION (latent until round 4): a SINGLE-population FeedbackNetwork
    with a trainable feedback self-edge took the fb-UNAWARE chain trajectory
    (the len(order)==1 shortcut skipped _chain_decompose's fb check) -- the
    trained forward silently dropped the feedback edge: wrong loss, exactly
    zero fb-weight gradient.  Now: fused=auto must match plain autodiff and
    actually move the fb weights."""
    from rectipy_tpu import FeedbackNetwork

    n, T = 6, 80
    rng = np.random.default_rng(31)
    W_fb = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def fit(fused):
        net = FeedbackNetwork(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=np.zeros((n, n)),
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in")
        net.add_edge("rnn", "rnn", weights=W_fb, feedback=True, train="gd")
        obs = net.fit_bptt([inp] * 5, [tgt] * 5, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_edge("rnn", "rnn").weights))

    l_auto, w_auto = fit("auto")
    l_plain, w_plain = fit(False)
    np.testing.assert_allclose(l_auto, l_plain, rtol=1e-9)
    np.testing.assert_allclose(w_auto, w_plain, rtol=1e-7)
    assert np.abs(w_auto - W_fb).max() > 1e-6, "fb weights did not train"
    assert l_auto[-1] < l_auto[0], "loss did not decrease"


@pytest.mark.parametrize("topology", [
    "single",            # one population, no edges (chain shortcut)
    "chain",             # inp -> pop -> readout (chain trajectory)
    "fb_self",           # single pop + Linear feedback self-edge
    "fb_self_delay",     # single pop + per-source delay feedback self-edge
    "fb_self_matrix",    # single pop + per-CONNECTION delay fb self-edge
    "dag_fb",            # two populations + cross feedback (graph traj)
    "chain_delay",       # inp -(delay edge)-> pop (graph traj)
])
def test_fused_auto_matches_plain_across_topologies(topology):
    """Trajectory-dispatch sweep: whatever fast path fused_bptt='auto' picks
    for a topology (chain custom-VJP, graph trajectory, or the plain
    fallback), epoch losses and trained weights must equal plain autodiff.
    Guards the dispatch matrix itself -- the round-4 single-population
    feedback bug was exactly a dispatch hole (the fb-unaware chain shortcut),
    invisible to per-trajectory gradient-parity tests."""
    from rectipy_tpu import FeedbackNetwork

    import zlib

    seed = zlib.crc32(topology.encode())  # hash() is salted per process
    n, T = 5, 60
    rng = np.random.default_rng(seed)
    inp_w = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def build():
        net = FeedbackNetwork(1e-2, dtype=jnp.float64)
        if topology == "chain":
            net.add_func_node("inp", n, activation_function="identity")
        if topology == "chain_delay":
            net.add_func_node("inp", n, activation_function="identity")
        net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.2,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            train_params=["weights"])
        if topology == "chain":
            net.add_edge("inp", "rnn", weights=np.eye(n))
        elif topology == "chain_delay":
            net.add_edge("inp", "rnn", weights=np.eye(n),
                         delays=rng.integers(0, 4, size=n), train="gd")
        elif topology == "fb_self":
            net.add_edge("rnn", "rnn", weights=rng.normal(size=(n, n)) * 0.2,
                         feedback=True, train="gd")
        elif topology == "fb_self_delay":
            net.add_edge("rnn", "rnn", weights=rng.normal(size=(n, n)) * 0.2,
                         delays=rng.integers(0, 4, size=n), feedback=True,
                         train="gd")
        elif topology == "fb_self_matrix":
            net.add_edge("rnn", "rnn", weights=rng.normal(size=(n, n)) * 0.2,
                         delays=rng.integers(0, 4, size=(n, n)), feedback=True,
                         train="gd")
        elif topology == "dag_fb":
            net.add_diffeq_node("rnn2", TANH,
                                weights=rng.normal(size=(n, n)) * 0.2,
                                input_var="li_op/I_ext", output_var="li_op/v",
                                source_var="tanh_op/r",
                                target_var="li_op/r_in")
            net.add_edge("rnn", "rnn2", weights=rng.normal(size=(n, n)) * 0.3,
                         train="gd")
            net.add_edge("rnn2", "rnn", weights=rng.normal(size=(n, n)) * 0.1,
                         feedback=True)
        net.compile()
        return net

    def fit(fused):
        net = build()
        obs = net.fit_bptt([inp_w] * 4, [tgt] * 4, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        losses = np.asarray(obs["epoch_loss"])
        w = np.asarray(net.get_node("rnn")["weights"])
        return losses, w

    # build() consumes rng draws; rebuild identically per fit by reseeding
    rng = np.random.default_rng(seed)
    l_auto, w_auto = fit("auto")
    rng = np.random.default_rng(seed)
    l_plain, w_plain = fit(False)
    np.testing.assert_allclose(l_auto, l_plain, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(w_auto, w_plain, rtol=1e-6, atol=1e-12)
    assert l_auto[-1] < l_auto[0], f"{topology}: loss did not decrease"


def test_step_mode_single_population_feedback_matches_plain():
    """Step-mode (truncated BPTT) variant of the single-population feedback
    regression: the chunk-loss builder has its own chain shortcut, which must
    also exclude feedback edges."""
    from rectipy_tpu import FeedbackNetwork

    n, T = 5, 120
    rng = np.random.default_rng(33)
    W_fb = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def fit(fused):
        net = FeedbackNetwork(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=np.zeros((n, n)),
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in")
        net.add_edge("rnn", "rnn", weights=W_fb, feedback=True, train="gd")
        obs = net.fit_bptt(inp, tgt, optimizer="adam", lr=1e-2,
                           update_steps=30, verbose=False, fused_bptt=fused)
        return np.asarray(net.get_edge("rnn", "rnn").weights)

    w_auto = fit("auto")
    w_plain = fit(False)
    np.testing.assert_allclose(w_auto, w_plain, rtol=1e-7)
    assert np.abs(w_auto - W_fb).max() > 1e-7, "fb weights did not train"


def test_graph_traj_block_sparse_edge_matches_plain():
    """BlockSparseLinear edges (stateless AND per-block delayed) ride the
    deferred-gradient graph trajectory: epoch, step-mode (chunks shorter
    than the delay span -- exercises the circular<->rolled estate
    pack/unpack round trips), and remat all match plain autodiff, and the
    bf16 block stream keeps fused == plain.  Covers the round-4 extension
    of make_graph_traj beyond the Linear* family (the edge itself is a
    beyond-reference component, edges.py BlockSparseLinear)."""
    from types import SimpleNamespace

    from rectipy_tpu import FeedbackNetwork

    rng = np.random.default_rng(11)
    n_br = cb = 2
    bs, nb_in = 4, 2
    n = 8
    W = SimpleNamespace(
        blocks=0.1 * rng.standard_normal((n_br, cb, bs, bs)),
        cols=np.stack([rng.permutation(nb_in)[:cb] for _ in range(n_br)]))
    d_blk = rng.integers(0, 6, size=(n_br, cb))
    inp = rng.normal(size=(40, n))

    def build(delays, dtype=np.float64, **kw):
        net = FeedbackNetwork(1e-2)
        net.add_diffeq_node(
            "pop", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((n, n)), source_var="tanh_op/r",
            target_var="li_op/r_in", input_var="li_op/I_ext",
            output_var="li_op/v", verbose=False, clear=True, file_name="gbs")
        net.add_edge("pop", "pop", weights=W, delays=delays, feedback=True,
                     train="gd", dtype=dtype, **kw)
        net.compile()
        return net

    for delays in (None, d_blk):
        tgt = np.asarray(build(delays).run(
            inp, verbose=False, sampling_steps=1).to_numpy("out"))

        def fit(fused, mode, delays=delays, tgt=tgt, **ekw):
            net = build(delays, **ekw)
            edge = net.get_edge("pop", "pop")
            edge.weights = np.asarray(edge.weights) * 1.3
            if mode == "steps":  # update_steps < max delay span
                obs = net.fit_bptt(inp, tgt, optimizer="sgd", lr=1e-2,
                                   update_steps=5, verbose=False,
                                   fused_bptt=fused)
                losses = np.asarray(obs["loss"], dtype=float)
            else:
                kw = {"remat_steps": 8} if mode == "remat" else {}
                obs = net.fit_bptt([inp] * 4, [tgt] * 4, optimizer="sgd",
                                   lr=1e-2, verbose=False, fused_bptt=fused,
                                   **kw)
                losses = np.asarray(obs["epoch_loss"], dtype=float)
            return losses, np.asarray(net.get_edge("pop", "pop").weights)

        for mode in ("epoch", "steps", "remat"):
            # fused_bptt=True raises on fallback => proves the graph
            # trajectory really covers this edge
            l_f, w_f = fit(True, mode)
            l_p, w_p = fit(False, mode)
            np.testing.assert_allclose(l_f, l_p, rtol=1e-8, atol=1e-12,
                                       err_msg=f"{mode} losses diverge")
            np.testing.assert_allclose(w_f, w_p, rtol=1e-7, atol=1e-12,
                                       err_msg=f"{mode} weights diverge")
            assert np.abs(w_f - np.asarray(W.blocks) * 1.3).max() > 1e-9, \
                "blocks did not train"

        # reduced-precision block stream: fused == plain exactly (the cast
        # sits inside both differentiated regions; bf16-master semantics)
        l_f, w_f = fit(True, "epoch", dtype=np.float32,
                       block_dtype="bfloat16")
        l_p, w_p = fit(False, "epoch", dtype=np.float32,
                       block_dtype="bfloat16")
        np.testing.assert_allclose(l_f, l_p, rtol=1e-6)
        np.testing.assert_allclose(w_f, w_p, rtol=1e-5, atol=1e-8)


def test_graph_traj_block_edge_state_roundtrip():
    """The trajectory's rolled block-delay buffer converts exactly to and
    from the edge's circular (hist, t) form: after a trajectory pass the
    unpacked state equals the composed run's edge state (slot-for-slot),
    including a first chunk SHORTER than the delay buffer (never-written
    slots stay zero)."""
    from types import SimpleNamespace

    from rectipy_tpu import FeedbackNetwork
    from rectipy_tpu.network import _graph_weights_args

    rng = np.random.default_rng(3)
    n_br = cb = 2
    bs, nb_in = 4, 2
    n = 8
    W = SimpleNamespace(
        blocks=0.1 * rng.standard_normal((n_br, cb, bs, bs)),
        cols=np.stack([rng.permutation(nb_in)[:cb] for _ in range(n_br)]))
    d_blk = rng.integers(0, 6, size=(n_br, cb))

    def build():
        net = FeedbackNetwork(1e-2)
        net.add_diffeq_node(
            "pop", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((n, n)), source_var="tanh_op/r",
            target_var="li_op/r_in", input_var="li_op/I_ext",
            output_var="li_op/v", verbose=False, clear=True, file_name="gbs2")
        net.add_edge("pop", "pop", weights=W, delays=d_blk, feedback=True,
                     train="gd", dtype=np.float64)
        net.compile()
        return net

    for T in (3, 40):  # shorter AND longer than the delay buffer
        inp = rng.normal(size=(T, n))
        net_a = build()
        gtraj, gspec = make_graph_traj(net_a)
        ek = gspec.stateful_edges[0]
        params = {"nodes": {"pop": dict(net_a.get_node("pop").args)},
                  "edges": {"pop->pop":
                            dict(net_a.get_edge("pop", "pop").params)}}
        weights, args = _graph_weights_args(gspec, params)
        state0 = net_a.init_state()
        C0 = {"Y": {"pop": state0["nodes"]["pop"]},
              "fb": state0.get("fb", {}),
              "E": {ek: gspec.estate_pack[ek](state0["edges"][ek])}}
        CT, outs = gtraj(weights, args, C0, jnp.asarray(inp))
        hist_t, t_t = gspec.estate_unpack[ek](CT["E"][ek],
                                              state0["edges"][ek], T)

        net_b = build()
        full = net_b.run(inp, verbose=False, sampling_steps=1).to_numpy("out")
        hist_r, t_r = net_b.get_edge("pop", "pop").init_state()
        np.testing.assert_allclose(np.asarray(outs), np.asarray(full),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(hist_t), np.asarray(hist_r),
                                   rtol=1e-6, atol=1e-8)
        assert int(t_t) == int(t_r) == T


def test_graph_traj_coupling_free_population_block_delay_fb():
    """A population with NO internal coupling (weights=None) whose entire
    recurrent coupling rides a delayed BlockSparseLinear feedback self-edge
    -- the N=100k showcase topology (benchmarks/block_delay_scale.py).
    Round-5 regression: _node_pieces refused coupling-free nodes, so
    fused_bptt='auto' silently fell back to plain autodiff and the fused
    path was never exercised (measured auto == plain at 2473 ms/epoch on
    chip).  The graph trajectory must (a) build, (b) match plain autodiff's
    losses and trained blocks exactly."""
    from rectipy_tpu import FeedbackNetwork
    from rectipy_tpu.ops.sparse import block_random_connectivity

    N, BS, dmax, T = 128, 32, 5, 500
    nb = N // BS

    def build():
        A = block_random_connectivity(N, N, 16, block_size=BS, seed=0)
        ring = np.abs(A.cols - np.arange(nb)[:, None])
        ring = np.minimum(ring, nb - ring).astype(float)
        d_blk = np.rint(ring / max(ring.max(), 1.0) * dmax).astype(int)
        rng = np.random.default_rng(1)
        net = FeedbackNetwork(1e-3, dtype=jnp.float64)
        net.add_func_node("inp", 1, activation_function="identity")
        net.add_diffeq_node(
            "qif", QIF, n=N, input_var="I_ext", output_var="s",
            spike_var="spike", spike_def="v", op="qif_op",
            spike_threshold=1e2, spike_reset=-1e2, float_precision="float64",
            node_vars={"all/qif_op/eta":
                       1000.0 + 200.0 * rng.standard_normal(N)})
        net.add_edge("inp", "qif",
                     weights=np.random.default_rng(7).normal(size=(N, 1)))
        net.add_edge("qif", "qif", weights=A, delays=d_blk, feedback=True,
                     train="gd")
        net.compile()
        return net

    gtraj, gspec = make_graph_traj(build())  # (a) must not raise
    assert gspec.pop_labels == ["qif"] and gspec.stateful_edges == ["qif->qif"]

    ins = np.zeros((T, 1))
    ins[T // 4:, 0] = 3.0
    tgt = np.asarray(build().run(ins, verbose=False).to_numpy("out"))
    assert np.abs(tgt).max() > 0, "teacher must spike for a meaningful fit"
    res = {}
    for mode, fb in (("auto", "auto"), ("plain", False)):
        net_t = build()
        e = net_t.get_edge("qif", "qif")
        e.weights = e.weights * 1.5
        obs = net_t.fit_bptt([ins] * 3, [tgt] * 3, optimizer="adam", lr=1e-4,
                             verbose=False, fused_bptt=fb)
        res[mode] = ([float(l) for l in obs["epoch_loss"]],
                     np.asarray(net_t.get_edge("qif", "qif").weights))
    assert res["auto"][0][0] > 0
    np.testing.assert_allclose(res["auto"][0], res["plain"][0], rtol=1e-8)
    np.testing.assert_allclose(res["auto"][1], res["plain"][1], rtol=1e-8)


def test_block_edge_int8_master_fused_matches_plain():
    """block_dtype='int8_master' on a delayed BlockSparseLinear edge: the
    deferred graph trajectory (prep-quantized master + explicit STE
    contractions) must match plain autodiff (per-step STE apply) -- same
    losses, same trained blocks -- and the quantized forward must track the
    f32 forward closely."""
    from rectipy_tpu import FeedbackNetwork
    from rectipy_tpu.edges import BlockSparseLinear
    from rectipy_tpu.ops.sparse import block_random_connectivity

    N, BS, dmax, T = 128, 32, 5, 500
    nb = N // BS

    def build(bdtype=None):
        A = block_random_connectivity(N, N, 16, block_size=BS, seed=0)
        ring = np.abs(A.cols - np.arange(nb)[:, None])
        ring = np.minimum(ring, nb - ring).astype(float)
        d_blk = np.rint(ring / max(ring.max(), 1.0) * dmax).astype(int)
        rng = np.random.default_rng(1)
        net = FeedbackNetwork(1e-3)
        net.add_func_node("inp", 1, activation_function="identity")
        net.add_diffeq_node(
            "qif", QIF, n=N, input_var="I_ext", output_var="s",
            spike_var="spike", spike_def="v", op="qif_op",
            spike_threshold=1e2, spike_reset=-1e2,
            node_vars={"all/qif_op/eta":
                       1000.0 + 200.0 * rng.standard_normal(N)})
        net.add_edge("inp", "qif", weights=np.random.default_rng(7)
                     .normal(size=(N, 1)).astype(np.float32))
        kw = {"block_dtype": bdtype} if bdtype else {}
        net.add_edge("qif", "qif", weights=A, delays=d_blk, feedback=True,
                     train="gd", **kw)
        net.compile()
        return net

    ins = np.zeros((T, 1), dtype=np.float32)
    ins[T // 4:, 0] = 3.0
    # quantized forward tracks f32 (trajectory correlation)
    out_f32 = np.asarray(build().run(ins, verbose=False).to_numpy("out"))
    out_i8 = np.asarray(build("int8_master").run(ins, verbose=False)
                        .to_numpy("out"))
    corr = np.corrcoef(out_f32.ravel(), out_i8.ravel())[0, 1]
    assert corr > 0.99, f"int8 forward diverged from f32: corr {corr}"

    tgt = out_i8
    res = {}
    for mode, fb in (("auto", "auto"), ("plain", False)):
        net_t = build("int8_master")
        e = net_t.get_edge("qif", "qif")
        assert isinstance(e, BlockSparseLinear) and e._int8_master
        e.weights = e.weights * 1.5
        obs = net_t.fit_bptt([ins] * 3, [tgt] * 3, optimizer="adam", lr=1e-4,
                             verbose=False, fused_bptt=fb)
        res[mode] = ([float(l) for l in obs["epoch_loss"]],
                     np.asarray(net_t.get_edge("qif", "qif").weights))
    assert res["auto"][0][0] > 0
    np.testing.assert_allclose(res["auto"][0], res["plain"][0], rtol=1e-5)
    np.testing.assert_allclose(res["auto"][1], res["plain"][1],
                               rtol=1e-4, atol=1e-8)
    # training must move the blocks (nonzero STE gradients)
    assert np.abs(res["auto"][1] - np.asarray(
        build("int8_master").get_edge("qif", "qif").weights) * 1.5).max() > 0
