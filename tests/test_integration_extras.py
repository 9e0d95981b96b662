"""Integration coverage for remaining API surfaces: delay/filter/masked edges
inside Network runs (edge state carried through the scan and across run
calls), Observer.recordings, debugging helpers."""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network
from rectipy_tpu.debugging import check_finite_state, find_nonfinite
from rectipy_tpu.edges import LinearMemory

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"


def _rnn(net, n, W, **kw):
    net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", **kw)


def test_delay_edge_in_network_run():
    """A delay edge shifts the input drive by per-source delays; the ring
    buffer is scan-carried and persists across run() calls."""
    n = 3
    dt = 1e-2
    delays = np.array([0, 2, 4])

    def build(with_delay):
        net = Network(dt, dtype=jnp.float64)
        net.add_func_node("inp", n, activation_function="identity")
        _rnn(net, n, np.zeros((n, n)))
        if with_delay:
            net.add_edge("inp", "rnn", weights=np.eye(n), delays=delays)
        else:
            net.add_edge("inp", "rnn", weights=np.eye(n))
        net.compile()
        return net

    T = 12
    inp = np.zeros((T, n))
    inp[0] = 1.0  # impulse on all channels at t=0
    net_d = build(True)
    out_d = net_d.run(inp, verbose=False).to_numpy("out")
    out_p = build(False).run(inp, verbose=False).to_numpy("out")
    # channel i of the delayed net must match channel i of the plain net
    # shifted by delays[i]
    for i, d in enumerate(delays):
        np.testing.assert_allclose(out_d[d:, i], out_p[: T - d, i], atol=1e-12)
        np.testing.assert_allclose(out_d[:d, i], 0.0, atol=1e-12)

    # buffer state persists: a second run continues where the first ended
    edge = net_d.get_edge("inp", "rnn")
    assert isinstance(edge, LinearMemory)
    buf_after = np.asarray(edge.buffer)
    inp2 = np.zeros((3, n))
    inp2[0] = 2.0
    net_d.run(inp2, verbose=False)
    assert not np.allclose(np.asarray(edge.buffer), buf_after)


def test_filter_and_masked_edges_in_network():
    n, m = 4, 4
    rng = np.random.default_rng(0)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("inp", m, activation_function="identity")
    _rnn(net, n, np.zeros((n, n)))
    F = np.eye(m) * 0.5
    net.add_edge("inp", "rnn", weights=np.eye(n), filter_weights=F)
    out = net.run(rng.normal(size=(10, m)), verbose=False).to_numpy("out")
    assert np.all(np.isfinite(out))

    net2 = Network(1e-2, dtype=jnp.float64)
    net2.add_func_node("inp", m, activation_function="identity")
    _rnn(net2, n, np.zeros((n, n)))
    mask = (rng.random((n, m)) > 0.5).astype(float)
    net2.add_edge("inp", "rnn", weights=rng.normal(size=(n, m)), mask=mask, train="gd")
    assert net2.get_edge("inp", "rnn").train_keys == ["weights"]
    out2 = net2.run(rng.normal(size=(10, m)), verbose=False).to_numpy("out")
    assert np.all(np.isfinite(out2))


def test_observer_recordings_dataframe():
    n = 4
    net = Network(1e-2, dtype=jnp.float64)
    _rnn(net, n, np.zeros((n, n)))
    obs = net.run(np.ones((20, n)), sampling_steps=5, verbose=False,
                  record_vars=[("rnn", "v", True)])
    df = obs.recordings
    assert len(df) == 4
    assert df.index[1] == pytest.approx(5 * 1e-2)


def test_debugging_helpers():
    n = 4
    net = Network(1e-2, dtype=jnp.float64)
    _rnn(net, n, np.zeros((n, n)))
    net.compile()
    assert check_finite_state(net) == {}
    # poison the state
    net.get_node("rnn").y = net.get_node("rnn").y.at[0].set(jnp.nan)
    with pytest.raises(FloatingPointError):
        check_finite_state(net)
    bad = check_finite_state(net, raise_on_failure=False)
    assert any("rnn" in k for k in bad)
    assert find_nonfinite({"x": jnp.ones(3)}) == {}


def test_run_batch_matches_sequential_runs():
    n, m, B, T = 5, 2, 3, 30
    rng = np.random.default_rng(1)
    W = rng.normal(size=(n, n)) * 0.2
    W_in = rng.normal(size=(n, m))

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("in", m, activation_function="identity")
        _rnn(net, n, W)
        net.add_edge("in", "rnn", weights=W_in)
        net.compile()
        return net

    inputs = rng.normal(size=(B, T, m))
    res = build().run_batch(inputs, sampling_steps=2, record_vars=[("rnn", "v", True)])
    assert res["out"].shape == (B, T // 2, n)
    for b in range(B):
        net = build()
        obs = net.run(inputs[b], sampling_steps=2, verbose=False,
                      record_vars=[("rnn", "v", True)])
        np.testing.assert_allclose(res["out"][b], obs.to_numpy("out"), atol=1e-12)
        np.testing.assert_allclose(res[("rnn", "v")][b], obs.to_numpy(("rnn", "v")),
                                   atol=1e-12)


def test_observer_plot_and_matshow():
    import matplotlib

    matplotlib.use("Agg")
    n = 4
    net = Network(1e-2, dtype=jnp.float64)
    _rnn(net, n, np.zeros((n, n)))
    obs = net.run(np.ones((20, n)), sampling_steps=2, verbose=False,
                  record_vars=[("rnn", "v", False)])
    ax = obs.plot("out")
    assert ax.get_xlabel() == "time"
    ax2 = obs.plot(("rnn", "v"))
    assert "rnn" in ax2.get_ylabel()
    ax3 = obs.matshow(("rnn", "v"))
    assert ax3.get_xlabel() == "time"
    # save/retrieve arbitrary objects
    obs.save("meta", {"k": 1})
    assert obs["meta"] == {"k": 1}
    df = obs.to_dataframe("out")
    assert len(df) == 10


def test_example_bptt_spiking_recurrent_smoke(monkeypatch):
    """Reference workload port (bptt_spiking_neurons_recurrent.py) at smoke
    scale: teacher/student LIF BPTT reduces the loss."""
    import pathlib
    import runpy

    monkeypatch.setenv("LIF_N", "6")
    monkeypatch.setenv("LIF_STEPS", "800")
    monkeypatch.setenv("LIF_EPOCHS", "200")
    path = pathlib.Path(__file__).resolve().parent.parent / "examples" / "bptt_spiking_recurrent.py"
    runpy.run_path(str(path), run_name="__main__")  # asserts internally


def test_example_rl_online_learning_smoke(monkeypatch):
    """Reference workload port (rl_example.py) at smoke scale: online
    learning converges and the frozen readout beats the mean predictor."""
    import pathlib
    import runpy

    monkeypatch.setenv("RL_N", "100")
    monkeypatch.setenv("RL_STEPS", "60000")
    monkeypatch.setenv("RL_TEST_STEPS", "10000")
    path = pathlib.Path(__file__).resolve().parent.parent / "examples" / "rl_online_learning.py"
    runpy.run_path(str(path), run_name="__main__")  # asserts internally


def test_mixed_session_interleaved_apis_consistent(capsys):
    """A realistic user session interleaves run(), epoch-mode and step-mode
    fits (verbose and not) on ONE network: the per-API program caches must
    not interfere, and every result must equal the same sequence on fresh
    networks."""
    import jax.numpy as jnp

    from rectipy_tpu import Network

    TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
    n, T = 8, 48
    rng = np.random.default_rng(44)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        return net

    def session(net):
        o1 = net.run(inp, verbose=False).to_numpy("out")
        net.reset()
        l1 = net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2,
                          verbose=False)["epoch_loss"]
        o2 = net.fit_bptt(inp, tgt, update_steps=16, optimizer="adam",
                          lr=1e-2, verbose=False)
        net.reset()
        l2 = net.fit_bptt([inp] * 3, [tgt] * 3, optimizer="adam", lr=1e-2,
                          verbose=True)["epoch_loss"]  # verbose loop path
        o3 = net.run(inp, verbose=False).to_numpy("out")
        return o1, np.asarray(l1), np.asarray(o2["loss"]), np.asarray(l2), o3

    rA = session(build())
    rB = session(build())
    for a, b, name in zip(rA, rB, ["run", "epoch fit", "step fit",
                                   "verbose epoch fit", "final run"]):
        np.testing.assert_allclose(a, b, rtol=1e-10, err_msg=name)
    assert "training epochs finished" in capsys.readouterr().out


def test_delay_matrix_edge_in_network():
    """Per-connection delay matrices (LinearMemoryMatrix): add_edge dispatch,
    column-constant equivalence to the per-source edge, and buffer
    persistence across chunked run() calls."""
    from rectipy_tpu.edges import LinearMemoryMatrix

    n = 3
    dt = 1e-2
    rng = np.random.default_rng(11)
    W = rng.normal(size=(n, n))
    T = 20
    inp = rng.normal(size=(T, n))

    def build(delays):
        net = Network(dt, dtype=jnp.float64)
        net.add_func_node("inp", n, activation_function="identity")
        _rnn(net, n, np.zeros((n, n)))
        net.add_edge("inp", "rnn", weights=W, delays=delays)
        net.compile()
        return net

    # column-constant matrix (d_ij = d_j) must equal the per-source edge
    d_src = np.array([0, 2, 4])
    net_m = build(np.tile(d_src[:, None], (1, n)))  # given[j,i]=d_src[j]
    assert isinstance(net_m.get_edge("inp", "rnn"), LinearMemoryMatrix)
    out_m = net_m.run(inp, verbose=False).to_numpy("out")
    out_s = build(d_src).run(inp, verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_m, out_s, atol=1e-12)

    # general matrix: chunked runs == one run (buffer scan-carry + write-back)
    D = rng.integers(0, 5, size=(n, n))
    net_a, net_b = build(D), build(D)
    out_full = net_a.run(inp, verbose=False).to_numpy("out")
    out_1 = net_b.run(inp[:8], verbose=False).to_numpy("out")
    out_2 = net_b.run(inp[8:], verbose=False).to_numpy("out")
    np.testing.assert_allclose(np.concatenate([out_1, out_2]), out_full,
                               atol=1e-12)

    # 2-D delays + filter_weights is an explicit error
    net = Network(dt, dtype=jnp.float64)
    net.add_func_node("inp", n, activation_function="identity")
    _rnn(net, n, np.zeros((n, n)))
    with pytest.raises(ValueError):
        net.add_edge("inp", "rnn", weights=W, delays=D,
                     filter_weights=np.eye(n))


def test_delay_matrix_feedback_self_edge():
    """A delay-matrix feedback self-edge (the whole-brain wiring pattern):
    column-constant matrix == per-source delays through the feedback path."""
    from rectipy_tpu import FeedbackNetwork

    n = 4
    dt = 1e-2
    rng = np.random.default_rng(5)
    W = rng.normal(size=(n, n)) * 0.4
    d_src = np.array([1, 3, 2, 1])
    T = 30
    inp = rng.normal(size=(T, n))

    def build(delays):
        net = FeedbackNetwork(dt, dtype=jnp.float64)
        _rnn(net, n, np.zeros((n, n)))
        net.add_edge("rnn", "rnn", weights=W, delays=delays, feedback=True)
        net.compile()
        return net

    out_m = build(np.tile(d_src[:, None], (1, n))).run(inp,
                  verbose=False).to_numpy("out")
    out_s = build(d_src).run(inp, verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_m, out_s, atol=1e-12)
    assert np.all(np.isfinite(out_m))


def test_delay_matrix_edge_trains_via_bptt():
    """fit_bptt differentiates through the per-connection delay gather (the
    graph trajectory refuses the class -> plain-autodiff fallback)."""
    n = 3
    dt = 1e-2
    rng = np.random.default_rng(2)
    D = rng.integers(0, 4, size=(n, n))
    W0 = rng.normal(size=(n, n))

    net = Network(dt, dtype=jnp.float64)
    net.add_func_node("inp", n, activation_function="identity")
    _rnn(net, n, np.zeros((n, n)))
    net.add_edge("inp", "rnn", weights=W0, delays=D, train="gd")
    net.compile()

    T = 40
    inp = rng.normal(size=(T, n))
    tgt = 0.3 * np.ones((T, n))
    obs = net.fit_bptt([inp] * 6, [tgt] * 6, optimizer="adam", lr=5e-2,
                       verbose=False)
    losses = [float(l) for l in obs["epoch_loss"]]
    assert losses[-1] < losses[0], losses
    W_new = np.asarray(net.get_edge("inp", "rnn").weights)
    assert not np.allclose(W_new, W0)


def test_delay_matrix_edge_run_batch():
    """The delay-matrix buffer vmaps: a trial batch through a per-connection
    delay edge equals per-trial sequential runs."""
    n = 3
    dt = 1e-2
    rng = np.random.default_rng(4)
    D = rng.integers(0, 5, size=(n, n))
    W = rng.normal(size=(n, n))

    def build():
        net = Network(dt, dtype=jnp.float64)
        net.add_func_node("inp", n, activation_function="identity")
        _rnn(net, n, np.zeros((n, n)))
        net.add_edge("inp", "rnn", weights=W, delays=D)
        net.compile()
        return net

    B, T = 3, 15
    inputs = rng.normal(size=(B, T, n))
    batch = build().run_batch(inputs, verbose=False)
    for b in range(B):
        solo = build().run(inputs[b], verbose=False).to_numpy("out")
        np.testing.assert_allclose(batch["out"][b], solo, atol=1e-12)


def test_delay_matrix_onehots_are_prep_arguments_not_constants():
    """The one-hot selectors must flow through the prep pass (program
    ARGUMENTS), never closure constants: at connectome scale they are
    hundreds of MB and the tunneled remote compile rejects programs that
    embed them (HTTP 413 measured at M=998)."""
    from rectipy_tpu.edges import LinearMemoryMatrix

    n = 4
    rng = np.random.default_rng(0)
    D = rng.integers(0, 6, size=(n, n))

    for mode, keys in [("onehot", {"_oh"}), ("factored", {"_oh_q", "_oh_r"})]:
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", n, activation_function="identity")
        _rnn(net, n, np.zeros((n, n)))
        edge = net.add_edge("inp", "rnn", weights=np.eye(n), delays=D, mode=mode)
        net.compile()
        assert isinstance(edge, LinearMemoryMatrix) and edge.mode == mode
        raw = net.parameters_pytree()
        assert not (keys & set(raw["edges"]["inp->rnn"]))  # not persistent
        prepped = net._prep_params(raw)
        assert keys <= set(prepped["edges"]["inp->rnn"])
        # prep is idempotent (second pass reuses the injected selectors)
        again = net._prep_params(prepped)
        for k in keys:
            assert again["edges"]["inp->rnn"][k] is prepped["edges"]["inp->rnn"][k]


def test_delay_matrix_training_mode_invariant():
    """fit_bptt losses are identical across read modes (the selectors are
    exact), proving the plain-autodiff path's hoisted edge prep is
    gradient-neutral."""
    n = 3
    dt = 1e-2
    rng = np.random.default_rng(9)
    D = rng.integers(0, 4, size=(n, n))
    W0 = rng.normal(size=(n, n))
    inp = rng.normal(size=(40, n))
    tgt = 0.2 * np.ones((40, n))

    def fit(mode):
        net = Network(dt, dtype=jnp.float64)
        net.add_func_node("inp", n, activation_function="identity")
        _rnn(net, n, np.zeros((n, n)))
        net.add_edge("inp", "rnn", weights=W0, delays=D, train="gd", mode=mode)
        net.compile()
        obs = net.fit_bptt([inp] * 4, [tgt] * 4, optimizer="adam", lr=5e-2,
                           verbose=False)
        return [float(l) for l in obs["epoch_loss"]], \
            np.asarray(net.get_edge("inp", "rnn").weights)

    l_g, w_g = fit("gather")
    l_f, w_f = fit("factored")
    np.testing.assert_allclose(l_f, l_g, rtol=1e-12)
    np.testing.assert_allclose(w_f, w_g, rtol=1e-10)
    assert l_g[-1] < l_g[0]


def test_trainable_delays_recover_teacher():
    """Differentiable conduction delays (mode='interp', train_delays=True):
    fit_bptt recovers a teacher's FRACTIONAL delay matrix through the
    triangular-kernel read -- the delays themselves are BPTT-trained
    alongside the weights (no reference analog of any kind)."""
    n = 3
    rng = np.random.default_rng(5)
    W = rng.normal(size=(n, n))
    d_true = np.array([[0.0, 2.4, 1.2], [3.1, 0.0, 0.7], [1.8, 2.9, 0.0]])
    d_0 = np.full((n, n), 1.5)
    np.fill_diagonal(d_0, 0.0)
    T = 400
    inp = rng.normal(size=(T, n))

    def build(d, train):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", n, activation_function="identity")
        _rnn(net, n, np.zeros((n, n)))
        net.add_edge("inp", "rnn", weights=W, delays=d, mode="interp",
                     train="gd" if train else None, train_delays=train,
                     max_delay=5)
        net.compile()
        return net

    tgt = build(d_true, False).run(inp, verbose=False).to_numpy("out")
    student = build(d_0, True)
    assert ("edges", "inp->rnn", "delays") in student.trainable_paths()
    obs = student.fit_bptt([inp] * 40, [tgt] * 40, optimizer="adam", lr=5e-2,
                           verbose=False)
    losses = [float(l) for l in obs["epoch_loss"]]
    assert losses[-1] < losses[0] * 0.1, losses[::8]
    d_fit = np.asarray(student.get_edge("inp", "rnn").params["delays"])
    off = ~np.eye(n, dtype=bool)
    err0 = np.abs(d_true.T - d_0.T)[off].mean()
    err1 = np.abs(d_true.T - d_fit)[off].mean()
    assert err1 < 0.3 * err0, f"delays not recovered: {err0} -> {err1}"


def test_trainable_delays_factored2_fit_parity(monkeypatch):
    """END-TO-END fit_bptt parity for the TVB-scale interp implementation:
    training weights+delays through the two-point factored read (selected
    past RECTIPY_DELAY_HAT_LIMIT) produces the SAME epoch losses and the
    SAME trained delay matrix as the triangular-hat read -- including under
    remat (chunked gradient checkpointing), the configuration whole-brain
    scale actually needs."""
    n = 4
    rng = np.random.default_rng(11)
    W = rng.normal(size=(n, n))
    d_0 = rng.uniform(0.3, 3.6, size=(n, n))
    T = 60
    inp = rng.normal(size=(T, n))
    tgt = 0.1 * np.ones((T, n))

    def fit(hat_limit, **kw):
        if hat_limit is not None:
            monkeypatch.setenv("RECTIPY_DELAY_HAT_LIMIT", str(hat_limit))
        else:
            monkeypatch.delenv("RECTIPY_DELAY_HAT_LIMIT", raising=False)
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", n, activation_function="identity")
        _rnn(net, n, np.zeros((n, n)))
        edge = net.add_edge("inp", "rnn", weights=W, delays=d_0,
                            mode="interp", train="gd", train_delays=True,
                            max_delay=6)
        net.compile()
        obs = net.fit_bptt([inp] * 4, [tgt] * 4, optimizer="adam", lr=3e-2,
                           verbose=False, **kw)
        return ([float(l) for l in obs["epoch_loss"]],
                np.asarray(net.get_edge("inp", "rnn").params["delays"]),
                edge._interp_impl)

    l_hat, d_hat, impl_hat = fit(None)
    l_f2, d_f2, impl_f2 = fit(1)
    assert impl_hat == "hat" and impl_f2 == "factored2"
    np.testing.assert_allclose(l_f2, l_hat, rtol=1e-10)
    np.testing.assert_allclose(d_f2, d_hat, rtol=1e-8, atol=1e-12)
    assert l_hat[-1] < l_hat[0]

    # chunked gradient checkpointing over the factored2 read (whole-brain
    # scale needs remat: plain residuals are ~T * (M, Q*S) buffers)
    l_f2r, d_f2r, _ = fit(1, remat_steps=20)
    np.testing.assert_allclose(l_f2r, l_hat, rtol=1e-8)
    np.testing.assert_allclose(d_f2r, d_hat, rtol=1e-7, atol=1e-12)
