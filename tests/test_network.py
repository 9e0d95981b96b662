"""Network-level tests, mirroring the reference suite's coverage
(/root/reference/rectipy_tests/test_network.py): node dispatch, compile error
cases, run semantics vs a manual forward loop (including mean-downsampling),
and end-to-end trainer convergence (BPTT / ridge / RLS recover a teacher's
readout weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import FeedbackNetwork, Network
from rectipy_tpu.edges import RLS, Linear
from rectipy_tpu.nodes import InstantNode, RateNet, SpikeResetNet

accuracy = 1e-3

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
QIF = "neuron_model_templates.spiking_neurons.qif.qif"
LIF = "neuron_model_templates.spiking_neurons.lif.lif"


def rate(t, y, I_ext, weights, tau):
    return -y / tau + I_ext + weights @ jnp.tanh(y)


def test_diffeq_nodes():
    n = 10
    rng = np.random.default_rng(0)
    weights = rng.normal(size=(n, n))
    in_var, out_var = "li_op/I_ext", "tanh_op/r"
    s_var, t_var = "tanh_op/r", "li_op/r_in"
    dt = 1e-2

    rnn = RateNet.from_pyrates(TANH, weights=weights, source_var=s_var, target_var=t_var,
                               input_var=in_var, output_var=out_var, dt=dt)

    net1, net3, net4, net5, net6 = (Network(dt) for _ in range(5))
    net1.add_diffeq_node("n1", node=TANH, input_var=in_var, output_var=out_var,
                         weights=weights, source_var=s_var, target_var=t_var)
    net3.add_diffeq_node("n1", TANH, weights=weights, input_var="I_ext", output_var=out_var,
                         source_var=s_var, target_var="r_in", op="li_op")
    net4.add_diffeq_node("n1", TANH, weights=weights, input_var=in_var, output_var=out_var,
                         source_var=s_var, target_var=t_var, train_params=["weights"])
    net5.add_diffeq_node("n1", QIF, weights=weights, input_var="I_ext", output_var="s",
                         source_var="s", target_var="s_in", op="qif_op", spike_var="spike",
                         reset_var="v", dtype=jnp.float32, reset=True)
    net6.add_node("n1", rnn, node_type="diff_eq")

    assert isinstance(net1.get_node("n1"), RateNet)
    assert isinstance(net6.get_node("n1"), RateNet)
    assert isinstance(net5.get_node("n1"), SpikeResetNet)
    assert isinstance(net1["n1"]["node"], RateNet)
    assert net6.get_node("n1") == rnn
    assert len(net3._var_map) - len(net1._var_map) > 0
    assert len(net1.get_node("n1").train_params) == 0
    assert len(net4.get_node("n1").train_params) == 1
    assert net3.get_var("n1", var="v").shape[0] == n
    assert net1.get_node("n1").y.dtype == jnp.float64
    assert net5.get_node("n1").y.dtype == jnp.float32

    with pytest.raises(FileNotFoundError):
        RateNet.from_pyrates("neuron_model_templates.rate_neurons.freaky_integrator.tanh",
                             weights=weights, source_var=s_var, target_var=t_var,
                             input_var=in_var, output_var=out_var)
    with pytest.raises(AttributeError):
        RateNet.from_pyrates("neuron_model_templates.rate_neurons.leaky_integrator.tan",
                             weights=weights, source_var=s_var, target_var=t_var,
                             input_var=in_var, output_var=out_var)
    with pytest.raises(KeyError):
        RateNet.from_pyrates(TANH, weights=weights, source_var="x", target_var=t_var,
                             input_var=in_var, output_var=out_var)


def test_function_nodes():
    m = 3
    net = Network(dt=1e-3)
    for name in ["softmax", "sigmoid", "tanh", "identity", "softmin", "log_softmax"]:
        net.add_func_node(name, m, activation_function=name)
    assert len(net) == 6
    assert isinstance(net.get_node("softmax"), InstantNode)
    with pytest.raises(ValueError):
        net.add_func_node("bad", m, activation_function="not_a_function")


def test_compile_errors():
    n = 4
    net = Network(dt=1e-2)
    net.add_func_node("a", n, activation_function="identity")
    net.add_func_node("b", n, activation_function="identity")
    # two roots, two sinks -> compile must fail
    with pytest.raises(ValueError):
        net.compile()
    net.add_edge("a", "b")
    net.compile()
    assert net._in_node == "a" and net._out_node == "b"


def test_edge_dispatch_and_train_flags():
    n, m = 5, 3
    rng = np.random.default_rng(1)
    net = Network(dt=1e-2)
    net.add_func_node("inp", m, activation_function="identity")
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)), input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_func_node("out", m, activation_function="identity")
    e1 = net.add_edge("inp", "rnn", weights=rng.normal(size=(n, m)))
    e2 = net.add_edge("rnn", "out", weights=rng.normal(size=(m, n)), train="gd")
    assert isinstance(e1, Linear) and not e1.train_keys
    assert e2.train_keys == ["weights"]
    assert len(list(net.parameters())) == 1
    with pytest.raises(ValueError):
        net.add_edge("inp", "rnn", train="bogus")


def test_run_matches_manual_forward_loop():
    """Network.run must equal an eager forward loop, including the
    mean-downsampling recording semantics (reference test:
    test_network.py:293-339)."""
    n = 6
    rng = np.random.default_rng(2)
    weights = rng.normal(size=(n, n)) * 0.5
    dt = 1e-2
    T = 50
    inp = rng.normal(size=(T, n))

    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=weights, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r", target_var="li_op/r_in")
    net.compile()

    # manual eager loop with identical sampling semantics
    net2 = Network(dt, dtype=jnp.float64)
    net2.add_diffeq_node("rnn", TANH, weights=weights, input_var="li_op/I_ext",
                         output_var="li_op/v", source_var="tanh_op/r", target_var="li_op/r_in")
    net2.compile()

    sampling = 3
    obs = net.run(inp, sampling_steps=sampling, verbose=False)
    outs = np.asarray(obs.to_numpy("out"))

    buffer, records = [], []
    for step in range(T):
        out = np.asarray(net2.forward(jnp.asarray(inp[step])))
        buffer.append(out)
        if step % sampling == 0:
            records.append(np.mean(np.stack(buffer), axis=0))
            buffer = []
    manual = np.stack(records)

    assert outs.shape == manual.shape
    np.testing.assert_allclose(outs, manual, atol=accuracy, rtol=accuracy)
    # final states agree
    np.testing.assert_allclose(np.asarray(net.get_node("rnn").y),
                               np.asarray(net2.get_node("rnn").y), atol=accuracy)


def test_run_cutoff_and_record_vars():
    n = 4
    rng = np.random.default_rng(3)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", QIF, weights=rng.normal(size=(n, n)) * 0.1,
                        input_var="I_ext", output_var="s", source_var="s",
                        target_var="s_in", op="qif_op", spike_var="spike", reset_var="v")
    T = 40
    inp = np.zeros((T, n))
    obs = net.run(inp, sampling_steps=5, cutoff=10, verbose=False,
                  record_vars=[("rnn", "v", True)])
    steps = np.asarray(obs["steps"])
    assert steps.min() >= 10
    assert all(s % 5 == 0 for s in steps)
    v_rec = obs.to_numpy(("rnn", "v"))
    assert v_rec.shape == (len(steps),)  # reduced to population mean


def test_multinode_graph_and_state():
    n, m = 5, 2
    rng = np.random.default_rng(4)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("inp", m, activation_function="identity")
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.3,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_func_node("out", n, activation_function="tanh")
    net.add_edge("inp", "rnn", weights=rng.normal(size=(n, m)))
    net.add_edge("rnn", "out")
    assert net.n_in == m and net.n_out == n
    obs = net.run(rng.normal(size=(20, m)), verbose=False)
    assert obs.to_numpy("out").shape == (20, n)
    # state property + reset
    st = net.state
    assert "rnn" in st and st["rnn"].shape == (n,)
    net.reset({"rnn": np.zeros(n)})
    np.testing.assert_allclose(np.asarray(net.get_node("rnn").y), 0.0)
    # pop
    net.pop_edge("rnn", "out")
    net.pop_node("out")
    assert len(net) == 2


def test_bptt_teacher_student_readout():
    """BPTT (epoch mode) recovers a teacher readout within the reference's
    own loose bound (test_network.py:342-420)."""
    n, m, k = 10, 3, 2
    rng = np.random.default_rng(5)
    W = rng.normal(size=(n, n)) * 0.4
    W_in = rng.normal(size=(n, m))
    w_out_t = rng.normal(size=(k, n))
    dt = 1e-2
    T = 200

    def build(w_out, train):
        net = Network(dt, dtype=jnp.float64)
        net.add_func_node("inp", m, activation_function="identity")
        net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="tanh_op/r", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_func_node("out", k, activation_function="identity")
        net.add_edge("inp", "rnn", weights=W_in)
        net.add_edge("rnn", "out", weights=w_out, train=train)
        return net

    inp = rng.normal(size=(T, m))
    teacher = build(w_out_t, None)
    target = teacher.run(inp, verbose=False).to_numpy("out")

    student = build(np.zeros((k, n)), "gd")
    epochs = 100
    obs = student.fit_bptt([inp] * epochs, [target] * epochs, optimizer="adam", lr=5e-2,
                           verbose=False)
    losses = obs["epoch_loss"]
    assert losses[-1] < losses[0] * 0.1, f"BPTT did not converge: {losses[0]} -> {losses[-1]}"
    w_fit = np.asarray(student.get_edge("rnn", "out").weights)
    assert np.mean((w_fit - w_out_t) ** 2) < 0.5  # reference tolerance


def test_bptt_step_mode_truncated():
    n = 6
    rng = np.random.default_rng(6)
    W = rng.normal(size=(n, n)) * 0.3
    dt = 1e-2
    T = 400
    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=np.zeros((n, n)), input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r", target_var="li_op/r_in",
                        train_params=["weights"])
    inp = rng.normal(size=(T, n))
    teacher = Network(dt, dtype=jnp.float64)
    teacher.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in")
    target = teacher.run(inp, verbose=False).to_numpy("out")
    pass_losses = []
    for _ in range(6):
        net.reset()
        obs = net.fit_bptt(inp, target, optimizer="adam", lr=2e-2, update_steps=50,
                           sampling_steps=10, verbose=False)
        losses = obs.to_numpy("loss")
        pass_losses.append(float(np.mean(losses)))
    assert pass_losses[-1] < pass_losses[0] * 0.5, (
        f"truncated BPTT loss did not decrease across passes: {pass_losses}")
    assert obs.to_numpy("out").shape[1] == n


def test_fit_ridge_readout():
    n, m, k = 20, 2, 2
    rng = np.random.default_rng(7)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("inp", m, activation_function="identity")
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.4,
                        input_var="li_op/I_ext", output_var="tanh_op/r",
                        source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_edge("inp", "rnn", weights=rng.normal(size=(n, m)))
    T = 300
    inp = rng.normal(size=(T, m))
    # target: a fixed readout of the reservoir trajectory
    w_t = rng.normal(size=(n, k))
    X = net.run(inp, verbose=False).to_numpy("out")
    targets = X @ w_t
    net.reset()
    obs = net.fit_ridge(inp, targets, sampling_steps=1, alpha=1e-6, verbose=False,
                        add_readout_node=True)
    w_out = np.asarray(obs["w_out"])
    # the reservoir Gram matrix is ill-conditioned, so weight recovery is only
    # approximate; the prediction itself must be tight
    np.testing.assert_allclose(w_out, w_t, atol=0.2)
    assert float(np.mean((np.asarray(obs["y"]) - targets) ** 2)) < 1e-6
    # readout node added and wired
    assert "readout" in net.nodes
    assert net.n_out == k


def test_fit_rls_online():
    n, m, k = 15, 2, 1
    rng = np.random.default_rng(8)
    W_res = rng.normal(size=(n, n)) * 0.4
    W_in = rng.normal(size=(n, m))

    def build(with_readout):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", m, activation_function="identity")
        net.add_diffeq_node("rnn", TANH, weights=W_res, input_var="li_op/I_ext",
                            output_var="tanh_op/r", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_edge("inp", "rnn", weights=W_in)
        if with_readout:
            net.add_func_node("out", k, activation_function="identity")
            net.add_edge("rnn", "out", train="rls", beta=1.0, alpha=1.0)
        return net

    T = 500
    time = np.linspace(0, T * 1e-2, T)
    inp = np.stack([np.sin(2 * np.pi * 0.7 * time), np.cos(2 * np.pi * 0.3 * time)], axis=1)
    # target: a fixed linear readout of the reservoir trajectory (guaranteed
    # representable), as in the reference's teacher/student optimization test
    w_t = rng.normal(size=(n, k))
    X = build(False).run(inp, verbose=False).to_numpy("out")
    target = X @ w_t
    net = build(True)
    obs = net.fit_rls(inp, target, update_steps=1, sampling_steps=10, verbose=False)
    losses = obs.to_numpy("loss")
    assert losses[-1] < 1e-2, f"RLS did not converge (final loss {losses[-1]})"
    rls_edge = net.get_edge("rnn", "out")
    assert isinstance(rls_edge, RLS)
    assert float(jnp.sum(jnp.abs(rls_edge.weights))) > 0


def test_fit_rls_and_eprop_record_vars_match_run():
    """record_vars during online training (reference parity:
    /root/reference/rectipy/network.py:1119 records state snapshots in _rls).
    The readout edge does not feed back into the reservoir, so the recorded
    reservoir variable must match a plain run() exactly."""
    n, m, k, T = 12, 2, 1, 200
    rng = np.random.default_rng(31)
    W_res = rng.normal(size=(n, n)) * 0.4
    W_in = rng.normal(size=(n, m))
    inp = rng.normal(size=(T, m))
    target = rng.normal(size=(T, k))

    def build(train):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", m, activation_function="identity")
        net.add_diffeq_node("rnn", TANH, weights=W_res, input_var="li_op/I_ext",
                            output_var="tanh_op/r", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_edge("inp", "rnn", weights=W_in)
        net.add_func_node("out", k, activation_function="identity")
        net.add_edge("rnn", "out", train=train)
        return net

    ref = build("rls").run(inp, sampling_steps=10, verbose=False,
                           record_vars=[("rnn", "v", False)])
    v_ref = ref.to_numpy(("rnn", "v"))

    obs_rls = build("rls").fit_rls(inp, target, sampling_steps=10, verbose=False,
                                   record_vars=[("rnn", "v", False)])
    np.testing.assert_allclose(obs_rls.to_numpy(("rnn", "v")), v_ref, rtol=1e-12)

    obs_ep = build("eprop").fit_eprop(inp, target, sampling_steps=10, verbose=False,
                                      lr=1e-3, record_vars=[("rnn", "v", False)])
    np.testing.assert_allclose(obs_ep.to_numpy(("rnn", "v")), v_ref, rtol=1e-12)
    # reduced form records the population mean
    obs_red = build("rls").fit_rls(inp, target, sampling_steps=10, verbose=False,
                                   record_vars=[("rnn", "v", True)])
    np.testing.assert_allclose(obs_red.to_numpy(("rnn", "v")), v_ref.mean(axis=1),
                               rtol=1e-12)


def test_test_method():
    n = 8
    rng = np.random.default_rng(9)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.3,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in")
    T = 60
    inp = rng.normal(size=(T, n))
    obs = net.run(inp, verbose=False)
    target = obs.to_numpy("out")
    net.reset()
    obs2, loss = net.test(inp, target, loss="mse", sampling_steps=1, verbose=False)
    assert loss == pytest.approx(0.0, abs=1e-9)
    # frozen run twice -> deterministic
    net.reset()
    _, loss2 = net.test(inp, target, loss="l1", sampling_steps=1, verbose=False)
    assert loss2 == pytest.approx(0.0, abs=1e-9)


def test_feedback_network():
    """Two coupled populations with a feedback edge: output differs from the
    feedforward-only network, feedback value is one step delayed."""
    n = 5
    rng = np.random.default_rng(10)
    W1 = rng.normal(size=(n, n)) * 0.2
    W2 = rng.normal(size=(n, n)) * 0.2
    k_ff = rng.normal(size=(n, n)) * 0.5
    k_fb = rng.normal(size=(n, n)) * 0.5
    T = 30
    inp = rng.normal(size=(T, n))

    def build(with_fb):
        net = FeedbackNetwork(1e-2, dtype=jnp.float64)
        for label, W in [("p1", W1), ("p2", W2)]:
            net.add_diffeq_node(label, TANH, weights=W, input_var="li_op/I_ext",
                                output_var="li_op/v", source_var="tanh_op/r",
                                target_var="li_op/r_in")
        net.add_edge("p1", "p2", weights=k_ff)
        if with_fb:
            net.add_edge("p2", "p1", weights=k_fb, feedback=True)
        return net

    net_fb = build(True)
    net_ff = build(False)
    out_fb = net_fb.run(inp, verbose=False).to_numpy("out")
    out_ff = net_ff.run(inp, verbose=False).to_numpy("out")
    assert out_fb.shape == out_ff.shape
    # first step identical (fb starts at zero), later steps diverge
    np.testing.assert_allclose(out_fb[0], out_ff[0], atol=1e-12)
    assert np.mean(np.abs(out_fb[5:] - out_ff[5:])) > 1e-8
    # compile is re-entrant
    net_fb.compile()
    net_fb.compile()
    out_fb2 = build(True).run(inp, verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_fb, out_fb2, atol=1e-12)


def test_get_set_var():
    n = 4
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", QIF, weights=np.zeros((n, n)), input_var="I_ext",
                        output_var="s", source_var="s", target_var="s_in", op="qif_op",
                        spike_var="spike", reset_var="v")
    v = net.get_var("rnn", "v")
    assert v.shape == (n,)
    net.set_var("rnn", "eta", -3.0)
    assert float(net.get_var("rnn", "eta")) == -3.0
    with pytest.raises(KeyError):
        net.get_var("rnn", "nonexistent_var")


def test_spiking_network_run():
    """QIF population driven through an input node: the flagship qif_example
    workload shape (documentation/qif_example.py)."""
    N = 50
    rng = np.random.default_rng(11)
    from rectipy_tpu import random_connectivity

    W = random_connectivity(N, N, 0.2, normalize=True, rng=rng)
    etas = -5.0 + 1.0 * np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))
    net = Network(1e-3, dtype=jnp.float64)
    net.add_diffeq_node("qif", "neuron_model_templates.spiking_neurons.qif.qif_sfa",
                        weights=W, source_var="s", target_var="s_in", input_var="I_ext",
                        output_var="s", spike_var="spike", spike_def="v", op="qif_sfa_op",
                        spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": 0.0,
                                   "all/qif_sfa_op/k": 15.0})
    net.add_func_node("inp", 1, activation_function="tanh")
    net.add_edge("inp", "qif")
    T = 2000
    inp = np.zeros((T, 1))
    inp[500:1500, 0] = 3.0
    obs = net.run(inp, record_output=False, record_vars=[("qif", "s", True)],
                  sampling_steps=100, verbose=False)
    s_mean = obs.to_numpy(("qif", "s"))
    assert s_mean.shape == (T // 100,)
    assert np.all(np.isfinite(s_mean))
    assert s_mean.max() > 0.0  # the input drove some spiking


def test_legacy_api_wrappers():
    """Older-generation API used by documentation/rl_example.py:
    Network.from_yaml + add_input_layer + add_output_layer."""
    n, m, k = 10, 2, 3
    rng = np.random.default_rng(12)
    net = Network.from_yaml(TANH, weights=rng.normal(size=(n, n)) * 0.3, dt=1e-2,
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            input_var="li_op/I_ext", output_var="li_op/v",
                            float_precision="float64",
                            node_vars={"all/li_op/v": rng.normal(size=n)})
    net.add_input_layer(m, weights=rng.normal(size=(n, m)))
    net.add_output_layer(k, weights=rng.normal(size=(k, n)), train="rls", beta=0.99)
    net.compile()
    assert net.n_in == m and net.n_out == k
    assert net._train_edge == ("rnn", "output_layer")
    out = net.run(rng.normal(size=(15, m)), verbose=False).to_numpy("out")
    assert out.shape == (15, k)


def test_bptt_remat_gradients_match():
    """jax.checkpoint-segmented BPTT produces the same updates as plain BPTT."""
    n = 6
    rng = np.random.default_rng(13)
    W = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(40, n))
    tgt = rng.normal(size=(40, n))

    def fit(remat):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        kw = {"remat_steps": 10} if remat else {}
        obs = net.fit_bptt([inp] * 3, [tgt] * 3, optimizer="sgd", lr=1e-2,
                           verbose=False, **kw)
        return np.asarray(net.get_node("rnn")["weights"]), obs["epoch_loss"]

    w_plain, loss_plain = fit(False)
    w_remat, loss_remat = fit(True)
    np.testing.assert_allclose(w_remat, w_plain, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(loss_remat, loss_plain, rtol=1e-12)


def test_bptt_step_mode_records_vars():
    n = 5
    rng = np.random.default_rng(14)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=np.zeros((n, n)), input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", train_params=["weights"])
    T = 100
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n))
    obs = net.fit_bptt(inp, tgt, optimizer="sgd", lr=1e-3, update_steps=20,
                       sampling_steps=5, verbose=False,
                       record_vars=[("rnn", "v", True)])
    v_rec = obs.to_numpy(("rnn", "v"))
    assert v_rec.shape == (T // 5,)
    assert np.all(np.isfinite(v_rec))


def test_fit_eprop_online_learning():
    """Online three-factor learning converges toward a representable teacher
    readout (working implementation of the reference's declared-but-
    unimplemented fit_eprop)."""
    n, m, k = 12, 2, 1
    rng = np.random.default_rng(15)
    W_res = rng.normal(size=(n, n)) * 0.3
    W_in = rng.normal(size=(n, m))

    def build(with_readout):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", m, activation_function="identity")
        net.add_diffeq_node("rnn", TANH, weights=W_res, input_var="li_op/I_ext",
                            output_var="tanh_op/r", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_edge("inp", "rnn", weights=W_in)
        if with_readout:
            net.add_func_node("out", k, activation_function="identity")
            net.add_edge("rnn", "out", train="eprop")
        return net

    T = 3000
    time = np.arange(T) * 1e-2
    inp = np.stack([np.sin(2 * np.pi * 0.5 * time), np.cos(2 * np.pi * 0.2 * time)], 1)
    w_t = rng.normal(size=(n, k))
    X = build(False).run(inp, verbose=False).to_numpy("out")
    target = X @ w_t

    net = build(True)
    obs = net.fit_eprop(inp, target, epsilon=0.7, delta=0.7, lr=0.5,
                        update_steps=1, sampling_steps=50, verbose=False)
    losses = obs.to_numpy("loss")
    # instantaneous loss tracks the signal amplitude; assert absolute tracking
    assert np.mean(losses[-5:]) < 1e-3, f"e-prop did not converge: {losses[-5:]}"
    # output->population feedback (reference-documented, unimplemented there):
    # err_bar broadcast into the network input; must still converge
    net_fb = build(True)
    obs_fb = net_fb.fit_eprop(inp, target, epsilon=0.7, delta=0.7, lr=0.5,
                              update_steps=1, sampling_steps=50, verbose=False,
                              feedback_weights=0.1 * np.random.default_rng(16).normal(size=(m, k)))
    losses_fb = obs_fb.to_numpy("loss")
    assert np.isfinite(losses_fb).all()
    assert np.mean(losses_fb[-5:]) < 1e-3, f"e-prop+feedback did not converge: {losses_fb[-5:]}"
    with pytest.raises(ValueError, match="feedback_weights"):
        net.fit_eprop(inp, target, feedback_weights=np.zeros((n, k)))  # wrong shape
    net_plain = build(False)
    with pytest.raises(ValueError):
        net_plain.fit_eprop(inp, target)


def test_add_diffeq_node_accepts_circuit_template():
    """Reference test pattern (test_network.py:60-70): a prebuilt
    CircuitTemplate with edges from a matrix behaves like the str+weights path."""
    from rectipy_tpu import CircuitTemplate, NodeTemplate

    n = 8
    rng = np.random.default_rng(16)
    W = rng.normal(size=(n, n)) * 0.3
    node_temp = NodeTemplate.from_yaml(TANH)
    nodes = {f"p{i}": node_temp for i in range(n)}
    circ = CircuitTemplate("tanh_net", nodes=nodes)
    circ.add_edges_from_matrix(source_var="tanh_op/r", target_var="li_op/r_in",
                               weight=W, source_nodes=list(nodes.keys()))
    net1 = Network(1e-2, dtype=jnp.float64)
    net1.add_diffeq_node("n1", node=circ, input_var="li_op/I_ext",
                         output_var="li_op/v")
    net2 = Network(1e-2, dtype=jnp.float64)
    net2.add_diffeq_node("n1", TANH, weights=W, input_var="li_op/I_ext",
                         output_var="li_op/v", source_var="tanh_op/r",
                         target_var="li_op/r_in")
    inp = rng.normal(size=(20, n))
    o1 = net1.run(inp, verbose=False).to_numpy("out")
    o2 = net2.run(inp, verbose=False).to_numpy("out")
    np.testing.assert_allclose(o1, o2, atol=1e-12)


def test_feedback_network_bptt_trains_feedback_edge():
    """Gradients flow through one-step-delayed feedback edges: BPTT on a
    FeedbackNetwork with a trainable feedback edge reduces the loss and
    updates the feedback weights."""
    n = 6
    rng = np.random.default_rng(17)
    W1 = rng.normal(size=(n, n)) * 0.2
    W2 = rng.normal(size=(n, n)) * 0.2
    k_fb0 = rng.normal(size=(n, n)) * 0.1

    def build(k_fb, train):
        net = FeedbackNetwork(1e-2, dtype=jnp.float64)
        for label, W in [("p1", W1), ("p2", W2)]:
            net.add_diffeq_node(label, TANH, weights=W, input_var="li_op/I_ext",
                                output_var="li_op/v", source_var="tanh_op/r",
                                target_var="li_op/r_in")
        net.add_edge("p1", "p2", weights=np.eye(n))
        net.add_edge("p2", "p1", weights=k_fb, feedback=True, train=train)
        return net

    T = 60
    inp = rng.normal(size=(T, n))
    teacher = build(rng.normal(size=(n, n)) * 0.3, None)
    target = teacher.run(inp, verbose=False).to_numpy("out")

    student = build(k_fb0, "gd")
    w_before = np.asarray(student.get_edge("p2", "p1").weights)
    obs = student.fit_bptt([inp] * 40, [target] * 40, optimizer="adam", lr=1e-2,
                           verbose=False)
    losses = obs["epoch_loss"]
    w_after = np.asarray(student.get_edge("p2", "p1").weights)
    assert losses[-1] < losses[0] * 0.5, f"no training through feedback: {losses[0]} -> {losses[-1]}"
    assert np.abs(w_after - w_before).max() > 1e-4, "feedback weights untouched"


def test_feedback_network_eager_forward_carries_fb():
    n = 4
    rng = np.random.default_rng(18)
    net = FeedbackNetwork(1e-2, dtype=jnp.float64)
    for label in ("p1", "p2"):
        net.add_diffeq_node(label, TANH, weights=rng.normal(size=(n, n)) * 0.2,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_edge("p1", "p2", weights=np.eye(n))
    net.add_edge("p2", "p1", weights=np.eye(n), feedback=True)
    net.compile()
    x = rng.normal(size=(5, n))
    eager = [np.asarray(net.forward(x[t])) for t in range(5)]
    net2 = FeedbackNetwork(1e-2, dtype=jnp.float64)
    for label in ("p1", "p2"):
        net2.add_diffeq_node(label, TANH, weights=np.asarray(net.get_node(label)["weights"]),
                             input_var="li_op/I_ext", output_var="li_op/v",
                             source_var="tanh_op/r", target_var="li_op/r_in")
    # rebuild with the same weights drawn in the same order is not possible
    # with the shared rng, so compare eager vs scan on the SAME net: reset()
    # restores zero state AND clears the carried feedback store
    net.reset()
    scanned = net.run(x, verbose=False).to_numpy("out")
    np.testing.assert_allclose(np.stack(eager), scanned, atol=1e-12)


def test_bptt_step_mode_short_input_no_update_chunks():
    """T < update_steps: forward-only pass, no optimizer updates, no crash."""
    n = 4
    rng = np.random.default_rng(19)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=np.zeros((n, n)), input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", train_params=["weights"])
    w_before = np.asarray(net.get_node("rnn")["weights"])
    obs = net.fit_bptt(rng.normal(size=(7, n)), rng.normal(size=(7, n)),
                       optimizer="sgd", lr=1e-2, update_steps=100, verbose=False)
    np.testing.assert_array_equal(np.asarray(net.get_node("rnn")["weights"]), w_before)


def test_feedback_initial_state_and_reset_semantics():
    """Feedback edges read the source node's CURRENT out-slice at run start
    (reference network.py:1354-1357 via nodes.py:92-99): with a nonzero
    initial output variable the FIRST step already sees that value, and
    reset() clears the carried feedback store."""
    n = 3
    net = FeedbackNetwork(1e-2, dtype=jnp.float64)
    v0 = -2.0
    for label in ("p1", "p2"):
        net.add_diffeq_node(label, TANH, weights=np.zeros((n, n)),
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            node_vars={"all/li_op/v": v0})
    net.add_edge("p1", "p2", weights=np.eye(n))
    net.add_edge("p2", "p1", weights=np.eye(n), feedback=True)
    net.compile()
    state = net.init_state()
    np.testing.assert_allclose(np.asarray(state["fb"]["p2"]), v0 * np.ones(n))

    # run once; the carried feedback store now holds the final p2 output
    net.run(np.zeros((5, n)), verbose=False)
    assert net._fb_store, "feedback store should carry across runs"
    carried = np.asarray(net._fb_store["p2"])
    state2 = net.init_state()
    np.testing.assert_allclose(np.asarray(state2["fb"]["p2"]), carried)

    # reset() clears the store; feedback re-derives from the reset state (0)
    net.reset()
    assert not net._fb_store
    state3 = net.init_state()
    np.testing.assert_allclose(np.asarray(state3["fb"]["p2"]), np.zeros(n))


def test_instant_node_getitem_raises_and_getvar_fallback():
    """InstantNode[...] raises KeyError so Network.get_var falls back to graph
    attributes and Network.set_var raises its documented KeyError."""
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("f", 4, activation_function="tanh")
    node = net.get_node("f")
    with pytest.raises(KeyError):
        node["anything"]
    net.graph.nodes["f"]["custom_attr"] = 42
    assert net.get_var("f", "custom_attr") == 42
    with pytest.raises(KeyError):
        net.set_var("f", "nonexistent", 1.0)


def test_bptt_step_mode_global_sampling_grid():
    """Recording follows the reference's global `step % sampling_steps == 0`
    grid for ANY update_steps/sampling_steps combination, including the
    trailing remainder chunk, with the loss of the last COMPLETED update."""
    n = 4
    rng = np.random.default_rng(23)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.1,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        train_params=["weights"])
    T, u, s = 53, 10, 7  # u % s != 0, remainder of 3 steps
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n))
    w0 = np.asarray(net.get_node("rnn")["weights"]).copy()
    obs = net.fit_bptt(inp, tgt, optimizer="sgd", lr=0.0, update_steps=u,
                       sampling_steps=s, verbose=False, record_output=True,
                       record_loss=True)
    steps = np.asarray(obs["steps"])
    np.testing.assert_array_equal(steps, np.arange(0, T, s))
    losses = obs.to_numpy("loss")
    # steps 0 and 7 precede the first update (at step u-1=9) -> loss 0
    assert losses[0] == 0.0 and losses[1] == 0.0
    # step 14 falls after update 1 completed -> nonzero loss
    assert losses[2] != 0.0
    # lr=0: recorded outputs must equal a plain run's PER-STEP outputs at the
    # grid steps (no mean-downsampling in the reference's _bptt recording)
    net2 = Network(1e-2, dtype=jnp.float64)
    net2.add_diffeq_node("rnn", TANH, weights=w0, input_var="li_op/I_ext",
                         output_var="li_op/v", source_var="tanh_op/r",
                         target_var="li_op/r_in")
    ref_out = net2.run(inp, sampling_steps=1, verbose=False).to_numpy("out")
    np.testing.assert_allclose(obs.to_numpy("out"), ref_out[steps], atol=1e-10)


def test_fit_eprop_float64_accumulator_precision():
    """A float64 network must run the eprop traces in f64, not f32: with
    epsilon = 1 - 1e-9 the error trace's update factor (1 - epsilon) = 1e-9
    underflows to exactly 0 in f32 (epsilon rounds to 1.0f), freezing err_bar
    at zero and hence the readout weights; in f64 the weights must move."""
    n, m, k = 8, 2, 1
    rng = np.random.default_rng(21)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("inp", m, activation_function="identity")
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.3,
                        input_var="li_op/I_ext", output_var="tanh_op/r",
                        source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_edge("inp", "rnn", weights=rng.normal(size=(n, m)))
    net.add_func_node("out", k, activation_function="identity")
    net.add_edge("rnn", "out", train="eprop")
    W0 = np.asarray(net.get_edge("rnn", "out").params["weights"]).copy()
    T = 200
    inp = rng.normal(size=(T, m))
    tgt = rng.normal(size=(T, k))
    net.fit_eprop(inp, tgt, epsilon=1.0 - 1e-9, delta=0.5, lr=1e6,
                  decay=0.0, update_steps=1, verbose=False)
    W1 = np.asarray(net.get_edge("rnn", "out").params["weights"])
    assert np.abs(W1 - W0).max() > 0, (
        "f64 eprop trace was truncated to f32 (err_bar frozen at zero)")


def test_fit_eprop_nlms_step_size_robustness():
    """normalize=True (NLMS) divides the delta update by the eligibility
    energy, making lr a relaxation factor in (0, 2) instead of a quantity
    that must be tuned against the reservoir activity scale: the
    INSTANTANEOUS rule (epsilon=delta=0) at lr=0.5 diverges under plain LMS
    but stays stable and converges under NLMS, across a 10x lr range."""
    n, m, k = 12, 2, 1
    rng = np.random.default_rng(18)
    W_res = rng.normal(size=(n, n)) * 0.3
    W_in = rng.normal(size=(n, m))

    def build(with_readout):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", m, activation_function="identity")
        net.add_diffeq_node("rnn", TANH, weights=W_res, input_var="li_op/I_ext",
                            output_var="tanh_op/r", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_edge("inp", "rnn", weights=W_in)
        if with_readout:
            net.add_func_node("out", k, activation_function="identity")
            net.add_edge("rnn", "out", weights=np.zeros((k, n)), train="eprop")
        return net

    T = 4000
    time = np.arange(T) * 1e-2
    inp = np.stack([np.sin(2 * np.pi * 0.5 * time), np.cos(2 * np.pi * 0.2 * time)], 1)
    w_t = rng.normal(size=(n, k))
    X = build(False).run(inp, verbose=False).to_numpy("out")
    target = X @ w_t

    def trained_test_loss(normalize, lr):
        net = build(True)
        net.fit_eprop(inp[: T // 2], target[: T // 2], epsilon=0.0, delta=0.0,
                      lr=lr, update_steps=1, sampling_steps=50,
                      normalize=normalize, verbose=False)
        _, loss = net.test(inp[T // 2:], target[T // 2:], loss="mse",
                           sampling_steps=1, verbose=False)
        return float(loss)

    assert not np.isfinite(trained_test_loss(False, 0.5)), (
        "instantaneous LMS at lr=0.5 should diverge on this reservoir "
        "(||r||^2 ~ 8 exceeds the stability bound) -- test premise broken")
    for lr in (0.05, 0.2, 0.5):
        loss = trained_test_loss(True, lr)
        assert np.isfinite(loss) and loss < 0.5, (
            f"NLMS at lr={lr} should be stable and track: {loss}")


def test_run_accepts_single_channel_broadcast_inputs():
    """(T, 1) inputs broadcast across a multi-channel input node (the
    documented common-drive idiom, also used by the N=100k example to keep
    host->device traffic at (T, 1)); mismatched channel counts > 1 still
    raise."""
    n = 12
    rng = np.random.default_rng(30)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.2,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in")
    T = 20
    scalar_drive = rng.normal(size=(T, 1))
    out_b = net.run(scalar_drive, verbose=False).to_numpy("out")
    net.reset()
    out_full = net.run(np.tile(scalar_drive, (1, n)), verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_b, out_full, rtol=1e-12)
    with pytest.raises(ValueError, match="channels"):
        net.run(rng.normal(size=(T, 3)), verbose=False)


def test_circuit_template_parameter_heterogeneous_nodes():
    """Parameter-heterogeneous CircuitTemplates (same equations, different
    variable defaults per node) merge into ONE vectorized population: the
    differing defaults become per-neuron override arrays.  Mixing different
    equations raises with guidance."""
    from rectipy_tpu import CircuitTemplate, NodeTemplate
    from rectipy_tpu.dsl.parser import OperatorTemplate, TemplateError, VarSpec

    n = 6
    rng = np.random.default_rng(31)
    W = rng.normal(size=(n, n)) * 0.3
    base = NodeTemplate.from_yaml(TANH)

    def variant(eta):
        ops = []
        for op in base.operators:
            variables = dict(op.variables)
            if "eta" in variables:
                variables["eta"] = VarSpec(variables["eta"].role, float(eta))
            ops.append(OperatorTemplate(op.name, list(op.equations), variables))
        return NodeTemplate(base.name, ops)

    etas = np.linspace(-1.0, 2.0, n)
    circ = CircuitTemplate("het", {f"p{i}": variant(e) for i, e in enumerate(etas)})
    np.testing.assert_array_equal(circ.node_vars["li_op/eta"], etas)
    circ.add_edges_from_matrix(source_var="tanh_op/r", target_var="li_op/r_in",
                               weight=W)

    net1 = Network(1e-2, dtype=jnp.float64)
    net1.add_diffeq_node("n1", node=circ, input_var="li_op/I_ext",
                         output_var="li_op/v")
    net2 = Network(1e-2, dtype=jnp.float64)
    net2.add_diffeq_node("n1", TANH, weights=W, input_var="li_op/I_ext",
                         output_var="li_op/v", source_var="tanh_op/r",
                         target_var="li_op/r_in",
                         node_vars={"all/li_op/eta": etas})
    inp = rng.normal(size=(20, n))
    o1 = net1.run(inp, verbose=False).to_numpy("out")
    o2 = net2.run(inp, verbose=False).to_numpy("out")
    np.testing.assert_allclose(o1, o2, atol=1e-12)
    assert np.std(o1[-1]) > 1e-6, "heterogeneous etas had no effect"

    # different EQUATIONS cannot share a vector field: construction groups
    # them (auto-expansion path, tested below), direct lowering raises
    from rectipy_tpu.dsl.lower import lower

    other = NodeTemplate.from_yaml("neuron_model_templates.spiking_neurons.qif.qif")
    mixed = CircuitTemplate("mixed", {"a": base, "b": other})
    assert mixed.heterogeneous and len(mixed.groups) == 2
    with pytest.raises(TemplateError, match="add_diffeq_node"):
        lower(mixed)


def test_circuit_template_heterogeneous_equations_auto_expand():
    """A CircuitTemplate mixing node templates with DIFFERENT equations
    auto-expands inside add_diffeq_node into one Network node per template
    group, wired with inter-group Linear edges -- and golden-matches the
    equivalent hand-built two-node Network (VERDICT r3 item 9; the reference
    only ever replicates one template, /root/reference/rectipy/nodes.py:241)."""
    from rectipy_tpu import CircuitTemplate, NodeTemplate
    from rectipy_tpu.dsl.parser import OperatorTemplate, TemplateError, VarSpec

    SIG = "neuron_model_templates.rate_neurons.leaky_integrator.sigmoid"
    n_t, n_s = 4, 3
    n = n_t + n_s
    rng = np.random.default_rng(47)
    base = NodeTemplate.from_yaml(TANH)
    sig_t = NodeTemplate.from_yaml(SIG)

    def variant(eta):  # per-member parameter heterogeneity INSIDE the group
        ops = []
        for op in base.operators:
            variables = dict(op.variables)
            if "eta" in variables:
                variables["eta"] = VarSpec(variables["eta"].role, float(eta))
            ops.append(OperatorTemplate(op.name, list(op.equations), variables))
        return NodeTemplate(base.name, ops)

    etas = np.linspace(-0.5, 0.5, n_t)
    nodes = {f"t{i}": variant(e) for i, e in enumerate(etas)}
    nodes.update({f"s{i}": sig_t for i in range(n_s)})
    circ = CircuitTemplate("mix", nodes)
    assert circ.heterogeneous and [g.n for g in circ.groups] == [n_t, n_s]

    # intra-tanh recurrence + tanh->sigmoid feedforward, both declared on the
    # FULL (n, n) circuit index space (tanh members 0..3, sigmoid 4..6)
    W_tt = rng.normal(size=(n_t, n_t)) * 0.4
    W_st = rng.normal(size=(n_s, n_t)) * 0.7
    W_full_tt = np.zeros((n, n))
    W_full_tt[:n_t, :n_t] = W_tt
    W_full_st = np.zeros((n, n))
    W_full_st[n_t:, :n_t] = W_st
    # li_op/r_in exists on BOTH groups -> target must be node-qualified
    circ.add_edges_from_matrix(source_var="tanh_op/r", target_var="t0/li_op/r_in",
                               weight=W_full_tt)
    circ.add_edges_from_matrix(source_var="tanh_op/r", target_var="s0/li_op/r_in",
                               weight=W_full_st)
    taus = np.linspace(8.0, 14.0, n)  # circuit-wide override, sliced per group

    net1 = Network(1e-2, dtype=jnp.float64)
    out_node = net1.add_diffeq_node(
        "c", node=circ, input_var="t0/li_op/I_ext", output_var="sigmoid_op/r",
        node_vars={"all/li_op/tau": taus})
    assert sorted(net1.nodes) == ["c.sigmoid", "c.tanh"]
    assert out_node is net1.get_node("c.sigmoid")

    net2 = Network(1e-2, dtype=jnp.float64)
    net2.add_diffeq_node("tanh", TANH, weights=W_tt, input_var="li_op/I_ext",
                         output_var="tanh_op/r", source_var="tanh_op/r",
                         target_var="li_op/r_in",
                         node_vars={"all/li_op/eta": etas,
                                    "all/li_op/tau": taus[:n_t]})
    net2.add_diffeq_node("sig", SIG, N=n_s, input_var="li_op/r_in",
                         output_var="sigmoid_op/r",
                         node_vars={"all/li_op/tau": taus[n_t:]})
    net2.add_edge("tanh", "sig", weights=W_st)

    inp = rng.normal(size=(25, n_t))
    o1 = net1.run(inp, verbose=False).to_numpy("out")
    o2 = net2.run(inp, verbose=False).to_numpy("out")
    assert o1.shape == (25, n_s)
    np.testing.assert_allclose(o1, o2, atol=1e-12)
    assert np.std(o1[-1]) > 1e-8, "coupled dynamics collapsed"

    # ambiguous bare var (both groups declare li_op/r_in) -> loud guidance
    circ2 = CircuitTemplate("amb", dict(nodes))
    circ2.add_edges_from_matrix(source_var="tanh_op/r", target_var="li_op/r_in",
                                weight=W_full_tt)
    net3 = Network(1e-2, dtype=jnp.float64)
    with pytest.raises(TemplateError, match="exactly one node template"):
        net3.add_diffeq_node("c", node=circ2, input_var="t0/li_op/I_ext",
                             output_var="sigmoid_op/r")

    # weight mass outside the owner block -> loud error
    circ3 = CircuitTemplate("leak", dict(nodes))
    W_bad = W_full_st.copy()
    W_bad[0, n_t:] = 1.0  # sigmoid->tanh entries on a tanh->sigmoid edge
    circ3.add_edges_from_matrix(source_var="tanh_op/r", target_var="s0/li_op/r_in",
                                weight=W_bad)
    net4 = Network(1e-2, dtype=jnp.float64)
    with pytest.raises(TemplateError, match="outside"):
        net4.add_diffeq_node("c", node=circ3, input_var="t0/li_op/I_ext",
                             output_var="sigmoid_op/r")
