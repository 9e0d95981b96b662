"""Node-runtime tests, mirroring the reference suite's structure
(/root/reference/rectipy_tests/test_nodes.py): a hand-written vector field is
used as the oracle, decoupled from the YAML frontend; DSL-built nodes are
asserted equal to the hand-written dynamics over multiple steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu.nodes import MultiSpikeResetNet, RateNet, SpikeNet, SpikeResetNet, InstantNode
from rectipy_tpu.ops.surrogate import make_spike_fn

accuracy = 1e-3


def rate(t, y, I_ext, weights, tau):
    """Hand-written rate network: y' = -y/tau + I_ext + W @ tanh(y)."""
    return -y / tau + I_ext + weights @ jnp.tanh(y)


def test_ratenet_init():
    n = 10
    rng = np.random.default_rng(0)
    weights = rng.normal(size=(n, n))
    args = (jnp.zeros(n), jnp.zeros(n), jnp.asarray(weights), 1.0)

    rnn1 = RateNet(rate, args, {"out": [0, n]}, {"in": 0})
    rnn2 = RateNet.from_pyrates(
        "neuron_model_templates.rate_neurons.leaky_integrator.tanh", weights=weights,
        source_var="tanh_op/r", target_var="li_op/r_in", input_var="li_op/I_ext",
        output_var="tanh_op/r")
    rnn3 = SpikeResetNet.from_pyrates(
        "neuron_model_templates.spiking_neurons.qif.qif", weights=weights,
        source_var="qif_op/s", target_var="qif_op/s_in", input_var="qif_op/I_ext",
        output_var="qif_op/s", reset_var="qif_op/v", spike_var="qif_op/spike",
        spike_threshold=1e3, spike_reset=-1e3, dtype=jnp.float32)
    rnn4 = RateNet.from_pyrates(
        "neuron_model_templates.rate_neurons.leaky_integrator.tanh", weights=weights,
        source_var="tanh_op/r", target_var="li_op/r_in", input_var="li_op/I_ext",
        output_var="tanh_op/r", train_params=["weights"])

    assert isinstance(rnn1, RateNet)
    assert isinstance(rnn3, SpikeResetNet)
    assert len(rnn2.y) == n
    assert len(rnn3.y) == 2 * n
    assert len(list(rnn4.parameters())) - len(list(rnn2.parameters())) == 1
    assert rnn4["li_op/v"].shape[0] == n
    assert rnn3.y.dtype == jnp.float32
    assert rnn4.y.dtype == jnp.float64

    with pytest.raises(KeyError):
        _ = rnn2["li_op/u"]


def test_ratenet_forward_matches_handwritten():
    n = 10
    rng = np.random.default_rng(1)
    weights = rng.normal(size=(n, n))
    dt = 1e-3
    args = (jnp.zeros(n), jnp.zeros(n), jnp.asarray(weights), 10.0)
    inp = jnp.asarray(rng.normal(size=(n,)))

    # raw-mode node with hand-written f, tau=10 to match the template default
    rnn1 = RateNet(rate, args, {"out": [0, n]}, {"in": 0}, dt=dt)
    # DSL-built node with identical dynamics; output_var = v so outputs align
    rnn2 = RateNet.from_pyrates(
        "neuron_model_templates.rate_neurons.leaky_integrator.tanh", weights=weights,
        source_var="tanh_op/r", target_var="li_op/r_in", input_var="li_op/I_ext",
        output_var="li_op/v", dt=dt)

    for _ in range(10):
        o1 = np.asarray(rnn1.forward(inp))
        o2 = np.asarray(rnn2.forward(inp))
        np.testing.assert_allclose(o1, o2, atol=accuracy, rtol=accuracy)

    # changed input index changes dynamics
    rnn4 = RateNet(rate, args, {"out": [0, n]}, {"in": 2}, dt=dt)
    out4 = [np.asarray(rnn4.forward(inp)) for _ in range(10)]
    assert np.mean(np.abs(out4[-1] - o1)) > 0

    # partial output window
    rnn5 = RateNet(rate, args, {"out": [0, 3]}, {"in": 0}, dt=dt)
    assert rnn5.forward(inp).shape[0] == 3


def test_ratenet_algebraic_output():
    """output_var may be an algebraic (instantaneous) variable like tanh_op/r."""
    n = 6
    rng = np.random.default_rng(2)
    weights = rng.normal(size=(n, n)) * 0.1
    node = RateNet.from_pyrates(
        "neuron_model_templates.rate_neurons.leaky_integrator.tanh", weights=weights,
        source_var="tanh_op/r", target_var="li_op/r_in", input_var="li_op/I_ext",
        output_var="tanh_op/r", dt=1e-2)
    x = jnp.asarray(rng.normal(size=(n,)))
    y_before = np.asarray(node.y)
    out = np.asarray(node.forward(x))
    # pre-update output: r = tanh(v_old)
    np.testing.assert_allclose(out, np.tanh(y_before), rtol=1e-10)


def test_ratenet_reset():
    n = 10
    rng = np.random.default_rng(3)
    weights = rng.normal(size=(n, n))
    y0 = rng.normal(size=(n,))
    args = (jnp.asarray(y0), jnp.zeros(n), jnp.asarray(weights), 1.0)
    x = jnp.asarray(rng.normal(size=(n,)))
    rnn = RateNet(rate, args, {"out": [0, n]}, {"in": 0})

    r1 = np.asarray(rnn.forward(x))
    r2 = np.asarray(rnn.forward(x))
    rnn.reset(y0)
    r3 = np.asarray(rnn.forward(x))
    rnn.reset(y0[0:3], idx=np.arange(0, 3))
    r5 = np.asarray(rnn.forward(x))
    rnn.reset(y0 + 1.0)
    r4 = np.asarray(rnn.forward(x))

    for z1, z2 in [(r1, r2), (r1, r4), (r1, r5)]:
        assert np.mean(np.abs(z1 - z2)) > 0
    np.testing.assert_allclose(r1, r3, atol=accuracy)
    np.testing.assert_allclose(r1[0:3], r5[0:3], atol=accuracy)
    np.testing.assert_allclose(r2[3:], r5[3:], atol=accuracy)

    with pytest.raises(ValueError):
        rnn.reset(np.random.randn(n + 1))
    with pytest.raises(ValueError):
        rnn.reset(y0, idx=np.arange(0, n + 1))


def test_spike_surrogate_gradient():
    spike = make_spike_fn(slope=10.0, center=1.0)
    x = jnp.asarray([-1.0, -1e-8, 0.0, 1e-8, 2.0])
    out = np.asarray(spike(x))
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0, 1.0, 1.0])
    # surrogate VJP: g / (1 + slope*|x|)^2
    g = jax.grad(lambda z: jnp.sum(spike(z)))(x)
    expect = 1.0 / (1.0 + 10.0 * np.abs(np.asarray(x))) ** 2
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-12)


def test_spike_reset_net_dynamics():
    """QIF population with framework-managed reset: neurons cross threshold
    and get clamped to the reset value."""
    n = 5
    node = SpikeResetNet.from_pyrates(
        "neuron_model_templates.spiking_neurons.qif.qif", weights=np.zeros((n, n)),
        source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
        spike_var="spike", reset_var="v", spike_threshold=10.0, spike_reset=-10.0,
        dt=1e-3, node_vars={"all/qif_op/eta": 8.0})
    x = jnp.zeros(n)
    spiked = False
    v_max = -np.inf
    for _ in range(8000):
        node.forward(x)
        v = np.asarray(node["v"])
        v_max = max(v_max, v.max())
        if v.max() > 9.0:
            spiked = True
        if spiked and v.min() < -9.0:
            break
    assert spiked, f"no threshold crossing observed (v_max={v_max})"
    assert np.asarray(node["v"]).min() <= -9.0, "no reset observed"
    assert np.asarray(node["s"]).max() > 0.0, "spike did not drive the synapse"


def test_spike_reset_gradient_flows_through_surrogate():
    n = 4
    node = SpikeResetNet.from_pyrates(
        "neuron_model_templates.spiking_neurons.qif.qif", weights=np.zeros((n, n)),
        source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
        spike_var="spike", reset_var="v", spike_threshold=5.0, spike_reset=-5.0,
        dt=1e-2, node_vars={"all/qif_op/eta": 3.0})
    step = node.make_step()

    def loss(eta):
        args = dict(node.args)
        args["qif_op/eta"] = eta
        y = node.y

        def body(carry, _):
            y_new, out = step(carry, args, jnp.zeros(n))
            return y_new, out

        y_fin, outs = jax.lax.scan(body, y, None, length=500)
        return jnp.sum(outs ** 2)

    g = jax.grad(loss)(jnp.asarray(3.0, dtype=jnp.float64))
    assert np.isfinite(float(g))
    assert float(jnp.abs(g)) > 0.0, "gradient vanished: surrogate not wired through"


def test_spikenet_intrinsic_reset():
    """qif_reset_op: the -2*reset*v term mirrors v at spike time, driven by the
    detached spike events SpikeNet feeds into the `reset` input."""
    n = 3
    node = SpikeNet.from_pyrates(
        "neuron_model_templates.spiking_neurons.qif.qif_reset",
        weights=np.zeros((n, n)), source_var="s", target_var="s_in",
        input_var="I_ext", output_var="s", spike_var="spike", reset_var="reset",
        spike_threshold=10.0, spike_reset=-10.0, dt=1e-3,
        node_vars={"all/qif_reset_op/eta": 8.0})
    mirrored = False
    v_prev = np.asarray(node["v"]).copy()
    for _ in range(8000):
        node.forward(jnp.zeros(n))
        v = np.asarray(node["v"])
        if v_prev.max() > 9.0 and v.min() < 0.0:
            mirrored = True
            break
        v_prev = v.copy()
    assert mirrored, "intrinsic reset term did not mirror v after threshold crossing"


def test_multi_spike_reset_net():
    n = 4
    node = SpikeResetNet.from_pyrates(
        "neuron_model_templates.spiking_neurons.ik.ik", weights=np.zeros((n, n)),
        source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
        spike_var=["spike"], reset_var=["v"], spike_threshold=40.0, spike_reset=-60.0,
        dt=1e-2, node_vars={"all/ik_op/eta": 200.0})
    assert isinstance(node, MultiSpikeResetNet)
    spiked = False
    for _ in range(5000):
        node.forward(jnp.zeros(n))
        if np.asarray(node["v"]).min() <= -59.0 and np.asarray(node["s"]).max() > 0:
            spiked = True
            break
    assert spiked


def test_instant_node():
    m = 3
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(m,)))
    for name, fn in [
        ("tanh", np.tanh),
        ("sigmoid", lambda z: 1 / (1 + np.exp(-z))),
        ("identity", lambda z: z),
    ]:
        node = InstantNode(m, name)
        np.testing.assert_allclose(np.asarray(node.forward(x)), fn(np.asarray(x)), rtol=1e-6)
    sm = InstantNode(m, "softmax")
    out = np.asarray(sm.forward(x))
    assert out.sum() == pytest.approx(1.0)
    with pytest.raises(ValueError):
        InstantNode(m, "relu6_not_a_thing")


def test_node_vars_heterogeneous_params_trainable():
    n = 8
    rng = np.random.default_rng(5)
    tau = rng.uniform(10.0, 20.0, size=(n,))
    node = RateNet.from_pyrates(
        "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
        weights=np.zeros((n, n)), source_var="tanh_op/r", target_var="li_op/r_in",
        input_var="li_op/I_ext", output_var="li_op/v",
        node_vars={"all/li_op/tau": tau}, train_params=["li_op/tau"])
    assert len(node.train_params) == 1
    np.testing.assert_allclose(np.asarray(node["li_op/tau"]), tau)
    node.set_param("li_op/eta", 3.0)
    assert float(node["li_op/eta"]) == 3.0
    with pytest.raises(KeyError):
        node.set_param("li_op/nonexistent", 1.0)


def test_heun_integrator_second_order():
    """integrator='heun' (RK2) converges at O(dt^2) vs Euler's O(dt) on the
    analytic leaky integrator v(t) = eta*tau*(1 - exp(-t/tau))."""
    from rectipy_tpu.dsl import lower

    tau, eta, T = 5.0, 1.0, 2.0
    exact = eta * tau * (1.0 - np.exp(-T / tau))

    def err(integrator, dt):
        node = RateNet.from_pyrates(
            "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((1, 1)), source_var="tanh_op/r", target_var="li_op/r_in",
            input_var="li_op/I_ext", output_var="li_op/v", dt=dt,
            node_vars={"all/li_op/tau": tau, "all/li_op/eta": eta},
            integrator=integrator)
        step = node.make_step()
        y = node.y

        def body(y, _):
            y, _out = step(y, node.args, jnp.zeros(1))
            return y, None

        y, _ = jax.lax.scan(body, y, None, length=int(T / dt))
        return abs(float(y[0]) - exact)

    e_eu_1, e_eu_2 = err("euler", 2e-2), err("euler", 1e-2)
    e_he_1, e_he_2 = err("heun", 2e-2), err("heun", 1e-2)
    assert 1.7 < e_eu_1 / e_eu_2 < 2.3       # first order
    assert 3.3 < e_he_1 / e_he_2 < 4.7       # second order
    assert e_he_2 < e_eu_2 / 50              # and much more accurate

    with pytest.raises(ValueError):
        RateNet.from_pyrates(
            "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((1, 1)), source_var="tanh_op/r", target_var="li_op/r_in",
            input_var="li_op/I_ext", output_var="li_op/v", integrator="rk99")
    with pytest.raises(ValueError):
        SpikeResetNet.from_pyrates(
            "neuron_model_templates.spiking_neurons.qif.qif", weights=np.zeros((2, 2)),
            source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
            spike_var="spike", reset_var="v", integrator="heun")


def test_rk4_integrator_fourth_order():
    """integrator='rk4' converges at O(dt^4) on the analytic leaky
    integrator, and is far more accurate than Heun at the same dt."""
    tau, eta, T = 5.0, 1.0, 2.0
    exact = eta * tau * (1.0 - np.exp(-T / tau))

    def err(integrator, dt):
        node = RateNet.from_pyrates(
            "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((1, 1)), source_var="tanh_op/r", target_var="li_op/r_in",
            input_var="li_op/I_ext", output_var="li_op/v", dt=dt,
            node_vars={"all/li_op/tau": tau, "all/li_op/eta": eta},
            integrator=integrator)
        step = node.make_step()

        def body(y, _):
            y, _out = step(y, node.args, jnp.zeros(1))
            return y, None

        y, _ = jax.lax.scan(body, node.y, None, length=int(T / dt))
        return abs(float(y[0]) - exact)

    e_1, e_2 = err("rk4", 4e-2), err("rk4", 2e-2)
    assert 12.0 < e_1 / e_2 < 20.0          # fourth order
    assert e_2 < err("heun", 2e-2) / 100    # and much more accurate than RK2

    with pytest.raises(ValueError):
        SpikeResetNet.from_pyrates(
            "neuron_model_templates.spiking_neurons.qif.qif", weights=np.zeros((2, 2)),
            source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
            spike_var="spike", reset_var="v", integrator="rk4")
