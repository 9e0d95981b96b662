"""Generic fused Pallas step (interpret mode) vs the XLA path on multiple
model families."""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network
from rectipy_tpu.ops.generic_fused import attach_generic_fused_step

LIF = "neuron_model_templates.spiking_neurons.lif.lif"
QIF_RESET = "neuron_model_templates.spiking_neurons.qif.qif_reset"
IK = "neuron_model_templates.spiking_neurons.ik.ik"
QIF_SFA = "neuron_model_templates.spiking_neurons.qif.qif_sfa"
THETA = "rectipy_tpu.models.spiking_neurons.theta.theta"
TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
IKU = "neuron_model_templates.spiking_neurons.ik.iku"


def _run_both(build, T=300, tile=128, seed=0, atol=2e-4):
    rng = np.random.default_rng(seed)
    n = build.__wrapped_n__ if hasattr(build, "__wrapped_n__") else None
    netA = build()
    n = netA.n_in
    inp = rng.normal(size=(T, n)).astype(np.float32)
    ref = netA.run(inp, verbose=False).to_numpy("out")
    netB = build()
    attach_generic_fused_step(netB.get_node(list(netB.nodes)[0]), tile=tile,
                              interpret=True)
    fused = netB.run(inp, verbose=False).to_numpy("out")
    np.testing.assert_allclose(fused, ref, atol=atol, rtol=1e-4)
    return ref


def test_generic_fused_lif():
    n = 48
    rng = np.random.default_rng(1)
    W = np.abs(rng.normal(size=(n, n))) * 0.05
    tau = rng.uniform(10.0, 15.0, size=n)

    def build():
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("lif", LIF, weights=W, source_var="s", target_var="s_in",
                            input_var="I_ext", output_var="s", op="lif_op",
                            spike_var="spike", reset_var="v", dtype=jnp.float32,
                            spike_threshold=10.0, spike_reset=-10.0,
                            node_vars={"eta": 10.0, "tau": tau, "tau_s": 5.0})
        net.compile()
        return net

    ref = _run_both(build, T=400, seed=1)
    assert ref.max() > 0, "no spikes -- weak test"


def test_generic_fused_qif_sfa_matches_specialized():
    n = 64
    rng = np.random.default_rng(2)
    W = (rng.random((n, n)) < 0.2) * 0.02
    etas = rng.normal(size=n) + 100.0

    def build():
        net = Network(1e-3, dtype=jnp.float32)
        net.add_diffeq_node("qif", QIF_SFA, weights=W, source_var="s",
                            target_var="s_in", input_var="I_ext", output_var="s",
                            op="qif_sfa_op", spike_var="spike", spike_def="v",
                            dtype=jnp.float32, spike_threshold=30.0, spike_reset=-30.0,
                            node_vars={"all/qif_sfa_op/eta": etas})
        net.compile()
        return net

    ref = _run_both(build, T=500, seed=2)
    assert ref.max() > 0


def test_generic_fused_theta_neuron():
    n = 32
    rng = np.random.default_rng(3)
    W = np.abs(rng.normal(size=(n, n))) * 0.01

    def build():
        net = Network(1e-3, dtype=jnp.float32)
        net.add_diffeq_node("theta", THETA, weights=W, source_var="s",
                            target_var="s_in", input_var="I_ext", output_var="s",
                            spike_var="spike", spike_def="theta", dtype=jnp.float32,
                            spike_threshold=np.pi, spike_reset=-np.pi,
                            node_vars={"all/theta_op/eta": 1.0})
        net.compile()
        return net

    ref = _run_both(build, T=2600, seed=3)
    assert ref.max() > 0


def test_generic_fused_spikenet_intrinsic_reset():
    """SpikeNet (reset=False): spikes/dt injected into BOTH spike and reset
    inputs, no hard reset, POST-update output."""
    n = 24
    rng = np.random.default_rng(6)
    W = np.abs(rng.normal(size=(n, n))) * 0.01

    def build():
        net = Network(1e-3, dtype=jnp.float32)
        net.add_diffeq_node("qif", QIF_RESET, weights=W, source_var="s",
                            target_var="s_in", input_var="I_ext", output_var="s",
                            op="qif_reset_op", spike_var="spike", reset_var="reset",
                            reset=False, dtype=jnp.float32, spike_threshold=10.0,
                            spike_reset=-10.0, node_vars={"eta": 8.0, "k": 0.0})
        net.compile()
        return net

    ref = _run_both(build, T=1500, seed=6)
    assert ref.max() > 0, "no spikes -- weak test"


def test_generic_fused_multi_spike_reset():
    """MultiSpikeResetNet (list spike/reset vars): per-segment hard resets,
    POST-update output."""
    n = 16
    rng = np.random.default_rng(7)
    W = np.abs(rng.normal(size=(n, n))) * 0.02

    def build():
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("ik", IK, weights=W, source_var="s", target_var="s_in",
                            input_var="I_ext", output_var="s", op="ik_op",
                            spike_var=["spike"], reset_var=["v"], dtype=jnp.float32,
                            spike_threshold=40.0, spike_reset=-60.0,
                            node_vars={"eta": 200.0})
        net.compile()
        from rectipy_tpu.nodes import MultiSpikeResetNet
        assert isinstance(net.get_node("ik"), MultiSpikeResetNet)
        return net

    ref = _run_both(build, T=2500, seed=7)
    assert ref.max() > 0, "no spikes -- weak test"


def test_generic_fused_algebraic_output():
    """output_var is an algebraic variable (r = tanh(v)) -> computed from the
    PRE-update state rows, matching the RateNet reader semantics."""
    n = 20
    rng = np.random.default_rng(8)
    W = rng.normal(size=(n, n)) * 0.4

    def build():
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="tanh_op/r", source_var="tanh_op/r",
                            target_var="li_op/r_in", dtype=jnp.float32,
                            node_vars={"all/li_op/eta": 1.0})
        net.compile()
        return net

    _run_both(build, T=300, seed=8, atol=5e-5)


def test_generic_fused_heun():
    """integrator='heun' (RateNet): derivative-mode kernel called twice per
    step matches the XLA Heun path."""
    n = 24
    rng = np.random.default_rng(12)
    W = rng.normal(size=(n, n)) * 0.3
    tau = rng.uniform(5.0, 15.0, size=n)

    def build():
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", dtype=jnp.float32,
                            integrator="heun",
                            node_vars={"all/li_op/tau": tau, "all/li_op/eta": 1.0})
        net.compile()
        return net

    _run_both(build, T=300, seed=12, atol=5e-5)
    # heun and euler must actually differ (otherwise the test is vacuous)
    net_e = Network(1e-2, dtype=jnp.float32)
    net_e.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                          output_var="li_op/v", source_var="tanh_op/r",
                          target_var="li_op/r_in", dtype=jnp.float32,
                          node_vars={"all/li_op/tau": tau, "all/li_op/eta": 1.0})
    net_e.compile()
    inp = np.random.default_rng(12).normal(size=(300, n)).astype(np.float32)
    out_e = net_e.run(inp, verbose=False).to_numpy("out")
    out_h = build().run(inp, verbose=False).to_numpy("out")
    assert np.abs(out_e - out_h).max() > 1e-4


def test_generic_fused_multi_coupling():
    """Two coupling matrices on one node (CircuitTemplate with two
    add_edges_from_matrix calls), the second targeting the external-input
    variable itself -- both matvecs fused into the kernel."""
    n = 24
    rng = np.random.default_rng(9)
    W1 = rng.normal(size=(n, n)) * 0.2
    W2 = rng.normal(size=(n, n)) * 0.1

    from rectipy_tpu.dsl.parser import CircuitTemplate, NodeTemplate

    def build():
        tmpl = NodeTemplate.from_yaml(TANH)
        circ = CircuitTemplate("c", {f"p{i}": tmpl for i in range(n)})
        circ.add_edges_from_matrix("tanh_op/r", "li_op/r_in", weight=W1)
        circ.add_edges_from_matrix("tanh_op/r", "li_op/I_ext", weight=W2)
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("rnn", circ, input_var="li_op/I_ext",
                            output_var="li_op/v", dtype=jnp.float32)
        net.compile()
        return net

    _run_both(build, T=300, tile=16, seed=9, atol=5e-4)


def test_generic_fused_rejections():
    n = 8
    rng = np.random.default_rng(4)
    # mean-field template -> no tile_func
    net = Network(1e-2, dtype=jnp.float32)
    net.add_diffeq_node("ik", IKU, weights=np.zeros((n, n)), source_var="s",
                        target_var="s_in", input_var="I_ext", output_var="s",
                        op="iku_op", spike_var="spike", reset_var="v",
                        dtype=jnp.float32)
    net.compile()
    with pytest.raises(ValueError, match="reduction"):
        attach_generic_fused_step(net.get_node("ik"), interpret=True)
    # int8 coupling stays on the XLA STE path
    net2 = Network(1e-2, dtype=jnp.float32)
    net2.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)),
                         input_var="li_op/I_ext", output_var="li_op/v",
                         source_var="tanh_op/r", target_var="li_op/r_in",
                         dtype=jnp.float32, coupling_dtype="int8")
    net2.compile()
    with pytest.raises(ValueError, match="int8"):
        attach_generic_fused_step(net2.get_node("rnn"), interpret=True)
    # double attach would re-pad the already padded state -> refused
    net3 = Network(1e-2, dtype=jnp.float32)
    net3.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.1,
                         input_var="li_op/I_ext", output_var="li_op/v",
                         source_var="tanh_op/r", target_var="li_op/r_in",
                         dtype=jnp.float32)
    net3.compile()
    attach_generic_fused_step(net3.get_node("rnn"), tile=8, interpret=True)
    with pytest.raises(ValueError, match="already attached"):
        attach_generic_fused_step(net3.get_node("rnn"), tile=8, interpret=True)


def test_generic_fused_tanh_algebraic_source():
    """Algebraic coupling source (r = tanh(v)) computed per tile in-kernel."""
    n = 40
    rng = np.random.default_rng(5)
    W = rng.normal(size=(n, n)) * 0.3
    tau = rng.uniform(5.0, 15.0, size=n)

    def build():
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", dtype=jnp.float32,
                            node_vars={"all/li_op/tau": tau, "all/li_op/eta": 1.0})
        net.compile()
        return net

    _run_both(build, T=300, seed=5, atol=5e-4)


def test_generic_fused_set_param_refresh():
    """set_param after attach: per-neuron params and couplings refresh the
    kernel's padded copies transparently; BAKED scalars raise with guidance
    (regression: they silently kept the stale attach-time value)."""
    n, T = 48, 100
    rng = np.random.default_rng(9)
    W = np.abs(rng.normal(size=(n, n))) * 0.05
    tau = rng.uniform(10.0, 15.0, size=n)
    tau2 = rng.uniform(10.0, 15.0, size=n)
    W2 = np.abs(rng.normal(size=(n, n))) * 0.05
    inp = rng.normal(size=(T, n)).astype(np.float32)

    def build(tau_v, W_v, fused):
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("lif", LIF, weights=W_v, source_var="s",
                            target_var="s_in", input_var="I_ext",
                            output_var="s", op="lif_op", spike_var="spike",
                            reset_var="v", dtype=jnp.float32,
                            spike_threshold=10.0, spike_reset=-10.0,
                            node_vars={"eta": 10.0, "tau": tau_v, "tau_s": 5.0})
        net.compile()
        if fused:
            attach_generic_fused_step(net.get_node("lif"), tile=128,
                                      interpret=True)
        return net

    # update a per-neuron param + the coupling AFTER attach; the fused run
    # must match a fresh fused network built with the new values
    net = build(tau, W, fused=True)
    node = net.get_node("lif")
    node.set_param("tau", tau2)
    node.set_param("weights", W2)
    out = net.run(inp, verbose=False).to_numpy("out")
    ref = build(tau2, W2, fused=True).run(inp, verbose=False).to_numpy("out")
    np.testing.assert_allclose(out, ref, atol=1e-6)

    # a baked scalar raises instead of silently running stale
    with pytest.raises(ValueError, match="baked"):
        node.set_param("tau_s", 2.0)
    # the unfused path still allows it
    build(tau, W, fused=False).get_node("lif").set_param("tau_s", 2.0)


def test_generic_fused_morris_lecar():
    """Round-4 conductance model through the generic fused kernel: the
    cosh/tanh gate algebra and the s-gate coupling fuse like any template."""
    n = 32
    rng = np.random.default_rng(21)
    W = np.abs(rng.normal(size=(n, n))) * 1.0
    v0 = rng.uniform(-50.0, -30.0, n)

    def build():
        net = Network(0.05, dtype=jnp.float32)
        net.add_diffeq_node("ml", "rectipy_tpu.models.spiking_neurons.morris_lecar.ml",
                            weights=W, source_var="s", target_var="s_in",
                            input_var="I_ext", output_var="v", dtype=jnp.float32,
                            node_vars={"all/ml_op/v": v0})
        net.compile()
        return net

    # drive above threshold so the trajectories exercise the spike upstroke
    rng2 = np.random.default_rng(22)
    netA = build()
    inp = (90.0 + rng2.normal(size=(400, n)) * 2.0).astype(np.float32)
    ref = netA.run(inp, verbose=False).to_numpy("out")
    netB = build()
    attach_generic_fused_step(netB.get_node("ml"), tile=16, interpret=True)
    fused = netB.run(inp, verbose=False).to_numpy("out")
    np.testing.assert_allclose(fused, ref, atol=2e-3, rtol=1e-3)
    assert ref.max() > 0.0  # reached the spike upstroke


def test_generic_fused_qif_gap():
    """Gap-junction QIF: chemical (s -> s_in) + electrical (v -> v_gap)
    couplings fuse as two matvec accumulators."""
    n = 24
    rng = np.random.default_rng(23)
    Ws = np.abs(rng.normal(size=(n, n))) * 0.05
    G = np.full((n, n), 1.0 / n)
    etas = rng.uniform(-3.0, -1.0, n)

    def build():
        net = Network(1e-3, dtype=jnp.float32)
        net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif_gap",
                            n=n, edges=[("s", "s_in", Ws), ("v", "v_gap", G)],
                            input_var="I_ext", output_var="v", op="qif_gap_op",
                            spike_var="spike", reset_var="v", dtype=jnp.float32,
                            spike_threshold=100.0, spike_reset=-100.0,
                            node_vars={"all/qif_gap_op/eta": etas,
                                       "all/qif_gap_op/deg": G.sum(axis=1),
                                       "all/qif_gap_op/g_gap": 3.0})
        net.compile()
        return net

    _run_both(build, T=300, tile=8, seed=23, atol=5e-4)
