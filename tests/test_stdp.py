"""STDP edge + Network.fit_stdp (beyond-reference online plasticity).

The reference ships no local plasticity rule (its online trainers are RLS,
/root/reference/rectipy/network.py:786, and the NotImplementedError e-prop
stub, network.py:858-896); the STDP edge follows the same architecture as
the RLS edge (pure update_fn, W in the trainer's scan carry).

Covered here:
- update_fn vs an independent numpy oracle of the documented pair rule
  (causal pairing -> a_plus * exp(-dt*delta/tau_plus), anti-causal ->
  depression; zero-lag pairs inert; bounds; soft bounds; diagonal form)
- fit_stdp scan == eager Python loop over make_step + update_fn (exact)
- end-to-end pair protocol through spiking populations (causal potentiates,
  anti-causal depresses)
- chunked fit_stdp calls == one long call (traces/W/state persist)
- on-device InputSpec drive == its materialized dense equivalent
- add_edge dispatch and error cases
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import FeedbackNetwork, Network, Poisson
from rectipy_tpu.edges import STDP

LIF = "neuron_model_templates.spiking_neurons.lif.lif"
QIF = "neuron_model_templates.spiking_neurons.qif.qif"


# ---------------------------------------------------------------- unit level

def _numpy_stdp(W, spk_pre, spk_post, dt, tau_plus, tau_minus, a_plus, a_minus,
                w_min, w_max, soft=False):
    """Independent oracle of the documented rule (decay first, zero-lag pairs
    do not interact, bounds last)."""
    W = np.array(W, dtype=np.float64)
    x_pre = np.zeros(W.shape[-1] if W.ndim == 2 else W.shape[0])
    x_post = np.zeros(W.shape[0])
    for sp, so in zip(spk_pre, spk_post):
        x_pre *= np.exp(-dt / tau_plus)
        x_post *= np.exp(-dt / tau_minus)
        if W.ndim == 2:
            pot = a_plus * np.outer(so, x_pre)
            dep = a_minus * np.outer(x_post, sp)
        else:
            pot = a_plus * so * x_pre
            dep = a_minus * x_post * sp
        if soft:
            W = W + pot * (w_max - W) - dep * (W - w_min)
        else:
            W = W + pot - dep
        W = np.clip(W, w_min, w_max)
        x_pre += sp
        x_post += so
    return W, x_pre, x_post


def test_update_fn_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    n_in, n_out, T, dt = 4, 3, 60, 0.5
    cfg = dict(tau_plus=7.0, tau_minus=11.0, a_plus=0.04, a_minus=0.03,
               w_min=0.0, w_max=1.0)
    spk_pre = (rng.random((T, n_in)) < 0.15).astype(float)
    spk_post = (rng.random((T, n_out)) < 0.15).astype(float)
    for soft in (False, True):
        edge = STDP(n_in, n_out, weights=np.full((n_out, n_in), 0.5),
                    dtype=jnp.float64, soft_bounds=soft, **cfg)
        upd = edge.update_fn(dt)
        W, xp, xs = edge.params["weights"], edge.params["x_pre"], edge.params["x_post"]
        for t in range(T):
            W, xp, xs = upd(W, xp, xs, jnp.asarray(spk_pre[t]), jnp.asarray(spk_post[t]))
        W_ref, xp_ref, xs_ref = _numpy_stdp(
            np.full((n_out, n_in), 0.5), spk_pre, spk_post, dt, soft=soft, **cfg)
        np.testing.assert_allclose(np.asarray(W), W_ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(xp), xp_ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(xs), xs_ref, rtol=1e-12)


def test_update_fn_pair_timing_closed_form():
    """Single causal pair (pre at step 2, post at step 2+delta):
    dW = +a_plus * exp(-dt*delta/tau_plus); anti-causal: -a_minus * exp(...);
    zero-lag pairs do not interact (spikes join the traces AFTER use)."""
    dt, delta = 0.5, 6
    cfg = dict(tau_plus=8.0, tau_minus=5.0, a_plus=0.02, a_minus=0.015,
               w_min=-1.0, w_max=1.0)
    T = 20

    def run(pre_step, post_step):
        spk_pre = np.zeros((T, 1))
        spk_post = np.zeros((T, 1))
        spk_pre[pre_step, 0] = 1.0
        spk_post[post_step, 0] = 1.0
        edge = STDP(1, 1, weights=np.zeros((1, 1)), dtype=jnp.float64, **cfg)
        upd = edge.update_fn(dt)
        W, xp, xs = edge.params["weights"], edge.params["x_pre"], edge.params["x_post"]
        for t in range(T):
            W, xp, xs = upd(W, xp, xs, jnp.asarray(spk_pre[t]), jnp.asarray(spk_post[t]))
        return float(W[0, 0])

    assert run(2, 2 + delta) == pytest.approx(
        cfg["a_plus"] * np.exp(-dt * delta / cfg["tau_plus"]), rel=1e-12)
    assert run(2 + delta, 2) == pytest.approx(
        -cfg["a_minus"] * np.exp(-dt * delta / cfg["tau_minus"]), rel=1e-12)
    assert run(4, 4) == 0.0  # zero-lag


def test_update_fn_diagonal_matches_numpy():
    rng = np.random.default_rng(9)
    n, T, dt = 5, 40, 0.2
    cfg = dict(tau_plus=4.0, tau_minus=6.0, a_plus=0.05, a_minus=0.04,
               w_min=0.0, w_max=2.0)
    spk_pre = (rng.random((T, n)) < 0.2).astype(float)
    spk_post = (rng.random((T, n)) < 0.2).astype(float)
    w0 = rng.uniform(0.2, 1.8, size=n)
    edge = STDP(n, n, weights=w0, dtype=jnp.float64, **cfg)
    assert edge.params["weights"].ndim == 1
    upd = edge.update_fn(dt)
    W, xp, xs = edge.params["weights"], edge.params["x_pre"], edge.params["x_post"]
    for t in range(T):
        W, xp, xs = upd(W, xp, xs, jnp.asarray(spk_pre[t]), jnp.asarray(spk_post[t]))
    W_ref, _, _ = _numpy_stdp(w0, spk_pre, spk_post, dt, **cfg)
    np.testing.assert_allclose(np.asarray(W), W_ref, rtol=1e-12)


def test_stdp_constructor_validation():
    with pytest.raises(ValueError):
        STDP(2, 2, tau_plus=0.0)
    with pytest.raises(ValueError):
        STDP(2, 2, a_plus=-0.1)
    with pytest.raises(ValueError):
        STDP(2, 2, w_min=1.0, w_max=0.0)
    # default init: uniform within bounds, clipped
    edge = STDP(3, 4, w_min=0.1, w_max=0.9, rng=np.random.default_rng(0))
    W = np.asarray(edge.params["weights"])
    assert W.shape == (4, 3) and W.min() >= 0.1 and W.max() <= 0.9
    # eager update API moves the weight
    edge.update(np.ones(3), np.zeros(4), dt=0.1)  # pre spikes charge x_pre
    edge.update(np.zeros(3), np.ones(4), dt=0.1)  # post spikes -> potentiation
    assert np.asarray(edge.params["weights"]).mean() > W.mean()


# ------------------------------------------------------------ network level

def _pair_net(dt=0.1, a_plus=0.05, a_minus=0.05, w0=0.2):
    """inp(identity, 2ch) -> {pre, post} single-LIF populations; STDP edge
    pre -> post.  Channel 0 pulses drive pre, channel 1 post."""
    net = Network(dt, dtype=jnp.float64)
    net.add_func_node("inp", 2, activation_function="identity")
    for label, sel in (("pre", [[1.0, 0.0]]), ("post", [[0.0, 1.0]])):
        net.add_diffeq_node(label, LIF, weights=np.zeros((1, 1)), source_var="s",
                            target_var="s_in", input_var="I_ext", output_var="s",
                            op="lif_op", spike_var="spike", reset_var="v",
                            spike_threshold=1.0, spike_reset=0.0)
        net.add_edge("inp", label, weights=np.array(sel))
    net.add_edge("pre", "post", train="stdp", weights=np.full((1, 1), w0),
                 tau_plus=2.0, tau_minus=2.0, a_plus=a_plus, a_minus=a_minus,
                 w_min=0.0, w_max=1.0)
    return net


def _pulse_train(T, steps, channel, amp=50.0):
    x = np.zeros((T, 2))
    x[list(steps), channel] = amp
    return x


def test_fit_stdp_pair_protocol_end_to_end():
    """Repeated causal pairings (pre fires ~0.5 time-units before post)
    potentiate the STDP edge; anti-causal pairings depress it."""
    T, dt = 400, 0.1
    pre_steps = np.arange(20, 380, 40)

    def final_w(lead_channel_first):
        net = _pair_net(dt)
        if lead_channel_first:
            x = _pulse_train(T, pre_steps, 0) + _pulse_train(T, pre_steps + 5, 1)
        else:
            x = _pulse_train(T, pre_steps, 1) + _pulse_train(T, pre_steps + 5, 0)
        obs = net.fit_stdp(x, sampling_steps=50, verbose=False)
        w_mean = np.asarray(obs["w_mean"])
        assert np.all(np.isfinite(w_mean))
        return float(np.asarray(net.get_edge("pre", "post").params["weights"])[0, 0])

    w_causal = final_w(True)
    w_anti = final_w(False)
    assert w_causal > 0.2 + 1e-4, f"causal pairing should potentiate; got {w_causal}"
    assert w_anti < 0.2 - 1e-4, f"anti-causal pairing should depress; got {w_anti}"


def test_fit_stdp_scan_matches_eager_loop():
    """The fused fit_stdp scan == an eager Python loop over make_step and
    update_fn (exact, f64) -- same final W, traces, and network state."""
    T, dt = 150, 0.1
    rng = np.random.default_rng(5)
    x = (rng.random((T, 2)) < 0.08) * 40.0

    net = _pair_net(dt)
    edge = net.get_edge("pre", "post")
    step = net.make_step()
    state = net.init_state()
    params = net.parameters_pytree()
    upd = edge.update_fn(dt)
    pre_read = net.get_node("pre")._make_spike_reader()
    post_read = net.get_node("post")._make_spike_reader()
    W = edge.params["weights"]
    xp, xs = edge.params["x_pre"], edge.params["x_post"]
    spk_log = np.zeros((T, 1))
    v_log = np.zeros((T, 1))
    v_lo, v_hi = net.get_node("post")._var_map["v"]
    for t in range(T):
        spk_pre = pre_read(state["nodes"]["pre"]).astype(W.dtype)
        spk_post = post_read(state["nodes"]["post"]).astype(W.dtype)
        spk_log[t] = np.asarray(spk_post)
        p = {"nodes": params["nodes"],
             "edges": {**params["edges"], "pre->post": {**params["edges"]["pre->post"],
                                                        "weights": W}}}
        state, _, _ = step(state, p, jnp.asarray(x[t]))
        W, xp, xs = upd(W, xp, xs, spk_pre, spk_post)
        v_log[t] = np.asarray(state["nodes"]["post"][v_lo:v_hi])

    net2 = _pair_net(dt)
    obs2 = net2.fit_stdp(x, sampling_steps=50, verbose=False,
                         record_spikes=["post"],
                         record_vars=[("post", "v", False)])
    # raster windows END at each record step (inclusive); window 0 = step 0
    counts = obs2.to_numpy(("post", "spikes"))
    expected = [spk_log[0].sum()] + [spk_log[1 + 50 * k:51 + 50 * k].sum()
                                     for k in range(T // 50 - 1)]
    np.testing.assert_array_equal(counts[:, 0], np.asarray(expected, dtype=np.int32))
    # record_vars: post-update snapshots at the record steps (run() semantics)
    v_rec = obs2.to_numpy(("post", "v"))
    np.testing.assert_allclose(v_rec, v_log[np.arange(0, T, 50)], rtol=1e-12)
    edge2 = net2.get_edge("pre", "post")
    np.testing.assert_allclose(np.asarray(edge2.params["weights"]), np.asarray(W),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(edge2.params["x_pre"]), np.asarray(xp),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(edge2.params["x_post"]), np.asarray(xs),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(net2.get_node("post").y),
                               np.asarray(state["nodes"]["post"]), rtol=1e-12)


def test_fit_stdp_chunked_equals_single_call():
    """Two consecutive fit_stdp calls == one call over the concatenated
    inputs: W, both traces, and the network state all persist."""
    T, dt = 200, 0.1
    rng = np.random.default_rng(11)
    x = (rng.random((T, 2)) < 0.1) * 40.0

    net_a = _pair_net(dt)
    net_a.fit_stdp(x, sampling_steps=20, verbose=False)

    net_b = _pair_net(dt)
    net_b.fit_stdp(x[:T // 2], sampling_steps=20, verbose=False)
    net_b.fit_stdp(x[T // 2:], sampling_steps=20, verbose=False)

    for key in ("weights", "x_pre", "x_post"):
        np.testing.assert_allclose(
            np.asarray(net_b.get_edge("pre", "post").params[key]),
            np.asarray(net_a.get_edge("pre", "post").params[key]), rtol=1e-12,
            err_msg=f"{key} diverged across chunked calls")


def test_fit_stdp_recurrent_feedback_edge_and_bounds():
    """FeedbackNetwork: a QIF population with a plastic recurrent self-edge
    (feedback=True, train='stdp').  Soft bounds keep every weight strictly
    inside [w_min, w_max]; plasticity actually moves the weights."""
    n, T, dt = 6, 800, 1e-3
    rng = np.random.default_rng(2)
    net = FeedbackNetwork(dt, dtype=jnp.float64)
    net.add_diffeq_node("qif", QIF, weights=np.zeros((n, n)), source_var="s",
                        target_var="s_in", input_var="I_ext", output_var="s",
                        spike_var="spike", reset_var="v", spike_threshold=1e2,
                        spike_reset=-1e2, node_vars={"eta": 20.0})
    w0 = rng.uniform(0.3, 0.7, size=(n, n))
    net.add_edge("qif", "qif", feedback=True, train="stdp", weights=w0,
                 tau_plus=5e-3, tau_minus=5e-3, a_plus=0.05, a_minus=0.02,
                 w_min=0.0, w_max=1.0, soft_bounds=True)
    x = rng.normal(0.0, 5.0, size=(T, n))
    obs = net.fit_stdp(x, sampling_steps=100, verbose=False)
    W = np.asarray(net.get_edge("qif", "qif").params["weights"])
    assert np.all(np.isfinite(W))
    assert W.min() > 0.0 and W.max() < 1.0, "soft bounds must stay strictly inside"
    assert np.abs(W - np.clip(w0, 0, 1)).max() > 1e-4, "weights never moved"
    w_mean = np.asarray(obs["w_mean"])
    assert len(w_mean) == T // 100 and np.all(np.isfinite(w_mean))


def test_fit_stdp_input_spec_matches_materialized():
    """An on-device Poisson drive == its materialize(dt) dense equivalent."""
    n, T, dt = 4, 300, 1e-3
    net_spec = FeedbackNetwork(dt, dtype=jnp.float64)
    net_dense = FeedbackNetwork(dt, dtype=jnp.float64)
    for net in (net_spec, net_dense):
        net.add_diffeq_node("qif", QIF, weights=np.zeros((n, n)), source_var="s",
                            target_var="s_in", input_var="I_ext", output_var="s",
                            spike_var="spike", reset_var="v",
                            node_vars={"eta": 10.0})
        net.add_edge("qif", "qif", feedback=True, train="stdp",
                     weights=np.full((n, n), 0.5), tau_plus=5e-3, tau_minus=5e-3,
                     a_plus=0.03, a_minus=0.02, w_min=0.0, w_max=1.0)
    spec = Poisson(steps=T, channels=n, rate=200.0, amp=0.03, seed=7)
    net_spec.fit_stdp(spec, sampling_steps=100, verbose=False)
    net_dense.fit_stdp(spec.materialize(dt, dtype=np.float64), sampling_steps=100,
                       verbose=False)
    np.testing.assert_allclose(
        np.asarray(net_spec.get_edge("qif", "qif").params["weights"]),
        np.asarray(net_dense.get_edge("qif", "qif").params["weights"]), rtol=1e-12)


def test_fit_stdp_dispatch_and_errors():
    dt = 0.1
    net = _pair_net(dt)
    assert isinstance(net.get_edge("pre", "post"), STDP)
    assert net._train_edge == ("pre", "post")

    # no stdp edge registered
    net2 = Network(dt, dtype=jnp.float64)
    net2.add_diffeq_node("lif", LIF, weights=np.zeros((2, 2)), source_var="s",
                         target_var="s_in", input_var="I_ext", output_var="s",
                         op="lif_op", spike_var="spike", reset_var="v")
    with pytest.raises(ValueError, match="No STDP-trainable edge"):
        net2.fit_stdp(np.zeros((10, 2)), verbose=False)

    # registered train edge is not STDP
    net3 = Network(dt, dtype=jnp.float64)
    net3.add_diffeq_node("lif", LIF, weights=np.zeros((2, 2)), source_var="s",
                         target_var="s_in", input_var="I_ext", output_var="s",
                         op="lif_op", spike_var="spike", reset_var="v")
    net3.add_func_node("readout", 2, activation_function="identity")
    net3.add_edge("lif", "readout", train="rls")
    with pytest.raises(ValueError, match="not an STDP edge"):
        net3.fit_stdp(np.zeros((10, 2)), verbose=False)

    # non-spiking endpoint
    net4 = Network(dt, dtype=jnp.float64)
    net4.add_diffeq_node("lif", LIF, weights=np.zeros((2, 2)), source_var="s",
                         target_var="s_in", input_var="I_ext", output_var="s",
                         op="lif_op", spike_var="spike", reset_var="v")
    net4.add_func_node("readout", 2, activation_function="identity")
    net4.add_edge("lif", "readout", train="stdp")
    with pytest.raises(ValueError, match="not a spiking node"):
        net4.fit_stdp(np.zeros((10, 2)), verbose=False)


# -------------------------------------------------- reward-modulated (R-STDP)

def test_reward_update_fn_matches_numpy_oracle():
    """Izhikevich 2007 distal-reward rule: E <- E*exp(-dt/tau_e) + (pot-dep);
    W <- clip(W + r*E) -- vs an independent numpy simulation."""
    rng = np.random.default_rng(13)
    n_in, n_out, T, dt, tau_e = 3, 2, 80, 0.5, 15.0
    cfg = dict(tau_plus=6.0, tau_minus=9.0, a_plus=0.03, a_minus=0.025,
               w_min=0.0, w_max=1.0)
    spk_pre = (rng.random((T, n_in)) < 0.2).astype(float)
    spk_post = (rng.random((T, n_out)) < 0.2).astype(float)
    r = rng.normal(0.0, 0.5, size=T)

    edge = STDP(n_in, n_out, weights=np.full((n_out, n_in), 0.5),
                dtype=jnp.float64, **cfg)
    upd = edge.reward_update_fn(dt, tau_e)
    W = edge.params["weights"]
    E = jnp.zeros_like(W)
    xp, xs = edge.params["x_pre"], edge.params["x_post"]
    for t in range(T):
        W, E, xp, xs = upd(W, E, xp, xs, jnp.asarray(spk_pre[t]),
                           jnp.asarray(spk_post[t]), r[t])

    W_ref = np.full((n_out, n_in), 0.5)
    E_ref = np.zeros((n_out, n_in))
    xp_ref = np.zeros(n_in)
    xs_ref = np.zeros(n_out)
    for t in range(T):
        xp_ref *= np.exp(-dt / cfg["tau_plus"])
        xs_ref *= np.exp(-dt / cfg["tau_minus"])
        pot = cfg["a_plus"] * np.outer(spk_post[t], xp_ref)
        dep = cfg["a_minus"] * np.outer(xs_ref, spk_pre[t])
        E_ref = E_ref * np.exp(-dt / tau_e) + (pot - dep)
        W_ref = np.clip(W_ref + r[t] * E_ref, cfg["w_min"], cfg["w_max"])
        xp_ref += spk_pre[t]
        xs_ref += spk_post[t]
    np.testing.assert_allclose(np.asarray(W), W_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(E), E_ref, rtol=1e-12)


def _rstdp_net(dt=0.1):
    """inp(3ch) -> pre (2 LIF: channels 0,1) and post (1 LIF: channel 2);
    R-STDP edge pre -> post."""
    net = Network(dt, dtype=jnp.float64)
    net.add_func_node("inp", 3, activation_function="identity")
    net.add_diffeq_node("pre", LIF, weights=np.zeros((2, 2)), source_var="s",
                        target_var="s_in", input_var="I_ext", output_var="s",
                        op="lif_op", spike_var="spike", reset_var="v",
                        spike_threshold=1.0, spike_reset=0.0)
    net.add_diffeq_node("post", LIF, weights=np.zeros((1, 1)), source_var="s",
                        target_var="s_in", input_var="I_ext", output_var="s",
                        op="lif_op", spike_var="spike", reset_var="v",
                        spike_threshold=1.0, spike_reset=0.0)
    net.add_edge("inp", "pre", weights=np.array([[1.0, 0.0, 0.0],
                                                 [0.0, 1.0, 0.0]]))
    net.add_edge("inp", "post", weights=np.array([[0.0, 0.0, 1.0]]))
    net.add_edge("pre", "post", train="stdp", weights=np.full((1, 2), 0.3),
                 tau_plus=1.0, tau_minus=1.0, a_plus=0.05, a_minus=0.05,
                 w_min=0.0, w_max=1.0)
    return net


def test_rstdp_distal_reward_credit_assignment():
    """The paired pre-synapse (pre-1 fires just before post, reward arrives a
    few steps later) potentiates; the unpaired pre-synapse (pre-2 fires far
    from post, outside the STDP window but inside the reward epoch) does
    not -- the eligibility trace assigns delayed credit to the right synapse."""
    T, dt = 600, 0.1
    x = np.zeros((T, 3))
    r = np.zeros(T)
    for t0 in range(20, 560, 60):
        x[t0, 0] = 50.0          # pre-1 pulse
        x[t0 + 4, 2] = 50.0      # post pulse: causal pairing with pre-1
        x[t0 + 30, 1] = 50.0     # pre-2 pulse: ~3 tau_+ after post's spike
        r[t0 + 20] = 1.0         # reward 16 steps after the pairing

    net = _rstdp_net(dt)
    w0 = np.asarray(net.get_edge("pre", "post").params["weights"]).copy()
    net.fit_stdp(x, reward=r, tau_e=5.0, sampling_steps=100, verbose=False)
    W = np.asarray(net.get_edge("pre", "post").params["weights"])
    dw_paired = W[0, 0] - w0[0, 0]
    dw_unpaired = W[0, 1] - w0[0, 1]
    assert dw_paired > 1e-4, f"paired synapse should potentiate; got {dw_paired}"
    assert dw_paired > 5 * abs(dw_unpaired), \
        f"credit misassigned: paired {dw_paired} vs unpaired {dw_unpaired}"
    # eligibility trace persisted on the edge
    assert "elig" in net.get_edge("pre", "post").params


def test_rstdp_chunked_equals_single_call():
    T, dt = 300, 0.1
    rng = np.random.default_rng(17)
    x = (rng.random((T, 3)) < 0.1) * 40.0
    r = rng.normal(0.0, 0.3, size=T)

    net_a = _rstdp_net(dt)
    net_a.fit_stdp(x, reward=r, tau_e=4.0, sampling_steps=50, verbose=False)

    net_b = _rstdp_net(dt)
    net_b.fit_stdp(x[:T // 2], reward=r[:T // 2], tau_e=4.0, sampling_steps=50,
                   verbose=False)
    net_b.fit_stdp(x[T // 2:], reward=r[T // 2:], tau_e=4.0, sampling_steps=50,
                   verbose=False)
    for key in ("weights", "elig", "x_pre", "x_post"):
        np.testing.assert_allclose(
            np.asarray(net_b.get_edge("pre", "post").params[key]),
            np.asarray(net_a.get_edge("pre", "post").params[key]), rtol=1e-12,
            err_msg=f"{key} diverged across chunked reward calls")


def test_rstdp_validation_errors():
    net = _rstdp_net(0.1)
    with pytest.raises(ValueError, match="one value per step"):
        net.fit_stdp(np.zeros((10, 3)), reward=np.zeros(5), verbose=False)

    # soft bounds are incompatible with signed reward
    net2 = Network(0.1, dtype=jnp.float64)
    net2.add_func_node("inp", 2, activation_function="identity")
    for label, sel in (("pre", [[1.0, 0.0]]), ("post", [[0.0, 1.0]])):
        net2.add_diffeq_node(label, LIF, weights=np.zeros((1, 1)), source_var="s",
                             target_var="s_in", input_var="I_ext", output_var="s",
                             op="lif_op", spike_var="spike", reset_var="v")
        net2.add_edge("inp", label, weights=np.array(sel))
    net2.add_edge("pre", "post", train="stdp", soft_bounds=True)
    with pytest.raises(ValueError, match="hard bounds"):
        net2.fit_stdp(np.zeros((10, 2)), reward=np.zeros(10), verbose=False)
    with pytest.raises(ValueError, match="tau_e"):
        STDP(2, 2).reward_update_fn(0.1, tau_e=0.0)
    # tau_e without reward= is a misconfiguration, not silently ignored
    net3 = _rstdp_net(0.1)
    with pytest.raises(ValueError, match="tau_e only applies"):
        net3.fit_stdp(np.zeros((10, 3)), tau_e=5.0, verbose=False)
    # spike-vector width must match the edge dims (clear error, not a
    # shape blowup inside the jitted scan)
    net4 = _rstdp_net(0.1)
    net4.pop_edge("pre", "post")
    net4.add_edge("pre", "post", train="stdp", weights=np.full((1, 2), 0.3))
    net4.get_edge("pre", "post").n_in = 3  # simulate a width mismatch
    with pytest.raises(ValueError, match="spike vector"):
        net4.fit_stdp(np.zeros((10, 3)), verbose=False)


# -------------------------------------------------------- homeostatic scaling

def _wide_net(dt=0.1, n_pre=4, n_post=2, w0=None, seed=13):
    """inp(identity, n_pre + n_post ch) -> pre / post LIF populations with an
    STDP edge; channel i drives pre[i], channel n_pre + j drives post[j]."""
    rng = np.random.default_rng(seed)
    m = n_pre + n_post
    net = Network(dt, dtype=jnp.float64)
    net.add_func_node("inp", m, activation_function="identity")
    sel_pre = np.eye(n_pre, m)
    sel_post = np.eye(n_post, m, k=n_pre)
    for label, n, sel in (("pre", n_pre, sel_pre), ("post", n_post, sel_post)):
        net.add_diffeq_node(label, LIF, weights=np.zeros((n, n)), source_var="s",
                            target_var="s_in", input_var="I_ext", output_var="s",
                            op="lif_op", spike_var="spike", reset_var="v",
                            spike_threshold=1.0, spike_reset=0.0)
        net.add_edge("inp", label, weights=sel)
    if w0 is None:
        w0 = rng.uniform(0.1, 0.4, size=(n_post, n_pre))
    net.add_edge("pre", "post", train="stdp", weights=w0, tau_plus=2.0,
                 tau_minus=2.0, a_plus=0.05, a_minus=0.04, w_min=0.0, w_max=1.0)
    return net


def test_fit_stdp_homeostasis_matches_eager_loop():
    """fit_stdp(homeostasis_steps=) == eager loop with the documented
    multiplicative scaling interleaved (exact, f64)."""
    T, dt, h = 120, 0.1, 25
    rng = np.random.default_rng(23)
    x = (rng.random((T, 6)) < 0.15) * 40.0
    w0 = rng.uniform(0.1, 0.4, size=(2, 4))
    target = (w0 - 0.0).sum(axis=1)

    net = _wide_net(dt, w0=w0)
    edge = net.get_edge("pre", "post")
    step = net.make_step()
    state = net.init_state()
    params = net.parameters_pytree()
    upd = edge.update_fn(dt)
    pre_read = net.get_node("pre")._make_spike_reader()
    post_read = net.get_node("post")._make_spike_reader()
    W, xp, xs = edge.params["weights"], edge.params["x_pre"], edge.params["x_post"]
    for t in range(T):
        spk_pre = pre_read(state["nodes"]["pre"]).astype(W.dtype)
        spk_post = post_read(state["nodes"]["post"]).astype(W.dtype)
        p = {"nodes": params["nodes"],
             "edges": {**params["edges"], "pre->post": {**params["edges"]["pre->post"],
                                                        "weights": W}}}
        state, _, _ = step(state, p, jnp.asarray(x[t]))
        W, xp, xs = upd(W, xp, xs, spk_pre, spk_post)
        if t % h == h - 1:
            above = np.asarray(W)
            scale = target / (above.sum(axis=1) + 1e-12)
            W = jnp.asarray(np.clip(above * scale[:, None], 0.0, 1.0))

    net2 = _wide_net(dt, w0=w0)
    net2.fit_stdp(x, sampling_steps=40, homeostasis_steps=h, verbose=False)
    np.testing.assert_allclose(
        np.asarray(net2.get_edge("pre", "post").params["weights"]),
        np.asarray(W), rtol=1e-12)


def test_fit_stdp_homeostasis_pins_row_mass():
    """With T a multiple of the period, every row's above-floor sum ends ON
    target while STDP still reshapes the relative structure."""
    T, dt, h = 200, 0.1, 20
    rng = np.random.default_rng(31)
    x = (rng.random((T, 6)) < 0.2) * 40.0
    w0 = rng.uniform(0.1, 0.4, size=(2, 4))

    net = _wide_net(dt, w0=w0)
    net.fit_stdp(x, sampling_steps=50, homeostasis_steps=h, verbose=False)
    W = np.asarray(net.get_edge("pre", "post").params["weights"])
    np.testing.assert_allclose(W.sum(axis=1), w0.sum(axis=1), rtol=1e-9)
    # plasticity still happened: the structure moved even though sums did not
    assert np.max(np.abs(W - w0)) > 1e-4

    # without homeostasis the same protocol drifts the row sums
    net_free = _wide_net(dt, w0=w0)
    net_free.fit_stdp(x, sampling_steps=50, verbose=False)
    W_free = np.asarray(net_free.get_edge("pre", "post").params["weights"])
    assert np.max(np.abs(W_free.sum(axis=1) - w0.sum(axis=1))) > 1e-4


def test_fit_stdp_homeostasis_chunked_keeps_one_target():
    """Chunked calls reuse the first call's target (stored on the edge):
    two chunks == one long call exactly."""
    T, dt, h = 160, 0.1, 16
    rng = np.random.default_rng(37)
    x = (rng.random((T, 6)) < 0.15) * 40.0
    w0 = rng.uniform(0.1, 0.4, size=(2, 4))

    net_a = _wide_net(dt, w0=w0)
    net_a.fit_stdp(x, sampling_steps=40, homeostasis_steps=h, verbose=False)

    net_b = _wide_net(dt, w0=w0)
    net_b.fit_stdp(x[:T // 2], sampling_steps=40, homeostasis_steps=h, verbose=False)
    net_b.fit_stdp(x[T // 2:], sampling_steps=40, homeostasis_steps=h, verbose=False)
    np.testing.assert_allclose(
        np.asarray(net_b.get_edge("pre", "post").params["weights"]),
        np.asarray(net_a.get_edge("pre", "post").params["weights"]), rtol=1e-12)


def test_fit_stdp_homeostasis_errors():
    net = _pair_net()
    x = np.zeros((10, 2))
    with pytest.raises(ValueError, match="positive integer"):
        net.fit_stdp(x, homeostasis_steps=0, verbose=False)
    with pytest.raises(ValueError, match="only applies"):
        net.fit_stdp(x, homeostasis_target=1.0, verbose=False)
    net2 = _wide_net()
    with pytest.raises(ValueError, match="per-row"):
        net2.fit_stdp(x[:, :6] if x.shape[1] >= 6 else np.zeros((10, 6)),
                      homeostasis_steps=5, homeostasis_target=np.ones(3),
                      verbose=False)


def test_fit_stdp_homeostasis_chunks_not_multiple_of_period():
    """The scaling schedule is GLOBAL: chunk lengths that are not multiples
    of homeostasis_steps still reproduce one long call exactly (the phase
    rides on the edge)."""
    T, dt, h = 150, 0.1, 16  # 150 % 16 != 0, chunks 70/80 neither
    rng = np.random.default_rng(41)
    x = (rng.random((T, 6)) < 0.15) * 40.0
    w0 = rng.uniform(0.1, 0.4, size=(2, 4))

    net_a = _wide_net(dt, w0=w0)
    net_a.fit_stdp(x, sampling_steps=50, homeostasis_steps=h, verbose=False)

    net_b = _wide_net(dt, w0=w0)
    net_b.fit_stdp(x[:70], sampling_steps=50, homeostasis_steps=h, verbose=False)
    net_b.fit_stdp(x[70:], sampling_steps=50, homeostasis_steps=h, verbose=False)
    np.testing.assert_allclose(
        np.asarray(net_b.get_edge("pre", "post").params["weights"]),
        np.asarray(net_a.get_edge("pre", "post").params["weights"]), rtol=1e-12)


def test_fit_stdp_homeostasis_segmented_equals_cond_path():
    """The ALIGNED fast path (steps and phase multiples of the period ->
    scan segmented at scaling boundaries, one (n, n) scaling pass per
    period) computes exactly what the per-step lax.cond path computes:
    one aligned call == unaligned chunks of the same protocol (chunk
    lengths not multiples of the period force the cond path)."""
    T, dt, h = 160, 0.1, 16
    rng = np.random.default_rng(53)
    x = (rng.random((T, 6)) < 0.15) * 40.0
    w0 = rng.uniform(0.1, 0.4, size=(2, 4))

    net_a = _wide_net(dt, w0=w0)  # 160 % 16 == 0, phase 0 -> segmented
    obs_a = net_a.fit_stdp(x, sampling_steps=40, homeostasis_steps=h, verbose=False)

    net_b = _wide_net(dt, w0=w0)  # 72 % 16 != 0 and 88 % 16 != 0 -> cond path
    net_b.fit_stdp(x[:72], sampling_steps=40, homeostasis_steps=h, verbose=False)
    net_b.fit_stdp(x[72:], sampling_steps=40, homeostasis_steps=h, verbose=False)
    np.testing.assert_allclose(
        np.asarray(net_b.get_edge("pre", "post").params["weights"]),
        np.asarray(net_a.get_edge("pre", "post").params["weights"]), rtol=1e-12)
    # the segmented program recorded the full output grid
    assert obs_a.to_numpy("out").shape[0] == T // 40


def test_fit_stdp_homeostasis_feedback_self_edge_pins_stored_rows():
    """Homeostasis on a recurrent feedback self-edge: the STORED rows pin
    (reference-parity: a square weights matrix is auto-transposed on edge
    construction, so the targets are the passed matrix's COLUMN sums)."""
    from rectipy_tpu import FeedbackNetwork, Poisson

    rng = np.random.default_rng(1)
    N, dt, T, h = 12, 1e-3, 200, 50
    net = FeedbackNetwork(dt)
    net.add_diffeq_node(
        "qif", QIF, weights=np.zeros((N, N)), source_var="s", target_var="s_in",
        input_var="I_ext", output_var="s", spike_var="spike", reset_var="v",
        op="qif_op", spike_threshold=100.0, spike_reset=-100.0,
        node_vars={"all/qif_op/eta": rng.uniform(-2.0, 1.0, N)})
    w0 = rng.uniform(0.0, 0.4, size=(N, N))
    net.add_edge("qif", "qif", feedback=True, train="stdp", weights=w0,
                 tau_plus=20e-3, tau_minus=20e-3, a_plus=5e-3, a_minus=6e-3,
                 w_min=0.0, w_max=0.5)
    drive = Poisson(T, channels=N, rate=40.0, amp=15.0, seed=3)
    net.fit_stdp(drive, sampling_steps=50, verbose=False, homeostasis_steps=h)
    W = np.asarray(net.get_edge("qif", "qif").params["weights"])
    np.testing.assert_allclose(W.sum(axis=1), w0.sum(axis=0), rtol=1e-5)
    assert np.max(np.abs(W - w0.T)) > 1e-4  # plasticity reshaped the rows


# ------------------------------------------------- block-sparse STDP (N>>10k)

def _toy_coupling(rng, nb=3, cb=2, bs=2, lo=0.2, hi=0.6):
    """Small BlockSparseCoupling with distinct source blocks per row."""
    from rectipy_tpu import BlockSparseCoupling

    cols = np.stack([rng.choice(nb, size=cb, replace=False)
                     for _ in range(nb)]).astype(np.int32)
    blocks = rng.uniform(lo, hi, size=(nb, cb, bs, bs))
    return BlockSparseCoupling(blocks, cols)


def test_block_stdp_update_fn_matches_dense_rule_on_block_entries():
    """Every stored block entry follows the dense pair rule for the synapse
    it stores (per-entry independence: no homeostasis).  Hard + soft bounds,
    exact in f64."""
    from rectipy_tpu import BlockSparseSTDP

    rng = np.random.default_rng(21)
    nb, cb, bs, T, dt = 3, 2, 2, 80, 0.5
    n = nb * bs
    cfg = dict(tau_plus=6.0, tau_minus=9.0, a_plus=0.05, a_minus=0.04,
               w_min=0.1, w_max=0.9)
    A = _toy_coupling(rng, nb, cb, bs)
    spk_pre = (rng.random((T, n)) < 0.2).astype(float)
    spk_post = (rng.random((T, n)) < 0.2).astype(float)
    for soft in (False, True):
        edge = BlockSparseSTDP(n, n, weights=A, dtype=jnp.float64,
                               soft_bounds=soft, **cfg)
        upd = edge.update_fn(dt)
        W = edge.params["weights"]
        xp, xs = edge.params["x_pre"], edge.params["x_post"]
        for t in range(T):
            W, xp, xs = upd(W, xp, xs, jnp.asarray(spk_pre[t]),
                            jnp.asarray(spk_post[t]))
        # dense oracle on the equivalent full matrix, then gather blocks
        W_ref, xp_ref, xs_ref = _numpy_stdp(
            np.clip(A.to_dense(), cfg["w_min"], cfg["w_max"]),
            spk_pre, spk_post, dt, soft=soft, **cfg)
        W = np.asarray(W)
        for r in range(nb):
            for c in range(cb):
                j = int(A.cols[r, c]) * bs
                np.testing.assert_allclose(
                    W[r, c], W_ref[r * bs:(r + 1) * bs, j:j + bs], rtol=1e-12,
                    err_msg=f"block ({r},{c}) diverged from the dense rule")
        np.testing.assert_allclose(np.asarray(xp), xp_ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(xs), xs_ref, rtol=1e-12)


def test_block_stdp_reward_update_matches_dense_rule():
    """Reward-modulated (three-factor) mode on blocks == the dense rule per
    stored entry."""
    from rectipy_tpu import BlockSparseSTDP

    rng = np.random.default_rng(22)
    nb, cb, bs, T, dt, tau_e = 2, 2, 3, 60, 0.5, 40.0
    n = nb * bs
    cfg = dict(tau_plus=6.0, tau_minus=9.0, a_plus=0.05, a_minus=0.04,
               w_min=-0.5, w_max=0.9)
    A = _toy_coupling(rng, nb, cb, bs)
    spk_pre = (rng.random((T, n)) < 0.2).astype(float)
    spk_post = (rng.random((T, n)) < 0.2).astype(float)
    reward = rng.normal(size=T)

    edge = BlockSparseSTDP(n, n, weights=A, dtype=jnp.float64, **cfg)
    upd = edge.reward_update_fn(dt, tau_e)
    W = edge.params["weights"]
    E = jnp.zeros_like(W)
    xp, xs = edge.params["x_pre"], edge.params["x_post"]
    for t in range(T):
        W, E, xp, xs = upd(W, E, xp, xs, jnp.asarray(spk_pre[t]),
                           jnp.asarray(spk_post[t]), reward[t])

    # the dense edge auto-transposes a square weights matrix on construction
    # (reference parity); pre-transpose so the stored rows equal to_dense()
    dense = STDP(n, n, weights=np.clip(A.to_dense(), cfg["w_min"], cfg["w_max"]).T,
                 dtype=jnp.float64, **cfg)
    upd_d = dense.reward_update_fn(dt, tau_e)
    Wd = dense.params["weights"]
    Ed = jnp.zeros_like(Wd)
    xpd, xsd = dense.params["x_pre"], dense.params["x_post"]
    for t in range(T):
        Wd, Ed, xpd, xsd = upd_d(Wd, Ed, xpd, xsd, jnp.asarray(spk_pre[t]),
                                 jnp.asarray(spk_post[t]), reward[t])
    W, Wd = np.asarray(W), np.asarray(Wd)
    for r in range(nb):
        for c in range(cb):
            j = int(A.cols[r, c]) * bs
            np.testing.assert_allclose(W[r, c], Wd[r * bs:(r + 1) * bs, j:j + bs],
                                       rtol=1e-12)


def _block_net(dt, A, dense=False, n=None, homeo=None, **stdp_kw):
    """QIF population with a plastic recurrent self-edge: block-sparse or
    the dense equivalent (same initial synapses)."""
    n = n or A.shape[0]
    rng = np.random.default_rng(4)
    net = FeedbackNetwork(dt, dtype=jnp.float64)
    net.add_diffeq_node(
        "qif", QIF, weights=np.zeros((n, n)), source_var="s", target_var="s_in",
        input_var="I_ext", output_var="s", spike_var="spike", reset_var="v",
        op="qif_op", spike_threshold=100.0, spike_reset=-100.0,
        node_vars={"all/qif_op/eta": rng.uniform(300.0, 500.0, n)})
    kw = dict(tau_plus=20e-3, tau_minus=20e-3, a_plus=5e-3, a_minus=4e-3,
              w_min=0.0, w_max=1.0)
    kw.update(stdp_kw)
    if dense:
        # the dense STDP edge auto-transposes a square matrix on
        # construction (reference parity); pre-transpose so the stored
        # rows equal the block edge's dense equivalent
        net.add_edge("qif", "qif", feedback=True, train="stdp",
                     weights=A.to_dense().T, **kw)
    else:
        net.add_edge("qif", "qif", feedback=True, train="stdp", weights=A, **kw)
    return net


def test_fit_stdp_block_full_coverage_equals_dense_end_to_end():
    """With every source block present (cb == nb) the block edge stores the
    FULL matrix, so the entire fit -- projection, spikes, plasticity, and
    homeostatic scaling -- must equal the dense-edge network exactly."""
    from rectipy_tpu import BlockSparseCoupling, BlockSparseSTDP

    rng = np.random.default_rng(31)
    nb, bs, T, dt = 2, 3, 400, 1e-3
    n = nb * bs
    cols = np.stack([np.arange(nb, dtype=np.int32)] * nb)
    blocks = rng.uniform(0.1, 0.5, size=(nb, nb, bs, bs))
    A = BlockSparseCoupling(blocks, cols)
    x = (rng.random((T, n)) < 0.1) * 30.0

    for homeo in (None, 100):
        net_blk = _block_net(dt, A)
        net_dns = _block_net(dt, A, dense=True)
        assert isinstance(net_blk.get_edge("qif", "qif"), BlockSparseSTDP)
        kw = {"homeostasis_steps": homeo} if homeo else {}
        obs_b = net_blk.fit_stdp(x, sampling_steps=100, verbose=False, **kw)
        obs_d = net_dns.fit_stdp(x, sampling_steps=100, verbose=False, **kw)
        Wb = np.asarray(net_blk.get_edge("qif", "qif").params["weights"])
        Wd = np.asarray(net_dns.get_edge("qif", "qif").params["weights"])
        for r in range(nb):
            for c in range(nb):
                np.testing.assert_allclose(
                    Wb[r, c], Wd[r * bs:(r + 1) * bs, c * bs:(c + 1) * bs],
                    rtol=1e-10, err_msg=f"homeo={homeo} block ({r},{c})")
        np.testing.assert_allclose(obs_b.to_numpy("out"), obs_d.to_numpy("out"),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(obs_b["w_mean"]),
                                   np.asarray(obs_d["w_mean"]), rtol=1e-10)


def test_fit_stdp_block_chunked_equals_single_call_with_homeostasis():
    """Chunked block-STDP calls (unaligned to the homeostasis period) ==
    one long call: W, traces, scaling target AND phase all persist."""
    rng = np.random.default_rng(32)
    T, dt, h = 240, 1e-3, 64
    A = _toy_coupling(rng, nb=3, cb=2, bs=2)
    x = (rng.random((T, A.shape[0])) < 0.12) * 30.0

    net_a = _block_net(dt, A)
    net_a.fit_stdp(x, sampling_steps=40, homeostasis_steps=h, verbose=False)

    net_b = _block_net(dt, A)
    net_b.fit_stdp(x[:90], sampling_steps=40, homeostasis_steps=h, verbose=False)
    net_b.fit_stdp(x[90:], sampling_steps=40, homeostasis_steps=h, verbose=False)
    for key in ("weights", "x_pre", "x_post"):
        np.testing.assert_allclose(
            np.asarray(net_b.get_edge("qif", "qif").params[key]),
            np.asarray(net_a.get_edge("qif", "qif").params[key]), rtol=1e-12,
            err_msg=f"{key} diverged across chunked calls")


def test_fit_stdp_block_homeostasis_pins_block_row_mass():
    """After an aligned scaling step, every postsynaptic neuron's above-floor
    block-row mass equals its target (the initial mass)."""
    rng = np.random.default_rng(33)
    T, dt, h = 200, 1e-3, 200  # one full period -> final W is freshly scaled
    A = _toy_coupling(rng, nb=3, cb=2, bs=2)
    net = _block_net(dt, A)
    edge = net.get_edge("qif", "qif")
    target0 = np.asarray(edge.params["weights"]).sum(axis=(1, 3)).ravel()
    x = (rng.random((T, A.shape[0])) < 0.15) * 30.0
    net.fit_stdp(x, sampling_steps=50, homeostasis_steps=h, verbose=False)
    W = np.asarray(edge.params["weights"])
    np.testing.assert_allclose(W.sum(axis=(1, 3)).ravel(), target0, rtol=1e-6)
    assert np.abs(W - np.asarray(_block_net(dt, A).get_edge(
        "qif", "qif").params["weights"])).max() > 1e-5  # plasticity moved W


def test_fit_stdp_block_reward_mode_end_to_end():
    """Reward-modulated block STDP through the network scan: eligibility
    persists on the edge, weights stay bounded and move."""
    rng = np.random.default_rng(34)
    T, dt = 300, 1e-3
    A = _toy_coupling(rng, nb=3, cb=2, bs=2)
    net = _block_net(dt, A)
    x = (rng.random((T, A.shape[0])) < 0.15) * 30.0
    reward = rng.normal(size=T)
    net.fit_stdp(x, sampling_steps=50, reward=reward, verbose=False)
    edge = net.get_edge("qif", "qif")
    assert "elig" in edge.params and edge.params["elig"].shape == \
        edge.params["weights"].shape
    W = np.asarray(edge.params["weights"])
    assert np.all(np.isfinite(W)) and W.min() >= 0.0 and W.max() <= 1.0
    assert np.abs(W - np.asarray(_block_net(dt, A).get_edge(
        "qif", "qif").params["weights"])).max() > 1e-6


def test_block_stdp_dispatch_and_errors():
    rng = np.random.default_rng(35)
    A = _toy_coupling(rng, nb=3, cb=2, bs=2)
    from rectipy_tpu import BlockSparseSTDP

    net = _block_net(1e-3, A)
    assert isinstance(net.get_edge("qif", "qif"), BlockSparseSTDP)
    assert net._train_edge == ("qif", "qif")

    # structural kwargs (delays/masks/filters/STP) cannot ride a plastic
    # edge -- neither block-sparse NOR dense (the dense form previously
    # dropped them SILENTLY; round-5 review finding)
    net2 = FeedbackNetwork(1e-3, dtype=jnp.float64)
    net2.add_diffeq_node("qif", QIF, weights=np.zeros((6, 6)), source_var="s",
                         target_var="s_in", input_var="I_ext", output_var="s",
                         spike_var="spike", reset_var="v")
    with pytest.raises(ValueError, match="not supported on a plastic"):
        net2.add_edge("qif", "qif", feedback=True, train="stdp", weights=A,
                      delays=np.zeros((3, 2), dtype=int))
    with pytest.raises(ValueError, match="not supported on a plastic"):
        net2.add_edge("qif", "qif", feedback=True, train="stdp",
                      weights=np.full((6, 6), 0.3), delays=np.arange(6))
    with pytest.raises(ValueError, match="not supported on a plastic"):
        net2.add_edge("qif", "qif", feedback=True, train="stdp",
                      weights=np.full((6, 6), 0.3), mask=np.eye(6))
    # integer w_dtype would silently truncate the pair increments
    with pytest.raises(ValueError, match="floating"):
        net2.add_edge("qif", "qif", feedback=True, train="stdp",
                      weights=np.full((6, 6), 0.3), w_dtype=jnp.int8)
    # hyperparameter validation applies to the block edge too
    with pytest.raises(ValueError, match="tau_plus"):
        BlockSparseSTDP(6, 6, weights=A, tau_plus=0.0)


def test_stdp_reduced_precision_w_carry():
    """w_dtype='bfloat16' halves the plastic-W carry traffic (the measured
    dense roofline); dynamics stay qualitatively right -- causal pairing
    still potentiates -- and the carry really is bf16."""
    T, dt = 400, 0.1
    pre_steps = np.arange(20, 380, 40)
    net = Network(dt, dtype=jnp.float64)
    net.add_func_node("inp", 2, activation_function="identity")
    for label, sel in (("pre", [[1.0, 0.0]]), ("post", [[0.0, 1.0]])):
        net.add_diffeq_node(label, LIF, weights=np.zeros((1, 1)), source_var="s",
                            target_var="s_in", input_var="I_ext", output_var="s",
                            op="lif_op", spike_var="spike", reset_var="v",
                            spike_threshold=1.0, spike_reset=0.0)
        net.add_edge("inp", label, weights=np.array(sel))
    net.add_edge("pre", "post", train="stdp", weights=np.full((1, 1), 0.25),
                 tau_plus=2.0, tau_minus=2.0, a_plus=0.05, a_minus=0.05,
                 w_min=0.0, w_max=1.0, w_dtype=jnp.bfloat16)
    edge = net.get_edge("pre", "post")
    assert edge.params["weights"].dtype == jnp.bfloat16
    x = _pulse_train(T, pre_steps, 0) + _pulse_train(T, pre_steps + 5, 1)
    net.fit_stdp(x, sampling_steps=50, verbose=False)
    w = float(np.asarray(edge.params["weights"].astype(jnp.float32))[0, 0])
    assert edge.params["weights"].dtype == jnp.bfloat16
    assert w > 0.25 + 1e-3, f"causal pairing should potentiate; got {w}"


def test_fit_stdp_block_mesh_matches_single_device():
    """Block-sparse STDP under run-time population sharding (mesh=) == the
    single-device fit exactly (weights, traces, records)."""
    from rectipy_tpu.parallel import make_mesh

    rng = np.random.default_rng(44)
    T, dt = 200, 1e-3
    A = _toy_coupling(rng, nb=4, cb=2, bs=2)
    x = (rng.random((T, A.shape[0])) < 0.15) * 30.0

    net_a = _block_net(dt, A)
    obs_a = net_a.fit_stdp(x, sampling_steps=50, verbose=False,
                           homeostasis_steps=50)
    net_b = _block_net(dt, A)
    obs_b = net_b.fit_stdp(x, sampling_steps=50, verbose=False,
                           homeostasis_steps=50, mesh=make_mesh(4))
    for key in ("weights", "x_pre", "x_post"):
        np.testing.assert_allclose(
            np.asarray(net_b.get_edge("qif", "qif").params[key]),
            np.asarray(net_a.get_edge("qif", "qif").params[key]), rtol=1e-12,
            err_msg=f"{key} diverged under mesh")
    np.testing.assert_allclose(np.asarray(obs_b["w_mean"]),
                               np.asarray(obs_a["w_mean"]), rtol=1e-12)
