"""LinearSTP: Tsodyks-Markram short-term synaptic plasticity edge.

Beyond-reference component (the reference edge family,
/root/reference/rectipy/edges.py:8-234, is static/delay/filter only).
Covered here:
- scanned make_step vs an independent numpy oracle of the documented rule
- paired-pulse facilitation (second response larger) and closed-form jump
- frequency-dependent depression (steady state below first response,
  resources bounded in [0, 1])
- Network.run threads the (u, x) carry == eager per-step forward loop
- chunked runs continue the synaptic state exactly (one long run == chunks)
- checkpoint save/restore round-trips the plastic state
- add_edge kwarg dispatch + validation errors
- gradient training straight through the STP dynamics (plain BPTT fallback)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network
from rectipy_tpu.edges import LinearSTP

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"


def _numpy_stp(W, r_seq, dt, tau_f, tau_d, U):
    """Independent oracle of the documented update (facilitation jump first,
    transmission from pre-consumption resources, exponential relaxation)."""
    n_in = W.shape[-1] if W.ndim == 2 else W.shape[0]
    u = np.full(n_in, U)
    x = np.ones(n_in)
    d_f = np.exp(-dt / tau_f) if tau_f > 0 else 0.0
    d_d = np.exp(-dt / tau_d) if tau_d > 0 else 0.0
    outs = []
    for r in r_seq:
        m = np.clip(r * dt, 0.0, 1.0)
        u_plus = u + U * (1.0 - u) * m if tau_f > 0 else u
        drive = u_plus * x * r
        x_minus = x * (1.0 - u_plus * m) if tau_d > 0 else x
        u = U + (u_plus - U) * d_f
        x = 1.0 + (x_minus - 1.0) * d_d
        outs.append(W @ drive if W.ndim == 2 else W * drive)
    return np.stack(outs), u, x


def test_step_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    n_in, n_out, T, dt = 5, 3, 80, 0.1
    W = rng.normal(size=(n_out, n_in))
    r_seq = np.abs(rng.normal(size=(T, n_in))) * 3.0
    for tau_f, tau_d in ((50.0, 200.0), (0.0, 150.0), (80.0, 0.0)):
        edge = LinearSTP(n_in, n_out, dt=dt, weights=W, tau_facil=tau_f,
                         tau_depress=tau_d, U=0.3)
        step = edge.make_step()
        state = edge.init_state()
        outs = []
        for t in range(T):
            state, y = step(state, edge.params, jnp.asarray(r_seq[t]))
            outs.append(np.asarray(y))
        ref, u_ref, x_ref = _numpy_stp(W, r_seq, dt, tau_f, tau_d, 0.3)
        np.testing.assert_allclose(np.stack(outs), ref, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(state[0]), u_ref, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(state[1]), x_ref, rtol=1e-10)


def test_diagonal_weights_oracle():
    rng = np.random.default_rng(2)
    n, T, dt = 6, 40, 0.05
    g = rng.normal(size=n)
    r_seq = np.abs(rng.normal(size=(T, n)))
    edge = LinearSTP(n, n, dt=dt, weights=g, tau_facil=30.0, tau_depress=90.0, U=0.25)
    step = edge.make_step()
    state = edge.init_state()
    outs = []
    for t in range(T):
        state, y = step(state, edge.params, jnp.asarray(r_seq[t]))
        outs.append(np.asarray(y))
    ref, _, _ = _numpy_stp(g, r_seq, dt, 30.0, 90.0, 0.25)
    np.testing.assert_allclose(np.stack(outs), ref, rtol=1e-10)


def test_paired_pulse_facilitation():
    """Facilitation-only synapse: the second of two unit impulses transmits
    more, by exactly the decayed utilization jump."""
    dt, U, tau_f = 0.1, 0.2, 50.0
    edge = LinearSTP(1, 1, dt=dt, weights=np.ones((1, 1)), tau_facil=tau_f,
                     tau_depress=0.0, U=U)
    step = edge.make_step()
    state = edge.init_state()
    gap = 20
    responses = []
    for t in range(2 * gap):
        r = jnp.asarray([1.0 / dt]) if t % gap == 0 else jnp.zeros(1)
        state, y = step(state, edge.params, r)
        if t % gap == 0:
            responses.append(float(y[0]))
    assert responses[1] > responses[0]
    # closed form: u+_1 = U + U(1-U); at the second pulse u has decayed toward
    # U, then jumps again: u_2 = U + (u+_1 - U) d^gap, u+_2 = u_2 + U(1-u_2)
    d = np.exp(-dt / tau_f)
    u_plus_1 = U + U * (1 - U)
    u_2 = U + (u_plus_1 - U) * d ** gap
    u_plus_2 = u_2 + U * (1 - u_2)
    np.testing.assert_allclose(responses[0], u_plus_1 / dt, rtol=1e-10)
    np.testing.assert_allclose(responses[1], u_plus_2 / dt, rtol=1e-10)


def test_frequency_dependent_depression():
    """Depression-only synapse under a sustained spike train: responses decay
    monotonically to a steady state below the first, resources stay in
    [0, 1], and a higher drive rate depresses MORE (the TM signature)."""
    dt, U, tau_d = 0.1, 0.5, 300.0

    def run_train(period):
        edge = LinearSTP(1, 1, dt=dt, weights=np.ones((1, 1)), tau_facil=0.0,
                         tau_depress=tau_d, U=U)
        step = edge.make_step()
        state = edge.init_state()
        resp = []
        for t in range(600):
            r = jnp.asarray([1.0 / dt]) if t % period == 0 else jnp.zeros(1)
            state, y = step(state, edge.params, r)
            if t % period == 0:
                resp.append(float(y[0]))
            assert 0.0 <= float(state[1][0]) <= 1.0
        return resp

    fast, slow = run_train(10), run_train(60)
    assert all(b <= a + 1e-12 for a, b in zip(fast, fast[1:]))
    assert fast[-1] < fast[0]
    # steady-state response is lower at the higher rate
    assert fast[-1] < slow[-1]


def test_network_run_matches_eager_forward():
    rng = np.random.default_rng(11)
    n = 4
    inp = np.abs(rng.normal(size=(30, n)))
    w_rec = rng.standard_normal((n, n)) * 0.1

    def build():
        net = Network(dt=1e-2)
        net.add_func_node("inp", n, activation_function="identity")
        net.add_diffeq_node("pop", TANH, weights=w_rec,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            clear=True, verbose=False, file_name="stp_pop")
        net.add_edge("inp", "pop", weights=np.eye(n), tau_facil=40.0,
                     tau_depress=120.0, U=0.3)
        return net

    net1 = build()
    obs = net1.run(inp, sampling_steps=1, verbose=False)
    scan_out = obs.to_numpy("out")

    net2 = build()
    eager = np.stack([np.asarray(net2.forward(inp[t])) for t in range(inp.shape[0])])
    np.testing.assert_allclose(scan_out, eager, rtol=1e-8, atol=1e-10)
    # the synaptic state advanced identically on both paths
    e1 = net1.get_edge("inp", "pop")
    e2 = net2.get_edge("inp", "pop")
    np.testing.assert_allclose(np.asarray(e1.u), np.asarray(e2.u), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(e1.x), np.asarray(e2.x), rtol=1e-8)


def test_chunked_runs_continue_state():
    rng = np.random.default_rng(5)
    n = 3
    inp = np.abs(rng.normal(size=(40, n)))
    w_stp = rng.standard_normal((n, n))

    def build():
        net = Network(dt=1e-2)
        net.add_func_node("inp", n, activation_function="identity")
        net.add_diffeq_node("pop", TANH, weights=np.zeros((n, n)),
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            clear=True, verbose=False, file_name="stp_chunk")
        net.add_edge("inp", "pop", tau_depress=80.0, U=0.4, weights=w_stp)
        return net

    net_a = build()
    out_a = net_a.run(inp, sampling_steps=1, verbose=False).to_numpy("out")
    net_b = build()
    out_b1 = net_b.run(inp[:25], sampling_steps=1, verbose=False).to_numpy("out")
    out_b2 = net_b.run(inp[25:], sampling_steps=1, verbose=False).to_numpy("out")
    np.testing.assert_allclose(np.concatenate([out_b1, out_b2]), out_a,
                               rtol=1e-8, atol=1e-12)


def test_checkpoint_roundtrip_preserves_stp_state(tmp_path):
    from rectipy_tpu.checkpoint import restore_network, save_network

    rng = np.random.default_rng(9)
    n = 3
    inp = np.abs(rng.normal(size=(20, n)))
    net = Network(dt=1e-2)
    net.add_func_node("inp", n, activation_function="identity")
    net.add_diffeq_node("pop", TANH, weights=np.zeros((n, n)),
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        clear=True, verbose=False, file_name="stp_ckpt")
    net.add_edge("inp", "pop", tau_facil=60.0, tau_depress=90.0, U=0.2,
                 weights=np.eye(n))
    net.run(inp, sampling_steps=1, verbose=False)
    u_saved = np.asarray(net.get_edge("inp", "pop").u)
    save_network(net, str(tmp_path / "ckpt"))
    out_ref = net.run(inp, sampling_steps=1, verbose=False).to_numpy("out")
    restore_network(net, str(tmp_path / "ckpt"))
    np.testing.assert_allclose(np.asarray(net.get_edge("inp", "pop").u), u_saved)
    out_again = net.run(inp, sampling_steps=1, verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_again, out_ref, rtol=1e-10)


def test_add_edge_dispatch_and_errors():
    n = 3
    net = Network(dt=1e-3)
    net.add_func_node("a", n, activation_function="identity")
    net.add_func_node("b", n, activation_function="identity")
    edge = net.add_edge("a", "b", tau_depress=100.0, weights=np.eye(n))
    assert isinstance(edge, LinearSTP)
    assert edge.dt == pytest.approx(1e-3)

    with pytest.raises(ValueError, match="cannot be combined"):
        net.add_edge("b", "a", tau_facil=10.0, delays=np.zeros(n, dtype=int))
    with pytest.raises(ValueError, match="utilization"):
        LinearSTP(n, n, dt=1e-3, tau_facil=10.0, U=0.0)
    with pytest.raises(ValueError, match="time constants"):
        LinearSTP(n, n, dt=1e-3, tau_facil=-1.0)


def test_stp_run_under_mesh_matches_single_device():
    """The (u, x) edge carry population-shards like any other edge state."""
    from rectipy_tpu.parallel import make_mesh

    rng = np.random.default_rng(17)
    n = 16
    inp = np.abs(rng.normal(size=(25, n)))
    w_rec = rng.standard_normal((n, n)) * 0.1
    w_stp = np.eye(n)

    def build():
        net = Network(dt=1e-2)
        net.add_func_node("inp", n, activation_function="identity")
        net.add_diffeq_node("pop", TANH, weights=w_rec,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            clear=True, verbose=False, file_name="stp_mesh")
        net.add_edge("inp", "pop", weights=w_stp, tau_facil=40.0,
                     tau_depress=120.0, U=0.3)
        return net

    ref = build().run(inp, sampling_steps=1, verbose=False).to_numpy("out")
    mesh = make_mesh(8, data=1)
    sharded = build().run(inp, sampling_steps=1, verbose=False,
                          mesh=mesh).to_numpy("out")
    np.testing.assert_allclose(sharded, ref, rtol=1e-7, atol=1e-10)


def test_bptt_trains_through_stp_dynamics():
    """Gradient training straight through the (u, x) carry: fit the readout
    of a depressing synapse chain; losses must strictly decrease."""
    rng = np.random.default_rng(21)
    n, n_out, T = 4, 2, 25
    net = Network(dt=1e-2, dtype=jnp.float32)
    net.add_func_node("inp", n, activation_function="identity")
    net.add_diffeq_node("pop", TANH, weights=rng.standard_normal((n, n)) * 0.1,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        clear=True, verbose=False, file_name="stp_train")
    net.add_func_node("out", n_out, activation_function="identity")
    net.add_edge("inp", "pop", tau_facil=40.0, tau_depress=150.0, U=0.3,
                 weights=np.eye(n))
    net.add_edge("pop", "out", train="gd",
                 weights=rng.standard_normal((n_out, n)) * 0.1)
    inputs = [np.abs(rng.normal(size=(T, n))).astype(np.float32)] * 6
    targets = [np.tile(np.asarray([0.3, -0.2], dtype=np.float32), (T, 1))] * 6
    obs = net.fit_bptt(inputs, targets, optimizer="adam", lr=5e-2,
                       verbose=False, record_output=False)
    losses = [float(x) for x in obs["epoch_loss"]]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
