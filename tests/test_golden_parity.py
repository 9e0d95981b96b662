"""Golden parity vs the reference's execution semantics (BASELINE.md
correctness gate: float64 trajectories match to 1e-3; we hold ourselves to
much tighter).

Since the reference package (and its PyRates dependency) is not installed,
the oracles here are torch-float64 re-implementations of the reference's
documented per-step math:

- RateNet: ``y <- y + dt * f(0, y, args)``, output = pre-update slice
  (/root/reference/rectipy/nodes.py:166-170)
- SpikeResetNet: surrogate spike on the reset slice, spikes/dt into the spike
  input, Euler, detached masked reset (/root/reference/rectipy/nodes.py:382-392)
- LIF vector field: lif_op = li_op with s-drive + synapse ODE
  (/root/reference/neuron_model_templates/spiking_neurons/lif.yaml)
- RLS update: rank-1 (W, P) recursion (/root/reference/rectipy/edges.py:227-234)
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rectipy_tpu import Network
from rectipy_tpu.edges import RLS


def torch_lif_trajectory(W, W_in, inputs, *, dt, tau, tau_s, eta, k, v_thr, v_reset, steps):
    """Reference-semantics LIF population (SpikeResetNet over lif_op), torch float64.

    State: [v, s].  Per step: spikes = H(v - v_thr); s_in = W @ s;
    dv = -v/tau + k*s_in + I_ext + eta ; ds = -s/tau_s + spikes/dt ;
    Euler; v hard-reset where spiked.  Output: pre-update s.
    """
    n = W.shape[0]
    v = torch.zeros(n, dtype=torch.float64)
    s = torch.zeros(n, dtype=torch.float64)
    Wt = torch.tensor(W, dtype=torch.float64)
    W_in_t = torch.tensor(W_in, dtype=torch.float64)
    outs = []
    for step in range(steps):
        x = W_in_t @ torch.tensor(inputs[step], dtype=torch.float64)
        spikes = torch.heaviside(v - v_thr, torch.tensor(1.0, dtype=torch.float64))
        outs.append(s.clone())  # pre-update output slice
        s_in = Wt @ s
        dv = -v / tau + k * s_in + x + eta
        ds = -s / tau_s + spikes / dt
        v_new = v + dt * dv
        s = s + dt * ds
        v = v_new * (1.0 - spikes) + spikes * v_reset
    return torch.stack(outs).numpy()


def test_lif_spiking_trajectory_matches_reference_semantics():
    n, m = 20, 2
    rng = np.random.default_rng(0)
    W = rng.normal(size=(n, n)) * 0.05
    W_in = rng.normal(size=(n, m))
    dt, tau, tau_s, eta, k = 1e-2, 10.0, 0.5, 10.0, 2.0
    v_thr, v_reset = 10.0, -10.0
    steps = 800
    inputs = rng.normal(size=(steps, m))

    golden = torch_lif_trajectory(W, W_in, inputs, dt=dt, tau=tau, tau_s=tau_s, eta=eta,
                                  k=k, v_thr=v_thr, v_reset=v_reset, steps=steps)

    net = Network(dt, dtype=jnp.float64)
    net.add_func_node("inp", m, activation_function="identity")
    net.add_diffeq_node("lif", "neuron_model_templates.spiking_neurons.lif.lif",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="lif_op",
                        spike_var="spike", reset_var="v",
                        spike_threshold=v_thr, spike_reset=v_reset,
                        node_vars={"eta": eta, "tau": tau, "tau_s": tau_s, "k": k})
    net.add_edge("inp", "lif", weights=W_in)
    ours = net.run(inputs, sampling_steps=1, verbose=False).to_numpy("out")

    assert np.any(golden > 0), "oracle produced no spikes -- test not exercising resets"
    np.testing.assert_allclose(ours, golden, rtol=1e-10, atol=1e-10)


def torch_tanh_trajectory(W, inputs, *, dt, tau, k, eta, steps):
    """Reference-semantics tanh rate network (RateNet over li_op+tanh_op):
    dv = -v/tau + k*(W @ tanh(v)) + I_ext + eta; output = pre-update v."""
    n = W.shape[0]
    v = torch.zeros(n, dtype=torch.float64)
    Wt = torch.tensor(W, dtype=torch.float64)
    tau_t = torch.tensor(tau, dtype=torch.float64)
    outs = []
    for step in range(steps):
        x = torch.tensor(inputs[step], dtype=torch.float64)
        outs.append(v.clone())
        dv = -v / tau_t + k * (Wt @ torch.tanh(v)) + x + eta
        v = v + dt * dv
    return torch.stack(outs).numpy()


def test_tanh_rate_trajectory_matches_reference_semantics():
    n = 30
    rng = np.random.default_rng(1)
    W = rng.normal(size=(n, n)) / np.sqrt(n)
    tau = rng.uniform(10.0, 20.0, size=(n,))
    dt, k, eta = 1e-2, 2.0, 1.5
    steps = 1000
    inputs = rng.normal(size=(steps, n)) * 2.0

    golden = torch_tanh_trajectory(W, inputs, dt=dt, tau=tau, k=k, eta=eta, steps=steps)

    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("tanh", "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
                        weights=W, source_var="tanh_op/r", target_var="li_op/r_in",
                        input_var="li_op/I_ext", output_var="li_op/v",
                        node_vars={"all/li_op/tau": tau, "all/li_op/k": k,
                                   "all/li_op/eta": eta})
    ours = net.run(inputs, sampling_steps=1, verbose=False).to_numpy("out")
    np.testing.assert_allclose(ours, golden, rtol=1e-9, atol=1e-9)


def test_rls_update_matches_reference_formula():
    n, m = 12, 3
    rng = np.random.default_rng(2)
    W = torch.zeros((m, n), dtype=torch.float64)
    P = torch.eye(n, dtype=torch.float64) * 0.8
    beta_inv = 1.0 / 0.95

    rls = RLS(n, m, beta=0.95, alpha=0.8, dtype=jnp.float64)
    for _ in range(20):
        x = rng.normal(size=n)
        y = rng.normal(size=m)
        xt = torch.tensor(x)
        yt = torch.tensor(y)
        y_hat_t = W @ xt
        # reference rank-1 recursion (edges.py:227-234)
        z = beta_inv * (P @ xt)
        k_gain = 1.0 / (1.0 + xt @ z)
        W = W + torch.outer(yt - k_gain * (xt @ (W + torch.outer(yt, z)).T), z)
        P = P - k_gain * torch.outer(z, z)

        y_hat = rls.forward(jnp.asarray(x))
        rls.update(jnp.asarray(x), jnp.asarray(y), y_hat)

    np.testing.assert_allclose(np.asarray(rls.weights), W.numpy(), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(rls.P), P.numpy(), rtol=1e-10, atol=1e-10)


def test_qif_intrinsic_reset_matches_reference_semantics():
    """SpikeNet over qif_reset_op: spikes/dt into both spike and reset inputs,
    -2*reset*v term mirrors v (reference nodes.py:323-330)."""
    n = 10
    rng = np.random.default_rng(3)
    dt, tau, tau_s, eta, k = 1e-3, 1.0, 1.0, 8.0, 0.0
    thresh = 10.0
    steps = 3000

    v = torch.full((n,), -2.0, dtype=torch.float64)
    s = torch.zeros(n, dtype=torch.float64)
    golden = []
    for _ in range(steps):
        spikes = torch.heaviside(v - thresh, torch.tensor(1.0, dtype=torch.float64)) / dt
        dv = (v * v + eta) / tau - 2.0 * spikes * v
        ds = -s / tau_s + spikes
        v = v + dt * dv
        s = s + dt * ds
        golden.append(s.clone())  # post-update output (SpikeNet semantics)
    golden = torch.stack(golden).numpy()

    from rectipy_tpu.nodes import SpikeNet

    node = SpikeNet.from_pyrates(
        "neuron_model_templates.spiking_neurons.qif.qif_reset",
        weights=np.zeros((n, n)), source_var="s", target_var="s_in",
        input_var="I_ext", output_var="s", spike_var="spike", reset_var="reset",
        spike_threshold=thresh, spike_reset=-thresh, dt=dt, dtype=jnp.float64,
        node_vars={"all/qif_reset_op/eta": eta, "all/qif_reset_op/k": k})
    ours = []
    zero = jnp.zeros(n, dtype=jnp.float64)
    for _ in range(steps):
        ours.append(np.asarray(node.forward(zero)))
    np.testing.assert_allclose(np.stack(ours), golden, rtol=1e-8, atol=1e-8)


def test_bptt_gradients_match_torch_autograd():
    """d(loss)/d(W_in, W_out) through a surrogate-spiking LIF epoch: torch
    autograd (the reference's differentiation engine, with the reference's
    Spike surrogate, nodes.py:468-481) vs jax.grad through our fused scan."""
    n, m, k_out, T = 8, 2, 3, 120
    dt, tau, tau_s, eta, kc = 1e-2, 10.0, 0.5, 10.0, 2.0
    v_thr, v_reset = 10.0, -10.0
    slope = 100.0 / abs(v_thr - v_reset)
    rng = np.random.default_rng(4)
    W_in = rng.normal(size=(n, m))
    W_out = rng.normal(size=(k_out, n))
    inputs = rng.normal(size=(T, m))
    targets = rng.normal(size=(T, k_out))

    # ---- torch side -------------------------------------------------------
    class Spike(torch.autograd.Function):
        @staticmethod
        def forward(ctx, z):
            ctx.save_for_backward(z)
            return torch.heaviside(z, torch.tensor(1.0, dtype=torch.float64))

        @staticmethod
        def backward(ctx, g):
            (z,) = ctx.saved_tensors
            return g / (1.0 + slope * torch.abs(z)) ** 2

    W_in_t = torch.tensor(W_in, requires_grad=True)
    W_out_t = torch.tensor(W_out, requires_grad=True)
    v = torch.zeros(n, dtype=torch.float64)
    s = torch.zeros(n, dtype=torch.float64)
    inp_t = torch.tensor(inputs)
    preds = []
    for step in range(T):
        spikes = Spike.apply(v - v_thr)
        reset = spikes.detach()
        preds.append(W_out_t @ s)  # readout of the pre-update output
        dv = -v / tau + eta + W_in_t @ inp_t[step]
        ds = -s / tau_s + spikes / dt
        v_new = v + dt * dv
        s = s + dt * ds
        v = v_new * (1.0 - reset) + reset * v_reset
    loss_t = torch.mean((torch.stack(preds) - torch.tensor(targets)) ** 2)
    loss_t.backward()
    g_in_torch = W_in_t.grad.numpy()
    g_out_torch = W_out_t.grad.numpy()

    # ---- jax side ----------------------------------------------------------
    net = Network(dt, dtype=jnp.float64)
    net.add_func_node("inp", m, activation_function="identity")
    net.add_diffeq_node("lif", "neuron_model_templates.spiking_neurons.lif.lif",
                        weights=np.zeros((n, n)), source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="lif_op",
                        spike_var="spike", reset_var="v",
                        spike_threshold=v_thr, spike_reset=v_reset,
                        node_vars={"eta": eta, "tau": tau, "tau_s": tau_s, "k": kc})
    net.add_func_node("out", k_out, activation_function="identity")
    net.add_edge("inp", "lif", weights=W_in, train="gd")
    net.add_edge("lif", "out", weights=W_out, train="gd")
    net.compile()

    step = net.make_step()
    params = net.parameters_pytree()
    train, frozen = net._partition(params, net.trainable_paths())
    state0 = net.init_state()
    inp_j = jnp.asarray(inputs)
    tgt_j = jnp.asarray(targets)

    def loss_fn(train):
        p = net._combine(train, frozen)

        def body(state, x_t):
            state, out, _ = step(state, p, x_t)
            return state, out

        _, outs = jax.lax.scan(body, state0, inp_j)
        return jnp.mean((outs - tgt_j) ** 2)

    grads = jax.grad(loss_fn)(train)
    g_in_jax = np.asarray(grads["edges"]["inp->lif"]["weights"])
    g_out_jax = np.asarray(grads["edges"]["lif->out"]["weights"])

    assert float(loss_fn(train)) == pytest.approx(float(loss_t.detach()), rel=1e-10)
    np.testing.assert_allclose(g_out_jax, g_out_torch, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(g_in_jax, g_in_torch, rtol=1e-9, atol=1e-12)
    # the surrogate actually contributed (spiking occurred)
    assert np.abs(g_in_torch).max() > 0


def test_ik_meanfield_trajectory_matches_reference_semantics():
    """iku_op: recovery current driven by population means (mean(v),
    mean(spike)) -- SpikeResetNet semantics over the Izhikevich equations."""
    n = 12
    rng = np.random.default_rng(5)
    W = np.abs(rng.normal(size=(n, n))) * 0.02
    dt = 1e-2
    steps = 4000
    thresh, v_reset = 40.0, -60.0
    etas = 150.0 + 20.0 * rng.random(n)

    # torch float64 oracle of the documented per-step math
    v = torch.full((n,), -60.0, dtype=torch.float64)
    u = torch.zeros(n, dtype=torch.float64)
    s = torch.zeros(n, dtype=torch.float64)
    Wt = torch.tensor(W)
    eta_t = torch.tensor(etas)
    C, k, v_r, v_theta, g, E_r = 100.0, 0.7, -60.0, -40.0, 1.0, 0.0
    b, tau_u, kappa, tau_s = -2.0, 33.33, 10.0, 6.0
    golden = []
    for _ in range(steps):
        spikes = torch.heaviside(v - thresh, torch.tensor(1.0, dtype=torch.float64))
        golden.append(s.clone())  # pre-update output
        s_in = Wt @ s
        dv = (k * (v - v_r) * (v - v_theta) - u + eta_t + g * s_in * (E_r - v)) / C
        du = (b * (torch.mean(v) - v_r) - u) / tau_u + kappa * torch.mean(spikes / dt)
        ds = -s / tau_s + spikes / dt
        v_new = v + dt * dv
        u = u + dt * du
        s = s + dt * ds
        v = v_new * (1.0 - spikes) + spikes * v_reset
    golden = torch.stack(golden).numpy()
    assert golden.max() > 0, "oracle produced no spikes"

    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("ik", "neuron_model_templates.spiking_neurons.ik.iku",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="iku_op",
                        spike_var="spike", reset_var="v",
                        spike_threshold=thresh, spike_reset=v_reset,
                        node_vars={"eta": etas})
    ours = net.run(np.zeros((steps, n)), sampling_steps=1,
                   verbose=False).to_numpy("out")
    np.testing.assert_allclose(ours, golden, rtol=1e-8, atol=1e-8)


def test_ik_multi_spike_reset_matches_reference_semantics():
    """MultiSpikeResetNet over ik_op: spikes from the PRE-update v, hard
    where-reset of each segment AFTER the Euler update, POST-update output
    (reference nodes.py:404-465 semantics, torch-float64 oracle)."""
    n = 12
    rng = np.random.default_rng(11)
    W = np.abs(rng.normal(size=(n, n))) * 0.05
    dt, thresh, v_reset, eta = 1e-2, 40.0, -60.0, 200.0
    C, k, v_r, v_theta = 100.0, 0.7, -60.0, -40.0
    g, E_r, tau_s, b, tau_u, kappa = 1.0, 0.0, 6.0, -2.0, 33.33, 10.0
    steps = 4000

    Wt = torch.as_tensor(W, dtype=torch.float64)
    v = torch.full((n,), -60.0, dtype=torch.float64)
    u = torch.zeros(n, dtype=torch.float64)
    s = torch.zeros(n, dtype=torch.float64)
    golden = []
    for _ in range(steps):
        spikes = torch.heaviside(v - thresh, torch.tensor(1.0, dtype=torch.float64)) / dt
        s_in = Wt @ s
        dv = (k * (v - v_r) * (v - v_theta) - u + eta + g * s_in * (E_r - v)) / C
        du = (b * (v - v_r) - u) / tau_u + kappa * spikes
        ds = -s / tau_s + spikes
        v = v + dt * dv
        u = u + dt * du
        s = s + dt * ds
        reset_mask = spikes * dt > 0.0
        v = torch.where(reset_mask, torch.tensor(v_reset, dtype=torch.float64), v)
        golden.append(s.clone())  # post-update output (MultiSpikeResetNet)
    golden = torch.stack(golden).numpy()
    assert golden.max() > 0, "no spikes -- weak oracle"

    from rectipy_tpu import Network

    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("ik", "neuron_model_templates.spiking_neurons.ik.ik",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="ik_op",
                        spike_var=["spike"], reset_var=["v"], dtype=jnp.float64,
                        spike_threshold=thresh, spike_reset=v_reset,
                        node_vars={"eta": eta})
    net.compile()
    from rectipy_tpu.nodes import MultiSpikeResetNet
    assert isinstance(net.get_node("ik"), MultiSpikeResetNet)
    ours = net.run(np.zeros((steps, n)), sampling_steps=1,
                   verbose=False).to_numpy("out")
    np.testing.assert_allclose(ours, golden, rtol=1e-8, atol=1e-8)


def test_ik_biexp_trajectory_matches_reference_semantics():
    """ik_biexp_op: biexponential synapses (rise x -> decay s) with
    mean-field recovery -- SpikeResetNet semantics, torch-float64 oracle
    (reference template: neuron_model_templates/spiking_neurons/ik.yaml:41-66)."""
    n = 12
    rng = np.random.default_rng(7)
    W = np.abs(rng.normal(size=(n, n))) * 0.02
    dt = 1e-2
    steps = 4000
    thresh, v_reset = 40.0, -60.0
    etas = 150.0 + 20.0 * rng.random(n)

    # torch float64 oracle of the documented per-step math
    v = torch.full((n,), -60.0, dtype=torch.float64)
    u = torch.zeros(n, dtype=torch.float64)
    s = torch.zeros(n, dtype=torch.float64)
    x = torch.zeros(n, dtype=torch.float64)
    Wt = torch.tensor(W)
    eta_t = torch.tensor(etas)
    C, k, v_r, v_theta, g, E_r = 100.0, 0.7, -60.0, -40.0, 1.0, 0.0
    b, tau_u, kappa = -2.0, 33.33, 10.0
    tau_r, tau_d = 2.0, 6.0
    golden = []
    for _ in range(steps):
        spikes = torch.heaviside(v - thresh, torch.tensor(1.0, dtype=torch.float64))
        golden.append(s.clone())  # pre-update output (SpikeResetNet)
        s_in = Wt @ s
        dv = (k * (v - v_r) * (v - v_theta) - u + eta_t + g * s_in * (E_r - v)) / C
        du = (b * (torch.mean(v) - v_r) - u) / tau_u + kappa * torch.mean(spikes / dt)
        ds = -s / tau_d + x
        dx = -x / tau_r + spikes / dt
        v_new = v + dt * dv
        u = u + dt * du
        s = s + dt * ds
        x = x + dt * dx
        v = v_new * (1.0 - spikes) + spikes * v_reset
    golden = torch.stack(golden).numpy()
    assert golden.max() > 0, "oracle produced no spikes"

    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("ik", "neuron_model_templates.spiking_neurons.ik.ik_biexp",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="ik_biexp_op",
                        spike_var="spike", reset_var="v",
                        spike_threshold=thresh, spike_reset=v_reset,
                        node_vars={"eta": etas})
    ours = net.run(np.zeros((steps, n)), sampling_steps=1,
                   verbose=False).to_numpy("out")
    np.testing.assert_allclose(ours, golden, rtol=1e-8, atol=1e-8)
    # the rise state actually participated (x deviates from a single-exp synapse)
    assert np.abs(np.asarray(net.get_node("ik")["x"])).max() > 0
