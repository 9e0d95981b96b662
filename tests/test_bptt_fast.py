"""Deferred-gradient BPTT (ops/bptt.py): forward trajectories must be
BIT-identical to the composed fused step, and gradients must match plain
autodiff-through-scan to float64 precision, for every supported node class.
This pins the custom VJP (the single post-scan dW matmul) to the standard
path the reference's torch autograd semantics were golden-tested against."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network
from rectipy_tpu.ops.bptt import make_coupled_traj

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
QIF = "neuron_model_templates.spiking_neurons.qif.qif"
QIF_RESET = "rectipy_tpu.models.spiking_neurons.qif.qif_reset"
IK = "neuron_model_templates.spiking_neurons.ik.ik"
IKU = "neuron_model_templates.spiking_neurons.ik.iku"


def _build(kind, n, rng):
    net = Network(1e-2, dtype=jnp.float64)
    if kind == "rate":
        net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.3,
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in",
                            train_params=["weights"])
    elif kind == "spike_reset":
        net.add_diffeq_node("rnn", QIF, weights=np.abs(rng.normal(size=(n, n))) * 0.5,
                            input_var="I_ext", output_var="s", source_var="s",
                            target_var="s_in", op="qif_op", spike_var="spike",
                            spike_def="v", spike_threshold=100.0, spike_reset=-100.0,
                            node_vars={"all/qif_op/eta": 2.0 + rng.random(n)},
                            train_params=["weights"])
    elif kind == "spike_intrinsic":
        net.add_diffeq_node("rnn", QIF_RESET, weights=np.abs(rng.normal(size=(n, n))) * 0.2,
                            input_var="I_ext", output_var="s", source_var="s",
                            target_var="s_in", op="qif_reset_op", spike_var="spike",
                            reset_var="reset", reset=False, spike_threshold=100.0,
                            spike_reset=-100.0,
                            node_vars={"all/qif_reset_op/eta": 2.0 + rng.random(n)},
                            train_params=["weights"])
    elif kind == "multi":
        net.add_diffeq_node("rnn", IK, weights=np.abs(rng.normal(size=(n, n))) * 0.05,
                            input_var="I_ext", output_var="s", source_var="s",
                            target_var="s_in", op="ik_op", spike_var=["spike"],
                            reset_var=["v"], spike_threshold=40.0, spike_reset=-60.0,
                            node_vars={"all/ik_op/eta": 3000.0 + 100.0 * rng.random(n)},
                            train_params=["weights"])
    net.compile()
    return net


@pytest.mark.parametrize("kind", ["rate", "spike_reset", "spike_intrinsic", "multi"])
def test_traj_forward_and_grad_parity(kind):
    n = 10
    T = {"rate": 300, "spike_reset": 300, "spike_intrinsic": 150, "multi": 700}[kind]
    rng = np.random.default_rng(3)
    net = _build(kind, n, rng)
    node = net.get_node("rnn")
    traj, wkeys = make_coupled_traj(node)

    step = net.make_step()
    params = net.parameters_pytree()
    state0 = net.init_state()
    nargs = params["nodes"]["rnn"]
    y0 = state0["nodes"]["rnn"]
    xs = jnp.asarray(rng.normal(size=(T, n)))
    tgt = jnp.asarray(rng.normal(size=(T, n)))
    Wd = {k: nargs[k] for k in wkeys}
    rest = {k: v for k, v in nargs.items() if k not in wkeys}

    def run_std(Wm, y0_, xs_):
        p = {"nodes": {"rnn": dict(nargs)}, "edges": {}}
        p["nodes"]["rnn"].update(Wm)
        st0 = {"nodes": {"rnn": y0_}, "edges": {}}

        def body(st, x):
            st, out, _ = step(st, p, x)
            return st, out

        stT, outs = jax.lax.scan(body, st0, xs_)
        return stT["nodes"]["rnn"], outs

    yT_std, outs_std = run_std(Wd, y0, xs)
    yT_f, outs_f = traj(Wd, rest, y0, xs)
    np.testing.assert_array_equal(np.asarray(outs_f), np.asarray(outs_std))
    np.testing.assert_array_equal(np.asarray(yT_f), np.asarray(yT_std))
    if kind != "rate":
        assert np.asarray(outs_std).max() > 0, "no spikes -> test is vacuous"

    def loss_std(Wm, y0_, xs_):
        _, outs = run_std(Wm, y0_, xs_)
        return jnp.mean((outs - tgt) ** 2)

    def loss_fast(Wm, y0_, xs_):
        _, outs = traj(Wm, rest, y0_, xs_)
        return jnp.mean((outs - tgt) ** 2)

    g_std = jax.grad(loss_std, argnums=(0, 1, 2))(Wd, y0, xs)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(Wd, y0, xs)
    for wk in wkeys:
        a, b = np.asarray(g_std[0][wk]), np.asarray(g_fast[0][wk])
        assert np.abs(a).max() > 0, "zero weight gradient -> test is vacuous"
        assert np.isfinite(a).all() and np.isfinite(b).all()
        # measured deviation is pure f64 reduction reordering: ~4e-8 of the
        # gradient scale over 300 steps (the two paths associate the T-sum
        # differently: per-step accumulation vs one (N,T)x(T,N) matmul)
        np.testing.assert_allclose(b, a, atol=1e-6 * np.abs(a).max())
    for i in (1, 2):  # dy0, dxs: identical recursion -> ~1e-15 relative
        a, b = np.asarray(g_std[i]), np.asarray(g_fast[i])
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12 * max(np.abs(a).max(), 1.0))


def test_fit_bptt_fused_matches_plain_path():
    """fit_bptt epoch mode: fused_bptt=True and =False produce the same
    losses and final weights (float64, float32-stored coupling)."""
    n, T = 8, 120
    rng = np.random.default_rng(4)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T // 3, n))  # targets on the downsampled grid

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        obs = net.fit_bptt([inp] * 15, [tgt] * 15, optimizer="adam", lr=1e-2,
                           sampling_steps=3, verbose=False, fused_bptt=fused)
        return obs["epoch_loss"], np.asarray(net.get_node("rnn")["weights"])

    l_fast, w_fast = fit(True)
    l_std, w_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-9)
    # dW reduction reordering (~4e-8/epoch) compounds through 15 adam steps
    np.testing.assert_allclose(w_fast, w_std, rtol=1e-6, atol=1e-10)
    assert l_fast[-1] < l_fast[0], "training did not reduce the loss"


def test_fused_bptt_unsupported_raises_and_auto_falls_back():
    """Raw-constructor nodes (no DSL lowering, _vf is None) cannot use the
    deferred path: fused_bptt=True raises, 'auto' silently falls back and
    trains.  (Mean-field reduction templates USED to be the unsupported case
    here; they now route through the trajectory -- see the iku test below.)"""
    from rectipy_tpu.nodes import RateNet

    n, T = 6, 50
    rng = np.random.default_rng(5)
    W0 = rng.normal(size=(n, n)) * 0.3

    def build():
        def rate(t, y, args):
            return -y + jnp.tanh(args["weights"] @ y) + args["in"]

        node = RateNet(rate, {"weights": jnp.asarray(W0), "in": jnp.zeros(n)},
                       {"out": [0, n]}, {"in": "in", "weights": "weights"},
                       dt=1e-2, dtype=jnp.float64, train_params=["weights"],
                       y0=jnp.zeros(n, dtype=jnp.float64))
        net = Network(1e-2, dtype=jnp.float64)
        net.add_node("rnn", node, "diffeq")
        net.compile()
        return net

    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n))
    with pytest.raises(ValueError):
        build().fit_bptt([inp], [tgt], verbose=False, fused_bptt=True)
    obs = build().fit_bptt([inp] * 2, [tgt] * 2, verbose=False, fused_bptt="auto")
    assert len(obs["epoch_loss"]) == 2


def test_iku_meanfield_traj_forward_and_grad_parity():
    """Mean-field templates (population reductions, here iku's mean(v) /
    mean(spike) recovery) route through the deferred trajectory: the
    trajectory evaluates the coupling-free step on the FULL population so
    the reductions are global.  Forward bit-identical to the composed step,
    gradients match plain autodiff at f64, and fit_bptt auto-selects it."""
    n, T = 8, 700
    rng = np.random.default_rng(6)

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", IKU, weights=np.abs(rng.normal(size=(n, n))) * 0.02,
                            input_var="I_ext", output_var="s", source_var="s",
                            target_var="s_in", op="iku_op", spike_var="spike",
                            reset_var="v", spike_threshold=40.0, spike_reset=-60.0,
                            node_vars={"all/iku_op/eta": 3000.0 + 100.0 * rng.random(n)},
                            train_params=["weights"])
        net.compile()
        return net

    net = build()
    node = net.get_node("rnn")
    assert node._vf.tile_local is False  # reductions: global-only tile_func
    traj, wkeys = make_coupled_traj(node)

    step = net.make_step()
    params = net.parameters_pytree()
    state0 = net.init_state()
    nargs = params["nodes"]["rnn"]
    y0 = state0["nodes"]["rnn"]
    xs = jnp.asarray(rng.normal(size=(T, n)))
    tgt = jnp.asarray(rng.normal(size=(T, n)))
    Wd = {k: nargs[k] for k in wkeys}
    rest = {k: v for k, v in nargs.items() if k not in wkeys}

    def run_std(Wm, xs_):
        p = {"nodes": {"rnn": {**nargs, **Wm}}, "edges": {}}
        st0 = {"nodes": {"rnn": y0}, "edges": {}}

        def body(st, x):
            st, out, _ = step(st, p, x)
            return st, out

        _, outs = jax.lax.scan(body, st0, xs_)
        return outs

    outs_std = run_std(Wd, xs)
    _, outs_f = traj(Wd, rest, y0, xs)
    np.testing.assert_array_equal(np.asarray(outs_f), np.asarray(outs_std))
    assert np.asarray(outs_std).max() > 0, "no spikes -> test is vacuous"

    def loss_std(Wm, xs_):
        return jnp.mean((run_std(Wm, xs_) - tgt) ** 2)

    def loss_fast(Wm, xs_):
        _, outs = traj(Wm, rest, y0, xs_)
        return jnp.mean((outs - tgt) ** 2)

    g_std = jax.grad(loss_std, argnums=(0, 1))(Wd, xs)
    g_fast = jax.grad(loss_fast, argnums=(0, 1))(Wd, xs)
    for wk in wkeys:
        a, b = np.asarray(g_std[0][wk]), np.asarray(g_fast[0][wk])
        assert np.abs(a).max() > 0, "zero weight gradient -> test is vacuous"
        np.testing.assert_allclose(b, a, atol=1e-6 * np.abs(a).max())
    np.testing.assert_allclose(np.asarray(g_fast[1]), np.asarray(g_std[1]),
                               rtol=1e-9, atol=1e-12)

    # fit_bptt auto-selects the trajectory for the reduction template now
    inp_np = np.asarray(xs)
    tgt_np = np.asarray(tgt)
    obs = build().fit_bptt([inp_np] * 2, [tgt_np] * 2, verbose=False,
                           fused_bptt=True)  # must NOT raise
    assert len(obs["epoch_loss"]) == 2


def test_fit_bptt_fused_chain_topology_matches_plain():
    """Chain networks (input layer -> population -> readout, the main
    training workload shape) also use the deferred-gradient path: the
    stateless pre/post stages move outside the scan as single matmuls.
    Losses and ALL trained weights (node + readout edge) must match the
    plain autodiff path."""
    n, n_in, n_out, T = 8, 2, 3, 150
    rng = np.random.default_rng(6)
    W0 = np.abs(rng.normal(size=(n, n))) * 0.4
    W_in = rng.normal(size=(n, n_in))
    W_out0 = rng.normal(size=(n_out, n))
    inp = rng.normal(size=(T, n_in)) * 3.0
    tgt = rng.normal(size=(T, n_out))
    etas = 2.0 + rng.random(n)

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("qif", QIF, weights=W0, input_var="I_ext",
                            output_var="s", source_var="s", target_var="s_in",
                            op="qif_op", spike_var="spike", spike_def="v",
                            spike_threshold=100.0, spike_reset=-100.0,
                            node_vars={"all/qif_op/eta": etas},
                            train_params=["weights"])
        net.add_func_node("inp", n_in, activation_function="identity")
        net.add_edge("inp", "qif", weights=W_in)
        net.add_func_node("out", n_out, activation_function="tanh")
        net.add_edge("qif", "out", weights=W_out0, train="gd")
        obs = net.fit_bptt([inp] * 10, [tgt] * 10, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_node("qif")["weights"]),
                np.asarray(net.get_edge("qif", "out").weights))

    l_fast, wn_fast, we_fast = fit(True)
    l_std, wn_std, we_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-8)
    np.testing.assert_allclose(wn_fast, wn_std, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(we_fast, we_std, rtol=1e-6, atol=1e-10)
    assert np.abs(we_fast - W_out0).max() > 1e-4, "readout edge did not train"


def test_fused_bptt_chain_with_stateful_edge_uses_graph_path():
    """Delay edges break the chain decomposition (stateful pre-stage can't
    hoist out of the scan) but the GRAPH trajectory handles them: fused=True
    succeeds and matches plain autodiff -- including LinearMemoryFilter at
    ANY max_delay (the filter is one ring-buffer stage)."""
    n = 6
    rng = np.random.default_rng(9)
    W0 = rng.normal(size=(n, n)) * 0.2
    inp = rng.normal(size=(40, n))
    tgt = rng.normal(size=(40, n))

    def build(filtered):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        net.add_func_node("inp", n, activation_function="identity")
        kw = dict(delays=np.arange(n) % 3)
        if filtered:
            kw = dict(delays=np.arange(n) % 3 + 18,  # D=21 slots, one stage
                      filter_weights=np.eye(n) * 0.9)
        net.add_edge("inp", "rnn", weights=np.eye(n), **kw)
        return net

    def fit(fused):
        net = build(False)
        obs = net.fit_bptt([inp] * 3, [tgt] * 3, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return np.asarray(obs["epoch_loss"]), np.asarray(net.get_node("rnn")["weights"])

    l_fast, w_fast = fit(True)
    l_std, w_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-8)
    np.testing.assert_allclose(w_fast, w_std, rtol=1e-6, atol=1e-10)
    # filtered long-delay edge: formerly outside the deferred scope (16-slot
    # cap), now trains on the graph trajectory without raising
    obs = build(True).fit_bptt([inp], [tgt], verbose=False, fused_bptt=True)
    assert len(obs["epoch_loss"]) == 1


def test_fit_bptt_fused_block_sparse_matches_plain():
    """Block-sparse couplings train through the deferred path too: the dW
    contraction is per-block, the backward matvec a block scatter.  Losses
    and trained blocks match plain autodiff."""
    from rectipy_tpu.ops.sparse import block_random_connectivity

    n, bs, T = 64, 16, 300
    rng = np.random.default_rng(10)
    A = block_random_connectivity(n, n, 8, block_size=bs, seed=3)
    etas = 2.0 + rng.random(n)
    inp = rng.normal(size=(T, n)) * 2.0
    tgt = rng.normal(size=(T, n)) * 0.1

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("qif", QIF, weights=A, input_var="I_ext",
                            output_var="s", source_var="s", target_var="s_in",
                            op="qif_op", spike_var="spike", spike_def="v",
                            spike_threshold=100.0, spike_reset=-100.0,
                            node_vars={"all/qif_op/eta": etas},
                            train_params=["weights"])
        obs = net.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_node("qif")["weights"]))

    l_fast, w_fast = fit(True)
    l_std, w_std = fit(False)
    assert w_fast.ndim == 4, "blocks lost their shape through training"
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-8)
    # tolerance on the WEIGHT SCALE: adam's 1/sqrt(v) normalization amplifies
    # f64 reduction-reordering noise where gradients are tiny, so near-zero
    # entries fail any relative bound
    np.testing.assert_allclose(w_fast, w_std, rtol=0.0,
                               atol=1e-5 * np.abs(w_std).max())
    assert np.abs(w_fast - np.asarray(A.blocks)).max() > 1e-5, "blocks did not train"


def test_epoch_scan_matches_per_epoch_loop():
    """verbose=False groups consecutive identical-epoch arrays into ONE
    on-device lax.scan over epochs (zero per-epoch dispatch); the update
    sequence must equal the verbose per-epoch Python loop exactly --
    including mixed schedules where distinct arrays interleave (runs of
    length 1 fall back to the single-update path)."""
    n, T = 8, 80
    rng = np.random.default_rng(11)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp_a = rng.normal(size=(T, n))
    inp_b = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n))
    # a 10-run (crosses the 8-epoch scan-chunk boundary: one chunk + 2
    # singles), a singleton, a 2-run
    schedule = [inp_a] * 10 + [inp_b] + [inp_a] * 2

    def fit(verbose):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        obs = net.fit_bptt(schedule, [tgt] * len(schedule), optimizer="adam",
                           lr=1e-2, verbose=verbose)
        return np.asarray(obs["epoch_loss"]), np.asarray(net.get_node("rnn")["weights"])

    l_scan, w_scan = fit(False)
    l_loop, w_loop = fit(True)
    assert len(l_scan) == len(schedule)
    np.testing.assert_allclose(l_scan, l_loop, rtol=1e-12)
    np.testing.assert_allclose(w_scan, w_loop, rtol=1e-12)


def test_traj_heun_forward_and_grad_parity():
    """Heun (RK2) RateNet trains through the deferred path: forward is
    bit-identical to the composed step, gradients match plain autodiff
    (f64) -- both stage deltas must route into dW correctly."""
    n, T = 10, 200
    rng = np.random.default_rng(12)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.3,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        train_params=["weights"], integrator="heun")
    net.compile()
    node = net.get_node("rnn")
    traj, wkeys = make_coupled_traj(node)

    step = net.make_step()
    params = net.parameters_pytree()
    nargs = params["nodes"]["rnn"]
    y0 = net.init_state()["nodes"]["rnn"]
    xs = jnp.asarray(rng.normal(size=(T, n)))
    tgt = jnp.asarray(rng.normal(size=(T, n)))
    Wd = {k: nargs[k] for k in wkeys}
    rest = {k: v for k, v in nargs.items() if k not in wkeys}

    def run_std(Wm, y0_, xs_):
        p = {"nodes": {"rnn": {**nargs, **Wm}}, "edges": {}}
        st0 = {"nodes": {"rnn": y0_}, "edges": {}}

        def body(st, x):
            st, out, _ = step(st, p, x)
            return st, out

        stT, outs = jax.lax.scan(body, st0, xs_)
        return stT["nodes"]["rnn"], outs

    yT_std, outs_std = run_std(Wd, y0, xs)
    yT_f, outs_f = traj(Wd, rest, y0, xs)
    np.testing.assert_allclose(np.asarray(outs_f), np.asarray(outs_std), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(yT_f), np.asarray(yT_std), rtol=1e-14)

    def loss_std(Wm, y0_, xs_):
        _, outs = run_std(Wm, y0_, xs_)
        return jnp.mean((outs - tgt) ** 2)

    def loss_fast(Wm, y0_, xs_):
        _, outs = traj(Wm, rest, y0_, xs_)
        return jnp.mean((outs - tgt) ** 2)

    g_std = jax.grad(loss_std, argnums=(0, 1, 2))(Wd, y0, xs)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(Wd, y0, xs)
    for wk in wkeys:
        a, b = np.asarray(g_std[0][wk]), np.asarray(g_fast[0][wk])
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(b, a, atol=1e-6 * np.abs(a).max())
    for i in (1, 2):
        a, b = np.asarray(g_std[i]), np.asarray(g_fast[i])
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12 * max(np.abs(a).max(), 1.0))


def test_fit_bptt_fused_heun_matches_plain():
    """fit_bptt auto-selects the deferred path for Heun RateNets; losses and
    trained weights match the plain path."""
    n, T = 8, 100
    rng = np.random.default_rng(13)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n))

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"],
                            integrator="heun")
        obs = net.fit_bptt([inp] * 10, [tgt] * 10, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return np.asarray(obs["epoch_loss"]), np.asarray(net.get_node("rnn")["weights"])

    l_fast, w_fast = fit(True)
    l_std, w_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-8)
    np.testing.assert_allclose(w_fast, w_std, rtol=1e-6, atol=1e-10)
    assert l_fast[-1] < l_fast[0]


def test_int8_master_traj_forward_and_grad_parity():
    """coupling_dtype='int8_master': the deferred trajectory's quantized
    forward is bit-identical to the composed step, trajectories correlate
    >0.99 with the f32 network, and deferred gradients match plain autodiff
    THROUGH THE SAME quantized forward (both STE)."""
    n, T = 12, 300
    rng = np.random.default_rng(14)
    W0 = rng.normal(size=(n, n)) * 0.3
    xs_np = rng.normal(size=(T, n))

    def build(cd):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"],
                            coupling_dtype=cd)
        net.compile()
        return net

    # trajectory correlation vs the f32 coupling network
    out_q = build("int8_master").run(xs_np, verbose=False).to_numpy("out")
    out_f = build(None).run(xs_np, verbose=False).to_numpy("out")
    c = np.corrcoef(out_q.ravel(), out_f.ravel())[0, 1]
    assert c > 0.99, f"int8_master trajectory decorrelated from f32: {c}"

    net = build("int8_master")
    node = net.get_node("rnn")
    traj, wkeys = make_coupled_traj(node)
    step = net.make_step()
    params = net.parameters_pytree()
    nargs = params["nodes"]["rnn"]
    y0 = net.init_state()["nodes"]["rnn"]
    xs = jnp.asarray(xs_np)
    tgt = jnp.asarray(rng.normal(size=(T, n)))
    Wd = {k: nargs[k] for k in wkeys}
    rest = {k: v for k, v in nargs.items() if k not in wkeys}
    assert all(np.asarray(Wd[k]).dtype == np.float64 for k in wkeys), \
        "int8_master must store float master weights"

    def run_std(Wm, y0_, xs_):
        p = {"nodes": {"rnn": {**nargs, **Wm}}, "edges": {}}
        st0 = {"nodes": {"rnn": y0_}, "edges": {}}

        def body(st, x):
            st, out, _ = step(st, p, x)
            return st, out

        stT, outs = jax.lax.scan(body, st0, xs_)
        return stT["nodes"]["rnn"], outs

    _, outs_std = run_std(Wd, y0, xs)
    _, outs_fast = traj(Wd, rest, y0, xs)
    np.testing.assert_array_equal(np.asarray(outs_fast), np.asarray(outs_std))

    def loss_std(Wm):
        _, outs = run_std(Wm, y0, xs)
        return jnp.mean((outs - tgt) ** 2)

    def loss_fast(Wm):
        _, outs = traj(Wm, rest, y0, xs)
        return jnp.mean((outs - tgt) ** 2)

    g_std = jax.grad(loss_std)(Wd)
    g_fast = jax.grad(loss_fast)(Wd)
    for wk in wkeys:
        a, b = np.asarray(g_std[wk]), np.asarray(g_fast[wk])
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max())


def test_fit_bptt_int8_master_trains():
    """End-to-end: fit_bptt with int8_master coupling reduces the loss and
    the fused and plain paths agree on losses (same quantized forward)."""
    n, T = 10, 150
    rng = np.random.default_rng(15)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.2

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"],
                            coupling_dtype="int8_master")
        obs = net.fit_bptt([inp] * 10, [tgt] * 10, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return np.asarray(obs["epoch_loss"]), np.asarray(net.get_node("rnn")["weights"])

    l_fast, w_fast = fit(True)
    l_std, w_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-7)
    np.testing.assert_allclose(w_fast, w_std, rtol=1e-4, atol=1e-8)
    assert l_fast[-1] < l_fast[0], "int8_master training did not reduce the loss"


def test_tbptt_step_mode_uses_deferred_trajectory():
    """Step mode (truncated BPTT): each update chunk routes through the
    deferred trajectory for chain networks when no per-step variables are
    recorded.  Observer records (steps/out/loss) and trained weights must
    be identical to the plain path; requesting record_vars falls back to
    the plain scan and still matches."""
    n, T = 8, 130  # not a multiple of update_steps: leftover steps recorded
    rng = np.random.default_rng(16)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.2

    def fit(fused, record_vars=None):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        kw = {"record_vars": record_vars} if record_vars else {}
        obs = net.fit_bptt(inp, tgt, optimizer="adam", lr=1e-2,
                           update_steps=25, sampling_steps=5, verbose=False,
                           fused_bptt=fused, **kw)
        return obs, np.asarray(net.get_node("rnn")["weights"])

    obs_f, w_f = fit(True)
    obs_s, w_s = fit(False)
    np.testing.assert_array_equal(np.asarray(obs_f["steps"]),
                                  np.asarray(obs_s["steps"]))
    np.testing.assert_allclose(obs_f.to_numpy("out"), obs_s.to_numpy("out"),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(obs_f["loss"]), np.asarray(obs_s["loss"]),
                               rtol=1e-9)
    np.testing.assert_allclose(w_f, w_s, rtol=1e-6, atol=1e-10)
    assert np.abs(w_f - W0).max() > 1e-4, "TBPTT did not train"

    # record_vars forces the plain scan (the trajectory only emits outputs);
    # results still match the fused run
    obs_v, w_v = fit(True, record_vars=[("rnn", "v", True)])
    assert obs_v.to_numpy(("rnn", "v")).shape[0] == len(np.asarray(obs_v["steps"]))
    np.testing.assert_allclose(w_v, w_f, rtol=1e-6, atol=1e-10)


def test_int8_master_block_sparse_trains_and_matches_plain():
    """coupling_dtype='int8_master' with BLOCK-SPARSE couplings (the N=100k
    configuration): forward trajectory is bit-identical between the deferred
    trajectory and the composed step (same quantized math), correlates >0.99
    with the f32 run, fused/plain training agree, and the loss decreases."""
    from rectipy_tpu.ops.sparse import block_random_connectivity

    n, bs, T = 64, 16, 250
    rng = np.random.default_rng(17)
    A = block_random_connectivity(n, n, 8, block_size=bs, seed=5)
    etas = 6.0 + rng.random(n)
    inp = rng.normal(size=(T, n)) * 2.0
    tgt = rng.normal(size=(T, n)) * 0.1

    def build(cd):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("qif", QIF, weights=A, input_var="I_ext",
                            output_var="s", source_var="s", target_var="s_in",
                            op="qif_op", spike_var="spike", spike_def="v",
                            spike_threshold=100.0, spike_reset=-100.0,
                            node_vars={"all/qif_op/eta": etas},
                            coupling_dtype=cd, train_params=["weights"])
        net.compile()
        return net

    out_q = build("int8_master").run(inp, verbose=False).to_numpy("out")
    out_f = build(None).run(inp, verbose=False).to_numpy("out")
    assert out_q.max() > 0, "no spikes -> vacuous"
    c = np.corrcoef(out_q.ravel(), out_f.ravel())[0, 1]
    assert c > 0.99, f"int8_master block trajectory decorrelated: {c}"

    # deferred trajectory == composed step, bit for bit
    net = build("int8_master")
    from rectipy_tpu.ops.bptt import make_coupled_traj
    traj, wkeys = make_coupled_traj(net.get_node("qif"))
    params = net.parameters_pytree()
    nargs = params["nodes"]["qif"]
    y0 = net.init_state()["nodes"]["qif"]
    Wd = {k: nargs[k] for k in wkeys}
    rest = {k: v for k, v in nargs.items() if k not in wkeys}
    assert all(np.asarray(Wd[k]).ndim == 4 for k in wkeys)
    step = net.make_step()

    def body(st, x):
        st, out, _ = step(st, {"nodes": {"qif": nargs}, "edges": {}}, x)
        return st, out

    _, outs_std = jax.lax.scan(body, {"nodes": {"qif": y0}, "edges": {}},
                               jnp.asarray(inp))
    _, outs_fast = traj(Wd, rest, y0, jnp.asarray(inp))
    np.testing.assert_array_equal(np.asarray(outs_fast), np.asarray(outs_std))

    def fit(fused):
        net = build("int8_master")
        obs = net.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return (np.asarray(obs["epoch_loss"]),
                np.asarray(net.get_node("qif")["weights"]))

    l_fast, w_fast = fit(True)
    l_std, w_std = fit(False)
    assert w_fast.ndim == 4
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-7)
    np.testing.assert_allclose(w_fast, w_std, rtol=0.0,
                               atol=1e-4 * np.abs(w_std).max())
    assert l_fast[-1] < l_fast[0], "block int8_master training did not reduce loss"


def test_remat_composes_with_deferred_trajectory():
    """remat_steps on an Euler chain uses the CHUNKED deferred trajectory
    (checkpointing inside the custom VJP): results equal the full-residual
    fused run at f64 tolerance; a T not divisible by remat_steps falls back
    to the plain jax.checkpoint path and still matches."""
    n, T = 8, 120
    rng = np.random.default_rng(19)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.2

    def fit(**kw):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        obs = net.fit_bptt([inp] * 4, [tgt] * 4, optimizer="adam", lr=1e-2,
                           verbose=False, **kw)
        return np.asarray(obs["epoch_loss"]), np.asarray(net.get_node("rnn")["weights"])

    l_fused, w_fused = fit()                          # full-residual trajectory
    l_remat, w_remat = fit(remat_steps=30)            # chunked trajectory
    l_nd, w_nd = fit(remat_steps=50)                  # 120 % 50 != 0 -> plain path
    np.testing.assert_allclose(l_remat, l_fused, rtol=1e-8)
    np.testing.assert_allclose(w_remat, w_fused, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(l_nd, l_fused, rtol=1e-8)
    np.testing.assert_allclose(w_nd, w_fused, rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("kind", ["rate", "spike_reset"])
def test_chunked_traj_gradient_parity(kind):
    """Direct trajectory-level check: make_coupled_traj(remat_steps=K)
    produces the SAME forward (bit-identical) and the same gradients (f64,
    association-only deviation) as the full-residual trajectory."""
    n = 10
    T, K = (300, 50) if kind == "spike_reset" else (120, 30)  # spikes need ~220 steps
    rng = np.random.default_rng(20)
    net = _build(kind, n, rng)
    node = net.get_node("rnn")
    traj_full, wkeys = make_coupled_traj(node)
    traj_ck, _ = make_coupled_traj(node, remat_steps=K)

    params = net.parameters_pytree()
    nargs = params["nodes"]["rnn"]
    y0 = net.init_state()["nodes"]["rnn"]
    xs = jnp.asarray(rng.normal(size=(T, n)))
    tgt = jnp.asarray(rng.normal(size=(T, n)))
    Wd = {k: nargs[k] for k in wkeys}
    rest = {k: v for k, v in nargs.items() if k not in wkeys}

    yT_f, outs_f = traj_full(Wd, rest, y0, xs)
    yT_c, outs_c = traj_ck(Wd, rest, y0, xs)
    np.testing.assert_array_equal(np.asarray(outs_c), np.asarray(outs_f))
    np.testing.assert_array_equal(np.asarray(yT_c), np.asarray(yT_f))

    def loss(traj):
        def f(Wm, y0_, xs_):
            _, outs = traj(Wm, rest, y0_, xs_)
            return jnp.mean((outs - tgt) ** 2)

        return f

    g_f = jax.grad(loss(traj_full), argnums=(0, 1, 2))(Wd, y0, xs)
    g_c = jax.grad(loss(traj_ck), argnums=(0, 1, 2))(Wd, y0, xs)
    for wk in wkeys:
        a, b = np.asarray(g_f[0][wk]), np.asarray(g_c[0][wk])
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(b, a, atol=1e-9 * max(np.abs(a).max(), 1.0))
    for i in (1, 2):
        np.testing.assert_allclose(np.asarray(g_c[i]), np.asarray(g_f[i]),
                                   rtol=1e-10, atol=1e-14)


def test_fit_bptt_epoch_programs_cached_across_fits():
    """fit_bptt epoch mode caches its jitted update programs across calls
    (a fresh jax.jit per fit costs a full host retrace of the T-step scan,
    measured ~0.5-1 s at N=10k).  The cache must hit for identical configs,
    miss on optimizer change, and -- since params/state are ARGUMENTS, not
    closure constants -- cached programs must track current weights/state."""
    n, T = 8, 60
    rng = np.random.default_rng(33)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        return net

    A = build()
    A.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2, verbose=False)
    keys = [k for k in A._step_cache if k[0] == "bptt_epochs"]
    assert len(keys) == 1
    built = A._step_cache[keys[0]]
    lA2 = A.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2,
                     verbose=False)["epoch_loss"]
    assert A._step_cache[keys[0]] is built, "cache was not reused"

    # the cached program must see the UPDATED weights: a fresh net doing two
    # sequential fits must produce the same second-fit losses
    B = build()
    B.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2, verbose=False)
    lB2 = B.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2,
                     verbose=False)["epoch_loss"]
    np.testing.assert_allclose(lA2, lB2, rtol=1e-12)

    # different optimizer config -> distinct cached program
    A.fit_bptt([inp] * 2, [tgt] * 2, optimizer="sgd", lr=1e-2, verbose=False)
    assert len([k for k in A._step_cache if k[0] == "bptt_epochs"]) == 2

    # state is an argument too: changing the initial state between fits must
    # change the result through the SAME cached program
    C_net = build()
    l_zero = C_net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2,
                            verbose=False)["epoch_loss"]
    D_net = build()
    D_net.get_node("rnn").reset(np.full(n, 0.5))
    l_half = D_net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2,
                            verbose=False)["epoch_loss"]
    assert abs(l_zero[0] - l_half[0]) > 1e-12


def test_fit_bptt_step_mode_program_cached_across_fits():
    """Step-mode (TBPTT) fits cache their jitted program across calls too --
    inputs/targets are arguments, so repeated fits with FRESH same-shape
    data (the RL-style workload) reuse the compiled program, and results
    still track the new data."""
    n, T = 6, 60
    rng = np.random.default_rng(34)
    W0 = rng.normal(size=(n, n)) * 0.3

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        return net

    inp1, tgt1 = rng.normal(size=(T, n)), rng.normal(size=(T, n))
    inp2, tgt2 = rng.normal(size=(T, n)), rng.normal(size=(T, n))

    A = build()
    A.fit_bptt(inp1, tgt1, update_steps=20, optimizer="adam", lr=1e-2,
               verbose=False)
    keys = [k for k in A._step_cache if k[0] == "bptt_steps"]
    assert len(keys) == 1
    prog = A._step_cache[keys[0]]
    o2 = A.fit_bptt(inp2, tgt2, update_steps=20, optimizer="adam", lr=1e-2,
                    verbose=False)
    assert A._step_cache[keys[0]] is prog, "step-mode program not reused"

    # the cached program must track the new data AND the updated weights:
    # a fresh net fitting inp1 then inp2 sequentially matches exactly
    B = build()
    B.fit_bptt(inp1, tgt1, update_steps=20, optimizer="adam", lr=1e-2,
               verbose=False)
    o2b = B.fit_bptt(inp2, tgt2, update_steps=20, optimizer="adam", lr=1e-2,
                     verbose=False)
    np.testing.assert_allclose(np.asarray(o2["out"]), np.asarray(o2b["out"]),
                               rtol=1e-12)
    assert np.abs(np.asarray(o2["loss"])).max() > 0


def test_fit_bptt_3d_epoch_form_matches_list_form():
    """The documented 3D (epochs, T, m) input form must train identically to
    the list form.  Regression: the id()-keyed staging cache used to alias
    FREED temporary views (CPython reuses the address of inputs[epoch] for
    targets[epoch]), silently training on corrupted targets."""
    n, T, E = 8, 50, 3
    rng = np.random.default_rng(36)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp3 = rng.normal(size=(E, T, n))  # float64 -> float32 conversion path
    tgt3 = rng.normal(size=(E, T, n)) * 0.1

    def build():
        net = Network(1e-2)  # float32 default: stage() must convert (a copy)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        return net

    l_3d = build().fit_bptt(inp3, tgt3, optimizer="adam", lr=1e-2,
                            verbose=False)["epoch_loss"]
    l_list = build().fit_bptt([inp3[i] for i in range(E)],
                              [tgt3[i] for i in range(E)], optimizer="adam",
                              lr=1e-2, verbose=False)["epoch_loss"]
    np.testing.assert_allclose(l_3d, l_list, rtol=1e-6)
    assert np.std(l_list) > 0 or l_list[0] != l_list[-1] or True
    # distinct epochs -> distinct losses (aliasing collapsed them to equal)
    assert len(set(np.round(l_list, 10))) > 1


def test_fit_bptt_lr_sweep_reuses_one_program():
    """The learning rate rides in opt_state (optax.inject_hyperparams), so a
    sweep over lr values reuses ONE cached program -- and each fit still
    applies ITS lr (larger lr moves the weights further)."""
    n, T = 8, 40
    rng = np.random.default_rng(37)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", train_params=["weights"])
    deltas = []
    for lr in (1e-4, 1e-3, 1e-2):
        net.get_node("rnn").set_param("weights", W0)
        net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=lr,
                     verbose=False)
        deltas.append(np.abs(np.asarray(net.get_node("rnn")["weights"]) - W0).max())
    keys = [k for k in net._step_cache if k[0] == "bptt_epochs"]
    assert len(keys) == 1, f"lr sweep leaked programs: {len(keys)} cache entries"
    assert deltas[0] < deltas[1] < deltas[2], f"lr not applied per-fit: {deltas}"


def test_fit_bptt_bf16_adam_moments():
    """optimizer_kwargs={'mu_dtype': 'bfloat16'} keeps adam's first moment in
    bf16 (halves the mu stream in the optimizer tail) while the update math
    stays f32 -- loss curve must track the f32-moment fit closely, and the
    config must participate in the program cache key (no silent reuse of the
    f32-moment program)."""
    n, T, E = 8, 40, 6
    rng = np.random.default_rng(39)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    losses = {}
    for kw in (None, {"mu_dtype": "bfloat16"}):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        obs = net.fit_bptt([inp] * E, [tgt] * E, optimizer="adam", lr=1e-2,
                           optimizer_kwargs=kw, verbose=False)
        losses[str(kw)] = np.asarray(obs["epoch_loss"])
        if kw is not None:
            # the moment leaf really is bf16 in opt_state
            from rectipy_tpu.train.optimizers import get_optimizer

            opt = get_optimizer("adam", 1e-2, optimizer_kwargs=kw)
            st = opt.init({"w": jnp.ones((2, 2), jnp.float32)})
            mus = [l for p, l in jax.tree_util.tree_leaves_with_path(st)
                   if "mu" in "/".join(str(x) for x in p)]
            assert mus and all(m.dtype == jnp.bfloat16 for m in mus)
    a, b = losses["None"], losses[str({"mu_dtype": "bfloat16"})]
    assert a[-1] < a[0] and b[-1] < b[0]
    np.testing.assert_allclose(a, b, rtol=1e-3)
    # distinct cache keys: a net fitted with both configs holds two programs
    net2 = Network(1e-2, dtype=jnp.float64)
    net2.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                         output_var="li_op/v", source_var="tanh_op/r",
                         target_var="li_op/r_in", train_params=["weights"])
    net2.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2, verbose=False)
    net2.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-2,
                  optimizer_kwargs={"mu_dtype": "bfloat16"}, verbose=False)
    keys = [k for k in net2._step_cache if k[0] == "bptt_epochs"]
    assert len(keys) == 2, f"mu_dtype missing from cache key: {len(keys)}"


def test_fit_bptt_cached_program_tracks_frozen_param_changes():
    """set_param on a FROZEN (non-trained) parameter between fits must flow
    through the cached program -- frozen params are arguments, not traced
    constants."""
    n, T = 8, 40
    rng = np.random.default_rng(38)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.1

    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", train_params=["weights"])
    l1 = net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                      verbose=False)["epoch_loss"]
    keys = [k for k in net._step_cache if k[0] == "bptt_epochs"]
    prog = net._step_cache[keys[0]]
    net.get_node("rnn").set_param("eta", 5.0)  # frozen param changes
    net.get_node("rnn").set_param("weights", W0)  # reset trained weights
    l2 = net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                      verbose=False)["epoch_loss"]
    assert net._step_cache[keys[0]] is prog, "program should be reused"
    assert abs(l1[0] - l2[0]) > 1e-9, "frozen-param change had no effect"

    # oracle: a fresh net built with the new eta gives the same losses
    net2 = Network(1e-2, dtype=jnp.float64)
    net2.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                         output_var="li_op/v", source_var="tanh_op/r",
                         target_var="li_op/r_in", train_params=["weights"],
                         node_vars={"all/li_op/eta": 5.0})
    l2_fresh = net2.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                             verbose=False)["epoch_loss"]
    np.testing.assert_allclose(l2, l2_fresh, rtol=1e-10)


def _int8m_qif_net(n, W0, etas):
    # dt=5e-3 so supercritical neurons cross threshold well inside short
    # trajectories (a silent population has exactly zero coupling gradients)
    net = Network(5e-3, dtype=jnp.float64)
    net.add_diffeq_node("rnn", QIF, weights=W0, input_var="I_ext",
                        output_var="s", source_var="s", target_var="s_in",
                        op="qif_op", spike_var="spike", spike_def="v",
                        spike_threshold=100.0, spike_reset=-100.0,
                        node_vars={"all/qif_op/eta": etas},
                        coupling_dtype="int8_master",
                        train_params=["weights"])
    return net


def test_fused_adam_requant_matches_optax_path(monkeypatch):
    """The fused adam + requantize epoch programs (ops/fused_opt.py +
    network._build_fused_adam_programs) must reproduce the optax path:
    loss curves bit-near (the quantized forward is identical by
    construction) and final masters equal up to f32 arithmetic-ordering
    drift (~1 ulp/step, measured)."""
    n, T, n_ep = 16, 400, 10  # 10 epochs: one 8-chunk + 2 single updates
    rng = np.random.default_rng(44)
    W0 = rng.normal(size=(n, n)) / np.sqrt(n)
    etas = rng.uniform(5.0, 15.0, n)  # supercritical: non-zero coupling grads
    inp = rng.normal(size=(T, 1)) * 5 + 10
    tgt = rng.normal(size=(T, n)) * 0.1

    runs = {}
    for mode in ("off", "xla"):
        monkeypatch.setenv("RECTIPY_FUSED_ADAM", mode)
        net = _int8m_qif_net(n, W0, etas)
        obs = net.fit_bptt([inp] * n_ep, [tgt] * n_ep, optimizer="adam",
                           lr=1e-3, verbose=False)
        built = [v for k, v in net._step_cache.items() if k[0] == "bptt_epochs"]
        engaged = built and built[0][3] is not None
        assert engaged == (mode != "off"), f"fused path engaged={engaged} for {mode}"
        runs[mode] = (np.asarray(obs["epoch_loss"]),
                      np.asarray(net.get_node("rnn")["weights"]))

    l_opt, w_opt = runs["off"]
    l_fus, w_fus = runs["xla"]
    assert l_opt[-1] < l_opt[0], "training did not reduce the loss"
    np.testing.assert_allclose(l_fus, l_opt, rtol=1e-9)
    np.testing.assert_allclose(w_fus, w_opt, rtol=1e-3, atol=1e-4)


def test_fused_adam_eligibility_gates(monkeypatch):
    """The fused path must NOT engage for non-adam optimizers, unsupported
    adam kwargs, or a frozen coupling -- and each of those fits still runs."""
    n, T = 12, 60
    rng = np.random.default_rng(45)
    W0 = rng.normal(size=(n, n)) / np.sqrt(n)
    etas = rng.uniform(5.0, 15.0, n)
    inp = rng.normal(size=(T, 1))
    tgt = rng.normal(size=(T, n)) * 0.1
    monkeypatch.setenv("RECTIPY_FUSED_ADAM", "xla")

    def engaged(net):
        built = [v for k, v in net._step_cache.items() if k[0] == "bptt_epochs"]
        return bool(built) and built[0][3] is not None

    # sgd: no fused programs
    net = _int8m_qif_net(n, W0, etas)
    net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="sgd", lr=1e-3, verbose=False)
    assert not engaged(net)

    # adam with an unsupported kwarg (nesterov): optax path
    net = _int8m_qif_net(n, W0, etas)
    net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                 optimizer_kwargs={"nesterov": True}, verbose=False)
    assert not engaged(net)

    # adam with a callable lr schedule: optax path (inject_hyperparams
    # re-evaluates the schedule per update; the fused carry would freeze it)
    net = _int8m_qif_net(n, W0, etas)
    obs_s = net.fit_bptt([inp] * 3, [tgt] * 3, optimizer="adam",
                         lr=lambda count: 1e-3 * 0.5 ** count, verbose=False)
    assert not engaged(net)
    assert np.isfinite(np.asarray(obs_s["epoch_loss"])).all()

    # the kill switch works on a WARM program cache: flipping
    # RECTIPY_FUSED_ADAM between fits on the same network rebuilds (the mode
    # rides the cache key) instead of silently reusing the other path
    net = _int8m_qif_net(n, W0, etas)
    net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3, verbose=False)
    assert engaged(net)
    monkeypatch.setenv("RECTIPY_FUSED_ADAM", "off")
    obs_off = net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                           verbose=False)
    built = [v for k, v in net._step_cache.items() if k[0] == "bptt_epochs"]
    assert any(b[3] is None for b in built), "off-mode fit did not rebuild"
    assert np.isfinite(np.asarray(obs_off["epoch_loss"])).all()
    monkeypatch.setenv("RECTIPY_FUSED_ADAM", "xla")

    # adam with supported kwarg overrides: fused, and b1/b2/eps are honored
    net = _int8m_qif_net(n, W0, etas)
    obs_f = net.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                         optimizer_kwargs={"b1": 0.8, "eps": 1e-6},
                         verbose=False)
    assert engaged(net)
    monkeypatch.setenv("RECTIPY_FUSED_ADAM", "off")
    net2 = _int8m_qif_net(n, W0, etas)
    obs_o = net2.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                          optimizer_kwargs={"b1": 0.8, "eps": 1e-6},
                          verbose=False)
    np.testing.assert_allclose(np.asarray(obs_f["epoch_loss"]),
                               np.asarray(obs_o["epoch_loss"]), rtol=1e-9)


def test_int4_master_traj_forward_and_grad_parity():
    """coupling_dtype='int4_master': the deferred trajectory's quantized
    forward is bit-identical to the composed step, trajectories correlate
    >0.99 with the f32 network, and deferred gradients match plain autodiff
    THROUGH THE SAME quantized forward (both STE).  Mirror of the
    int8_master test one notch down (ops/quant.py int4 section)."""
    n, T = 12, 300
    rng = np.random.default_rng(34)
    W0 = rng.normal(size=(n, n)) * 0.3
    xs_np = rng.normal(size=(T, n))

    def build(cd):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"],
                            coupling_dtype=cd)
        net.compile()
        return net

    out_q = build("int4_master").run(xs_np, verbose=False).to_numpy("out")
    out_f = build(None).run(xs_np, verbose=False).to_numpy("out")
    c = np.corrcoef(out_q.ravel(), out_f.ravel())[0, 1]
    assert c > 0.99, f"int4_master trajectory decorrelated from f32: {c}"

    net = build("int4_master")
    node = net.get_node("rnn")
    traj, wkeys = make_coupled_traj(node)
    step = net.make_step()
    params = net.parameters_pytree()
    nargs = params["nodes"]["rnn"]
    y0 = net.init_state()["nodes"]["rnn"]
    xs = jnp.asarray(xs_np)
    tgt = jnp.asarray(rng.normal(size=(T, n)))
    Wd = {k: nargs[k] for k in wkeys}
    rest = {k: v for k, v in nargs.items() if k not in wkeys}
    assert all(np.asarray(Wd[k]).dtype == np.float64 for k in wkeys), \
        "int4_master must store float master weights"

    def run_std(Wm, y0_, xs_):
        p = {"nodes": {"rnn": {**nargs, **Wm}}, "edges": {}}
        st0 = {"nodes": {"rnn": y0_}, "edges": {}}

        def body(st, x):
            st, out, _ = step(st, p, x)
            return st, out

        stT, outs = jax.lax.scan(body, st0, xs_)
        return stT["nodes"]["rnn"], outs

    _, outs_std = run_std(Wd, y0, xs)
    _, outs_fast = traj(Wd, rest, y0, xs)
    np.testing.assert_array_equal(np.asarray(outs_fast), np.asarray(outs_std))

    def loss_std(Wm):
        _, outs = run_std(Wm, y0, xs)
        return jnp.mean((outs - tgt) ** 2)

    def loss_fast(Wm):
        _, outs = traj(Wm, rest, y0, xs)
        return jnp.mean((outs - tgt) ** 2)

    g_std = jax.grad(loss_std)(Wd)
    g_fast = jax.grad(loss_fast)(Wd)
    for wk in wkeys:
        a, b = np.asarray(g_std[wk]), np.asarray(g_fast[wk])
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max())


def test_fit_bptt_int4_master_trains():
    """End-to-end: fit_bptt with int4_master coupling reduces the loss, the
    fused and plain paths agree, and the trained master moves."""
    n, T = 10, 150
    rng = np.random.default_rng(35)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.2

    def fit(fused):
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"],
                            coupling_dtype="int4_master")
        obs = net.fit_bptt([inp] * 10, [tgt] * 10, optimizer="adam", lr=1e-2,
                           verbose=False, fused_bptt=fused)
        return np.asarray(obs["epoch_loss"]), np.asarray(net.get_node("rnn")["weights"])

    l_fast, w_fast = fit(True)
    l_std, w_std = fit(False)
    np.testing.assert_allclose(l_fast, l_std, rtol=1e-7)
    np.testing.assert_allclose(w_fast, w_std, rtol=1e-4, atol=1e-8)
    assert l_fast[-1] < l_fast[0], "int4_master training did not reduce the loss"
    assert np.abs(w_fast - W0).max() > 1e-5, "master weights did not move"


def test_fit_bptt_epoch_mode_records_last_epoch_run():
    """Reference parity (/root/reference/rectipy/network.py:983-1014): when
    recording is requested, the Observer returned by an epoch-mode fit holds
    the LAST epoch's run recordings -- the forward with the weights after
    K-1 updates, from the initial state -- plus the full epoch_loss history.
    Recording is opt-in here (the reference always records; the extra
    forward pass is not free), so the default fit's Observer holds only
    epoch_loss/epochs."""
    n, T, K = 8, 120, 5
    rng = np.random.default_rng(36)
    W0 = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(T, n))
    tgt = rng.normal(size=(T, n)) * 0.2

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", train_params=["weights"])
        return net

    # default: training-only programs, no trajectory recordings
    net0 = build()
    obs0 = net0.fit_bptt([inp] * K, [tgt] * K, optimizer="adam", lr=1e-2,
                         verbose=False)
    assert len(np.asarray(obs0["epoch_loss"])) == K
    assert obs0.to_numpy("out").size == 0

    # recording fit: losses identical to an unrecorded fit of the same
    # config, final weights too (sampling_steps > 1: the loss compares the
    # downsampled recordings against a (T//s, n) target, as the reference
    # does with stacked obs["out"])
    s_steps = 3
    tgt_ds = tgt[::s_steps]
    net0b = build()
    obs0b = net0b.fit_bptt([inp] * K, [tgt_ds] * K, optimizer="adam", lr=1e-2,
                           verbose=False, sampling_steps=s_steps)
    net1 = build()
    obs1 = net1.fit_bptt([inp] * K, [tgt_ds] * K, optimizer="adam", lr=1e-2,
                         verbose=False, record_output=True,
                         record_vars=[("rnn", "v", True)], sampling_steps=s_steps)
    np.testing.assert_allclose(np.asarray(obs1["epoch_loss"]),
                               np.asarray(obs0b["epoch_loss"]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(net1.get_node("rnn")["weights"]),
                               np.asarray(net0b.get_node("rnn")["weights"]),
                               rtol=1e-9)

    # the recordings are the last epoch's forward: train K-1 epochs on a
    # fresh network, then run() -- must match exactly
    net2 = build()
    net2.fit_bptt([inp] * (K - 1), [tgt_ds] * (K - 1), optimizer="adam",
                  lr=1e-2, verbose=False, sampling_steps=s_steps)
    ref = net2.run(inp, sampling_steps=s_steps, verbose=False,
                   record_vars=[("rnn", "v", True)])
    np.testing.assert_allclose(obs1.to_numpy("out"), ref.to_numpy("out"),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(obs1.to_numpy(("rnn", "v")),
                               ref.to_numpy(("rnn", "v")), rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(obs1["steps"]),
                                  np.asarray(ref["steps"]))

    # the recording fit leaves the network state reset (reference resets to
    # y0 after every epoch) and the TRAINED weights written back
    np.testing.assert_allclose(np.asarray(net1.state["rnn"]),
                               np.asarray(build().state["rnn"]), atol=1e-12)
