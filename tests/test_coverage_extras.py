"""Coverage for remaining branches: observer reuse/eager record, rls epoch
mode, extra couplings, truncate_steps fallback scan, npz checkpoint fallback,
profiler helpers."""

import numpy as np
import jax.numpy as jnp
import pytest

from rectipy_tpu import Network, Observer
from rectipy_tpu.checkpoint import restore_pytree, save_pytree
from rectipy_tpu.dsl import lower
from rectipy_tpu.profiler import PhaseTimer, annotate

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"


def _net(n, W=None, **kw):
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=W if W is not None else np.zeros((n, n)),
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in", **kw)
    return net


def test_run_with_observer_reuse():
    """run(obs=...) appends to an existing Observer (reference pattern)."""
    n = 4
    net = _net(n)
    obs = Observer(dt=1e-2, record_loss=False)
    net.run(np.ones((10, n)), sampling_steps=5, verbose=False, obs=obs)
    assert len(obs["steps"]) == 2
    net.run(np.ones((10, n)), sampling_steps=5, verbose=False, obs=obs)
    assert len(obs["steps"]) == 4  # appended, not replaced


def test_observer_eager_record():
    obs = Observer(dt=0.1, record_vars=[("n", "v", True)])
    obs.record(0, np.ones(3), 0.5, [np.array([1.0, 3.0])])
    obs.record(1, np.zeros(3), 0.25, [np.array([2.0, 2.0])])
    assert obs.to_numpy("out").shape == (2, 3)
    np.testing.assert_allclose(obs.to_numpy(("n", "v")), [2.0, 2.0])
    np.testing.assert_allclose(obs.to_numpy("loss"), [0.5, 0.25])


def test_fit_rls_epoch_mode():
    n, m = 10, 2
    rng = np.random.default_rng(0)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("inp", m, activation_function="identity")
    net.add_diffeq_node("rnn", TANH, weights=rng.normal(size=(n, n)) * 0.3,
                        input_var="li_op/I_ext", output_var="tanh_op/r",
                        source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_func_node("out", 1, activation_function="identity")
    net.add_edge("inp", "rnn", weights=rng.normal(size=(n, m)))
    net.add_edge("rnn", "out", train="rls", beta=1.0)
    T = 150
    inp = rng.normal(size=(T, m))
    w_t = rng.normal(size=(n, 1))
    # epoch mode with two epochs of (inputs, targets)
    X = None
    tgt = rng.normal(size=(T, 1)) * 0.1
    obs = net.fit_rls([inp, inp], [tgt, tgt], update_steps=1, sampling_steps=50,
                      verbose=False)
    assert len(obs["epoch_loss"]) == 2
    assert np.isfinite(obs["epoch_loss"]).all()
    with pytest.raises(ValueError):
        net.fit_rls([inp], [tgt, tgt])


def test_lower_extra_edges():
    """Multiple couplings: primary weights plus an `edges` list."""
    n = 5
    rng = np.random.default_rng(1)
    W1 = rng.normal(size=(n, n)) * 0.1
    W2 = rng.normal(size=(n, n)) * 0.1
    vf = lower(TANH, weights=W1, source_var="tanh_op/r", target_var="li_op/r_in",
               edges=[("li_op/v", "li_op/I_ext", W2)], dtype=jnp.float64)
    y = jnp.asarray(rng.normal(size=(n,)))
    dy = np.asarray(vf.func(0.0, y, vf.args))
    v = np.asarray(y)
    expect = -v / 10.0 + (W1 @ np.tanh(v)) + (W2 @ v)
    np.testing.assert_allclose(dy, expect, rtol=1e-12)


def test_run_truncate_steps_fallback_scan():
    """truncate_steps routes through the generic carried-buffer scan with
    identical recording results (gradient truncation is a no-op forward)."""
    n = 4
    rng = np.random.default_rng(2)
    W = rng.normal(size=(n, n)) * 0.3
    inp = rng.normal(size=(30, n))
    a = _net(n, W).run(inp, sampling_steps=3, verbose=False).to_numpy("out")
    b = _net(n, W).run(inp, sampling_steps=3, verbose=False,
                       truncate_steps=10).to_numpy("out")
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_checkpoint_npz_fallback(tmp_path, monkeypatch):
    """save/restore must work when orbax is unavailable (npz fallback)."""
    import rectipy_tpu.checkpoint as ck
    import builtins

    real_import = builtins.__import__

    def no_orbax(name, *a, **k):
        if name.startswith("orbax"):
            raise ImportError("orbax disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_orbax)
    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    path = str(tmp_path / "ck")
    ck.save_pytree(tree, path)
    out = ck.restore_pytree(tree, path)
    np.testing.assert_allclose(np.asarray(out["b"]["c"]), 1.0)
    with pytest.raises(FileNotFoundError):
        ck.restore_pytree(tree, str(tmp_path / "missing"))


def test_profiler_helpers():
    timer = PhaseTimer()
    with timer.phase("build"):
        x = jnp.ones(10) * 2
    out = timer.time("sum", lambda: jnp.sum(jnp.ones(100)))
    assert float(out) == 100.0
    totals = timer.report(printer=lambda *_: None)
    assert set(totals) == {"build", "sum"}
    with annotate("region"):
        _ = jnp.ones(3) + 1


def test_run_batch_without_output_recording():
    n = 4
    net = _net(n)
    res = net.run_batch(np.ones((2, 10, n)), sampling_steps=5, record_output=False,
                        record_vars=[("rnn", "v", True)])
    assert "out" not in res
    assert res[("rnn", "v")].shape == (2, 2)


def test_run_input_validation():
    n = 4
    net = _net(n)
    with pytest.raises(ValueError, match="channels"):
        net.run(np.ones((10, n + 1)), verbose=False)
    with pytest.raises(ValueError, match="T, m"):
        net.run(np.ones(10), verbose=False)


def test_feedback_network_ridge_and_rls():
    """Trainer paths compose with FeedbackNetwork."""
    from rectipy_tpu import FeedbackNetwork

    n = 6
    rng = np.random.default_rng(3)
    net = FeedbackNetwork(1e-2, dtype=jnp.float64)
    net.add_func_node("inp", 2, activation_function="identity")
    for label in ("p1", "p2"):
        net.add_diffeq_node(label, TANH, weights=rng.normal(size=(n, n)) * 0.2,
                            input_var="li_op/I_ext", output_var="tanh_op/r",
                            source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_edge("inp", "p1", weights=rng.normal(size=(n, 2)))
    net.add_edge("p1", "p2", weights=np.eye(n))
    net.add_edge("p2", "p1", weights=rng.normal(size=(n, n)) * 0.1, feedback=True)
    T = 100
    inp = rng.normal(size=(T, 2))
    tgt = rng.normal(size=(T, 3)) * 0.1
    obs = net.fit_ridge(inp, tgt, sampling_steps=1, verbose=False, alpha=1e-3)
    assert np.asarray(obs["w_out"]).shape == (n, 3)
    assert "readout" in net.nodes
    obs2, loss = net.test(inp, tgt, sampling_steps=1, verbose=False)
    assert np.isfinite(loss)


def test_fit_eprop_program_cached_across_fits():
    """fit_eprop caches its jitted scan across calls (the online/RL workload
    re-fits repeatedly with fresh same-shape data); results must track the
    new data and the updated readout weights exactly."""
    TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
    n, m, T = 8, 3, 40
    rng = np.random.default_rng(35)
    W0 = rng.normal(size=(n, n)) * 0.3
    Wout0 = rng.normal(size=(m, n)) * 0.1

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_func_node("out", m, activation_function="identity")
        net.add_edge("rnn", "out", weights=Wout0.copy(), train="eprop")
        return net

    inp1, tgt1 = rng.normal(size=(T, n)), rng.normal(size=(T, m)) * 0.1
    inp2, tgt2 = rng.normal(size=(T, n)), rng.normal(size=(T, m)) * 0.1

    A = build()
    A.fit_eprop(inp1, tgt1, update_steps=1, verbose=False)
    keys = [k for k in A._step_cache if k[0] == "eprop_scan"]
    assert len(keys) == 1
    prog = A._step_cache[keys[0]]
    A.fit_eprop(inp2, tgt2, update_steps=1, verbose=False)
    assert A._step_cache[keys[0]] is prog, "eprop program not reused"
    wA = np.asarray(A.get_edge("rnn", "out").weights)

    B = build()
    B.fit_eprop(inp1, tgt1, update_steps=1, verbose=False)
    B.fit_eprop(inp2, tgt2, update_steps=1, verbose=False)
    np.testing.assert_allclose(wA, np.asarray(B.get_edge("rnn", "out").weights),
                               rtol=1e-12)


def test_n_in_n_out_raise_on_uncompilable_graph():
    """An uncompilable graph must raise the compile error from n_in/n_out
    access, not silently report width 0 (reference raises,
    /root/reference/rectipy/network.py:439-460)."""
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("a", 3, activation_function="identity")
    net.add_func_node("b", 3, activation_function="identity")
    # two nodes with no edges: neither the input nor the output node is unique
    with pytest.raises(ValueError, match="input node"):
        _ = net.n_in
    with pytest.raises(ValueError, match="input node"):
        _ = net.n_out
    # a compilable graph reports real widths
    net.add_edge("a", "b")
    assert net.n_in == 3 and net.n_out == 3


def test_train_prog_key_rejects_non_scalar_kwargs():
    """Training-program cache keys are built from VALUES, never reprs: any
    non-scalar optimizer/loss kwarg disables caching instead of risking a
    repr collision (e.g. numpy arrays elide content beyond 1000 elements)."""
    net = _net(3)
    k1 = net._train_prog_key("adam", "mse", {"b1": 0.9}, None)
    k2 = net._train_prog_key("adam", "mse", {"b1": 0.95}, None)
    assert k1 is not None and k2 is not None and k1 != k2
    # tuple-of-scalars is allowed and keyed by value
    k3 = net._train_prog_key("adam", "mse", {"betas": (0.9, 0.999)}, None)
    assert k3 is not None
    # non-scalar values (arrays, dicts, callables) disable caching
    assert net._train_prog_key("adam", "mse", {"w": np.ones(2000)}, None) is None
    assert net._train_prog_key("adam", "mse", None, {"fn": lambda x: x}) is None
    assert net._train_prog_key(lambda p: p, "mse", None, None) is None
    # bool/int distinction does not collide (True == 1 hashes equal)
    assert net._train_prog_key("adam", "mse", {"x": True}, None) != \
        net._train_prog_key("adam", "mse", {"x": 1}, None)
    # dtype-like kwargs (adam mu_dtype=jnp.bfloat16) key by canonical name,
    # so low-precision-moment fits still reuse one cached program
    kd1 = net._train_prog_key("adam", "mse", {"mu_dtype": jnp.bfloat16}, None)
    kd2 = net._train_prog_key("adam", "mse", {"mu_dtype": np.float32}, None)
    assert kd1 is not None and kd2 is not None and kd1 != kd2
    assert kd1 == net._train_prog_key("adam", "mse", {"mu_dtype": jnp.bfloat16}, None)


def test_step_cache_is_bounded_lru():
    """The per-network program cache is a bounded LRU: sweeping configs
    cannot grow host memory without bound (ADVICE r3)."""
    from rectipy_tpu.network import _LRUCache

    c = _LRUCache(maxsize=3)
    for i in range(5):
        c[("k", i)] = i
    assert len(c) == 3
    assert ("k", 0) not in c and ("k", 1) not in c
    # access refreshes recency
    _ = c[("k", 2)]
    c[("k", 5)] = 5
    assert ("k", 2) in c and ("k", 3) not in c
    # the network uses it
    net = _net(3)
    assert isinstance(net._step_cache, _LRUCache)


def test_eprop_hyperparams_keep_f32_precision_with_bf16_readout():
    """With a bfloat16 readout, the smoothing constants must not be
    quantized to bf16 (epsilon=0.99 -> 0.98828 shifts 1-epsilon by ~17%):
    the traces are carried in f32 (ADVICE r3)."""
    n, m, T = 6, 2, 30
    rng = np.random.default_rng(7)
    W0 = rng.normal(size=(n, n)) * 0.3
    Wout0 = rng.random((m, n)) * 0.1
    inp = rng.normal(size=(T, n)).astype(np.float32)
    tgt = (rng.normal(size=(T, m)) * 0.1).astype(np.float32)

    def build(dtype):
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("rnn", TANH, weights=W0, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_func_node("out", m, activation_function="identity")
        net.add_edge("rnn", "out", weights=jnp.asarray(Wout0, dtype=dtype),
                     train="eprop")
        return net

    A = build(jnp.float32)
    B = build(jnp.bfloat16)
    A.fit_eprop(inp, tgt, epsilon=0.99, delta=0.9, update_steps=1, verbose=False)
    B.fit_eprop(inp, tgt, epsilon=0.99, delta=0.9, update_steps=1, verbose=False)
    wA = np.asarray(A.get_edge("rnn", "out").weights, dtype=np.float64)
    wB = np.asarray(B.get_edge("rnn", "out").weights.astype(jnp.float32),
                    dtype=np.float64)
    # bf16 storage rounds W, but the trajectory must track f32 closely --
    # with bf16-quantized hyperparameters the update path itself is wrong
    assert np.corrcoef(wA.ravel(), wB.ravel())[0, 1] > 0.99


def test_feedback_pop_edge_after_compile():
    """Feedback edges move into _fb_graph at compile(); pop_edge must still
    find and remove them (regression: NetworkXError 'edge not in graph')."""
    from rectipy_tpu import FeedbackNetwork

    n = 4
    net = FeedbackNetwork(1e-2, dtype=jnp.float64)
    for lbl in ("a", "b"):
        net.add_diffeq_node(lbl, TANH, weights=np.zeros((n, n)),
                            input_var="li_op/I_ext", output_var="li_op/v",
                            source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_edge("a", "b", weights=np.eye(n))
    net.add_edge("b", "a", weights=np.eye(n) * 0.5, feedback=True)
    net.compile()
    edge = net.pop_edge("b", "a")
    assert edge is not None
    with pytest.raises(KeyError):
        net.get_edge("b", "a")
    # the pruned network recompiles and runs as a pure feedforward chain
    obs = net.run(np.zeros((5, n)), verbose=False)
    assert obs.to_numpy("out").shape[0] == 5
    # feedforward edges still pop through the base path
    assert net.pop_edge("a", "b") is not None


def test_set_var_missing_node_message():
    net = _net(3)
    with pytest.raises(KeyError, match="does not exist"):
        net.set_var("typo_node", "v", 1.0)
    with pytest.raises(KeyError, match="was not found"):
        net.set_var("rnn", "typo_var", 1.0)


def test_native_random_connectivity_honors_rng():
    """backend='native' must derive its seed from a provided rng
    (regression: the seed was silently pinned to 0, making every
    'independently seeded' reservoir byte-identical)."""
    pytest.importorskip("rectipy_tpu.native")
    from rectipy_tpu.utility import random_connectivity

    try:
        A = random_connectivity(32, 32, 0.25, rng=np.random.default_rng(1),
                                backend="native")
        B = random_connectivity(32, 32, 0.25, rng=np.random.default_rng(2),
                                backend="native")
        A2 = random_connectivity(32, 32, 0.25, rng=np.random.default_rng(1),
                                 backend="native")
    except (OSError, RuntimeError) as e:  # no compiled sampler in this env
        pytest.skip(f"native sampler unavailable: {e}")
    assert not np.array_equal(A, B), "different rngs produced identical connectivity"
    np.testing.assert_array_equal(A, A2)  # same rng stream -> deterministic


def test_phase_timer_syncs_on_result_handle():
    timer = PhaseTimer()
    with timer.phase("work") as ph:
        ph.result = jnp.sum(jnp.ones(64))
    assert timer.counts["work"] == 1
    # without a handle the phase still records (dispatch-only time)
    with timer.phase("nohandle"):
        _ = jnp.ones(3)
    assert timer.counts["nohandle"] == 1


def test_observer_spectrum_peak_and_grid():
    """Welch PSD peaks at the driven frequency; the frequency axis derives
    from the RECORD grid (downsampling halves the Nyquist, not the peak);
    irregular grids raise."""
    from rectipy_tpu.inputs import Sine

    n, dt, f0 = 4, 1e-3, 25.0
    net = _net(n)
    # strong sinusoidal drive -> v oscillates at f0
    spec = Sine(8000, channels=n, freq=f0, amp=5.0)
    net2 = Network(dt, dtype=jnp.float64)
    net2.add_diffeq_node("rnn", TANH, weights=np.zeros((n, n)),
                         input_var="li_op/I_ext", output_var="li_op/v",
                         source_var="tanh_op/r", target_var="li_op/r_in",
                         node_vars={"li_op/tau": 0.01})
    obs = net2.run(spec, sampling_steps=1, cutoff=1000, verbose=False)
    freqs, psd = obs.spectrum(nperseg=1024)
    assert abs(freqs[np.argmax(psd)] - f0) < freqs[1] - freqs[0] + 1e-9
    # downsampled recording: fs = 1/(dt*sampling), peak still at f0
    obs2 = net2.run(spec, sampling_steps=4, cutoff=1000, verbose=False)
    freqs2, psd2 = obs2.spectrum(nperseg=512)
    assert freqs2[-1] == pytest.approx(0.5 / (dt * 4))
    assert abs(freqs2[np.argmax(psd2)] - f0) < freqs2[1] - freqs2[0] + 1e-9
    # per-channel shape
    _, psd_pc = obs2.spectrum(nperseg=128, per_channel=True)
    assert psd_pc.ndim == 2 and psd_pc.shape[1] == n
    # irregular grid (two chunks with different sampling) raises
    net3 = _net(n)
    o = net3.run(np.ones((20, n)), sampling_steps=5, verbose=False)
    net3.run(np.ones((21, n)), sampling_steps=7, verbose=False, obs=o)
    with pytest.raises(ValueError, match="evenly spaced"):
        o.spectrum()
    with pytest.raises(ValueError, match="two recorded"):
        Observer(dt=0.1).spectrum()


def test_observer_spectrum_rejects_mismatched_extras():
    """Review regression: save()d extras have their own sampling -- the
    record grid says nothing about their sample rate."""
    n = 2
    net = _net(n)
    obs = net.run(np.ones((40, n)), sampling_steps=2, verbose=False)
    obs.save("filtered", np.random.default_rng(0).normal(size=(7, n)))
    with pytest.raises(ValueError, match="rows"):
        obs.spectrum("filtered")


def test_observer_coherence_shared_rhythm():
    """Two channels driven by the same sine + independent noise cohere at
    the drive frequency and not in the noise floor."""
    from rectipy_tpu.inputs import Noise, Sine

    n, dt, f0 = 2, 1e-3, 20.0
    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=np.zeros((n, n)),
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        node_vars={"li_op/tau": 0.02})
    drive = Sine(16000, channels=n, freq=f0, amp=2.0) \
        + Noise(16000, channels=n, scale=3.0, seed=5)
    obs = net.run(drive, sampling_steps=1, cutoff=1000, verbose=False,
                  record_vars=[("rnn", "v", False)])
    v = obs.to_numpy(("rnn", "v"))
    freqs, cxy = obs.coherence(("rnn", "v"), ("rnn", "v"), nperseg=1024)
    np.testing.assert_allclose(cxy, 1.0, atol=1e-9)  # self-coherence
    # DISCRIMINATING case: the two channels share only the sine (their
    # noise streams are independent) -> coherent at f0, incoherent in the
    # noise floor.  Saved single-channel extras are valid grid recordings.
    obs.save("ch0", v[:, :1])
    obs.save("ch1", v[:, 1:])
    freqs, cxy = obs.coherence("ch0", "ch1", nperseg=1024)
    i0 = np.argmin(np.abs(freqs - f0))
    assert cxy[i0] > 0.8, f"shared drive must cohere at f0: {cxy[i0]}"
    floor = np.median(cxy[freqs > 3 * f0])
    assert floor < 0.3, f"independent noise must not cohere off-peak: {floor}"
    # mismatched-extra and irregular-grid guards
    obs.save("x", np.zeros((5, 1)))
    with pytest.raises(ValueError, match="rows"):
        obs.coherence("out", "x")


def test_observer_xcorr_recovers_lag():
    """xcorr peaks at the imposed shift with the documented sign (positive
    lag = first argument LEADS the second), and the zero-lag
    autocorrelation is exactly 1."""
    from rectipy_tpu import Observer

    dt, T, d = 1e-3, 512, 7
    rng = np.random.default_rng(0)
    base = rng.normal(size=T + d)
    a, b = base[d:], base[:-d]   # b[t] = a[t - d]: a leads b by d steps
    obs = Observer(dt=dt, record_output=False, record_loss=False)
    obs.record_batch(np.arange(0, 2 * T, 2),
                     var_values={("x", "a"): a[:, None], ("x", "b"): b[:, None]})
    lags, corr = obs.xcorr(("x", "a"), ("x", "a"), max_lag=20)
    i0 = np.argmin(np.abs(lags))
    np.testing.assert_allclose(corr[i0], 1.0, atol=1e-12)  # Pearson norm
    lags, corr = obs.xcorr(("x", "a"), ("x", "b"), max_lag=20)
    # record grid spacing is 2 steps of dt -> peak at +d * 2 * dt
    np.testing.assert_allclose(lags[np.argmax(corr)], d * 2 * dt)
    assert corr.max() > 0.95
    # guards: row mismatch and constant signal
    obs.save("short", np.zeros((5, 1)))
    with pytest.raises(ValueError, match="rows"):
        obs.xcorr(("x", "a"), "short")
    obs.record_batch(np.asarray([2 * T + 5]),  # irregular grid from here on
                     var_values={("x", "a"): a[:1, None], ("x", "b"): b[:1, None]})
    with pytest.raises(ValueError, match="evenly spaced|rows"):
        obs.xcorr(("x", "a"), ("x", "b"))


def test_network_describe_summary():
    """describe(): architecture summary names every node and edge, flags
    trainables and plasticity carry, and totals the parameters."""
    from rectipy_tpu import FeedbackNetwork

    rng = np.random.default_rng(0)
    n = 6
    net = FeedbackNetwork(1e-3, dtype=jnp.float64)
    net.add_diffeq_node("exc", "neuron_model_templates.spiking_neurons.qif.qif",
                        weights=rng.normal(size=(n, n)) * 0.01, source_var="s",
                        target_var="s_in", input_var="I_ext", output_var="s",
                        op="qif_op", spike_var="spike", reset_var="v")
    net.add_func_node("out", n, activation_function="tanh")
    net.add_edge("exc", "out", weights=rng.normal(size=(n, n)), train="gd")
    net.add_edge("out", "exc", weights=rng.normal(size=(n, n)) * 0.05,
                 feedback=True, train="stdp", w_min=0.0, w_max=1.0)
    text = net.describe()
    assert "exc: SpikeResetNet" in text and "out: InstantNode" in text
    assert "exc -> out" in text and "train=['weights']" in text
    assert "[feedback]" in text and "STDP" in text
    assert "x_pre" in text  # plasticity carry listed
    assert "trainable" in text and "MB params+state" in text
    # totals count the two (n, n) edges + node params
    import re
    total = int(re.search(r"totals: ([\d,]+) parameters",
                          text).group(1).replace(",", ""))
    assert total >= 2 * n * n


def test_observer_fc():
    """Functional-connectivity matrix: Pearson correlations on the record
    grid; anti-phase -> -1, uncorrelated -> ~0, constant channel -> NaN."""
    from rectipy_tpu.observer import Observer

    rng = np.random.default_rng(0)
    T = 4000
    t = np.arange(T)
    a = np.sin(2 * np.pi * t / 100)
    obs = Observer(dt=1e-3, record_output=True, record_loss=False)
    sig = np.stack([a, -a, rng.normal(size=T), np.zeros(T)], axis=1)
    obs.record_batch(np.arange(T), outputs=sig)
    C = obs.fc("out")
    assert C.shape == (4, 4)
    np.testing.assert_allclose(np.diag(C)[:3], 1.0, atol=1e-12)
    np.testing.assert_allclose(C[0, 1], -1.0, atol=1e-12)
    assert abs(C[0, 2]) < 0.1
    assert np.isnan(C[3, 0]) and np.isnan(C[3, 3])  # constant channel

    import pytest as _pytest
    with _pytest.raises(ValueError):
        Observer(dt=1e-3).fc("out")  # nothing recorded / single channel
