"""On-device input specs (rectipy_tpu.inputs): parity vs dense arrays.

The reference only accepts host-materialized (T, m) arrays
(/root/reference/rectipy/network.py:542-571); specs are the TPU-native
equivalent (inputs computed inside the scan, zero host->device transfer).
Every spec must evaluate to exactly what ``materialize()`` returns, and a
spec-driven run must match the run fed the materialized array.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from rectipy_tpu import Network
from rectipy_tpu.inputs import Constant, Noise, Poisson, Pulse, Sine, Sum

LI = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
N, T = 24, 200
DT = 1e-3


def _build(train=False):
    W = np.random.default_rng(0).normal(size=(N, N)) / N
    net = Network(DT, dtype=jnp.float64)
    net.add_diffeq_node("t", LI, weights=W, source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="li_op/v",
                        train_params=["weights"] if train else None)
    return net


def _spec():
    return (Pulse(T, channels=N, t_on=20, t_off=150, amp=1.5)
            + Sine(T, channels=N, freq=3.0, amp=0.5, phase=0.3)
            + Noise(T, channels=N, scale=0.3, seed=4))


def test_materialize_shapes_and_values():
    dense = _spec().materialize(DT, dtype=np.float64)
    assert dense.shape == (T, N) and dense.dtype == np.float64
    # pulse window + sine + noise actually contribute
    p = Pulse(T, channels=1, t_on=5, t_off=9, amp=2.0).materialize(DT)
    np.testing.assert_array_equal(p[:5], 0.0)
    np.testing.assert_array_equal(p[5:9], 2.0)
    np.testing.assert_array_equal(p[9:], 0.0)
    c = Constant(T, channels=3, value=np.array([1.0, 2.0, 3.0])).materialize(DT)
    np.testing.assert_array_equal(c, np.tile([1.0, 2.0, 3.0], (T, 1)))
    s = Sine(T, channels=1, freq=2.0, amp=1.0).materialize(DT, np.float64)
    t = np.arange(T) * DT
    np.testing.assert_allclose(s[:, 0], np.sin(2 * np.pi * 2.0 * t), atol=1e-12)
    u = Noise(T, channels=2, scale=1.0, seed=1, dist="uniform").materialize(DT)
    assert (u >= -1.0).all() and (u < 1.0).all()


def test_poisson_statistics_and_parity():
    rate, steps = 40.0, 4000
    spec = Poisson(steps, channels=8, rate=rate, seed=2)
    dense = spec.materialize(DT)
    # events are 0 or 1/dt
    vals = np.unique(dense)
    assert set(np.round(vals, 6)) <= {0.0, np.round(1.0 / DT, 6)}
    # empirical rate ~ rate (Binomial(steps, rate*dt) per channel)
    emp = (dense > 0).mean(axis=0) / DT
    assert np.all(np.abs(emp - rate) < 5 * np.sqrt(rate / (steps * DT)))
    # per-trial realizations differ, same-seed trials match run()'s stream
    b = Poisson(200, channels=4, rate=rate, seed=np.array([3, 4]))
    db = b.materialize(DT)
    assert db.shape == (2, 200, 4)
    assert np.abs(db[0] - db[1]).max() > 0
    np.testing.assert_array_equal(db[0], Poisson(200, channels=4, rate=rate,
                                                 seed=3).materialize(DT))
    # spec-driven run == dense-driven run
    o1 = _build().run(Poisson(T, channels=N, rate=rate, seed=5),
                      sampling_steps=5, verbose=False)
    o2 = _build().run(Poisson(T, channels=N, rate=rate, seed=5).materialize(DT, np.float64),
                      sampling_steps=5, verbose=False)
    np.testing.assert_allclose(o1.to_numpy("out"), o2.to_numpy("out"),
                               rtol=1e-12, atol=1e-12)


def test_run_windowed_matches_dense():
    spec = _spec()
    dense = spec.materialize(DT, dtype=np.float64)
    o1 = _build().run(spec, sampling_steps=7, cutoff=13, verbose=False,
                      record_vars=[("t", "v", False)])
    o2 = _build().run(dense, sampling_steps=7, cutoff=13, verbose=False,
                      record_vars=[("t", "v", False)])
    # different XLA programs (in-scan eval vs array read) may fuse float ops
    # differently: tight tolerance, not bit equality
    np.testing.assert_allclose(o1.to_numpy("out"), o2.to_numpy("out"),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(o1.to_numpy(("t", "v")), o2.to_numpy(("t", "v")),
                               rtol=1e-12, atol=1e-14)
    # same spec twice = the same program and stream = bit-identical
    o3 = _build().run(spec, sampling_steps=7, cutoff=13, verbose=False)
    np.testing.assert_array_equal(o3.to_numpy("out"), o1.to_numpy("out"))


def test_run_generic_path_matches_dense():
    spec = _spec()
    dense = spec.materialize(DT, dtype=np.float64)
    o1 = _build().run(spec, sampling_steps=7, verbose=False, truncate_steps=40)
    o2 = _build().run(dense, sampling_steps=7, verbose=False, truncate_steps=40)
    np.testing.assert_allclose(o1.to_numpy("out"), o2.to_numpy("out"),
                               rtol=1e-12, atol=1e-14)


def test_single_channel_broadcast():
    spec = Pulse(T, channels=1, t_on=10, t_off=60, amp=2.0)
    o1 = _build().run(spec, sampling_steps=5, verbose=False)
    o2 = _build().run(spec.materialize(DT, np.float64), sampling_steps=5,
                      verbose=False)
    np.testing.assert_allclose(o1.to_numpy("out"), o2.to_numpy("out"),
                               rtol=1e-12, atol=1e-14)


def test_run_batch_per_trial_noise():
    B = 4
    spec = (Noise(T, channels=N, scale=0.5, seed=np.arange(B))
            + Pulse(T, channels=N, t_on=20, t_off=150, amp=1.5))
    res = _build().run_batch(spec, sampling_steps=5, cutoff=10,
                             record_vars=[("t", "v", True)])
    assert res["out"].shape[0] == B
    for b in range(B):
        sb = (Noise(T, channels=N, scale=0.5, seed=int(b))
              + Pulse(T, channels=N, t_on=20, t_off=150, amp=1.5))
        ob = _build().run(sb, sampling_steps=5, cutoff=10, verbose=False,
                          record_vars=[("t", "v", True)])
        np.testing.assert_allclose(res["out"][b], ob.to_numpy("out"),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(res[("t", "v")][b], ob.to_numpy(("t", "v")),
                                   rtol=1e-12, atol=1e-14)
    assert np.abs(res["out"][0] - res["out"][1]).max() > 1e-6  # distinct streams


def test_run_batch_shared_spec_with_batch_vars():
    etas = np.linspace(-2, 2, 4)
    spec = Pulse(T, channels=N, t_on=0, t_off=T, amp=1.0)
    res = _build().run_batch(spec, batch_vars={("t", "li_op/eta"): etas},
                             sampling_steps=5)
    dense = np.broadcast_to(spec.materialize(DT, np.float64), (4, T, N)).copy()
    ref = _build().run_batch(dense, batch_vars={("t", "li_op/eta"): etas},
                             sampling_steps=5)
    np.testing.assert_allclose(res["out"], ref["out"], rtol=1e-12, atol=1e-14)


def test_run_mesh_matches_single_device():
    spec = _spec()
    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("model",))
    o1 = _build().run(spec, sampling_steps=7, verbose=False, mesh=mesh)
    o2 = _build().run(spec, sampling_steps=7, verbose=False)
    np.testing.assert_allclose(o1.to_numpy("out"), o2.to_numpy("out"),
                               rtol=1e-12, atol=1e-14)


def test_run_batch_mesh_data_sharded():
    B = 4
    spec = Noise(T, channels=N, scale=0.5, seed=np.arange(B))
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))
    res = _build().run_batch(spec, sampling_steps=5, mesh=mesh)
    ref = _build().run_batch(spec, sampling_steps=5)
    np.testing.assert_allclose(res["out"], ref["out"], rtol=1e-12, atol=1e-14)


def test_stochastic_parts_draw_independent_streams():
    # Noise(seed=0) + Poisson(seed=0) (class defaults) must NOT consume the
    # same random bits: streams are domain-separated per class and per
    # position in a Sum
    steps = 2000
    noise = Noise(steps, channels=1, scale=1.0, seed=0)
    pois = Poisson(steps, channels=1, rate=100.0, amp=1.0, seed=0)  # p = 0.1/step
    both = (pois + noise).materialize(DT, np.float64)
    events = both[:, 0] > 500.0  # Poisson spikes are 1/dt = 1000 >> noise
    n_on = both[events, 0] - 1.0 / DT  # the noise draw on spike steps
    n_off = both[~events, 0]
    assert events.sum() > 100
    # independent streams: noise on spike steps is NOT biased (a shared
    # stream makes every spike coincide with an extreme-negative draw)
    assert abs(n_on.mean() - n_off.mean()) < 0.2
    # two same-seed Noise parts must not collapse into one scaled stream
    double = (Noise(steps, channels=1, scale=1.0, seed=0)
              + Noise(steps, channels=1, scale=1.0, seed=0)).materialize(DT)
    single = Noise(steps, channels=1, scale=2.0, seed=0).materialize(DT)
    assert not np.allclose(double, single)
    assert abs(double.std() / np.sqrt(2.0) - 1.0) < 0.1  # var adds, not amp


def test_shifted_specs_continue_chunked_runs():
    # state carries across run() calls; shifted specs continue the DRIVE in
    # global time too, so two chunks == one long run
    T1 = 100
    full = (Pulse(T, channels=N, t_on=50, t_off=180, amp=1.0)
            + Sine(T, channels=N, freq=2.0, amp=0.3)
            + Noise(T, channels=N, scale=0.4, seed=6))
    chunk = (Pulse(T1, channels=N, t_on=50, t_off=180, amp=1.0)
             + Sine(T1, channels=N, freq=2.0, amp=0.3)
             + Noise(T1, channels=N, scale=0.4, seed=6))
    # the shifted chunk evaluates at global steps [T1, 2*T1)
    d_full = full.materialize(DT, np.float64)
    d_chunks = np.concatenate([chunk.materialize(DT, np.float64),
                               chunk.shifted(T1).materialize(DT, np.float64)])
    np.testing.assert_allclose(d_chunks, d_full, rtol=1e-12, atol=1e-14)
    # end state of the chunked network run == end state of the one-shot run
    net_a, net_b = _build(), _build()
    net_a.run(full, sampling_steps=10, verbose=False)
    net_b.run(chunk, sampling_steps=10, verbose=False)
    net_b.run(chunk.shifted(T1), sampling_steps=10, verbose=False)
    ya = np.asarray(net_a.get_node("t").y)
    yb = np.asarray(net_b.get_node("t").y)
    np.testing.assert_allclose(yb, ya, rtol=1e-11, atol=1e-13)


def test_pulse_rejects_negative_bounds():
    with pytest.raises(ValueError, match="Pulse bounds"):
        Pulse(100, t_on=0, t_off=-10).build(DT, jnp.float64)
    with pytest.raises(ValueError, match="Pulse bounds"):
        Pulse(100, t_on=-5, t_off=50).build(DT, jnp.float64)
    # the documented sentinel still means "until the end"
    p = Pulse(10, t_on=2, t_off=-1, amp=1.0).materialize(DT)
    np.testing.assert_array_equal(p[2:, 0], 1.0)


def test_spec_with_feedback_network():
    # feedback edges carry previous-step outputs in the scan state; the
    # spec-mode body must compose with that carry identically to array mode
    from rectipy_tpu import FeedbackNetwork

    Wa = np.random.default_rng(0).normal(size=(N, N)) / N
    Wb = np.random.default_rng(1).normal(size=(N, N)) / N
    Wab = np.random.default_rng(3).normal(size=(N, N)) * 0.5
    Wfb = np.random.default_rng(2).normal(size=(N, N)) * 0.1

    def build():
        net = FeedbackNetwork(DT, dtype=jnp.float64)
        for label, W in (("a", Wa), ("b", Wb)):
            net.add_diffeq_node(label, LI, weights=W, source_var="tanh_op/r",
                                target_var="li_op/r_in", input_var="li_op/I_ext",
                                output_var="li_op/v")
        net.add_edge("a", "b", weights=Wab)
        net.add_edge("b", "a", feedback=True, weights=Wfb)
        return net

    spec = (Pulse(T, channels=N, t_on=10, t_off=100, amp=1.0)
            + Noise(T, channels=N, scale=0.2, seed=3))
    o1 = build().run(spec, sampling_steps=5, verbose=False)
    o2 = build().run(spec.materialize(DT, np.float64), sampling_steps=5, verbose=False)
    np.testing.assert_allclose(o1.to_numpy("out"), o2.to_numpy("out"),
                               rtol=1e-12, atol=1e-13)
    assert np.abs(o1.to_numpy("out")).max() > 1e-3


def test_spec_errors():
    with pytest.raises(ValueError, match="unbatched"):  # batched spec to run()
        _build().run(Noise(T, channels=N, seed=np.arange(3)), verbose=False)
    with pytest.raises(ValueError, match="batch_vars"):  # no B derivable
        _build().run_batch(Pulse(T, channels=N, amp=1.0))
    with pytest.raises(ValueError, match="channels"):
        _build().run(Pulse(T, channels=N + 1, amp=1.0), verbose=False)
    with pytest.raises(ValueError, match="steps"):
        Pulse(100, channels=1) + Pulse(200, channels=1)
    with pytest.raises(ValueError, match="channels"):
        Pulse(T, channels=2) + Pulse(T, channels=3)
    with pytest.raises(ValueError, match="batch size"):
        Noise(T, seed=np.arange(2)) + Noise(T, seed=np.arange(3))
    with pytest.raises(ValueError, match="dist"):
        Noise(T, dist="poisson").build(DT, jnp.float64)


def test_trainers_reject_specs_with_guidance():
    net = _build(train=True)
    with pytest.raises(TypeError, match="materialize"):
        net.fit_bptt(Pulse(T, channels=N, amp=1.0), np.zeros((T, N)))
    # and the documented escape hatch works
    dense = Pulse(T, channels=N, amp=0.1).materialize(DT, np.float64)
    obs = net.fit_bptt([dense], [np.zeros((T, N))], optimizer="adam", lr=1e-3,
                       verbose=False)
    assert np.isfinite(obs["epoch_loss"]).all()


def test_wiener_euler_maruyama_statistics():
    """Wiener emits sigma/sqrt(dt)*z: per-step stats, dt-invariant integral,
    and an end-to-end OU stationary variance through Network.run."""
    from rectipy_tpu.inputs import Wiener

    sigma, drift = 0.5, 0.2
    x = Wiener(2000, channels=16, sigma=sigma, drift=drift,
               seed=11).materialize(1e-3, np.float64)
    np.testing.assert_allclose(x.std(), sigma / np.sqrt(1e-3), rtol=0.05)
    np.testing.assert_allclose(x.mean(), drift,
                               atol=5 * x.std() / np.sqrt(x.size))
    # Var[ integral_0^T sigma dW ] = sigma^2 * T independent of dt (the
    # defining property Noise lacks: its integral vanishes as dt -> 0)
    T_total = 1.0
    for dt in (1e-3, 4e-3):
        steps = int(round(T_total / dt))
        paths = Wiener(steps, channels=2048, sigma=sigma,
                       seed=3).materialize(dt, np.float64)
        var = (paths.sum(axis=0) * dt).var()
        np.testing.assert_allclose(var, sigma**2 * T_total, rtol=0.15)
    # per-trial paths: (B,) seeds differ and match the scalar-seed stream
    b = Wiener(100, channels=4, sigma=sigma, seed=np.array([3, 4]))
    db = b.materialize(1e-3, np.float64)
    assert db.shape == (2, 100, 4) and np.abs(db[0] - db[1]).max() > 0
    np.testing.assert_array_equal(
        db[0], Wiener(100, channels=4, sigma=sigma, seed=3).materialize(1e-3, np.float64))


def test_wiener_ou_stationary_variance():
    """li_op with zero coupling driven by Wiener(sigma) IS an OU process:
    v' = -v/tau + sigma*xi, stationary Var[v] = sigma^2 * tau / 2."""
    from rectipy_tpu.inputs import Wiener

    tau, sigma, dt, n, steps = 0.02, 1.0, 1e-3, 64, 40_000
    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("ou", LI, weights=np.zeros((n, n)),
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        input_var="li_op/I_ext", output_var="li_op/v",
                        node_vars={"li_op/tau": tau})
    obs = net.run(Wiener(steps, channels=n, sigma=sigma, seed=7),
                  sampling_steps=1, cutoff=10_000, verbose=False)
    v = obs.to_numpy("out")
    # Euler-discretized OU: Var = sigma^2*dt / (1 - (1 - dt/tau)^2)
    expect = sigma**2 * dt / (1.0 - (1.0 - dt / tau) ** 2)
    np.testing.assert_allclose(v.var(), expect, rtol=0.1)
    assert abs(expect - sigma**2 * tau / 2) / expect < 0.03  # ~ the SDE value
