"""Spike-raster recording (`record_spikes=`): per-window spike counts.

No reference analog -- the reference Observer samples state variables only
(/root/reference/rectipy/observer.py:79-105); spike events between samples
are invisible there.  Here the scan accumulates the node's own per-step
spike decision (recomputed from the pre-update state) into per-window
counts, so rasters / PSTHs come out of one compiled program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network

QIF = "rectipy_tpu.models.spiking_neurons.qif.qif_sfa"
# dt chosen so the suprathreshold QIF period (~pi/sqrt(eta_eff) time units)
# spans a few dozen steps -- several spikes per neuron inside T
N, T, DT = 16, 300, 1e-2


def _build(reset=True):
    rng = np.random.default_rng(0)
    W = rng.normal(size=(N, N)).astype(np.float64) * 0.1 / N
    etas = 3.0 + np.random.default_rng(1).normal(size=N)
    net = Network(DT, dtype=jnp.float64)
    if reset:  # framework-managed hard reset (SpikeResetNet)
        net.add_diffeq_node(
            "qif", QIF, weights=W, source_var="s", target_var="s_in",
            input_var="I_ext", output_var="s", spike_var="spike", spike_def="v",
            op="qif_sfa_op", spike_threshold=10.0, spike_reset=-10.0,
            node_vars={"all/qif_sfa_op/eta": etas})
    else:  # intrinsic in-equation reset (SpikeNet)
        net.add_diffeq_node(
            "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_reset", weights=W,
            source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
            spike_var="spike", reset_var="reset", reset=False, spike_def="v",
            op="qif_reset_op", spike_threshold=10.0, spike_reset=-10.0,
            node_vars={"all/qif_reset_op/eta": etas})
    return net


def _oracle_counts(net, inp, s):
    """Eager-stepping oracle: spike at step t iff v_pre >= threshold; counts
    summed into the same windows the scan records (buffer-then-record)."""
    node = net.get_node("qif")
    lo, hi = node._reset_lo, node._reset_hi
    counts, buf = [], np.zeros(hi - lo)
    for t in range(inp.shape[0]):
        v_pre = np.asarray(node.y[lo:hi])
        buf = buf + (v_pre >= 10.0)
        net.forward(inp[t])
        if t % s == 0:
            counts.append(buf)
            buf = np.zeros(hi - lo)
    return np.stack(counts)


def test_windowed_counts_match_eager_oracle():
    s = 7
    inp = np.full((T, N), 15.0)
    obs = _build().run(inp, sampling_steps=s, verbose=False, record_spikes=["qif"])
    counts = obs.to_numpy(("qif", "spikes"))
    assert counts.dtype == np.int32 and counts.shape[1] == N
    oracle = _oracle_counts(_build(), inp, s)
    np.testing.assert_array_equal(counts, oracle)
    assert counts.sum() > 0, "expected spikes in the suprathreshold regime"


def test_generic_path_matches_windowed():
    inp = np.full((T, N), 15.0)
    o1 = _build().run(inp, sampling_steps=5, verbose=False, record_spikes=["qif"])
    o2 = _build().run(inp, sampling_steps=5, verbose=False, record_spikes=["qif"],
                      truncate_steps=50)  # forces the generic scan
    np.testing.assert_array_equal(o1.to_numpy(("qif", "spikes")),
                                  o2.to_numpy(("qif", "spikes")))


def test_cutoff_and_sampling_alignment():
    s, cutoff = 10, 95
    inp = np.full((T, N), 15.0)
    full = _build().run(inp, sampling_steps=s, verbose=False, record_spikes=["qif"])
    cut = _build().run(inp, sampling_steps=s, cutoff=cutoff, verbose=False,
                       record_spikes=["qif"])
    f, c = full.to_numpy(("qif", "spikes")), cut.to_numpy(("qif", "spikes"))
    # records at steps >= cutoff survive; the first surviving window may
    # straddle the cutoff (its pre-cutoff steps are masked out)
    steps = full.to_numpy("steps")
    kept = steps >= cutoff
    np.testing.assert_array_equal(c[1:], f[kept][1:])
    assert (c[0] <= f[kept][0]).all()  # straddling window: masked subset


def test_run_batch_and_total_rate():
    B, s = 3, 5
    inp = np.stack([np.full((T, N), a) for a in (12.0, 15.0, 18.0)])
    res = _build().run_batch(inp, sampling_steps=s, record_spikes=["qif"])
    counts = res[("qif", "spikes")]
    assert counts.shape[0] == B and counts.dtype == np.int32
    for b, a in enumerate((12.0, 15.0, 18.0)):
        ob = _build().run(inp[b], sampling_steps=s, verbose=False,
                          record_spikes=["qif"])
        np.testing.assert_array_equal(counts[b], ob.to_numpy(("qif", "spikes")))
    # stronger drive -> more spikes (rate increases with input)
    totals = counts.sum(axis=(1, 2))
    assert totals[0] < totals[2]


def test_intrinsic_reset_spikenet_counts():
    inp = np.full((T, N), 15.0)
    net = _build(reset=False)
    obs = net.run(inp, sampling_steps=5, verbose=False, record_spikes=["qif"])
    counts = obs.to_numpy(("qif", "spikes"))
    assert counts.sum() > 0


def test_record_spikes_mesh_matches_single_device():
    from jax.sharding import Mesh

    inp = np.full((T, N), 15.0)
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
    om = _build().run(inp, sampling_steps=5, verbose=False,
                      record_spikes=["qif"], mesh=mesh)
    o0 = _build().run(inp, sampling_steps=5, verbose=False, record_spikes=["qif"])
    np.testing.assert_array_equal(om.to_numpy(("qif", "spikes")),
                                  o0.to_numpy(("qif", "spikes")))


def test_raster_plot_helper():
    import matplotlib
    matplotlib.use("Agg")
    inp = np.full((T, N), 15.0)
    obs = _build().run(inp, sampling_steps=5, verbose=False, record_spikes=["qif"])
    ax = obs.raster("qif")
    assert len(ax.collections) == 1
    n_dots = ax.collections[0].get_offsets().shape[0]
    assert n_dots == (obs.to_numpy(("qif", "spikes")) > 0).sum()
    ax2 = obs.raster("qif", shade=True)
    assert len(ax2.collections) == 1


def test_non_spiking_node_raises():
    net = Network(DT)
    net.add_diffeq_node("li", "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
                        weights=np.eye(4), source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="li_op/v")
    with pytest.raises(ValueError, match="spiking"):
        net.run(np.zeros((10, 4)), record_spikes=["li"], verbose=False)


def test_record_spikes_with_fused_pallas_step():
    """The spike reader works off the state pytree, so raster recording is
    implementation-agnostic: counts with the fused Pallas step attached must
    equal the XLA-path counts (identical state trajectory => identical
    pre-update spike decisions)."""
    from rectipy_tpu.ops.generic_fused import attach_generic_fused_step

    rng = np.random.default_rng(3)
    W32 = np.abs(rng.normal(size=(N, N))).astype(np.float32) * 0.02
    etas32 = (3.0 + np.random.default_rng(1).normal(size=N)).astype(np.float32)

    def build32():
        net = Network(DT, dtype=jnp.float32)
        net.add_diffeq_node(
            "qif", QIF, weights=W32, source_var="s", target_var="s_in",
            input_var="I_ext", output_var="s", spike_var="spike", spike_def="v",
            op="qif_sfa_op", spike_threshold=10.0, spike_reset=-10.0,
            dtype=jnp.float32, node_vars={"all/qif_sfa_op/eta": etas32})
        net.compile()
        return net

    inp = np.full((T, N), 15.0, dtype=np.float32)
    ref = build32().run(inp, sampling_steps=5, verbose=False, record_spikes=["qif"])
    net = build32()
    attach_generic_fused_step(net.get_node("qif"), tile=8, interpret=True)
    fused = net.run(inp, sampling_steps=5, verbose=False, record_spikes=["qif"])
    cf, cr = fused.to_numpy(("qif", "spikes")), ref.to_numpy(("qif", "spikes"))
    assert cr.sum() > 0
    # f32 step-order differences can flip a borderline spike; demand near-
    # identical rasters rather than bit equality
    assert (cf != cr).mean() < 0.01


def test_observer_psth_and_rates_math():
    """psth/rates on synthetic window counts: window widths from the record
    grid (window ENDS at each record step; window 0 starts at step 0)."""
    from rectipy_tpu import Observer

    dt = 1e-3
    obs = Observer(dt=dt, record_output=False, record_loss=False)
    steps = np.asarray([0, 100, 200, 300])
    counts = np.asarray([[1, 0], [5, 10], [0, 20], [10, 0]], dtype=np.int32)
    obs.record_batch(steps, var_values={("pop", "spikes"): counts})

    times, pop_rate = obs.psth("pop")
    np.testing.assert_allclose(times, steps * dt)
    widths = np.asarray([1, 100, 100, 100], dtype=float)
    expected = counts.astype(float) / (widths[:, None] * dt)
    np.testing.assert_allclose(pop_rate, expected.mean(axis=1))
    _, per = obs.psth("pop", per_neuron=True)
    np.testing.assert_allclose(per, expected)

    # rates: total counts over total duration (301 steps)
    np.testing.assert_allclose(
        obs.rates("pop"), counts.sum(axis=0) / (301 * dt))


def test_observer_psth_from_run(qif_net_factory=None):
    """End-to-end: psth from a real run's spike recording equals the rate
    implied by the raw counts."""
    import jax.numpy as jnp

    from rectipy_tpu import Network

    QIF = "neuron_model_templates.spiking_neurons.qif.qif"
    n, T, dt = 8, 400, 1e-3
    rng = np.random.default_rng(4)
    net = Network(dt, dtype=jnp.float32)
    net.add_diffeq_node("qif", QIF, weights=np.zeros((n, n)), source_var="s",
                        target_var="s_in", input_var="I_ext", output_var="s",
                        op="qif_op", spike_var="spike", reset_var="v",
                        node_vars={"all/qif_op/eta": rng.uniform(0.5, 2.0, n)})
    obs = net.run(np.full((T, 1), 150.0), sampling_steps=50, verbose=False,
                  record_spikes=["qif"])
    counts = obs.to_numpy(("qif", "spikes"))
    assert counts.sum() > 0, "population must spike for a meaningful PSTH"
    times, rate = obs.psth("qif")
    widths = np.diff(np.arange(0, T, 50), prepend=-1.0)
    np.testing.assert_allclose(
        rate, (counts / (widths[:, None] * dt)).mean(axis=1), rtol=1e-6)
    assert obs.rates("qif").shape == (n,)


def test_observer_psth_handles_cutoff_and_chunked_runs():
    """Window widths: the first window of each run (and after a cutoff)
    covers only its own step; chunk restarts never produce negative rates."""
    from rectipy_tpu import Observer

    dt = 1e-3
    obs = Observer(dt=dt, record_output=False, record_loss=False)
    # chunk 1 recorded with cutoff: first kept record at step 500
    obs.record_batch(np.asarray([500, 600]),
                     var_values={("pop", "spikes"): np.asarray([[2], [30]])})
    # chunk 2 shares the Observer; its step counter restarts at 0
    obs.record_batch(np.asarray([0, 100]),
                     var_values={("pop", "spikes"): np.asarray([[1], [50]])})
    times, rate = obs.psth("pop")
    widths = np.asarray([1.0, 100.0, 1.0, 100.0])
    expected = np.asarray([2, 30, 1, 50]) / (widths * dt)
    np.testing.assert_allclose(rate, expected)
    assert np.all(rate >= 0)
    # rates: denominator is the covered steps (202), not steps[-1]+1
    np.testing.assert_allclose(obs.rates("pop"),
                               np.asarray([83.0]) / (202 * dt))


def test_observer_npz_round_trip(tmp_path):
    """to_npz/from_npz: recordings (incl. tuple spike keys) and saved extras
    (arrays, dicts, strings) round-trip through disk."""
    import jax.numpy as jnp

    from rectipy_tpu import Network, Observer

    QIF = "neuron_model_templates.spiking_neurons.qif.qif"
    n, T, dt = 4, 200, 1e-3
    net = Network(dt, dtype=jnp.float32)
    net.add_diffeq_node("qif", QIF, weights=np.zeros((n, n)), source_var="s",
                        target_var="s_in", input_var="I_ext", output_var="s",
                        op="qif_op", spike_var="spike", reset_var="v",
                        node_vars={"all/qif_op/eta": 120.0})
    obs = net.run(np.full((T, 1), 10.0, np.float32), sampling_steps=20,
                  record_spikes=["qif"], record_vars=[("qif", "v", True)],
                  verbose=False)
    obs.save("w_out", np.arange(6.0).reshape(2, 3))
    obs.save("fit_info", {"best": 3, "tag": "x"})
    obs.save("label", "hello")
    obs.save("alpha", 0.125)
    obs.save("ragged", [np.zeros((2, 3)), np.zeros((2, 4))])

    path = obs.to_npz(str(tmp_path / "obs"))
    obs2 = Observer.from_npz(path)

    assert obs2.dt == obs.dt
    np.testing.assert_array_equal(obs2.to_numpy("out"), obs.to_numpy("out"))
    np.testing.assert_array_equal(obs2.to_numpy(("qif", "spikes")),
                                  obs.to_numpy(("qif", "spikes")))
    np.testing.assert_array_equal(obs2.to_numpy(("qif", "v")),
                                  obs.to_numpy(("qif", "v")))
    assert obs2["steps"] == obs["steps"]
    np.testing.assert_array_equal(obs2["w_out"], obs["w_out"])
    assert obs2["fit_info"] == {"best": 3, "tag": "x"}
    assert isinstance(obs2["fit_info"], dict)
    assert obs2["label"] == "hello" and isinstance(obs2["label"], str)
    assert obs2["alpha"] == 0.125 and isinstance(obs2["alpha"], float)
    assert obs2["ragged"][1].shape == (2, 4)
    # analysis helpers work on the restored object
    np.testing.assert_allclose(obs2.rates("qif"), obs.rates("qif"))


def test_observer_isi_stats_math():
    """isi_stats on synthetic window counts: inter-window ISIs from the
    record grid, intra-window ISIs as width/count even spread, nan below
    two spikes, Fano = var/mean of window counts."""
    from rectipy_tpu import Observer

    dt = 1e-3
    obs = Observer(dt=dt, record_output=False, record_loss=False)
    steps = np.asarray([0, 10, 20, 30, 40])
    counts = np.asarray([[0, 0, 0, 0],
                         [1, 2, 0, 0],
                         [0, 0, 0, 1],
                         [1, 0, 0, 0],
                         [0, 1, 0, 0]], dtype=np.int32)
    obs.record_batch(steps, var_values={("pop", "spikes"): counts})
    st = obs.isi_stats("pop")
    # neuron 0: spikes in windows ending at steps 10 and 30 -> one ISI
    np.testing.assert_allclose(st["mean_isi"][0], 20 * dt)
    np.testing.assert_allclose(st["cv"][0], 0.0)
    # neuron 1: window 1 holds 2 spikes (intra ISI = 10*dt/2) + inter-window
    # ISI (40-10)*dt -> ISIs [5*dt, 30*dt]
    isis = np.asarray([5 * dt, 30 * dt])
    np.testing.assert_allclose(st["mean_isi"][1], isis.mean())
    np.testing.assert_allclose(st["cv"][1], isis.std() / isis.mean())
    # neuron 2: silent -> nan everywhere (fano needs mean > 0 too)
    assert np.isnan(st["mean_isi"][2]) and np.isnan(st["cv"][2]) \
        and np.isnan(st["fano"][2])
    # neuron 3: single spike -> ISI stats nan, Fano defined
    assert np.isnan(st["mean_isi"][3])
    m = counts[:, 3].mean()
    np.testing.assert_allclose(st["fano"][3], counts[:, 3].var() / m)


def test_observer_isi_stats_regular_spiking_end_to_end():
    """Uncoupled suprathreshold QIF under constant drive fires periodically:
    CV ~ 0 and Fano << 1 at dt-resolution recording."""
    n, T, dt = 4, 2000, 1e-3
    rng = np.random.default_rng(7)
    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node(
        "qif", "neuron_model_templates.spiking_neurons.qif.qif",
        weights=np.zeros((n, n)), source_var="s", target_var="s_in",
        input_var="I_ext", output_var="s", op="qif_op", spike_var="spike",
        reset_var="v", node_vars={"all/qif_op/eta": rng.uniform(1.0, 3.0, n)})
    obs = net.run(np.full((T, 1), 50.0), sampling_steps=1, verbose=False,
                  record_spikes=["qif"])
    st = obs.isi_stats("qif")
    counts = obs.to_numpy(("qif", "spikes"))
    assert (counts.sum(axis=0) >= 3).all(), "every neuron must spike repeatedly"
    assert np.all(st["cv"] < 0.15), f"regular spiking must have low CV: {st['cv']}"
    # fano at dt-resolution windows is ~Bernoulli -> ~1 for ANY process
    # (documented caveat); it must not exceed 1 for 0/1 counts
    assert np.all(st["fano"] <= 1.0 + 1e-9)
    # ISI consistent with the observed rate (1/rate == mean ISI up to edges)
    rates = obs.rates("qif")
    np.testing.assert_allclose(st["mean_isi"], 1.0 / rates, rtol=0.25)


def test_observer_isi_stats_multi_spike_windows_regular_train():
    """A perfectly regular train recorded as exactly 2 spikes per window
    must come out with CV == 0 under the even-spread model (the boundary
    interval accounts for the destination window's first-spike offset)."""
    from rectipy_tpu import Observer

    dt = 1e-3
    obs = Observer(dt=dt, record_output=False, record_loss=False)
    steps = np.arange(0, 50, 10)  # widths [1, 10, 10, 10, 10]
    counts = np.asarray([[0], [2], [2], [2], [2]], dtype=np.int32)
    obs.record_batch(steps, var_values={("pop", "spikes"): counts})
    st = obs.isi_stats("pop")
    # spikes at 5,10 | 15,20 | 25,30 | 35,40 -> every ISI = 5*dt
    np.testing.assert_allclose(st["mean_isi"][0], 5 * dt)
    np.testing.assert_allclose(st["cv"][0], 0.0, atol=1e-12)


def test_observer_isi_stats_chunked_runs_never_bridge_chunks():
    """Chunked calls restart the step counter; ISIs must be computed per
    chunk (never negative, never spanning the unobserved gap)."""
    from rectipy_tpu import Observer

    dt = 1e-3
    obs = Observer(dt=dt, record_output=False, record_loss=False)
    # chunk 1: spikes at steps 10 and 40; chunk 2 restarts at step 0,
    # spikes at steps 10 and 30
    obs.record_batch(np.arange(0, 50, 10),
                     var_values={("pop", "spikes"):
                                 np.asarray([[0], [1], [0], [0], [1]], np.int32)})
    obs.record_batch(np.arange(0, 40, 10),
                     var_values={("pop", "spikes"):
                                 np.asarray([[0], [1], [0], [1]], np.int32)})
    st = obs.isi_stats("pop")
    # ISIs: 30 steps (chunk 1) and 20 steps (chunk 2) -- nothing negative,
    # nothing across the chunk boundary
    isis = np.asarray([30 * dt, 20 * dt])
    np.testing.assert_allclose(st["mean_isi"][0], isis.mean())
    np.testing.assert_allclose(st["cv"][0], isis.std() / isis.mean())
