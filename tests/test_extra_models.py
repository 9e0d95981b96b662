"""Tests for the extra model templates beyond the reference library
(Wilson-Cowan, Montbrio mean-field, theta neuron)."""

import jax.numpy as jnp
import numpy as np

from rectipy_tpu import Network
from rectipy_tpu.dsl import lower


def test_montbrio_vector_field_oracle():
    """MPR mean-field: dr = Delta/(pi tau^2) + 2 r v / tau;
    dv = (v^2+eta)/tau - tau (pi r)^2 + J r."""
    n = 4
    vf = lower("rectipy_tpu.models.mean_field.montbrio.mpr", n=n, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    r = np.abs(rng.normal(size=n)) + 0.1
    v = rng.normal(size=n)
    y = jnp.asarray(np.concatenate([r, v]))
    dy = np.asarray(vf.func(0.0, y, vf.args))
    dr = 1.0 / (np.pi * 1.0) + 2.0 * r * v
    dv = (v ** 2 - 5.0) - (np.pi * r) ** 2 + 15.0 * r
    np.testing.assert_allclose(dy[:n], dr, rtol=1e-12)
    np.testing.assert_allclose(dy[n:], dv, rtol=1e-12)


def test_montbrio_converges_to_fixed_point():
    """Uncoupled MPR relaxes to its known stable focus (finite, r > 0)."""
    n = 3
    net = Network(1e-4, dtype=jnp.float64)
    net.add_diffeq_node("mpr", "rectipy_tpu.models.mean_field.montbrio.mpr",
                        weights=np.zeros((n, n)), source_var="r", target_var="r_in",
                        input_var="I_ext", output_var="r")
    obs = net.run(np.zeros((50_000, n)), sampling_steps=1000, verbose=False)
    r_traj = obs.to_numpy("out")
    assert np.all(np.isfinite(r_traj))
    assert r_traj[-1].min() > 0  # firing rates stay positive
    # settled: last two records close
    np.testing.assert_allclose(r_traj[-1], r_traj[-2], rtol=1e-3)


def test_wilson_cowan_oscillates():
    n = 5
    net = Network(1e-1, dtype=jnp.float64)
    net.add_diffeq_node("wc", "rectipy_tpu.models.rate_neurons.wilson_cowan.wc",
                        weights=np.zeros((n, n)), source_var="e", target_var="r_in",
                        input_var="I_ext", output_var="e",
                        node_vars={"all/wc_op/I_ext": 1.25})
    T = 5000
    inp = np.full((T, n), 1.25)
    obs = net.run(inp, sampling_steps=10, verbose=False)
    e = obs.to_numpy("out")
    assert np.all(np.isfinite(e))
    assert np.all((e >= -0.01) & (e <= 1.01))  # rates bounded by sigmoid saturation
    late = e[len(e) // 2:, 0]
    assert late.max() - late.min() > 0.05, "expected limit-cycle oscillation"


def test_theta_neuron_spikes_and_resets():
    n = 4
    net = Network(1e-3, dtype=jnp.float64)
    net.add_diffeq_node("theta", "rectipy_tpu.models.spiking_neurons.theta.theta",
                        weights=np.zeros((n, n)), source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", spike_var="spike",
                        spike_def="theta", spike_threshold=np.pi, spike_reset=-np.pi,
                        node_vars={"all/theta_op/eta": 1.0})
    obs = net.run(np.zeros((20_000, n)), sampling_steps=100, verbose=False,
                  record_vars=[("theta", "theta", False)])
    s = obs.to_numpy("out")
    th = obs.to_numpy(("theta", "theta"))
    assert s.max() > 0, "theta neuron never spiked"
    assert np.all(np.isfinite(th))
    assert th.max() <= np.pi + 0.5 and th.min() >= -np.pi - 0.5, "phase escaped [-pi, pi]"


def test_fhn_vector_field_oracle_and_oscillation():
    """FitzHugh-Nagumo: dv = v - v^3/3 - w + I; dw = (v + a - b w)/tau;
    relaxation oscillation at I_ext = 0.5."""
    n = 4
    vf = lower("rectipy_tpu.models.rate_neurons.fhn.fhn", n=n, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    v = rng.normal(size=n)
    w = rng.normal(size=n)
    y = jnp.asarray(np.concatenate([v, w]))
    dy = np.asarray(vf.func(0.0, y, vf.args))
    np.testing.assert_allclose(dy[:n], v - v ** 3 / 3.0 - w, rtol=1e-12)
    np.testing.assert_allclose(dy[n:], (v + 0.7 - 0.8 * w) / 12.5, rtol=1e-12)

    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("fhn", "rectipy_tpu.models.rate_neurons.fhn.fhn",
                        weights=np.zeros((n, n)), source_var="v",
                        target_var="r_in", input_var="I_ext", output_var="v")
    T = 20_000
    obs = net.run(np.full((T, n), 0.5), sampling_steps=50, verbose=False)
    tr = obs.to_numpy("out")
    assert np.all(np.isfinite(tr))
    late = tr[len(tr) // 2:, 0]
    assert late.max() - late.min() > 1.0, "expected relaxation oscillation"


def test_kuramoto_two_matvec_identity_and_sync():
    """Kuramoto: the template's cos(th)*(W@sin th) - sin(th)*(W@cos th)
    coupling must equal the pairwise sum_j W_ij sin(th_j - th_i); strong
    global coupling synchronizes the phases (order parameter -> 1)."""
    n = 6
    rng = np.random.default_rng(3)
    W = np.abs(rng.normal(size=(n, n))) * 0.5
    omegas = rng.normal(loc=1.0, scale=0.1, size=n)
    vf = lower("rectipy_tpu.models.rate_neurons.kuramoto.kuramoto", n=n,
               dtype=jnp.float64, edges=[("s_t", "sin_in", W), ("c_t", "cos_in", W)],
               node_vars={"all/kuramoto_op/omega": omegas})
    th = rng.uniform(-np.pi, np.pi, size=n)
    dy = np.asarray(vf.func(0.0, jnp.asarray(th), vf.args))
    oracle = omegas + np.asarray(
        [np.sum(W[i] * np.sin(th - th[i])) for i in range(n)])
    np.testing.assert_allclose(dy, oracle, rtol=1e-10, atol=1e-12)

    K = 4.0
    Wg = np.full((n, n), K / n)
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("kur", "rectipy_tpu.models.rate_neurons.kuramoto.kuramoto",
                        n=n, edges=[("s_t", "sin_in", Wg), ("c_t", "cos_in", Wg)],
                        input_var="I_ext", output_var="theta",
                        node_vars={"all/kuramoto_op/omega": omegas,
                                   "all/kuramoto_op/theta": rng.uniform(-2.0, 2.0, n)})
    obs = net.run(np.zeros((5000, n)), sampling_steps=100, verbose=False)
    th_t = obs.to_numpy("out")

    def order(ths):
        return np.abs(np.exp(1j * ths).mean())

    assert order(th_t[-1]) > 0.95, "strong coupling failed to synchronize"
    assert order(th_t[-1]) > order(th_t[0])


def test_jansen_rit_vector_field_oracle_and_alpha_rhythm():
    """Jansen-Rit neural mass: second-order alpha-kernel dynamics; the
    classic parameterization oscillates around the alpha band under
    constant pyramidal drive."""
    n = 3
    vf = lower("rectipy_tpu.models.mean_field.jansen_rit.jansen_rit", n=n,
               dtype=jnp.float64)
    rng = np.random.default_rng(4)
    psp_p, z_p = rng.normal(size=n) * 1e-3, rng.normal(size=n) * 1e-3
    psp_e, z_e = rng.normal(size=n) * 1e-3, rng.normal(size=n) * 1e-3
    psp_i, z_i = rng.normal(size=n) * 1e-3, rng.normal(size=n) * 1e-3
    y = jnp.asarray(np.concatenate([psp_p, z_p, psp_e, z_e, psp_i, z_i]))
    dy = np.asarray(vf.func(0.0, y, vf.args))
    H_e, H_i, tau_e, tau_i = 3.25e-3, 22.0e-3, 10.0e-3, 20.0e-3
    s_max, r, v0 = 5.0, 560.0, 6.0e-3
    c1, c2, c3, c4 = 135.0, 108.0, 33.75, 33.75
    sig = lambda x: s_max / (1.0 + np.exp(r * (v0 - x)))
    m_py, m_ein, m_iin = sig(psp_e - psp_i), sig(c1 * psp_p), sig(c3 * psp_p)
    expect = np.concatenate([
        z_p, H_e / tau_e * m_py - 2 * z_p / tau_e - psp_p / tau_e ** 2,
        z_e, H_e / tau_e * (c2 * m_ein + 220.0) - 2 * z_e / tau_e - psp_e / tau_e ** 2,
        z_i, H_i / tau_i * c4 * m_iin - 2 * z_i / tau_i - psp_i / tau_i ** 2,
    ])
    np.testing.assert_allclose(dy, expect, rtol=1e-10, atol=1e-14)

    net = Network(1e-4, dtype=jnp.float64)  # dt in seconds
    net.add_diffeq_node("jr", "rectipy_tpu.models.mean_field.jansen_rit.jansen_rit",
                        weights=np.zeros((n, n)), source_var="m_py",
                        target_var="r_in", input_var="I_ext", output_var="v_out")
    T = 20_000  # 2 s
    obs = net.run(np.full((T, n), 220.0), sampling_steps=20, verbose=False)
    v = obs.to_numpy("out")
    assert np.all(np.isfinite(v))
    late = v[len(v) // 2:, 0]
    assert late.max() - late.min() > 1e-3, "expected alpha-band oscillation"
    # dominant frequency in the broad alpha range (6-14 Hz)
    sp = np.abs(np.fft.rfft(late - late.mean()))
    freqs = np.fft.rfftfreq(len(late), d=1e-4 * 20)
    f_dom = freqs[np.argmax(sp)]
    assert 4.0 < f_dom < 16.0, f"dominant frequency {f_dom:.1f} Hz outside alpha-ish band"


def test_adex_fires_and_adapts():
    """AdEx (Brette-Gerstner 2005 regular-spiking defaults): a supra-rheobase
    step current makes the population fire; the adaptation current w ratchets
    up with every spike so inter-spike intervals lengthen (spike-frequency
    adaptation); the clamped exponential keeps everything finite."""
    n = 3
    net = Network(1e-2, dtype=jnp.float64)  # dt in ms
    net.add_diffeq_node("adex", "rectipy_tpu.models.spiking_neurons.adex.adex",
                        weights=np.zeros((n, n)), source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", spike_var="spike",
                        reset_var="v", spike_threshold=0.0, spike_reset=-70.6)
    T = 50_000  # 500 ms
    obs = net.run(np.full((T, n), 700.0), sampling_steps=100, verbose=False,
                  record_vars=[("adex", "w", False), ("adex", "v", False)],
                  record_spikes=["adex"])
    s = obs.to_numpy("out")
    w = obs.to_numpy(("adex", "w"))
    v = obs.to_numpy(("adex", "v"))
    counts = obs.to_numpy(("adex", "spikes"))  # (records, n) per-window counts
    assert np.all(np.isfinite(s)) and np.all(np.isfinite(w)) and np.all(np.isfinite(v))
    assert counts.sum() > 3 * n, "AdEx at 700 pA should fire repeatedly"
    assert w.max() > 50.0, "adaptation current never charged"
    # spike-frequency adaptation: later spikes are sparser than the onset burst
    half = counts.shape[0] // 2
    assert counts[:half, 0].sum() > counts[half:, 0].sum(), \
        "expected adapting (decelerating) spike train"
    # sub-threshold clamp never engages: v stays near-physiological between spikes
    assert v.min() > -90.0


def test_adex_below_rheobase_is_silent():
    n = 2
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("adex", "rectipy_tpu.models.spiking_neurons.adex.adex",
                        weights=np.zeros((n, n)), source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", spike_var="spike",
                        reset_var="v", spike_threshold=0.0, spike_reset=-70.6)
    obs = net.run(np.full((20_000, n), 300.0), sampling_steps=100, verbose=False,
                  record_spikes=["adex"])
    assert obs.to_numpy(("adex", "spikes")).sum() == 0, \
        "300 pA is below the BG-RS rheobase (~500 pA); no spikes expected"


def test_hh_vector_field_oracle():
    """Hodgkin-Huxley gate kinetics and currents against a hand-written
    numpy oracle (classic -65 mV-rest squid-axon parameterization)."""
    n = 5
    vf = lower("rectipy_tpu.models.spiking_neurons.hodgkin_huxley.hh",
               n=n, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    v = rng.uniform(-80.0, 20.0, size=n)
    m = rng.uniform(0.05, 0.95, size=n)
    h = rng.uniform(0.05, 0.95, size=n)
    ng = rng.uniform(0.05, 0.95, size=n)
    s = rng.uniform(0.0, 0.5, size=n)
    vm = vf.var_map
    y = np.zeros(vf.n * 5)
    for name, arr in (("v", v), ("m", m), ("h", h), ("n", ng), ("s", s)):
        lo, hi = vm[name]
        y[lo:hi] = arr
    dy = np.asarray(vf.func(0.0, jnp.asarray(y), vf.args))

    a_m = 0.1 * (v + 40.0) / (1.0 - np.exp(-(v + 40.0) / 10.0))
    b_m = 4.0 * np.exp(-(v + 65.0) / 18.0)
    a_h = 0.07 * np.exp(-(v + 65.0) / 20.0)
    b_h = 1.0 / (1.0 + np.exp(-(v + 35.0) / 10.0))
    a_n = 0.01 * (v + 55.0) / (1.0 - np.exp(-(v + 55.0) / 10.0))
    b_n = 0.125 * np.exp(-(v + 65.0) / 80.0)
    dv = (-120.0 * m ** 3 * h * (v - 50.0) - 36.0 * ng ** 4 * (v + 77.0)
          - 0.3 * (v + 54.387)) / 1.0
    dm = a_m * (1.0 - m) - b_m * m
    dh = a_h * (1.0 - h) - b_h * h
    dn = a_n * (1.0 - ng) - b_n * ng
    ds = 12.0 * (1.0 - s) / (1.0 + np.exp(-v / 2.0)) - s / 10.0
    for name, expect in (("v", dv), ("m", dm), ("h", dh), ("n", dn), ("s", ds)):
        lo, hi = vm[name]
        np.testing.assert_allclose(dy[lo:hi], expect, rtol=1e-9,
                                   err_msg=f"d{name} mismatch")


def test_hh_singular_gate_voltages_are_finite():
    """v exactly on the alpha_m / alpha_n singular voltages (-40, -55 mV)
    yields finite derivatives AND finite gradients (exprel double-where)."""
    import jax

    vf = lower("rectipy_tpu.models.spiking_neurons.hodgkin_huxley.hh",
               n=2, dtype=jnp.float64)
    vm = vf.var_map
    y = np.zeros(vf.n * 5)
    lo, hi = vm["v"]
    y[lo:hi] = [-40.0, -55.0]  # exactly singular
    for name, val in (("m", 0.05), ("h", 0.6), ("n", 0.3), ("s", 0.1)):
        a, b = vm[name]
        y[a:b] = val
    dy = np.asarray(vf.func(0.0, jnp.asarray(y), vf.args))
    assert np.all(np.isfinite(dy))
    # limits: alpha_m(-40) = 1.0, alpha_n(-55) = 0.1
    lo_m, _ = vm["m"]
    a_m_at_40 = dy[lo_m] / (1.0 - 0.05) + (4.0 * np.exp(-25.0 / 18.0)) * 0.05 / (1.0 - 0.05)
    np.testing.assert_allclose(a_m_at_40, 1.0, rtol=1e-9)
    g = jax.grad(lambda yy: jnp.sum(vf.func(0.0, yy, vf.args)))(jnp.asarray(y))
    assert np.all(np.isfinite(np.asarray(g)))


def test_hh_spikes_rk4_matches_fine_euler():
    """HH under a 10 uA/cm^2 step fires tonically; RK4 at dt=0.02 ms tracks
    a 10x-finer Euler reference (same spike count, sub-mV sampled-v error
    outside spike edges)."""
    n = 2
    T_ms = 60.0

    def run(integrator, dt):
        net = Network(dt, dtype=jnp.float64)
        net.add_diffeq_node("hh", "rectipy_tpu.models.spiking_neurons.hodgkin_huxley.hh",
                            weights=np.zeros((n, n)), source_var="s", target_var="s_in",
                            input_var="I_ext", output_var="s", integrator=integrator)
        steps = int(round(T_ms / dt))
        samp = int(round(0.5 / dt))  # one record every 0.5 ms
        obs = net.run(np.full((steps, n), 10.0), sampling_steps=samp, verbose=False,
                      record_vars=[("hh", "v", False)])
        return obs.to_numpy(("hh", "v"))[:, 0]

    v_rk4 = run("rk4", 0.02)
    v_ref = run("euler", 0.002)
    assert np.all(np.isfinite(v_rk4))
    spikes_rk4 = int(np.sum((v_rk4[1:] > 0) & (v_rk4[:-1] <= 0)))
    spikes_ref = int(np.sum((v_ref[1:] > 0) & (v_ref[:-1] <= 0)))
    assert spikes_rk4 >= 3, "HH at 10 uA/cm^2 should fire tonically"
    assert spikes_rk4 == spikes_ref


# ------------------------------------------------------------- Morris-Lecar

def _ml_rate(node, I, T=40000, dt=0.05, file_name=None):
    """Sustained firing rate (0-mV upcrossings over the second half = 1 s)."""
    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("ml", f"rectipy_tpu.models.spiking_neurons.morris_lecar.{node}",
                        weights=np.zeros((1, 1)), source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="v", verbose=False, clear=True,
                        file_name=file_name or f"mlr_{node}", integrator="rk4")
    v = net.run(np.full((T, 1), float(I)), sampling_steps=1,
                verbose=False).to_numpy("out")[:, 0]
    h = v[T // 2:]
    assert np.all(np.isfinite(v))
    return int(((h[:-1] < 0) & (h[1:] >= 0)).sum())


def test_morris_lecar_vector_field_oracle():
    """ML right-hand side against the textbook equations (type-II set)."""
    n = 3
    vf = lower("rectipy_tpu.models.spiking_neurons.morris_lecar.ml", n=n,
               dtype=jnp.float64)
    rng = np.random.default_rng(1)
    v = rng.uniform(-70, 30, n)
    w = rng.uniform(0.0, 0.5, n)
    s = rng.uniform(0.0, 0.5, n)
    # state layout (vf.var_map): contiguous blocks in equation order (v, w, s)
    y = jnp.asarray(np.concatenate([v, w, s]))
    dy = np.asarray(vf.func(0.0, y, vf.args))
    m_inf = 0.5 * (1 + np.tanh((v + 1.2) / 18.0))
    w_inf = 0.5 * (1 + np.tanh((v - 2.0) / 30.0))
    # w relaxes at rate phi / tau_w(v) with tau_w = 1/cosh(.): dw has a
    # MULTIPLICATIVE cosh (the standard Rinzel-Ermentrout form)
    lam_w = np.cosh((v - 2.0) / 60.0)
    dv = (-2.0 * (v + 60.0) - 4.4 * m_inf * (v - 120.0) - 8.0 * w * (v + 84.0)) / 20.0
    dw = 0.04 * (w_inf - w) * lam_w
    ds = 1.0 * (1.0 - s) / (1.0 + np.exp(-(v - 10.0) / 2.0)) - s / 20.0
    np.testing.assert_allclose(dy[:n], dv, rtol=1e-12)
    np.testing.assert_allclose(dy[n:2 * n], dw, rtol=1e-12)
    np.testing.assert_allclose(dy[2 * n:], ds, rtol=1e-12)


def test_morris_lecar_excitability_classes():
    """The textbook class signatures: type II (Hopf) turns on with a FINITE
    rate jump between I=88 and I=90; type I (SNIC) fires from a much lower
    rheobase and turns on at an arbitrarily LOW rate that climbs gradually."""
    # type II: quiescent at 88, abrupt finite-rate onset at 90
    assert _ml_rate("ml", 88) == 0
    r2_on = _ml_rate("ml", 90)
    assert r2_on >= 5
    # type I: already firing at I=60 (far below the type-II threshold)
    assert _ml_rate("ml_type1", 60) >= 5
    # type I onset: silent at 39, low-rate at 40, climbing gradually
    assert _ml_rate("ml_type1", 39) == 0
    r1_on = _ml_rate("ml_type1", 40)
    assert 1 <= r1_on <= 3
    assert r1_on < r2_on  # SNIC onset is slower than the Hopf jump


def test_morris_lecar_coupling_recruits_subthreshold_partner():
    """Excitatory s-coupling: a firing neuron (I=95) recruits its
    subthreshold partner (I=85, silent alone).  NOTE a rate increase is the
    WRONG assertion for type II -- its f-I curve is nearly flat near the
    Hopf -- recruitment is the meaningful signature."""
    n, dt, T = 2, 0.05, 40000
    inp = np.tile(np.asarray([95.0, 85.0]), (T, 1))

    def partner_spikes(w):
        net = Network(dt, dtype=jnp.float64)
        net.add_diffeq_node("ml", "rectipy_tpu.models.spiking_neurons.morris_lecar.ml",
                            weights=w, source_var="s", target_var="s_in",
                            input_var="I_ext", output_var="v", verbose=False,
                            clear=True, file_name="ml_pair", integrator="rk4")
        obs = net.run(inp, sampling_steps=1, verbose=False,
                      record_vars=[("ml", "v", False)])
        v_b = obs.to_numpy(("ml", "v"))[T // 2:, 1]
        return int(((v_b[:-1] < 0) & (v_b[1:] >= 0)).sum())

    assert partner_spikes(np.zeros((n, n))) == 0
    assert partner_spikes(np.asarray([[0.0, 0.0], [40.0, 0.0]])) >= 3


# ------------------------------------------------------- electrical coupling

def test_qif_gap_vector_field_oracle():
    """qif_gap: the diffusive term g_gap*(G@v - deg*v) rides a second
    coupling (edge v -> v_gap) next to the chemical s -> s_in edge."""
    n = 5
    rng = np.random.default_rng(7)
    Ws = np.abs(rng.normal(size=(n, n))) * 0.2
    G = np.abs(rng.normal(size=(n, n))) * 0.1
    deg = G.sum(axis=1)
    g_gap = 0.7
    vf = lower("rectipy_tpu.models.spiking_neurons.qif.qif_gap", n=n,
               dtype=jnp.float64,
               edges=[("s", "s_in", Ws), ("v", "v_gap", G)],
               node_vars={"all/qif_gap_op/deg": deg,
                          "all/qif_gap_op/g_gap": g_gap})
    v = rng.normal(size=n)
    s = np.abs(rng.normal(size=n))
    # state layout: v first (appears first in equations), then s
    y = jnp.asarray(np.concatenate([v, s]))
    dy = np.asarray(vf.func(0.0, y, vf.args))
    dv = (v ** 2 - 5.0) + (Ws @ s) + g_gap * (G @ v - deg * v)
    ds = -s
    np.testing.assert_allclose(dy[:n], dv, rtol=1e-10)
    np.testing.assert_allclose(dy[n:], ds, rtol=1e-10)


def test_qif_gap_junctions_pull_voltages_together():
    """Subthreshold heterogeneous QIF population: without electrical
    coupling the membrane potentials settle at distinct fixed points
    (-sqrt(-eta_i)); all-to-all gap junctions pull them together."""
    n, T = 8, 4000
    rng = np.random.default_rng(13)
    etas = -np.linspace(1.0, 9.0, n)  # subthreshold spread

    def spread(g_gap):
        G = np.full((n, n), 1.0 / n)
        net = Network(1e-3, dtype=jnp.float64)
        net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif_gap",
                            n=n, edges=[("v", "v_gap", G)],
                            input_var="I_ext", output_var="v", op="qif_gap_op",
                            verbose=False, clear=True, file_name=f"qgap{int(10*g_gap)}",
                            node_vars={"all/qif_gap_op/eta": etas,
                                       "all/qif_gap_op/deg": G.sum(axis=1),
                                       "all/qif_gap_op/g_gap": g_gap})
        v = net.run(np.zeros((T, n)), sampling_steps=50, verbose=False).to_numpy("out")
        return float(v[-1].std())

    s0, s_weak, s_strong = spread(0.0), spread(2.0), spread(20.0)
    # uncoupled: fixed points -sqrt(-eta) with a known spread
    np.testing.assert_allclose(s0, np.std(-np.sqrt(-etas)), rtol=1e-2)
    assert s_weak < s0
    assert s_strong < 0.25 * s0


def test_mpr_gap_oracle_and_rate_drag():
    """MPR + gap junctions (Laing 2015 / Pietras et al. 2019): the exact
    mean-field adds a -g_gap*r term to the rate equation; steady activity
    falls monotonically with the electrical coupling strength."""
    n = 3
    g = 4.0
    vf = lower("rectipy_tpu.models.mean_field.montbrio.mpr_gap", n=n,
               dtype=jnp.float64, node_vars={"all/mpr_gap_op/g_gap": g})
    rng = np.random.default_rng(2)
    r = np.abs(rng.normal(size=n)) + 0.1
    v = rng.normal(size=n)
    y = jnp.asarray(np.concatenate([r, v]))
    dy = np.asarray(vf.func(0.0, y, vf.args))
    np.testing.assert_allclose(dy[:n], 1.0 / np.pi + (2.0 * v - g) * r, rtol=1e-12)
    np.testing.assert_allclose(dy[n:], (v ** 2 - 5.0) - (np.pi * r) ** 2 + 15.0 * r,
                               rtol=1e-12)

    def steady_r(g_gap):
        net = Network(1e-4, dtype=jnp.float64)
        net.add_diffeq_node("mpr", "rectipy_tpu.models.mean_field.montbrio.mpr_gap",
                            weights=np.zeros((1, 1)), input_var="I_ext",
                            output_var="r", source_var="r", target_var="r_in",
                            op="mpr_gap_op", verbose=False, clear=True,
                            file_name=f"mprg_t{int(g_gap)}",
                            node_vars={"all/mpr_gap_op/g_gap": g_gap})
        r = net.run(np.zeros((60000, 1)), sampling_steps=500,
                    verbose=False).to_numpy("out")
        return float(r[-1, 0])

    rs = [steady_r(g) for g in (0.0, 5.0, 20.0)]
    assert rs[0] > rs[1] > rs[2] > 0.0


def test_hindmarsh_rose_vector_field_oracle():
    """HR: x' = y - a x^3 + b x^2 - z + I; y' = c - d x^2 - y;
    z' = r (s (x - x0) - z)."""
    n = 3
    vf = lower("rectipy_tpu.models.spiking_neurons.hindmarsh_rose.hr", n=n,
               dtype=jnp.float64)
    rng = np.random.default_rng(5)
    x, y, z = rng.normal(size=(3, n))
    yv = jnp.asarray(np.concatenate([x, y, z]))
    dy = np.asarray(vf.func(0.0, yv, vf.args))
    np.testing.assert_allclose(dy[:n], y - x ** 3 + 3 * x ** 2 - z, rtol=1e-12)
    np.testing.assert_allclose(dy[n:2 * n], 1.0 - 5 * x ** 2 - y, rtol=1e-12)
    np.testing.assert_allclose(dy[2 * n:], 0.006 * (4.0 * (x + 1.6) - z),
                               rtol=1e-12)


def _hr_net(I, n=1, dt=5e-3):
    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("hr", "rectipy_tpu.models.spiking_neurons.hindmarsh_rose.hr",
                        weights=np.zeros((n, n)), source_var="x",
                        target_var="s_in", input_var="I_ext", output_var="x",
                        verbose=False, clear=True, file_name="hr_test",
                        node_vars={"all/hr_op/I": I})
    return net


def test_hindmarsh_rose_bursting_signature():
    """I=2: square-wave bursting -- spikes cluster (intra-burst ISI) with
    long quiescent gaps between bursts (inter-burst ISI >> intra); I=1:
    quiescent (no spikes)."""
    dt, samp = 5e-3, 10
    obs = _hr_net(2.0).run(np.zeros((400_000, 1)), sampling_steps=samp,
                           verbose=False)
    x = obs.to_numpy("out")[20_000:, 0]
    up = np.nonzero((x[:-1] < 1.0) & (x[1:] >= 1.0))[0]
    assert len(up) > 8, f"expected sustained spiking, got {len(up)} spikes"
    isi = np.diff(up) * samp * dt
    assert isi.max() / isi.min() > 4, (
        f"expected bursting (bimodal ISI), got min/max {isi.min():.1f}/{isi.max():.1f}")
    # quiescent below rheobase
    obs0 = _hr_net(1.0).run(np.zeros((200_000, 1)), sampling_steps=samp,
                            verbose=False)
    x0 = obs0.to_numpy("out")[10_000:, 0]
    assert x0.max() < 1.0, "I=1 should stay subthreshold"


def test_hindmarsh_rose_chaotic_bursting_lyapunov():
    """The HR chaotic-bursting window (I ~ 2.9-3.4) has a positive largest
    Lyapunov exponent; the quiescent equilibrium contracts (measured here:
    +0.0063 at I=3.2 vs -0.011 at I=1.0)."""
    from rectipy_tpu.analysis import lyapunov_spectrum

    lam_chaos = lyapunov_spectrum(_hr_net(3.2), steps=600_000,
                                  transient=200_000, seed=4)[0]
    lam_rest = lyapunov_spectrum(_hr_net(1.0), steps=100_000,
                                 transient=50_000, seed=4)[0]
    assert lam_chaos > 0.003, f"chaotic bursting expected, got {lam_chaos}"
    assert lam_rest < -0.005, f"rest state should contract, got {lam_rest}"
