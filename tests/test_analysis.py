"""Analysis subsystem: Jacobians, Newton fixed points, linear stability.

Beyond-reference (the reference is simulation/training only).  Validated
against closed-form linearizations and the known dynamics of the model
library: the tanh-rate Jacobian matches its analytic form, the Montbrio
mean-field's rest state classifies as a stable NODE at (eta=-5, J=15) and
a stable FOCUS at high activity -- both against the closed-form
eigenvalues, with the focus's linearized frequency matching the simulated
damped ringing -- and the Wilson-Cowan fixed point inside its limit cycle
is UNSTABLE.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network
from rectipy_tpu.analysis import autonomous_field, fixed_point, jacobian, stability

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
MPR = "rectipy_tpu.models.mean_field.montbrio.mpr"
WC = "rectipy_tpu.models.rate_neurons.wilson_cowan.wc"


def _tanh_net(n, W, tau=10.0, k=1.0):
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("pop", TANH, weights=W, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", clear=True, verbose=False,
                        file_name="ana_tanh",
                        node_vars={"all/li_op/tau": tau, "all/li_op/k": k})
    return net


def test_jacobian_matches_analytic_tanh():
    """v' = -v/tau + k W tanh(v) + I  =>  J = -I/tau + k W diag(sech^2 v)."""
    n = 5
    rng = np.random.default_rng(3)
    W = rng.standard_normal((n, n)) * 0.3
    net = _tanh_net(n, W, tau=7.0, k=1.3)
    y = rng.standard_normal(n)
    J = np.asarray(jacobian(net, y=y))
    J_ref = -np.eye(n) / 7.0 + 1.3 * W * (1.0 / np.cosh(y) ** 2)[None, :]
    np.testing.assert_allclose(J, J_ref, rtol=1e-10, atol=1e-12)


def test_autonomous_field_holds_input_constant():
    n = 3
    net = _tanh_net(n, np.zeros((n, n)), tau=5.0)
    f, y = autonomous_field(net, inputs=2.0)
    dy = np.asarray(f(jnp.zeros(n)))
    np.testing.assert_allclose(dy, np.full(n, 2.0), rtol=1e-12)
    # per-channel inputs broadcast too
    f2, _ = autonomous_field(net, inputs=np.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(f2(jnp.zeros(n))), [1.0, 2.0, 3.0])


def test_fixed_point_linear_system_exact():
    """Uncoupled LI: y* = tau * I exactly."""
    n = 4
    net = _tanh_net(n, np.zeros((n, n)), tau=9.0)
    y_star = np.asarray(fixed_point(net, inputs=0.5))
    np.testing.assert_allclose(y_star, np.full(n, 4.5), rtol=1e-9)
    eigs = stability(net, y=y_star, inputs=0.5)
    np.testing.assert_allclose(eigs.real, -1.0 / 9.0, rtol=1e-9)


def _mpr_net(eta, J, tag):
    net = Network(1e-4, dtype=jnp.float64)
    net.add_diffeq_node("mpr", MPR, weights=np.zeros((1, 1)), input_var="I_ext",
                        output_var="r", source_var="r", target_var="r_in",
                        op="mpr_op", verbose=False, clear=True,
                        file_name=f"ana_mpr_{tag}",
                        node_vars={"all/mpr_op/eta": eta, "all/mpr_op/J": J})
    return net


def test_montbrio_node_vs_focus_classification():
    """MPR linear stability against the closed form: the Jacobian at the
    fixed point is [[2v*, 2r*], [J - 2 pi^2 r*, 2v*]], so eigenvalues are
    2v* +- sqrt(2 r* (J - 2 pi^2 r*)) -- REAL (stable node) when
    J > 2 pi^2 r* (the default eta=-5, J=15 rest state) and COMPLEX
    (focus) when J < 2 pi^2 r* (high-activity eta=5, J=0); the focus's
    linearized frequency must match the simulated damped ringing."""
    # stable NODE at the default parameters
    net = _mpr_net(-5.0, 15.0, "node")
    y_star = fixed_point(net, damping=0.7)
    f, _ = autonomous_field(net)
    assert float(jnp.max(jnp.abs(f(y_star)))) < 1e-9
    r_star = float(y_star[0])
    assert r_star > 0 and 15.0 > 2 * np.pi ** 2 * r_star
    eigs = stability(net, y=y_star)
    assert np.all(eigs.real < 0) and np.all(np.abs(eigs.imag) < 1e-9), eigs
    # closed-form check
    v_star = float(y_star[1])
    disc = np.sqrt(2 * r_star * (15.0 - 2 * np.pi ** 2 * r_star))
    np.testing.assert_allclose(sorted(eigs.real),
                               sorted([2 * v_star - disc, 2 * v_star + disc]),
                               rtol=1e-8)

    # stable FOCUS at high activity (J < 2 pi^2 r*)
    net = _mpr_net(5.0, 0.0, "focus")
    y_star = fixed_point(net, damping=0.7)
    r_star = float(y_star[0])
    assert r_star > 0  # any r* > 0 is a focus here since J = 0 < 2 pi^2 r*
    eigs = stability(net, y=y_star)
    assert np.all(eigs.real < 0), eigs
    omega = float(np.abs(eigs[0].imag))
    assert omega > 1.0, f"expected a focus, got {eigs}"
    # the linearized frequency shows up in the simulated damped ringing
    net.get_node("mpr").reset(y=np.asarray(y_star) * np.asarray([1.2, 1.0]))
    dt = 1e-4
    r = net.run(np.zeros((60000, 1)), sampling_steps=10,
                verbose=False).to_numpy("out")[:, 0]
    crossings = np.nonzero((r[:-1] - r_star) * (r[1:] - r_star) < 0)[0]
    assert len(crossings) >= 4, "no damped ringing around the focus"
    half_period = np.diff(crossings[:4]).mean() * 10 * dt
    np.testing.assert_allclose(np.pi / half_period, omega, rtol=0.05)
    np.testing.assert_allclose(r[-1], r_star, rtol=2e-2)  # slow decay: Re(lambda) ~ -0.45


def test_wilson_cowan_unstable_focus_inside_limit_cycle():
    """WC at the oscillatory drive: Newton (damped) finds the interior
    fixed point, and its leading eigenvalues have POSITIVE real part --
    the linear-stability signature of the limit cycle around it."""
    n = 1
    net = Network(1e-1, dtype=jnp.float64)
    net.add_diffeq_node("wc", WC, weights=np.zeros((n, n)), source_var="e",
                        target_var="r_in", input_var="I_ext", output_var="e",
                        verbose=False, clear=True, file_name="ana_wc",
                        node_vars={"all/wc_op/I_ext": 1.25})
    # seed Newton from a mid-cycle state
    net.run(np.full((2000, n), 1.25), verbose=False, record_output=False)
    y_star = fixed_point(net, inputs=1.25, damping=0.5, max_iter=300)
    eigs = stability(net, y=y_star, inputs=1.25)
    assert eigs[0].real > 0, f"expected an unstable fixed point, got {eigs}"


def test_resolve_node_errors():
    n = 2
    net = _tanh_net(n, np.zeros((n, n)))
    net.add_func_node("out", n, activation_function="identity")
    net.add_edge("pop", "out")
    # unique diffeq node still resolves despite the func node
    assert jacobian(net).shape == (n, n)
    net2 = Network(1e-2)
    net2.add_func_node("a", n, activation_function="identity")
    with pytest.raises(ValueError, match="0 differential-equation"):
        jacobian(net2)


def test_open_loop_guard_for_edge_coupled_nodes():
    """A node whose recurrence arrives through a graph/feedback edge must
    refuse analysis (the frozen edge input would drop the coupling from the
    Jacobian) unless open_loop=True is passed deliberately."""
    from rectipy_tpu import FeedbackNetwork

    n = 3
    net = FeedbackNetwork(1e-2)
    net.add_diffeq_node("pop", TANH, weights=np.zeros((n, n)),
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        clear=True, verbose=False, file_name="ana_guard")
    net.add_edge("pop", "pop", feedback=True, weights=np.eye(n) * 0.9)
    with pytest.raises(ValueError, match="OPEN-LOOP"):
        jacobian(net)
    # deliberate open-loop analysis: the edge coupling is absent by design
    J = np.asarray(jacobian(net, open_loop=True))
    np.testing.assert_allclose(J, -np.eye(n) / 10.0, atol=1e-12)

    # inbound inter-node edges guard too
    net2 = Network(1e-2)
    net2.add_func_node("inp", n, activation_function="identity")
    net2.add_diffeq_node("pop", TANH, weights=np.zeros((n, n)),
                         input_var="li_op/I_ext", output_var="li_op/v",
                         source_var="tanh_op/r", target_var="li_op/r_in",
                         clear=True, verbose=False, file_name="ana_guard2")
    net2.add_edge("inp", "pop")
    with pytest.raises(ValueError, match="OPEN-LOOP"):
        fixed_point(net2, node="pop")


def test_fixed_point_programs_cached_per_node():
    """Repeated fixed_point calls (a continuation) reuse one compiled
    Newton program on the node."""
    n = 2
    net = _tanh_net(n, np.zeros((n, n)), tau=5.0)
    nd = net.get_node("pop")
    fixed_point(net, inputs=0.1)
    progs = nd._analysis_programs
    fixed_point(net, inputs=0.7)
    assert nd._analysis_programs is progs and len(progs) == 3


def test_lyapunov_linear_system_exact():
    """Uncoupled LI is linear: every exponent equals the exact discrete-map
    rate log(1 - dt/tau)/dt, independent of the run length or tangent
    seed."""
    from rectipy_tpu.analysis import lyapunov_spectrum

    n, tau = 4, 10.0
    net = _tanh_net(n, np.zeros((n, n)), tau=tau)
    lam = lyapunov_spectrum(net, k=3, steps=500, reorth=5,
                            y0=np.ones(n), seed=1)
    expect = np.log(1.0 - net.dt / tau) / net.dt
    np.testing.assert_allclose(lam, expect, rtol=1e-9)
    # different tangent seed, same exponents
    lam2 = lyapunov_spectrum(net, k=3, steps=500, reorth=5,
                             y0=np.ones(n), seed=7)
    np.testing.assert_allclose(lam2, lam, rtol=1e-9)


def test_lyapunov_scs_chaos_transition():
    """Sompolinsky-Crisanti-Sommers 1988: x' = -x + g W tanh(x) with
    W ~ N(0, 1/N) is chaotic for g > 1 (positive lambda_max) and settles
    to the stable origin for g < 1 (lambda_max ~ -(1 - g))."""
    from rectipy_tpu.analysis import lyapunov_spectrum

    n = 128
    rng = np.random.default_rng(1)
    W0 = rng.standard_normal((n, n)) / np.sqrt(n)
    y0 = rng.standard_normal(n) * 0.5

    def gain_net(g):
        return _tanh_net(n, g * W0, tau=1.0)

    lam_sub = lyapunov_spectrum(gain_net(0.5), steps=20_000, transient=5_000,
                                y0=y0, seed=2)[0]
    # finite-N realizations near onset can be quasi-periodic (measured:
    # N=64, g=2 gave lambda ~ 0 for one W draw, matching a numpy Benettin
    # oracle); g=3 at N=128 is robustly chaotic (lambda ~ 0.14-0.17)
    lam_chaos = lyapunov_spectrum(gain_net(3.0), steps=40_000, transient=10_000,
                                  y0=y0, seed=2)[0]
    assert lam_sub < -0.2, f"subcritical gain should contract, got {lam_sub}"
    assert lam_chaos > 0.05, f"g=3 should be chaotic, got {lam_chaos}"


def test_lyapunov_limit_cycle_neutral_direction():
    """On the Wilson-Cowan limit cycle the leading exponent is ~0 (neutral
    along the flow) and the second is negative (attracting cycle)."""
    from rectipy_tpu.analysis import lyapunov_spectrum

    n = 1
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("wc", WC, weights=np.zeros((n, n)), source_var="e",
                        target_var="r_in", input_var="I_ext", output_var="e",
                        verbose=False, clear=True, file_name="lyap_wc",
                        node_vars={"all/wc_op/I_ext": 1.25})
    lam = lyapunov_spectrum(net, k=2, steps=200_000, transient=50_000,
                            inputs=1.25, seed=3)
    assert abs(lam[0]) < 0.02, f"flow direction should be neutral, got {lam}"
    assert lam[1] < -0.05, f"cycle should attract transversally, got {lam}"


def test_lyapunov_validates_and_caches():
    from rectipy_tpu.analysis import lyapunov_spectrum

    n = 3
    net = _tanh_net(n, np.zeros((n, n)))
    with pytest.raises(ValueError, match="state dimension"):
        lyapunov_spectrum(net, k=n + 1)
    with pytest.raises(ValueError, match="reorth"):
        lyapunov_spectrum(net, steps=5, reorth=10)
    nd = net.get_node("pop")
    lyapunov_spectrum(net, k=1, steps=100, reorth=10)
    n_progs = len(nd._analysis_programs)
    lyapunov_spectrum(net, k=1, steps=100, reorth=10, inputs=0.3)
    assert len(nd._analysis_programs) == n_progs  # same shape -> cached


def test_limit_cycle_wilson_cowan_floquet():
    """WC oscillator: limit_cycle finds the period, the leading Floquet
    multiplier is ~1 (neutral along the flow), the second lies inside the
    unit circle, and its exponent matches lyapunov_spectrum's second
    exponent on the same system."""
    from rectipy_tpu.analysis import limit_cycle, lyapunov_spectrum

    n = 1
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("wc", WC, weights=np.zeros((n, n)), source_var="e",
                        target_var="r_in", input_var="I_ext", output_var="e",
                        verbose=False, clear=True, file_name="lc_wc",
                        node_vars={"all/wc_op/I_ext": 1.25})
    lc = limit_cycle(net, steps=60_000, transient=40_000, inputs=1.25)
    assert lc["period"] > 0 and lc["y_star"].shape == (2,)
    m = lc["multipliers"]
    assert abs(m[0] - 1.0) < 0.02, f"neutral multiplier should be ~1: {m}"
    assert abs(m[1]) < 0.95, f"stable cycle needs |m2| < 1: {m}"
    # both coordinates see the same period
    lc_e = limit_cycle(net, steps=60_000, transient=40_000, inputs=1.25, coord=0)
    lc_i = limit_cycle(net, steps=60_000, transient=40_000, inputs=1.25, coord=1)
    np.testing.assert_allclose(lc_e["period"], lc_i["period"], rtol=1e-3)
    # Floquet exponent of the contracting direction == 2nd Lyapunov exponent
    lam = lyapunov_spectrum(net, k=2, steps=200_000, transient=50_000,
                            inputs=1.25, seed=3)
    np.testing.assert_allclose(lc["exponents"][1], lam[1], rtol=0.1)


def test_limit_cycle_rejects_equilibrium():
    from rectipy_tpu.analysis import limit_cycle

    n = 2
    net = _tanh_net(n, np.zeros((n, n)), tau=5.0)
    with pytest.raises(RuntimeError, match="equilibrium|mean-crossings"):
        limit_cycle(net, steps=2_000, transient=2_000, inputs=0.5)


def test_analysis_program_cache_shared_dict():
    """lyapunov/limit_cycle keyed programs must not shadow the f/jac/newton
    entries (regression: 'if not cache' skipped building them)."""
    from rectipy_tpu.analysis import lyapunov_spectrum

    n = 2
    net = _tanh_net(n, np.zeros((n, n)), tau=5.0)
    lyapunov_spectrum(net, k=1, steps=100, reorth=10)  # populates keyed entry
    y_star = fixed_point(net, inputs=0.2)              # must still build Newton
    np.testing.assert_allclose(np.asarray(y_star), np.full(n, 1.0), rtol=1e-8)


def test_phase_plane_fhn_closed_form():
    """FHN grid field matches the closed form; the v-nullcline's zero
    contour changes sign across the cubic."""
    from rectipy_tpu.analysis import phase_plane

    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("fhn", "rectipy_tpu.models.rate_neurons.fhn.fhn",
                        weights=np.zeros((1, 1)), source_var="v",
                        target_var="r_in", input_var="I_ext", output_var="v",
                        verbose=False, clear=True, file_name="pp_fhn")
    r = phase_plane(net, bounds=((-2.5, 2.5), (-1.0, 2.0)), n_grid=21,
                    inputs=0.5)
    V, W = np.meshgrid(r["x"], r["y"])
    np.testing.assert_allclose(r["dx"], V - V ** 3 / 3 - W + 0.5,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(r["dy"], (V + 0.7 - 0.8 * W) / 12.5,
                               rtol=1e-12, atol=1e-12)
    # dx changes sign along a horizontal cut -> v-nullcline crosses the box
    assert (r["dx"][10] > 0).any() and (r["dx"][10] < 0).any()
    with pytest.raises(ValueError, match="distinct"):
        phase_plane(net, dims=(0, 0))


def test_lyapunov_direct_matches_tangent_on_smooth():
    """The two-trajectory method must agree with the tangent method where
    both apply (smooth flows): SCS subcritical and chaotic gains."""
    from rectipy_tpu.analysis import lyapunov_direct, lyapunov_spectrum

    n = 128
    rng = np.random.default_rng(1)
    W0 = rng.standard_normal((n, n)) / np.sqrt(n)
    y0 = rng.standard_normal(n) * 0.5
    for g, tol in ((0.5, 0.05), (3.0, 0.15)):
        net = _tanh_net(n, g * W0, tau=1.0)
        net.get_node("pop").reset(y=y0)
        lam_d = lyapunov_direct(net, steps=40_000, transient=10_000, seed=0)
        lam_t = lyapunov_spectrum(net, steps=40_000, transient=10_000,
                                  y0=y0, seed=2)[0]
        assert abs(lam_d - lam_t) < tol * max(abs(lam_t), 0.1), (g, lam_d, lam_t)


def test_lyapunov_direct_spiking_qif():
    """Full-network estimate through hard resets: tonically firing QIF
    populations read a small NEGATIVE exponent (adaptation contracts;
    pulse-coupled nets are 'stably chaotic'), stable across seeds and
    renormalization interval -- the regression here is the hard-reset
    artifact (renorm too short + machine-scale eps read +0.25 on a
    phase-neutral ensemble before the relative-eps defaults)."""
    from rectipy_tpu.analysis import lyapunov_direct

    QIF = "rectipy_tpu.models.spiking_neurons.qif.qif_sfa"
    n = 50
    etas = 3.0 + np.random.default_rng(0).normal(size=n)

    def build():
        net = Network(1e-3, dtype=jnp.float64)
        net.add_diffeq_node("qif", QIF, weights=np.zeros((n, n)),
                            source_var="s", target_var="s_in",
                            input_var="I_ext", output_var="s",
                            spike_var="spike", spike_def="v", op="qif_sfa_op",
                            spike_threshold=10.0, spike_reset=-10.0,
                            verbose=False, clear=True, file_name="ld_test",
                            node_vars={"all/qif_sfa_op/eta": etas})
        return net

    lam = lyapunov_direct(build(), steps=60_000, transient=20_000, seed=0)
    lam_seed = lyapunov_direct(build(), steps=60_000, transient=20_000, seed=1)
    lam_renorm = lyapunov_direct(build(), steps=60_000, transient=20_000,
                                 seed=0, renorm=200)
    assert -0.3 < lam < 0.02, f"tonic ensemble should not read chaotic: {lam}"
    assert abs(lam - lam_seed) < 0.02 and abs(lam - lam_renorm) < 0.02, (
        lam, lam_seed, lam_renorm)


def test_lyapunov_direct_validation():
    from rectipy_tpu.analysis import lyapunov_direct

    net = _tanh_net(2, np.zeros((2, 2)))
    with pytest.raises(ValueError, match="renorm"):
        lyapunov_direct(net, steps=5, renorm=10)


def test_trajectory_analysis_respects_node_integrator():
    """Review regression: lyapunov_spectrum must propagate the node's OWN
    integrator map (rk4 here), not hard-coded Euler — the linear LI system
    makes the discrete multiplier exact: 1 - h + h^2/2 - h^3/6 + h^4/24."""
    from rectipy_tpu.analysis import lyapunov_spectrum

    n, tau, dt = 3, 2.0, 1e-1  # large h = dt/tau separates the maps clearly
    net = Network(dt, dtype=jnp.float64)
    net.add_diffeq_node("pop", TANH, weights=np.zeros((n, n)),
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        clear=True, verbose=False, file_name="ana_rk4",
                        integrator="rk4", node_vars={"all/li_op/tau": tau})
    lam = lyapunov_spectrum(net, k=2, steps=200, reorth=5, y0=np.ones(n))
    h = dt / tau
    mult_rk4 = 1 - h + h ** 2 / 2 - h ** 3 / 6 + h ** 4 / 24
    np.testing.assert_allclose(lam, np.log(mult_rk4) / dt, rtol=1e-9)
    mult_euler = 1 - h
    assert abs(lam[0] - np.log(mult_euler) / dt) > 1e-4  # maps genuinely differ


def test_trajectory_analysis_rejects_spiking_nodes():
    """Review regression: the reset-free flow of a spiking node is not what
    run() simulates (QIF v^2 escapes without the reset) — trajectory-based
    analyses must refuse and point to lyapunov_direct."""
    from rectipy_tpu.analysis import limit_cycle, lyapunov_spectrum

    QIF = "rectipy_tpu.models.spiking_neurons.qif.qif_sfa"
    n = 4
    net = Network(1e-3, dtype=jnp.float64)
    net.add_diffeq_node("qif", QIF, weights=np.zeros((n, n)), source_var="s",
                        target_var="s_in", input_var="I_ext", output_var="s",
                        spike_var="spike", spike_def="v", op="qif_sfa_op",
                        spike_threshold=10.0, spike_reset=-10.0,
                        verbose=False, clear=True, file_name="ana_spk")
    with pytest.raises(ValueError, match="lyapunov_direct"):
        lyapunov_spectrum(net, steps=100)
    with pytest.raises(ValueError, match="lyapunov_direct"):
        limit_cycle(net, steps=100, transient=10)
    # point analyses on the smooth flow remain legitimate
    assert jacobian(net).shape == (3 * n, 3 * n)


def test_phase_plane_program_cached():
    """Review regression: repeated grids (a nullcline sweep) reuse ONE
    compiled program; bounds/state/args ride as arguments."""
    from rectipy_tpu.analysis import phase_plane

    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("fhn", "rectipy_tpu.models.rate_neurons.fhn.fhn",
                        weights=np.zeros((1, 1)), source_var="v",
                        target_var="r_in", input_var="I_ext", output_var="v",
                        verbose=False, clear=True, file_name="pp_cache")
    r1 = phase_plane(net, bounds=((-2, 2), (-1, 1)), n_grid=11, inputs=0.3)
    nd = net.get_node("fhn")
    n_progs = len(nd._analysis_programs)
    r2 = phase_plane(net, bounds=((-3, 3), (-2, 2)), n_grid=11, inputs=0.7)
    assert len(nd._analysis_programs) == n_progs
    assert not np.allclose(r1["dx"], r2["dx"])  # different grids, same program


def test_lyapunov_direct_rejects_quantized_couplings():
    """Quantized couplings are staircases: separations below the quantum
    see identical matvecs and the exponent biases strongly negative
    (measured -0.74 int8_master / -0.27 bf16 on a lambda ~ -0.003 net)."""
    from rectipy_tpu.analysis import lyapunov_direct

    n = 8
    W = np.random.default_rng(0).standard_normal((n, n)) * 0.3
    for cd in ("bfloat16", "int8_master"):
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("pop", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", clear=True, verbose=False,
                            file_name="ld_quant", coupling_dtype=cd,
                            node_vars={"all/li_op/tau": 1.0})
        with pytest.raises(ValueError, match="quantized coupling"):
            lyapunov_direct(net, steps=1000)


def test_basins_bistable_tanh():
    """Basin classification on the canonical bistable unit
    v' = -v/tau + w*tanh(v) (w*tau > 1): negative ICs flow to -v*, positive
    to +v*, and the unstable fixed point at 0 matches no attractor (-1)."""
    from rectipy_tpu.analysis import basins, fixed_point, stability

    net = _tanh_net(1, np.array([[2.0]]), tau=1.0, k=1.0)
    a_pos = fixed_point(net, y0=np.array([2.0]))
    a_neg = fixed_point(net, y0=np.array([-2.0]))
    v_star = 1.9150080
    np.testing.assert_allclose(np.asarray(a_pos), [v_star], atol=1e-5)
    assert stability(net, y=a_pos)[0].real < 0  # attractor, not the saddle

    ics = np.linspace(-3.0, 3.0, 13).reshape(-1, 1)  # includes the saddle 0
    labels, ends = basins(net, ics=ics, attractors=[a_neg, a_pos],
                          steps=4000, tol=1e-4)
    want = np.where(ics[:, 0] < 0, 0, 1)
    want[ics[:, 0] == 0.0] = -1  # exactly ON the unstable point: stays there
    np.testing.assert_array_equal(labels, want)
    np.testing.assert_allclose(np.abs(ends[labels >= 0, 0]), v_star, atol=1e-4)

    # program cached: a second grid reuses the same compiled endpoint scan
    nd = net.get_node("pop")
    n_prog = len(nd._analysis_programs)
    labels2, _ = basins(net, ics=ics * 0.5, attractors=[a_neg, a_pos],
                        steps=4000, tol=1e-4)
    assert len(nd._analysis_programs) == n_prog
    np.testing.assert_array_equal(labels2, want)

    # validation: wrong shapes and spiking nodes refuse
    with pytest.raises(ValueError, match="ics"):
        basins(net, ics=np.zeros((4, 2)), attractors=[a_pos], steps=10)
    with pytest.raises(ValueError, match="needs ics"):
        basins(net, steps=10)
