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
