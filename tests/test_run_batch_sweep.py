"""run_batch(batch_vars=...): parameter sweeps across trials in one vmapped
program (bifurcation-diagram workload; no reference analog -- torch-CPU
loops trials in Python).  Correctness is exact equality against sequential
per-trial runs with set_var."""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
QIF = "neuron_model_templates.spiking_neurons.qif.qif"


def _build(W, **kw):
    net = Network(dt=1e-2)
    net.add_diffeq_node("p", TANH, weights=W, source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="tanh_op/r", float_precision="float64", **kw)
    return net


@pytest.mark.parametrize("var,shape", [("eta", "scalar"), ("tau", "per_neuron"),
                                       ("weights", "matrix")])
def test_sweep_matches_sequential(var, shape):
    rng = np.random.default_rng(0)
    N, B, T = 6, 4, 30
    W = rng.normal(scale=0.3, size=(N, N))
    ins = np.broadcast_to(rng.normal(size=(1, T, 1)), (B, T, 1)).copy()
    vals = {"scalar": np.linspace(-2.0, 3.0, B),
            "per_neuron": rng.uniform(5.0, 20.0, size=(B, N)),
            "matrix": rng.normal(scale=0.3, size=(B, N, N))}[shape]
    net = _build(W)
    res = net.run_batch(ins, batch_vars={("p", var): vals}, verbose=False)
    assert res["out"].shape == (B, T, N)
    for b in range(B):
        net2 = _build(W)
        net2.set_var("p", var, vals[b])
        o = net2.run(ins[b], verbose=False).to_numpy("out")
        np.testing.assert_allclose(res["out"][b], o, rtol=0, atol=1e-14)


def test_sweep_quantized_coupling_preps_per_trial():
    """int8_master couplings sweep too: the per-row requantization runs per
    trial inside the vmapped program (network._prep_params under vmap)."""
    rng = np.random.default_rng(1)
    N, B, T = 8, 3, 25
    W = rng.normal(scale=0.3, size=(N, N))
    Ws = rng.normal(scale=0.3, size=(B, N, N))
    ins = rng.normal(size=(B, T, 1))
    net = Network(dt=1e-2)
    net.add_diffeq_node("p", TANH, weights=W, source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="tanh_op/r", float_precision="float32",
                        coupling_dtype="int8_master")
    res = net.run_batch(ins, batch_vars={("p", "weights"): Ws}, verbose=False)
    for b in range(B):
        net2 = Network(dt=1e-2)
        net2.add_diffeq_node("p", TANH, weights=Ws[b], source_var="tanh_op/r",
                             target_var="li_op/r_in", input_var="li_op/I_ext",
                             output_var="tanh_op/r", float_precision="float32",
                             coupling_dtype="int8_master")
        o = net2.run(ins[b], verbose=False).to_numpy("out")
        np.testing.assert_allclose(res["out"][b], o, rtol=0, atol=1e-6)


def test_sweep_qif_bifurcation_shape():
    """The canonical use: sweep QIF excitability eta across trials; the
    spike output must be monotone-ish in eta (higher drive, more spikes)."""
    rng = np.random.default_rng(2)
    N, B, T = 8, 6, 200
    W = np.abs(rng.normal(size=(N, N))) * 0.2
    etas = np.linspace(-5.0, 25.0, B)
    net = Network(dt=1e-2)
    net.add_diffeq_node("p", QIF, weights=W, input_var="I_ext", output_var="s",
                        source_var="s", target_var="s_in", op="qif_op",
                        spike_var="spike", spike_def="v", spike_threshold=100.0,
                        spike_reset=-100.0, float_precision="float64")
    res = net.run_batch(np.zeros((B, T, N)), batch_vars={("p", "eta"): etas},
                        verbose=False)
    rates = np.asarray(res["out"]).mean(axis=(1, 2))
    assert rates[0] < 1e-6  # far-subthreshold trial stays silent
    assert rates[-1] > rates[0]  # suprathreshold fires
    assert np.all(np.diff(rates) >= -1e-9)  # monotone in eta


def test_sweep_validation():
    rng = np.random.default_rng(3)
    N, B, T = 4, 3, 10
    net = _build(rng.normal(size=(N, N)) * 0.2)
    ins = rng.normal(size=(B, T, 1))
    with pytest.raises(KeyError, match="not a parameter"):
        net.run_batch(ins, batch_vars={("p", "nope"): np.ones(B)}, verbose=False)
    with pytest.raises(ValueError, match="leading dimension"):
        net.run_batch(ins, batch_vars={("p", "eta"): np.ones(B + 1)}, verbose=False)


def test_sweep_t1_fallback():
    """T == 1 takes the per-trial loop; per-trial overrides must thread
    through it and match sequential runs (at T=1 the recording is the
    initial-state output, so parity -- not divergence -- is the check)."""
    rng = np.random.default_rng(4)
    N, B = 4, 3
    W = rng.normal(size=(N, N)) * 0.2
    net = _build(W)
    etas = np.linspace(-1.0, 1.0, B)
    ins = rng.normal(size=(B, 1, 1))
    res = net.run_batch(ins, batch_vars={("p", "eta"): etas}, verbose=False)
    out = np.asarray(res["out"])
    assert out.shape[0] == B
    for b in range(B):
        net2 = _build(W)
        net2.set_var("p", "eta", etas[b])
        o = net2.run(ins[b], verbose=False).to_numpy("out")
        np.testing.assert_allclose(out[b], o, rtol=0, atol=1e-14)


def test_run_batch_shared_2d_inputs_match_tiled():
    """A shared (T, m) drive + batch_vars == the explicitly tiled (B, T, m)
    form, without materializing B copies."""
    import jax.numpy as jnp

    from rectipy_tpu import Network

    n, B, T = 4, 3, 25
    rng = np.random.default_rng(8)
    net = Network(dt=1e-2, dtype=jnp.float32)
    net.add_diffeq_node("pop", "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
                        weights=rng.standard_normal((n, n)) * 0.1,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        clear=True, verbose=False, file_name="rb_shared")
    inp = rng.normal(size=(T, n)).astype(np.float32)
    etas = np.linspace(-0.5, 0.5, B).astype(np.float32)
    shared = net.run_batch(inp, sampling_steps=1,
                           batch_vars={("pop", "li_op/eta"): etas}, verbose=False)
    tiled = net.run_batch(np.broadcast_to(inp, (B, T, n)), sampling_steps=1,
                          batch_vars={("pop", "li_op/eta"): etas}, verbose=False)
    np.testing.assert_allclose(shared["out"], tiled["out"], rtol=1e-6)
    with pytest.raises(ValueError, match="shared"):
        net.run_batch(inp, sampling_steps=1, verbose=False)  # 2-D w/o batch_vars


def test_run_batch_sweep_under_mesh_matches_unsharded():
    """batch_vars composes with mesh=: swept leaves shard over 'data', the
    population over 'model'; records match the unsharded sweep."""
    import jax.numpy as jnp

    from rectipy_tpu import Network
    from rectipy_tpu.parallel import make_mesh

    n, B, T = 16, 4, 20
    rng = np.random.default_rng(12)
    net = Network(dt=1e-2, dtype=jnp.float32)
    net.add_diffeq_node("pop", "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
                        weights=rng.standard_normal((n, n)) * 0.1,
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        clear=True, verbose=False, file_name="rb_mesh_sweep")
    inp = rng.normal(size=(B, T, n)).astype(np.float32)
    etas = np.linspace(-0.5, 0.5, B).astype(np.float32)
    ref = net.run_batch(inp, sampling_steps=1,
                        batch_vars={("pop", "li_op/eta"): etas}, verbose=False)
    mesh = make_mesh(8, data=2)
    sharded = net.run_batch(inp, sampling_steps=1, mesh=mesh,
                            batch_vars={("pop", "li_op/eta"): etas}, verbose=False)
    np.testing.assert_allclose(sharded["out"], ref["out"], rtol=1e-6, atol=1e-7)
    # shared 2-D input under the mesh too
    ref2 = net.run_batch(inp[0], sampling_steps=1,
                         batch_vars={("pop", "li_op/eta"): etas}, verbose=False)
    sh2 = net.run_batch(inp[0], sampling_steps=1, mesh=mesh,
                        batch_vars={("pop", "li_op/eta"): etas}, verbose=False)
    np.testing.assert_allclose(sh2["out"], ref2["out"], rtol=1e-6, atol=1e-7)
