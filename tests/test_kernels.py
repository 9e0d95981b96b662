"""Pallas fused QIF+SFA step vs the pure-jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu.ops.kernels import (
    make_qif_sfa_pallas_step,
    pad_coupling,
    qif_sfa_reference_step,
)

PARAMS = dict(dt=1e-4, tau=1.0, tau_s=1.0, tau_x=10.0, k=15.0, alpha=0.05,
              thresh=10.0, v_reset=-10.0)


def test_pallas_step_matches_oracle():
    n, tile = 300, 128  # non-multiple of tile to exercise padding
    rng = np.random.default_rng(0)
    W = (rng.random((n, n)) < 0.1).astype(np.float32) * 0.01
    v = jnp.asarray(rng.normal(size=n) * 8.0, dtype=jnp.float32)  # some above thresh
    s = jnp.asarray(rng.random(n), dtype=jnp.float32)
    x = jnp.asarray(rng.random(n), dtype=jnp.float32)
    eta = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    inp = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)

    step = make_qif_sfa_pallas_step(n, tile=tile, interpret=True, **PARAMS)
    wt = pad_coupling(W, tile=tile)
    v2, s2, x2 = step(v, s, x, wt, eta, inp)

    rv, rs, rx = qif_sfa_reference_step(v, s, x, jnp.asarray(W), eta, inp, **PARAMS)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(rv), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(rs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(rx), rtol=1e-5, atol=1e-5)
    # at least one neuron actually spiked and was reset to v_reset
    assert np.any(np.asarray(v2) == PARAMS["v_reset"])


def test_pallas_step_multi_step_trajectory():
    n, tile = 128, 128
    rng = np.random.default_rng(1)
    W = np.zeros((n, n), dtype=np.float32)
    step = make_qif_sfa_pallas_step(n, tile=tile, interpret=True, **PARAMS)
    wt = pad_coupling(W, tile=tile)
    Wj = jnp.asarray(W)

    v = jnp.full((n,), -2.0, dtype=jnp.float32)
    s = jnp.zeros(n, dtype=jnp.float32)
    x = jnp.zeros(n, dtype=jnp.float32)
    eta = jnp.full((n,), 8.0, dtype=jnp.float32)
    inp = jnp.zeros(n, dtype=jnp.float32)

    rv, rs, rx = v, s, x
    for _ in range(50):
        v, s, x = step(v, s, x, wt, eta, inp)
        rv, rs, rx = qif_sfa_reference_step(rv, rs, rx, Wj, eta, inp, **PARAMS)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-4, atol=1e-4)


def test_pallas_step_bf16_weights_close():
    n, tile = 256, 128
    rng = np.random.default_rng(2)
    W = (rng.random((n, n)) < 0.1).astype(np.float32) * 0.01
    v = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    s = jnp.asarray(rng.random(n), dtype=jnp.float32)
    x = jnp.zeros(n, dtype=jnp.float32)
    eta = jnp.zeros(n, dtype=jnp.float32)
    inp = jnp.zeros(n, dtype=jnp.float32)

    step = make_qif_sfa_pallas_step(n, tile=tile, interpret=True,
                                    weights_dtype=jnp.bfloat16, **PARAMS)
    wt = pad_coupling(W, tile=tile, weights_dtype=jnp.bfloat16)
    v2, s2, x2 = step(v, s, x, wt, eta, inp)
    rv, rs, rx = qif_sfa_reference_step(v, s, x, jnp.asarray(W), eta, inp, **PARAMS)
    # bf16 coupling: looser tolerance, same dynamics
    np.testing.assert_allclose(np.asarray(v2), np.asarray(rv), rtol=2e-2, atol=2e-2)


def test_attach_fused_step_matches_network_path():
    """A Network whose qif_sfa node uses the fused Pallas step produces the
    same trajectory as the standard lax path."""
    import jax.numpy as jnp

    from rectipy_tpu import Network
    from rectipy_tpu.ops.kernels import attach_fused_qif_step

    n = 64
    rng = np.random.default_rng(3)
    W = (rng.random((n, n)) < 0.2).astype(np.float64) * 0.02
    etas = rng.normal(size=n) + 100.0

    def build():
        net = Network(1e-3, dtype=jnp.float32)
        net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa",
                            weights=W, source_var="s", target_var="s_in",
                            input_var="I_ext", output_var="s", op="qif_sfa_op",
                            spike_var="spike", spike_def="v", dtype=jnp.float32,
                            spike_threshold=30.0, spike_reset=-30.0,
                            node_vars={"all/qif_sfa_op/eta": etas})
        net.compile()
        return net

    inp = rng.normal(size=(600, n)).astype(np.float32)
    ref = build().run(inp, verbose=False).to_numpy("out")

    net2 = build()
    attach_fused_qif_step(net2.get_node("qif"), tile=128, interpret=True)
    fused = net2.run(inp, verbose=False).to_numpy("out")

    assert np.any(ref > 0), "no spiking activity -- weak test"
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-4)


def test_attach_fused_step_rejects_heterogeneous_tau():
    import jax.numpy as jnp

    from rectipy_tpu import Network
    from rectipy_tpu.ops.kernels import attach_fused_qif_step

    n = 16
    net = Network(1e-3, dtype=jnp.float32)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                        weights=np.zeros((n, n)), source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_op",
                        spike_var="spike", spike_def="v",
                        node_vars={"all/qif_op/tau": np.ones(n)})
    net.compile()
    with pytest.raises(ValueError):
        attach_fused_qif_step(net.get_node("qif"), interpret=True)
