"""AOT export / serving bundles (rectipy_tpu.serving): the exported
StableHLO program + flat-leaf snapshot must reproduce Network.run exactly,
reload without the model definition, and carry state across calls."""

import json
import os

import numpy as np
import pytest

from rectipy_tpu import Network
from rectipy_tpu.serving import export_network, load_network

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
QIF = "rectipy_tpu.models.spiking_neurons.qif.qif"

rng0 = np.random.default_rng(0)
N, T = 8, 40
W0 = rng0.normal(scale=0.3, size=(N, N))
INP = rng0.normal(size=(T, 1)).astype(np.float32)


def _rate_net():
    net = Network(dt=1e-2)
    net.add_diffeq_node("p", TANH, weights=W0.copy(),
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        input_var="li_op/I_ext", output_var="tanh_op/r",
                        float_precision="float32")
    return net


def test_export_load_matches_run(tmp_path):
    net = _rate_net()
    path = export_network(net, str(tmp_path / "bundle"), T=T, n_in=1)
    model = load_network(path)
    got = model(INP)

    ref = _rate_net()
    obs = ref.run(INP, verbose=False)
    np.testing.assert_allclose(got, np.asarray(obs.to_numpy("out")),
                               rtol=1e-6, atol=1e-7)
    assert model.n_in == 1 and model.n_out == N and model.T == T


def test_served_state_carries_and_resets(tmp_path):
    """Two chained model calls == one 2T-step Network.run; reset() restores
    the exported snapshot."""
    net = _rate_net()
    model = load_network(export_network(net, str(tmp_path / "b"), T=T, n_in=1))
    inp2 = rng0.normal(size=(2 * T, 1)).astype(np.float32)
    a = model(inp2[:T])
    b = model(inp2[T:])

    ref = _rate_net()
    obs = ref.run(inp2, verbose=False)
    full = np.asarray(obs.to_numpy("out"))
    np.testing.assert_allclose(np.concatenate([a, b]), full,
                               rtol=1e-5, atol=1e-6)

    model.reset()
    a2 = model(inp2[:T])
    np.testing.assert_allclose(a2, a, rtol=0, atol=0)


def test_serving_spiking_with_sampling(tmp_path):
    """QIF spiking network with window-mean downsampling: R = T//s contiguous
    window means of the output."""
    def _qif():
        q = Network(dt=1e-2)
        q.add_diffeq_node("qif", QIF, weights=np.abs(W0) * 2.0,
                          source_var="s", target_var="s_in",
                          input_var="I_ext", output_var="s",
                          spike_var="spike", spike_def="v", op="qif_op",
                          spike_threshold=1e2, spike_reset=-1e2,
                          node_vars={"all/qif_op/eta": 1.0},
                          float_precision="float32")
        return q

    s = 5
    model = load_network(export_network(_qif(), str(tmp_path / "q"), T=T, n_in=1,
                                        sampling_steps=s))
    drive = np.full((T, 1), 100.0, dtype=np.float32)  # strong drive: spikes within T
    got = model(drive)
    assert got.shape == (T // s, N)
    assert np.isfinite(got).all() and got.max() > 0  # spiking regime

    # oracle: every-step outputs from the same network, window-averaged
    ref = _qif()
    obs = ref.run(drive, verbose=False)
    outs = np.asarray(obs.to_numpy("out"))
    want = outs[: (T // s) * s].reshape(T // s, s, N).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_serving_int8_master_prep_inside_program(tmp_path):
    """int8_master coupling: the quantization prep runs INSIDE the exported
    program (hoisted before the scan), so the snapshot carries the f32
    master weights and the served outputs match Network.run bit-for-bit."""
    def _net():
        q = Network(dt=1e-2)
        q.add_diffeq_node("p", TANH, weights=W0.copy(),
                          source_var="tanh_op/r", target_var="li_op/r_in",
                          input_var="li_op/I_ext", output_var="tanh_op/r",
                          float_precision="float32",
                          coupling_dtype="int8_master")
        return q

    model = load_network(export_network(_net(), str(tmp_path / "i8"), T=T,
                                        n_in=1))
    got = model(INP)
    obs = _net().run(INP, verbose=False)
    np.testing.assert_allclose(got, np.asarray(obs.to_numpy("out")),
                               rtol=0, atol=0)


def test_serving_feedback_delay_edges(tmp_path):
    """FeedbackNetwork with a delayed feedback edge: the delay ring buffer
    and previous-step feedback outputs ride in the carried state leaves."""
    from rectipy_tpu import FeedbackNetwork

    def _net():
        q = FeedbackNetwork(dt=1e-2)
        q.add_func_node("inp", 1, activation_function="identity")
        q.add_diffeq_node("p", TANH, weights=W0.copy(),
                          source_var="tanh_op/r", target_var="li_op/r_in",
                          input_var="li_op/I_ext", output_var="tanh_op/r",
                          float_precision="float32")
        q.add_edge("inp", "p", weights=np.ones((N, 1), dtype=np.float32))
        q.add_edge("p", "p", weights=np.full(N, 0.2, dtype=np.float32),
                   delays=np.arange(1, N + 1), feedback=True)
        return q

    model = load_network(export_network(_net(), str(tmp_path / "fb"), T=T))
    got = model(INP)
    obs = _net().run(INP, verbose=False)
    np.testing.assert_allclose(got, np.asarray(obs.to_numpy("out")),
                               rtol=1e-6, atol=1e-7)


def test_bundle_is_model_definition_free(tmp_path):
    """The bundle directory holds only the program blob, the npz snapshot,
    and JSON metadata -- no pickle, no python, no YAML."""
    net = _rate_net()
    path = export_network(net, str(tmp_path / "clean"), T=T, n_in=1)
    files = sorted(os.listdir(path))
    assert files == ["meta.json", "program.stablehlo.bin", "snapshot.npz"]
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert meta["T"] == T and meta["n_leaves"] >= 1
    assert "cpu" in meta["platforms"]


def test_serving_batched_ensemble(tmp_path):
    """batch=B exports the vmapped ensemble program (run_batch semantics:
    shared params, per-trial state); each trial matches the single-trial
    bundle fed the same input, and per-trial state carries across calls."""
    B = 3
    single = load_network(export_network(_rate_net(), str(tmp_path / "s1"),
                                         T=T, n_in=1))
    batched = load_network(export_network(_rate_net(), str(tmp_path / "sB"),
                                          T=T, n_in=1, batch=B))
    ins = rng0.normal(size=(B, T, 1)).astype(np.float32)
    got = batched(ins)
    assert got.shape == (B, T, N)
    for b in range(B):
        single.reset()
        np.testing.assert_allclose(got[b], single(ins[b]), rtol=1e-6, atol=1e-7)
    # second call: per-trial state carried independently
    got2 = batched(ins)
    for b in range(B):
        single.reset()
        single(ins[b])
        np.testing.assert_allclose(got2[b], single(ins[b]), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="exported shape"):
        batched(ins[0])


def test_serving_vendored_module_no_package(tmp_path):
    """The deployment claim: serving.py loaded STANDALONE (by file path, the
    rectipy_tpu package __init__ never executes) serves the bundle with only
    jax + numpy."""
    import subprocess
    import sys as _sys

    net = _rate_net()
    path = export_network(net, str(tmp_path / "v"), T=T, n_in=1)
    oracle = _rate_net().run(INP, verbose=False).to_numpy("out")
    np.save(str(tmp_path / "oracle.npy"), np.asarray(oracle))
    np.save(str(tmp_path / "inp.npy"), INP)
    serving_py = os.path.join(os.path.dirname(__file__), "..",
                              "rectipy_tpu", "serving.py")
    code = f"""
import importlib.util, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
spec = importlib.util.spec_from_file_location("serving_v", {serving_py!r})
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
assert not any(k.startswith("rectipy_tpu") for k in sys.modules), "package leaked"
model = m.load_network({str(tmp_path / "v")!r})
got = model(np.load({str(tmp_path / "inp.npy")!r}))
np.testing.assert_allclose(got, np.load({str(tmp_path / "oracle.npy")!r}),
                           rtol=1e-6, atol=1e-7)
print("VENDORED-OK")
"""
    out = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "VENDORED-OK" in out.stdout


def test_serving_validation(tmp_path):
    net = _rate_net()
    with pytest.raises(ValueError, match="T=0"):
        export_network(net, str(tmp_path / "x"), T=0)
    model = load_network(export_network(net, str(tmp_path / "y"), T=T, n_in=1))
    with pytest.raises(ValueError, match="exported shape"):
        model(np.zeros((T + 1, 1), dtype=np.float32))
    meta_path = tmp_path / "y" / "meta.json"
    meta = json.load(open(meta_path))
    meta["format_version"] = 999
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="format"):
        load_network(str(tmp_path / "y"))
