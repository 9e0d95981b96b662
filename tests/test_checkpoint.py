"""Checkpoint/resume tests: network snapshots round-trip and training resumes
bit-compatibly (capability absent in the reference; SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rectipy_tpu import Network
from rectipy_tpu.checkpoint import TrainCheckpointer, restore_network, save_network
from rectipy_tpu.train import get_optimizer

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"


def _build(n, W):
    net = Network(1e-2, dtype=jnp.float64)
    net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", train_params=["weights"])
    net.compile()
    return net


def test_network_snapshot_roundtrip(tmp_path):
    n = 8
    rng = np.random.default_rng(0)
    W = rng.normal(size=(n, n)) * 0.3
    net = _build(n, W)
    inp = rng.normal(size=(30, n))
    net.run(inp, verbose=False)  # advance the state
    y_ref = np.asarray(net.get_node("rnn").y)

    save_network(net, str(tmp_path / "ckpt"))

    # fresh network restored from disk continues the exact same trajectory
    net2 = _build(n, np.zeros((n, n)))
    restore_network(net2, str(tmp_path / "ckpt"))
    np.testing.assert_allclose(np.asarray(net2.get_node("rnn").y), y_ref)
    np.testing.assert_allclose(np.asarray(net2.get_node("rnn")["weights"]), W)

    inp2 = rng.normal(size=(10, n))
    out_a = net.run(inp2, verbose=False).to_numpy("out")
    out_b = net2.run(inp2, verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_a, out_b, atol=1e-12)


def test_train_checkpointer_rolls_and_restores(tmp_path):
    ckpt = TrainCheckpointer(str(tmp_path / "ckpts"), keep=2)
    opt = get_optimizer("adam", 1e-3)
    train = {"w": jnp.arange(4.0)}
    opt_state = opt.init(train)
    for step in [10, 20, 30]:
        ckpt.save(step, train={"w": train["w"] + step}, opt_state=opt_state)
    assert ckpt.all_steps() == [20, 30]  # keep=2 pruned step 10
    step, pieces = ckpt.restore_latest({"train": {"w": train["w"]}, "opt_state": opt_state})
    assert step == 30
    np.testing.assert_allclose(np.asarray(pieces["train"]["w"]), np.arange(4.0) + 30)


def test_restore_missing_raises(tmp_path):
    ckpt = TrainCheckpointer(str(tmp_path / "empty"))
    step, pieces = ckpt.restore_latest({})
    assert step is None and pieces is None
