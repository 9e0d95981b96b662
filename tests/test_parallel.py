"""Multi-device tests on a virtual 8-device CPU mesh: population sharding of
the coupling matmul and state, data-parallel trajectory batches, and the full
sharded training step (the dryrun_multichip contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rectipy_tpu import Network
from rectipy_tpu.parallel import make_mesh, shard_network_arrays, sharded_run, sharded_train_step
from rectipy_tpu.train import get_loss_function, get_optimizer

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"


def _build(n, weights, tau=None):
    net = Network(1e-2, dtype=jnp.float64)
    node_vars = {"all/li_op/tau": tau} if tau is not None else None
    net.add_diffeq_node("rnn", TANH, weights=weights, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", node_vars=node_vars,
                        train_params=["weights"])
    net.compile()
    return net


def test_make_mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(8, data=2)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(8, data=3)
    with pytest.raises(ValueError):
        make_mesh(16)


def test_sharded_run_matches_single_device():
    n = 32
    rng = np.random.default_rng(0)
    W = rng.normal(size=(n, n)) * 0.2
    tau = rng.uniform(5.0, 15.0, size=(n,))
    inputs = jnp.asarray(rng.normal(size=(20, n)))

    # single-device reference trajectory
    net = _build(n, W, tau)
    ref = net.run(np.asarray(inputs), verbose=False).to_numpy("out")

    # sharded trajectory over an 8-way model mesh
    net2 = _build(n, W, tau)
    mesh = make_mesh(8, data=1)
    state = shard_network_arrays(net2.init_state(), n, mesh)
    params = shard_network_arrays(net2.parameters_pytree(), n, mesh)
    # verify the coupling matrix actually got row-sharded
    wsharding = params["nodes"]["rnn"]["weights"].sharding
    assert wsharding.spec == P("model", None)
    run = sharded_run(net2, mesh)
    with mesh:
        _, outs = run(state, params, inputs)
    np.testing.assert_allclose(np.asarray(outs), ref, rtol=1e-10, atol=1e-10)


def test_sharded_train_step_runs_and_reduces():
    n = 16
    rng = np.random.default_rng(1)
    net = _build(n, rng.normal(size=(n, n)) * 0.1)
    mesh = make_mesh(8, data=2)
    params = net.parameters_pytree()
    train, frozen = net._partition(params, net.trainable_paths())
    train = shard_network_arrays(train, n, mesh)
    frozen = shard_network_arrays(frozen, n, mesh)
    state0 = shard_network_arrays(net.init_state(), n, mesh)
    opt = get_optimizer("adam", 1e-2)
    opt_state = opt.init(train)
    loss_fn = get_loss_function("mse")

    batch, T = 4, 6
    inputs = jax.device_put(jnp.asarray(rng.normal(size=(batch, T, n))),
                            NamedSharding(mesh, P("data", None, None)))
    targets = jax.device_put(jnp.zeros((batch, T, n)),
                             NamedSharding(mesh, P("data", None, None)))
    step = sharded_train_step(net, loss_fn, opt, mesh)
    with mesh:
        train1, opt_state, l1 = step(train, frozen, opt_state, state0, inputs, targets)
        train2, opt_state, l2 = step(train1, frozen, opt_state, state0, inputs, targets)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1), "sharded training step did not reduce the loss"
    # weights actually changed and stayed sharded
    dw = jax.tree.leaves(jax.tree.map(lambda a, b: jnp.sum(jnp.abs(a - b)), train, train2))
    assert float(sum(dw)) > 0


def test_shard_network_arrays_replicates_indivisible():
    n = 10  # not divisible by 8
    mesh = make_mesh(8, data=1)
    arr = jnp.zeros((n, n))
    placed = shard_network_arrays({"w": arr}, n, mesh)
    assert placed["w"].sharding.spec == P()  # replicated, not an error


def test_graft_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    state, out = jax.jit(fn)(*args)
    assert out.shape == (256,)
    g.dryrun_multichip(8)


def test_sharded_run_with_delay_edge():
    """Delay ring buffers (DDE support) shard over the model axis alongside
    the population: the (N, D) buffer row-shards, and the sharded trajectory
    equals the single-device one."""
    n = 32
    rng = np.random.default_rng(2)
    W = rng.normal(size=(n, n)) * 0.2
    delays = rng.integers(0, 5, size=n)

    def build():
        net = Network(1e-2, dtype=jnp.float64)
        net.add_func_node("inp", n, activation_function="identity")
        net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in")
        net.add_edge("inp", "rnn", weights=np.eye(n), delays=delays)
        net.compile()
        return net

    inputs = jnp.asarray(rng.normal(size=(15, n)))
    ref = build().run(np.asarray(inputs), verbose=False).to_numpy("out")

    net2 = build()
    mesh = make_mesh(8, data=1)
    state = shard_network_arrays(net2.init_state(), n, mesh)
    params = shard_network_arrays(net2.parameters_pytree(), n, mesh)
    assert state["edges"]["inp->rnn"].sharding.spec == P("model", None)
    run = sharded_run(net2, mesh)
    with mesh:
        _, outs = run(state, params, inputs)
    np.testing.assert_allclose(np.asarray(outs), ref, rtol=1e-10, atol=1e-10)


def test_sharded_compilation_inserts_collectives():
    """The row-sharded coupling matvec requires gathering the source rates:
    the compiled multi-device program must contain collective ops."""
    n = 32
    rng = np.random.default_rng(4)
    net = _build(n, rng.normal(size=(n, n)) * 0.2)
    mesh = make_mesh(8, data=1)
    state = shard_network_arrays(net.init_state(), n, mesh)
    params = shard_network_arrays(net.parameters_pytree(), n, mesh)
    step = net.make_step()

    import jax

    @jax.jit
    def one(state, params, x):
        s, out, _ = step(state, params, x)
        return s, out

    x = jnp.zeros(n)
    with mesh:
        lowered = one.lower(state, params, x)
        hlo = lowered.compile().as_text()
    assert ("all-gather" in hlo) or ("all-reduce" in hlo) or ("collective" in hlo), (
        "no collectives in the sharded program -- GSPMD sharding not applied")


def test_sharded_train_step_gradient_reduction_spans_data_axis():
    n = 16
    rng = np.random.default_rng(5)
    net = _build(n, rng.normal(size=(n, n)) * 0.1)
    mesh = make_mesh(8, data=4)
    params = net.parameters_pytree()
    train, frozen = net._partition(params, net.trainable_paths())
    train = shard_network_arrays(train, n, mesh)
    frozen = shard_network_arrays(frozen, n, mesh)
    state0 = shard_network_arrays(net.init_state(), n, mesh)
    opt = get_optimizer("sgd", 1e-2)
    opt_state = opt.init(train)
    step = sharded_train_step(net, get_loss_function("mse"), opt, mesh)
    rngs = np.random.default_rng(6)
    inputs = jax.device_put(jnp.asarray(rngs.normal(size=(8, 5, n))),
                            NamedSharding(mesh, P("data", None, None)))
    targets = jax.device_put(jnp.zeros((8, 5, n)),
                             NamedSharding(mesh, P("data", None, None)))
    with mesh:
        t1, _, l1 = step(train, frozen, opt_state, state0, inputs, targets)
    # replicated-update invariant: the trained weights are identical on every
    # device (grad psum across the data axis happened)
    w = t1["nodes"]["rnn"]["weights"]
    shards = [np.asarray(si.data) for si in w.addressable_shards]
    rows_per = n // mesh.shape["model"]
    assert shards[0].shape[0] == rows_per  # model-sharded
    assert np.isfinite(float(l1))


def test_sharded_run_int8_coupling_matches_single_device():
    """int8 coupling under the mesh: the quantized weight rows AND their
    per-row scales (N,) shard along the model axis; trajectory must equal the
    single-device int8 run exactly."""
    n = 32
    rng = np.random.default_rng(4)
    W = rng.normal(size=(n, n)) * 0.2
    inputs = jnp.asarray(rng.normal(size=(20, n)))

    def build():
        net = Network(1e-2, dtype=jnp.float32)
        net.add_diffeq_node("rnn", TANH, weights=W, input_var="li_op/I_ext",
                            output_var="li_op/v", source_var="tanh_op/r",
                            target_var="li_op/r_in", coupling_dtype="int8")
        net.compile()
        return net

    ref = build().run(np.asarray(inputs), verbose=False).to_numpy("out")

    net2 = build()
    mesh = make_mesh(8, data=1)
    state = shard_network_arrays(net2.init_state(), n, mesh)
    params = shard_network_arrays(net2.parameters_pytree(), n, mesh)
    node_params = params["nodes"]["rnn"]
    wkey = next(k for k in node_params if k.endswith("weights"))
    assert node_params[wkey].dtype == jnp.int8
    assert node_params[wkey].sharding.spec == P("model", None)
    skey = next(k for k in node_params if k.endswith("__scale"))
    assert node_params[skey].sharding.spec == P("model")
    run = sharded_run(net2, mesh)
    with mesh:
        _, outs = run(state, params, inputs)
    np.testing.assert_allclose(np.asarray(outs), ref, rtol=1e-6, atol=1e-6)
