"""Multi-process (DCN-shaped) distributed correctness.

SURVEY.md §2.9: ICI carries collectives within a host, DCN across hosts.
Single-process virtual meshes (tests/test_parallel.py) exercise the ICI
pattern; here TWO OS processes each own 4 virtual CPU devices and form one
8-device global mesh via ``jax.distributed.initialize`` -- the cross-process
boundary stands in for DCN.  The public ``run(mesh=)`` / ``fit_bptt(mesh=)``
APIs must produce results that (a) agree bit-for-bit across processes and
(b) match the single-process execution of the same network.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from rectipy_tpu import Network

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_dcn_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """The worker's exact workload on the in-process (single-device) path."""
    n, T, dt = 32, 40, 1e-2
    rng = np.random.default_rng(0)
    W = rng.normal(size=(n, n)) * 0.2
    inp = rng.normal(size=(T, n)).astype(np.float64)
    tgt = (0.3 * rng.normal(size=(T, n))).astype(np.float64)

    def build():
        net = Network(dt, dtype=jnp.float64)
        net.add_diffeq_node(
            "rnn", "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
            weights=W, input_var="li_op/I_ext", output_var="li_op/v",
            source_var="tanh_op/r", target_var="li_op/r_in",
            train_params=["weights"])
        return net

    obs = build().run(inp, sampling_steps=2, verbose=False,
                      record_output=False, record_vars=[("rnn", "v", True)])
    trace = np.asarray(obs.to_numpy(("rnn", "v")), dtype=np.float64)
    obs_fit = build().fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                               verbose=False)
    losses = [float(x) for x in obs_fit["epoch_loss"]]
    return trace, losses


def test_two_process_global_mesh_matches_single_process():
    # bounded by the workers' communicate(timeout=420) below (pytest-timeout
    # is not available in this image)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    results = []
    errors = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        if p.returncode != 0:
            errors.append(f"worker rc={p.returncode}:\n{err[-2000:]}")
        else:
            results.append(json.loads(out.strip().splitlines()[-1]))
    assert not errors, "\n".join(errors)
    assert len(results) == 2

    # (a) both processes computed over the SAME 8-device global mesh and
    # fetched identical replicated results
    for r in results:
        assert r["n_devices"] == 8
    np.testing.assert_array_equal(np.asarray(results[0]["trace"]),
                                  np.asarray(results[1]["trace"]))
    assert results[0]["losses"] == results[1]["losses"]

    # (b) the distributed execution matches the single-process reference
    trace_ref, losses_ref = _single_process_reference()
    np.testing.assert_allclose(np.asarray(results[0]["trace"]), trace_ref,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(results[0]["losses"]), losses_ref,
                               rtol=1e-9)
