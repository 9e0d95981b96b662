"""Worker for the multi-process (DCN-shaped) distributed test.

Each process owns 4 virtual CPU devices; two processes form one 8-device
global mesh (SURVEY.md §2.9: ICI within a host, DCN across hosts -- here the
cross-process edge stands in for DCN).  The worker builds the same
deterministic network in every process, runs the public ``run(mesh=)`` and
``fit_bptt(mesh=)`` APIs over the GLOBAL mesh, and prints replicated results
(mean traces, epoch losses) as one JSON line for the parent to compare.

Usage: python _dcn_worker.py <process_id> <num_processes> <coordinator_port>
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main(pid: int, nprocs: int, port: int) -> None:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs, jax.devices()

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rectipy_tpu import Network
    from rectipy_tpu.parallel import make_mesh

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

    mesh = make_mesh(4 * nprocs, data=1)  # global mesh spanning both processes

    # public run API over the global mesh; record a REPLICATED reduction so
    # every process can fetch it (per-neuron records stay sharded)
    net = build()
    obs = net.run(inp, sampling_steps=2, verbose=False, mesh=mesh,
                  record_output=False, record_vars=[("rnn", "v", True)])
    trace = np.asarray(obs.to_numpy(("rnn", "v")), dtype=np.float64)

    # public trainer API over the global mesh: 2 epochs of adam
    net2 = build()
    obs_fit = net2.fit_bptt([inp] * 2, [tgt] * 2, optimizer="adam", lr=1e-3,
                            verbose=False, mesh=mesh)
    losses = [float(x) for x in obs_fit["epoch_loss"]]

    print(json.dumps({"process_id": pid, "n_devices": len(jax.devices()),
                      "trace": trace.tolist(), "losses": losses}), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
