"""Stretch config (BASELINE.md configs[4]): a large QIF population with
heterogeneous delay coupling, population-sharded over the device mesh.

On a real pod, run with N=100_000 over the ICI mesh (the coupling matrix
row-shards; GSPMD all-gathers the synaptic vector per step and the delay ring
buffers shard with their rows).  For validation without hardware:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    QIF_N=1024 QIF_T=200 python examples/qif_100k_sharded.py
"""

import os
import sys

try:  # prefer the installed package (pip install -e .)
    import rectipy_tpu  # noqa: F401
except ImportError:  # fallback: run from a source checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rectipy_tpu import Network
from rectipy_tpu.native import sample_fixed_fanin
from rectipy_tpu.parallel import make_mesh, shard_network_arrays, sharded_run

N = int(os.environ.get("QIF_N", 100_000))
T = int(os.environ.get("QIF_T", 10_000))
FAN_IN = max(4, min(1000, N // 8))
dt = 1e-4

# fixed-fan-in coupling sampled by the native C++ generator (O(N*k): the
# numpy argsort construction needs ~30 min + 80 GB at N=100k)
cols = sample_fixed_fanin(N, N, FAN_IN, seed=0)
W = np.zeros((N, N), dtype=np.float32)
W[np.repeat(np.arange(N), FAN_IN), cols.ravel()] = 1.0 / FAN_IN

etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))
delays = np.random.default_rng(1).integers(0, 8, size=N)

net = Network(dt)
net.add_func_node("inp", N, activation_function="identity")
net.add_diffeq_node(
    "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", weights=W,
    source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
    spike_var="spike", spike_def="v", op="qif_sfa_op",
    spike_threshold=1e2, spike_reset=-1e2,
    node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": 0.05,
               "all/qif_sfa_op/k": 15.0},
    coupling_dtype="bfloat16",
)
# delay-coupled external drive (DDE ring buffer, sharded with its rows)
net.add_edge("inp", "qif", weights=np.eye(N, dtype=np.float32), delays=delays)
net.compile()

mesh = make_mesh(len(jax.devices()), data=1)
print("mesh:", dict(mesh.shape), "N:", N, "fan-in:", FAN_IN)

state = shard_network_arrays(net.init_state(), N, mesh)
params = shard_network_arrays(net.parameters_pytree(), N, mesh)
run = sharded_run(net, mesh)

inputs = jnp.zeros((T, N), dtype=jnp.float32)
inputs = inputs.at[T // 4: 3 * T // 4].set(3.0)

import time

with mesh:
    _, outs = run(state, params, inputs[:1])  # compile
    jax.block_until_ready(outs)
    t0 = time.time()
    stateT, outs = run(state, params, inputs)
    jax.block_until_ready(outs)
    el = time.time() - t0

print(f"{T} steps x N={N} over {len(jax.devices())} device(s): {el:.2f}s "
      f"-> {T * N / el:.3e} neuron-updates/s")
print("mean(s) final:", float(jnp.mean(outs[-1])))
