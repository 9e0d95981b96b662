"""Fused Pallas kernel fast paths.

Two attach APIs swap a node's scan body for a fused TPU kernel (matvec in
VMEM scratch on the MXU + the elementwise tail in one pass over W):

- ``attach_fused_qif_step``     hand-written QIF/QIF-SFA kernel
- ``attach_generic_fused_step`` works for ANY single-coupling template via
                                the DSL's tile-local vector field

Both match the XLA path numerically; the practical win is compile time
(measured 3-12s vs 80-470s for big XLA scans on the remote-compile service)
at steady-state throughput parity.  Not for multi-chip sharding (Pallas
custom calls don't partition under GSPMD) or gradient-based training (use the
differentiable XLA path).
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
from rectipy_tpu.ops.generic_fused import attach_generic_fused_step

N = int(os.environ.get("FUSED_N", 2000))
rng = np.random.default_rng(0)
W = np.abs(rng.normal(size=(N, N))) * (0.5 / N)
tau = rng.uniform(10.0, 15.0, size=N)

net = Network(1e-2, dtype=jnp.float32)
net.add_diffeq_node(
    "lif", "rectipy_tpu.models.spiking_neurons.lif.lif", weights=W,
    source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
    op="lif_op", spike_var="spike", reset_var="v", dtype=jnp.float32,
    spike_threshold=10.0, spike_reset=-10.0,
    node_vars={"eta": 10.0, "tau": tau, "tau_s": 5.0},
    coupling_dtype="bfloat16",
)
net.compile()

# one call swaps the node's step for the fused kernel
attach_generic_fused_step(net.get_node("lif"), tile=512,
                          interpret=jax.devices()[0].platform == "cpu")

T = int(os.environ.get("FUSED_T", 5000))
obs = net.run(np.zeros((T, N), dtype=np.float32), record_output=False,
              record_vars=[("lif", "s", True)], sampling_steps=100, verbose=False)
s = obs.to_numpy(("lif", "s"))
print(f"fused LIF run: {T} steps x N={N}; mean synaptic activity "
      f"[{s.min():.4f}, {s.max():.4f}]")
