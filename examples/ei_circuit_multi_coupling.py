"""Dale's-law E/I circuit with two coupling matrices on one population.

Mirrors how the reference would express this through PyRates: a
CircuitTemplate with several ``add_edges_from_matrix`` calls (reference
consumption: /root/reference/rectipy/nodes.py:241-252).  Here the excitatory
(sparse, positive) and inhibitory (dense, negative) projections stay separate
matrices end-to-end -- the lowering emits one fused step with BOTH matvecs,
and ``attach_generic_fused_step`` fuses them into a single Pallas kernel
(one VMEM accumulator per coupling).
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
from rectipy_tpu.dsl.parser import CircuitTemplate, NodeTemplate
from rectipy_tpu.ops.generic_fused import attach_generic_fused_step
from rectipy_tpu.utility import random_connectivity

N = int(os.environ.get("EI_N", 1000))
rng = np.random.default_rng(0)

# excitatory: sparse positive (row-normalized, gain 2); inhibitory: dense
# negative with row sums ~ -1.2 -> net recurrent gain ~ 0.8 (fluctuating
# regime rather than tanh saturation)
W_exc = random_connectivity(N, N, 0.1, normalize=True) * 2.0
W_inh = -np.abs(rng.normal(size=(N, N))) * (1.5 / N)

tmpl = NodeTemplate.from_yaml("neuron_model_templates.rate_neurons.leaky_integrator.tanh")
circuit = CircuitTemplate("ei", {f"p{i}": tmpl for i in range(N)})
circuit.add_edges_from_matrix("tanh_op/r", "li_op/r_in", weight=W_exc)
circuit.add_edges_from_matrix("tanh_op/r", "li_op/r_in", weight=W_inh)

net = Network(1e-2, dtype=jnp.float32)
net.add_diffeq_node("ei", circuit, input_var="li_op/I_ext",
                    output_var="tanh_op/r", dtype=jnp.float32)
net.compile()
attach_generic_fused_step(net.get_node("ei"), tile=256,
                          interpret=(jax.devices()[0].platform == "cpu"
                                     or os.environ.get("EI_INTERPRET", "0") == "1"))

T = int(os.environ.get("EI_T", 2000))
inp = rng.normal(size=(T, N)).astype(np.float32) * 0.1
obs = net.run(inp, record_output=True, sampling_steps=20, verbose=False)
r = obs.to_numpy("out")
print(f"E/I circuit: {T} steps x N={N}, 2 fused couplings; "
      f"rate range [{r.min():.4f}, {r.max():.4f}], mean |r|={np.abs(r).mean():.4f}")
