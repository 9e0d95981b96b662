"""rectipy_tpu: TPU-native recurrent neural network simulation and training.

A ground-up JAX/XLA/Pallas re-design with the capabilities of RectiPy
(reference: /root/reference, v0.12.2): ODE-defined rate and spiking neuron
populations authored as YAML templates, composed into graphs, integrated with
explicit Euler under ``jax.lax.scan``, and trained via BPTT (surrogate spike
gradients), recursive least squares, or ridge regression -- all as single
fused XLA programs, scalable over device meshes via ``jax.sharding``.
"""

__author__ = "rectipy_tpu developers"
__status__ = "Development"
__version__ = "0.2.0"

from .dsl import CircuitTemplate, NodeTemplate, OperatorTemplate, clear_frontend_caches, lower
from .edges import (RLS, STDP, BlockSparseSTDP, Linear, LinearFilter, LinearMasked, LinearMemory,
                    LinearMemoryFilter, LinearMemoryMatrix, LinearSTP,
                    BlockSparseLinear)
from .inputs import Constant, InputSpec, Noise, Poisson, Pulse, Sine, Wiener
from .network import FeedbackNetwork, Network
from .nodes import InstantNode, MultiSpikeResetNet, RateNet, SpikeNet, SpikeResetNet
from .observer import Observer
from .ops.sparse import BlockSparseCoupling, block_random_connectivity
from .utility import (
    circular_connectivity,
    input_connections,
    line_connectivity,
    normalize,
    random_connectivity,
    wta_score,
)

__all__ = [
    "CircuitTemplate",
    "FeedbackNetwork",
    "InstantNode",
    "Linear",
    "LinearFilter",
    "LinearMasked",
    "LinearMemory",
    "LinearMemoryFilter",
    "LinearMemoryMatrix",
    "LinearSTP",
    "BlockSparseLinear",
    "BlockSparseSTDP",
    "MultiSpikeResetNet",
    "Network",
    "NodeTemplate",
    "Observer",
    "OperatorTemplate",
    "RLS",
    "STDP",
    "RateNet",
    "BlockSparseCoupling",
    "block_random_connectivity",
    "SpikeNet",
    "SpikeResetNet",
    "Constant",
    "InputSpec",
    "Noise",
    "Poisson",
    "Pulse",
    "Sine",
    "Wiener",
    "circular_connectivity",
    "clear_frontend_caches",
    "input_connections",
    "line_connectivity",
    "lower",
    "normalize",
    "random_connectivity",
    "wta_score",
]
