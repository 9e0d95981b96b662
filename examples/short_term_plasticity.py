"""Short-term synaptic plasticity: Tsodyks-Markram dynamic synapses.

Beyond-reference capability (the reference edge family,
/root/reference/rectipy/edges.py:8-234, is static/delay/filter only).
``add_edge(..., tau_facil=, tau_depress=, U=)`` builds a ``LinearSTP`` edge
whose per-channel utilization (u) and resource (x) variables ride the
network scan carry -- the whole protocol below is a handful of fused
on-device scans.

Reproduced classics (Tsodyks, Pawelzik & Markram 1998, Neural Comput
10:821):

1. frequency-dependent depression -- a high-utilization synapse driven by
   regular spike trains transmits a steady-state amplitude that falls with
   the drive rate (the 1/f limiting behavior);
2. paired-pulse facilitation -- a low-utilization facilitating synapse
   transmits the second of two closely spaced spikes more strongly.

Usage:
    python examples/short_term_plasticity.py            # TPU
    STP_RATES="5,20,50" python examples/short_term_plasticity.py
"""

import os
import sys

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import Network

dt = 1e-3  # 1 ms steps; taus below are in seconds
RATES = [float(r) for r in os.environ.get("STP_RATES", "5,10,20,40").split(",")]
T = int(os.environ.get("STP_T", 2000))


def spike_train(rate_hz: float, steps: int) -> np.ndarray:
    """Regular impulse train (per-spike area 1 -> amplitude 1/dt)."""
    period = max(1, int(round(1.0 / (rate_hz * dt))))
    x = np.zeros((steps, 1))
    x[::period, 0] = 1.0 / dt
    return x, period


def synapse(tau_facil: float, tau_depress: float, U: float) -> Network:
    """input -> TM synapse -> identity readout: the network output IS the
    transmitted synaptic drive."""
    net = Network(dt)
    net.add_func_node("pre", 1, activation_function="identity")
    net.add_func_node("post", 1, activation_function="identity")
    net.add_edge("pre", "post", weights=np.ones((1, 1)), tau_facil=tau_facil,
                 tau_depress=tau_depress, U=U)
    return net


# ---- 1. frequency-dependent depression (high U, slow recovery) -----------
print("frequency-dependent depression (U=0.5, tau_depress=300 ms):")
print(f"{'rate [Hz]':>10} {'first':>8} {'steady':>8} {'ratio':>7}")
steady_ratios = []
for rate in RATES:
    x, period = spike_train(rate, T)
    net = synapse(tau_facil=0.0, tau_depress=0.3, U=0.5)
    out = net.run(x, sampling_steps=1, verbose=False).to_numpy("out")[:, 0]
    resp = out[::period] * dt  # per-spike transmitted mass
    first, steady = resp[0], resp[-3:].mean()
    steady_ratios.append(steady / first)
    print(f"{rate:>10.0f} {first:>8.3f} {steady:>8.3f} {steady / first:>7.3f}")
assert all(b < a + 1e-9 for a, b in zip(steady_ratios, steady_ratios[1:])), \
    "steady-state transmission must fall with drive rate"

# ---- 2. paired-pulse facilitation (low U, slow facilitation decay) -------
gap_ms = int(os.environ.get("STP_GAP_MS", 25))
x = np.zeros((40 + gap_ms, 1))
x[5, 0] = x[5 + gap_ms, 0] = 1.0 / dt
net = synapse(tau_facil=0.5, tau_depress=1.0, U=0.1)
out = net.run(x, sampling_steps=1, verbose=False).to_numpy("out")[:, 0]
p1, p2 = out[5] * dt, out[5 + gap_ms] * dt
print(f"\npaired-pulse facilitation (U=0.1, tau_facil=500 ms, gap {gap_ms} ms):")
print(f"  pulse 1: {p1:.4f}   pulse 2: {p2:.4f}   PPR = {p2 / p1:.3f}")
assert p2 > p1, "facilitating synapse must potentiate the second pulse"

print("\nOK")
