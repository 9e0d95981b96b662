"""Delay-coupled Jansen-Rit masses: synchronization, delay-selected
frequency, and amplitude death.

The whole-brain-modeling workload: neural-mass nodes coupled by FINITE
CONDUCTION DELAYS.  Two heterogeneous Jansen-Rit populations (different
drives -> different intrinsic rhythms, 4.25 vs 11 Hz) are wired
bidirectionally through `LinearMemory` delay edges (one direction is a
`feedback=True` edge, closing the loop with the one-step-delayed
recurrence semantics) -- the delay ring buffers ride the same fused scan
as the states, so the delayed circuit is still ONE device program.

Measured here (K = coupling gain, d = delay):
- uncoupled: incoherent (max cross-correlation ~0.03);
- K=30, d=10 ms: both masses LOCK at 9 Hz, coherence 0.99;
- K=30, d=25 ms: still locked -- but at 11.5 Hz (the delay selects the
  locked mode: a longer loop favors a slower/faster resonance);
- K=120, d=10 ms: AMPLITUDE DEATH -- strong delayed coupling quenches both
  rhythms to a fixed point (the classic oscillator-death bifurcation).

The reference supports delay edges but would integrate this circuit with
one Python step per dt (/root/reference/rectipy/network.py:588-599); here
the 60k-step delayed two-mass run is a single scan.

Usage:
    python examples/delay_coupled_masses.py
    DJR_T=30000 python examples/delay_coupled_masses.py
"""

import os
import sys

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import FeedbackNetwork, Network

JR = "rectipy_tpu.models.mean_field.jansen_rit.jansen_rit"
T = int(os.environ.get("DJR_T", 60_000))
I1, I2 = 140.0, 260.0
dt = 1e-4  # seconds
SAMP = 10
CUT = T // 30  # settle time, in samples


def add_jr(net, lbl, drive):
    net.add_diffeq_node(lbl, JR, weights=np.zeros((1, 1)), source_var="m_py",
                        target_var="r_in", input_var="r_in", output_var="m_py",
                        verbose=False, clear=True, file_name=f"djr_{lbl}",
                        node_vars={"all/jr_op/I_ext": drive})


def run_single(drive):
    net = Network(dt, dtype=np.float64)
    add_jr(net, "jr", drive)
    return net.run(np.zeros((T, 1)), sampling_steps=SAMP,
                   verbose=False).to_numpy("out")[CUT:, 0]


def run_coupled(K, d_ms):
    net = FeedbackNetwork(dt, dtype=np.float64)
    add_jr(net, "jr1", I1)
    add_jr(net, "jr2", I2)
    d = np.array([int(d_ms * 1e-3 / dt)])
    net.add_edge("jr1", "jr2", weights=np.array([[K]]), delays=d)
    net.add_edge("jr2", "jr1", feedback=True, weights=np.array([[K]]), delays=d)
    obs = net.run(np.zeros((T, 1)), sampling_steps=SAMP, verbose=False,
                  record_vars=[("jr1", "out", False)])
    return obs.to_numpy(("jr1", "out"))[CUT:, 0], obs.to_numpy("out")[CUT:, 0]


def coherence(a, b):
    a, b = a - a.mean(), b - b.mean()
    cc = np.correlate(a, b, "full") / (np.linalg.norm(a) * np.linalg.norm(b))
    return float(np.abs(cc).max())


def f_dom(x):
    sp = np.abs(np.fft.rfft(x - x.mean()))
    freqs = np.fft.rfftfreq(len(x), d=dt * SAMP)
    return float(freqs[np.argmax(sp)])


a0, b0 = run_single(I1), run_single(I2)
coh0 = coherence(a0, b0)
print(f"{'config':>16} {'f1 (Hz)':>8} {'f2 (Hz)':>8} {'coherence':>10}")
print(f"{'uncoupled':>16} {f_dom(a0):>8.2f} {f_dom(b0):>8.2f} {coh0:>10.3f}")

results = {}
for K, d_ms in [(30.0, 10.0), (30.0, 25.0), (120.0, 10.0)]:
    a, b = run_coupled(K, d_ms)
    amp = min(a.std(), b.std())
    if amp < 1e-3:
        print(f"{f'K={K:g} d={d_ms:g}ms':>16} {'--':>8} {'--':>8} "
              f"{'DEATH':>10}  (both amplitudes quenched)")
        results[(K, d_ms)] = ("death", amp)
    else:
        f1, f2, coh = f_dom(a), f_dom(b), coherence(a, b)
        print(f"{f'K={K:g} d={d_ms:g}ms':>16} {f1:>8.2f} {f2:>8.2f} {coh:>10.3f}")
        results[(K, d_ms)] = (f1, f2, coh)

# the three regimes, asserted
assert coh0 < 0.3 and abs(f_dom(a0) - f_dom(b0)) > 2.0, "controls should drift"
f1, f2, coh = results[(30.0, 10.0)]
assert coh > 0.9 and abs(f1 - f2) < 0.5, "d=10ms should lock both masses"
f1b, f2b, cohb = results[(30.0, 25.0)]
assert cohb > 0.9 and f1b > f1 + 1.0, \
    "the longer delay should select a different (here higher) locked mode"
assert results[(120.0, 10.0)][0] == "death", \
    "strong delayed coupling should quench the rhythms"
print("\ndelay-coupled dynamics verified: locking, delay-selected frequency, "
      "amplitude death")
