"""Kuramoto synchronization sweep: phase oscillators with heterogeneous
natural frequencies under increasing global coupling strength K, tracking
the order parameter r(t) = |mean(exp(i theta))|.

The pairwise sin(theta_j - theta_i) coupling runs as TWO dense matvecs on
the MXU via the angle-difference identity (see
rectipy_tpu/models/rate_neurons/kuramoto.yaml) -- no reference analog; this
extends the template library.  The whole sweep is a handful of fused
lax.scan programs.

Run: python examples/kuramoto_sync.py           (N=2000, 3 coupling levels)
Env: KUR_N, KUR_STEPS override the size.
"""

import os

import numpy as np

from rectipy_tpu import Network

N = int(os.environ.get("KUR_N", 2000))
steps = int(os.environ.get("KUR_STEPS", 20_000))
dt = 1e-3
rng = np.random.default_rng(0)

# Lorentzian natural frequencies (half-width 0.5): critical coupling for
# all-to-all Kuramoto with a Lorentzian is K_c = 2 * half_width = 1.0
omegas = 1.0 + 0.5 * np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))
theta0 = rng.uniform(-np.pi, np.pi, N)


def order_parameter(theta_traj):
    return np.abs(np.exp(1j * theta_traj).mean(axis=-1))


for K in (0.5, 1.5, 4.0):
    Wg = np.full((N, N), K / N)
    net = Network(dt)
    net.add_diffeq_node(
        "kur", "rectipy_tpu.models.rate_neurons.kuramoto.kuramoto", n=N,
        edges=[("s_t", "sin_in", Wg), ("c_t", "cos_in", Wg)],
        input_var="I_ext", output_var="theta",
        node_vars={"all/kuramoto_op/omega": omegas,
                   "all/kuramoto_op/theta": theta0})
    obs = net.run(np.zeros((steps, 1), dtype=np.float32), sampling_steps=200,
                  verbose=False)
    th = obs.to_numpy("out")
    r = order_parameter(th)
    regime = "incoherent" if K < 1.0 else "synchronized"
    print(f"K={K:4.1f} ({regime:>12}): r(0)={r[0]:.3f} -> r(end)={r[-1]:.3f}")
