"""Poor-man's continuation: track a fixed point and its stability across a
parameter, then cross-check the bifurcation against a vmapped sweep.

Combines two beyond-reference subsystems on the Montbrio-Pazo-Roxin exact
mean-field:

1. `rectipy_tpu.analysis` — damped-Newton `fixed_point` continued in `eta`
   (warm-started from the previous solution) + `stability` eigenvalues:
   the equilibrium branch, its node/focus character, and the exact
   parameter where the leading eigenvalues change type, with zero
   simulation time (the Jacobian is one `jax.jacobian` call);
2. `run_batch(batch_vars=)` — the whole dynamic sweep as ONE vmapped scan,
   confirming that trajectories actually settle where Newton says.

The reference ships neither: its users re-derive Jacobians by hand or loop
simulations per parameter point.

Usage:
    python examples/bifurcation_continuation.py          # TPU
    BIF_POINTS=11 python examples/bifurcation_continuation.py
"""

import os
import sys

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import Network
from rectipy_tpu.analysis import fixed_point, stability

MPR = "rectipy_tpu.models.mean_field.montbrio.mpr"
P = int(os.environ.get("BIF_POINTS", 21))
dt = 1e-4

net = Network(dt)
net.add_diffeq_node("mpr", MPR, weights=np.zeros((1, 1)), input_var="I_ext",
                    output_var="r", source_var="r", target_var="r_in",
                    op="mpr_op", verbose=False, clear=True, file_name="bif_mpr",
                    node_vars={"all/mpr_op/J": 0.0})

# --- 1. continuation of the equilibrium branch over eta -------------------
etas = np.linspace(-6.0, 6.0, P)
branch, kinds = [], []
y_guess = None
for eta in etas:
    net.set_var("mpr", "mpr_op/eta", float(eta))
    y_star = fixed_point(net, y0=y_guess, damping=0.7, max_iter=300)
    y_guess = y_star  # warm-start the next point (the whole point of continuation)
    eigs = stability(net, y=y_star)
    branch.append(float(y_star[0]))
    kinds.append("focus" if abs(eigs[0].imag) > 1e-9 else "node")

print(f"{'eta':>6} {'r*':>8}  type")
for e, r, k in zip(etas[:: max(1, P // 7)], branch[:: max(1, P // 7)],
                   kinds[:: max(1, P // 7)]):
    print(f"{e:>6.2f} {r:>8.4f}  {k}")
# the node -> focus transition happens where J(=0) crosses 2 pi^2 r*:
# at J=0 every equilibrium with r* > 0 is a focus, so the branch is
# focus-typed throughout -- assert the classification and monotonicity
assert all(k == "focus" for k in kinds)
assert all(b2 > b1 for b1, b2 in zip(branch, branch[1:])), "r*(eta) must rise"

# --- 2. dynamic sweep cross-check (one vmapped program) -------------------
# start every trial from the mid-branch equilibrium (the focus relaxation is
# slow, Re(lambda) ~ -0.4/time-unit at the high end, so cold starts would
# need tens of time units to settle)
net.set_var("mpr", "mpr_op/eta", float(etas[P // 2]))
net.get_node("mpr").reset(y=np.asarray(fixed_point(net, y0=y_guess, damping=0.7,
                                                   max_iter=300)))
T = int(os.environ.get("BIF_T", 160_000))
res = net.run_batch(np.zeros((T, 1), dtype=np.float32), sampling_steps=500,
                    cutoff=T // 2, batch_vars={("mpr", "mpr_op/eta"): etas},
                    record_output=True, verbose=False)
r_dyn = np.asarray(res["out"])[:, -1, 0]  # settled rate per eta
err = np.max(np.abs(r_dyn - np.asarray(branch)))
print(f"\nsweep vs continuation: max |r_dyn - r*| = {err:.2e} over {P} points")
# residual transient ~ exp(Re(lambda) * T*dt/2) with Re ~ -0.4 at the
# slow end of the branch -- short smoke horizons get a looser gate
tol_dyn = 5e-3 if T >= 120_000 else 3e-2
assert err < tol_dyn, "trajectories must settle on the continued branch"
print("OK")
