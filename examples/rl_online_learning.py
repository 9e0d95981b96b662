"""Online reservoir learning of a nonlinear signal transform.

Port of the reference workload /root/reference/documentation/rl_example.py:
a tanh rate reservoir receives two sinusoids and learns to output their
product ONLINE (no backprop).  The reference script registers an RLS readout
edge (rl_example.py:39) and then calls ``fit_eprop`` -- which raises
NotImplementedError in the reference (network.py:858-896).  This port runs
the documented intent end-to-end with both online learners this framework
implements:

1. ``fit_eprop``: three-factor delta rule with feedback-alignment error
   broadcast into the input layer (+ L2 ``decay`` -- without it the
   unregularized rule tracks online but its frozen readout diverges);
2. ``fit_rls``: FORCE-style recursive least squares on the same edge
   (the reference's extended-RLS formula, edges.py:227-234), which handles
   the correlated reservoir features the first-order rule cannot whiten.

The fitted readout is then evaluated with frozen weights via ``test()``.
(A closed-form ``fit_ridge`` on the same features reaches MSE ~0.007 --
the online rules trade accuracy for O(1) memory and streaming updates.)

Run: python examples/rl_online_learning.py
"""

import os
import sys

try:  # prefer the installed package (pip install -e .)
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from rectipy_tpu import Network

N = int(os.environ.get("RL_N", 200))
steps = int(os.environ.get("RL_STEPS", 120_000))  # reference: 1_000_000
test_steps = min(int(os.environ.get("RL_TEST_STEPS", 20_000)), steps)
m = 2
dt = 1e-2

rng = np.random.default_rng(7)
tau = rng.uniform(10.0, 20.0, size=(N,))
J0 = rng.standard_normal((N, N))
J0 /= np.max(np.abs(np.linalg.eigvals(J0)))

# legacy one-call constructor + input/output layer helpers, as the reference
# uses them (rl_example.py:28-40)
net = Network.from_yaml("neuron_model_templates.rate_neurons.leaky_integrator.tanh",
                        weights=J0, dt=dt, source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="li_op/v", clear=True, float_precision="float64",
                        node_vars={"all/li_op/k": 0.1, "all/li_op/tau": tau,
                                   "all/li_op/v": rng.standard_normal(N)},
                        dtype=jnp.float64)
net.add_input_layer(m)
net.add_output_layer(1, train="rls")  # RLS readout edge, as in the reference
net.compile()

# input: two sines; target: their (scaled) product (rl_example.py:55-63)
f1, f2, amp = 0.2, 0.02, 0.9
time_ax = np.linspace(0, steps * dt, num=steps)
inp = np.stack([np.sin(2 * np.pi * f1 * time_ax) * amp,
                np.sin(2 * np.pi * f2 * time_ax) * amp], axis=1)
target = (inp[:, :1] * inp[:, 1:2]) / amp
tgt_var = float(target.var())

# phase 1: e-prop delta rule with feedback alignment (the reference call)
W_fb = rng.standard_normal((m, 1)) * 0.1
n1 = steps // 3
obs = net.fit_eprop(inp[:n1], targets=target[:n1], update_steps=1, verbose=True,
                    record_output=True, record_loss=True, sampling_steps=1000,
                    feedback_weights=W_fb, epsilon=0.9, delta=0.5, lr=1e-3,
                    decay=1.0)
L = obs.to_numpy("loss")
early, late = float(np.mean(L[1:6])), float(np.mean(L[-5:]))
print(f"e-prop online loss: {early:.6f} (early) -> {late:.6f} (final)")
assert late < 0.05 * tgt_var, f"e-prop online tracking did not converge: {late}"

# phase 2: FORCE/RLS refinement of the same readout edge
obs_rls = net.fit_rls(inp, target, update_steps=1, sampling_steps=1000,
                      verbose=True, record_output=True, record_loss=True)
L_rls = obs_rls.to_numpy("loss")
print(f"RLS online loss: {L_rls[1]:.5f} -> {L_rls[-1]:.5f}")

# held-out evaluation with frozen weights (rl_example.py:75-78)
obs2, test_loss = net.test(inp[:test_steps], target[:test_steps],
                           sampling_steps=10, verbose=False)
print(f"test MSE over {test_steps} steps: {test_loss:.6f} "
      f"(target variance {tgt_var:.4f})")
assert test_loss < 0.6 * tgt_var, \
    f"frozen readout no better than predicting the mean: {test_loss} vs {tgt_var}"

if os.environ.get("PLOT", "0") == "1":
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(nrows=3, figsize=(12, 8))
    obs2.plot("out", ax=axes[0])
    axes[0].set_title("predictions (testing)")
    axes[1].plot(target[:test_steps:10])
    axes[1].set_title("targets (testing)")
    obs_rls.plot("loss", ax=axes[2])
    axes[2].set_title("loss (training)")
    plt.tight_layout()
    plt.show()
print("OK")
