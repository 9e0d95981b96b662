"""Fitting axonal conduction delays from observed dynamics.

Differentiable delays, end to end: a "recorded" network drives a rate
population through per-connection conduction delays whose values we
pretend not to know (fractions of an integration step included -- real
axons do not round to your dt).  The learner wires the same anatomy with
``mode='interp'`` (triangular-kernel read: linear interpolation between
the two adjacent history slots, exact at integer delays) and
``train_delays=True``, which puts the float delay matrix itself into the
trainable pytree -- ``fit_bptt`` then descends on BOTH the weights' loss
surface and the delays', through the same deferred scan.

No reference analog of any kind: the reference's delay buffers are
integer, per-source, and frozen.  Here the DELAY MATRIX is a parameter.

Usage:
    python examples/delay_fitting.py
    DF_EPOCHS=80 DF_T=600 python examples/delay_fitting.py
"""

import os
import sys

try:
    import rectipy_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from rectipy_tpu import Network

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"
N = int(os.environ.get("DF_N", 4))
T = int(os.environ.get("DF_T", 400))
EPOCHS = int(os.environ.get("DF_EPOCHS", 150))
MAX_D = 6

rng = np.random.default_rng(int(os.environ.get("DF_SEED", 5)))
W = rng.normal(size=(N, N))
d_true = rng.uniform(0.4, MAX_D - 1.0, size=(N, N))  # fractional step delays
d_0 = np.full((N, N), 2.0)  # the learner's flat initial guess
inp = rng.normal(size=(T, N))


def build(delays, train):
    net = Network(1e-2, dtype=jnp.float64)
    net.add_func_node("inp", N, activation_function="identity")
    net.add_diffeq_node("rnn", TANH, weights=np.zeros((N, N)),
                        input_var="li_op/I_ext", output_var="li_op/v",
                        source_var="tanh_op/r", target_var="li_op/r_in")
    net.add_edge("inp", "rnn", weights=W, delays=delays, mode="interp",
                 train="gd" if train else None, train_delays=train,
                 max_delay=MAX_D)
    net.compile()
    return net


# the "recording": the teacher's response to a known drive
target = build(d_true, train=False).run(inp, verbose=False).to_numpy("out")

student = build(d_0, train=True)
print("trainable leaves:", student.trainable_paths())
obs = student.fit_bptt([inp] * EPOCHS, [target] * EPOCHS, optimizer="adam",
                       lr=5e-2, verbose=False)
losses = [float(l) for l in obs["epoch_loss"]]

d_fit = np.asarray(student.get_edge("inp", "rnn").params["delays"])
err0 = np.abs(d_true.T - d_0.T)
err1 = np.abs(d_true.T - d_fit)
print(f"loss: {losses[0]:.3e} -> {losses[-1]:.3e} over {EPOCHS} epochs")
print(f"mean |delay error|: {err0.mean():.3f} -> {err1.mean():.3f} steps "
      f"(max {err1.max():.3f})")
print("true delays (internal layout):")
print(np.round(d_true.T, 2))
print("fitted delays:")
print(np.round(d_fit, 2))

assert losses[-1] < losses[0] * 0.1, "loss did not collapse"
assert err1.mean() < 0.15 * err0.mean(), "delays not recovered"
print("\nOK: the conduction-delay matrix was recovered by gradient descent")
