"""Network–JAX integration: custom training loops on the functional core.

The reference demonstrates how a compiled ``rectipy.Network`` doubles as a
``torch.nn.Module`` for custom torch optimization procedures
(/root/reference/documentation/interfaces/torch_integration.py): a target
and a learner network of rate-coupled leaky integrators

    v_i' = -v_i / tau + I_i(t) + k * r_in_i,   r_i = tanh(v_i)

share a coupling matrix but differ in the global leakage ``tau`` and
coupling ``k``; the learner's two scalars are then recovered online with
``torch.optim.Rprop``, backpropagating every ``update_steps`` steps and
calling ``Network.detach()`` for truncated BPTT.

This is the same workload on the JAX-native escape hatch.  Instead of a
stateful module stepped once per ``dt`` from Python (one tiny op per step),
the functional core hands you

    step   = net.make_step()            # pure (state, params, x) -> (state', out, taps)
    state  = net.init_state()           # state pytree
    params = net.parameters_pytree()    # params pytree
    paths  = net.trainable_paths()      # which leaves train_params marked

and the whole optimization chunk — 1000 coupled steps of BOTH networks, the
MSE accumulation, the gradient, and the ``optax.rprop`` update — jits into
ONE device program built from ``lax.scan``.  Truncated BPTT falls out of the
functional style: the carried states re-enter the next ``update`` call as
fresh jit arguments, which is exactly the reference's ``detach()``.  The
drive ``sin(pi t dt)/2`` is computed inside the scan from the step index, so
the loop transfers two scalars per update, not a (T, N) array.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rectipy_tpu import Network

N = int(os.environ.get("JAXINT_N", 5))
UPDATE_STEPS = int(os.environ.get("JAXINT_UPDATE_STEPS", 1000))
MAX_UPDATES = int(os.environ.get("JAXINT_UPDATES", 80))
DT = 1e-3
NODE = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"

rng = np.random.default_rng(int(os.environ.get("JAXINT_SEED", 3)))
# spectral radius 1 so k < 1 keeps the network contractive: trajectory-MSE
# fitting needs a STABLE target — at gain k·ρ(J) > 1 a tanh network is
# chaotic (see examples/chaos_gain_sweep.py) and gradients through 1000
# chaotic steps decorrelate from the loss (measured here: the fit walks away)
J = rng.normal(size=(N, N))
J /= np.max(np.abs(np.linalg.eigvals(J)))

# target parametrization vs the learner's (deliberately wrong) starting point
k_t, tau_t = 0.8, 1.2
k_0, tau_0 = 0.3, 3.0


def build(k, tau, train):
    net = Network(dt=DT)
    net.add_diffeq_node(
        "tanh", NODE, weights=J, source_var="tanh_op/r",
        target_var="li_op/r_in", input_var="li_op/I_ext",
        output_var="li_op/v",
        node_vars={"all/li_op/k": k, "all/li_op/tau": tau},
        train_params=["li_op/k", "li_op/tau"] if train else None)
    net.compile()
    return net


target = build(k_t, tau_t, train=False)
learner = build(k_0, tau_0, train=True)
print(f"target:  k={k_t}, tau={tau_t}")
print(f"learner: k={k_0}, tau={tau_0}  "
      f"(trainable leaves: {learner.trainable_paths()})")

t_step, l_step = target.make_step(), learner.make_step()
t_params = target.parameters_pytree()
l_params = learner.parameters_pytree()

# partition the learner's pytree into (trainable, frozen) by trainable_paths
train_p = {}
for kind, label, key in learner.trainable_paths():
    train_p.setdefault(kind, {}).setdefault(label, {})[key] = \
        l_params[kind][label].pop(key)


def merge(train, frozen):
    out = {k: {lbl: dict(sub) for lbl, sub in v.items()} for k, v in frozen.items()}
    for kind, labels in train.items():
        for label, leaves in labels.items():
            out[kind][label].update(leaves)
    return out


opt = optax.rprop(0.01, eta_minus=0.5, eta_plus=1.1,
                  min_step_size=1e-5, max_step_size=1e-1)
opt_state = opt.init(train_p)


@jax.jit
def update(train, opt_state, t_state, l_state, t0):
    """One optimization chunk: UPDATE_STEPS coupled steps of both networks,
    chunk-mean MSE, gradient wrt the two scalars, one rprop step."""

    def loss_fn(train):
        params = merge(train, l_params)

        def body(carry, i):
            ts, ls = carry
            drive = jnp.sin(jnp.pi * (t0 + i) * DT)[None] * 0.5
            ts, tv, _ = t_step(ts, t_params, drive)
            ls, lv, _ = l_step(ls, params, drive)
            return (ts, ls), jnp.mean((tv - lv) ** 2)

        (ts, ls), mses = jax.lax.scan(
            body, (t_state, l_state), jnp.arange(UPDATE_STEPS))
        return jnp.mean(mses), (ts, ls)

    (mse, (t_state, l_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(train)
    updates, opt_state = opt.update(grads, opt_state)
    train = optax.apply_updates(train, updates)
    return train, opt_state, t_state, l_state, mse


t_state, l_state = target.init_state(), learner.init_state()
tol = float(os.environ.get("JAXINT_TOL", 1e-7))
mse = np.inf
for u in range(MAX_UPDATES):
    train_p, opt_state, t_state, l_state, mse_dev = update(
        train_p, opt_state, t_state, l_state, jnp.float32(u * UPDATE_STEPS))
    mse = float(mse_dev)  # one scalar fetch per chunk
    leaves = train_p["nodes"]["tanh"]
    print(f"update {u:3d}: chunk MSE {mse:.3e}  "
          f"k={float(leaves['li_op/k']):.4f} tau={float(leaves['li_op/tau']):.4f}")
    if mse < tol:
        break

k_f = float(train_p["nodes"]["tanh"]["li_op/k"])
tau_f = float(train_p["nodes"]["tanh"]["li_op/tau"])
print(f"recovered: k={k_f:.4f} (target {k_t}), tau={tau_f:.4f} (target {tau_t})")

# write the fitted scalars back into the Network object (usable by run/fit_*)
learner.set_var("tanh", "li_op/k", k_f)
learner.set_var("tanh", "li_op/tau", tau_f)

assert abs(k_f - k_t) / k_t < 0.05, f"k did not converge: {k_f} vs {k_t}"
assert abs(tau_f - tau_t) / tau_t < 0.05, f"tau did not converge: {tau_f} vs {tau_t}"
print("OK: custom optax loop recovered the target parameters")
