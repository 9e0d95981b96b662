"""Find where fit_bptt_batch's epoch time goes beyond the raw batched
value_and_grad (ab_batch_bwd measured grad B=8 at ~99 ms while the fit
measured 634-1135 ms/epoch): layer the fit program back up one piece at a
time, round-robin interleaved (relay drift control).

L0 grad-only          = jit(value_and_grad(batch_loss))
L1 +adam              = L0 + optax.inject_hyperparams(adam) update
L2 +mb-scan           = L1 inside a lax.scan over n_mb=1 minibatches
L3 +epoch-scan (x8)   = L2 inside a lax.scan over 8 epochs (/8 per epoch)
L4 fit_bptt_batch     = the real call (n_epochs=8, one chunk dispatch)
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax

t00 = time.perf_counter()


def lap(m):
    print(f"[{time.perf_counter()-t00:7.1f}s] {m}", flush=True)


for a in range(40):
    try:
        lap(f"backend: {jax.devices()}"); break
    except Exception as e:
        lap(f"unavailable ({type(e).__name__}); sleep 120"); time.sleep(120)
else:
    sys.exit("relay never came back")

from rectipy_tpu import Network

N = int(os.environ.get("N", 10_000))
T = int(os.environ.get("STEPS", 500))
B = int(os.environ.get("B", 8))
DT = 5e-3
rng = np.random.default_rng(2)
W = (rng.random((N, N)) < 0.1) * (1.0 / (0.1 * N))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))

net = Network(DT)
net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                    weights=W, source_var="s", target_var="s_in",
                    input_var="I_ext", output_var="s", op="qif_op",
                    spike_var="spike", spike_def="v",
                    spike_threshold=1e2, spike_reset=-1e2,
                    node_vars={"all/qif_op/eta": etas},
                    coupling_dtype="int8_master", train_params=["weights"])
net.compile()
from rectipy_tpu.ops.bptt import make_coupled_traj

node = net.get_node("qif")
traj, wkeys = make_coupled_traj(node)
Wd = {k: node._args[k] for k in wkeys}
rest = {k: v for k, v in node._args.items() if k not in wkeys}
y0 = net.init_state()["nodes"]["qif"]

xs_b = jax.device_put(jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32))
tgt_b = jax.device_put(jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32))
lap("staged")

opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
opt_state0 = opt.init(Wd)


def batch_loss(Wt, xs, tg):
    def one(x, t):
        _, outs = traj(Wt, rest, y0, x)
        return jnp.mean((outs - t) ** 2)

    return jnp.mean(jax.vmap(one)(xs, tg))


@jax.jit
def l0(Wt, xs, tg):
    return jax.value_and_grad(batch_loss)(Wt, xs, tg)


@jax.jit
def l1(Wt, os_, xs, tg):
    lval, g = jax.value_and_grad(batch_loss)(Wt, xs, tg)
    upd, os_ = opt.update(g, os_, Wt)
    return optax.apply_updates(Wt, upd), os_, lval


@jax.jit
def l2(Wt, os_, xs, tg):
    xs = xs.reshape((1, B) + xs.shape[1:])
    tg = tg.reshape((1, B) + tg.shape[1:])

    def body(carry, it):
        Wt, os_ = carry
        lval, g = jax.value_and_grad(batch_loss)(Wt, it[0], it[1])
        upd, os_ = opt.update(g, os_, Wt)
        return (optax.apply_updates(Wt, upd), os_), lval

    (Wt, os_), lv = jax.lax.scan(body, (Wt, os_), (xs, tg))
    return Wt, os_, lv


@jax.jit
def l3(Wt, os_, xs, tg):
    def ep(carry, _):
        Wt, os_ = carry
        lval, g = jax.value_and_grad(batch_loss)(Wt, xs, tg)
        upd, os_ = opt.update(g, os_, Wt)
        return (optax.apply_updates(Wt, upd), os_), lval

    (Wt, os_), lv = jax.lax.scan(ep, (Wt, os_), None, length=8)
    return Wt, os_, lv


def run_l0(xs):
    lval, _ = l0(Wd, xs, tgt_b)
    return float(np.asarray(lval)), 1


def run_l1(xs):
    _, _, lval = l1(Wd, opt_state0, xs, tgt_b)
    return float(np.asarray(lval)), 1


def run_l2(xs):
    _, _, lv = l2(Wd, opt_state0, xs, tgt_b)
    return float(np.asarray(lv[-1])), 1


def run_l3(xs):
    _, _, lv = l3(Wd, opt_state0, xs, tgt_b)
    return float(np.asarray(lv[-1])), 8


def run_l4(xs):
    obs = net.fit_bptt_batch(xs, tgt_b, n_epochs=8,
                             optimizer="adam", lr=1e-4, verbose=False)
    return float(np.asarray(obs["epoch_loss"])[-1]), 8


modes = {"L0 grad    ": run_l0, "L1 +adam   ": run_l1, "L2 +mb-scan": run_l2,
         "L3 +ep-scan": run_l3, "L4 real fit": run_l4}

for name, fn in modes.items():
    t0 = time.perf_counter()
    lv, _ = fn(xs_b)
    lap(f"[warmup] {name} {time.perf_counter()-t0:6.1f}s (loss {lv:.4f})")

best = {k: float("inf") for k in modes}
pert = 0.0
for r in range(4):
    for name, fn in modes.items():
        xs = xs_b * (1.0 + 1e-6 * pert)
        t0 = time.perf_counter()
        lv, per = fn(xs)
        dt_ = (time.perf_counter() - t0) / per
        pert = lv % 1.0
        best[name] = min(best[name], dt_)
        lap(f"[round {r}] {name} {dt_*1e3:7.1f} ms/epoch")

lap("=== best (ms/epoch) ===")
for name, v in best.items():
    lap(f"  {name} {v*1e3:7.1f}")
