"""Isolate the batched-training pathology: forward-only vs value_and_grad
on the vmapped trajectory, and a pre-transposed backward weight tile.

ab_batch_train.py showed batched (B=8) training costs ~6x the single-trial
epoch for BOTH int8 and bf16 couplings while batched inference is ~free --
pointing at the backward scan.  Hypothesis: the transposed contraction
``dot_general(wq, delta, contracting wq dim 0)`` is fine for a vector delta
but forces a per-iteration transpose/relayout of the (N, N) weight tile
once delta is a batch (int8 transposes are slow on TPU).  Variant "pre-T"
materializes wq.T ONCE in the per-epoch prep instead.

Timing protocol (CLAUDE.md): block_until_ready does not block on the axon
relay and identical program+input executions dedup -- every timed call
chains its input on the previous call's fetched output and syncs via a
host np.asarray fetch.
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

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
from rectipy_tpu.ops import quant

N = int(os.environ.get("N", 10_000))
T = int(os.environ.get("STEPS", 500))
B = int(os.environ.get("B", 8))
DT = 5e-3
rng = np.random.default_rng(2)
W = (rng.random((N, N)) < 0.1) * (1.0 / (0.1 * N))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))


def make_traj(pre_transposed):
    if pre_transposed:
        def prep_T(w):
            wq, s = quant.quantize_rows(w)
            return (wq, wq.T, s)  # transpose ONCE per prep, outside the scan

        def mv_T(wp, src):
            wq, _, ws = wp
            xq, xs = quant.quant_vec(src)
            return (quant.int8_dot(wq, xq) * ws * xs).astype(src.dtype)

        def mv_t_T(wp, delta):
            _, wqT, ws = wp
            v = ws.astype(delta.dtype) * delta
            vq, vs = quant.quant_vec(v)
            return (quant.int8_dot(wqT, vq) * vs).astype(delta.dtype)

        orig = quant.int8_master_ops
        quant.int8_master_ops = lambda: (prep_T, mv_T, mv_t_T, quant._grad_w)
    net = Network(DT)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                        weights=W, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_op",
                        spike_var="spike", spike_def="v",
                        spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_op/eta": etas},
                        coupling_dtype="int8_master",
                        train_params=["weights"])
    net.compile()
    from rectipy_tpu.ops.bptt import make_coupled_traj

    node = net.get_node("qif")
    traj, wkeys = make_coupled_traj(node)
    if pre_transposed:
        quant.int8_master_ops = orig
    Wd = {k: node._args[k] for k in wkeys}
    rest = {k: v for k, v in node._args.items() if k not in wkeys}
    y0 = net.init_state()["nodes"]["qif"]
    return traj, Wd, rest, y0


xs_b = jax.device_put(jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32))
tgt_b = jax.device_put(jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32))
lap("staged")

traj_std, Wd, rest, y0 = make_traj(False)
traj_pre, Wd2, rest2, y02 = make_traj(True)


def make_fns(traj, rest, y0):
    def batch_loss(Wt, xs):
        def one(x, t):
            _, outs = traj(Wt, rest, y0, x)
            return jnp.mean((outs - t) ** 2)

        return jnp.mean(jax.vmap(one)(xs, tgt_b))

    fwd = jax.jit(lambda Wt, xs: batch_loss(Wt, xs))
    vgrad = jax.jit(lambda Wt, xs: jax.value_and_grad(batch_loss)(Wt, xs))
    return fwd, vgrad


fwd_s, grad_s = make_fns(traj_std, rest, y0)
fwd_p, grad_p = make_fns(traj_pre, rest2, y02)

modes = {
    "fwd  std  ": lambda xs: (fwd_s(Wd, xs), None),
    "grad std  ": lambda xs: grad_s(Wd, xs),
    "fwd  pre-T": lambda xs: (fwd_p(Wd2, xs), None),
    "grad pre-T": lambda xs: grad_p(Wd2, xs),
}

# warmup/compile each program once
for name, fn in modes.items():
    t0 = time.perf_counter()
    out = fn(xs_b)
    lv = float(np.asarray(out[0]))
    lap(f"[warmup] {name} {time.perf_counter()-t0:6.1f}s (loss {lv:.4f})")

best = {k: float("inf") for k in modes}
pert = 0.0
for r in range(4):
    for name, fn in modes.items():
        xs = xs_b * (1.0 + 1e-6 * pert)  # chain: never dedup-identical
        t0 = time.perf_counter()
        out = fn(xs)
        lv = float(np.asarray(out[0]))   # host fetch = real sync
        dt_ = time.perf_counter() - t0
        pert = lv % 1.0
        best[name] = min(best[name], dt_)
        lap(f"[round {r}] {name} {dt_*1e3:7.1f} ms")

lap("=== best (ms per batched pass) ===")
for name, v in best.items():
    lap(f"  {name} {v*1e3:7.1f}")
# gradient parity of the pre-transposed variant
g1 = grad_s(Wd, xs_b)[1]["weights"]
g2 = grad_p(Wd2, xs_b)[1]["weights"]
err = float(jnp.max(jnp.abs(g1 - g2)))
lap(f"pre-T gradient max |diff| vs std: {err:.3e}")
