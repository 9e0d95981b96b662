"""TPU validation + timing of the fused adam+requant path (retrying)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

t00 = time.perf_counter()
def lap(msg):
    print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", flush=True)

# wait for the relay to come back (init stalls then raises UNAVAILABLE)
for attempt in range(40):
    try:
        d = jax.devices()
        lap(f"backend up: {d}")
        break
    except Exception as e:
        lap(f"attempt {attempt}: backend unavailable ({type(e).__name__}); sleep 120s")
        time.sleep(120)
else:
    sys.exit("relay never came back")

x = jnp.ones((8, 8)); jax.block_until_ready(x @ x)
lap("first op done")

import rectipy_tpu.ops.fused_opt as fo
from rectipy_tpu.ops.fused_opt import adam_requant_xla

# ---- 1. numeric parity at full size
rng = np.random.default_rng(0)
n = 10_000
W = jnp.asarray(rng.normal(size=(n, n)), dtype=jnp.float32); jax.block_until_ready(W); lap("W staged")
g = jnp.asarray(rng.normal(size=(n, n)), dtype=jnp.float32) * 1e-3
m = jnp.asarray(rng.normal(size=(n, n)), dtype=jnp.float32) * 1e-3
v = jnp.asarray(np.abs(rng.normal(size=(n, n))), dtype=jnp.float32) * 1e-6
jax.block_until_ready(v); lap("g/m/v staged")
bc1, bc2, lr = jnp.float32(0.1), jnp.float32(0.001), jnp.float32(1e-4)

os.environ["RECTIPY_FUSED_ADAM"] = "pallas"  # env wins over FUSED_ADAM_MODE
outs_p = jax.jit(lambda *a: fo.adam_requant(*a, b1=0.9, b2=0.999, eps=1e-8))(W, m, v, g, bc1, bc2, lr)
outs_p = [np.asarray(x) for x in outs_p]
lap("pallas ran")
outs_x = jax.jit(lambda *a: adam_requant_xla(*a, b1=0.9, b2=0.999, eps=1e-8))(W, m, v, g, bc1, bc2, lr)
outs_x = [np.asarray(x) for x in outs_x]
lap("xla ran")
names = ["W'", "mu'", "nu'", "wq", "scale"]
for nm, a, b in zip(names, outs_p, outs_x):
    if a.dtype == np.int8:
        mism = int((a != b).sum())
        print(f"  {nm}: int8 mismatches {mism}/{a.size}", flush=True)
        assert mism < a.size * 1e-5, mism
    else:
        d = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
        print(f"  {nm}: max|d| {d:.3e}", flush=True)
        assert d < 1e-5, (nm, d)
lap("NUMERIC PARITY OK")
# timing of the fused tail alone (pallas vs xla).  CRITICAL: chain the
# inputs call-to-call and sync with a host fetch -- jax.block_until_ready
# does not block on the axon relay, and the relay can dedup identical
# program+input executions (both measured; see CLAUDE.md).
for tag, mode in (("pallas", "pallas"), ("xla", "xla")):
    # set the ENV var: adam_requant resolves env over the module default,
    # so a stray exported RECTIPY_FUSED_ADAM would otherwise silently win
    # and both iterations would time the same kernel under two labels
    os.environ["RECTIPY_FUSED_ADAM"] = mode
    f = jax.jit(lambda *a: fo.adam_requant(*a, b1=0.9, b2=0.999, eps=1e-8))
    o = f(W, m, v, g, bc1, bc2, lr); np.asarray(o[4])
    best = float("inf")
    # the chain CONTINUES across repeats: resetting to (W, m, v, g) would
    # replay an identical call sequence the relay can dedup
    Wc, mc, vc, gc = W, m, v, g
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            Wc, mc, vc, _wq, sc = f(Wc, mc, vc, gc, bc1, bc2, lr)
            gc = mc  # rotate so inputs differ every call
        np.asarray(sc)  # explicit fetch = the only reliable sync
        best = min(best, (time.perf_counter() - t0) / 10)
    lap(f"[tail {tag}] {best*1e3:.2f} ms/call ({2.9/best:.0f} GB/s eff)")
del W, g, m, v, outs_p, outs_x, o, Wc, mc, vc, gc

# ---- 2. epoch timing per mode
from rectipy_tpu import Network

n, T, dt = 10_000, 500, 5e-3
rng = np.random.default_rng(2)
Wd = (rng.random((n, n)) < 0.1) * (1.0 / (0.1 * n))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, n + 1) - n - 1) / (n + 1))
inp_d = jax.device_put(jnp.asarray(rng.normal(size=(T, n)), dtype=jnp.float32))
tgt_d = jax.device_put(jnp.asarray(rng.normal(size=(T, n)), dtype=jnp.float32))
jax.block_until_ready((inp_d, tgt_d)); lap("epoch arrays staged")
n_ep = 16

for mode in os.environ.get("MODES", "pallas,off,xla").split(","):
    fo.FUSED_ADAM_MODE = mode if mode != "off" else "auto"
    os.environ["RECTIPY_FUSED_ADAM"] = mode
    net = Network(dt)
    net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                        weights=Wd, source_var="s", target_var="s_in",
                        input_var="I_ext", output_var="s", op="qif_op",
                        spike_var="spike", spike_def="v",
                        spike_threshold=1e2, spike_reset=-1e2,
                        node_vars={"all/qif_op/eta": etas},
                        coupling_dtype="int8_master", train_params=["weights"])
    t0 = time.perf_counter()
    net.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam", lr=1e-4, verbose=False)
    warm = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        obs = net.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam",
                           lr=1e-4, verbose=False)
        best = min(best, (time.perf_counter() - t0) / n_ep)
    l = np.asarray(obs["epoch_loss"])
    lap(f"[{mode}] warmup {warm:.1f}s; best {best*1e3:.1f} ms/epoch -> "
        f"{T*n/best:.3e} trained nu/s; loss[0]={l[0]:.6f} loss[-1]={l[-1]:.6f}")
