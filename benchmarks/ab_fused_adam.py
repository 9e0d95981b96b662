"""Interleaved A/B of the fused-adam epoch vs the split schedule.

The tunnel relay's minute-scale throughput drift (same cached program
measured 138-425 ms/epoch across a day, CLAUDE.md) makes sequential
mode-by-mode timing unreliable at the ~5 ms resolution the fused tail is
worth.  This probe warms one fit program per mode, then alternates
single-fit timings round-robin so every mode samples the same drift, and
reports per-mode best + median.
"""
import os, statistics, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

t00 = time.perf_counter()


def lap(msg):
    print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", flush=True)


for attempt in range(40):
    try:
        lap(f"backend up: {jax.devices()}")
        break
    except Exception as e:
        lap(f"attempt {attempt}: backend unavailable ({type(e).__name__}); sleep 120s")
        time.sleep(120)
else:
    sys.exit("relay never came back")

import rectipy_tpu.ops.fused_opt as fo
from rectipy_tpu import Network

n, T, dt = 10_000, 500, 5e-3
rng = np.random.default_rng(2)
Wd = (rng.random((n, n)) < 0.1) * (1.0 / (0.1 * n))
etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, n + 1) - n - 1) / (n + 1))
inp_d = jax.device_put(jnp.asarray(rng.normal(size=(T, n)), dtype=jnp.float32))
tgt_d = jax.device_put(jnp.asarray(rng.normal(size=(T, n)), dtype=jnp.float32))
jax.block_until_ready((inp_d, tgt_d))
lap("epoch arrays staged")
n_ep = 16

net = Network(dt)
net.add_diffeq_node("qif", "rectipy_tpu.models.spiking_neurons.qif.qif",
                    weights=Wd, source_var="s", target_var="s_in",
                    input_var="I_ext", output_var="s", op="qif_op",
                    spike_var="spike", spike_def="v",
                    spike_threshold=1e2, spike_reset=-1e2,
                    node_vars={"all/qif_op/eta": etas},
                    coupling_dtype="int8_master", train_params=["weights"])

MODES = os.environ.get("MODES", "off,pallas,xla").split(",")


def fit(mode):
    os.environ["RECTIPY_FUSED_ADAM"] = mode
    fo.FUSED_ADAM_MODE = mode if mode != "off" else "auto"
    t0 = time.perf_counter()
    obs = net.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam",
                       lr=1e-4, verbose=False)
    return time.perf_counter() - t0, obs


for mode in MODES:
    dt_s, _ = fit(mode)
    lap(f"warmup[{mode}] {dt_s:.1f}s")

samples = {m: [] for m in MODES}
ROUNDS = int(os.environ.get("ROUNDS", "6"))
for r in range(ROUNDS):
    for mode in MODES:
        dt_s, _ = fit(mode)
        samples[mode].append(dt_s / n_ep * 1e3)
    lap(f"round {r}: " + "  ".join(f"{m}={samples[m][-1]:.1f}ms" for m in MODES))

for mode in MODES:
    s = samples[mode]
    lap(f"[{mode}] best {min(s):.1f} ms/epoch  median {statistics.median(s):.1f}  "
        f"all {[f'{x:.1f}' for x in s]}")
