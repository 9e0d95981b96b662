"""Interleaved A/B: f32 vs bfloat16 adam first moment (mu_dtype) on the
N=10k int8_master trained epoch.

The optimizer tail of the epoch program moves ~2.9 GB (params, grads, mu,
nu, int8 requant -- NOTES_NEXT_ROUND.md anatomy); keeping mu in bf16 via
optax's `mu_dtype` halves the mu stream (~800 -> 400 MB/epoch), worth ~1 ms
at the tail's ~400 GB/s IF the numerics hold.  Round-robin single-fit
timings per CLAUDE.md (minute-scale relay drift swamps sequential phases);
fit_* fetches losses internally so wall-clock is a reliable device timing.
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

MODES = {"f32": None, "bf16mu": {"mu_dtype": "bfloat16"}}
loss_curves = {}


def fit(mode):
    t0 = time.perf_counter()
    obs = net.fit_bptt([inp_d] * n_ep, [tgt_d] * n_ep, optimizer="adam",
                       lr=1e-4, optimizer_kwargs=MODES[mode], verbose=False)
    loss_curves[mode] = np.asarray(obs["epoch_loss"])
    return time.perf_counter() - t0


for mode in MODES:
    lap(f"warmup[{mode}] {fit(mode):.1f}s")

samples = {m: [] for m in MODES}
ROUNDS = int(os.environ.get("ROUNDS", "6"))
for r in range(ROUNDS):
    for mode in MODES:
        samples[mode].append(fit(mode) / n_ep * 1e3)
    lap(f"round {r}: " + "  ".join(f"{m}={samples[m][-1]:.1f}ms" for m in MODES))

for mode in MODES:
    s = samples[mode]
    lap(f"[{mode}] best {min(s):.1f} ms/epoch  median {statistics.median(s):.1f}  "
        f"all {[f'{x:.1f}' for x in s]}")
d = np.abs(loss_curves["f32"] - loss_curves["bf16mu"])
lap(f"loss-curve |diff| max {d.max():.2e} (f32 final {loss_curves['f32'][-1]:.6f})")
