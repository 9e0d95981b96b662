"""Million-neuron scale probe: block-sparse QIF forward throughput vs N.

Measures the one-chip block-sparse envelope (ops/sparse.py) at large N with
best-of-K timing (the tunneled relay's run-to-run variance is extreme; see
NOTES_NEXT_ROUND.md).  The per-step cost model is HBM-streaming the int8
blocks: bytes/step ~ N * fan_in, so nu/s should be ~flat in N once overheads
amortize.

SCALE_BATCH=B additionally measures a B-trial `run_batch` parameter sweep
(per-trial eta offsets via batch_vars, shared on-device Pulse drive): the
int8 block stream is amortized over the batch -- trials are near-free until
the MXU saturates, so aggregate nu/s ~ B x single-trial.

Usage:
    SCALE_NS=250880,501760,1000448 SCALE_T=2000 SCALE_REPS=4 \
        python benchmarks/sparse_scale.py
    SCALE_NS=1000448 SCALE_T=500 SCALE_BATCH=16 python benchmarks/sparse_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/rectipy_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from rectipy_tpu import Network
from rectipy_tpu.inputs import Pulse
from rectipy_tpu.ops.sparse import block_random_connectivity

BS = 512
T = int(os.environ.get("SCALE_T", 2000))
REPS = int(os.environ.get("SCALE_REPS", 4))
COUPLING = os.environ.get("SCALE_COUPLING", "int8")
NS = [int(x) for x in os.environ.get(
    "SCALE_NS", "250880,501760,1000448").split(",")]

print(f"device={jax.devices()[0]}  T={T} reps={REPS} coupling={COUPLING}", flush=True)

for N in NS:
    assert N % BS == 0, f"N={N} must be a multiple of {BS}"
    fan_in = 1000
    t0 = time.perf_counter()
    A = block_random_connectivity(N, N, fan_in, block_size=BS, seed=0)
    t_sample = time.perf_counter() - t0
    etas = -5.0 + np.tan((np.pi / 2) * (2.0 * np.arange(1, N + 1) - N - 1) / (N + 1))

    net = Network(1e-4)
    net.add_diffeq_node(
        "qif", "rectipy_tpu.models.spiking_neurons.qif.qif_sfa", weights=A,
        source_var="s", target_var="s_in", input_var="I_ext", output_var="s",
        spike_var="spike", spike_def="v", op="qif_sfa_op",
        spike_threshold=1e2, spike_reset=-1e2,
        node_vars={"all/qif_sfa_op/eta": etas, "all/qif_sfa_op/alpha": 0.05,
                   "all/qif_sfa_op/k": 15.0},
        coupling_dtype=COUPLING,
    )
    net.compile()
    del A  # free the 4N*fan_in-byte host master before the device phase

    # on-device drive: at N=1e6 a (T, N) array would be 8 GB of transfer
    drive = Pulse(T, channels=1, t_on=T // 4, t_off=T, amp=3.0)

    # warmup MUST execute the exact timed program (steps is part of the
    # program shape and the run cache key; a short warmup would leave the
    # full-T compile inside the timed loop)
    t0 = time.perf_counter()
    obs = net.run(drive, record_output=False, sampling_steps=100,
                  record_vars=[("qif", "s", True)], verbose=False)
    t_first = time.perf_counter() - t0

    best, times = None, []
    for rep in range(REPS):
        t0 = time.perf_counter()
        obs = net.run(drive, record_output=False, sampling_steps=100,
                      record_vars=[("qif", "s", True)], verbose=False)
        wall = time.perf_counter() - t0
        times.append(wall)
        best = wall if best is None else min(best, wall)
        s_mean = obs.to_numpy(("qif", "s"))
        assert np.all(np.isfinite(s_mean)), "non-finite dynamics"
    bytes_per_w = 1 if COUPLING.startswith("int8") else 2
    gbps = N * fan_in * bytes_per_w * T / best / 1e9
    print(f"N={N}: sample {t_sample:.1f}s, first-run {t_first:.1f}s, "
          f"times={['%.2f' % t for t in times]}s -> best {best:.2f}s = "
          f"{T * N / best:.3e} nu/s ({gbps:.0f} GB/s weight stream)", flush=True)

    B = int(os.environ.get("SCALE_BATCH", 0))
    if B:
        # B-trial parameter sweep: per-trial excitability offsets, one
        # vmapped program, zero input transfer (shared on-device drive)
        sweep = {("qif", "eta"): np.linspace(-1.0, 1.0, B)[:, None] + etas[None, :]}
        t0 = time.perf_counter()  # warmup = the exact timed program
        net.run_batch(drive, batch_vars=sweep, record_output=False,
                      sampling_steps=100, record_vars=[("qif", "s", True)])
        t_first_b = time.perf_counter() - t0
        best_b, times_b = None, []
        for rep in range(REPS):
            t0 = time.perf_counter()
            res = net.run_batch(drive, batch_vars=sweep, record_output=False,
                                sampling_steps=100, record_vars=[("qif", "s", True)])
            wall = time.perf_counter() - t0
            times_b.append(wall)
            best_b = wall if best_b is None else min(best_b, wall)
            assert np.all(np.isfinite(res[("qif", "s")]))
        print(f"N={N} x B={B} sweep: first-run {t_first_b:.1f}s, "
              f"times={['%.2f' % t for t in times_b]}s -> best {best_b:.2f}s = "
              f"{B * T * N / best_b:.3e} aggregate nu/s "
              f"({B * T * N / best_b / (T * N / best):.1f}x single-trial)", flush=True)
