"""Lyapunov-spectrum cost at reservoir scale on the chip.

What this measures: `analysis.lyapunov_spectrum` on a dense random
tanh-rate network (the SCS chaos workload) at N=2048-4096, k leading
exponents -- per step the program evaluates the flow once plus one jvp per
tangent column ((1+k) dense matvecs), QR-reorthonormalizing every `reorth`
steps, all inside ONE device scan.  The quotable number: wall-clock for a
full spectrum estimate, and the effective tangent-matvec throughput.

Protocol notes (CLAUDE.md): the relay dedups identical program+input
executions, so repeat timings must vary an input (the tangent seed); the
first execution of a large program can stall minutes -- best-of-k with the
first run discarded.  lyapunov_spectrum fetches its result to numpy
internally, so wall-clock around the call is a true sync.

Usage:  python benchmarks/analysis_scale.py
        LYAP_N=4096 LYAP_K=8 LYAP_STEPS=20000 python benchmarks/analysis_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rectipy_tpu import Network
from rectipy_tpu.analysis import lyapunov_spectrum

N = int(os.environ.get("LYAP_N", 2048))
K = int(os.environ.get("LYAP_K", 4))
STEPS = int(os.environ.get("LYAP_STEPS", 20_000))
TRANSIENT = int(os.environ.get("LYAP_TRANSIENT", 5_000))
REPS = int(os.environ.get("LYAP_REPS", 4))
G = float(os.environ.get("LYAP_G", 3.0))

rng = np.random.default_rng(0)
W = G * rng.standard_normal((N, N)).astype(np.float32) / np.sqrt(N)
y0 = rng.standard_normal(N) * 0.5

net = Network(1e-2)  # f32 on TPU
net.add_diffeq_node("pop", "neuron_model_templates.rate_neurons.leaky_integrator.tanh",
                    weights=W, input_var="li_op/I_ext", output_var="li_op/v",
                    source_var="tanh_op/r", target_var="li_op/r_in",
                    verbose=False, clear=True, file_name="lyap_bench",
                    node_vars={"all/li_op/tau": 1.0})

print(f"[lyap] N={N} k={K} steps={STEPS} transient={TRANSIENT} g={G}")
t0 = time.time()
lam = lyapunov_spectrum(net, k=K, steps=STEPS, transient=TRANSIENT, y0=y0, seed=0)
first = time.time() - t0
print(f"[lyap] first call (incl. compile + relay stall): {first:.1f}s; "
      f"spectrum {np.round(lam, 4)}")

best = first  # REPS=1 falls back to the first call (incl. compile)
for rep in range(1, REPS):
    t0 = time.time()
    lam = lyapunov_spectrum(net, k=K, steps=STEPS, transient=TRANSIENT,
                            y0=y0, seed=rep)  # new seed -> no relay dedup
    el = time.time() - t0
    best = el if rep == 1 else min(best, el)  # drop the compile-laden first
    print(f"[lyap] rep {rep}: {el:.2f}s")

total_steps = STEPS + TRANSIENT
# flow eval + K tangent jvps per post-transient step; transient = 1 eval
matvecs = STEPS * (1 + K) + TRANSIENT
print(f"[lyap] best {best:.2f}s for a k={K} spectrum at N={N} "
      f"({total_steps} steps) -> {matvecs / best:.0f} dense (N,N) matvecs/s, "
      f"{matvecs * N * N * 2 / best / 1e12:.2f} effective TFLOP/s, "
      f"lambda_max={lam[0]:.4f}")
