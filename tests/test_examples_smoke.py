"""Example-gallery smoke tests: the flagship example SCRIPTS must run
end-to-end (tiny configurations) -- parity tests cover the library paths,
but example bitrot is invisible to them (a stale kwarg or import only breaks
the script).  Each runs in a subprocess with the CPU platform forced."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "exec(open(r'{path}').read())"
)


def _run(example, env=None, timeout=420):
    full_env = dict(os.environ)
    full_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    full_env.update(env or {})
    path = os.path.join(REPO, "examples", example)
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER.format(path=path)],
        cwd=REPO, env=full_env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{example} failed:\n{proc.stderr[-2000:]}")
    return proc.stdout


@pytest.mark.parametrize("example,env", [
    # the N=100k flagship at toy scale, INCLUDING the training phase
    # (block-sparse + stateful delayed feedback through the graph trajectory)
    ("qif_100k_sharded.py", {"QIF_N": "512", "QIF_BS": "128", "QIF_T": "50",
                             "QIF_TRAIN": "1", "QIF_TRAIN_T": "60",
                             "QIF_TRAIN_EPOCHS": "2"}),
    # multi-population teacher-student through the graph trajectory
    ("multi_population_training.py", {"MPT_N1": "32", "MPT_N2": "16",
                                      "MPT_T": "80", "MPT_EPOCHS": "3",
                                      "MPT_TOL": "1.5"}),
    # low-level sharding helpers + the one-call mesh API on a 2-device mesh
    ("multichip_sharding.py", {}),
    # Kuramoto synchronization sweep (pairwise sin coupling as two matvecs)
    ("kuramoto_sync.py", {"KUR_N": "64", "KUR_STEPS": "2000"}),
    # Poisson-driven ensemble with on-device drives + spike rasters
    ("spike_raster_poisson.py", {"RASTER_N": "64", "RASTER_B": "2"}),
    # recurrent STDP plasticity (fit_stdp on a feedback self-edge)
    ("stdp_plasticity.py", {"STDP_N": "32", "STDP_T": "2000",
                            "STDP_HOMEO": "500"}),
    # Tsodyks-Markram dynamic synapses (depression + facilitation protocols)
    ("short_term_plasticity.py", {"STP_RATES": "10,40", "STP_T": "600"}),
    # ES inverse problem: fit the MPR mean-field to a rate trajectory
    ("es_model_fitting.py", {"ES_GENS": "6", "ES_POP": "8", "ES_T": "600"}),
    # continuation + stability classification + sweep cross-check
    ("bifurcation_continuation.py", {"BIF_POINTS": "5", "BIF_T": "160000"}),
    # SCS chaos transition at toy scale (lyapunov_spectrum gain sweep)
    ("chaos_gain_sweep.py", {"CHAOS_N": "64", "CHAOS_STEPS": "8000",
                             "CHAOS_GAINS": "0.5,3.0"}),
    # bistable MPR noise-induced switching (Wiener SDE drive + Newton)
    ("stochastic_switching.py", {"SW_STEPS": "100000",
                                 "SW_SIGMAS": "1.0,4.0"}),
    # delay-coupled Jansen-Rit masses: locking / delay-selected mode / death
    ("delay_coupled_masses.py", {"DJR_T": "30000"}),
    # spike/signal statistics chain: ISI CV, coherence, xcorr delay recovery
    ("spike_statistics.py", {"SPK_N": "64", "SPK_T": "8000"}),
    # custom optax loop on the functional core (reference torch_integration
    # analog); asserts (k, tau) recovery to 5%
    ("jax_integration.py", {}),
    # whole-brain connectome with per-connection conduction delays
    # (LinearMemoryMatrix); asserts synchronization + delay-structure effect
    # stronger coupling at toy M: 8 regions need K=80 to clear the
    # synchronization margin the default M=32 clears at K=40
    ("whole_brain_delays.py", {"WB_M": "8", "WB_T": "20000", "WB_K": "80"}),
    # differentiable conduction delays: BPTT recovers a fractional teacher
    # delay matrix (mode='interp', train_delays=True)
    ("delay_fitting.py", {"DF_EPOCHS": "80"}),
])
def test_example_runs(example, env):
    _run(example, env)
