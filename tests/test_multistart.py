"""Multi-start BPTT (Network.fit_bptt_multistart): M independently
initialized models trained simultaneously as one vmapped program.  No
reference analog; correctness pinned by exact equivalences against
fit_bptt_batch (itself pinned to the reference epoch-mode sequences)."""

import contextlib
import io

import numpy as np
import pytest

from rectipy_tpu import Network

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"

rng0 = np.random.default_rng(0)
N, B, T = 6, 4, 30
W0 = rng0.normal(scale=0.3, size=(N, N))
INS = rng0.normal(size=(B, T, 1))
TGTS = rng0.normal(size=(B, T, N)) * 0.1


def _build(W=None):
    net = Network(dt=1e-2)
    net.add_diffeq_node("p", TANH, weights=(W0 if W is None else W).copy(),
                        source_var="tanh_op/r", target_var="li_op/r_in",
                        input_var="li_op/I_ext", output_var="tanh_op/r",
                        float_precision="float64", train_params=["weights"])
    return net


def test_single_start_equals_batch_fit():
    a = _build()
    obs_a = a.fit_bptt_multistart(INS, TGTS, n_starts=1, n_epochs=4,
                                  optimizer="sgd", lr=1e-1, verbose=False)
    b = _build()
    obs_b = b.fit_bptt_batch(INS, TGTS, n_epochs=4, optimizer="sgd", lr=1e-1,
                             verbose=False)
    np.testing.assert_allclose(np.asarray(a.get_var("p", "weights")),
                               np.asarray(b.get_var("p", "weights")),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(obs_a["epoch_loss"]),
                               np.asarray(obs_b["epoch_loss"]), rtol=1e-12)


def test_explicit_inits_match_separate_fits_and_best_writeback():
    rng = np.random.default_rng(1)
    M = 3
    W_inits = rng.normal(scale=0.3, size=(M, N, N))
    c = _build()
    obs = c.fit_bptt_multistart(INS, TGTS, n_starts=M,
                                start_inits={("p", "weights"): W_inits},
                                n_epochs=4, optimizer="adam", lr=1e-2,
                                verbose=False)
    finals = []
    for m in range(M):
        d = _build(W_inits[m])
        od = d.fit_bptt_batch(INS, TGTS, n_epochs=4, optimizer="adam",
                              lr=1e-2, verbose=False)
        finals.append((np.asarray(od["epoch_loss"])[-1],
                       np.asarray(d.get_var("p", "weights"))))
    final_ms = np.asarray(obs["start_final_loss"])
    for m in range(M):
        np.testing.assert_allclose(final_ms[m], finals[m][0], rtol=1e-10)
    best = int(obs["best_start"][0])
    assert best == int(np.argmin([f[0] for f in finals]))
    np.testing.assert_allclose(np.asarray(c.get_var("p", "weights")),
                               finals[best][1], rtol=1e-12, atol=1e-14)


def test_default_perturbations_seeded_and_start0_unperturbed():
    e = _build()
    obs_e = e.fit_bptt_multistart(INS, TGTS, n_starts=4, n_epochs=3, seed=5,
                                  init_scale=0.2, optimizer="adam", lr=1e-2,
                                  verbose=False)
    f = _build()
    obs_f = f.fit_bptt_multistart(INS, TGTS, n_starts=4, n_epochs=3, seed=5,
                                  init_scale=0.2, optimizer="adam", lr=1e-2,
                                  verbose=False)
    np.testing.assert_allclose(np.asarray(obs_e["start_final_loss"]),
                               np.asarray(obs_f["start_final_loss"]),
                               rtol=0, atol=0)
    sel = np.asarray(obs_e["start_epoch_loss"])
    assert sel.shape == (3, 4)
    assert len(set(np.round(sel[-1], 12))) > 1, "starts did not diverge"
    g = _build()
    obs_g = g.fit_bptt_batch(INS, TGTS, n_epochs=1, optimizer="adam", lr=1e-2,
                             verbose=False)
    np.testing.assert_allclose(sel[0, 0], np.asarray(obs_g["epoch_loss"])[0],
                               rtol=1e-12)


def test_chunked_equals_per_epoch_loop():
    g = _build()
    g.fit_bptt_multistart(INS, TGTS, n_starts=3, n_epochs=9, batch_size=2,
                          seed=2, optimizer="adam", lr=1e-2, verbose=False)
    h = _build()
    with contextlib.redirect_stdout(io.StringIO()):
        h.fit_bptt_multistart(INS, TGTS, n_starts=3, n_epochs=9, batch_size=2,
                              seed=2, optimizer="adam", lr=1e-2, verbose=True)
    np.testing.assert_allclose(np.asarray(g.get_var("p", "weights")),
                               np.asarray(h.get_var("p", "weights")),
                               rtol=0, atol=0)


def test_multistart_validation():
    net = _build()
    with pytest.raises(ValueError, match="n_starts"):
        net.fit_bptt_multistart(INS, TGTS, n_starts=0, verbose=False)
    with pytest.raises(KeyError, match="not a parameter"):
        net.fit_bptt_multistart(INS, TGTS, n_starts=2,
                                start_inits={("p", "nope"): np.zeros((2, N, N))},
                                verbose=False)
    with pytest.raises(ValueError, match="expected shape"):
        net.fit_bptt_multistart(INS, TGTS, n_starts=2,
                                start_inits={("p", "weights"): np.zeros((3, N, N))},
                                verbose=False)
    with pytest.raises(KeyError, match="not a trainable path"):
        net.fit_bptt_multistart(INS, TGTS, n_starts=2,
                                start_inits={("p", "eta"): np.zeros((2,))},
                                verbose=False)

def test_best_start_ignores_nan_losses():
    """A diverged (NaN-loss) start must never win the write-back: np.argmin
    would return the NaN position (NaN poisons the min reduction)."""
    from rectipy_tpu.network import _best_start

    assert _best_start(np.array([np.nan, 2.0, 1.0])) == 2
    assert _best_start(np.array([3.0, np.inf, 1.0, np.nan])) == 2
    assert _best_start(np.array([np.nan, np.nan])) == 0
    assert _best_start(np.array([0.5, 2.0])) == 0


def test_multistart_nan_start_not_written_back():
    """End-to-end: one start seeded with exploding weights diverges to NaN;
    the finite start must be selected and written back."""
    M = 2
    W_inits = np.stack([W0, np.full_like(W0, np.nan)])  # start 1 is poisoned
    c = _build()
    obs = c.fit_bptt_multistart(INS, TGTS, n_starts=M,
                                start_inits={("p", "weights"): W_inits},
                                n_epochs=3, optimizer="adam", lr=1e-2,
                                verbose=False)
    final = np.asarray(obs["start_final_loss"])
    assert not np.isfinite(final[1])
    best = int(obs["best_start"][0])
    assert best == 0
    assert np.isfinite(final[best])
    assert np.isfinite(np.asarray(c.get_var("p", "weights"))).all()


def test_multistart_mesh_matches_unsharded():
    """mesh=(data=2, model=4): starts shard over 'data', population over
    'model'; losses and the written-back winner match the unsharded fit."""
    from rectipy_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    M = 4
    W_inits = rng.normal(scale=0.3, size=(M, N, N))
    a = _build()
    obs_a = a.fit_bptt_multistart(INS, TGTS, n_starts=M,
                                  start_inits={("p", "weights"): W_inits},
                                  n_epochs=4, optimizer="adam", lr=1e-2,
                                  verbose=False)
    b = _build()
    obs_b = b.fit_bptt_multistart(INS, TGTS, n_starts=M,
                                  start_inits={("p", "weights"): W_inits},
                                  n_epochs=4, optimizer="adam", lr=1e-2,
                                  verbose=False, mesh=make_mesh(8, data=2))
    np.testing.assert_allclose(np.asarray(obs_b["start_final_loss"]),
                               np.asarray(obs_a["start_final_loss"]),
                               rtol=1e-9)
    assert int(obs_b["best_start"][0]) == int(obs_a["best_start"][0])
    np.testing.assert_allclose(np.asarray(b.get_var("p", "weights")),
                               np.asarray(a.get_var("p", "weights")),
                               rtol=1e-9, atol=1e-12)


def test_multistart_mesh_indivisible_starts_warns_but_matches():
    from rectipy_tpu.parallel import make_mesh

    a = _build()
    obs_a = a.fit_bptt_multistart(INS, TGTS, n_starts=3, n_epochs=2, seed=7,
                                  optimizer="adam", lr=1e-2, verbose=False)
    b = _build()
    with pytest.warns(UserWarning, match="REPLICATED"):
        obs_b = b.fit_bptt_multistart(INS, TGTS, n_starts=3, n_epochs=2,
                                      seed=7, optimizer="adam", lr=1e-2,
                                      verbose=False, mesh=make_mesh(8, data=2))
    np.testing.assert_allclose(np.asarray(obs_b["start_final_loss"]),
                               np.asarray(obs_a["start_final_loss"]),
                               rtol=1e-9)
