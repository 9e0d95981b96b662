"""fit_bptt_batch(batch_vars=...): per-trial FROZEN-parameter overrides for
ensemble training -- the heterogeneous-condition fitting workload (one
coupling matrix trained across per-trial drives / excitabilities) in a
single vmapped program.  No reference analog (the reference trains one
trial per update, /root/reference/rectipy/network.py:603-707).

Correctness anchors:
  * one full-batch SGD epoch == the MEAN of the per-trial single-fit updates
    (exact, f64)
  * the per-trial (eta, input, target) association survives shuffling and
    minibatch gathering (lr=0 probe: losses are pure per-trial evaluations)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu import Network

TANH = "neuron_model_templates.rate_neurons.leaky_integrator.tanh"


def _build(W, train=True, **kw):
    net = Network(dt=1e-2, dtype=jnp.float64)
    net.add_diffeq_node("p", TANH, weights=W, source_var="tanh_op/r",
                        target_var="li_op/r_in", input_var="li_op/I_ext",
                        output_var="tanh_op/r", float_precision="float64",
                        train_params=["weights"] if train else None, **kw)
    return net


def test_fit_sweep_full_batch_sgd_is_mean_of_per_trial_updates():
    """One full-batch SGD epoch with per-trial etas must land on the MEAN of
    the B single-trial updates (each taken with that trial's eta via
    set_var): grad of the mean loss == mean of the per-trial grads."""
    rng = np.random.default_rng(0)
    N, B, T = 5, 3, 20
    W0 = rng.normal(scale=0.3, size=(N, N))
    etas = np.linspace(-1.0, 2.0, B)
    ins = rng.normal(size=(B, T, 1))
    tgts = rng.normal(scale=0.2, size=(B, T, N))
    lr = 1e-2

    net = _build(W0)
    net.fit_bptt_batch(ins, tgts, n_epochs=1, optimizer="sgd", lr=lr,
                       batch_vars={("p", "eta"): etas}, verbose=False)
    W_batch = np.asarray(net.get_var("p", "weights"))

    W_singles = []
    for b in range(B):
        net_b = _build(W0)
        net_b.set_var("p", "eta", etas[b])
        net_b.fit_bptt([ins[b]], [tgts[b]], optimizer="sgd", lr=lr,
                       verbose=False)
        W_singles.append(np.asarray(net_b.get_var("p", "weights")))
    assert np.abs(W_batch - W0).max() > 1e-6  # the update actually moved W
    # distinct etas produce distinct per-trial updates (the sweep reaches
    # the gradient, not just the loss)
    assert np.abs(W_singles[0] - W_singles[-1]).max() > 1e-8
    np.testing.assert_allclose(W_batch, np.mean(W_singles, axis=0),
                               rtol=1e-10, atol=1e-12)


def test_fit_sweep_association_survives_shuffle():
    """lr=0 + batch_size=1 turns every update into a pure per-trial loss
    evaluation; with shuffle=True the loss MULTISET must match the
    unshuffled one exactly (per-trial overrides are gathered by the same
    permutation as inputs/targets), and the values must be distinct (the
    sweep actually reaches the dynamics)."""
    rng = np.random.default_rng(1)
    N, B, T, E = 4, 4, 15, 2
    W0 = rng.normal(scale=0.3, size=(N, N))
    etas = np.linspace(-2.0, 2.0, B)
    ins = rng.normal(size=(B, T, 1))
    tgts = rng.normal(scale=0.2, size=(B, T, N))

    losses = {}
    for shuffle in (False, True):
        net = _build(W0)
        obs = net.fit_bptt_batch(ins, tgts, n_epochs=E, batch_size=1,
                                 optimizer="sgd", lr=0.0, shuffle=shuffle,
                                 seed=7, batch_vars={("p", "eta"): etas},
                                 verbose=False)
        losses[shuffle] = np.asarray(obs["train_loss"]).reshape(E, B)
    per_trial = losses[False][0]
    assert len(np.unique(per_trial.round(12))) == B  # distinct per-trial losses
    for ep in range(E):
        np.testing.assert_allclose(np.sort(losses[True][ep]),
                                   np.sort(per_trial), rtol=1e-12)
    # shuffled epoch-1 order actually differs from the identity (seed=7)
    assert not np.allclose(losses[True][1], per_trial)


def test_fit_sweep_heterogeneous_conditions_train():
    """The headline use: ONE coupling matrix trained across trials that each
    integrate under their own excitability; the ensemble loss decreases."""
    rng = np.random.default_rng(2)
    N, B, T = 6, 4, 30
    W0 = rng.normal(scale=0.2, size=(N, N))
    etas = np.linspace(-0.5, 1.5, B)
    ins = rng.normal(size=(B, T, 1))
    tgts = 0.1 * np.tanh(rng.normal(size=(B, T, N)))
    net = _build(W0)
    obs = net.fit_bptt_batch(ins, tgts, n_epochs=10, optimizer="adam",
                             lr=5e-3, batch_vars={("p", "eta"): etas},
                             verbose=False)
    el = np.asarray(obs["epoch_loss"])
    assert el[-1] < el[0]
    assert np.all(np.isfinite(el))


def test_fit_sweep_multistart_shares_overrides():
    """batch_vars composes with fit_bptt_multistart: every start trains
    against the same per-trial conditions; the winner is written back."""
    rng = np.random.default_rng(3)
    N, B, T, M = 4, 3, 15, 2
    W0 = rng.normal(scale=0.2, size=(N, N))
    etas = np.linspace(-1.0, 1.0, B)
    ins = rng.normal(size=(B, T, 1))
    tgts = rng.normal(scale=0.1, size=(B, T, N))
    net = _build(W0)
    obs = net.fit_bptt_multistart(ins, tgts, n_starts=M, n_epochs=4,
                                  optimizer="adam", lr=5e-3, seed=5,
                                  batch_vars={("p", "eta"): etas},
                                  verbose=False)
    finals = np.asarray(obs["start_final_loss"])
    assert finals.shape == (M,) and np.all(np.isfinite(finals))
    best = int(obs["best_start"][0])
    assert finals[best] == finals.min()


def test_fit_sweep_validation():
    rng = np.random.default_rng(4)
    N, B, T = 4, 3, 10
    net = _build(rng.normal(size=(N, N)) * 0.2)
    ins = rng.normal(size=(B, T, 1))
    tgts = rng.normal(size=(B, T, N))
    with pytest.raises(ValueError, match="TRAINABLE"):
        net.fit_bptt_batch(ins, tgts, batch_vars={("p", "weights"):
                                                  np.zeros((B, N, N))},
                           verbose=False)
    with pytest.raises(KeyError, match="not a parameter"):
        net.fit_bptt_batch(ins, tgts, batch_vars={("p", "nope"): np.ones(B)},
                           verbose=False)
    with pytest.raises(ValueError, match="shape"):
        net.fit_bptt_batch(ins, tgts, batch_vars={("p", "eta"): np.ones(B + 1)},
                           verbose=False)
    # exact-path form resolves too, but a bogus path raises
    with pytest.raises(KeyError, match="not found"):
        net.fit_bptt_batch(ins, tgts,
                           batch_vars={("nodes", "q", "x"): np.ones(B)},
                           verbose=False)
