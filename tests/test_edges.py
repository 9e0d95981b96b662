"""Edge-runtime tests, mirroring the reference suite's oracle pattern
(/root/reference/rectipy_tests/test_edges.py): Linear is checked against a
plain matmul oracle; RLS hyperparameter effects and convergence are asserted."""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu.edges import (
    RLS,
    Linear,
    LinearFilter,
    LinearMasked,
    LinearMemory,
    LinearMemoryFilter,
)

accuracy = 1e-4


def test_linear():
    n, m = 10, 2
    rng = np.random.default_rng(0)
    w1 = rng.normal(size=(n, m))
    x = jnp.asarray(rng.normal(size=(n,)))

    lin1 = Linear(n, m, rng=rng)
    lin2 = Linear(m, n, rng=rng)
    lin3 = Linear(n, m, weights=w1.T + 2.0)
    lin4 = Linear(n, m, weights=w1, dtype=jnp.float32)
    lin5 = Linear(n, m, weights=w1, detach=False)

    assert lin2.weights.shape == w1.shape
    assert lin1.weights.shape[0] == lin2.weights.shape[1]
    np.testing.assert_allclose(np.asarray(lin5.weights), w1.T, atol=accuracy)
    assert lin3.weights.dtype == jnp.float64
    assert lin4.weights.dtype == jnp.float32

    assert len(list(lin5.parameters())) - len(list(lin4.parameters())) == 1
    assert len(list(lin1.parameters())) == 0

    # forward oracle: y = W @ x
    np.testing.assert_allclose(
        np.asarray(lin5.forward(x)), w1.T @ np.asarray(x), atol=accuracy)
    assert np.abs(np.sum(np.asarray(lin5.forward(x)) - np.asarray(lin3.forward(x)))) > 0.0

    with pytest.raises(ValueError):
        Linear(n, m, weights=rng.normal(size=(n + 1, m + 1)))


def test_linear_square_transpose_parity():
    """Reference parity: square (n_in, n_out) matrices are auto-transposed
    (/root/reference/rectipy/edges.py:22-23)."""
    n = 4
    w = np.arange(16, dtype=float).reshape(4, 4)
    lin = Linear(n, n, weights=w)
    np.testing.assert_allclose(np.asarray(lin.weights), w.T)


def test_linear_masked():
    n, m = 6, 3
    rng = np.random.default_rng(1)
    w = rng.normal(size=(m, n))
    mask = (rng.random(size=(m, n)) > 0.5).astype(float)
    edge = LinearMasked(n, m, mask=mask, weights=w, detach=False)
    x = jnp.asarray(rng.normal(size=(n,)))
    np.testing.assert_allclose(np.asarray(edge.forward(x)), (w * mask) @ np.asarray(x), atol=accuracy)
    assert edge.train_keys == ["weights"]  # mask stays frozen


def test_linear_memory_delays():
    """Per-source integer delays: x[i] arrives delays[i] steps later."""
    n, m = 3, 3
    delays = np.array([0, 1, 2])
    w = np.eye(3)
    edge = LinearMemory(n, m, delays=delays, weights=w)
    impulse = jnp.asarray([1.0, 1.0, 1.0])
    zero = jnp.zeros(3)
    outs = [np.asarray(edge.forward(impulse))]
    for _ in range(3):
        outs.append(np.asarray(edge.forward(zero)))
    np.testing.assert_allclose(outs[0], [1.0, 0.0, 0.0])  # delay 0: immediate
    np.testing.assert_allclose(outs[1], [0.0, 1.0, 0.0])  # delay 1
    np.testing.assert_allclose(outs[2], [0.0, 0.0, 1.0])  # delay 2
    np.testing.assert_allclose(outs[3], [0.0, 0.0, 0.0])

    with pytest.raises(ValueError):
        LinearMemory(n, m, delays=np.array([0, 1]))


def test_linear_filter():
    n, m = 4, 2
    rng = np.random.default_rng(2)
    F = rng.normal(size=(n, n)) * 0.1
    w = rng.normal(size=(m, n))
    edge = LinearFilter(n, m, filter_weights=F, weights=w)
    x1 = np.asarray(rng.normal(size=(n,)))
    x2 = np.asarray(rng.normal(size=(n,)))
    y1 = np.asarray(edge.forward(jnp.asarray(x1)))
    y2 = np.asarray(edge.forward(jnp.asarray(x2)))
    # oracle: y_state <- F @ y_state + x ; out = W @ y_state
    ys = F @ np.zeros(n) + x1
    np.testing.assert_allclose(y1, w @ ys, atol=accuracy)
    ys = F @ ys + x2
    np.testing.assert_allclose(y2, w @ ys, atol=accuracy)

    with pytest.raises(ValueError):
        LinearFilter(n, m, filter_weights=np.zeros((n + 1, n)))


def test_linear_memory_filter():
    n, m = 3, 3
    rng = np.random.default_rng(3)
    delays = np.array([1, 1, 1])
    F = np.eye(n) * 0.5
    edge = LinearMemoryFilter(n, m, delays=delays, filter_weights=F, weights=np.eye(n))
    y1 = np.asarray(edge.forward(jnp.ones(n)))
    np.testing.assert_allclose(y1, 0.0, atol=accuracy)  # delayed by 1 step
    y2 = np.asarray(edge.forward(jnp.zeros(n)))
    # after roll+filter, the written 1.0 reaches slot 0 scaled by... the write
    # was at slot 1 un-filtered at write time; next step it is rolled to slot 0
    # and filtered by F once.
    np.testing.assert_allclose(y2, 0.5, atol=accuracy)


def test_rls_layer():
    n, m = 10, 2
    rng = np.random.default_rng(5)
    w1 = rng.normal(size=(n, m))
    x = jnp.asarray(rng.normal(size=(n,)))
    y = jnp.asarray(rng.normal(size=(m,)))

    rls1 = RLS(n, m)
    rls2 = RLS(n, m, weights=w1)
    rls3 = RLS(n, m, weights=w1, beta=0.5)
    rls4 = RLS(n, m, weights=w1, alpha=0.1)

    np.testing.assert_allclose(np.asarray(rls2.weights), w1.T, atol=accuracy)
    assert rls1.P.shape[0] == n
    assert len(list(rls2.parameters())) == 0

    r1_1 = rls1.forward(x)
    r1_2 = rls1.forward(x)
    for rls in [rls2, rls3, rls4]:
        y_hat = rls.forward(x)
        rls.update(x, y_hat, y)
    r2 = np.asarray(rls2.forward(x))
    r3 = np.asarray(rls3.forward(x))
    r4 = np.asarray(rls4.forward(x))

    assert r1_1.shape[0] == m
    np.testing.assert_allclose(np.asarray(r1_1), np.asarray(r1_2), atol=accuracy)
    assert np.abs(np.sum(r2 - r3)) > 0
    assert np.abs(np.sum(r3 - r4)) > 0

    with pytest.raises(ValueError):
        RLS(n, m, alpha=-0.5)
    with pytest.raises(ValueError):
        RLS(n, m, beta=1.5)


def test_rls_converges_to_linear_readout():
    """Online RLS should recover a linear teacher y = W x."""
    n, m = 8, 2
    rng = np.random.default_rng(6)
    W_true = rng.normal(size=(m, n))
    rls = RLS(n, m, beta=1.0, alpha=1.0)
    for _ in range(300):
        x = jnp.asarray(rng.normal(size=(n,)))
        y = jnp.asarray(W_true @ np.asarray(x))
        y_hat = rls.forward(x)
        rls.update(x, y, y_hat)
    np.testing.assert_allclose(np.asarray(rls.weights), W_true, atol=1e-2)
    assert float(rls.loss) < 1e-3


def test_linear_memory_matrix_oracle():
    """Per-connection delays: y_i(t) = sum_j W_ij x_j(t - d_ij), checked
    against a brute-force history oracle on random delays/weights."""
    from rectipy_tpu.edges import LinearMemoryMatrix

    rng = np.random.default_rng(7)
    n_in, n_out, T = 4, 3, 12
    W = rng.normal(size=(n_out, n_in))
    D = rng.integers(0, 5, size=(n_out, n_in))
    xs = rng.normal(size=(T, n_in))

    edge = LinearMemoryMatrix(n_in, n_out, delays=D, weights=W)
    assert edge.max_delay == int(D.max())
    got = np.stack([np.asarray(edge.forward(jnp.asarray(x))) for x in xs])

    want = np.zeros((T, n_out))
    for t in range(T):
        for i in range(n_out):
            for j in range(n_in):
                td = t - D[i, j]
                if td >= 0:
                    want[t, i] += W[i, j] * xs[td, j]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_linear_memory_matrix_reduces_to_per_source():
    """Per-source delay matrix (d_ij = d_j) == LinearMemory exactly.  Square
    matrices follow the weights convention (given as (source, target) and
    transposed), so per-SOURCE delays are constant along the given ROWS."""
    from rectipy_tpu.edges import LinearMemoryMatrix

    rng = np.random.default_rng(3)
    n = 5
    W = rng.normal(size=(n, n))
    d_src = np.array([0, 2, 1, 3, 0])
    D = np.tile(d_src[:, None], (1, n))  # given[j, i] = d_src[j]
    m_edge = LinearMemoryMatrix(n, n, delays=D, weights=W)
    s_edge = LinearMemory(n, n, delays=d_src, weights=W)
    for t in range(8):
        x = jnp.asarray(rng.normal(size=n))
        np.testing.assert_allclose(np.asarray(m_edge.forward(x)),
                                   np.asarray(s_edge.forward(x)), rtol=1e-6)


def test_linear_memory_matrix_validation():
    from rectipy_tpu.edges import LinearMemoryMatrix

    with pytest.raises(ValueError):  # 1-D delays belong to LinearMemory
        LinearMemoryMatrix(3, 3, delays=np.array([0, 1, 2]))
    with pytest.raises(ValueError):  # shape mismatch
        LinearMemoryMatrix(3, 2, delays=np.zeros((3, 3), dtype=int))
    with pytest.raises(ValueError):  # negative delays
        LinearMemoryMatrix(2, 2, delays=np.array([[0, -1], [0, 0]]))
    with pytest.raises(ValueError):  # no diagonal (1-D weight) form
        LinearMemoryMatrix(3, 3, delays=np.zeros((3, 3), dtype=int),
                           weights=np.ones(3))
    # rectangular (n_in, n_out) delay matrix auto-transposes like weights
    D = np.arange(6).reshape(3, 2)
    e = LinearMemoryMatrix(3, 2, delays=D, weights=np.ones((2, 3)))
    assert e.delays.shape == (2, 3)
    with pytest.raises(ValueError):  # non-integral floats must be explicit
        LinearMemoryMatrix(2, 2, delays=np.array([[0.0, 1.7], [1.0, 0.0]]))
    # integral floats are accepted (distance/speed/dt after np.rint)
    e2 = LinearMemoryMatrix(2, 2, delays=np.array([[0.0, 2.0], [1.0, 0.0]]))
    assert e2.max_delay == 2


def test_linear_memory_matrix_square_weight_delay_pairing():
    """Square W and D given in the same (source, target) layout must pair
    per-connection: y_i(t) = sum_j W_given[j, i] * x_j(t - D_given[j, i]).
    Regression for the review finding that square W auto-transposed
    (reference parity) while square D did not -- weights paired with the
    WRONG delays on any asymmetric square matrix."""
    from rectipy_tpu.edges import LinearMemoryMatrix

    rng = np.random.default_rng(21)
    n, T = 4, 12
    W = rng.normal(size=(n, n))        # asymmetric
    D = rng.integers(0, 5, size=(n, n))  # asymmetric
    xs = rng.normal(size=(T, n))
    edge = LinearMemoryMatrix(n, n, delays=D, weights=W)
    got = np.stack([np.asarray(edge.forward(jnp.asarray(x))) for x in xs])
    want = np.zeros((T, n))
    for t in range(T):
        for i in range(n):
            for j in range(n):
                td = t - D[j, i]
                if td >= 0:
                    want[t, i] += W[j, i] * xs[td, j]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_linear_memory_matrix_modes_identical():
    """The one-hot MXU contraction and the factored (digit-decomposed)
    two-stage contraction both equal the gather bit-for-bit (each selection
    path has exactly one 0/1-masked nonzero term)."""
    from rectipy_tpu.edges import LinearMemoryMatrix

    rng = np.random.default_rng(13)
    n_in, n_out, T = 5, 4, 40
    W = rng.normal(size=(n_out, n_in))
    D = rng.integers(0, 23, size=(n_out, n_in))
    edges = {m: LinearMemoryMatrix(n_in, n_out, delays=D, weights=W, mode=m)
             for m in ("gather", "onehot", "factored")}
    assert all(e.mode == m for m, e in edges.items())
    assert edges["factored"]._buffer.shape[1] >= int(D.max()) + 1  # Q*S pad
    for _ in range(T):
        x = jnp.asarray(rng.normal(size=n_in))
        ys = {m: np.asarray(e.forward(x)) for m, e in edges.items()}
        np.testing.assert_array_equal(ys["gather"], ys["onehot"])
        np.testing.assert_array_equal(ys["gather"], ys["factored"])
    # auto mode: factored (the measured winner) -> gather when too large
    import os
    assert LinearMemoryMatrix(n_in, n_out, delays=D).mode == "factored"
    os.environ["RECTIPY_DELAY_FACTORED_LIMIT"] = "1"
    try:
        assert LinearMemoryMatrix(n_in, n_out, delays=D).mode == "gather"
    finally:
        del os.environ["RECTIPY_DELAY_FACTORED_LIMIT"]
    with pytest.raises(ValueError):
        LinearMemoryMatrix(n_in, n_out, delays=D, mode="banana")


def test_linear_memory_matrix_interp_mode():
    """mode='interp' (continuous delays): equals the one-hot read exactly at
    integer delays; a fractional delay splits an impulse linearly across the
    two adjacent slots; the delay gradient matches finite differences."""
    from rectipy_tpu.edges import LinearMemoryMatrix

    rng = np.random.default_rng(0)
    n = 4
    W = rng.normal(size=(n, n))
    D = rng.integers(0, 5, size=(n, n)).astype(float)
    e_i = LinearMemoryMatrix(n, n, delays=D, weights=W, mode="interp")
    e_o = LinearMemoryMatrix(n, n, delays=D.astype(int), weights=W, mode="onehot")
    for _ in range(12):
        x = jnp.asarray(rng.normal(size=n))
        np.testing.assert_allclose(np.asarray(e_i.forward(x)),
                                   np.asarray(e_o.forward(x)), atol=1e-12)

    # d = 1.5: an impulse arrives half at step 1, half at step 2
    e = LinearMemoryMatrix(1, 1, delays=np.array([[1.5]]),
                           weights=np.array([[1.0]]), mode="interp")
    outs = [float(e.forward(jnp.asarray([1.0]))[0])]
    outs += [float(e.forward(jnp.asarray([0.0]))[0]) for _ in range(3)]
    assert outs == [0.0, 0.5, 0.5, 0.0]

    # gradient wrt the delay == finite difference
    import jax as _jax

    e = LinearMemoryMatrix(1, 1, delays=np.array([[1.5]]),
                           weights=np.array([[1.0]]), mode="interp")
    step = e.make_step()
    xs = jnp.asarray(np.sin(np.arange(10.0)))[:, None]

    def loss(dv):
        p = {**e.params, "delays": jnp.asarray([[dv]])}
        buf = e.init_state()
        tot = 0.0
        for x in xs:
            buf, y = step(buf, p, x)
            tot = tot + (y[0] - 0.3) ** 2
        return tot

    g = float(_jax.grad(loss)(1.5))
    fd = float((loss(1.5 + 1e-5) - loss(1.5 - 1e-5)) / 2e-5)
    np.testing.assert_allclose(g, fd, atol=1e-4)

    # validation: train_delays needs a trainable edge; max_delay headroom
    with pytest.raises(ValueError):
        LinearMemoryMatrix(2, 2, delays=np.ones((2, 2)), train_delays=True)
    with pytest.raises(ValueError):
        LinearMemoryMatrix(2, 2, delays=np.full((2, 2), 3.0), mode="interp",
                           max_delay=2)
    with pytest.raises(ValueError):
        LinearMemoryMatrix(2, 2, delays=np.ones((2, 2)), train_delays=True,
                           mode="gather", detach=False)


def test_linear_memory_matrix_interp_factored2_equals_hat():
    """The TVB-scale interp implementation (two-point blend of factored
    integer reads, selected past RECTIPY_DELAY_HAT_LIMIT) is value- AND
    gradient-identical to the triangular-hat read."""
    import os

    import jax as _jax

    from rectipy_tpu.edges import LinearMemoryMatrix

    rng = np.random.default_rng(2)
    n = 5
    W = rng.normal(size=(n, n))
    D = rng.uniform(0.0, 6.0, size=(n, n))
    e_hat = LinearMemoryMatrix(n, n, delays=D, weights=W, mode="interp",
                               max_delay=7)
    os.environ["RECTIPY_DELAY_HAT_LIMIT"] = "1"
    try:
        e_f2 = LinearMemoryMatrix(n, n, delays=D, weights=W, mode="interp",
                                  max_delay=7)
    finally:
        del os.environ["RECTIPY_DELAY_HAT_LIMIT"]
    assert e_hat._interp_impl == "hat" and e_f2._interp_impl == "factored2"

    for _ in range(20):
        x = jnp.asarray(rng.normal(size=n))
        np.testing.assert_allclose(np.asarray(e_hat.forward(x)),
                                   np.asarray(e_f2.forward(x)), atol=1e-12)

    xs = jnp.asarray(rng.normal(size=(15, n)))

    def make_loss(e):
        step = e.make_step()

        def loss(d):
            p = {**e.params, "delays": d}
            buf = jnp.zeros_like(e.init_state())
            tot = 0.0
            for x in xs:
                buf, y = step(buf, p, x)
                tot = tot + jnp.sum(y ** 2)
            return tot

        return loss

    d0 = jnp.asarray(D + 0.3)  # interior of the fractional intervals
    g_hat = _jax.grad(make_loss(e_hat))(d0)
    g_f2 = _jax.grad(make_loss(e_f2))(d0)
    np.testing.assert_allclose(np.asarray(g_f2), np.asarray(g_hat),
                               rtol=1e-9, atol=1e-12)


def test_linear_memory_matrix_read_dtype_and_fine_s():
    """read_dtype=bfloat16 streams the 0/1 selectors at half width: the slot
    SELECTION stays exact, so the read equals the history rounded once to
    bfloat16 (same precision tier as a bf16 dense coupling).  fine_s
    overrides the factored fine-digit width without changing values."""
    import os

    from rectipy_tpu.edges import LinearMemoryMatrix

    rng = np.random.default_rng(17)
    n_in, n_out, T = 5, 4, 30
    W = rng.normal(size=(n_out, n_in))
    D = rng.integers(0, 23, size=(n_out, n_in))
    xs = rng.normal(size=(T, n_in))

    ref = LinearMemoryMatrix(n_in, n_out, delays=D, weights=W, mode="gather")
    # oracle: exact gather of the history, rounded once to bf16 per read
    hist = np.zeros((n_in, int(D.max()) + 1))
    for mode in ("factored", "onehot"):
        e = LinearMemoryMatrix(n_in, n_out, delays=D, weights=W, mode=mode,
                               read_dtype=jnp.bfloat16)
        assert e._sel_dtype == jnp.bfloat16
        hist[:] = 0.0
        for x in xs:
            hist = np.concatenate([x[:, None], hist[:, :-1]], axis=1)
            vals = np.take_along_axis(hist, D.T, axis=1)  # (n_in, n_out)
            vals_bf16 = np.asarray(jnp.asarray(vals).astype(jnp.bfloat16),
                                   dtype=np.float64)
            want = np.einsum("ij,ji->i", W, vals_bf16)
            got = np.asarray(e.forward(jnp.asarray(x)))
            np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    # fine_s: any S in [1, D+1] is value-identical (factored is exact)
    for S in (1, 2, 7, int(D.max()) + 1):
        e = LinearMemoryMatrix(n_in, n_out, delays=D, weights=W,
                               mode="factored", fine_s=S)
        assert e._fQS[1] == S
        ref2 = LinearMemoryMatrix(n_in, n_out, delays=D, weights=W,
                                  mode="gather")
        for x in xs[:10]:
            np.testing.assert_array_equal(
                np.asarray(e.forward(jnp.asarray(x))),
                np.asarray(ref2.forward(jnp.asarray(x))))

    # env knobs mirror the kwargs; invalid values raise
    os.environ["RECTIPY_DELAY_FINE_S"] = "3"
    os.environ["RECTIPY_DELAY_READ_DTYPE"] = "bfloat16"
    try:
        e = LinearMemoryMatrix(n_in, n_out, delays=D, weights=W,
                               mode="factored")
        assert e._fQS[1] == 3 and e.read_dtype == jnp.bfloat16
    finally:
        del os.environ["RECTIPY_DELAY_FINE_S"]
        del os.environ["RECTIPY_DELAY_READ_DTYPE"]
    with pytest.raises(ValueError):
        LinearMemoryMatrix(n_in, n_out, delays=D, read_dtype=jnp.int8)
    with pytest.raises(ValueError):
        LinearMemoryMatrix(n_in, n_out, delays=D, fine_s=0)

    # interp factored2 with read_dtype: blend of bf16 reads, f stays full
    # precision (delay gradients unaffected by the half-width stream)
    Df = D.astype(float) + 0.25
    os.environ["RECTIPY_DELAY_HAT_LIMIT"] = "1"
    try:
        e = LinearMemoryMatrix(n_in, n_out, delays=Df, weights=W,
                               mode="interp", read_dtype=jnp.bfloat16,
                               max_delay=int(D.max()) + 1)
    finally:
        del os.environ["RECTIPY_DELAY_HAT_LIMIT"]
    e_ref = LinearMemoryMatrix(n_in, n_out, delays=Df, weights=W,
                               mode="interp", max_delay=int(D.max()) + 1)
    assert e._interp_impl == "factored2"
    for x in xs[:10]:
        a = np.asarray(e.forward(jnp.asarray(x)))
        b = np.asarray(e_ref.forward(jnp.asarray(x)))
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


def _small_block_coupling(rng, n_br=3, cb=2, bs=4, nb_in=4):
    from rectipy_tpu.ops.sparse import BlockSparseCoupling

    blocks = rng.normal(size=(n_br, cb, bs, bs)) * 0.3
    # distinct cols per row so the densified delay matrix is well-defined
    cols = np.stack([rng.choice(nb_in, size=cb, replace=False)
                     for _ in range(n_br)]).astype(np.int32)
    return BlockSparseCoupling(blocks, cols)


def test_block_sparse_linear_oracle():
    """BlockSparseLinear with per-block delays == LinearMemoryMatrix on the
    densified coupling with the block-expanded delay matrix (and the
    delay-free edge == the dense matvec)."""
    from rectipy_tpu.edges import BlockSparseLinear, LinearMemoryMatrix

    rng = np.random.default_rng(5)
    n_br, cb, bs, nb_in = 3, 2, 4, 4
    n_out, n_in = n_br * bs, nb_in * bs
    W = _small_block_coupling(rng, n_br, cb, bs, nb_in)
    d_blk = rng.integers(0, 7, size=(n_br, cb))
    xs = rng.normal(size=(25, n_in))

    # densify: per-connection delays inherit the block's delay
    W_dense = np.zeros((n_out, n_in))
    D_dense = np.zeros((n_out, n_in), dtype=int)
    for r in range(n_br):
        for c in range(cb):
            j = int(W.cols[r, c]) * bs
            W_dense[r * bs:(r + 1) * bs, j:j + bs] = W.blocks[r, c]
            D_dense[r * bs:(r + 1) * bs, j:j + bs] = d_blk[r, c]

    e = BlockSparseLinear(n_in, n_out, weights=W, delays=d_blk)
    ref = LinearMemoryMatrix(n_in, n_out, delays=D_dense, weights=W_dense,
                             mode="gather")
    for x in xs:
        got = np.asarray(e.forward(jnp.asarray(x)))
        want = np.asarray(ref.forward(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)

    # stateless block-sparse edge == dense matvec
    e0 = BlockSparseLinear(n_in, n_out, weights=W)
    assert e0.init_state() is None
    for x in xs[:5]:
        np.testing.assert_allclose(np.asarray(e0.forward(jnp.asarray(x))),
                                   W_dense @ x, rtol=1e-9, atol=1e-12)


def test_block_sparse_linear_validation():
    from rectipy_tpu.edges import BlockSparseLinear

    rng = np.random.default_rng(6)
    W = _small_block_coupling(rng)
    n_in, n_out = 16, 12
    with pytest.raises(ValueError):  # dense weights rejected
        BlockSparseLinear(n_in, n_out, weights=np.zeros((n_out, n_in)))
    with pytest.raises(ValueError):  # wrong n_out
        BlockSparseLinear(n_in, 8, weights=W)
    with pytest.raises(ValueError):  # n_in not a block multiple
        BlockSparseLinear(n_in + 2, n_out, weights=W)
    with pytest.raises(ValueError):  # delays must be (n_br, cb)
        BlockSparseLinear(n_in, n_out, weights=W, delays=np.zeros((2, 2), int))
    with pytest.raises(ValueError):  # negative delays
        BlockSparseLinear(n_in, n_out, weights=W,
                          delays=np.full((3, 2), -1))
    with pytest.raises(ValueError):  # non-integral delays must be explicit
        BlockSparseLinear(n_in, n_out, weights=W,
                          delays=np.full((3, 2), 1.5))


def test_block_sparse_linear_network_run_and_fit():
    """Block-sparse delayed feedback through the Network API: chunked runs
    continue the circular buffer exactly; run_batch vmaps it; fit_bptt
    trains the blocks (losses decrease)."""
    from rectipy_tpu import FeedbackNetwork

    rng = np.random.default_rng(11)
    n_br = cb = 2
    bs, nb_in = 4, 2
    n = 8
    W = _small_block_coupling(rng, n_br, cb, bs, nb_in)
    d_blk = rng.integers(1, 6, size=(n_br, cb))

    def build(train=None):
        net = FeedbackNetwork(1e-2)
        net.add_diffeq_node(
            "pop", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((n, n)), source_var="tanh_op/r",
            target_var="li_op/r_in", input_var="li_op/I_ext",
            output_var="li_op/v", verbose=False, clear=True,
            file_name="bsl_net")
        net.add_edge("pop", "pop", weights=W, delays=d_blk, feedback=True,
                     train=train)
        net.compile()
        return net

    inp = rng.normal(size=(40, n))
    net = build()
    full = net.run(inp, sampling_steps=1, verbose=False).to_numpy("out")
    net2 = build()
    a = net2.run(inp[:17], sampling_steps=1, verbose=False).to_numpy("out")
    b = net2.run(inp[17:], sampling_steps=1, verbose=False).to_numpy("out")
    np.testing.assert_allclose(np.concatenate([a, b]), full,
                               rtol=1e-9, atol=1e-12)

    res = build().run_batch(rng.normal(size=(3, 20, n)), sampling_steps=1,
                            verbose=False)
    assert res["out"].shape == (3, 20, n) and np.isfinite(res["out"]).all()

    # train the blocks: teacher-student weight recovery direction
    net_t = build(train="gd")
    tgt = np.asarray(net_t.run(inp, verbose=False, sampling_steps=1).to_numpy("out"))
    edge = net_t.get_edge("pop", "pop")
    edge.weights = np.asarray(edge.weights) * 1.3
    obs = net_t.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                         verbose=False)
    losses = [float(l) for l in obs["epoch_loss"]]
    assert losses[-1] < losses[0]


def test_block_sparse_linear_block_dtype():
    """block_dtype=bfloat16 streams the blocks at half width via the
    once-per-call prep cast: outputs match the f32 edge to bf16 tolerance,
    the prepped fast path == the (in-step-cast) eager forward exactly, and
    the bf16-master blocks still train (gradients through the prep cast)."""
    from rectipy_tpu import FeedbackNetwork
    from rectipy_tpu.edges import BlockSparseLinear

    rng = np.random.default_rng(23)
    n_br, cb, bs, nb = 3, 2, 4, 3
    n_in, n_out = nb * bs, n_br * bs
    W = _small_block_coupling(rng, n_br, cb, bs, nb)
    d_blk = rng.integers(1, 6, size=(n_br, cb))
    xs = rng.normal(size=(30, n_in))

    e32 = BlockSparseLinear(n_in, n_out, weights=W, delays=d_blk)
    e16 = BlockSparseLinear(n_in, n_out, weights=W, delays=d_blk,
                            block_dtype=jnp.bfloat16)
    # prep casts; master param untouched
    sub = e16.prep_params(dict(e16.params))
    assert sub["weights"].dtype == jnp.bfloat16
    assert e16.params["weights"].dtype == e16.dtype
    # same-dtype request is a no-op
    assert BlockSparseLinear(n_in, n_out, weights=W, dtype=jnp.float32,
                             block_dtype=jnp.float32).block_dtype is None
    with pytest.raises(ValueError):
        BlockSparseLinear(n_in, n_out, weights=W, block_dtype=jnp.int8)

    got32 = np.stack([np.asarray(e32.forward(jnp.asarray(x))) for x in xs])
    got16 = np.stack([np.asarray(e16.forward(jnp.asarray(x))) for x in xs])
    np.testing.assert_allclose(got16, got32, rtol=3e-2, atol=3e-2)
    assert np.corrcoef(got16.ravel(), got32.ravel())[0, 1] > 0.999

    def build(train=None, **ekw):
        n = n_out
        net = FeedbackNetwork(1e-2)
        net.add_diffeq_node(
            "pop", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((n, n)), source_var="tanh_op/r",
            target_var="li_op/r_in", input_var="li_op/I_ext",
            output_var="li_op/v", verbose=False, clear=True,
            file_name="bsl_bd_net")
        Wsq = _small_block_coupling(rng, n_br, cb, bs, n_br)
        net.add_edge("pop", "pop", weights=W if n_in == n else Wsq,
                     delays=d_blk, feedback=True, train=train, **ekw)
        net.compile()
        return net

    # prepped network scan == per-step eager semantics (same program family
    # as the f32 network, bf16-rounded)
    inp = rng.normal(size=(25, n_out))
    o32 = build().run(inp, sampling_steps=1, verbose=False).to_numpy("out")
    o16 = build(block_dtype="bfloat16").run(
        inp, sampling_steps=1, verbose=False).to_numpy("out")
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                               rtol=3e-2, atol=3e-2)

    # bf16-master training: losses decrease, master stays f-precision
    net_t = build(train="gd", block_dtype="bfloat16")
    tgt = np.asarray(net_t.run(inp, verbose=False,
                               sampling_steps=1).to_numpy("out"))
    edge = net_t.get_edge("pop", "pop")
    edge.weights = np.asarray(edge.weights) * 1.3
    obs = net_t.fit_bptt([inp] * 8, [tgt] * 8, optimizer="adam", lr=1e-2,
                         verbose=False)
    losses = [float(l) for l in obs["epoch_loss"]]
    assert losses[-1] < losses[0]
    assert net_t.get_edge("pop", "pop").weights.dtype == net_t.dtype


def test_interp_impl_override_bit_identical():
    """interp_impl='hat'/'factored2' (round 5): explicit per-edge override
    of the interp-read implementation; both are bit-identical reads and the
    factored2 buffer round-trips through chunked runs."""
    import numpy as np
    import jax.numpy as jnp

    from rectipy_tpu.edges import LinearMemoryMatrix

    rng = np.random.default_rng(5)
    n, m, T = 4, 3, 30
    d = rng.uniform(0.0, 6.0, size=(n, m))
    W = rng.standard_normal((n, m))
    edges = {}
    for impl in ("hat", "factored2"):
        e = LinearMemoryMatrix(m, n, delays=d, weights=W, dtype=jnp.float64,
                               mode="interp", max_delay=8, interp_impl=impl)
        assert e._interp_impl == impl
        edges[impl] = e
    xs = rng.standard_normal((T, m))
    outs = {}
    for impl, e in edges.items():
        state = e.init_state()
        step = e.make_step()
        prep = e.prep_params(dict(e.params))
        ys = []
        for t in range(T):
            state, y = step(state, prep, jnp.asarray(xs[t]))
            ys.append(np.asarray(y))
        outs[impl] = np.stack(ys)
    np.testing.assert_allclose(outs["factored2"], outs["hat"],
                               rtol=1e-12, atol=1e-12)
    import pytest

    with pytest.raises(ValueError, match="interp_impl"):
        LinearMemoryMatrix(m, n, delays=d, weights=W, mode="interp",
                           max_delay=8, interp_impl="nope")
