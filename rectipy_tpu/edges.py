"""Edge runtime: linear projections, delay buffers, filters, online RLS.

Functional re-design of the reference edge layer
(/root/reference/rectipy/edges.py).  Every edge exposes
``init_state() -> pytree`` and ``make_step() -> (state, params, x) ->
(state', y)``; parameters live in a ``params`` dict so the Network can lift
them into one global pytree for jit/grad.  The object ``forward`` wrappers
keep the reference's eager API working.

Semantics:
- ``Linear``: ``y = W @ x``; weights auto-transposed when given as
  ``(n_in, n_out)`` (/root/reference/rectipy/edges.py:17-26).
- ``LinearMasked``: ``y = (W * M) @ x`` with a fixed binary mask.
- ``LinearMemory``: per-source integer delays via a ring buffer of shape
  ``(n_in, max_delay+1)``; each step the buffer shifts toward slot 0, the new
  input is written at each source's delay offset, and slot 0 (post-write) is
  projected.  Note: this is the *intended* per-source semantics; the
  reference's fancy-indexed write (``buffer[:, delays] = x``,
  /root/reference/rectipy/edges.py:93) broadcasts across rows, clobbering
  other sources' history -- a latent bug we do not replicate.
- ``LinearMemoryMatrix``: per-CONNECTION integer delays ``y_i = sum_j W_ij *
  x_j(t - d_ij)`` (beyond-reference; the whole-brain / connectome workload).
- ``LinearFilter``: linear state-space synaptic filter ``y <- F @ y + x``.
- ``LinearMemoryFilter``: filtered ring buffer.
- ``RLS``: extended recursive least squares (FORCE-style; Principe et al.
  2011), rank-1 P/weight updates (/root/reference/rectipy/edges.py:227-234).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .nodes import resolve_dtype

__all__ = ["Linear", "LinearMasked", "LinearMemory", "LinearMemoryMatrix", "LinearFilter",
           "LinearMemoryFilter", "RLS", "STDP", "LinearSTP", "BlockSparseLinear"]


def _as_array(x, dtype):
    if hasattr(x, "detach"):  # torch tensor compatibility
        x = x.detach().cpu().numpy()
    return jnp.asarray(np.asarray(x), dtype=dtype)


def _apply_w(w, v):
    """Edge projection: 2-D weights -> matvec; 1-D weights -> diagonal
    (elementwise) gains.  The diagonal form exists for population-scale edges
    (e.g. per-neuron delay feedback at N=100k) where an (N, N) identity-like
    matrix would cost 40 GB for what is an O(N) operation."""
    return w * v if w.ndim == 1 else w @ v


class Linear:
    """Static/trainable linear projection ``y = W @ x``."""

    _tensors = ["weights"]

    def __init__(self, n_in: int, n_out: int, weights=None, dtype=jnp.float64,
                 detach: bool = True, rng: Optional[np.random.Generator] = None, **kwargs):
        self.dtype = resolve_dtype(dtype)
        if weights is None:
            rng = rng or np.random.default_rng()
            weights = rng.standard_normal((n_out, n_in))
        weights = _as_array(weights, self.dtype)
        if weights.ndim == 1:
            # diagonal edge: per-source gains (requires square edge)
            if n_in != n_out or weights.shape[0] != n_in:
                raise ValueError(
                    "1-D (diagonal) edge weights require n_in == n_out == len(weights); "
                    f"got {weights.shape[0]} gains for a ({n_out}, {n_in}) edge."
                )
        # reference parity: a (n_in, n_out)-shaped matrix is auto-transposed --
        # including the square case (/root/reference/rectipy/edges.py:22-23)
        elif weights.shape == (n_in, n_out):
            weights = weights.T
        elif weights.shape != (n_out, n_in):
            raise ValueError(
                "Shape of the provided weights does not match the input and output dimensions "
                "of the source and target nodes."
            )
        self.n_in = n_in
        self.n_out = n_out
        self.params: Dict[str, jnp.ndarray] = {"weights": weights}
        self.train_keys = []
        # remember the requested trainables so params registered by
        # subclasses AFTER this constructor (filter, mask) still become
        # trainable -- the reference sets those attributes before its super
        # call, so e.g. LinearFilter trains its filter by default
        # (/root/reference/rectipy/edges.py:38-43,113-116)
        self._train_req: list = []
        if not detach:
            train_params = kwargs.pop("train_params", self._tensors)
            self._train_req = list(train_params)
            self.train_keys = [k for k in self._tensors if k in train_params and k in self.params]

    def _register_param(self, name: str, value) -> None:
        """Add a parameter created by a subclass constructor, honoring the
        train_params request made at __init__ time."""
        self.params[name] = value
        if name in self._train_req and name in self._tensors and name not in self.train_keys:
            self.train_keys.append(name)

    # -- reference-parity attribute access -------------------------------------
    @property
    def weights(self):
        return self.params["weights"]

    @weights.setter
    def weights(self, w):
        self.params["weights"] = _as_array(w, self.dtype)

    @property
    def train_params(self) -> list:
        return [self.params[k] for k in self.train_keys]

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def parameters(self, recurse: bool = True) -> Iterator:
        for k in self.train_keys:
            yield self.params[k]

    def detach(self):
        self.train_keys = []

    def to(self, device: str, **kwargs):
        return self  # placement is XLA's job; kept for API parity

    # -- functional protocol ----------------------------------------------------
    def init_state(self):
        return None

    def make_step(self) -> Callable:
        def step(state, params, x):
            return state, _apply_w(params["weights"], x)

        return step

    def forward(self, x, **kwargs):
        state, y = self.make_step()(self.init_state(), self.params, jnp.asarray(x, dtype=self.dtype))
        return y


class LinearMasked(Linear):
    """Sparse trainable connectivity: ``y = (W * mask) @ x`` with a fixed mask."""

    _tensors = ["weights", "mask"]

    def __init__(self, n_in: int, n_out: int, mask, weights=None, dtype=jnp.float64,
                 detach: bool = True, **kwargs):
        kwargs.setdefault("train_params", ["weights"])
        super().__init__(n_in, n_out, weights=weights, dtype=dtype, detach=detach, **kwargs)
        mask = _as_array(mask, self.dtype)
        if mask.shape == (n_in, n_out):
            mask = mask.T
        elif mask.shape != (n_out, n_in):
            raise ValueError(
                "Shape of the provided mask does not match the input and output dimensions "
                "of the source and target nodes."
            )
        self._register_param("mask", mask)

    @property
    def mask(self):
        return self.params["mask"]

    def make_step(self) -> Callable:
        def step(state, params, x):
            return state, (params["weights"] * params["mask"]) @ x

        return step


class LinearMemory(Linear):
    """Delay edge (DDE support): per-source integer delays with a ring buffer."""

    _tensors = ["weights", "buffer", "delays"]

    def __init__(self, n_in: int, n_out: int, delays, weights=None, dtype=jnp.float64,
                 detach: bool = True, **kwargs):
        kwargs.setdefault("train_params", ["weights"])
        super().__init__(n_in, n_out, weights=weights, dtype=dtype, detach=detach, **kwargs)
        delays = np.asarray(delays)
        if len(delays) != n_in:
            raise ValueError("The number of delays must match the number of node inputs.")
        self.delays = jnp.asarray(delays.astype(np.int64))
        self.max_delay = int(delays.max())
        self._buffer = jnp.zeros((n_in, self.max_delay + 1), dtype=self.dtype)
        # one-hot write mask (n_in, D): row i writes at column delays[i].
        # Scatter-free so the scan body stays a couple of fused VPU ops.
        eye = np.zeros((n_in, self.max_delay + 1), dtype=np.float64)
        eye[np.arange(n_in), delays.astype(np.int64)] = 1.0
        self._write_mask = jnp.asarray(eye, dtype=self.dtype)

    @property
    def buffer(self):
        return self._buffer

    def init_state(self):
        return self._buffer

    def set_state(self, state):
        self._buffer = state

    def make_step(self) -> Callable:
        mask = self._write_mask

        def step(buf, params, x):
            buf = jnp.roll(buf, -1, axis=1)
            buf = buf * (1.0 - mask) + mask * x[:, None]
            return buf, _apply_w(params["weights"], buf[:, 0])

        return step

    def forward(self, x, **kwargs):
        self._buffer, y = self.make_step()(self._buffer, self.params, jnp.asarray(x, dtype=self.dtype))
        return y


class LinearMemoryMatrix(Linear):
    """Per-CONNECTION integer delays: ``y_i = sum_j W_ij * x_j(t - d_ij)``.

    Beyond-reference component: the reference's delay edge carries one delay
    per *source* (/root/reference/rectipy/edges.py:74-108, and so does
    :class:`LinearMemory`), but the standard whole-brain workload (The
    Virtual Brain-style connectome simulation) needs a full delay *matrix* --
    ``d_ij = distance_ij / conduction_speed`` differs per connection, and the
    delay structure, not just the weights, shapes the network rhythms.

    TPU-native design: the state is a ring buffer ``(n_in, max_delay+1)`` of
    the source's recent history (column ``k`` holds ``x(t-k)``), shifted with
    a static ``concatenate`` (no scatter) so the scan body stays fused; the
    per-connection read is one ``take_along_axis`` gather of ``(n_in, n_out)``
    elements against the static delay matrix, followed by the weighted
    row-sum.  All shapes static, differentiable (``fit_bptt`` trains ``W``
    through the gather via the plain-autodiff path), vmappable
    (``run_batch``), and the buffer rides the scan carry / ``set_state``
    write-back like every other stateful edge (chunked runs and checkpoints
    are exact).

    ``delays`` is an ``(n_out, n_in)`` integer matrix of step delays
    (``d_ij`` = delay from source ``j`` into target ``i``); an
    ``(n_in, n_out)`` matrix is auto-transposed following the weights rule
    EXACTLY -- including the square case, which (like the reference's
    square-weights parity rule, edges.py:74-77) is always interpreted as
    ``(source, target)`` and transposed, so a square ``W[a, b]`` and
    ``D[a, b]`` given in the same layout always pair the same connection.
    ``d_ij = 0`` means instantaneous coupling (this step's input), matching
    :class:`LinearMemory`'s convention.  When the per-source condition holds
    (``d_ij = d_j``) this edge is exactly :class:`LinearMemory`
    (regression-tested).

    Three bit-identical evaluation modes
    (``mode='auto'|'onehot'|'factored'|'gather'``), because 2-D gathers
    serialize on the TPU (measured: 83 us/step at M=90, 9.7 ms/step at
    M=998, against a ~1 us DMA roofline):

    - ``factored`` (the default while its selectors fit, up to
      ``RECTIPY_DELAY_FACTORED_LIMIT`` elements, default 2^27):
      digit-decompose the delays, ``d = q*S + r`` with ``S ~
      sqrt(max_delay/5)``; the buffer reshapes to ``(n_in, Q, S)`` and the
      read becomes a batched matmul with the ``(n_in, n_out, Q)`` coarse
      one-hot followed by an elementwise reduce with the ``(n_in, n_out,
      S)`` fine one-hot -- still exact (each path selects exactly one
      buffer slot), with ``n*m*(Q+S)`` selector memory instead of
      ``n*m*(max_delay+1)``.  Measured (v5e, benchmarks/whole_brain_scale
      .py): M=90 Jansen-Rit with delays spanning 1054 steps runs 47k
      steps/s = 96% of the ZERO-delay step cost (4.7x the gather); M=998
      with a 1157-step delay span runs 3,334 steps/s = 32x the gather
      (46% of zero-delay).
    - ``onehot``: the full ``(n_in, n_out, max_delay+1)`` 0/1 selector,
      one MXU contraction ``vals = einsum('jk,jik->ji', buffer, onehot)``.
      Measured 34.9k steps/s at M=90 (same round: factored 47.3k) --
      simpler but strictly dominated by ``factored``; kept for A/B.
    - ``gather``: ``take_along_axis`` -- the memory-light fallback for
      anything larger (10k steps/s at M=90, 103 steps/s at M=998).

    The selectors are built ON DEVICE by the once-per-call prep pass
    (``prep_params``), never embedded as program constants: at M=998 they
    are ~370 MB and the tunneled remote compile rejects such programs
    (HTTP 413, measured).

    ``mode='interp'`` generalizes the read to CONTINUOUS delays: the
    selector becomes the triangular kernel ``max(0, 1 - |d_ij - k|)``, i.e.
    linear interpolation between the two adjacent buffer slots (exactly the
    one-hot at integer ``d``).  With ``train_delays=True`` (requires
    ``train='gd'``) the float delay matrix lives in ``params['delays']``
    and is TRAINED BY BPTT alongside the weights -- differentiable
    conduction delays, i.e. fitting tract delays from data; delays are
    clipped to ``[0, max_delay]`` (pass ``max_delay=`` for headroom above
    the initial values; at the clip boundary the delay gradient is zero).
    ``self.delays`` keeps the INITIAL values; the live (trained) matrix is
    ``params['delays']``.  Past ``RECTIPY_DELAY_HAT_LIMIT`` elements
    (default 2^24) the triangular tensor is replaced by a TWO-POINT blend
    of factored integer reads -- value- and gradient-identical
    (regression-tested), ``nm(2Q+2S+1)`` selector memory: trainable delays
    at TVB scale.  No reference analog of any kind.

    ``read_dtype`` (or env ``RECTIPY_DELAY_READ_DTYPE``) selects a reduced
    precision for the delayed READ -- the same tier the framework offers for
    dense couplings (bf16/int8 weight streams): the one-hot selectors are
    built AND streamed in that dtype and the ring buffer is cast once per
    step before the contraction.  Because the selectors are exactly 0/1 in
    bfloat16 and each contraction path selects exactly one buffer slot, the
    read equals the buffer value rounded once to ``read_dtype`` -- the only
    precision loss is that single rounding of the source history (the same
    loss a bf16 dense coupling incurs).  Applies to the ``onehot``,
    ``factored`` and factored-interp reads (the hat stays in ``dtype``:
    its fractional entries are not exact in bf16).  ``fine_s`` (or env
    ``RECTIPY_DELAY_FINE_S``) overrides the fine-digit width ``S`` of the
    factored decomposition (default ``S ~ sqrt(max_delay/5)``).

    Measured (v5e, M=998, 1157-step span, benchmarks/ab_delay_read.py,
    interleaved): both knobs are perf-NEUTRAL-or-worse -- bf16 reads time
    within noise of f32 (0.59 vs 0.61 s/2k steps single-trial; slightly
    ahead at B=8) and ``fine_s=5`` is ~2.4x SLOWER single-trial and ~1.2x
    slower at B=8 (the bytes model predicted batched ensembles would
    rebalance with smaller S; XLA does not materialize the per-trial
    ``t1`` intermediate the way the model assumed).  Values match f32 to
    corr 1.000000 either way.  Keep the defaults; the knobs remain for
    memory-constrained cases (bf16 halves selector MEMORY, relevant when
    ``nm(Q+S)`` selectors approach VMEM/HBM limits).
    """

    _tensors = ["weights", "buffer", "delays"]

    def __init__(self, n_in: int, n_out: int, delays, weights=None, dtype=jnp.float64,
                 detach: bool = True, mode: str = "auto", train_delays: bool = False,
                 max_delay: Optional[int] = None, read_dtype=None,
                 fine_s: Optional[int] = None, interp_impl: str = "auto",
                 **kwargs):
        if train_delays:
            if mode not in ("auto", "interp"):
                raise ValueError("train_delays=True requires the 'interp' read "
                                 f"(continuous delays); got mode={mode!r}.")
            mode = "interp"
            kwargs.setdefault("train_params", ["weights", "delays"])
        else:
            kwargs.setdefault("train_params", ["weights"])
        super().__init__(n_in, n_out, weights=weights, dtype=dtype, detach=detach, **kwargs)
        delays = np.asarray(delays)
        if delays.ndim != 2:
            raise ValueError("LinearMemoryMatrix requires a 2-D (n_out, n_in) delay matrix; "
                             "use LinearMemory for per-source (1-D) delays.")
        # the transpose rule MUST mirror the weights rule exactly -- including
        # the square case, which Linear always transposes (reference parity,
        # edges.py:74-77) -- else W and D would be read in OPPOSITE
        # orientations on square edges and every connection weight would pair
        # with the wrong delay (caught by in-session review; regression-tested)
        if delays.shape == (n_in, n_out):
            delays = delays.T
        elif delays.shape != (n_out, n_in):
            raise ValueError(
                f"Shape of the delay matrix {delays.shape} does not match the edge "
                f"dimensions ({n_out}, {n_in}).")
        if self.params["weights"].ndim != 2:
            raise ValueError("LinearMemoryMatrix requires 2-D weights (per-connection "
                             "delays have no diagonal form).")
        if delays.min() < 0:
            raise ValueError("Delays must be non-negative step counts.")
        if mode == "interp":
            # continuous (fractional, optionally TRAINABLE) delays: the read
            # linearly interpolates between the two adjacent buffer slots
            delays_f = delays.astype(np.float64)
            self.max_delay = int(max_delay) if max_delay is not None \
                else int(np.ceil(delays_f.max()))
            if delays_f.max() > self.max_delay:
                raise ValueError(f"delays exceed max_delay={self.max_delay}")
            self.delays = jnp.asarray(delays_f)
            self._register_param("delays", jnp.asarray(delays_f, dtype=self.dtype))
            if train_delays and "delays" not in self.train_keys:
                raise ValueError(
                    "train_delays=True requires a trainable edge: pass "
                    "train='gd' to add_edge (or detach=False).")
            delays = np.rint(delays_f).astype(np.int64)
        else:
            if not np.issubdtype(delays.dtype, np.integer):
                if not np.allclose(delays, np.rint(delays)):
                    raise ValueError(
                        "Delays must be integer step counts; got non-integral values "
                        "(e.g. distance/speed/dt results -- round them explicitly, "
                        "np.rint(dist / speed / dt), so the discretization is a "
                        "deliberate choice rather than a silent floor -- or use "
                        "mode='interp' for true fractional delays).")
            delays = np.rint(delays).astype(np.int64)
            self.delays = jnp.asarray(delays)
            self.max_delay = int(delays.max())
        # gather indices, pre-transposed for take_along_axis over the buffer
        self._dT = jnp.asarray(delays.T)  # (n_in, n_out)
        if mode not in ("auto", "onehot", "factored", "gather", "interp"):
            raise ValueError(f"Unknown delay-matrix mode {mode!r}; "
                             "use 'auto', 'onehot', 'factored', 'gather' or 'interp'.")
        if read_dtype is None and os.environ.get("RECTIPY_DELAY_READ_DTYPE"):
            read_dtype = os.environ["RECTIPY_DELAY_READ_DTYPE"]
        self.read_dtype = jnp.dtype(read_dtype) if read_dtype is not None else None
        if self.read_dtype is not None \
                and not jnp.issubdtype(self.read_dtype, jnp.floating):
            raise ValueError(f"read_dtype must be a floating dtype; got {read_dtype!r}")
        D1 = self.max_delay + 1
        # fine-digit width for the factored decomposition: minimizes streamed
        # bytes ~ n*m*(Q + S + f32-intermediate r/w ~ 8S) -> S ~ sqrt(D/5);
        # batched ensembles rebalance with a smaller S (the (B, n, m, S)
        # intermediate is per-trial, the selector stream is shared)
        if fine_s is None and os.environ.get("RECTIPY_DELAY_FINE_S"):
            fine_s = int(os.environ["RECTIPY_DELAY_FINE_S"])
        S = int(fine_s) if fine_s is not None \
            else max(1, int(round(np.sqrt(D1 / 5.0))))
        if S < 1 or S > D1:
            raise ValueError(f"fine_s must be in [1, max_delay+1]; got {S}")
        Q = -(-D1 // S)
        if mode == "auto":
            # measured (v5e, M=90, 799 distinct delays): factored 56.5k
            # steps/s > onehot 42.6k > gather 10.4k -- factored both wins
            # and needs n*m*(Q+S) memory instead of n*m*(D+1), so it is
            # the default whenever its selectors fit
            limit_f = int(os.environ.get("RECTIPY_DELAY_FACTORED_LIMIT", 2 ** 27))
            mode = "factored" if n_in * n_out * (Q + S) <= limit_f else "gather"
        self.mode = mode
        buf_width = D1
        if mode == "factored":
            # d = q*S + r: the buffer is kept Q*S wide so it reshapes to
            # (n_in, Q, S) for free (the extra slots hold yet-older history
            # and are never selected)
            buf_width = Q * S
        self._interp_impl = None
        if mode == "interp":
            # the triangular hat is nm(D+1); past the hat limit the read
            # becomes a TWO-POINT blend of factored integer reads (floor and
            # ceil) -- identical values, identical interior gradients, with
            # nm(2Q+2S+1) selector memory: TVB-scale trainable delays.
            # `interp_impl` overrides the size heuristic per edge: the two
            # reads TIE single-trial (interleaved A/B at M=90, round 5),
            # but PER-TRIAL delay sweeps (run_batch/fit_es over 'delays')
            # stream one selector tensor per candidate, where factored2's
            # ~6x smaller selectors measured 7x faster generations --
            # build delay-sweep edges with interp_impl='factored2'.
            if interp_impl not in ("auto", "hat", "factored2"):
                raise ValueError(
                    f"interp_impl must be 'auto', 'hat' or 'factored2'; "
                    f"got {interp_impl!r}")
            if interp_impl == "auto":
                hat_limit = int(os.environ.get("RECTIPY_DELAY_HAT_LIMIT",
                                               2 ** 24))
                interp_impl = ("hat" if n_in * n_out * D1 <= hat_limit
                               else "factored2")
            self._interp_impl = interp_impl
            if self._interp_impl == "factored2":
                buf_width = Q * S
        self._fQS = (Q, S)
        self._D1 = D1
        self._buffer = jnp.zeros((n_in, buf_width), dtype=self.dtype)

    # -- one-hot selectors, built ON DEVICE by the once-per-call prep pass.
    # They must never be closure constants: at connectome scale they are
    # hundreds of MB, and constants are embedded in the serialized program
    # (the tunneled remote compile rejects it: HTTP 413 measured at M=998,
    # 371 MB).  The prep pass (network._prep_params) injects them into the
    # edge's params inside the jitted program -- a sub-ms elementwise build
    # once per call, zero transfer, zero checkpoint weight.  Unprepped
    # paths (eager forward, plain-autodiff training) build them in-step:
    # correct everywhere, and the fast paths never pay per-step.
    @property
    def _sel_dtype(self):
        # selector storage/stream dtype: 0/1 is exact in any float dtype,
        # so a reduced read_dtype halves the per-step selector stream
        # without changing WHICH slot is selected
        return self.read_dtype if self.read_dtype is not None else self.dtype

    def _build_oh_full(self):
        return (self._dT[:, :, None]
                == jnp.arange(self._D1)[None, None, :]).astype(self._sel_dtype)

    def _build_oh_factored(self):
        Q, S = self._fQS
        q, r = self._dT // S, self._dT % S
        oh_q = (q[:, :, None] == jnp.arange(Q)[None, None, :]).astype(self._sel_dtype)
        oh_r = (r[:, :, None] == jnp.arange(S)[None, None, :]).astype(self._sel_dtype)
        return oh_q, oh_r

    def _build_hat(self, d):
        """Triangular (linear-interpolation) selector from a float delay
        matrix: ``hat[j, i, k] = max(0, 1 - |d_ij - k|)`` -- exactly the
        one-hot at integer delays, a two-slot linear blend otherwise, and
        differentiable in ``d`` (the gradient is the local finite
        difference of the source history: trainable conduction delays)."""
        dT = jnp.clip(d, 0.0, float(self.max_delay)).T
        k = jnp.arange(self._D1, dtype=dT.dtype)
        return jnp.clip(1.0 - jnp.abs(dT[:, :, None] - k[None, None, :]),
                        0.0, 1.0).astype(self.dtype)

    def _build_interp_factored(self, d):
        """Two-point factored interpolation selectors: ``vals = (1-f) *
        read(floor(d)) + f * read(ceil(d))`` with both integer reads in the
        digit-factored form.  Value-identical to the hat (the hat's two
        nonzero entries ARE (1-f, f) on the adjacent slots) and the delay
        gradient flows through ``f`` (``read(hi) - read(lo)``, the same
        local finite difference)."""
        Q, S = self._fQS
        dc = jnp.clip(d, 0.0, float(self.max_delay)).T  # (n_in, n_out)
        lo = jnp.floor(dc)
        f = (dc - lo).astype(self.dtype)
        lo_i = lo.astype(jnp.int32)
        hi_i = jnp.minimum(lo_i + 1, self.max_delay)

        def ohs(idx):
            q, r = idx // S, idx % S
            oh_q = (q[:, :, None] == jnp.arange(Q)[None, None, :]).astype(self._sel_dtype)
            oh_r = (r[:, :, None] == jnp.arange(S)[None, None, :]).astype(self._sel_dtype)
            return oh_q, oh_r

        return (f,) + ohs(lo_i) + ohs(hi_i)

    def prep_params(self, sub: Dict) -> Dict:
        if self.mode == "onehot" and "_oh" not in sub:
            return {**sub, "_oh": self._build_oh_full()}
        if self.mode == "factored" and "_oh_q" not in sub:
            oh_q, oh_r = self._build_oh_factored()
            return {**sub, "_oh_q": oh_q, "_oh_r": oh_r}
        if self.mode == "interp" and not ({"_hat", "_f"} & set(sub)):
            # NOTE gradients flow THROUGH prep where it runs inside a
            # differentiated loss (the epoch/chunk losses call
            # _prep_edge_params inside the grad), so trainable delays get
            # their cotangent even though the selectors are hoisted out of
            # the scan
            if self._interp_impl == "hat":
                return {**sub, "_hat": self._build_hat(sub["delays"])}
            f, oql, orl, oqh, orh = self._build_interp_factored(sub["delays"])
            return {**sub, "_f": f, "_oq_lo": oql, "_or_lo": orl,
                    "_oq_hi": oqh, "_or_hi": orh}
        return sub

    @property
    def buffer(self):
        return self._buffer

    def init_state(self):
        return self._buffer

    def set_state(self, state):
        self._buffer = state

    def make_step(self) -> Callable:
        dT = self._dT
        mode = self.mode
        n_in = self.n_in
        Q, S = self._fQS

        rd = self.read_dtype
        dtype = self.dtype

        def step(buf, params, x):
            # shift history one step older and write x(t) at column 0
            buf = jnp.concatenate([x[:, None], buf[:, :-1]], axis=1)
            if mode == "onehot":
                oh = params["_oh"] if "_oh" in params else self._build_oh_full()
                # vals[j, i] = x_j(t - d_ij) as an MXU contraction; with a
                # read_dtype the buffer is cast once (tiny) and the selection
                # runs at the reduced precision -- still an exact slot pick
                b = buf.astype(rd) if rd is not None else buf
                vals = jnp.einsum("jk,jik->ji", b, oh).astype(dtype)
            elif mode == "interp" and self._interp_impl == "hat":
                hat = params["_hat"] if "_hat" in params \
                    else self._build_hat(params["delays"])
                vals = jnp.einsum("jk,jik->ji", buf, hat)
            elif mode == "interp":
                if "_f" in params:
                    f = params["_f"]
                    sel = (params["_oq_lo"], params["_or_lo"],
                           params["_oq_hi"], params["_or_hi"])
                else:
                    f, *sel = self._build_interp_factored(params["delays"])
                buf3 = buf.reshape(n_in, Q, S)
                if rd is not None:
                    buf3 = buf3.astype(rd)

                def read(oh_q, oh_r):
                    t1 = jnp.einsum("jia,jab->jib", oh_q, buf3)
                    return jnp.einsum("jib,jib->ji", t1, oh_r).astype(dtype)

                # the blend stays in `dtype`: f carries the delay gradient
                vals = ((1.0 - f) * read(sel[0], sel[1])
                        + f * read(sel[2], sel[3]))
            elif mode == "factored":
                if "_oh_q" in params:
                    oh_q, oh_r = params["_oh_q"], params["_oh_r"]
                else:
                    oh_q, oh_r = self._build_oh_factored()
                buf3 = buf.reshape(n_in, Q, S)
                if rd is not None:
                    buf3 = buf3.astype(rd)
                # coarse digit: batched matmul picks buffer row-chunk q_ij
                t1 = jnp.einsum("jia,jab->jib", oh_q, buf3)
                # fine digit: elementwise-reduce picks slot r_ij within it
                vals = jnp.einsum("jib,jib->ji", t1, oh_r).astype(dtype)
            else:
                vals = jnp.take_along_axis(buf, dT, axis=1)
            return buf, jnp.einsum("ij,ji->i", params["weights"], vals)

        return step

    def forward(self, x, **kwargs):
        self._buffer, y = self.make_step()(self._buffer, self.params,
                                           jnp.asarray(x, dtype=self.dtype))
        return y


class LinearFilter(Linear):
    """Trainable synaptic filter on the edge: ``y <- F @ y + x`` then ``W @ y``."""

    _tensors = ["weights", "filter", "y"]

    def __init__(self, n_in: int, n_out: int, filter_weights, weights=None, dtype=jnp.float64,
                 detach: bool = True, **kwargs):
        kwargs.setdefault("train_params", ["weights", "filter"])
        super().__init__(n_in, n_out, weights=weights, dtype=dtype, detach=detach, **kwargs)
        filter_weights = _as_array(filter_weights, self.dtype)
        if filter_weights.shape != (n_in, n_in):
            raise ValueError(
                "Intrinsic weights have to be a square matrix with the number of rows and "
                "columns matching the number of inputs to the edge."
            )
        self._register_param("filter", filter_weights)
        self._y = jnp.zeros(n_in, dtype=self.dtype)

    @property
    def filter(self):
        return self.params["filter"]

    @property
    def y(self):
        return self._y

    def init_state(self):
        return self._y

    def set_state(self, state):
        self._y = state

    def make_step(self) -> Callable:
        def step(y, params, x):
            y = params["filter"] @ y + x
            return y, params["weights"] @ y

        return step

    def forward(self, x, **kwargs):
        self._y, out = self.make_step()(self._y, self.params, jnp.asarray(x, dtype=self.dtype))
        return out


class LinearMemoryFilter(LinearMemory):
    """Delays and a synaptic filter combined: the rolled buffer is filtered
    before the new input is written."""

    _tensors = ["weights", "buffer", "delays", "filter"]

    def __init__(self, n_in: int, n_out: int, delays, filter_weights, weights=None,
                 dtype=jnp.float64, detach: bool = True, **kwargs):
        kwargs.setdefault("train_params", ["weights", "filter"])
        super().__init__(n_in, n_out, delays=delays, weights=weights, dtype=dtype,
                         detach=detach, **kwargs)
        filter_weights = _as_array(filter_weights, self.dtype)
        if filter_weights.shape != (n_in, n_in):
            raise ValueError(
                "Intrinsic weights have to be a square matrix with the number of rows and "
                "columns matching the number of inputs to the edge."
            )
        self._register_param("filter", filter_weights)

    @property
    def filter(self):
        return self.params["filter"]

    def make_step(self) -> Callable:
        mask = self._write_mask

        def step(buf, params, x):
            buf = params["filter"] @ jnp.roll(buf, -1, axis=1)
            buf = buf * (1.0 - mask) + mask * x[:, None]
            return buf, _apply_w(params["weights"], buf[:, 0])

        return step


class LinearSTP(Linear):
    """Short-term synaptic plasticity edge (Tsodyks-Markram model).

    Beyond-reference component (the reference edge family,
    /root/reference/rectipy/edges.py:8-234, has static/delay/filter linear
    projections only -- no dynamic synapses).  Implements the mean-field
    Tsodyks-Markram synapse (Tsodyks, Pawelzik & Markram 1998, Neural
    Comput 10:821): each presynaptic channel carries a utilization variable
    ``u`` (facilitation) and a resource variable ``x`` (depression) that
    modulate transmission multiplicatively,

        m       = clip(r * dt, 0, 1)            # spike mass this step
        u+      = u + U * (1 - u) * m           # facilitation jump
        drive   = u+ * x * r                    # modulated transmission
        x-      = x * (1 - u+ * m)              # resource consumption
        u       <- U + (u+ - U) * exp(-dt/tau_facil)
        x       <- 1 + (x- - 1) * exp(-dt/tau_depress)
        y       = W @ drive

    The input ``r`` is presynaptic activity per time unit: a firing rate, a
    synaptic-activation state variable, or an impulse train with per-spike
    area 1 (amplitude ``1/dt``) -- ``m = r*dt`` is then the spike mass
    delivered in the step, and for unit impulses the update reduces exactly
    to the event-based TM rule.  ``tau_facil=0`` disables facilitation
    (``u`` pinned at ``U``: the classic depression-only synapse);
    ``tau_depress=0`` disables depression (``x`` pinned at 1).

    The (u, x) pair rides the network scan carry like the delay/filter edge
    state, so ``run``/``fit_*`` thread it exactly; it persists across
    chunked runs and checkpoints (``set_state`` write-back).
    """

    _tensors = ["weights"]

    def __init__(self, n_in: int, n_out: int, dt: float, weights=None,
                 dtype=jnp.float64, detach: bool = True, tau_facil: float = 0.0,
                 tau_depress: float = 0.0, U: float = 0.2, **kwargs):
        if tau_facil < 0 or tau_depress < 0:
            raise ValueError("STP time constants tau_facil/tau_depress must be >= 0 "
                             "(0 disables the corresponding process).")
        if not 0.0 < U <= 1.0:
            raise ValueError("STP baseline utilization U must lie in (0, 1].")
        kwargs.setdefault("train_params", ["weights"])
        super().__init__(n_in, n_out, weights=weights, dtype=dtype, detach=detach, **kwargs)
        self.dt = float(dt)
        self.tau_facil = float(tau_facil)
        self.tau_depress = float(tau_depress)
        self.U = float(U)
        self._u = jnp.full(n_in, self.U, dtype=self.dtype)
        self._x = jnp.ones(n_in, dtype=self.dtype)

    @property
    def u(self):
        return self._u

    @property
    def x(self):
        return self._x

    def init_state(self):
        return (self._u, self._x)

    def set_state(self, state):
        self._u, self._x = state

    def make_step(self) -> Callable:
        dt, U = self.dt, self.U
        facil = self.tau_facil > 0
        dep = self.tau_depress > 0
        d_f = float(np.exp(-dt / self.tau_facil)) if facil else 0.0
        d_d = float(np.exp(-dt / self.tau_depress)) if dep else 0.0

        def step(state, params, r):
            u, x = state
            m = jnp.clip(r * dt, 0.0, 1.0)
            u_plus = u + U * (1.0 - u) * m if facil else u
            drive = u_plus * x * r
            x_minus = x * (1.0 - u_plus * m) if dep else x
            u_new = U + (u_plus - U) * d_f
            x_new = 1.0 + (x_minus - 1.0) * d_d
            return (u_new, x_new), _apply_w(params["weights"], drive)

        return step

    def forward(self, x, **kwargs):
        (self._u, self._x), y = self.make_step()(
            (self._u, self._x), self.params, jnp.asarray(x, dtype=self.dtype))
        return y


class RLS(Linear):
    """Extended recursive least squares (FORCE-style online readout learning).

    State: inverse-correlation matrix ``P = alpha*I`` and the weights; per
    update (/root/reference/rectipy/edges.py:227-234):

        z = beta^-1 P x
        k = (1 + x.z)^-1
        W += outer(y - k*x.(W + outer(y,z))^T, z)
        P -= k * outer(z, z)
        loss = |y - y_hat|^2

    References: Principe et al. (2011), Kernel Adaptive Filtering.
    """

    _tensors = ["weights", "P"]

    def __init__(self, n_in: int, n_out: int, weights=None, dtype=jnp.float64,
                 beta: float = 1.0, alpha: float = 1.0, **kwargs):
        if beta > 1 or beta < 0:
            raise ValueError("Parameter beta should be a positive scalar between 0 and 1.")
        if alpha < 0:
            raise ValueError("Parameter alpha should be a positive scalar.")
        if weights is None:
            weights = jnp.zeros((n_out, n_in), dtype=resolve_dtype(dtype))
        super().__init__(n_in, n_out, weights=weights, dtype=dtype, detach=True)
        self.beta = float(beta) ** (-1)
        self.params["P"] = float(alpha) * jnp.eye(n_in, dtype=self.dtype)
        self.loss = 0.0
        self.train_keys = []

    @property
    def P(self):
        return self.params["P"]

    @staticmethod
    def update_fn(beta_inv: float):
        """Pure RLS update: ``(W, P, x, y, y_hat) -> (W', P', loss)``.  Used as
        a scan carry by Network.fit_rls."""

        def update(W, P, x, y, y_hat):
            z = beta_inv * (P @ x)
            k = 1.0 / (1.0 + x @ z)
            err = y - y_hat
            W_new = W + jnp.outer(y - k * (x @ (W + jnp.outer(y, z)).T), z)
            P_new = P - k * jnp.outer(z, z)
            return W_new, P_new, err @ err

        return update

    def update(self, x, y, y_hat) -> None:
        x = jnp.asarray(x, dtype=self.dtype)
        y = jnp.asarray(y, dtype=self.dtype)
        y_hat = jnp.asarray(y_hat, dtype=self.dtype)
        W, P, loss = self.update_fn(self.beta)(self.params["weights"], self.params["P"], x, y, y_hat)
        self.params["weights"] = W
        self.params["P"] = P
        self.loss = loss


def _check_stdp_hparams(tau_plus, tau_minus, a_plus, a_minus, w_min, w_max):
    if tau_plus <= 0 or tau_minus <= 0:
        raise ValueError("STDP time constants tau_plus/tau_minus must be positive.")
    if a_plus < 0 or a_minus < 0:
        raise ValueError("STDP amplitudes a_plus/a_minus must be non-negative.")
    if not w_max > w_min:
        raise ValueError("STDP weight bounds require w_max > w_min.")


def _resolve_stdp_w_dtype(w_dtype):
    """Validate the reduced-precision plastic-W carry dtype: an integer
    carry would truncate the ~1e-3-scale pair increments to zero and make
    plasticity a silent no-op."""
    w_dtype = jnp.dtype(resolve_dtype(w_dtype))
    if not jnp.issubdtype(w_dtype, jnp.floating):
        raise ValueError(
            f"STDP w_dtype must be a floating dtype (the plastic-W scan "
            f"carry accumulates ~a_plus-scale increments); got {w_dtype}.")
    return w_dtype


class STDP(Linear):
    """Spike-timing-dependent plasticity edge: online, unsupervised, local.

    Beyond-reference component (the reference's online trainers are RLS,
    /root/reference/rectipy/network.py:786, and the unimplemented e-prop
    stub, network.py:858-896; it ships no Hebbian/local plasticity rule).
    Pair-based all-to-all trace STDP (Morrison, Diesmann & Gerstner 2008,
    Biol Cybern 98:459), per integration step:

        x_pre  <- x_pre  * exp(-dt/tau_plus)           # decay FIRST
        x_post <- x_post * exp(-dt/tau_minus)
        pot = a_plus  * outer(spk_post, x_pre)         # pre-before-post: LTP
        dep = a_minus * outer(x_post, spk_pre)         # post-before-pre: LTD
        W <- clip(W + pot - dep, w_min, w_max)         # hard bounds (default)
        W <- W + pot*(w_max - W) - dep*(W - w_min)     # soft_bounds=True
        x_pre += spk_pre;  x_post += spk_post          # current spikes join
                                                       # AFTER use: zero-lag
                                                       # pairs do not interact

    ``tau_plus``/``tau_minus`` are in the network's time units (the decay is
    ``exp(-dt/tau)`` per step).  1-D (diagonal) weights are supported for
    population-scale self-edges: the outer products become elementwise
    products and everything is O(N).

    During simulation the edge is a plain linear projection; traces and
    weight updates are driven by :meth:`Network.fit_stdp`'s scan (W and the
    traces ride the carry), exactly like the RLS edge's (W, P).  The traces
    persist in ``params`` so chunked ``fit_stdp`` calls continue plasticity
    seamlessly.
    """

    _tensors = ["weights"]

    def __init__(self, n_in: int, n_out: int, weights=None, dtype=jnp.float64,
                 tau_plus: float = 20.0, tau_minus: float = 20.0,
                 a_plus: float = 0.005, a_minus: float = 0.00525,
                 w_min: float = 0.0, w_max: float = 1.0, soft_bounds: bool = False,
                 w_dtype=None, rng: Optional[np.random.Generator] = None, **kwargs):
        _check_stdp_hparams(tau_plus, tau_minus, a_plus, a_minus, w_min, w_max)
        if w_dtype is not None:
            # reduced-precision plastic-W carry (e.g. bfloat16): W and both
            # traces ride Network.fit_stdp's scan carry at this dtype, which
            # halves the dominant per-step read+write traffic of the dense
            # rule (the f32 W carry IS the measured roofline,
            # benchmarks/stdp_scale.py).  Numerics caveat: increments of
            # a_plus ~ 5e-3 against weights ~ w_max sit near bf16's relative
            # eps (~8e-3), so small updates quantize -- A/B before trusting.
            dtype = _resolve_stdp_w_dtype(w_dtype)
        if weights is None:
            # uniform within bounds (zeros would make a_plus the only escape
            # from the w_min boundary; mid-range random is the standard init)
            rng = rng or np.random.default_rng()
            weights = rng.uniform(w_min, w_max, size=(n_out, n_in))
        super().__init__(n_in, n_out, weights=weights, dtype=dtype, detach=True)
        self.params["weights"] = jnp.clip(self.params["weights"], w_min, w_max)
        self.tau_plus = float(tau_plus)
        self.tau_minus = float(tau_minus)
        self.a_plus = float(a_plus)
        self.a_minus = float(a_minus)
        self.w_min = float(w_min)
        self.w_max = float(w_max)
        self.soft_bounds = bool(soft_bounds)
        self.params["x_pre"] = jnp.zeros(n_in, dtype=self.dtype)
        self.params["x_post"] = jnp.zeros(n_out, dtype=self.dtype)
        self.train_keys = []  # not gradient-trainable: local rule outside autograd

    @property
    def x_pre(self):
        return self.params["x_pre"]

    @property
    def x_post(self):
        return self.params["x_post"]

    def pair_fn(self, dt: float) -> Callable:
        """Raw pair-rule increments (no bounds):
        ``(x_pre, x_post, spk_pre, spk_post) -> (pot, dep, x_pre', x_post')``.
        Traces decay FIRST, are read by the opposite-side spikes, and absorb
        the current spikes AFTER use (zero-lag pairs do not interact)."""
        d_p = float(np.exp(-dt / self.tau_plus))
        d_m = float(np.exp(-dt / self.tau_minus))
        a_p, a_m = self.a_plus, self.a_minus
        diagonal = self.params["weights"].ndim == 1

        def pair(u, v):
            return u * v if diagonal else jnp.outer(u, v)

        def increments(x_pre, x_post, spk_pre, spk_post):
            x_pre = x_pre * d_p
            x_post = x_post * d_m
            pot = a_p * pair(spk_post, x_pre)
            dep = a_m * pair(x_post, spk_pre)
            return pot, dep, x_pre + spk_pre, x_post + spk_post

        return increments

    def update_fn(self, dt: float) -> Callable:
        """Pure per-step update:
        ``(W, x_pre, x_post, spk_pre, spk_post) -> (W', x_pre', x_post')``.
        Used as a scan carry by :meth:`Network.fit_stdp`; spikes are {0,1}
        indicator vectors."""
        increments = self.pair_fn(dt)
        w_lo, w_hi = self.w_min, self.w_max
        soft = self.soft_bounds

        def update(W, x_pre, x_post, spk_pre, spk_post):
            pot, dep, x_pre, x_post = increments(x_pre, x_post, spk_pre, spk_post)
            if soft:
                W = W + pot * (w_hi - W) - dep * (W - w_lo)
            else:
                W = W + pot - dep
            return jnp.clip(W, w_lo, w_hi), x_pre, x_post

        return update

    def reward_update_fn(self, dt: float, tau_e: float) -> Callable:
        """Reward-modulated (three-factor) STDP update, the distal-reward
        rule of Izhikevich 2007 (Cereb Cortex 17:2443): the pair increments
        charge an eligibility trace instead of the weights, and the weights
        move only when a reward signal arrives --

            E <- E * exp(-dt/tau_e) + (pot - dep)
            W <- clip(W + r_t * E, w_min, w_max)

        ``(W, E, x_pre, x_post, spk_pre, spk_post, r) -> (W', E', x', x'')``.
        Hard bounds only (reward changes sign; headroom scaling is
        ill-defined)."""
        if tau_e <= 0:
            raise ValueError("reward-modulated STDP requires tau_e > 0.")
        increments = self.pair_fn(dt)
        d_e = float(np.exp(-dt / tau_e))
        w_lo, w_hi = self.w_min, self.w_max

        def update(W, E, x_pre, x_post, spk_pre, spk_post, r):
            pot, dep, x_pre, x_post = increments(x_pre, x_post, spk_pre, spk_post)
            E = E * d_e + (pot - dep)
            W = jnp.clip(W + r * E, w_lo, w_hi)
            return W, E, x_pre, x_post

        return update

    def update(self, spk_pre, spk_post, dt: float) -> None:
        """Eager one-step update (reference-style object API; the scan path
        in Network.fit_stdp is the performant one)."""
        spk_pre = jnp.asarray(spk_pre, dtype=self.dtype)
        spk_post = jnp.asarray(spk_post, dtype=self.dtype)
        W, x_pre, x_post = self.update_fn(float(dt))(
            self.params["weights"], self.params["x_pre"], self.params["x_post"],
            spk_pre, spk_post)
        self.params["weights"] = W
        self.params["x_pre"] = x_pre
        self.params["x_post"] = x_post


class BlockSparseLinear(Linear):
    """Block-sparse edge projection, optionally with per-BLOCK conduction
    delays: ``y[r*bs:(r+1)*bs] = sum_c blocks[r, c] @ x_{cols[r,c]}(t -
    d[r, c])`` where ``x_b`` is source block ``b``.

    Beyond-reference component: the reference has neither sparse edges nor
    per-connection delays (/root/reference/rectipy/edges.py:8-234); this is
    the population-scale companion of :class:`LinearMemoryMatrix` -- at
    ``N >> 1000`` a per-connection delay matrix (and its one-hot selectors)
    cannot exist, but spatially-embedded networks still need
    distance-dependent conduction delays.  Block granularity is the form
    that maps to the TPU: the weights are the same fixed-degree
    ``BlockSparseCoupling`` tiles the node-level sparse coupling uses
    (``ops/sparse.py``), and one delay per (target-block, source-block) pair
    models ``d = distance/velocity`` between local patches.

    TPU-native delay state: a CIRCULAR history buffer ``(nb_in, D1, bs)``
    with a step cursor, NOT a shifted ring -- shifting would rewrite
    ``n_in * D1`` elements per step (40 MB r/w at N=100k, D=50), while the
    circular form writes ``n_in`` elements at slot ``t mod D1`` and gathers
    ``(n_br, cb)`` whole ``bs``-blocks at slots ``(t - d) mod D1`` (XLA
    lowers both to dynamic slices; all shapes static).  Slots that have not
    been written yet are zero, and because ``d <= D1 - 1`` a wrapped read
    can never alias a newer write, so ``t - d < 0`` reads exact zeros --
    the same warmup semantics as the shifted edges.  ``d = 0`` is
    instantaneous (this step's input), matching :class:`LinearMemory`.

    The ``(hist, t)`` pair rides the network scan carry like every stateful
    edge (chunked runs and checkpoints are exact); ``delays=None`` degrades
    to a stateless block-sparse matvec edge.  Blocks are trainable with
    ``train='gd'`` (the gather/update-slice pair is differentiable; the
    plain-autodiff trajectory handles it).

    ``block_dtype`` streams the blocks (and the gathered source blocks) at
    a reduced floating dtype -- the dominant per-step traffic is the
    ``N * fan_in``-element block stream, so ``bfloat16`` halves it while
    the contraction still accumulates in f32
    (``preferred_element_type``).  The cast is hoisted into the
    once-per-call ``prep_params`` pass (XLA's LICM does NOT hoist dtype
    converts out of scan bodies -- measured +82%, NOTES_NEXT_ROUND.md);
    when the blocks are trainable the master stays full-precision and the
    cast runs inside the differentiated region, i.e. bf16-master
    semantics like the node-level ``coupling_dtype='bf16_master'``.
    """

    _tensors = ["weights"]

    def __init__(self, n_in: int, n_out: int, weights, delays=None,
                 dtype=jnp.float64, detach: bool = True, block_dtype=None,
                 **kwargs):
        if not hasattr(weights, "blocks"):
            raise ValueError(
                "BlockSparseLinear requires a BlockSparseCoupling as weights "
                "(rectipy_tpu.block_random_connectivity builds one).")
        self.dtype = resolve_dtype(dtype)
        self.block_dtype = None
        self._int8_master = False
        if block_dtype == "int8_master":
            # quantized block stream (per-output-row int8 weights, dynamic
            # activation scale, f32 accumulation) with a full-precision
            # master -- the edge analog of coupling_dtype='int8_master'.
            # Frozen edges prep-quantize once per call; TRAINABLE edges
            # skip prep quantization (round() has zero gradient, and
            # _prep_edge_params runs inside differentiated plain-autodiff
            # losses) and take an in-step STE apply instead -- the deferred
            # graph trajectory hoists the quantization into its own
            # once-per-scan prep with explicit STE contractions and is the
            # fast training path.
            self._int8_master = True
        elif block_dtype is not None:
            self.block_dtype = jnp.dtype(resolve_dtype(block_dtype))
            if not jnp.issubdtype(self.block_dtype, jnp.floating):
                raise ValueError(
                    f"block_dtype must be a floating dtype or 'int8_master'; "
                    f"got {block_dtype!r}")
            if self.block_dtype == jnp.dtype(self.dtype):
                self.block_dtype = None  # no-op: stream at master precision
        blocks = np.asarray(weights.blocks)
        cols = np.asarray(weights.cols, dtype=np.int32)
        n_br, cb, bs, _ = blocks.shape
        if n_br * bs != n_out:
            raise ValueError(
                f"block rows x block size = {n_br}x{bs} != n_out={n_out}")
        if n_in % bs:
            raise ValueError(f"n_in={n_in} must be a multiple of the block "
                             f"size {bs}")
        nb_in = n_in // bs
        if cols.size and (cols.min() < 0 or cols.max() >= nb_in):
            raise ValueError(
                f"cols reference source blocks outside [0, {nb_in})")
        self.n_in, self.n_out = n_in, n_out
        self.bs, self.nb_in = bs, nb_in
        self.cols = jnp.asarray(cols)
        self.params: Dict[str, jnp.ndarray] = {
            "weights": jnp.asarray(blocks, dtype=self.dtype)}
        self.train_keys = []
        self._train_req = []
        if not detach:
            train_params = kwargs.pop("train_params", self._tensors)
            self._train_req = list(train_params)
            self.train_keys = [k for k in self._tensors
                               if k in train_params and k in self.params]
        self.delays = None
        self.max_delay = 0
        if delays is not None:
            delays = np.asarray(delays)
            if delays.shape != (n_br, cb):
                raise ValueError(
                    f"Per-block delays must be ({n_br}, {cb}) -- one per "
                    f"(target-block, source-block) pair like cols; got "
                    f"{delays.shape}.")
            if not np.issubdtype(delays.dtype, np.integer):
                if not np.allclose(delays, np.rint(delays)):
                    raise ValueError(
                        "Block delays must be integer step counts; round "
                        "distance/velocity/dt results explicitly (np.rint).")
            delays = np.rint(delays).astype(np.int64)
            if delays.min() < 0:
                raise ValueError("Delays must be non-negative step counts.")
            self.delays = jnp.asarray(delays)
            self.max_delay = int(delays.max())
        D1 = self.max_delay + 1
        self._D1 = D1
        self._hist = (jnp.zeros((nb_in, D1, bs), dtype=self.dtype)
                      if self.delays is not None else None)
        self._t = jnp.zeros((), dtype=jnp.int32)

    @property
    def weights(self):
        return self.params["weights"]

    @weights.setter
    def weights(self, w):
        if hasattr(w, "blocks"):
            w = w.blocks
        w = _as_array(w, self.dtype)
        if w.shape != self.params["weights"].shape:
            raise ValueError(f"block weights must keep shape "
                             f"{self.params['weights'].shape}; got {w.shape}")
        self.params["weights"] = w

    def init_state(self):
        if self.delays is None:
            return None
        return (self._hist, self._t)

    def set_state(self, state):
        if self.delays is not None:
            self._hist, self._t = state

    def prep_params(self, sub: Dict) -> Dict:
        """Once-per-call block-stream cast (see ``block_dtype``): the fast
        paths evaluate this outside the scan, so the scan streams the
        reduced-precision copy; gradients flow THROUGH the cast where prep
        runs inside a differentiated trajectory (bf16-master semantics).
        ``int8_master``: FROZEN edges quantize here (once per call);
        trainable edges must NOT (zero-gradient round inside differentiated
        plain-autodiff losses) -- their step takes the in-step STE apply."""
        if self._int8_master:
            if self.train_keys or isinstance(sub.get("weights"), tuple):
                return sub
            from .ops.quant import quantize_blocks

            return {**sub, "weights": quantize_blocks(sub["weights"])}
        bd = self.block_dtype
        if bd is None or sub["weights"].dtype == bd:
            return sub
        return {**sub, "weights": sub["weights"].astype(bd)}

    def make_step(self) -> Callable:
        cols = self.cols
        bs, nb_in, D1 = self.bs, self.nb_in, self._D1
        acc = jnp.result_type(self.dtype, jnp.float32)
        dtype = self.dtype
        bd = self.block_dtype
        int8m = self._int8_master
        if int8m:
            from .ops.quant import (make_block_int8_stack_apply,
                                    make_block_int8_stack_ops)

            _, int8_mv, _, _ = make_block_int8_stack_ops()
            int8_ste = make_block_int8_stack_apply()

        def contract(w, s_blk):
            if int8m:
                if isinstance(w, tuple):  # prep-quantized (frozen fast path)
                    return int8_mv(w, s_blk).reshape(-1, bs).astype(acc)
                # raw master: in-step STE apply (plain-autodiff correctness)
                return int8_ste(w, s_blk).reshape(-1, bs).astype(acc)
            if bd is not None:
                # no-op when prep already cast w; the unprepped (eager /
                # plain-autodiff) paths pay the cast in-step for correctness
                w = w.astype(bd)
                s_blk = s_blk.astype(bd)
            return jnp.einsum("rcij,rcj->ri", w, s_blk,
                              preferred_element_type=acc)

        if self.delays is None:
            def step(state, params, x):
                s_blk = x.reshape(nb_in, bs).astype(dtype)[cols]
                y = contract(params["weights"], s_blk)
                return state, y.reshape(-1).astype(dtype)

            return step

        # flat (block, slot) read addresses: slot = (t - d) mod D1
        dmat = self.delays  # (n_br, cb)

        def step(state, params, x):
            hist, t = state
            k = jnp.mod(t, D1)
            hist = jax.lax.dynamic_update_index_in_dim(
                hist, x.reshape(nb_in, bs).astype(hist.dtype), k, axis=1)
            slots = jnp.mod(k - dmat, D1)          # (n_br, cb)
            flat = cols * D1 + slots
            s_blk = hist.reshape(nb_in * D1, bs)[flat]
            y = contract(params["weights"], s_blk)
            return (hist, t + 1), y.reshape(-1).astype(dtype)

        return step

    def forward(self, x, **kwargs):
        state, y = self.make_step()(self.init_state(), self.params,
                                    jnp.asarray(x, dtype=self.dtype))
        if self.delays is not None:
            self._hist, self._t = state
        return y


class BlockSparseSTDP(BlockSparseLinear):
    """Block-sparse STDP: the pair-based trace rule of :class:`STDP` applied
    to :class:`BlockSparseLinear` fan-in blocks -- online plasticity at
    population scale, where a dense plastic W cannot exist (40 GB at
    N=100k; fan-in-1000 f32 blocks are ~0.4 GB).

    Beyond-reference (the reference ships no plasticity at all --
    /root/reference/rectipy/network.py:858-896 is a stub).  The eligibility
    traces stay O(N) vectors exactly as in the dense rule; only the LTP/LTD
    outer products change shape -- they become per-block outer products on
    the GATHERED pre-synaptic blocks:

        pot[r,c,i,j] = a_plus  * spk_post[r*bs+i] * x_pre[cols[r,c]*bs+j]
        dep[r,c,i,j] = a_minus * x_post[r*bs+i]   * spk_pre[cols[r,c]*bs+j]

    i.e. entry (i, j) of every stored block follows the dense rule for the
    synapse it stores, and entries NOT covered by a block are structurally
    absent (the dense rule would potentiate them).  XLA fuses the broadcast
    products with the W read-modify-write into one elementwise pass over
    the ``(n_br, cb, bs, bs)`` block tensor, so the per-step cost is the
    block-stream traffic (~N*fan_in elements), not O(N^2).

    Use via ``add_edge(src, tgt, weights=<BlockSparseCoupling>,
    train='stdp')`` and :meth:`Network.fit_stdp`, exactly like the dense
    edge (reward-modulated mode, homeostatic scaling, trace persistence
    across chunked calls all compose).  Per-block conduction delays are NOT
    supported on the plastic edge: the pair rule would need per-synapse
    delayed pre-spike trains; chain a separate delayed edge if the
    projection must be delayed.
    """

    def __init__(self, n_in: int, n_out: int, weights=None, dtype=jnp.float64,
                 tau_plus: float = 20.0, tau_minus: float = 20.0,
                 a_plus: float = 0.005, a_minus: float = 0.00525,
                 w_min: float = 0.0, w_max: float = 1.0,
                 soft_bounds: bool = False, w_dtype=None, block_dtype=None,
                 **kwargs):
        _check_stdp_hparams(tau_plus, tau_minus, a_plus, a_minus, w_min, w_max)
        if w_dtype is not None:
            # reduced-precision plastic-W carry (see STDP)
            dtype = _resolve_stdp_w_dtype(w_dtype)
        if block_dtype == "int8_master":
            raise ValueError(
                "block_dtype='int8_master' is a gradient-training stream "
                "(STE through a quantized master); the plastic STDP carry "
                "must stay a float tensor -- use w_dtype='bfloat16' to "
                "halve the plastic-W traffic instead.")
        super().__init__(n_in, n_out, weights, delays=None, dtype=dtype,
                         detach=True, block_dtype=block_dtype)
        self.params["weights"] = jnp.clip(self.params["weights"], w_min, w_max)
        self.tau_plus = float(tau_plus)
        self.tau_minus = float(tau_minus)
        self.a_plus = float(a_plus)
        self.a_minus = float(a_minus)
        self.w_min = float(w_min)
        self.w_max = float(w_max)
        self.soft_bounds = bool(soft_bounds)
        self.params["x_pre"] = jnp.zeros(n_in, dtype=self.dtype)
        self.params["x_post"] = jnp.zeros(n_out, dtype=self.dtype)
        self.train_keys = []  # local rule outside autograd, like STDP

    # trace accessors shared with the dense edge
    x_pre = STDP.x_pre
    x_post = STDP.x_post

    def pair_fn(self, dt: float) -> Callable:
        """Raw per-block pair-rule increments (no bounds), same contract as
        :meth:`STDP.pair_fn` with block-tensor pot/dep: ``(x_pre, x_post,
        spk_pre, spk_post) -> (pot, dep, x_pre', x_post')``."""
        d_p = float(np.exp(-dt / self.tau_plus))
        d_m = float(np.exp(-dt / self.tau_minus))
        a_p, a_m = self.a_plus, self.a_minus
        cols, bs, nb_in = self.cols, self.bs, self.nb_in
        n_br = self.params["weights"].shape[0]

        def increments(x_pre, x_post, spk_pre, spk_post):
            x_pre = x_pre * d_p
            x_post = x_post * d_m
            post_blk = spk_post.reshape(n_br, bs)        # (n_br, bs)
            xpre_blk = x_pre.reshape(nb_in, bs)[cols]    # (n_br, cb, bs)
            xpost_blk = x_post.reshape(n_br, bs)
            pre_blk = spk_pre.reshape(nb_in, bs)[cols]
            pot = a_p * post_blk[:, None, :, None] * xpre_blk[:, :, None, :]
            dep = a_m * xpost_blk[:, None, :, None] * pre_blk[:, :, None, :]
            return pot, dep, x_pre + spk_pre, x_post + spk_post

        return increments

    # the update machinery is rule-shape-agnostic (it only composes pair_fn
    # with the bounds), so the dense edge's implementations apply verbatim
    update_fn = STDP.update_fn
    reward_update_fn = STDP.reward_update_fn
    update = STDP.update
