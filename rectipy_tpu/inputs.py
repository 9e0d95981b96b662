"""On-device input generation: declarative time-series specs evaluated
INSIDE the integration scan.

The reference feeds every simulation a host-materialized ``(T, m)`` array
(/root/reference/rectipy/network.py:542-571).  On TPU that array is pure
host->device traffic -- a (T=200k, N=10k) noise drive is 8 GB over the
wire and cannot even be materialized for long horizons.  An
:class:`InputSpec` instead describes the drive as a pure function
``x_t = f(step_index)`` that the compiled scan evaluates on device: zero
transfer, zero HBM footprint, identical recording semantics.

``Network.run`` / ``Network.run_batch`` accept a spec anywhere an input
array is accepted::

    from rectipy_tpu.inputs import Noise, Pulse, Sine

    drive = Pulse(steps, channels=1, t_on=1000, t_off=3000, amp=3.0) \
          + Noise(steps, channels=N, scale=0.1, seed=7)
    obs = net.run(drive, sampling_steps=100)

Per-trial noise realizations for ensembles: pass a ``(B,)`` array of seeds
to :class:`Noise` and hand the spec to ``run_batch`` -- every trial draws
its own stream from one compiled vmapped program.

Spec parameters (amplitudes, times, scales) are ARGUMENTS of the compiled
program, not closure constants: re-running with different values reuses
the compiled scan (only ``steps``/``channels``/structure are in the cache
key).  ``materialize()`` returns the exact dense array a spec evaluates
to, for golden tests and for feeding trainers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InputSpec", "Noise", "Wiener", "Poisson", "Pulse", "Sine", "Constant", "Sum"]


def _leaf_sig(tree) -> tuple:
    return tuple(
        (np.shape(leaf), np.asarray(leaf).dtype.name if not hasattr(leaf, "dtype")
         else np.dtype(leaf.dtype).name)
        for leaf in jax.tree_util.tree_leaves(tree))


def _make_key(seed, class_salt: int, salt: int):
    """Seed -> PRNGKey(s), domain-separated per spec class and per position
    in a Sum.  Without this, Noise(seed=0) + Poisson(seed=0) (both class
    defaults) would consume IDENTICAL random bits each step -- every Poisson
    event would coincide with the same noise draw, silently correlating
    'independent' sources.  Returns (key, vmap_axis)."""
    seeds = np.asarray(seed)
    if seeds.ndim == 0:
        key = jax.random.PRNGKey(int(seeds))
        key_axis = None
    elif seeds.ndim == 1:
        key = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, dtype=jnp.uint32))
        key_axis = 0
    else:
        raise ValueError(f"seed must be a scalar or (B,) array, got shape {seeds.shape}")
    sep = np.uint32((class_salt * 0x9e3779b9 + salt) & 0xFFFFFFFF)
    fold = lambda k: jax.random.fold_in(k, sep)  # noqa: E731
    return (fold(key) if key_axis is None else jax.vmap(fold)(key)), key_axis


@dataclass(frozen=True)
class InputSpec:
    """Base class: a drive of ``channels`` channels over ``steps`` steps.

    Subclasses implement :meth:`build` returning ``(fn, args, axes, sig)``:

    - ``fn(t_idx, args) -> (channels,)`` -- pure, jit/vmap-safe;
    - ``args`` -- pytree of parameter arrays (program arguments);
    - ``axes`` -- vmap in_axes pytree for ``args`` (``0`` on leaves that
      vary per trial, ``None`` elsewhere; all-None for unbatched specs);
    - ``sig`` -- hashable structure key (no parameter VALUES).
    """

    steps: int
    channels: int = 1
    # global-time offset: the drive evaluates at (step_index + t0).  Chunked
    # long runs (the relay needs <=100k-step run() calls; state carries
    # across calls) continue the drive with spec.shifted(chunk_len) instead
    # of replaying it from t=0.  Rides as a program argument -- shifting
    # does not recompile.
    t0: int = field(default=0, kw_only=True)

    @property
    def batch(self) -> Optional[int]:
        """Leading trial dimension (None for unbatched specs)."""
        return None

    def shifted(self, offset: int) -> "InputSpec":
        """Copy of this spec evaluating at ``step + t0 + offset`` (global
        time for the next chunk of a chunked run)."""
        from dataclasses import replace

        if isinstance(self, Sum):
            return replace(self, specs=tuple(s.shifted(offset) for s in self.specs))
        return replace(self, t0=self.t0 + int(offset))

    def build(self, dt: float, dtype, salt: int = 0) -> Tuple:
        """``salt``: position-based stream separation supplied by
        :class:`Sum` so two same-seed stochastic parts draw independent
        streams."""
        raise NotImplementedError

    def __array__(self, dtype=None, copy=None):
        # a spec reaching np.asarray means it was passed where only dense
        # arrays are understood (the trainers): fail with guidance instead
        # of silently becoming a 0-d object array
        raise TypeError(
            f"{type(self).__name__} is an on-device input spec; run()/run_batch() "
            "evaluate it inside the scan. For other APIs (trainers), pass "
            "spec.materialize(dt) instead.")

    def __add__(self, other: "InputSpec") -> "Sum":
        parts = (self.specs if isinstance(self, Sum) else (self,)) + \
                (other.specs if isinstance(other, Sum) else (other,))
        return Sum(specs=parts)

    def materialize(self, dt: float, dtype=np.float32) -> np.ndarray:
        """Evaluate the spec densely: ``(steps, channels)`` (or
        ``(B, steps, channels)`` when batched).  Bit-identical to what the
        scan computes on the same backend."""
        fn, args, axes, _ = self.build(dt, dtype)
        t = jnp.arange(self.steps)
        dense = jax.vmap(fn, in_axes=(0, None))
        if self.batch is not None:
            dense = jax.vmap(dense, in_axes=(None, axes))
        return np.asarray(jax.jit(dense)(t, args))


@dataclass(frozen=True)
class Noise(InputSpec):
    """I.i.d. noise drawn on device each step: ``mean + scale * z_t`` with
    ``z_t ~ N(0, 1)`` (``dist='normal'``) or ``U[-1, 1)`` (``'uniform'``).

    ``scale`` / ``mean``: scalars or per-channel ``(channels,)`` arrays.
    ``seed``: an int, or a ``(B,)`` int array for per-trial streams in
    ``run_batch``.  The stream is deterministic per (seed, global step) --
    for chunked long runs, ``spec.shifted(chunk_len)`` continues the stream
    in the next chunk instead of redrawing it.
    """

    scale: object = 1.0
    mean: object = 0.0
    seed: object = 0
    dist: str = "normal"

    @property
    def batch(self) -> Optional[int]:
        seeds = np.asarray(self.seed)
        return None if seeds.ndim == 0 else int(seeds.shape[0])

    def build(self, dt, dtype, salt: int = 0):
        if self.dist not in ("normal", "uniform"):
            raise ValueError(f"Noise dist must be 'normal' or 'uniform', got {self.dist!r}")
        key, key_axis = _make_key(self.seed, class_salt=1, salt=salt)
        args = {"key": key,
                "scale": jnp.asarray(self.scale, dtype=dtype),
                "mean": jnp.asarray(self.mean, dtype=dtype),
                "t0": jnp.asarray(self.t0, dtype=jnp.int32)}
        axes = {"key": key_axis, "scale": None, "mean": None, "t0": None}
        m, dist = self.channels, self.dist

        def fn(t_idx, a):
            k = jax.random.fold_in(a["key"], t_idx + a["t0"])
            if dist == "normal":
                z = jax.random.normal(k, (m,), dtype=dtype)
            else:
                z = jax.random.uniform(k, (m,), dtype=dtype, minval=-1.0, maxval=1.0)
            return a["mean"] + a["scale"] * z

        sig = ("noise", self.steps, m, dist, self.batch, _leaf_sig(args))
        return fn, args, axes, sig


@dataclass(frozen=True)
class Wiener(InputSpec):
    """White-noise SDE drive with Euler-Maruyama scaling: emits
    ``drift + sigma/sqrt(dt) * z_t`` with ``z_t ~ N(0, 1)``, so the
    integrator's ``dt`` multiplication turns each step into the correct
    Wiener increment ``sigma*sqrt(dt)*z_t``.  Unlike :class:`Noise` (whose
    integrated effect vanishes as dt -> 0), a Wiener-driven trajectory
    converges to the SDE ``dy = f(y) dt + sigma dW`` under dt refinement --
    integrated-path statistics are dt-invariant (tested: Var[integral] =
    sigma^2 * T for any dt; an OU process ``v' = -v/tau + Wiener(sigma)``
    reaches stationary variance ``sigma^2 * tau / 2``).

    ``sigma`` / ``drift``: scalars or per-channel ``(channels,)`` arrays.
    ``seed``: an int, or a ``(B,)`` int array for per-trial sample paths in
    ``run_batch``.  ``spec.shifted(len)`` continues the path across chunked
    runs.  This is THE drive for stochastic neural dynamics (diffusion
    approximations of synaptic bombardment, noise-induced transitions,
    stochastic resonance); the reference has no on-device or
    dt-consistent noise facility (host arrays only,
    /root/reference/rectipy/network.py:542-571).
    """

    sigma: object = 1.0
    drift: object = 0.0
    seed: object = 0

    @property
    def batch(self) -> Optional[int]:
        seeds = np.asarray(self.seed)
        return None if seeds.ndim == 0 else int(seeds.shape[0])

    def build(self, dt, dtype, salt: int = 0):
        key, key_axis = _make_key(self.seed, class_salt=3, salt=salt)
        scale = np.asarray(self.sigma, dtype=np.float64) / np.sqrt(float(dt))
        args = {"key": key,
                "scale": jnp.asarray(scale, dtype=dtype),
                "drift": jnp.asarray(self.drift, dtype=dtype),
                "t0": jnp.asarray(self.t0, dtype=jnp.int32)}
        axes = {"key": key_axis, "scale": None, "drift": None, "t0": None}
        m = self.channels

        def fn(t_idx, a):
            k = jax.random.fold_in(a["key"], t_idx + a["t0"])
            z = jax.random.normal(k, (m,), dtype=dtype)
            return a["drift"] + a["scale"] * z

        sig = ("wiener", self.steps, m, self.batch, _leaf_sig(args))
        return fn, args, axes, sig


@dataclass(frozen=True)
class Poisson(InputSpec):
    """Poisson spike-train drive: each channel emits ``1/dt`` with
    probability ``rate * dt`` per step (the standard extrinsic spike input
    for spiking networks; the ``1/dt`` scaling matches how the framework
    injects intrinsic spikes, /root/reference/rectipy/nodes.py:324).

    ``rate``: scalar or ``(channels,)`` (in 1/time-units of ``dt``).
    ``amp`` scales the emitted spikes.  ``seed``: int or ``(B,)`` array for
    per-trial realizations in ``run_batch``.
    """

    rate: object = 10.0
    amp: object = 1.0
    seed: object = 0

    @property
    def batch(self) -> Optional[int]:
        seeds = np.asarray(self.seed)
        return None if seeds.ndim == 0 else int(seeds.shape[0])

    def build(self, dt, dtype, salt: int = 0):
        key, key_axis = _make_key(self.seed, class_salt=2, salt=salt)
        args = {"key": key,
                "p": jnp.asarray(np.asarray(self.rate) * float(dt), dtype=dtype),
                "amp": jnp.asarray(self.amp, dtype=dtype),
                "t0": jnp.asarray(self.t0, dtype=jnp.int32)}
        axes = {"key": key_axis, "p": None, "amp": None, "t0": None}
        m, inv_dt = self.channels, 1.0 / float(dt)

        def fn(t_idx, a):
            k = jax.random.fold_in(a["key"], t_idx + a["t0"])
            u = jax.random.uniform(k, (m,), dtype=dtype)
            return a["amp"] * jnp.asarray(inv_dt, dtype=dtype) * (u < a["p"]).astype(dtype)

        sig = ("poisson", self.steps, m, self.batch, _leaf_sig(args))
        return fn, args, axes, sig


@dataclass(frozen=True)
class Pulse(InputSpec):
    """Rectangular pulse: ``amp`` on ``t_on <= step < t_off``, else 0.
    ``amp``: scalar or ``(channels,)``."""

    t_on: int = 0
    t_off: int = -1
    amp: object = 1.0

    def build(self, dt, dtype, salt: int = 0):
        if self.t_off < -1 or self.t_on < 0:
            # only the documented -1 sentinel means "until the end"; any
            # other negative is almost certainly an arithmetic slip that
            # would otherwise silently become a full-length drive
            raise ValueError(f"Pulse bounds must be >= 0 (t_off=-1 = end of run); "
                             f"got t_on={self.t_on}, t_off={self.t_off}")
        t_off = self.steps + self.t0 if self.t_off == -1 else self.t_off
        args = {"t_on": jnp.asarray(self.t_on, dtype=jnp.int32),
                "t_off": jnp.asarray(t_off, dtype=jnp.int32),
                "amp": jnp.asarray(self.amp, dtype=dtype),
                "t0": jnp.asarray(self.t0, dtype=jnp.int32)}
        axes = {"t_on": None, "t_off": None, "amp": None, "t0": None}
        m = self.channels

        def fn(t_idx, a):
            t = t_idx + a["t0"]
            on = (t >= a["t_on"]) & (t < a["t_off"])
            return jnp.where(on, a["amp"], jnp.zeros((), dtype=dtype)) * jnp.ones(m, dtype=dtype)

        return fn, args, axes, ("pulse", self.steps, m, _leaf_sig(args))


@dataclass(frozen=True)
class Sine(InputSpec):
    """``offset + amp * sin(2*pi*freq * t*dt + phase)`` -- ``freq`` in the
    reciprocal unit of ``dt`` (Hz when dt is in seconds).  ``amp`` /
    ``freq`` / ``phase`` / ``offset``: scalars or ``(channels,)``."""

    freq: object = 1.0
    amp: object = 1.0
    phase: object = 0.0
    offset: object = 0.0

    def build(self, dt, dtype, salt: int = 0):
        args = {"freq": jnp.asarray(self.freq, dtype=dtype),
                "amp": jnp.asarray(self.amp, dtype=dtype),
                "phase": jnp.asarray(self.phase, dtype=dtype),
                "offset": jnp.asarray(self.offset, dtype=dtype),
                "t0": jnp.asarray(self.t0, dtype=jnp.int32)}
        axes = {k: None for k in args}
        m, dt_f = self.channels, float(dt)

        def fn(t_idx, a):
            t = (t_idx + a["t0"]).astype(dtype) * jnp.asarray(dt_f, dtype=dtype)
            val = a["offset"] + a["amp"] * jnp.sin(2.0 * jnp.pi * a["freq"] * t + a["phase"])
            return val * jnp.ones(m, dtype=dtype)

        return fn, args, axes, ("sine", self.steps, m, _leaf_sig(args))


@dataclass(frozen=True)
class Constant(InputSpec):
    """Constant drive ``value`` (scalar or ``(channels,)``)."""

    value: object = 0.0

    def build(self, dt, dtype, salt: int = 0):
        args = {"value": jnp.asarray(self.value, dtype=dtype)}

        def fn(t_idx, a):
            return a["value"] * jnp.ones(self.channels, dtype=dtype)

        return fn, args, {"value": None}, ("const", self.steps, self.channels,
                                           _leaf_sig(args))


@dataclass(frozen=True)
class Sum(InputSpec):
    """Elementwise sum of specs (built by ``spec_a + spec_b``).  All parts
    must share ``steps``; single-channel parts broadcast to the widest."""

    specs: Tuple[InputSpec, ...] = field(default=())
    steps: int = 0
    channels: int = 0

    def __post_init__(self):
        if not self.specs:
            raise ValueError("Sum needs at least one spec")
        steps = {s.steps for s in self.specs}
        if len(steps) != 1:
            raise ValueError(f"summed specs disagree on steps: {sorted(steps)}")
        chans = {s.channels for s in self.specs if s.channels != 1}
        if len(chans) > 1:
            raise ValueError(f"summed specs disagree on channels: {sorted(chans)}")
        object.__setattr__(self, "steps", steps.pop())
        object.__setattr__(self, "channels", chans.pop() if chans else 1)
        batches = {s.batch for s in self.specs if s.batch is not None}
        if len(batches) > 1:
            raise ValueError(f"summed specs disagree on batch size: {sorted(batches)}")

    @property
    def batch(self) -> Optional[int]:
        for s in self.specs:
            if s.batch is not None:
                return s.batch
        return None

    def build(self, dt, dtype, salt: int = 0):
        # each part gets a distinct stream salt: two same-seed stochastic
        # parts (e.g. Noise(seed=0) + Noise(seed=0)) draw independent bits
        built = [s.build(dt, dtype, salt=salt * 64 + i)
                 for i, s in enumerate(self.specs)]
        fns = [b[0] for b in built]
        args = tuple(b[1] for b in built)
        axes = tuple(b[2] for b in built)
        m = self.channels

        def fn(t_idx, a):
            out = jnp.zeros(m, dtype=dtype)
            for f, ai in zip(fns, a):
                out = out + f(t_idx, ai)
            return out

        return fn, args, axes, ("sum", tuple(b[3] for b in built))
