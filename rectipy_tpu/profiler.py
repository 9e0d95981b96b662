"""Tracing / profiling utilities.

The reference's only instrumentation is ``perf_counter`` bracketing printed to
stdout (SURVEY.md §5).  Here profiling is a small first-class subsystem:

- :class:`PhaseTimer` -- named wall-clock phases with device synchronization
  (``block_until_ready``) so timings mean what they say under async dispatch.
- :func:`trace` -- context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the XLA execution.
- :func:`annotate` -- named region annotation visible in profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax

__all__ = ["PhaseTimer", "trace", "annotate"]


class _Phase:
    """Handle yielded by :meth:`PhaseTimer.phase` -- assign the device
    result to ``.result`` inside the block so the timer can synchronize on
    it at exit (a ``result=`` argument to ``phase()`` cannot work: the
    result does not exist when the context is entered)."""

    __slots__ = ("result",)

    def __init__(self):
        self.result = None


class PhaseTimer:
    """Accumulating named phase timer.

    >>> timer = PhaseTimer()
    >>> with timer.phase("integrate") as ph:
    ...     ph.result = run(...)    # device work; timer syncs on ph.result
    >>> timer.report()

    Without assigning ``ph.result`` the recorded time is dispatch-only under
    JAX async dispatch (Network.run/fit_* synchronize internally, so timing
    those needs no handle).
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        ph = _Phase()
        t0 = time.perf_counter()
        try:
            yield ph
        finally:
            if self.sync and ph.result is not None:
                jax.block_until_ready(ph.result)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def time(self, name: str, fn, *args, **kwargs):
        """Time one call, synchronizing on its output."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if self.sync:
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def report(self, printer=print) -> Dict[str, float]:
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            printer(f"[profile] {name}: {total:.4f}s over {self.counts[name]} call(s)")
        return dict(self.totals)


@contextlib.contextmanager
def trace(log_dir: str, host_profiling: bool = False):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                             create_perfetto_trace=host_profiling)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation (shows up in profiler traces)."""
    return jax.profiler.TraceAnnotation(name)
