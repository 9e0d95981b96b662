"""Collective-cost diagnostics for sharded programs.

The multichip story must be quantified, not just correct: for a compiled
sharded program these helpers extract WHICH collectives GSPMD inserted and
how many bytes each moves, so per-step ICI traffic can be tabulated
(PARITY.md) and regression-tested (a sharded scan body should contain a
constant, small number of collectives per step -- one gather of the source
rates per coupling -- independent of mesh size).
"""

from __future__ import annotations

import re
from typing import Callable, Dict

import jax
import numpy as np

__all__ = ["collective_stats", "sharded_step_collectives"]

_COLLECTIVES = ("all-gather", "all-reduce", "collective-permute", "all-to-all",
                "reduce-scatter")
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}


def _shape_bytes(line: str) -> int:
    """Bytes of the op's output shape, parsed from the HLO text line."""
    m = re.search(r"=\s+(?:\()?([a-z0-9]+)\[([0-9,]*)\]", line)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_stats(fn: Callable, *args) -> Dict[str, dict]:
    """Compile ``fn(*args)`` and tally the collectives in the optimized HLO.

    Returns ``{op: {"count": k, "bytes": total_output_bytes}}``.  For a
    ``lax.scan`` program the loop body appears once in the HLO, so the counts
    are per-step counts.
    """
    txt = jax.jit(fn).lower(*args).compile().as_text()
    stats = {op: {"count": 0, "bytes": 0} for op in _COLLECTIVES}
    for line in txt.splitlines():
        stripped = line.strip()
        for op in _COLLECTIVES:
            # match op invocations ("= all-gather(" / "all-gather-start("),
            # not metadata mentions
            if re.search(rf"=\s+(?:\()?[a-z0-9]+\[[0-9,]*\][^=]*\s{op}(?:-start)?\(",
                         stripped):
                stats[op]["count"] += 1
                stats[op]["bytes"] += _shape_bytes(stripped)
    return stats


def sharded_step_collectives(net, mesh, T: int = 8) -> Dict[str, dict]:
    """Collective tally of one compiled ``run``-style scan over ``mesh``
    (state/params population-sharded as Network.run(mesh=) does)."""
    import jax.numpy as jnp

    net.compile()
    state0 = net._mesh_place(net.init_state(), mesh)
    params = net._mesh_place(net.parameters_pytree(), mesh)
    inputs = net._mesh_replicate(
        jnp.zeros((T, net.n_in or 1), dtype=net.dtype), mesh)
    step = net.make_step()

    def scan_fn(state0, params, inputs):
        def body(state, x_t):
            state, out, _ = step(state, params, x_t)
            return state, out

        return jax.lax.scan(body, state0, inputs)

    return collective_stats(scan_fn, state0, params, inputs)
