"""Fixed-fan-in connectivity sampling: native fast path + numpy fallback."""

from __future__ import annotations

import ctypes

import numpy as np

from .build import load_native


def sample_fixed_fanin(n: int, m: int, n_conns: int, seed: int = 0,
                       force_numpy: bool = False) -> np.ndarray:
    """Sample ``n_conns`` distinct column indices in ``[0, m)`` per row.

    Returns an ``(n, n_conns)`` int64 array.  Uses the C++ Floyd sampler
    (O(n*k), deterministic per seed) when the toolchain is available; the
    numpy fallback is the argsort construction used by
    ``utility.random_connectivity``.
    """
    if n_conns > m:
        raise ValueError(f"n_conns={n_conns} exceeds m={m}")
    lib = None if force_numpy else load_native("connectivity")
    if lib is not None:
        fn = lib.sample_fixed_fanin
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                       ctypes.c_uint64,
                       ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        cols = np.empty((n, n_conns), dtype=np.int64)
        scratch = np.empty(4 * n_conns, dtype=np.int64)
        rc = fn(n, m, n_conns, seed,
                cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc == 0:
            return cols
    rng = np.random.default_rng(seed)
    return np.argsort(rng.random((n, m)), axis=1)[:, :n_conns].astype(np.int64)
