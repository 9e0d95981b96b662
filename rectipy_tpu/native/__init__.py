"""Native (C++) host-side accelerators, bound via ctypes.

Compiled lazily with g++ on first use and cached next to the source; every
entry point has a pure-numpy fallback so the package works without a
toolchain.  No pybind11 dependency -- plain C ABI + ctypes.
"""

from .build import load_native
from .connectivity import sample_fixed_fanin

__all__ = ["load_native", "sample_fixed_fanin"]
