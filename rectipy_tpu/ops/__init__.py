"""Compute-path ops: surrogate gradients, Pallas kernels, linear algebra."""

from .surrogate import spike

__all__ = ["spike"]
