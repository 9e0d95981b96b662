"""Block-sparse coupling: gather-free sparse matvec for TPU.

Why not CSR / per-element gathers: random-access gathers do not vectorize on
the TPU VPU, and unstructured sparsity cannot tile onto the MXU.  What DOES
map to the hardware is block sparsity with a FIXED number of source blocks
per block-row: the matvec becomes a batch of dense ``(bs, bs) @ (bs,)``
products, the only "gather" is a block gather of whole contiguous
``bs``-rows (XLA lowers it to efficient dynamic slices), and all shapes are
static so the whole thing jits into one fused program.

    s_in[r*bs:(r+1)*bs] = sum_c blocks[r, c] @ s[cols[r, c]*bs : +bs]

At the N=100k stretch config (BASELINE.json configs[4], fan-in 1000 = 1%
density) the dense coupling is 40 GB float32 / 20 GB bf16 -- it does not fit
the 16 GB v5e HBM.  With ``bs=512`` and 4 source blocks per block-row the
stored coupling is ``(N/bs) * 4 * bs * bs`` = 0.8 GB f32 / 0.4 GB bf16 and
each step streams it once: a ~50x traffic cut at the same per-neuron fan-in.

``block_random_connectivity`` samples the TPU-native analog of the
reference's fixed-fan-in ``random_connectivity`` (/root/reference/rectipy/
utility.py:153-178): every neuron still receives exactly ``fan_in``
row-normalized connections; the difference is that each 512-neuron block-row
draws its candidates from a small set of randomly chosen source blocks
instead of the whole population (the locality that makes it stream on TPU).

``BlockSparseCoupling`` plugs into the existing API: pass it as ``weights=``
to ``Network.add_diffeq_node`` / ``lower()``; ``to_dense()`` exists for
small-N cross-checks (tests/test_sparse.py pins trajectory equality).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BlockSparseCoupling", "block_random_connectivity", "block_sparse_matvec"]


@dataclass
class BlockSparseCoupling:
    """Fixed-degree block-sparse matrix: ``blocks[r, c]`` is the dense
    ``(bs, bs)`` tile coupling source block ``cols[r, c]`` into output block
    ``r``.  Behaves like an ``(n, m)`` matrix for the Network/DSL layer."""

    blocks: np.ndarray  # (n_br, cb, bs, bs)
    cols: np.ndarray    # (n_br, cb) int32, source block indices

    def __post_init__(self):
        self.blocks = np.asarray(self.blocks)
        self.cols = np.asarray(self.cols, dtype=np.int32)
        if self.blocks.ndim != 4 or self.cols.ndim != 2 \
                or self.blocks.shape[:2] != self.cols.shape \
                or self.blocks.shape[2] != self.blocks.shape[3]:
            raise ValueError(
                f"blocks must be (n_br, cb, bs, bs) with cols (n_br, cb); got "
                f"{self.blocks.shape} / {self.cols.shape}")

    @property
    def bs(self) -> int:
        return self.blocks.shape[2]

    @property
    def shape(self) -> tuple:
        n = self.blocks.shape[0] * self.bs
        m = (int(self.cols.max()) + 1) * self.bs if self.cols.size else 0
        return (n, max(m, n))

    @property
    def ndim(self) -> int:
        return 2

    def to_dense(self) -> np.ndarray:
        n, m = self.shape
        bs = self.bs
        W = np.zeros((n, m), dtype=self.blocks.dtype)
        for r in range(self.blocks.shape[0]):
            for c in range(self.blocks.shape[1]):
                j = int(self.cols[r, c]) * bs
                W[r * bs:(r + 1) * bs, j:j + bs] += self.blocks[r, c]
        return W

    def matvec(self, s):
        return block_sparse_matvec(jnp.asarray(self.blocks), jnp.asarray(self.cols), s)


def block_sparse_matvec(blocks, cols, s, cast_dtype=None):
    """``s_in = A @ s`` for a block-sparse ``A``; one block gather + a batched
    dense contraction (all static shapes, MXU-eligible, f32 accumulation)."""
    n_br, cb, bs, _ = blocks.shape
    s_blk = s.reshape(-1, bs)[cols]  # (n_br, cb, bs): contiguous block gather
    if cast_dtype is not None:
        blocks = blocks.astype(cast_dtype)
        s_blk = s_blk.astype(cast_dtype)
    out = jnp.einsum("rcij,rcj->ri", blocks, s_blk,
                     preferred_element_type=jnp.float32)
    return out.reshape(n_br * bs).astype(s.dtype)


def block_random_connectivity(n: int, m: int, fan_in: int, block_size: int = 512,
                              source_blocks: Optional[int] = None, seed: int = 0,
                              normalize: bool = True, dtype=np.float32,
                              backend: str = "auto") -> BlockSparseCoupling:
    """Sample fixed-fan-in random connectivity with block-local sources.

    Each neuron receives exactly ``fan_in`` distinct connections (weight
    ``1/fan_in`` when ``normalize``), drawn uniformly from the
    ``source_blocks`` source blocks assigned to its block-row.  With
    ``source_blocks * block_size >= 2 * fan_in`` the in-block density stays
    <= 50%, preserving the sparse-random character at block granularity.
    """
    if n % block_size or m % block_size:
        raise ValueError(f"n={n} and m={m} must be multiples of block_size={block_size}")
    nb_out, nb_in = n // block_size, m // block_size
    if source_blocks is None:
        source_blocks = min(nb_in, max(1, int(np.ceil(2.0 * fan_in / block_size))))
    cand = source_blocks * block_size
    if fan_in > cand:
        raise ValueError(f"fan_in={fan_in} exceeds candidate pool "
                         f"{source_blocks}x{block_size}={cand}")
    rng = np.random.default_rng(seed)
    cols = np.stack([rng.choice(nb_in, size=source_blocks, replace=False)
                     for _ in range(nb_out)]).astype(np.int32)
    blocks = np.zeros((nb_out, source_blocks, block_size, block_size), dtype=dtype)
    w = (1.0 / fan_in) if normalize else 1.0
    # native fast path: the numpy argsort construction below is
    # O(nb_out * bs * cand * log(cand)) host time -- minutes at N=1e6 on one
    # core -- while the C++ Floyd sampler writes each neuron's fan_in picks
    # directly (native/connectivity.cpp sample_block_fanin).  Different (but
    # deterministic-per-seed) sample than the numpy path; same contract:
    # exactly fan_in distinct candidates per neuron, weight w.
    if backend != "numpy" and dtype == np.float32:
        from ..native.connectivity import fill_block_fanin

        if fill_block_fanin(blocks, source_blocks, block_size, fan_in, seed, w):
            return BlockSparseCoupling(blocks, cols)
    # per neuron: fan_in distinct picks from the candidate pool (argsort
    # construction, vectorized over the whole block-row at once)
    for r in range(nb_out):
        picks = np.argsort(rng.random((block_size, cand)), axis=1)[:, :fan_in]
        c_idx, j_idx = picks // block_size, picks % block_size
        i_idx = np.repeat(np.arange(block_size), fan_in)
        blocks[r, c_idx.ravel(), i_idx, j_idx.ravel()] = w
    return BlockSparseCoupling(blocks, cols)


