"""Gather-based ELL SpMM — the TPU-native hot path.

The reference's row-wise hot loop
(``Source Code/SparseMatrixFatVectorMultiplyRowWise.cpp:36-50``) walks CSR
with data-dependent bounds. On TPU that shape-dynamism blocks XLA tiling, so
the compute layout here is ELLPACK: every row padded to a static width ``W``,
turning SpMM into

    out = sum_w  vals[:, w, None] * v[cols[:, w], :]

i.e. one big HBM gather (``nnz_padded`` rows of ``v``) followed by a dense
multiply-reduce on the VPU — no scatter, no dynamic shapes, fully fusable.
``BucketedELL`` (SELL-style) bounds the padding waste on skewed matrices,
replacing the reference's non-zero-element load-balancing rationale
(``...NonZeroElement.cpp:24-39``) with a static-shape equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.matrix import ELL, BucketedELL

__all__ = ["spmm_ell", "spmm_bucketed", "take_rows"]

#: Route ELL planes through the explicit-DMA Pallas gather kernel
#: (``ops/pallas_gather.py``) instead of XLA's take. DECIDED on real
#: v5e hardware (scripts/exp_spill_gather.py, 2026-08-19,
#: results/spill_gather_decision.json): the DMA kernel LOSES — 16.0
#: ns/row end-to-end in spmm_ell vs 4.7 for the XLA take; per-config
#: it only ties XLA in its best case (3.6 vs 3.7 ns/row at
#: Rt=92k/W=1/T=32, within run variance). Per-row DMA issue cost is the
#: same scalar-core wall the gather was meant to escape. Stays False;
#: the kernel remains as the A/B hook. Read at trace time: tests
#: overriding it must use fresh shapes or ``jax.clear_caches()``.
SPILL_DMA_GATHER = False


def take_rows(v: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather tuned for TPU: fat vectors narrower than 8 columns are
    widened (zero-padded behind an optimization barrier so XLA
    materializes the wide table) before gathering — measured on v5e,
    gathering 32-byte rows runs 2.4-4.7x faster than sub-32-byte rows,
    making SpMV (k=1) substantially cheaper."""
    k = v.shape[1]
    if k < 8:
        vw = jax.lax.optimization_barrier(
            jnp.pad(v, ((0, 0), (0, 8 - k)))
        )
        return jnp.take(vw, idx, axis=0)[:, :k]
    return jnp.take(v, idx, axis=0)


def _spmm_ell_dma(ell: ELL, v: jax.Array) -> jax.Array:
    """ELL plane via ``ell_gather_rows_pallas``: rows padded to the
    kernel's step multiple, fat vector padded to 128 lanes (the v5e DMA
    lane-alignment contract), result sliced back. Runs in interpret
    mode on CPU backends so differential tests cover the real kernel
    contract."""
    from .pallas_gather import ell_gather_rows_pallas

    from ..utils.backend import on_cpu_backend

    mp, w = ell.cols.shape
    k = v.shape[1]
    if k > 128:
        raise ValueError(f"DMA gather supports k <= 128, got {k}")
    interp = on_cpu_backend()
    T = 8
    pad_r = (-mp) % T
    cols, vals = ell.cols, ell.vals
    if pad_r:
        cols = jnp.pad(cols, ((0, pad_r), (0, 0)))
        vals = jnp.pad(vals, ((0, pad_r), (0, 0)))
    v128 = v.astype(jnp.float32)
    if k < 128:
        v128 = jnp.pad(v128, ((0, 0), (0, 128 - k)))
    out = ell_gather_rows_pallas(cols, vals, v128, rows_per_step=T,
                                 interpret=interp)
    return out[:mp, :k].astype(v.dtype)


def spmm_ell(ell: ELL, v: jax.Array, *, unpad: bool = True,
             dma_gather: bool | None = None) -> jax.Array:
    """SpMM over a single ELL block. Returns ``(m, k)`` (or padded rows).

    ``dma_gather=None`` auto-selects per ``SPILL_DMA_GATHER``; pass
    True/False to force either path (the A/B measurement hook)."""
    mp, w = ell.cols.shape
    k = v.shape[1]
    if dma_gather is None:
        dma_gather = SPILL_DMA_GATHER and 0 < w and k <= 128
    if dma_gather:
        out = _spmm_ell_dma(ell, v)
    else:
        gathered = take_rows(v, ell.cols.reshape(-1))
        gathered = gathered.reshape(mp, w, k)
        out = jnp.sum(
            ell.vals[:, :, None].astype(v.dtype) * gathered, axis=1)
    if unpad:
        out = out[: ell.shape[0]]
    return out


def spmm_bucketed(bell: BucketedELL, v: jax.Array) -> jax.Array:
    """SpMM over bucketed ELL: per-bucket dense reduce, then one gather to
    restore original row order (gather via ``inv_row_perm`` — cheaper than a
    scatter on TPU)."""
    parts = [spmm_ell(b, v, unpad=False) for b in bell.buckets]
    # One zero row for rows absent from every bucket (empty rows map one
    # past the end in ``inv_row_perm`` — see BucketedELL.from_csr).
    parts.append(jnp.zeros((1, v.shape[1]), parts[0].dtype))
    stacked = jnp.concatenate(parts, axis=0)
    return jnp.take(stacked, bell.inv_row_perm, axis=0)
