"""SpMM over windowed tile pairs — slab gather + batched MXU matmuls.

XLA reference path for ``formats/windowed.py::WindowedPairs``; the fused
Pallas kernel (``ops/pallas_windowed.py``) computes the same contraction
without materializing the gathered slabs. Replaces the reference hot
loops (``SparseMatrixFatVectorMultiplyRowWise.cpp:36-50``) with:

    slabs[p] = v[pair_chunk[p]*C : (p+1)*C]        # P slab gathers
    out[pair_block[p]] += tiles[p] @ slabs[p]      # MXU batched matmul

The only gathers are P slab fetches (P ~ #tiles, thousands — not
#nonzeros, millions) plus the segment-sum combine; on TPU the Pallas
variant removes even the slab materialization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.windowed import WindowedPairs
from .ell import spmm_bucketed

__all__ = ["spmm_windowed", "spmm_windowed_core", "spmm_windowed_xla"]


def _precision(tiles_dtype, v_dtype):
    # f32xf32 needs HIGHEST: the MXU's default lowering truncates f32
    # inputs to bf16 (see ops/banded.py rationale).
    return (jax.lax.Precision.HIGHEST
            if tiles_dtype == jnp.float32 and v_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def spmm_windowed_xla(wp: WindowedPairs, v_p: jax.Array) -> jax.Array:
    """Permuted-space SpMM via slab gather + per-class batched einsums.

    The class packing (``formats/windowed.py``) makes every class a dense
    ``(nbc, nwc, R, C) x (nbc, nwc, C, k) -> (nbc, R, k)`` contraction —
    no segment-sum, no scatter; the only non-einsum ops are the P slab
    gathers and one block-granular take at the end.

    ``v_p`` is already in the operand's (permuted) column space.
    Returns the permuted-space ``(m, k)`` result.
    """
    m, n = wp.shape
    R, C = wp.block_rows, wp.chunk_cols
    nb = wp.n_blocks
    k = v_p.shape[1]
    n_chunks = -(-n // C)

    # f32 accumulation even for bf16 operands (matches the Pallas kernel).
    out_dtype = jnp.promote_types(
        jnp.float32, jnp.promote_types(wp.tiles.dtype, v_p.dtype)
    )
    # Match operand dtypes: TPU mixed-precision contractions (bf16 tiles x
    # f32 slabs) were observed numerically wrong (rel err ~0.7 on v5e, in
    # both the XLA einsum and Mosaic dot lowerings); the native
    # bf16 x bf16 -> f32 path is exact per product.
    if v_p.dtype != wp.tiles.dtype:
        v_p = v_p.astype(wp.tiles.dtype)

    v_pad = jnp.zeros((n_chunks * C, k), dtype=v_p.dtype)
    v_pad = jax.lax.dynamic_update_slice(v_pad, v_p, (0, 0))
    slabs = jnp.take(
        v_pad.reshape(n_chunks, C * k), wp.pair_chunk, axis=0
    )  # (P, C*k)
    parts = []
    off = 0
    precision = _precision(wp.tiles.dtype, v_p.dtype)
    for nbc, nwc in wp.class_shapes:
        cnt = nbc * nwc
        t = wp.tiles[off: off + cnt].reshape(nbc, nwc, R, C)
        s = slabs[off: off + cnt].reshape(nbc, nwc, C, k)
        parts.append(jnp.einsum(
            "bwrc,bwck->brk", t, s,
            preferred_element_type=out_dtype, precision=precision,
        ))
        off += cnt
    computed = jnp.concatenate(
        parts + [jnp.zeros((1, R, k), out_dtype)], axis=0
    )  # (nb_occ + 1, R, k); trailing zero block for tile-less rows
    out_blocks = jnp.take(
        computed.reshape(computed.shape[0], R * k), wp.inv_block_pos,
        axis=0,
    )  # (nb, R*k) — block-granular gather, nb rows (cheap)
    out = out_blocks.reshape(nb * R, k)[:m]
    if wp.spill is not None:
        out = out + spmm_bucketed(wp.spill, v_p[:n]).astype(out.dtype)
    return out


def spmm_windowed_core(wp: WindowedPairs, v_p: jax.Array, *,
                       use_pallas: bool | None = None) -> jax.Array:
    """Permuted-space SpMM, dispatching to the fused Pallas kernel on
    accelerator backends (``use_pallas=None`` auto-selects)."""
    if use_pallas is None:
        try:
            use_pallas = jax.devices()[0].platform != "cpu"
        except Exception:
            use_pallas = False
    if use_pallas:
        from .pallas_windowed import spmm_windowed_pallas

        return spmm_windowed_pallas(wp, v_p)
    return spmm_windowed_xla(wp, v_p)


def spmm_windowed(wp: WindowedPairs, v: jax.Array, *,
                  use_pallas: bool | None = None) -> jax.Array:
    """Full SpMM in original coordinates: encode -> iterate -> decode.

    Iterative consumers should instead call ``wp.encode`` once, chain
    ``wp.iterate``, and ``wp.decode`` once — the boundary permutes are
    one-time costs (the PETSc never-regather lesson,
    ``report/425500_Report.tex:1092-1095``).
    """
    return wp.decode(
        spmm_windowed_core(wp, wp.encode(v), use_pallas=use_pallas)
    )
