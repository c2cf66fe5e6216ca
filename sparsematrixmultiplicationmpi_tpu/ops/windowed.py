"""SpMM over windowed tile pairs — slab gather + batched MXU matmuls.

XLA reference path for ``formats/windowed.py::WindowedPairs``; the fused
Pallas kernel (``ops/pallas_windowed.py``) computes the same contraction
without materializing the gathered slabs. Replaces the reference hot
loops (``SparseMatrixFatVectorMultiplyRowWise.cpp:36-50``) with:

    slabs[p] = v[pair_chunk[p]*C : (p+1)*C]        # P slab gathers
    out[pair_block[p]] += tiles[p] @ slabs[p]      # MXU batched matmul

The only gathers are P slab fetches (P ~ #tiles, thousands — not
#nonzeros, millions) plus the block segment-sum; on TPU the Pallas
variant removes even the slab materialization.

Core functions live in the operand's *padded permuted* space
(``WindowedPairs.encode``/``decode``): fat vectors arrive pre-padded to
``wp.pad_rows`` rows, outputs leave padded — chained consumers pay zero
per-step layout transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.windowed import KPAD_MIN_K, WindowedPairs
from .ell import spmm_ell

__all__ = ["spmm_windowed", "spmm_windowed_core", "spmm_windowed_xla",
           "windowed_t_chain"]


def _precision(tiles_dtype, v_dtype):
    # f32xf32 needs HIGHEST: the MXU's default lowering truncates f32
    # inputs to bf16 (see ops/banded.py rationale).
    return (jax.lax.Precision.HIGHEST
            if tiles_dtype == jnp.float32 and v_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _finish(wp: WindowedPairs, out_blocks: jax.Array,
            v_p: jax.Array) -> jax.Array:
    """(nb*R, k) block output -> padded-space result + spill."""
    m, n = wp.shape
    k = out_blocks.shape[1]
    pad = wp.pad_rows - out_blocks.shape[0]
    if pad > 0:
        out_blocks = jnp.concatenate(
            [out_blocks, jnp.zeros((pad, k), out_blocks.dtype)], axis=0)
    out = out_blocks
    if wp.spill is not None:
        # Restore via the m-row take, NOT a compact scatter-add over the
        # spill rows: measured on v5e, scatter-add of 23 k rows costs
        # 573 us vs 419 us for the full take+add (TPU scatters pay ~24
        # ns/row — scripts/exp_kernel_probe13.py ``scat``; consistent
        # with the round-1 "scatters cost ~2x gathers" finding).
        #
        # The gather table is v_p UNSLICED (spill column ids are < n, so
        # the pad tail is never addressed — slicing would cost a 15 MB
        # copy per iterate), and the restore take is extended over the
        # pad tail (pointing at the all-zero row) so the result lands
        # directly in padded space with no concat+add of a second
        # full-size array.
        bell = wp.spill
        parts = [spmm_ell(b, v_p, unpad=False) for b in bell.buckets]
        parts.append(jnp.zeros((1, k), parts[0].dtype))
        stacked = jnp.concatenate(parts, axis=0)
        idx = bell.inv_row_perm
        tail = out.shape[0] - m
        if tail > 0:
            idx = jnp.concatenate([
                idx,
                jnp.full((tail,), stacked.shape[0] - 1, idx.dtype),
            ])
        out = out + jnp.take(stacked, idx, axis=0).astype(out.dtype)
    return out


def spmm_windowed_xla(wp: WindowedPairs, v_p: jax.Array) -> jax.Array:
    """Padded-permuted-space SpMM via slab gather + batched einsum +
    block segment-sum (pairs are block-sorted, so the segment-sum is a
    sorted reduction, not a scatter).

    ``v_p`` is a ``(pad_rows, k)`` fat vector from ``wp.encode``.
    Returns the padded-space ``(pad_rows, k)`` result.
    """
    R, C = wp.block_rows, wp.chunk_cols
    nb = wp.n_blocks
    k = v_p.shape[1]
    n_chunks = wp.n_chunks

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

    slabs = jnp.take(
        v_p[: n_chunks * C].reshape(n_chunks, C * k), wp.pair_chunk,
        axis=0,
    ).reshape(-1, C, k)  # (P, C, k)
    prods = jnp.einsum(
        "prc,pck->prk", wp.tiles, slabs,
        preferred_element_type=out_dtype,
        precision=_precision(wp.tiles.dtype, v_p.dtype),
    )
    out_blocks = jax.ops.segment_sum(
        prods, wp.pair_block, num_segments=nb, indices_are_sorted=True
    ).reshape(nb * R, k)
    return _finish(wp, out_blocks, v_p)


def spmm_windowed_core(wp: WindowedPairs, v_p: jax.Array, *,
                       use_pallas: bool | None = None) -> jax.Array:
    """Padded-permuted-space SpMM, dispatching to the fused Pallas kernel
    on accelerator backends (``use_pallas=None`` auto-selects).

    Mosaic cannot lower the pair dots at k % 8 != 0 (bf16 verification
    failure at k=1 on v5e), so sub-sublane fat vectors are zero-padded to
    the next sublane multiple before the kernel and sliced after — for
    auto-selection only when k >= ``KPAD_MIN_K`` (narrow k stays on the
    XLA gather+einsum path, which beat even the unpadded f32 HIGHEST
    kernel at k=1/6 — results/tpu_kernels.json); a forced
    ``use_pallas=True`` always pads as needed."""
    k = v_p.shape[1]
    k_pad = (-k) % 8
    if use_pallas is None:
        from ..utils.backend import on_cpu_backend

        use_pallas = not on_cpu_backend()
        if k_pad and k < KPAD_MIN_K:
            use_pallas = False
    if use_pallas:
        from .pallas_windowed import spmm_windowed_pallas

        if k_pad:
            v_wide = jnp.concatenate(
                [v_p, jnp.zeros((v_p.shape[0], k_pad), v_p.dtype)], axis=1)
            return spmm_windowed_pallas(wp, v_wide)[:, :k]
        return spmm_windowed_pallas(wp, v_p)
    return spmm_windowed_xla(wp, v_p)


def windowed_t_chain(wp: WindowedPairs, k: int, *,
                     interpret: bool | None = None):
    """Zero-relayout chained-iterate protocol in TRANSPOSED state, or
    ``None`` when it does not apply (caller falls back to the natural
    ``encode``/``iterate``/``decode`` chain).

    The state is the slab array itself — ``(n_chunks, k, 2C)`` bf16
    lane-packed hi|lo for f32 operands, ``(n_chunks, k, C)`` bf16 for
    bf16 operands. Each step runs the U-pair transposed kernel
    (``windowed_matmul_tmulti``), whose ``(nb, k, R)`` f32 output maps
    back to the slab grid with ONE fused elementwise pass
    (``resplit_slabs`` / a cast) because ``R == C`` and the block grid
    equals the chunk grid — the per-step chunk-transpose relayout of
    the natural pipeline (0.13 ms Pallas / 0.4 ms XLA on the cop20k
    stand-in) disappears entirely. Boundary transforms (RCM permute,
    pad, the first split) happen once in ``enc``/``dec`` — the PETSc
    never-regather lesson (``report/425500_Report.tex:1092-1095``).

    Accuracy: the state round-trips through the bf16 hi+lo pair each
    step (~4e-6 relative), inside the documented f32 tier
    (``utils/compare.py``); bf16 operands round-trip through bf16
    exactly as the natural path does.

    Each returned function takes ``(x, operand)`` like
    ``Strategy.chain_parts`` bodies.
    """
    if not wp.supports_transposed_chain:
        return None
    k8 = -(-k // 8) * 8
    if k8 != k and k < KPAD_MIN_K:
        return None  # narrow unaligned k: XLA path is measured faster
    if interpret is None:
        from ..utils.backend import on_cpu_backend

        interpret = on_cpu_backend()
    if not interpret and wp.block_rows % 128:
        return None  # compiled flush DMA needs a 128-multiple minor dim
    from .pallas_windowed import (
        chunk_slabs, resplit_slabs, windowed_matmul_tmulti,
        windowed_matmul_tmulti_phased,
    )

    # Follow the build's planes, not the tile dtype (see
    # pallas_windowed.spmm_windowed_pallas — f64-built formats carry a
    # single unsplit tiles_t plane).
    split = wp.tiles_split is not None
    slab_dtype = jnp.float32 if split else wp.tiles.dtype
    C = wp.chunk_cols

    def enc(v, op):
        v_p = op.encode(v).astype(slab_dtype)
        if k8 != k:
            v_p = jnp.concatenate(
                [v_p, jnp.zeros((v_p.shape[0], k8 - k), v_p.dtype)],
                axis=1)
        (slabs,) = chunk_slabs(v_p, C=C, split=split, interpret=interpret)
        return slabs

    def body(state, op):
        if op.phases is not None:
            # Phase-major planes -> the VMEM-resident phased kernel;
            # the per-phase partial pad+add fuses into the re-split
            # below (one elementwise pass over the output).
            out_t = windowed_matmul_tmulti_phased(
                op.pair_block_ph, op.pair_chunk_ph,
                jnp.asarray(op.tiles_t), state, nb=op.n_blocks,
                phases=op.phases, chunks_per_phase=op.chunks_per_phase,
                pairs_per_step=op.pairs_per_step, split=split,
                interpret=interpret,
            )
            if split:
                return resplit_slabs(out_t)
            return out_t.astype(slab_dtype)
        if k8 % 16 == 0:
            # The kernel's staged flush emits the next state directly
            # (fuse_resplit): the whole-output re-split/cast pass —
            # a full read + write at HBM rate, ~10 % of the chained
            # iterate — disappears (VERDICT r4 #6).
            return windowed_matmul_tmulti(
                op.pair_block, op.pair_chunk, jnp.asarray(op.tiles_t),
                state, nb=op.n_blocks, pairs_per_step=op.pairs_per_step,
                split=split, interpret=interpret, fuse_resplit=True,
            )
        out_t = windowed_matmul_tmulti(
            op.pair_block, op.pair_chunk, jnp.asarray(op.tiles_t),
            state, nb=op.n_blocks, pairs_per_step=op.pairs_per_step,
            split=split, interpret=interpret,
        )
        if split:
            return resplit_slabs(out_t)
        return out_t.astype(slab_dtype)

    def dec(state, op):
        if split:
            x = (state[:, :, :C].astype(jnp.float32)
                 + state[:, :, C:].astype(jnp.float32))
        else:
            x = state.astype(jnp.float32)
        rows = jnp.swapaxes(x, 1, 2).reshape(-1, k8)[:, :k]
        return op.decode(rows)

    return enc, body, dec


def spmm_windowed(wp: WindowedPairs, v: jax.Array, *,
                  use_pallas: bool | None = None) -> jax.Array:
    """Full SpMM in original coordinates: encode -> iterate -> decode.

    Iterative consumers should instead call ``wp.encode`` once, chain
    ``wp.iterate``, and ``wp.decode`` once — the boundary permute/pad is
    a one-time cost (the PETSc never-regather lesson,
    ``report/425500_Report.tex:1092-1095``).
    """
    return wp.decode(
        spmm_windowed_core(wp, wp.encode(v), use_pallas=use_pallas)
    )
