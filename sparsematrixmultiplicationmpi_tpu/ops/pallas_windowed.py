"""Fused Pallas TPU kernel for windowed tile-pair SpMM.

Idiomatic block-sparse matmul: the grid walks the flat pair list (one
dense (R, C) tile per step); BlockSpec index_maps read the prefetched
scalar arrays to fetch each pair's tile (``p``), its fat-vector slab
(``pair_chunk[p]``, from the chunk-transposed ``(n_chunks, k, C)`` view)
and its output block (``pair_block[p]``). Pairs are block-sorted, so the
output index is non-decreasing: Mosaic keeps the accumulator block in
VMEM across the pair run and writes it back when the block index changes
(the standard revisited-reduction pattern). The kernel body zeroes the
accumulator on each block's first pair and adds one MXU contraction.

Mosaic's automatic pipeliner double-buffers all three streams — measured
374 GB/s effective on the cop20k stand-in at (256, 128) f32 tiles
(scripts/exp_kernel_probe10.py), beating every hand-rolled DMA-chain
variant (probe6-9: 220-330 GB/s, best one-off 460 GB/s that never
reproduced under production control flow) with a fraction of the code.

Every output block must be visited or its contents are garbage:
``WindowedPairs.from_csr`` guarantees coverage by inserting one dummy
zero tile into each otherwise-empty row block (rare on the matrices this
format wins on).

Replaces the reference row-wise hot loop
(``SparseMatrixFatVectorMultiplyRowWise.cpp:36-50``) at MXU tile
granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.windowed import WindowedPairs

__all__ = ["spmm_windowed_pallas", "windowed_matmul_pallas"]


def _kernel(pb_ref, pc_ref, first_ref, tile_ref, slab_ref, out_ref,
            *, f32_highest: bool):
    p = pl.program_id(0)

    @pl.when(first_ref[p] == 1)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # (R, C) x (k, C) contracting on C -> (R, k).
    out_ref[0] += jax.lax.dot_general(
        tile_ref[0], slab_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=(jax.lax.Precision.HIGHEST if f32_highest
                   else jax.lax.Precision.DEFAULT),
    )


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def windowed_matmul_pallas(pair_block: jax.Array, pair_chunk: jax.Array,
                           tiles: jax.Array, v_pad: jax.Array, *,
                           nb: int, interpret: bool = False) -> jax.Array:
    """Raw fused contraction: ``(nb, R, k)`` block outputs.

    ``tiles``: (P, R, C) block-sorted; ``pair_block``: (P,) ascending
    block ids covering every block in [0, nb); ``v_pad``: (pad_rows, k)
    natural-layout fat vector with pad_rows >= n_chunks*C.
    """
    P, R, C = tiles.shape
    k = v_pad.shape[1]
    # Chunk-transposed view: slabs are fetched by leading-dim index with
    # the 128-multiple C on the lane dim (Mosaic forbids sub-128 lane-dim
    # windows on HBM, so a natural (C, k) slab with k < 128 cannot be
    # pipelined). The transpose is the one per-call layout cost.
    v_chunks = jnp.swapaxes(v_pad.reshape(-1, C, k), 1, 2)
    out_dtype = jnp.promote_types(
        jnp.float32, jnp.promote_types(tiles.dtype, v_pad.dtype)
    )
    first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (pair_block[1:] != pair_block[:-1]).astype(jnp.int32),
    ])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # pair_block, pair_chunk, first
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda p, pb, pc, fr: (p, 0, 0)),
            pl.BlockSpec((1, k, C), lambda p, pb, pc, fr: (pc[p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, k),
                               lambda p, pb, pc, fr: (pb[p], 0, 0)),
    )
    kernel = functools.partial(
        _kernel, f32_highest=tiles.dtype == jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), out_dtype),
        interpret=interpret,
    )(pair_block, pair_chunk, first, tiles, v_chunks)


def spmm_windowed_pallas(wp: WindowedPairs, v_p: jax.Array, *,
                         interpret: bool | None = None) -> jax.Array:
    """Padded-permuted-space SpMM via the fused kernel (drop-in for
    ``spmm_windowed_xla``): ``(pad_rows, k) -> (pad_rows, k)``, zero
    per-step layout transforms. ``interpret=None`` auto-selects
    interpreter mode on CPU backends."""
    from .windowed import _finish

    if interpret is None:
        try:
            interpret = jax.devices()[0].platform == "cpu"
        except Exception:
            interpret = True
    R = wp.block_rows
    nb = wp.n_blocks
    k = v_p.shape[1]

    # Match operand dtypes: Mosaic's mixed-precision dot (bf16 tiles x f32
    # slab) was observed numerically wrong on v5e (rel err ~0.7); the
    # native bf16 x bf16 -> f32 path is exact per product. Fat vectors of
    # small integers are exactly representable in bf16 (<= 256).
    if v_p.dtype != wp.tiles.dtype:
        v_p = v_p.astype(wp.tiles.dtype)
    computed = windowed_matmul_pallas(
        wp.pair_block, wp.pair_chunk, jnp.asarray(wp.tiles), v_p,
        nb=nb, interpret=interpret,
    )  # (nb, R, k)
    return _finish(wp, computed.reshape(nb * R, k), v_p)
