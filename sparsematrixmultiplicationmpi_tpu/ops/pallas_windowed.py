"""Fused Pallas TPU kernel for windowed tile-pair SpMM.

The XLA path (``ops/windowed.py``) materializes the gathered fat-vector
slabs in HBM (one write + one read of ~P*C*k values) and the per-pair
products before the segment-sum. This kernel fuses the whole contraction:
the grid walks the sorted pair list; each step's ``(R, C)`` tile is
pipelined into VMEM by the BlockSpec machinery, the pair's fat-vector
slab is fetched by an explicit double-buffered async DMA keyed off the
scalar-prefetched ``pair_chunk``, and the MXU product accumulates
directly into the output row block, which Pallas keeps resident in VMEM
across consecutive pairs of the same block (``pair_block`` is sorted, so
each output block is visited as one contiguous run).

HBM traffic is exactly: tiles (once) + one slab per pair + output (once)
— the format's design roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.windowed import WindowedPairs
from .ell import spmm_bucketed

__all__ = ["spmm_windowed_pallas", "windowed_matmul_pallas"]


def _kernel(pb_ref, pc_ref, tiles_ref, v_ref, out_ref, buf0, buf1, sems):
    """One grid step: out[pair_block[p]] += tiles[p] @ slab(pair_chunk[p]).

    ``v_ref`` is the transposed padded fat vector (k, n_pad) living in
    HBM/ANY; slab DMAs slice its minor dim at C-aligned offsets (C is a
    multiple of 128, satisfying the Mosaic lane-alignment rule for DMA
    slices — see CLAUDE.md "Mosaic/Pallas limits"). Two explicit buffers
    double-buffer the slab fetch across grid steps.
    """
    p = pl.program_id(0)
    num_p = pl.num_programs(0)
    C = tiles_ref.shape[2]

    def slab_dma(buf, slot, pair_idx):
        start = pc_ref[pair_idx] * C
        return pltpu.make_async_copy(
            v_ref.at[:, pl.ds(start, C)], buf, sems.at[slot]
        )

    even = p % 2 == 0

    @pl.when(p == 0)
    def _():
        slab_dma(buf0, 0, 0).start()

    @pl.when(jnp.logical_and(p + 1 < num_p, even))
    def _():
        slab_dma(buf1, 1, p + 1).start()

    @pl.when(jnp.logical_and(p + 1 < num_p, jnp.logical_not(even)))
    def _():
        slab_dma(buf0, 0, p + 1).start()

    @pl.when(even)
    def _():
        slab_dma(buf0, 0, p).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        slab_dma(buf1, 1, p).wait()

    slab = jnp.where(even, buf0[:], buf1[:])  # (k, C)
    acc = jax.lax.dot_general(
        tiles_ref[0],              # (R, C)
        slab,                      # (k, C)
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=(
            jax.lax.Precision.HIGHEST
            if tiles_ref.dtype == jnp.float32
            and slab.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )

    # First pair of an output block initializes it; later pairs of the
    # same block accumulate into the VMEM-resident block (pair_block is
    # sorted, so revisits are contiguous and Pallas keeps the block hot).
    prev = pb_ref[jnp.maximum(p - 1, 0)]
    is_first = jnp.logical_or(p == 0, pb_ref[p] != prev)

    @pl.when(is_first)
    def _():
        out_ref[0] = acc

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[0] = out_ref[0] + acc


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def windowed_matmul_pallas(pair_block: jax.Array, pair_chunk: jax.Array,
                           tiles: jax.Array, v_pad_t: jax.Array, *,
                           nb: int, interpret: bool = False) -> jax.Array:
    """Raw fused contraction: returns (nb, R, k) block outputs.

    Blocks with no pairs are NOT written — the caller must mask them
    (their memory is uninitialized).

    ``tiles``: (P, R, C); ``pair_block`` sorted ascending; ``v_pad_t``:
    (k, n_pad) transposed fat vector with n_pad a multiple of C.
    """
    P, R, C = tiles.shape
    k = v_pad_t.shape[0]
    # Accumulate in f32 even for bf16 operands: per-pair MXU products are
    # exact in f32, and cross-pair accumulation in bf16 would lose ~3
    # digits on long window runs.
    out_dtype = jnp.promote_types(
        jnp.float32, jnp.promote_types(tiles.dtype, v_pad_t.dtype)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pair_block, pair_chunk
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda p, pb, pc: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # v stays in HBM
        ],
        out_specs=pl.BlockSpec((1, R, k), lambda p, pb, pc: (pb[p], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k, C), v_pad_t.dtype),
            pltpu.VMEM((k, C), v_pad_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), out_dtype),
        interpret=interpret,
    )(pair_block, pair_chunk, tiles, v_pad_t)


def spmm_windowed_pallas(wp: WindowedPairs, v_p: jax.Array, *,
                         interpret: bool | None = None) -> jax.Array:
    """Permuted-space SpMM via the fused kernel (drop-in for
    ``spmm_windowed_xla``). ``interpret=None`` auto-selects interpreter
    mode on CPU backends."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform == "cpu"
        except Exception:
            interpret = True
    m, n = wp.shape
    R, C = wp.block_rows, wp.chunk_cols
    nb = wp.n_blocks
    k = v_p.shape[1]
    n_chunks = -(-n // C)

    # Match operand dtypes: Mosaic's mixed-precision dot (bf16 tiles x f32
    # slab) was observed numerically wrong on v5e (rel err ~0.7); the
    # native bf16 x bf16 -> f32 path is exact per product. Fat vectors of
    # small integers are exactly representable in bf16 (<= 256).
    if v_p.dtype != wp.tiles.dtype:
        v_p = v_p.astype(wp.tiles.dtype)
    v_pad = jnp.zeros((n_chunks * C, k), dtype=v_p.dtype)
    v_pad = jax.lax.dynamic_update_slice(v_pad, v_p, (0, 0))
    out_blocks = windowed_matmul_pallas(
        wp.pair_block, wp.pair_chunk, jnp.asarray(wp.tiles), v_pad.T,
        nb=nb, interpret=interpret,
    )
    # Blocks with no dense pairs were never written by the kernel — their
    # memory is uninitialized garbage, not zero. Mask them out.
    visited = jnp.zeros((nb,), dtype=bool).at[wp.pair_block].set(True)
    out_blocks = jnp.where(visited[:, None, None], out_blocks, 0)
    out = out_blocks.reshape(nb * R, k)[:m]
    if wp.spill is not None:
        out = out + spmm_bucketed(wp.spill, v_p[:n]).astype(out.dtype)
    return out
