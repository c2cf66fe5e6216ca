"""Fused Pallas TPU kernel for windowed tile-pair SpMM.

The grid walks computed row blocks (one output block per step, written
once); an inner loop runs the block's contiguous pair run (``block_ptr``
from the class packing), double-buffering both the tile DMA (HBM->VMEM,
(R, C) per pair) and the fat-vector slab DMA ((k, C) per pair, sliced at
C-aligned offsets from the transposed padded vector). The MXU product of
each pair accumulates into the VMEM-resident output block.

Measured on v5e (scripts/exp_kernel_probe*.py): the manual DMA pipeline
sustains ~220-240 GB/s on the tile stream regardless of buffering depth,
batching, or slab addressing mode, while XLA's own class-packed einsum
path (``ops/windowed.py``) streams the same tiles at near full HBM
bandwidth — so the XLA path is the default on TPU
(``spmm_windowed_core``) and this kernel is kept as the
fusion-experiment surface, exact and validated but not the fastest.
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


def _kernel(ptr_ref, pc_ref, tiles_ref, v_ref, out_ref,
            tbuf0, tbuf1, sbuf0, sbuf1, sems):
    """One grid step = one computed block: loop its pair run, accumulate
    tiles[p] @ slab(pair_chunk[p]) into the block output."""
    b = pl.program_id(0)
    C = tiles_ref.shape[2]
    lo = ptr_ref[b]
    hi = ptr_ref[b + 1]
    total = ptr_ref[pl.num_programs(0)]

    def start_pair(p):
        @pl.when(p < total)
        def _():
            even = p % 2 == 0

            @pl.when(even)
            def _():
                pltpu.make_async_copy(
                    tiles_ref.at[p], tbuf0, sems.at[0]).start()
                pltpu.make_async_copy(
                    v_ref.at[:, pl.ds(pc_ref[p] * C, C)], sbuf0,
                    sems.at[1]).start()

            @pl.when(jnp.logical_not(even))
            def _():
                pltpu.make_async_copy(
                    tiles_ref.at[p], tbuf1, sems.at[2]).start()
                pltpu.make_async_copy(
                    v_ref.at[:, pl.ds(pc_ref[p] * C, C)], sbuf1,
                    sems.at[3]).start()

    # Warm-up once (scratch and semaphores persist across grid steps, so
    # the pair pipeline flows across block boundaries).
    @pl.when(b == 0)
    def _():
        start_pair(jnp.int32(0))

    out_ref[0] = jnp.zeros_like(out_ref[0])

    def body(p, _):
        start_pair(p + 1)
        even = p % 2 == 0

        def accumulate(tbuf, sbuf, tsem, ssem):
            pltpu.make_async_copy(tiles_ref.at[p], tbuf, sems.at[tsem]
                                  ).wait()
            pltpu.make_async_copy(
                v_ref.at[:, pl.ds(pc_ref[p] * C, C)], sbuf, sems.at[ssem]
            ).wait()
            out_ref[0] += jax.lax.dot_general(
                tbuf[:], sbuf[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=out_ref.dtype,
                precision=(jax.lax.Precision.HIGHEST
                           if tbuf.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT),
            )

        @pl.when(even)
        def _():
            accumulate(tbuf0, sbuf0, 0, 1)

        @pl.when(jnp.logical_not(even))
        def _():
            accumulate(tbuf1, sbuf1, 2, 3)
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def windowed_matmul_pallas(block_ptr: jax.Array, pair_chunk: jax.Array,
                           tiles: jax.Array, v_pad_t: jax.Array, *,
                           interpret: bool = False) -> jax.Array:
    """Raw fused contraction: (nb_occ, R, k) computed-block outputs.

    ``tiles``: (P, R, C) class-packed; ``block_ptr``: (nb_occ + 1,) pair
    run bounds; ``v_pad_t``: (k, n_pad) transposed padded fat vector with
    n_pad a multiple of C.
    """
    P, R, C = tiles.shape
    k = v_pad_t.shape[0]
    nb_occ = int(block_ptr.shape[0]) - 1
    out_dtype = jnp.promote_types(
        jnp.float32, jnp.promote_types(tiles.dtype, v_pad_t.dtype)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_ptr, pair_chunk
        grid=(nb_occ,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # tiles stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v stays in HBM
        ],
        out_specs=pl.BlockSpec((1, R, k), lambda b, ptr, pc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, C), tiles.dtype),
            pltpu.VMEM((R, C), tiles.dtype),
            pltpu.VMEM((k, C), v_pad_t.dtype),
            pltpu.VMEM((k, C), v_pad_t.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_occ, R, k), out_dtype),
        interpret=interpret,
    )(block_ptr, pair_chunk, tiles, v_pad_t)


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
    computed = windowed_matmul_pallas(
        wp.block_ptr, wp.pair_chunk, jnp.asarray(wp.tiles), v_pad.T,
        interpret=interpret,
    )  # (nb_occ, R, k)
    out_dtype = computed.dtype
    padded = jnp.concatenate(
        [computed, jnp.zeros((1, R, k), out_dtype)], axis=0
    )
    out_blocks = jnp.take(
        padded.reshape(padded.shape[0], R * k), wp.inv_block_pos, axis=0
    )
    out = out_blocks.reshape(nb * R, k)[:m]
    if wp.spill is not None:
        out = out + spmm_bucketed(wp.spill, v_p[:n]).astype(out.dtype)
    return out
