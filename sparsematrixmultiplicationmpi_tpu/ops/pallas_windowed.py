"""Fused Pallas TPU kernel for windowed tile-pair SpMM.

The grid walks row blocks in natural order (one output block per step,
zero-initialized then written once); an inner loop runs the block's
contiguous pair run (``block_ptr``), pipelining both the tile DMA
(HBM->VMEM, (R, C) per pair) and the fat-vector slab DMA ((C, k) per
pair — a contiguous natural-layout read at a C-aligned row offset). The
MXU product of each pair accumulates into the VMEM-resident output
block.

Measured on v5e (scripts/exp_kernel_probe*.py): a single manual DMA
chain sustains only ~220-240 GB/s on the tile stream regardless of
buffering depth or slab addressing mode, but splitting each tile copy
into ``S`` parallel sub-copies on separate DMA semaphores engages
multiple DMA streams: S=4 with a 4-deep pair pipeline reaches
~460 GB/s (probe7), making this kernel ~2x the XLA class-packed einsum
path (``ops/windowed.py``), which must materialize gathered slabs. The
defaults below encode the probe7 sweet spot (S=4, depth=4); S=8/16
oversubscribe and lose bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.windowed import WindowedPairs

__all__ = ["spmm_windowed_pallas", "windowed_matmul_pallas"]


def _pick_substreams(R: int) -> int:
    """Largest S <= 4 dividing R with 8-sublane-aligned sub-copies."""
    for s in (4, 2):
        if R % s == 0 and (R // s) % 8 == 0:
            return s
    return 1


def _make_kernel(S: int, D: int):
    """Kernel factory: S parallel tile sub-copies per pair, D-slot ring
    of (tile, slab) buffers — up to D-1 pairs in flight ahead of
    compute."""

    def _kernel(ptr_ref, pc_ref, tiles_ref, v_ref, out_ref, tbufs, sbufs,
                sems):
        b = pl.program_id(0)
        R = tiles_ref.shape[1]
        C = tiles_ref.shape[2]
        RS = R // S
        lo = ptr_ref[b]
        hi = ptr_ref[b + 1]
        total = ptr_ref[pl.num_programs(0)]

        def start_pair(p):
            @pl.when(p < total)
            def _():
                slot = p % D
                for s in range(S):
                    pltpu.make_async_copy(
                        tiles_ref.at[p, pl.ds(s * RS, RS), :],
                        tbufs.at[slot, pl.ds(s * RS, RS), :],
                        sems.at[slot, s],
                    ).start()
                # Chunk-transposed slab: chunk pc of the (n_chunks, k, C)
                # fat-vector view — leading-dim indexing (exactly like
                # the tiles array) with the 128-multiple C on the lane
                # dim. Slicing a natural (n_chunks, C, k) view instead
                # puts k (< 128) on the lane dim, which Mosaic rejects
                # for HBM memref slices.
                pltpu.make_async_copy(
                    v_ref.at[pc_ref[p]], sbufs.at[slot],
                    sems.at[slot, S]).start()

        # Prime the pipeline once; scratch and semaphores persist across
        # grid steps, so in-flight pairs flow across block boundaries.
        @pl.when(b == 0)
        def _():
            for d in range(D - 1):
                start_pair(jnp.int32(d))

        out_ref[0] = jnp.zeros_like(out_ref[0])

        def body(p, _):
            start_pair(p + D - 1)
            slot = p % D
            for s in range(S):
                pltpu.make_async_copy(
                    tiles_ref.at[p, pl.ds(s * RS, RS), :],
                    tbufs.at[slot, pl.ds(s * RS, RS), :],
                    sems.at[slot, s]).wait()
            pltpu.make_async_copy(
                v_ref.at[pc_ref[p]], sbufs.at[slot],
                sems.at[slot, S]).wait()
            # (R, C) x (k, C) contracting on C -> (R, k).
            out_ref[0] += jax.lax.dot_general(
                tbufs[slot], sbufs[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=out_ref.dtype,
                precision=(jax.lax.Precision.HIGHEST
                           if tbufs.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT),
            )
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "substreams", "depth"))
def windowed_matmul_pallas(block_ptr: jax.Array, pair_chunk: jax.Array,
                           tiles: jax.Array, v_pad: jax.Array, *,
                           interpret: bool = False,
                           substreams: int | None = None,
                           depth: int = 4) -> jax.Array:
    """Raw fused contraction: (nb, R, k) block outputs, natural block
    order (empty runs come out zero).

    ``tiles``: (P, R, C) block-sorted; ``block_ptr``: (nb + 1,) pair run
    bounds; ``v_pad``: (pad_rows, k) natural-layout fat vector with
    pad_rows >= n_chunks*C. ``substreams``/``depth`` tune the DMA
    pipeline (None = probe7-calibrated defaults).
    """
    P, R, C = tiles.shape
    k = v_pad.shape[1]
    nb = int(block_ptr.shape[0]) - 1
    S = substreams if substreams is not None else _pick_substreams(R)
    D = depth
    # Chunk-transposed view: the kernel indexes whole (k, C) slabs on the
    # leading dim, keeping the 128-multiple C on the lane dim (Mosaic
    # forbids sub-128 lane-dim slices on HBM, so a natural (C, k) slab
    # with k < 128 cannot be DMA'd). This transpose is the one
    # per-iteration layout cost of the chained path.
    v_chunks = jnp.swapaxes(v_pad.reshape(-1, C, k), 1, 2)
    out_dtype = jnp.promote_types(
        jnp.float32, jnp.promote_types(tiles.dtype, v_pad.dtype)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_ptr, pair_chunk
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # tiles stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v stays in HBM
        ],
        out_specs=pl.BlockSpec((1, R, k), lambda b, ptr, pc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((D, R, C), tiles.dtype),
            pltpu.VMEM((D, k, C), v_pad.dtype),
            pltpu.SemaphoreType.DMA((D, S + 1)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(S, D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), out_dtype),
        interpret=interpret,
    )(block_ptr, pair_chunk, tiles, v_chunks)


def spmm_windowed_pallas(wp: WindowedPairs, v_p: jax.Array, *,
                         interpret: bool | None = None,
                         substreams: int | None = None,
                         depth: int = 4) -> jax.Array:
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
        wp.block_ptr, wp.pair_chunk, jnp.asarray(wp.tiles), v_p,
        interpret=interpret, substreams=substreams, depth=depth,
    )  # (nb, R, k)
    return _finish(wp, computed.reshape(nb * R, k), v_p)
