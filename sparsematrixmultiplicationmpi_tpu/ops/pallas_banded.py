"""Pallas TPU kernel for band-dense SpMM.

The XLA path (``ops/banded.py``) expresses the band contraction as three
batched einsums over shifted views. This Pallas kernel fuses them into one
pass: the grid walks row blocks; each step's ``(r, 3r)`` band tile is
pipelined into VMEM by the standard BlockSpec machinery while the
overlapping ``(3r, k)`` fat-vector halo window — which BlockSpec cannot
express (windows overlap with stride r but size 3r) — is fetched with an
explicit double-buffered async DMA from HBM, hiding the window fetch under
the MXU matmul of the previous block.

Use ``spmm_banded_pallas`` exactly like ``spmm_banded``; it handles the
spill via the same bucketed-ELL path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.banded import BandedBlocks
from .ell import spmm_bucketed

__all__ = ["spmm_banded_pallas", "band_matmul_pallas"]


def _band_kernel(band_ref, v_hbm_ref, out_ref, buf0, buf1, sems):
    """One grid step: out[b] = band[b] @ v_window[b] with the window
    DMA double-buffered across grid steps.

    Two explicit VMEM buffers instead of a sliced (2, ...) scratch:
    Mosaic cannot slice a scratch whose minor dim (k, typically 32) is not
    lane-aligned, but whole-buffer DMA destinations are fine.
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    r = band_ref.shape[1]

    def window_dma(buf, slot, blk):
        # v is stored transposed (k, total_rows) so the window slice runs
        # along the row axis as the memref's minor dim, where r-multiples
        # satisfy the 128-lane alignment rule (k itself, e.g. 32, would
        # not be sliceable on the lane axis).
        return pltpu.make_async_copy(
            v_hbm_ref.at[:, pl.ds(blk * r, 3 * r)],
            buf,
            sems.at[slot],
        )

    even = b % 2 == 0

    # Warm-up: first block's window starts on step 0.
    @pl.when(b == 0)
    def _():
        window_dma(buf0, 0, 0).start()

    # Prefetch the next block's window while this block computes.
    @pl.when(jnp.logical_and(b + 1 < nb, even))
    def _():
        window_dma(buf1, 1, b + 1).start()

    @pl.when(jnp.logical_and(b + 1 < nb, jnp.logical_not(even)))
    def _():
        window_dma(buf0, 0, b + 1).start()

    @pl.when(even)
    def _():
        window_dma(buf0, 0, b).wait()

    @pl.when(jnp.logical_not(even))
    def _():
        window_dma(buf1, 1, b).wait()

    window = jnp.where(even, buf0[:], buf1[:])  # (k, 3r)
    out_ref[0] = jax.lax.dot_general(
        band_ref[0],
        window,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=(
            jax.lax.Precision.HIGHEST
            if band_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_matmul_pallas(band: jax.Array, v_pad_t: jax.Array, *,
                       interpret: bool = False) -> jax.Array:
    """``out[b] = band[b] @ v_window[b]^T`` for every block.

    ``band``: (nb, r, 3r); ``v_pad_t``: (k, (nb+2)*r) — the fat vector
    TRANSPOSED, with one leading halo block of zero rows. Returns
    (nb*r, k).
    """
    nb, r, c3 = band.shape
    k = v_pad_t.shape[0]
    out = pl.pallas_call(
        _band_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, r, c3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # v stays in HBM; manual DMA
        ],
        out_specs=pl.BlockSpec((1, r, k), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, r, k), v_pad_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((k, c3), v_pad_t.dtype),
            pltpu.VMEM((k, c3), v_pad_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(band, v_pad_t)
    return out.reshape(nb * r, k)


def spmm_banded_pallas(bb: BandedBlocks, v: jax.Array, *,
                       interpret: bool | None = None) -> jax.Array:
    """Drop-in Pallas variant of ``spmm_banded``.

    ``interpret=None`` auto-selects: compiled on accelerator backends,
    interpreter mode on CPU (correct everywhere, fast where it matters).
    """
    if interpret is None:
        from ..utils.backend import on_cpu_backend

        interpret = on_cpu_backend()
    m, n = bb.shape
    r = bb.block_rows
    nb = bb.n_blocks
    k = v.shape[1]
    v = v.astype(bb.band.dtype) if v.dtype != bb.band.dtype else v
    # Mosaic rejects the transposed-window scratch when its sublane extent
    # (k) is not a multiple of 8 — pad the fat vector to the next sublane
    # multiple and slice the result (round-2 fix: k=1/6/12 previously fell
    # back to the XLA einsum silently).
    k_pad = -(-k // 8) * 8
    if k_pad != k:
        v_run = jnp.pad(v, ((0, 0), (0, k_pad - k)))
    else:
        v_run = v
    total = (nb + 2) * r
    v_pad = jnp.zeros((total, k_pad), dtype=v.dtype)
    v_pad = jax.lax.dynamic_update_slice(v_pad, v_run[: total - r], (r, 0))
    out = band_matmul_pallas(
        jnp.asarray(bb.band), v_pad.T, interpret=interpret
    )[:m, :k]
    if bb.spill is not None:
        out = out + spmm_bucketed(bb.spill, v[:n])
    return out
