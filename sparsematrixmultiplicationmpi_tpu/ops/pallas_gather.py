"""Experimental Pallas DMA-gather kernel for the ELL spill path.

The measured wall on TPU v5e: XLA's row gather costs ~4.8 ns per
gathered row regardless of width (~3 % of HBM bandwidth at k=32), which
makes every gather-class SpMM path row-count-bound
(CLAUDE.md "Measured TPU v5e facts"; replaces the reference's per-nnz
scatter loop ``...NonZeroElement.cpp:54-67``). This kernel probes the
one mechanism XLA's gather cannot use from the HLO level: MANY
explicitly in-flight single-row DMAs per grid step, issued back-to-back
on the scalar core and overlapped with the previous tile's FMA work.

Shape contract (single-width ELL plane, one kernel per bucket):

    cols: (Rt, W) int32 — fat-vector row per (out-row, slot)
    vals: (Rt, W)       — slot coefficients (0 = padding)
    v:    (n_pad, 128)  — fat vector padded to 128 lanes (DMA slices
                          must be 128-aligned on the minor dim — v5e
                          Mosaic restriction found in round 2)
    out:  (Rt, 128)     — sum_w vals[r, w] * v[cols[r, w]]

Grid steps process ``rows_per_step`` output rows; each step issues
``rows_per_step * W`` row DMAs into a double-buffered VMEM stage while
the previous step's rows are reduced, so DMA issue cost is the only
serial component. The probe script (``scripts/exp_spill_gather.py``)
measures ns/row against the XLA take+einsum path; production adoption
is gated on beating it (VERDICT r2 next-step #5 accepts a written-up
negative result).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ell_gather_rows_pallas"]


def _kernel(cols_ref, vals_ref, v_ref, out_ref, stage, sem):
    """One grid step = T out rows. stage: (2, T*W, 128) double buffer;
    slot s%2 was prefilled by the PREVIOUS step (step 0 fills its own),
    so the copies issued here for step s+1 overlap this step's FMAs."""
    s = pl.program_id(0)
    S = pl.num_programs(0)
    T, W = vals_ref.shape
    TW = T * W

    def issue(step, slot):
        # Issue T*W row DMAs for grid step `step` into stage[slot],
        # signalling that slot's OWN semaphore — a single shared
        # semaphore would let step s+1's early completions satisfy step
        # s's waits and the reduce below would read rows still in
        # flight (completion order across independent HBM rows is not
        # guaranteed).
        base = step * TW
        for i in range(TW):
            pltpu.make_async_copy(
                v_ref.at[cols_ref[base + i]],
                stage.at[slot, i],
                sem.at[slot],
            ).start()

    @pl.when(s == 0)
    def _():
        issue(0, 0)

    @pl.when(s + 1 < S)
    def _():
        issue(s + 1, (s + 1) % 2)

    # Wait for THIS step's copies (issued last step into this slot's
    # dedicated semaphore; the next step's in-flight copies signal the
    # other slot's semaphore and cannot release these waits).
    slot = s % 2
    for i in range(TW):
        pltpu.make_async_copy(
            v_ref.at[cols_ref[s * TW + i]], stage.at[slot, i],
            sem.at[slot],
        ).wait()

    rows = stage[slot].reshape(T, W, 128)
    out_ref[...] = jnp.sum(
        vals_ref[...][:, :, None].astype(jnp.float32) * rows, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("rows_per_step", "interpret"))
def ell_gather_rows_pallas(cols: jax.Array, vals: jax.Array,
                           v: jax.Array, *, rows_per_step: int = 8,
                           interpret: bool = False) -> jax.Array:
    """``out[r] = sum_w vals[r, w] * v[cols[r, w]]`` via explicit row
    DMAs. ``cols``/``vals``: (Rt, W) with Rt % rows_per_step == 0;
    ``v``: (n_pad, 128) f32. Returns (Rt, 128) f32."""
    Rt, W = cols.shape
    T = rows_per_step
    if Rt % T:
        raise ValueError(f"rows {Rt} not a multiple of {T}")
    if v.shape[1] != 128:
        raise ValueError("v must be padded to 128 lanes")
    S = Rt // T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # flat cols
        grid=(S,),
        in_specs=[
            pl.BlockSpec((T, W), lambda s, c: (s, 0)),      # vals tile
            pl.BlockSpec(memory_space=pltpu.ANY),           # v in HBM
        ],
        out_specs=pl.BlockSpec((T, 128), lambda s, c: (s, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, T * W, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rt, 128), jnp.float32),
        interpret=interpret,
    )(cols.reshape(-1), vals.astype(jnp.float32), v)
