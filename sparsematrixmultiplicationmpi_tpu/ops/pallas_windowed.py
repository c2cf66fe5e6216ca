"""Fused Pallas TPU kernels for windowed tile-pair SpMM.

Idiomatic block-sparse matmul: the grid walks the flat pair list TWO
pairs per step (every block's pair run is padded to even length at build
time, so a step never spans blocks); BlockSpec index_maps read the
prefetched scalar arrays to fetch the step's tile window (one leading-dim
DMA of two tiles), the two pairs' fat-vector slabs (from the
chunk-transposed ``(n_chunks, k, C)`` view) and the output block
(``pair_block``). Pairs are block-sorted, so the output index is
non-decreasing: Mosaic keeps the accumulator block in VMEM across the
block's steps and writes it back when the block index changes (the
standard revisited-reduction pattern).

Mosaic's automatic pipeliner double-buffers all streams, beating every
hand-rolled DMA-chain variant (probe6-9: 220-460 GB/s) with a fraction
of the code. Measured per-tile cost decomposes as a fixed per-grid-step
overhead (~191 ns) plus stream bytes — the kernel is step-overhead and
MXU-bound, NOT DMA-bound, because the k=32 output occupies only a
quarter of the 128 MXU lanes and f32 HIGHEST costs 6 bf16 passes
(probe10/13/14). Two-pairs-per-step amortizes the fixed cost: measured
455 ns/real-tile at (256,256) f32 vs 580 one-pair (probe15), ~819 GB/s
marginal.

Precision modes:

* **split3** (f32 operands): tiles are pre-split at build time into
  lane-packed bf16 ``hi|lo`` planes (``hi`` = round-to-nearest, ``lo`` =
  the f32 residual re-rounded to bf16; ``hi + lo`` carries ~16-17
  mantissa bits, ~4e-6 relative); the fat-vector slabs are split the
  same way by the fused relayout kernel (``chunk_slabs``). Three
  DEFAULT-precision dots ``th@sh + tl@sh + th@sl`` measure ~1e-3
  worst-case relative end-to-end on non-integer FEM values — inside the
  documented f32 tier of 5e-3 relative
  (``utils/compare.py::default_tolerance``) — at half the MXU passes of
  HIGHEST. Mosaic does not implement ``Precision.HIGH``
  (NotImplementedError, probe10h), so this manual decomposition is the
  only 3-pass route. Same DMA bytes as f32.
* **bf16 operands**: one DEFAULT-precision dot per pair, f32
  accumulator.

Both engage only for sublane-aligned fat vectors (k % 8 == 0): Mosaic
cannot lower the bf16 dots otherwise (verification failure at k=1 on
v5e), and at unaligned k the XLA gather+einsum path is faster anyway
(``ops/windowed.py::spmm_windowed_core`` routes accordingly).

Every output block must be visited or its contents are garbage:
``WindowedPairs.from_csr`` guarantees coverage by inserting dummy zero
tiles into otherwise-empty row blocks.

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

from ..formats.windowed import RESIDENT_SLAB_VMEM_BYTES, WindowedPairs

__all__ = ["spmm_windowed_pallas", "windowed_matmul_pallas",
           "windowed_matmul_split3", "windowed_matmul_tmulti",
           "windowed_matmul_tmulti_phased", "resplit_slabs", "chunk_slabs"]


def _dot_cc(a, b, precision):
    """(R, C) x (k, C) contracting on C -> (R, k)."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _kernel_plain(pb_ref, pce_ref, pco_ref, first_ref, tile_ref,
                  slab0_ref, slab1_ref, out_ref, *, f32_highest: bool):
    s = pl.program_id(0)

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    prec = (jax.lax.Precision.HIGHEST if f32_highest
            else jax.lax.Precision.DEFAULT)
    out_ref[0] += (_dot_cc(tile_ref[0], slab0_ref[0], prec)
                   + _dot_cc(tile_ref[1], slab1_ref[0], prec))


def _kernel_split3(pb_ref, pce_ref, pco_ref, first_ref, tile_ref,
                   slab0_ref, slab1_ref, out_ref, *, C: int):
    """Lane-packed split3, two pairs per step: tile window (2, R, 2C)
    bf16 with hi in columns [:C] and lo in [C:]; slabs (k, 2C) each."""
    s = pl.program_id(0)

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    d = jax.lax.Precision.DEFAULT
    acc = jnp.zeros_like(out_ref[0])
    for u, sref in ((0, slab0_ref), (1, slab1_ref)):
        t = tile_ref[u]
        sl = sref[0]
        acc += (_dot_cc(t[:, :C], sl[:, :C], d)
                + _dot_cc(t[:, C:], sl[:, :C], d)
                + _dot_cc(t[:, :C], sl[:, C:], d))
    out_ref[0] += acc


def _split_bf16(x32):
    hi = x32.astype(jnp.bfloat16)
    lo = (x32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.partial(jax.jit,
                   static_argnames=("C", "split", "interpret"))
def chunk_slabs(v_pad: jax.Array, *, C: int, split: bool,
                interpret: bool = False):
    """Per-iterate fat-vector relayout ``(pad, k) -> (chunks, k, C)``.

    With ``split`` the result is ONE lane-packed bf16 ``hi|lo`` array
    ``(chunks, k, 2C)`` for the split3 kernel; otherwise a single array
    in ``v_pad``'s dtype. Uses a Pallas relayout kernel on TPU (XLA's
    swapaxes runs at ~74 GB/s here; the fused kernel measured 130 us on
    the cop20k stand-in — probe13 ``ptrans``); plain XLA elsewhere.
    """
    n_chunks = v_pad.shape[0] // C
    k = v_pad.shape[1]
    vc = v_pad.reshape(n_chunks, C, k)

    if interpret:
        t = jnp.swapaxes(vc, 1, 2)
        if split:
            hi, lo = _split_bf16(t)
            return (jnp.concatenate([hi, lo], axis=2),)
        return (t,)

    if split:
        def tkern(v_ref, out_ref):
            t = jnp.swapaxes(v_ref[0], 0, 1)
            hi, lo = _split_bf16(t)
            out_ref[0] = jnp.concatenate([hi, lo], axis=1)

        out_shape = [
            jax.ShapeDtypeStruct((n_chunks, k, 2 * C), jnp.bfloat16),
        ]
        out_specs = [pl.BlockSpec((1, k, 2 * C), lambda c: (c, 0, 0))]
    else:
        def tkern(v_ref, out_ref):
            out_ref[0] = jnp.swapaxes(v_ref[0], 0, 1)

        out_shape = [jax.ShapeDtypeStruct((n_chunks, k, C), v_pad.dtype)]
        out_specs = [pl.BlockSpec((1, k, C), lambda c: (c, 0, 0))]

    out = pl.pallas_call(
        tkern,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((1, C, k), lambda c: (c, 0, 0))],
        out_specs=out_specs,
        out_shape=out_shape,
    )(vc)
    return tuple(out) if isinstance(out, (list, tuple)) else (out,)


def _pad_pairs_multi(pair_block, pair_chunk, tiles, nb: int, U: int):
    """Host/build-side global tail pad to a pair-count multiple of U:
    zero tiles assigned to the last block (keeps ascending order; adds
    zero to its accumulator). Returns possibly-new arrays."""
    import numpy as np  # noqa: F811 — host-side only

    P = tiles.shape[0]
    pad = (-P) % U
    if pad == 0:
        return pair_block, pair_chunk, tiles
    pb = np.concatenate(
        [np.asarray(pair_block), np.full(pad, nb - 1, np.int32)])
    pc = np.concatenate(
        [np.asarray(pair_chunk), np.zeros(pad, np.int32)])
    tz = np.zeros((pad,) + tiles.shape[1:], np.asarray(tiles).dtype)
    t = np.concatenate([np.asarray(tiles), tz])
    return pb.astype(np.int32), pc.astype(np.int32), t


def _dot_kc_cr(a, b):
    """(k, C) x (C, R) standard matmul on the MXU -> (k, R), f32 acc.

    The transposed-state contraction ("tdot"): measured ~12 % faster
    than the (R, C) x (k, C) form at f32 HIGHEST (356 vs 403 ns/tile,
    scripts/exp_kernel_probe13.py ``tdot``) because the output's minor
    dim is the 128-lane R instead of the quarter-occupied k."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _kernel_tmulti(pb_ref, pc_ref, tiles_ref, *rest, U: int, C: int,
                   split: bool, pair_off: int = 0,
                   fuse_resplit: bool = False, n_acc: int = 1):
    """Transposed-state U-pairs-per-step kernel.

    Control structure: SMEM current-block tracking with a staged async
    flush on block change (steps span block runs freely — only a global
    tail pad to a U-multiple is required of the format). Every on-chip
    array keeps the 128-wide tile dimension MINOR so the manual flush
    DMA is tiling-legal: Mosaic stores HBM/VMEM arrays in (8, 128)
    (f32) / (16, 128) (bf16) tiles and a manual ``memref_slice`` whose
    minor extent is not a 128-multiple fails to compile ("Slice shape
    along dimension 2 must be aligned to tiling (128)" — the round-3
    U>2 hardware failure; the natural-layout accumulator's minor dim is
    k, typically 32). Here:

      tiles_ref : (U, 2C, R) bf16 — transposed tiles, hi planes on
                  sublanes [:C], lo on [C:] (non-split: (U, C, R))
      slabs     : (1, k8, 2C) bf16 lane-packed hi|lo (the
                  ``chunk_slabs`` layout; non-split: (1, k8, C))
      acc/stage : (k8, R) f32 — minor dim R, a 128-multiple by the
                  wrapper's gate
      out       : (nb, k8, R) f32 in HBM, flushed per block run

    The three DEFAULT-precision dots are the transposed split3 terms:
    ``sh@th + sh@tl + sl@th`` — identical arithmetic to
    ``_kernel_split3``, 12 % faster MXU shape (``_dot_kc_cr``).
    """
    slab_refs = rest[:U]
    out_ref = rest[U]
    accs = rest[U + 1:U + 1 + n_acc]
    stage, cur, prev, cnt, sem = rest[U + 1 + n_acc:]
    s = pl.program_id(0)
    S = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        cur[0] = pb_ref[pair_off]
        cnt[0] = 0
        for a in accs:
            a[...] = jnp.zeros(a.shape, a.dtype)

    def wait_prev():
        @pl.when(cnt[0] == 1)
        def _():
            pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()

    def flush():
        wait_prev()
        a = accs[0][...]
        for extra in accs[1:]:
            # Split accumulators (probe23: two alternating accumulators
            # break the 16-op serial MXU dependency chain per step,
            # measured -8 % on cop20k; >2 regress) are summed once per
            # flush — identical arithmetic terms, reassociated.
            a = a + extra[...]
        if fuse_resplit:
            # The next iterate's state layout, emitted directly from
            # the accumulator (VERDICT r4 #6): the chained consumer's
            # whole resplit pass (read + write of the full output at
            # HBM rate) disappears. split mode: lane-packed bf16
            # [hi | lo]; bf16 mode: one bf16 cast.
            if split:
                hi = a.astype(jnp.bfloat16)
                lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                stage[...] = jnp.concatenate([hi, lo], axis=1)
            else:
                stage[...] = a.astype(jnp.bfloat16)
        else:
            stage[...] = a
        pltpu.make_async_copy(stage, out_ref.at[cur[0]], sem).start()
        prev[0] = cur[0]
        cnt[0] = 1
        for acc in accs:
            acc[...] = jnp.zeros(acc.shape, acc.dtype)

    for u in range(U):
        b = pb_ref[pair_off + s * U + u]

        @pl.when(b != cur[0])
        def _(b=b):
            flush()
            cur[0] = b

        t = tiles_ref[u]
        sl = slab_refs[u][0]
        acc = accs[u % n_acc]
        if split:
            acc[...] += (_dot_kc_cr(sl[:, :C], t[:C])
                         + _dot_kc_cr(sl[:, :C], t[C:])
                         + _dot_kc_cr(sl[:, C:], t[:C]))
        else:
            acc[...] += _dot_kc_cr(sl, t)

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


#: Accumulators per step in the production U-pair kernel. probe23
#: (results/probe23_overlap.json): the kernel is COMPUTE-leg-bound
#: (dots + per-pair branches measure 1.32 ms standalone vs 0.95 ms for
#: all DMA streams on cop20k), and two alternating accumulators break
#: the 16-op serial MXU chain: 1.406 -> 1.292 ms (-8 %), bitwise-safe
#: reassociation. 4 accumulators REGRESS (1.73 ms — flush-sum +
#: VMEM-port cost); the precomputed-flag branch variant does not help
#: (the branch itself, not the SMEM chain, costs the ~36 ns/pair).
TMULTI_N_ACC = 2


@functools.partial(
    jax.jit, static_argnames=("nb", "pairs_per_step", "split", "interpret",
                              "fuse_resplit", "n_acc"))
def windowed_matmul_tmulti(pair_block: jax.Array, pair_chunk: jax.Array,
                           tiles_t: jax.Array, slabs: jax.Array, *,
                           nb: int, pairs_per_step: int = 8,
                           split: bool = True,
                           interpret: bool = False,
                           fuse_resplit: bool = False,
                           n_acc: int = TMULTI_N_ACC) -> jax.Array:
    """Raw fused contraction in TRANSPOSED state: slabs in, (nb, k8, R)
    f32 out — the chained-iterate hot body with zero per-step layout
    transforms (``resplit_slabs`` turns the output back into the next
    step's ``slabs`` with one fused elementwise op when R == C).

    ``tiles_t``: with ``split``, (P, 2C, R) bf16 sublane-packed hi/lo
    transposed tile planes (``formats/windowed.py::_tiles_t``);
    otherwise (P, C, R) single-plane transposed tiles. Block-ascending,
    every block in [0, nb) present, P % pairs_per_step == 0. ``slabs``:
    (n_chunks, k8, 2C) bf16 lane-packed hi|lo (``chunk_slabs(...,
    split=True)``) or (n_chunks, k8, C) single-plane, k8 % 8 == 0.
    Compiled mode requires R % 128 == 0 (manual-flush DMA tiling rule —
    see ``_kernel_tmulti``); the wrapper raises otherwise.

    ``fuse_resplit`` (requires k8 % 16 == 0 — bf16 memref tiling of the
    staged flush) makes the kernel emit the CHAINED-ITERATE state
    directly: ``(nb, k8, 2R)`` bf16 lane-packed hi|lo in split mode (the
    ``resplit_slabs`` layout), ``(nb, k8, R)`` bf16 in bf16 mode —
    eliminating the chain's whole-output re-split pass (VERDICT r4 #6).
    """
    U = pairs_per_step
    P, C2, R = tiles_t.shape
    C = C2 // 2 if split else C2
    k8 = slabs.shape[1]
    if P % U:
        raise ValueError(
            f"pair count {P} not a multiple of pairs_per_step {U}")
    if not split and tiles_t.dtype == jnp.float32:
        # The non-split dot runs at DEFAULT precision; on f32 operands
        # the MXU would silently truncate to bf16 (~1e-3 error on
        # multi-term rows). f32 data must ship as split planes.
        raise ValueError(
            "tmulti split=False requires bf16 operands; f32 tiles must "
            "use the sublane-packed hi/lo split planes (split=True)")
    if k8 % 8:
        raise ValueError(f"slab row dim {k8} must be a sublane multiple")
    if not interpret and R % 128:
        raise ValueError(
            f"compiled tmulti requires R % 128 == 0 (flush DMA minor-dim "
            f"tiling), got R={R}")
    slab_w = 2 * C if split else C
    if slabs.shape[2] != slab_w:
        raise ValueError(
            f"slab width {slabs.shape[2]} != expected {slab_w} "
            f"(split={split})")
    if fuse_resplit and k8 % 16:
        raise ValueError(
            f"fuse_resplit requires k8 % 16 == 0 (bf16 staged-flush "
            f"memref tiling), got k8={k8}")
    S = P // U

    def slab_spec(u):
        return pl.BlockSpec(
            (1, k8, slab_w),
            lambda s, pb, pc, u=u: (pc[s * U + u], 0, 0))

    if fuse_resplit:
        out_w = 2 * R if split else R
        stage = pltpu.VMEM((k8, out_w), jnp.bfloat16)
        out_shape = jax.ShapeDtypeStruct((nb, k8, out_w), jnp.bfloat16)
    else:
        stage = pltpu.VMEM((k8, R), jnp.float32)
        out_shape = jax.ShapeDtypeStruct((nb, k8, R), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pb, pc
        grid=(S,),
        in_specs=[
            pl.BlockSpec((U, C2, R), lambda s, pb, pc: (s, 0, 0)),
            *[slab_spec(u) for u in range(U)],
        ],
        # HBM explicitly: untiled leading-dim slices keep the manual
        # flush legal for any k8 (pl.ANY let Mosaic pick VMEM, whose
        # tiled layout rejects it — the round-3 compile failure).
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            *[pltpu.VMEM((k8, R), jnp.float32)
              for _ in range(n_acc)],           # accumulators (probe23)
            stage,                             # DMA staging
            pltpu.SMEM((1,), jnp.int32),       # current block
            pltpu.SMEM((1,), jnp.int32),       # outstanding-copy block
            pltpu.SMEM((1,), jnp.int32),       # outstanding-copy flag
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel_tmulti, U=U, C=C, split=split,
                               fuse_resplit=fuse_resplit, n_acc=n_acc)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(pair_block, pair_chunk, tiles_t, *([slabs] * U))


def _kernel_tmulti_resident(pb_ref, pc_ref, tiles_ref, slabs_ref, *rest,
                            U: int, C: int, split: bool, pair_off: int):
    """Transposed U-pair kernel with the phase's ENTIRE slab window
    resident in VMEM.

    Identical control structure to ``_kernel_tmulti`` (SMEM block
    tracking, staged async flush), but the fat-vector slabs arrive as
    ONE constant-index BlockSpec block ``(cpp, k8, slab_w)`` that Mosaic
    loads exactly once per call, and each pair dynamic-indexes its slab
    on the leading (VMEM-legal) dimension. Removes the per-pair slab
    stream entirely: measured 135 vs 184 ns/pair at the production
    (128, 128) U=16 shape on v5e (results/probe18_resident.json,
    scripts/exp_kernel_probe18.py) — the top round-4 finding, here
    productionized. ``pb_ref``/``pc_ref`` are the FULL phase-major
    scalar arrays; ``pair_off`` (static) is this phase's first pair.
    Block ids and chunk ids are phase-LOCAL (the output is the phase's
    block-range partial; the slab block is the phase's chunk window).
    """
    out_ref, acc, stage, cur, prev, cnt, sem = rest
    s = pl.program_id(0)
    S = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        cur[0] = pb_ref[pair_off]
        cnt[0] = 0
        acc[...] = jnp.zeros(acc.shape, acc.dtype)

    def flush():
        @pl.when(cnt[0] == 1)
        def _():
            pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()
        stage[...] = acc[...]
        pltpu.make_async_copy(stage, out_ref.at[cur[0]], sem).start()
        prev[0] = cur[0]
        cnt[0] = 1
        acc[...] = jnp.zeros(acc.shape, acc.dtype)

    for u in range(U):
        b = pb_ref[pair_off + s * U + u]

        @pl.when(b != cur[0])
        def _(b=b):
            flush()
            cur[0] = b

        t = tiles_ref[u]
        sl = slabs_ref[pc_ref[pair_off + s * U + u]]
        if split:
            acc[...] += (_dot_kc_cr(sl[:, :C], t[:C])
                         + _dot_kc_cr(sl[:, :C], t[C:])
                         + _dot_kc_cr(sl[:, C:], t[:C]))
        else:
            acc[...] += _dot_kc_cr(sl, t)

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


#: probe18's compile envelope: a RESIDENT_SLAB_VMEM_BYTES window +
#: double-buffered U=16 tile stream (2 MB) + scratch compiled and ran
#: under this limit on v5e (the constant-index slab block is
#: single-buffered — Mosaic re-fetches only on index change, and U=32
#: at the same slab size also compiled).
_RESIDENT_VMEM_LIMIT = 14 * 1024 * 1024


def _phase_call(pb, pc, tiles_t, slabs, *, phase, cpp, U, C2, C, k8,
                split, resident, interpret):
    """One phase's pallas_call: (nb_ph, k8, R) f32 block-range partial.

    ``phase`` = (pair_off, n_pairs, chunk_lo, block_lo, nb_ph) — all
    static. ``resident`` selects the constant-index whole-window slab
    block (``_kernel_tmulti_resident``); otherwise the per-pair slab
    streams of ``_kernel_tmulti`` run on the phase's pair range (the
    any-k fallback when the window exceeds the VMEM budget).
    """
    pair_off, n_pairs, chunk_lo, block_lo, nb_ph = phase
    R = tiles_t.shape[2]
    S = n_pairs // U
    base = pair_off // U  # pair_off is a U-multiple by construction
    slab_w = 2 * C if split else C
    tile_spec = pl.BlockSpec(
        (U, C2, R), lambda s, pb_, pc_: (base + s, 0, 0))
    scratch = [
        pltpu.VMEM((k8, R), jnp.float32),
        pltpu.VMEM((k8, R), jnp.float32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SemaphoreType.DMA,
    ]
    if resident:
        # Clamp the window block to the actual chunk count (a single
        # small phase must not allocate the full budget block in VMEM);
        # with more than one phase blk_c == cpp, so chunk_lo divides.
        blk_c = min(cpp, slabs.shape[0])
        ph_idx = chunk_lo // blk_c
        in_specs = [
            tile_spec,
            pl.BlockSpec((blk_c, k8, slab_w),
                         lambda s, pb_, pc_: (ph_idx, 0, 0)),
        ]
        kernel = functools.partial(
            _kernel_tmulti_resident, U=U, C=C, split=split,
            pair_off=pair_off)
        operands = (pb, pc, tiles_t, slabs)
        params = pltpu.CompilerParams(
            vmem_limit_bytes=_RESIDENT_VMEM_LIMIT)
    else:
        def slab_spec(u):
            return pl.BlockSpec(
                (1, k8, slab_w),
                lambda s, pb_, pc_, u=u: (
                    pc_[pair_off + s * U + u] + chunk_lo, 0, 0))

        in_specs = [tile_spec, *[slab_spec(u) for u in range(U)]]
        kernel = functools.partial(
            _kernel_tmulti, U=U, C=C, split=split, pair_off=pair_off)
        operands = (pb, pc, tiles_t, *([slabs] * U))
        params = None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
    )
    kwargs = {} if params is None else {"compiler_params": params}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_ph, k8, R), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(*operands)


@functools.partial(
    jax.jit, static_argnames=("nb", "phases", "chunks_per_phase",
                              "pairs_per_step", "split", "interpret",
                              "force_streamed"))
def windowed_matmul_tmulti_phased(
        pair_block_ph: jax.Array, pair_chunk_ph: jax.Array,
        tiles_t: jax.Array, slabs: jax.Array, *, nb: int,
        phases: tuple, chunks_per_phase: int, pairs_per_step: int = 16,
        split: bool = True, interpret: bool = False,
        force_streamed: bool = False) -> jax.Array:
    """Phased VMEM-resident transposed contraction: slabs in,
    ``(nb, k8, R)`` f32 out.

    The pair list is PHASE-major (``formats/windowed.py::
    build_phase_layout``): pairs grouped by fat-vector chunk window
    ("phase"), block-ascending within a phase, per-phase counts padded
    to a ``pairs_per_step`` multiple, block ids and chunk ids phase-
    LOCAL. Each phase runs one pallas_call whose slab window stays
    resident in VMEM (``_kernel_tmulti_resident``), writing a block-
    range partial ``(nb_ph, k8, R)``; partials are summed by one fused
    pad+add (phases overlap only on boundary-spanning blocks, so the
    extra HBM traffic is ~(1 + overlap) output writes + one read).
    Blocks no phase touches stay zero — empty row blocks need no
    coverage dummies here, unlike the single-list kernels.

    When the actual ``k8`` makes a phase's slab window exceed the VMEM
    budget (the layout was sized for the format's ``k_nominal``), every
    phase falls back to the per-pair streamed kernel — same math, same
    layout, no resident window.
    """
    U = pairs_per_step
    P, C2, R = tiles_t.shape
    C = C2 // 2 if split else C2
    k8 = slabs.shape[1]
    if k8 % 8:
        raise ValueError(f"slab row dim {k8} must be a sublane multiple")
    if not split and tiles_t.dtype == jnp.float32:
        raise ValueError(
            "phased tmulti split=False requires bf16 operands")
    if not interpret and R % 128:
        raise ValueError(
            f"compiled phased tmulti requires R % 128 == 0, got R={R}")
    slab_w = 2 * C if split else C
    if slabs.shape[2] != slab_w:
        raise ValueError(
            f"slab width {slabs.shape[2]} != expected {slab_w} "
            f"(split={split})")
    cpp = chunks_per_phase
    window_bytes = (min(cpp, slabs.shape[0]) * k8 * slab_w
                    * slabs.dtype.itemsize)
    resident = (not force_streamed
                and window_bytes <= RESIDENT_SLAB_VMEM_BYTES)
    parts = []
    for phase in phases:
        buf = _phase_call(
            pair_block_ph, pair_chunk_ph, tiles_t, slabs, phase=phase,
            cpp=cpp, U=U, C2=C2, C=C, k8=k8, split=split,
            resident=resident, interpret=interpret)
        _, _, _, block_lo, nb_ph = phase
        parts.append(jnp.pad(
            buf, ((block_lo, nb - block_lo - nb_ph), (0, 0), (0, 0))))
    out = parts[0]
    for p_ in parts[1:]:
        out = out + p_
    return out


@jax.jit
def resplit_slabs(out_t: jax.Array) -> jax.Array:
    """(nb, k8, R) f32 transposed output -> (nb, k8, 2R) bf16 lane-packed
    hi|lo slabs — the next iterate's input when R == C and the block grid
    equals the chunk grid (square matrices). One fused elementwise pass
    (~2x the array's bytes at HBM rate) replacing the 0.13-0.4 ms
    chunk-transpose relayout of the natural-layout pipeline."""
    hi = out_t.astype(jnp.bfloat16)
    lo = (out_t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=2)


def _step_scalars(pair_block, pair_chunk):
    """Per-step prefetch scalars for the two-pairs-per-step grid."""
    pb2 = pair_block[0::2]
    first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (pb2[1:] != pb2[:-1]).astype(jnp.int32),
    ])
    return pb2, pair_chunk[0::2], pair_chunk[1::2], first


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def windowed_matmul_pallas(pair_block: jax.Array, pair_chunk: jax.Array,
                           tiles: jax.Array, v_pad: jax.Array, *,
                           nb: int, interpret: bool = False) -> jax.Array:
    """Raw fused contraction, single-array-tiles mode: ``(nb, R, k)``.

    ``tiles``: (P, R, C) block-sorted with EVEN per-block runs
    (``WindowedPairs.from_csr`` pads); ``pair_block``: (P,) ascending
    block ids covering every block in [0, nb); ``v_pad``: (pad_rows, k)
    natural-layout fat vector with pad_rows >= n_chunks*C. f32 tiles use
    HIGHEST (6-pass); prefer the split3 path via ``spmm_windowed_pallas``
    for f32 production use.
    """
    P, R, C = tiles.shape
    k = v_pad.shape[1]
    if P % 2:
        # An odd pair count would silently drop the last pair (S = P//2)
        # — a contract violation (even per-block runs) by the caller.
        raise ValueError(
            f"windowed_matmul_pallas requires an even pair count, got "
            f"{P}; pad per-block runs to even length "
            "(WindowedPairs.from_csr pairs_per_step=2 branch)")
    if v_pad.dtype != tiles.dtype:
        v_pad = v_pad.astype(tiles.dtype)
    (v_chunks,) = chunk_slabs(v_pad, C=C, split=False,
                              interpret=interpret)
    pb2, pce, pco, first = _step_scalars(pair_block, pair_chunk)
    S = P // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # pb2, pc_even, pc_odd, first
        grid=(S,),
        in_specs=[
            pl.BlockSpec((2, R, C),
                         lambda s, pb, pce, pco, fr: (s, 0, 0)),
            pl.BlockSpec((1, k, C),
                         lambda s, pb, pce, pco, fr: (pce[s], 0, 0)),
            pl.BlockSpec((1, k, C),
                         lambda s, pb, pce, pco, fr: (pco[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, k),
                               lambda s, pb, pce, pco, fr: (pb[s], 0, 0)),
    )
    kernel = functools.partial(
        _kernel_plain, f32_highest=tiles.dtype == jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        interpret=interpret,
    )(pb2, pce, pco, first, tiles, v_chunks, v_chunks)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def windowed_matmul_split3(pair_block: jax.Array, pair_chunk: jax.Array,
                           tiles_split: jax.Array, v_pad: jax.Array, *,
                           nb: int, interpret: bool = False) -> jax.Array:
    """Raw fused contraction, lane-packed split-bf16 3-pass f32 mode.

    ``tiles_split``: (P, R, 2C) bf16 hi|lo planes
    (``formats/windowed.py::_split_planes``), even per-block runs.
    """
    P, R, C2 = tiles_split.shape
    C = C2 // 2
    k = v_pad.shape[1]
    if P % 2:
        raise ValueError(
            f"windowed_matmul_split3 requires an even pair count, got "
            f"{P}; pad per-block runs to even length "
            "(WindowedPairs.from_csr pairs_per_step=2 branch)")
    (slabs,) = chunk_slabs(v_pad.astype(jnp.float32), C=C, split=True,
                           interpret=interpret)
    pb2, pce, pco, first = _step_scalars(pair_block, pair_chunk)
    S = P // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((2, R, 2 * C),
                         lambda s, pb, pce, pco, fr: (s, 0, 0)),
            pl.BlockSpec((1, k, 2 * C),
                         lambda s, pb, pce, pco, fr: (pce[s], 0, 0)),
            pl.BlockSpec((1, k, 2 * C),
                         lambda s, pb, pce, pco, fr: (pco[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, k),
                               lambda s, pb, pce, pco, fr: (pb[s], 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel_split3, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        interpret=interpret,
    )(pb2, pce, pco, first, tiles_split, slabs, slabs)


def spmm_windowed_pallas(wp: WindowedPairs, v_p: jax.Array, *,
                         interpret: bool | None = None) -> jax.Array:
    """Padded-permuted-space SpMM via the fused kernel (drop-in for
    ``spmm_windowed_xla``): ``(pad_rows, k) -> (pad_rows, k)``, zero
    per-step layout transforms. ``interpret=None`` auto-selects
    interpreter mode on CPU backends.

    f32 operands dispatch to the split3 3-pass kernel when the format
    carries pre-split tile planes and k is sublane-aligned; bf16
    operands use the single-pass DEFAULT dot. Mixed tiles/vector dtypes
    are aligned to the tiles' dtype first — Mosaic's mixed-precision dot
    (bf16 x f32) was observed numerically wrong on v5e (rel err ~0.7).
    """
    from .windowed import _finish

    if interpret is None:
        from ..utils.backend import on_cpu_backend

        interpret = on_cpu_backend()
    R = wp.block_rows
    nb = wp.n_blocks
    k = v_p.shape[1]

    # Mosaic cannot lower the pair dots with a sub-sublane k: bf16 fails
    # verification at k=1 (bf16->f32 vector.broadcast), and the f32
    # matvec reduction in the two-pair kernel fails with "only constant
    # accumulators supported". Unaligned k routes to the XLA path — the
    # measured-faster choice there anyway (results/tpu_kernels.json:
    # 2.5-3.0 ms XLA vs 3.1-4.9 ms for the old one-pair kernels at
    # k=1/6/12 on the cop20k stand-in).
    if k % 8 != 0:
        from .windowed import spmm_windowed_xla

        return spmm_windowed_xla(wp, v_p)
    if wp.pairs_per_step <= 2:
        # Host-side contract audit (format arrays stay host-side numpy
        # until first use): the two-pair kernels require pairs 2s/2s+1
        # to share a row block; a violation would silently corrupt the
        # output (ADVICE r2 #2). Skipped for traced/device arrays —
        # builds via WindowedPairs.from_csr already guarantee it.
        import numpy as np

        pb_host = wp.pair_block
        if isinstance(pb_host, np.ndarray):
            if len(pb_host) % 2 or np.any(pb_host[0::2] != pb_host[1::2]):
                raise ValueError(
                    "two-pair kernel contract violated: per-block pair "
                    "runs must be padded to even length "
                    "(WindowedPairs.from_csr pairs_per_step=2 branch)")
    if wp.pairs_per_step > 2:
        # Transposed-state kernel: the only manual-flush layout whose
        # DMA is tiling-legal on hardware (see _kernel_tmulti). Compiled
        # mode additionally needs R % 128 == 0; otherwise the XLA path
        # is the correct (and measured-competitive) fallback.
        if wp.tiles_t is None or not (interpret
                                      or wp.block_rows % 128 == 0):
            from .windowed import spmm_windowed_xla

            return spmm_windowed_xla(wp, v_p)
        # Split mode follows the planes the BUILD produced, not the tile
        # dtype: an f64-built format has no split planes (tiles_t is a
        # single transposed plane), and inferring split from dtype after
        # an external leaf-level cast to f32 made the kernel read the
        # unsplit tiles_t as hi/lo pairs (round-5 graft-entry failure).
        split = wp.tiles_split is not None
        slab_dtype = jnp.float32 if split else wp.tiles.dtype
        (slabs,) = chunk_slabs(v_p.astype(slab_dtype), C=wp.chunk_cols,
                               split=split, interpret=interpret)
        if wp.phases is not None:
            # tiles_t is phase-major: the VMEM-resident phased kernel
            # is the only correct consumer (and the fast one — 135 vs
            # 184 ns/pair, probe18).
            out_t = windowed_matmul_tmulti_phased(
                wp.pair_block_ph, wp.pair_chunk_ph,
                jnp.asarray(wp.tiles_t), slabs, nb=nb,
                phases=wp.phases, chunks_per_phase=wp.chunks_per_phase,
                pairs_per_step=wp.pairs_per_step, split=split,
                interpret=interpret,
            )  # (nb, k, R)
        else:
            out_t = windowed_matmul_tmulti(
                wp.pair_block, wp.pair_chunk, jnp.asarray(wp.tiles_t),
                slabs, nb=nb, pairs_per_step=wp.pairs_per_step,
                split=split, interpret=interpret,
            )  # (nb, k, R)
        computed = jnp.swapaxes(out_t, 1, 2).reshape(nb * R, k)
        return _finish(wp, computed, v_p)
    if wp.tiles.dtype == jnp.float32 and wp.tiles_split is not None:
        computed = windowed_matmul_split3(
            wp.pair_block, wp.pair_chunk, jnp.asarray(wp.tiles_split),
            v_p, nb=nb, interpret=interpret,
        )
    else:
        if v_p.dtype != wp.tiles.dtype:
            v_p_k = v_p.astype(wp.tiles.dtype)
        else:
            v_p_k = v_p
        computed = windowed_matmul_pallas(
            wp.pair_block, wp.pair_chunk, jnp.asarray(wp.tiles), v_p_k,
            nb=nb, interpret=interpret,
        )  # (nb, R, k)
    return _finish(wp, computed.reshape(nb * R, k), v_p)
