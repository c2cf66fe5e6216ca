"""Windowed tile-pair storage — the general MXU-native sparse format.

Round 1's ``BandedBlocks`` (``formats/banded.py``) densifies a fixed
3-block diagonal window, which works only for matrices whose nonzeros hug
the diagonal. Real FEM matrices — the reference's headline cop20k_A class
(``report/425500_Report.tex:687``) — have a *hollow* band after
bandwidth-reducing reordering: each row couples to a near-diagonal cluster
plus clusters at ± one mesh plane (O(m^(2/3)) away), so a contiguous
window either misses most nonzeros or explodes in size.

This format generalizes the idea: the matrix is cut into ``R x C`` tiles
(``R`` = block_rows, ``C`` = chunk_cols), and every tile that holds enough
nonzeros to beat the measured XLA gather cost (~5 ns per gathered row on
TPU v5e, independent of width — the "spill gather wall" of round 1) is
stored *dense* as one ``(R, C)`` tile in a flat pair list:

    tiles[p]       : (R, C) dense values
    pair_block[p]  : which row block  (sorted ascending)
    pair_chunk[p]  : which column chunk

SpMM is then ``out[pair_block[p]] += tiles[p] @ v[pair_chunk[p]*C :][:C]``
— pure MXU matmuls over contiguous fat-vector slabs, zero per-nonzero
gathers, zero scatters, static shapes. Tiles below the cost threshold
spill to the bucketed-ELL gather path, which the cost model keeps tiny on
mesh-structured matrices (<1 % of nnz on the cop20k stand-in).

The flat pair list (instead of per-block window arrays) means **no
padding at all** across the skewed per-block window counts, and maps
directly onto an auto-pipelined Pallas block-sparse kernel whose grid
walks the pair list, revisiting each row block's accumulator across its
contiguous pair run (``ops/pallas_windowed.py``). Every row block holds
at least one pair (otherwise-empty blocks get one dummy zero tile at
build time), so the kernel's output is fully covered — no post-pass
gather or masking.

An optional symmetric permutation (RCM by default for square matrices —
``formats/reorder.py``) is applied at build time and carried in the
operand; ``encode``/``iterate``/``decode`` expose the permuted-space
multiply so iterative consumers (solvers, PageRank, the amortized
benchmark) pay the boundary permutes once, exactly as the reference's
PETSc yardstick "wins because it never regathers"
(``report/425500_Report.tex:1092-1095``).

Replaces the reference's row-wise/non-zero-element hot loops
(``SparseMatrixFatVectorMultiplyRowWise.cpp:36-50``,
``...NonZeroElement.cpp:54-67``) with an MXU-first design.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .matrix import BucketedELL, CSR, _register, _static_field

__all__ = ["WindowedPairs", "windowed_cost_estimate", "windowed_wins",
           "DEFAULT_CANDIDATES"]

#: Default (R, C) tile-shape candidates for the build-time cost search.
DEFAULT_CANDIDATES = ((64, 256), (128, 256), (256, 256),
                      (128, 512), (256, 512), (512, 512),
                      (64, 128), (128, 128), (256, 128),
                      (8, 128), (16, 128), (32, 128))

#: Measured TPU v5e constants driving the dense/spill split (CLAUDE.md
#: "Measured TPU v5e facts" + round-2 kernel measurements,
#: scripts/exp_kernel_probe10.py, probe13): XLA row gather ~4.8 ns/row
#: regardless of width; raw elementwise streaming ~819 GB/s. The
#: auto-pipelined Pallas kernel is MXU/overhead-bound, modeled per-pair
#: as a fixed step cost plus tile+slab bytes at an effective rate.
#: Production lane-packed split-bf16 3-pass f32 kernel, fit over the
#: probe14 shape sweep (580.5/926.2 ns at (256,256)/(512,256)):
#: ~191 ns fixed + ~758 GB/s marginal. (Separate hi/lo streams fit
#: 190 ns + 615 GB/s, probe13; the retired 6-pass HIGHEST kernel
#: 114 ns + 455 GB/s, probe10.) ADDITIVE, so small tiles are
#: overhead-bound and the cost model sizes tiles to balance coverage
#: against the fixed cost.
HBM_BW = 819e9
#: Re-measured 2026-08-19 on the round-4 chip/runtime: 1.53-1.57 ns/row
#: in two independent runs (scripts/check_cost_constants.py,
#: results/cost_constants_check.json) vs the round-1 4.8. The cop20k
#: dense/spill split is insensitive to the change (zero spill either
#: way — the fixed m-row restore dominates marginal decisions).
GATHER_S_PER_ROW = 1.6e-9
TILE_OVERHEAD_S = 191e-9
TILE_STREAM_BW = 758e9
#: Kernel generation new builds target: 2 = two-pair kernel with even
#: per-block runs; >2 = transposed U-pair kernel
#: (``ops/pallas_windowed.py::windowed_matmul_tmulti``), global tail pad
#: only. FLIPPED to 16 from real-v5e probe17 (2026-08-19,
#: results/probe17_tmulti.json): (128,128) U=16 measured 1.458 ms on the
#: cop20k stand-in vs 2.754 ms for the shipped U=2 split3 — 1.89x.
#: U=32 regresses (2.18 ms: 32 double-buffered slab streams blow the
#: VMEM budget).
PRODUCTION_PAIRS_PER_STEP = 16
#: tmulti cost-model constants, fit on probe17's U=8/16 points at
#: (128,128) with the streamed-bytes term held at TILE_STREAM_BW
#: (reproduces both measured per-pair costs to 0.1 ns; U=4 is
#: overestimated — harmless, production is 16):
#:   cost/pair = TMULTI_STEP_S/U + TMULTI_PAIR_S + bytes/TILE_STREAM_BW
TMULTI_STEP_S = 77e-9
#: Deliberately NOT refit after the round-5 acc2 adoption: the shipped
#: two-accumulator kernel's marginal pair cost at (128,128) measured
#: ~5-13 ns (probe23 1.292 ms / probe24 1.144 ms, ~11 % chip spread),
#: but this constant is shape-blind and is precisely what keeps the
#: search off fine tiles, whose measured per-pair cost is 185-200 ns
#: (probe18: compute does NOT hide behind the thinner DMA streams
#: there). Lowering it to the (128,128)-only value would re-admit
#: shapes measured 1.4-1.8x slower; the ~10 % absolute overestimate at
#: the production shape is the price of a safe relative ordering.
TMULTI_PAIR_S = 29e-9
#: Per-output-row cost of a nonzero spill: the bucketed-ELL restore take
#: over m rows plus the full-size add (419 us measured at m=121k, k=32 —
#: scripts/exp_kernel_probe13.py ``scat`` — i.e. ~3.5 ns/row; a 23k-row
#: scatter-add alternative measured slower at 573 us).
SPILL_RESTORE_S_PER_ROW = 3.5e-9
#: Auto-search refuses tilings whose optimal split spills more than this
#: fraction of nnz. Measured bracket (round-5 threshold ladder,
#: results/auto_threshold_tpu.json): a 54 %-spill build WINS vs gather
#: (1.47 vs 2.17 ms, rung 0.55) while a 74 %-spill build LOSES 2.1x
#: (8.74 vs 4.08 ms, rung 0.75); every family windowed wins in the
#: round-4 sweep keeps spill <= 22 %. The boundary is placed between
#: the two measured rungs. Callers pinning ``block_rows`` bypass the
#: guard (explicit spill-path tests/probes).
SPILL_FRAC_REFUSE = 0.65
#: Sub-sublane fat vectors (k % 8 != 0) at least this wide are zero-
#: padded to the next sublane multiple and run through the Pallas kernel
#: (Mosaic cannot lower unaligned dots); narrower k takes the XLA path.
#: Consumed by ``ops/windowed.py::spmm_windowed_core`` and the
#: distributed ``_local_windowed`` dispatch; the cost model below prices
#: the padded slab traffic accordingly. Re-tune against
#: scripts/exp_kpad_windowed.py when hardware numbers land.
KPAD_MIN_K = 12
#: Densification memory guards (v5e HBM = 16 GB; U>2 f32 builds hold
#: tiles + tiles_split + tiles_t, so the true host footprint is ~3x
#: the tile array — 2x for bf16/U<=2). Below ``DENSE_BYTES_ALLOWANCE``
#: the DEFAULT ``max_inflation`` RATIO is not enforced — the cost model
#: already prices the streamed bytes, and on tiny-nnz diffuse matrices
#: (roadnet class: 6 MB of nnz) a 197x ratio is a harmless 1.2 GB that
#: measured 8x faster than every gather path. A caller-SUPPLIED
#: ``max_inflation`` is strict (an explicit memory bound must bound
#: memory — ADVICE r4 #3). ``DENSE_BYTES_HARD_CAP`` always binds (a
#: ratio-passing 100M-nnz build could otherwise OOM).
DENSE_BYTES_ALLOWANCE = 2_000_000_000
DENSE_BYTES_HARD_CAP = 6_000_000_000
#: VMEM budget for one phase's resident fat-vector slab window
#: (``ops/pallas_windowed.py::_kernel_tmulti_resident``). probe18's
#: envelope: a 7 MB window + the double-buffered U=16 tile stream
#: compiled and ran under a 14 MB limit on v5e — the constant-index
#: window block is single-buffered.
RESIDENT_SLAB_VMEM_BYTES = 7 * 1024 * 1024


def _split_planes(tiles):
    """Lane-packed bf16 ``hi|lo`` split of an f32 tile array — (P, R, 2C)
    with ``hi`` in columns [:C] and ``lo`` in [C:] — or None for other
    dtypes. ``hi + lo`` reconstructs ``tiles`` to ~16-17 mantissa bits
    (~4e-6 relative: the f32 residual is exact, its bf16 storage rounds
    once more). Packing both planes in ONE array keeps the Pallas kernel
    at two input streams — measured 5-15 % faster than separate hi/lo
    streams (probe14 vs probe13). Works on numpy or jax inputs, stays
    host-side for numpy (format constructors keep arrays host-side per
    CLAUDE.md)."""
    if tiles.dtype != np.float32 and tiles.dtype != jnp.float32:
        return None
    if isinstance(tiles, np.ndarray):
        from .native_split import split_bf16_hilo_native

        native = split_bf16_hilo_native(tiles)
        if native is not None:
            return native
        import ml_dtypes

        hi = tiles.astype(ml_dtypes.bfloat16)
        lo = (tiles - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return np.concatenate([hi, lo], axis=-1)
    hi = tiles.astype(jnp.bfloat16)
    lo = (tiles - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=-1)


def _tiles_t(tiles, tiles_split):
    """Transposed tile operand for the tmulti kernel
    (``ops/pallas_windowed.py::windowed_matmul_tmulti``): (P, 2C, R)
    bf16 sublane-packed hi/lo for f32 data (hi planes on sublanes [:C],
    lo on [C:] — the lane-packed split transposed), or (P, C, R) plain
    transposed tiles for bf16 data. Host-side numpy stays host-side."""
    src = tiles_split if tiles_split is not None else tiles
    if isinstance(src, np.ndarray):
        return np.ascontiguousarray(src.swapaxes(1, 2))
    return jnp.swapaxes(src, 1, 2)


def build_phase_layout(pb, pc, nb: int, n_chunks: int, cpp: int, U: int):
    """Phase-major reordering of a (padded, block-major) pair list for
    the VMEM-resident kernel (``ops/pallas_windowed.py::
    windowed_matmul_tmulti_phased``).

    Pairs are grouped by fat-vector chunk window ("phase" ``pc // cpp``
    — ``cpp`` chunks per phase sized so one phase's slabs fit the VMEM
    budget), block-ascending within each phase. Per phase, row blocks
    inside its touched block range with no pair get a dummy zero pair
    (the kernel only flushes blocks it visits, and the phase's partial
    output buffer covers the whole range), and the phase's pair count
    is padded to a ``U`` multiple. Deterministic pure function of
    ``(pb, pc)`` — ``astype`` re-derives the same layout to re-gather
    the transposed planes.

    Returns ``(pb_ph, pc_ph, src, phases)``: phase-LOCAL block and
    chunk ids (int32), ``src`` mapping each phase-major slot to its
    input pair index (-1 for dummies, int64), and a static tuple of
    per-phase ``(pair_offset, n_pairs, chunk_lo, block_lo, nb_ph)``
    records. Empty phases (chunk windows no pair touches) are skipped —
    the combine leaves their blocks' contribution zero.
    """
    pb = np.asarray(pb, dtype=np.int64)
    pc = np.asarray(pc, dtype=np.int64)
    ph = pc // cpp
    order = np.lexsort((pc, pb, ph))
    ph_sorted = ph[order]
    nph_max = int(ph_sorted[-1]) + 1
    bounds = np.searchsorted(ph_sorted, np.arange(nph_max + 1))
    pb_out, pc_out, src_out, phases = [], [], [], []
    offset = 0
    for p in range(nph_max):
        s, e = bounds[p], bounds[p + 1]
        if s == e:
            continue
        sel = order[s:e]
        lpb = pb[sel]
        lpc = pc[sel] - p * cpp
        blo, bhi = int(lpb.min()), int(lpb.max())
        present = np.zeros(bhi - blo + 1, dtype=bool)
        present[lpb - blo] = True
        holes = np.nonzero(~present)[0] + blo
        gb = np.concatenate([lpb, holes])
        gc = np.concatenate([lpc, np.zeros(len(holes), np.int64)])
        gs = np.concatenate([sel, np.full(len(holes), -1, np.int64)])
        o2 = np.argsort(gb, kind="stable")
        gb, gc, gs = gb[o2], gc[o2], gs[o2]
        pad = (-len(gb)) % U
        if pad:
            gb = np.concatenate([gb, np.full(pad, bhi, np.int64)])
            gc = np.concatenate([gc, np.zeros(pad, np.int64)])
            gs = np.concatenate([gs, np.full(pad, -1, np.int64)])
        phases.append((offset, len(gb), p * cpp, blo, bhi - blo + 1))
        offset += len(gb)
        pb_out.append(gb - blo)
        pc_out.append(gc)
        src_out.append(gs)
    return (np.concatenate(pb_out).astype(np.int32),
            np.concatenate(pc_out).astype(np.int32),
            np.concatenate(src_out),
            tuple(phases))


def _chunks_per_phase(C: int, itemsize: int, k_nominal: int) -> int:
    """Chunks per resident phase for the VMEM budget: one chunk's slab
    is ``k8 x slab_w`` bf16 (lane-packed hi|lo for f32 data, single
    plane for bf16)."""
    k8 = -(-max(k_nominal, 8) // 8) * 8
    slab_w = 2 * C if itemsize == 4 else C
    return max(int(RESIDENT_SLAB_VMEM_BYTES // (k8 * slab_w * 2)), 1)


def _phase_fields(tiles, tiles_split, pair_block, pair_chunk, nb: int,
                  n_chunks: int, cpp: int, U: int):
    """(tiles_t phase-major, pb_ph, pc_ph, phases) for a U>2 format:
    the transposed bf16 planes gathered into the phase-major order
    (dummies zero). Host-side numpy."""
    pb_ph, pc_ph, src, phases = build_phase_layout(
        np.asarray(pair_block), np.asarray(pair_chunk), nb, n_chunks,
        cpp, U)
    base = tiles_split if tiles_split is not None else tiles
    base = np.asarray(base)
    g = base[np.where(src >= 0, src, 0)]
    g[src < 0] = 0
    tiles_t = np.ascontiguousarray(g.swapaxes(1, 2))
    return tiles_t, pb_ph, pc_ph, phases


def _pair_cost_s(R: int, C: int, itemsize: int, k_nominal: int,
                 pairs_per_step: int = 2) -> float:
    """Cost of one dense tile: fixed overheads plus tile and
    fat-vector-slab bytes at the measured kernel streaming rate.

    U <= 2 (two-pair kernel, probe14 fit): per-step fixed cost
    ``2*TILE_OVERHEAD_S`` split across the step's two pairs. U > 2
    (transposed kernel, probe17 fit): per-step ``TMULTI_STEP_S`` divided
    by U plus a per-pair issue cost ``TMULTI_PAIR_S`` (scalar-core work
    per dynamic slab fetch + dots — the binding constant for fine
    tiles).

    Sub-sublane ``k_nominal`` >= ``KPAD_MIN_K`` is priced at the padded
    width the kernel actually streams (the k-pad route)."""
    k_eff = k_nominal
    if k_nominal % 8 and k_nominal >= KPAD_MIN_K:
        k_eff = -(-k_nominal // 8) * 8
    # Tile bytes: R*C*itemsize (f32 ships as two bf16 planes = same
    # bytes; bf16 ships one). Slab bytes scale the same way: bf16 hi|lo
    # lane-packed for f32 data (k*2C*2 = k*C*itemsize), single bf16
    # plane for bf16 data.
    stream = (R * C + C * k_eff) * itemsize / TILE_STREAM_BW
    if pairs_per_step > 2:
        return (TMULTI_STEP_S / pairs_per_step + TMULTI_PAIR_S
                + stream)
    return TILE_OVERHEAD_S * 2 / pairs_per_step + stream


def _pair_counts(i, j, R: int, C: int, n_chunks: int):
    """Unique (row-block, column-chunk) pairs with nnz counts."""
    key = (i // R).astype(np.int64) * n_chunks + (j // C).astype(np.int64)
    uniq, inverse, counts = np.unique(
        key, return_inverse=True, return_counts=True
    )
    return key, uniq, inverse, counts


def windowed_cost_estimate(i, j, m: int, n: int, R: int, C: int,
                           itemsize: int, k_nominal: int = 32,
                           pairs_per_step: int = 2,
                           allow_spill: bool = True):
    """Estimated per-SpMM seconds for tile size (R, C) with the GLOBAL
    optimal dense/spill split, plus the count threshold and tile stats.
    ``allow_spill=False`` forces every nonempty tile dense (spill-free
    builds — e.g. formats that must stay transposed-chain eligible).

    Tiles are sorted by nnz count; the exact total-cost curve over "top
    t tiles dense, rest spills" is minimized:

        total(t) = t * pair_stream_cost + spill_nnz(t) * gather_cost
                   + [spill_nnz(t) > 0] * m * restore_cost + output write

    The fixed m-row spill-restore term means the optimum sometimes lands
    at zero spill (every nonempty tile dense) — a per-tile marginal rule
    can never choose that. Pure host-side numpy (build-time only).
    """
    n_chunks = -(-n // C)
    _, uniq, _, counts = _pair_counts(i, j, R, C, n_chunks)
    pair_cost = _pair_cost_s(R, C, itemsize, k_nominal, pairs_per_step)
    order = np.argsort(-counts, kind="stable")
    cs = counts[order]
    spill_after = np.concatenate([cs[::-1].cumsum()[::-1], [0]])
    t_axis = np.arange(len(cs) + 1)
    totals = (t_axis * pair_cost
              + spill_after * GATHER_S_PER_ROW
              + (spill_after > 0) * m * SPILL_RESTORE_S_PER_ROW)
    best_t = int(np.argmin(totals)) if allow_spill else len(cs)
    est = float(totals[best_t]) + m * k_nominal * 4 / HBM_BW
    dense = np.zeros(len(counts), dtype=bool)
    dense[order[:best_t]] = True
    threshold = float(cs[best_t - 1]) if best_t else np.inf
    return est, threshold, dense, uniq, counts


def build_dense_pairs(i, j, vals, m: int, n: int, R: int, C: int,
                      itemsize: int, k_nominal: int = 32,
                      pairs_per_step: int = 2):
    """Identify above-threshold (row-block, column-chunk) tiles and
    materialize them, block-sorted.

    Returns ``(pb_raw, pc_raw, tiles_raw, spill_idx)`` where ``pb_raw``/
    ``pc_raw``/``tiles_raw`` are the P_raw dense tiles in ascending
    (block, chunk) order and ``spill_idx`` indexes the entries of
    ``(i, j, vals)`` that fall below the dense threshold. Shared by
    ``WindowedPairs.from_csr`` (block-run pointers on top) and the
    row-sharded distributed strategy (device-range splitting on top).

    ``(i, j)`` must be duplicate-free (``coalesce_coo``): the dense-tile
    scatter assigns, so a duplicate coordinate would overwrite instead
    of accumulate.
    """
    n_chunks = -(-n // C)
    _, _, dense, uniq, counts = windowed_cost_estimate(
        i, j, m, n, R, C, itemsize, k_nominal, pairs_per_step)

    key = (i // R).astype(np.int64) * n_chunks + (j // C).astype(np.int64)
    pair_of_entry = np.searchsorted(uniq, key)
    dense_ids = np.nonzero(dense)[0]
    remap = np.full(len(uniq), -1, dtype=np.int64)
    remap[dense_ids] = np.arange(len(dense_ids))
    p_entry = remap[pair_of_entry]
    in_dense = p_entry >= 0

    P_raw = len(dense_ids)
    tiles_raw = np.zeros((P_raw, R, C), dtype=vals.dtype)
    tiles_raw[p_entry[in_dense], i[in_dense] % R, j[in_dense] % C] = \
        vals[in_dense]
    pb_raw = (uniq[dense_ids] // n_chunks).astype(np.int64)
    pc_raw = (uniq[dense_ids] % n_chunks).astype(np.int64)
    return pb_raw, pc_raw, tiles_raw, np.nonzero(~in_dense)[0]


def _search_tilings(csr: "CSR", i0, j0, *, block_rows=None,
                    chunk_cols=None, reorder="auto",
                    candidates=DEFAULT_CANDIDATES, k_nominal: int = 32,
                    max_inflation: Optional[float] = None,
                    beat_gather_margin: float = 0.8,
                    pairs_per_step: int = 2,
                    gather_baseline_s: Optional[float] = None,
                    allow_spill: bool = True):
    """Cost-model search over tile shapes x orderings (host-side numpy).

    Returns the winning ``(est, R, C, perm, i, j, dense, uniq, counts)``
    tuple, or ``None`` when no configuration beats the gather-path
    baseline by ``beat_gather_margin`` (or no tile clears the dense
    threshold) — the caller then falls back to a gather format.

    ``gather_baseline_s`` is the seconds-per-SpMM the caller's actual
    gather alternative would cost (``ops/auto.py::
    gather_class_estimates``); default is the legacy optimistic
    ``nnz * GATHER_S_PER_ROW``. The distinction matters on diffuse
    high-m matrices (roadnet class): the legacy baseline is ~4-10x
    rosier than any real gather path there, so the gate refused tilings
    that beat every real alternative by 8x (round-4 TPU sweep: windowed
    9.9 ms vs the COO fallback's 80 ms).
    """
    m, n = csr.shape
    itemsize = np.asarray(csr.values).dtype.itemsize
    # None = default ratio with the small-matrix byte allowance; an
    # explicit caller value is a strict memory bound (ADVICE r4 #3).
    ratio_cap = 96.0 if max_inflation is None else float(max_inflation)
    allowance = DENSE_BYTES_ALLOWANCE if max_inflation is None else 0

    tile_shapes = []
    for cand in candidates:
        r_c = (cand, 128) if isinstance(cand, int) else tuple(cand)
        r_cand, c_cand = r_c
        if block_rows is not None:
            r_cand = int(block_rows)
        if chunk_cols is not None:
            c_cand = int(chunk_cols)
        if c_cand % 128:
            raise ValueError(
                f"chunk_cols must be a multiple of 128, got {c_cand}")
        if r_cand % 8 or r_cand > max(m, 8):
            continue
        if (r_cand, c_cand) not in tile_shapes:
            tile_shapes.append((r_cand, c_cand))
    if pairs_per_step > 2 and block_rows is None:
        # U>2 formats run the transposed kernel, whose compiled flush
        # DMA needs R % 128 == 0; an auto-searched sub-128 R would
        # silently fall back to the XLA path on hardware. Prefer
        # kernel-eligible shapes, but keep the caller's list when none
        # qualify (tiny matrices / explicit candidate sets — the
        # dispatch falls back correctly).
        eligible = [(r, c) for r, c in tile_shapes if r % 128 == 0]
        if eligible:
            tile_shapes = eligible
    if not tile_shapes and block_rows is not None:
        tile_shapes = [(int(block_rows), int(chunk_cols or 128))]

    # Candidate orderings: as-given, plus RCM for square matrices.
    orderings = [(None, i0, j0)]
    if reorder == "auto" and m == n:
        from .reorder import rcm_ordering

        perm = rcm_ordering(csr)
        inv = np.empty(m, dtype=np.int64)
        inv[perm] = np.arange(m)
        orderings.append((perm, inv[i0], inv[j0]))

    gather_est = (gather_baseline_s if gather_baseline_s is not None
                  else csr.nnz * GATHER_S_PER_ROW)
    best = None
    for perm, i, j in orderings:
        for R, C_cand in tile_shapes:
            est, _, dense, uniq, counts = windowed_cost_estimate(
                i, j, m, n, R, C_cand, itemsize, k_nominal,
                pairs_per_step, allow_spill=allow_spill,
            )
            # Re-price a NONTRIVIAL spill with the calibrated gather
            # surface: the linear 1.6 ns/entry inside the split is a
            # best-case constant, and on mixed band+scatter structure
            # it underestimates the spill's bucketed-ELL cost several-
            # fold (round-5 hardware ladder, results/
            # auto_threshold_tpu.json: windowed measured 8.7 ms where
            # the linear est said 1.9 at band coverage 0.26). The split
            # itself stays linear (its optimum is insensitive at small
            # spill); only the accept/route estimate pays the measured
            # price. 1.6x is the scattered-spill slot inflation under
            # width_align=2 (between uniform 1.37x and dc1 1.84x,
            # results/gather_calib3.json records).
            spill_nnz = int(counts[~dense].sum())
            if spill_nnz > 0.05 * max(csr.nnz, 1):
                from ..ops.auto import _calibrated_gather_seconds

                est += (_calibrated_gather_seconds(
                    "ell", int(spill_nnz * 1.6), m, k_nominal)
                    - spill_nnz * GATHER_S_PER_ROW)
            # Spill-majority guard (see SPILL_FRAC_REFUSE): when the
            # optimal split spills most of the matrix, windowed is the
            # wrong CLASS and the linear spill term misses several-fold.
            # Auto-search only — a caller pinning block_rows (spill-path
            # tests, probes) builds what it asks.
            if (block_rows is None
                    and spill_nnz > SPILL_FRAC_REFUSE * max(csr.nnz, 1)):
                continue
            tile_bytes = int(dense.sum()) * R * C_cand * itemsize
            if tile_bytes > DENSE_BYTES_HARD_CAP:
                continue
            if (tile_bytes > ratio_cap * csr.nnz * itemsize
                    and tile_bytes > allowance):
                continue
            if best is None or est < best[0]:
                best = (est, R, C_cand, perm, i, j, dense, uniq, counts)
    if best is None:
        return None
    if best[0] > beat_gather_margin * gather_est or not best[6].any():
        return None
    return best


def windowed_wins(csr: "CSR", **search_kwargs) -> bool:
    """Cheap build-time probe: would ``WindowedPairs.from_csr`` return a
    format (i.e. some tiling beats the pure gather path)? Used by the
    Auto strategy's mesh routing to decide windowed vs gather sharding
    without materializing tiles."""
    m, _ = csr.shape
    if m == 0 or csr.nnz == 0:
        return False
    coo = csr.to_coo()
    i0 = np.asarray(coo.row_indices).astype(np.int64)
    j0 = np.asarray(coo.col_indices).astype(np.int64)
    return _search_tilings(csr, i0, j0, **search_kwargs) is not None


@_register
@dataclasses.dataclass(frozen=True)
class WindowedPairs:
    """Flat block-ascending list of dense (R, C) tiles plus bucketed-ELL
    spill.

    ``tiles[p, r, c]`` holds the entry at permuted coordinates
    ``(pair_block[p]*R + r, pair_chunk[p]*C + c)``. Pairs are sorted by
    (block, chunk), so each row block's tiles are one contiguous run
    ``tiles[block_ptr[b]:block_ptr[b+1]]``; every block's run is
    non-empty (build inserts a dummy zero tile into empty blocks so the
    Pallas kernel's revisited output covers all of them).
    ``perm`` is the optional symmetric permutation
    applied at build time (``perm[k]`` = original index at permuted
    position ``k``).

    The iterate protocol works in *padded permuted* space: ``encode``
    returns a ``(pad_rows, k)`` fat vector (zero tail), ``iterate`` maps
    ``(pad_rows, k) -> (pad_rows, k)``, and ``decode`` slices off the tail
    and undoes the permutation — so a chained consumer pays no per-step
    layout transforms at all.
    """

    tiles: jax.Array                # (P, R, C)
    pair_chunk: jax.Array           # (P,) int32
    pair_block: jax.Array           # (P,) int32, ascending
    block_ptr: jax.Array            # (nb + 1,) int32 pair run bounds
    #: Lane-packed bf16 hi|lo split of f32 tiles (``hi + lo`` ~ tiles to
    #: ~4e-6 relative): the 3-pass Pallas kernel's tile operand
    #: (``ops/pallas_windowed.py``). None for non-f32 data.
    tiles_split: Optional[jax.Array]  # (P, R, 2C) bf16
    spill: Optional[BucketedELL]
    perm: Optional[jax.Array]       # (m,) int32 or None
    inv_perm: Optional[jax.Array]   # (m,) int32 or None
    shape: Tuple[int, int] = _static_field()
    block_rows: int = _static_field()
    chunk_cols: int = _static_field()
    est_seconds: float = _static_field()  # cost-model estimate (k=32)
    #: Pairs per Pallas grid step the build padded for. 2 = legacy
    #: even-run padding (two-pair kernel); >2 = global tail pad only
    #: (U-pair scratch-accumulator kernel, ops/pallas_windowed.py::
    #: windowed_matmul_tmulti).
    pairs_per_step: int = _static_field(default=2)
    #: Transposed tile operand for the U-pair transposed-state kernel
    #: (``windowed_matmul_tmulti``): (P, 2C, R) bf16 sublane-packed
    #: hi/lo split for f32 data, (P, C, R) for bf16. Built only for
    #: ``pairs_per_step > 2`` formats (``_tiles_t``); None otherwise.
    #: PHASE-major order when ``phases`` is set (``build_phase_layout``)
    #: — consume via ``windowed_matmul_tmulti_phased`` with the ``_ph``
    #: id arrays, never with ``pair_block``/``pair_chunk``.
    tiles_t: Optional[jax.Array] = None
    #: Phase-major layout for the VMEM-resident kernel
    #: (``ops/pallas_windowed.py::windowed_matmul_tmulti_phased``),
    #: built for kernel-eligible U>2 formats (R % 128 == 0): phase-LOCAL
    #: block/chunk ids matching ``tiles_t``'s order, the static
    #: per-phase ``(pair_offset, n_pairs, chunk_lo, block_lo, nb_ph)``
    #: records, and the chunk window width one resident phase covers
    #: (sized for ``k_nominal`` at build; a wider runtime k falls back
    #: to the per-phase streamed kernel inside the phased wrapper).
    pair_block_ph: Optional[jax.Array] = None
    pair_chunk_ph: Optional[jax.Array] = None
    phases: Optional[tuple] = _static_field(default=None)
    chunks_per_phase: int = _static_field(default=0)

    @property
    def dtype(self):
        return self.tiles.dtype

    @property
    def n_pairs(self) -> int:
        return int(self.tiles.shape[0])

    @property
    def n_blocks(self) -> int:
        return -(-self.shape[0] // self.block_rows)

    @property
    def n_chunks(self) -> int:
        return -(-self.shape[1] // self.chunk_cols)

    @property
    def pad_rows(self) -> int:
        """Row count of the padded permuted space the iterate protocol
        lives in: covers both the chunk grid (inputs) and the block grid
        (outputs) and is a chunk multiple (the Pallas kernel views the
        fat vector as ``(pad_rows/C, C, k)`` and DMAs whole chunks —
        leading-dim indexing, the only slicing Mosaic allows on HBM
        without 128-lane alignment), so square chained iterations are
        copy-free."""
        C = self.chunk_cols
        raw = max(self.n_chunks * C, self.n_blocks * self.block_rows)
        return -(-raw // C) * C

    @property
    def dense_bytes(self) -> int:
        return int(self.tiles.size) * self.tiles.dtype.itemsize

    def astype(self, dtype) -> "WindowedPairs":
        tiles = self.tiles.astype(dtype)
        split = _split_planes(tiles)
        tiles_t = pb_ph = pc_ph = None
        phases = None
        if self.pairs_per_step > 2:
            if self.phases is not None:
                # Re-derive the same phase layout (pure function of the
                # block-major ids) and re-gather the new dtype's planes.
                # ``chunks_per_phase`` is kept from the build: for
                # bf16 -> f32 the doubled slab width can exceed the VMEM
                # budget, which the phased wrapper detects and serves
                # with the streamed per-phase kernel.
                tiles_t, pb_ph, pc_ph, phases = _phase_fields(
                    np.asarray(tiles), None if split is None
                    else np.asarray(split),
                    self.pair_block, self.pair_chunk,
                    self.n_blocks, self.n_chunks,
                    self.chunks_per_phase, self.pairs_per_step)
            else:
                tiles_t = _tiles_t(tiles, split)
        return dataclasses.replace(
            self,
            tiles=tiles, tiles_split=split,
            tiles_t=tiles_t, pair_block_ph=pb_ph, pair_chunk_ph=pc_ph,
            phases=phases,
            spill=None if self.spill is None else self.spill.astype(dtype),
        )

    # ---- padded-permuted-space iteration protocol --------------------
    # encode once -> iterate many -> decode once: an iterative consumer
    # pays the boundary permute/pad once, not per multiply.
    def encode(self, v: jax.Array) -> jax.Array:
        """Map a fat vector into the operand's padded permuted column
        space: ``(n, k) -> (pad_rows, k)`` with a zero tail."""
        if self.perm is not None:
            v = jnp.take(v, self.perm, axis=0)
        pad = self.pad_rows - v.shape[0]
        if pad > 0:
            v = jnp.concatenate(
                [v, jnp.zeros((pad, v.shape[1]), v.dtype)], axis=0)
        return v

    def decode(self, out_p: jax.Array) -> jax.Array:
        """Map a padded permuted-space result back to original row
        order: slice the pad tail, undo the permutation."""
        out_p = out_p[: self.shape[0]]
        if self.inv_perm is None:
            return out_p
        return jnp.take(out_p, self.inv_perm, axis=0)

    def iterate(self, v_p: jax.Array) -> jax.Array:
        """Permuted-space SpMM (the chainable hot body)."""
        from ..ops.windowed import spmm_windowed_core

        return spmm_windowed_core(self, v_p)

    @property
    def supports_transposed_chain(self) -> bool:
        """Whether the zero-relayout transposed-state chain applies
        (``ops/windowed.py::windowed_t_chain``): U-pair transposed
        kernel built, square block/chunk grids (the kernel's (nb, k, R)
        output IS the next step's slab grid), and no spill (the spill
        restore needs natural-layout rows)."""
        return (self.pairs_per_step > 2
                and self.tiles_t is not None
                and self.spill is None
                and self.block_rows == self.chunk_cols
                and self.n_blocks == self.n_chunks)

    def __matmul__(self, v):
        from ..ops.windowed import spmm_windowed

        return spmm_windowed(self, v)

    # ---- construction -------------------------------------------------
    @classmethod
    def from_csr(cls, csr: CSR, *, block_rows: Optional[int] = None,
                 chunk_cols: Optional[int] = None,
                 reorder: str | None = "auto",
                 candidates=DEFAULT_CANDIDATES,
                 k_nominal: int = 32,
                 max_inflation: Optional[float] = None,
                 beat_gather_margin: float = 0.8,
                 pairs_per_step: Optional[int] = None,
                 gather_baseline_s: Optional[float] = None,
                 allow_spill: bool = True,
                 phase_layout: bool = False,
                 ) -> Optional["WindowedPairs"]:
        """Build windowed storage; returns ``None`` when no tile
        configuration beats the pure gather path by ``beat_gather_margin``
        (caller falls back to a gather format).

        ``candidates`` are (R, C) tile shapes (ints mean R with C=128);
        ``block_rows``/``chunk_cols`` pin one or both dimensions.
        ``reorder="auto"`` applies RCM when the matrix is square and the
        reordered tiling estimates cheaper; ``None`` disables.
        ``max_inflation`` (dense bytes / nnz bytes ratio): ``None`` =
        default 96x with the small-matrix ``DENSE_BYTES_ALLOWANCE``; an
        explicit value binds strictly.
        ``pairs_per_step`` (default ``PRODUCTION_PAIRS_PER_STEP``) selects
        the Pallas kernel generation the padding targets: 2 = even
        per-block runs (two-pair kernel), >2 = global tail pad only
        (U-pair scratch-accumulator kernel).
        ``phase_layout`` opts a kernel-eligible U>2 build into the
        phase-major VMEM-resident layout. Default OFF: measured on the
        full cop20k stand-in, the resident kernel is NOT faster — the
        per-pair dynamic-index cost exceeds the slab bytes it saves
        (slab streams are ~free: 0.10 ms for all 16 streams,
        results/probe22_streams.json), and the phase combine/dummies
        add ~2.5 % (probe19). probe18's -27 % slice result was an
        anomalous baseline, falsified at production scale
        (results/probe19_phased.json, probe20, probe21, probe22).
        """
        if pairs_per_step is None:
            pairs_per_step = PRODUCTION_PAIRS_PER_STEP
        if not isinstance(pairs_per_step, int) or pairs_per_step < 2:
            # A value < 2 would skip BOTH padding branches yet still
            # dispatch to the two-pair kernel — the odd-run silent-
            # corruption class (ADVICE r2 #3).
            raise ValueError(
                f"pairs_per_step must be an int >= 2, got "
                f"{pairs_per_step!r}")
        m, n = csr.shape
        if m == 0 or csr.nnz == 0:
            return None
        itemsize = np.asarray(csr.values).dtype.itemsize

        coo = csr.to_coo()
        i0 = np.asarray(coo.row_indices).astype(np.int64)
        j0 = np.asarray(coo.col_indices).astype(np.int64)
        vals = np.asarray(coo.values)
        from .matrix import coalesce_coo

        i0, j0, vals = coalesce_coo(i0, j0, vals, n)

        best = _search_tilings(
            csr, i0, j0, block_rows=block_rows, chunk_cols=chunk_cols,
            reorder=reorder, candidates=candidates, k_nominal=k_nominal,
            max_inflation=max_inflation,
            beat_gather_margin=beat_gather_margin,
            pairs_per_step=pairs_per_step,
            gather_baseline_s=gather_baseline_s,
            allow_spill=allow_spill,
        )
        if best is None:
            return None
        est, R, C, perm, i, j, dense, uniq, counts = best

        n_chunks = -(-n // C)
        key = (i // R).astype(np.int64) * n_chunks + (j // C).astype(np.int64)
        # Map each nnz to its pair id (position in the sorted unique keys).
        pair_of_entry = np.searchsorted(uniq, key)
        dense_ids = np.nonzero(dense)[0]
        remap = np.full(len(uniq), -1, dtype=np.int64)
        remap[dense_ids] = np.arange(len(dense_ids))
        p_entry = remap[pair_of_entry]
        in_dense = p_entry >= 0

        # Pairs ascending by (block, chunk) — uniq is sorted.
        pb_raw = (uniq[dense_ids] // n_chunks).astype(np.int64)
        pc_raw = (uniq[dense_ids] % n_chunks).astype(np.int64)
        nb = max(-(-m // R), 1)

        # Final padded layout computed UP FRONT so the (potentially
        # multi-GB) tile array is allocated once and scattered into once
        # — the append-and-resort assembly it replaces made four full
        # copies and dominated build time (cop20k: 23.8 s -> see
        # git history for the measurement). Per block b the final run
        # length f_b adds: a dummy zero tile when the block is empty
        # (coverage guarantee — the Pallas kernels only write blocks
        # they visit), an even-run pad at pairs_per_step == 2 (the
        # two-pair kernel's output BlockSpec forbids a step spanning
        # blocks — measured 22 % faster at +11 % zero-tile pad,
        # probe15), and at pairs_per_step > 2 only a global tail pad on
        # the last block (the U-pair scratch-accumulator kernel lets
        # steps span blocks).
        c_b = np.bincount(pb_raw, minlength=nb)
        f_b = np.where(c_b == 0, 1, c_b)
        if pairs_per_step == 2:
            f_b = f_b + f_b % 2
        tail_pad = int((-f_b.sum()) % pairs_per_step) \
            if pairs_per_step > 2 else 0
        P_final = int(f_b.sum()) + tail_pad
        O_b = np.concatenate([[0], np.cumsum(c_b)[:-1]])
        F_b = np.concatenate([[0], np.cumsum(f_b)[:-1]])
        # Real pair at sorted position q (block b, k-th in block) lands
        # at F_b + k; pads fill [F_b + c_b, F_b + f_b) with zero tiles
        # referencing chunk 0.
        final_of_pair = np.arange(len(pb_raw)) + (F_b - O_b)[pb_raw]
        pair_block = np.repeat(np.arange(nb, dtype=np.int32),
                               f_b.astype(np.int64))
        if tail_pad:
            pair_block = np.concatenate(
                [pair_block, np.full(tail_pad, nb - 1, np.int32)])
        pair_chunk = np.zeros(P_final, dtype=np.int32)
        pair_chunk[final_of_pair] = pc_raw
        tiles = np.zeros((P_final, R, C), dtype=vals.dtype)
        tiles[final_of_pair[p_entry[in_dense]], i[in_dense] % R,
              j[in_dense] % C] = vals[in_dense]

        block_ptr = np.searchsorted(
            pair_block, np.arange(nb + 1)).astype(np.int32)

        spill = None
        if (~in_dense).any():
            from .matrix import COO

            spill_coo = COO.from_arrays(
                vals[~in_dense], i[~in_dense], j[~in_dense], (m, n)
            )
            # Off-tile stragglers are short rows: fine-grained bucket
            # widths cut padded gather rows (gather is per-row-bound;
            # width_align=2 measured 0.14 ms faster than 4 on the cop20k
            # spill, scripts/exp_kernel_probe11.py).
            spill = BucketedELL.from_csr(
                spill_coo.to_csr(), width_align=2, max_buckets=16
            )

        inv_perm = None
        if perm is not None:
            inv_perm = np.empty(m, dtype=np.int32)
            inv_perm[perm] = np.arange(m, dtype=np.int32)
            perm = perm.astype(np.int32)
        split = _split_planes(tiles)
        tiles_t = pb_ph = pc_ph = None
        phases = None
        cpp = 0
        if pairs_per_step > 2:
            if phase_layout and R % 128 == 0:
                # Opt-in phase-major transposed planes for the
                # VMEM-resident kernel (single phase when the whole
                # slab array fits the budget). See the docstring note:
                # measured slower than the block-major streamed kernel
                # at production scale, so never the default.
                cpp = _chunks_per_phase(C, itemsize, k_nominal)
                tiles_t, pb_ph, pc_ph, phases = _phase_fields(
                    tiles, split, pair_block, pair_chunk, nb, n_chunks,
                    cpp, pairs_per_step)
            else:
                tiles_t = _tiles_t(tiles, split)
        return cls(
            tiles=tiles, pair_chunk=pair_chunk, pair_block=pair_block,
            block_ptr=block_ptr, tiles_split=split,
            tiles_t=tiles_t, pair_block_ph=pb_ph, pair_chunk_ph=pc_ph,
            phases=phases, chunks_per_phase=cpp,
            spill=spill, perm=perm, inv_perm=inv_perm,
            shape=(m, n), block_rows=R, chunk_cols=C,
            est_seconds=float(est), pairs_per_step=pairs_per_step,
        )

    def to_dense(self) -> jax.Array:
        """Dense (original-order) reconstruction — test/debug only."""
        m, n = self.shape
        R, C = self.block_rows, self.chunk_cols
        tiles = np.asarray(self.tiles)
        pb = np.asarray(self.pair_block).astype(np.int64)
        pc = np.asarray(self.pair_chunk).astype(np.int64)
        nb = self.n_blocks
        n_chunks = -(-n // C)
        out = np.zeros((nb * R, n_chunks * C), dtype=tiles.dtype)
        for p in range(len(pb)):
            out[pb[p] * R:(pb[p] + 1) * R,
                pc[p] * C:(pc[p] + 1) * C] += tiles[p]
        out = out[:m, :n]
        if self.spill is not None:
            out = out + np.asarray(self.spill.to_dense())
        if self.perm is not None:
            perm = np.asarray(self.perm).astype(np.int64)
            unperm = np.zeros_like(out)
            unperm[np.ix_(perm, perm)] = out
            out = unperm
        return jnp.asarray(out)
