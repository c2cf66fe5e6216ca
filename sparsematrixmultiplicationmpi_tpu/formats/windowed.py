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
directly onto a Pallas kernel whose grid walks pairs while revisiting the
output block (``ops/pallas_windowed.py``).

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

__all__ = ["WindowedPairs", "windowed_cost_estimate"]

#: Measured TPU v5e constants driving the dense/spill split (CLAUDE.md
#: "Measured TPU v5e facts" + round-2 kernel probes,
#: scripts/exp_kernel_probe*.py): XLA row gather ~4.8 ns/row regardless of
#: width; streaming at ~819 GB/s HBM bandwidth; each tile additionally
#: pays a fixed per-matmul/per-DMA-step overhead (~350 ns in the Pallas
#: block-run kernel, ~650 ns as an XLA batched einsum element) that makes
#: small tiles overhead-bound — the cost model sizes tiles so streaming
#: and overhead balance.
HBM_BW = 819e9
GATHER_S_PER_ROW = 4.8e-9
TILE_OVERHEAD_S = 350e-9


def _pair_cost_s(R: int, C: int, itemsize: int, k_nominal: int) -> float:
    """Cost of one dense tile: max(streaming, fixed per-tile overhead)
    plus its fat-vector slab traffic."""
    stream = (R * C * itemsize + C * k_nominal * 4) / HBM_BW
    return max(stream, TILE_OVERHEAD_S)


def _pair_counts(i, j, R: int, C: int, n_chunks: int):
    """Unique (row-block, column-chunk) pairs with nnz counts."""
    key = (i // R).astype(np.int64) * n_chunks + (j // C).astype(np.int64)
    uniq, inverse, counts = np.unique(
        key, return_inverse=True, return_counts=True
    )
    return key, uniq, inverse, counts


def windowed_cost_estimate(i, j, m: int, n: int, R: int, C: int,
                           itemsize: int, k_nominal: int = 32):
    """Estimated per-SpMM seconds for tile size (R, C) with the optimal
    dense/spill threshold, plus the threshold and tile stats.

    est = dense_pairs * pair_stream_cost + spill_nnz * gather_cost
          + output write. Pure host-side numpy (build-time only).
    """
    n_chunks = -(-n // C)
    _, uniq, _, counts = _pair_counts(i, j, R, C, n_chunks)
    pair_cost = _pair_cost_s(R, C, itemsize, k_nominal)
    threshold = pair_cost / GATHER_S_PER_ROW  # nnz above which dense wins
    dense = counts > threshold
    spill_nnz = int(counts[~dense].sum())
    est = (int(dense.sum()) * pair_cost
           + spill_nnz * GATHER_S_PER_ROW
           + m * k_nominal * 4 / HBM_BW)
    return est, threshold, dense, uniq, counts


#: Window-count class edges: row blocks are grouped by how many dense
#: tiles they own and padded up to the class edge, so each class is one
#: dense ``(n_blocks_c, nw_c, R, C)`` einsum operand — no segment-sum, no
#: scatter anywhere in the compute path. Geometric-ish edges bound the
#: padding waste at ~25% worst-case, ~10% typical.
CLASS_EDGES = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)


def build_dense_pairs(i, j, vals, m: int, n: int, R: int, C: int,
                      itemsize: int, k_nominal: int = 32):
    """Identify above-threshold (row-block, column-chunk) tiles and
    materialize them, block-sorted.

    Returns ``(pb_raw, pc_raw, tiles_raw, spill_idx)`` where ``pb_raw``/
    ``pc_raw``/``tiles_raw`` are the P_raw dense tiles in ascending
    (block, chunk) order and ``spill_idx`` indexes the entries of
    ``(i, j, vals)`` that fall below the dense threshold. Shared by
    ``WindowedPairs.from_csr`` (class packing on top) and the row-sharded
    distributed strategy (device-range splitting on top).
    """
    n_chunks = -(-n // C)
    _, uniq, _, counts = _pair_counts(i, j, R, C, n_chunks)
    pair_cost = _pair_cost_s(R, C, itemsize, k_nominal)
    dense = counts > pair_cost / GATHER_S_PER_ROW

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


@_register
@dataclasses.dataclass(frozen=True)
class WindowedPairs:
    """Class-packed flat list of dense (R, C) tiles plus bucketed-ELL
    spill.

    ``tiles[p, r, c]`` holds the entry at permuted coordinates
    ``(block_of(p)*R + r, pair_chunk[p]*C + c)``. Pairs are sorted by
    (window-count class, block) and each block's run is padded with zero
    tiles to its class edge, so

    * class ``c`` occupies ``tiles[class_start_c :]`` reshapeable to
      ``(n_blocks_c, nw_c, R, C)`` — one batched MXU einsum per class;
    * each computed block is one contiguous pair run (what the Pallas
      kernel walks via ``block_ptr``).

    ``block_ids[i]`` is the actual (permuted-space) row-block id of
    computed block slot ``i``; ``inv_block_pos[b]`` maps row block ``b``
    to its slot (or to the trailing zero slot when the block has no dense
    tiles). ``perm`` is the optional symmetric permutation applied at
    build time (``perm[k]`` = original index at permuted position ``k``).
    """

    tiles: jax.Array                # (P_padded, R, C)
    pair_chunk: jax.Array           # (P_padded,) int32 (pad pairs -> 0)
    block_ptr: jax.Array            # (nb_occ + 1,) int32 pair run bounds
    block_ids: jax.Array            # (nb_occ,) int32
    inv_block_pos: jax.Array        # (nb,) int32 in [0, nb_occ]
    spill: Optional[BucketedELL]
    perm: Optional[jax.Array]       # (m,) int32 or None
    inv_perm: Optional[jax.Array]   # (m,) int32 or None
    shape: Tuple[int, int] = _static_field()
    block_rows: int = _static_field()
    chunk_cols: int = _static_field()
    #: ((n_blocks_c, nw_c), ...) per class, concatenated in tile order.
    class_shapes: Tuple[Tuple[int, int], ...] = _static_field()
    est_seconds: float = _static_field()  # cost-model estimate (k=32)

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
    def dense_bytes(self) -> int:
        return int(self.tiles.size) * self.tiles.dtype.itemsize

    def astype(self, dtype) -> "WindowedPairs":
        return dataclasses.replace(
            self,
            tiles=self.tiles.astype(dtype),
            spill=None if self.spill is None else self.spill.astype(dtype),
        )

    # ---- permuted-space iteration protocol ---------------------------
    # encode once -> iterate many -> decode once: an iterative consumer
    # pays the boundary permutes once, not per multiply.
    def encode(self, v: jax.Array) -> jax.Array:
        """Map a fat vector into the operand's (permuted) column space."""
        if self.perm is None:
            return v
        return jnp.take(v, self.perm, axis=0)

    def decode(self, out_p: jax.Array) -> jax.Array:
        """Map a permuted-space result back to original row order."""
        if self.inv_perm is None:
            return out_p
        return jnp.take(out_p, self.inv_perm, axis=0)

    def iterate(self, v_p: jax.Array) -> jax.Array:
        """Permuted-space SpMM (the chainable hot body)."""
        from ..ops.windowed import spmm_windowed_core

        return spmm_windowed_core(self, v_p)

    def __matmul__(self, v):
        from ..ops.windowed import spmm_windowed

        return spmm_windowed(self, v)

    # ---- construction -------------------------------------------------
    @classmethod
    def from_csr(cls, csr: CSR, *, block_rows: Optional[int] = None,
                 chunk_cols: Optional[int] = None,
                 reorder: str | None = "auto",
                 candidates=((64, 256), (128, 256), (256, 256),
                             (128, 512), (256, 512), (512, 512),
                             (64, 128), (8, 128), (16, 128), (32, 128)),
                 k_nominal: int = 32,
                 max_inflation: float = 96.0,
                 beat_gather_margin: float = 0.8
                 ) -> Optional["WindowedPairs"]:
        """Build windowed storage; returns ``None`` when no tile
        configuration beats the pure gather path by ``beat_gather_margin``
        (caller falls back to a gather format).

        ``candidates`` are (R, C) tile shapes (ints mean R with C=128);
        ``block_rows``/``chunk_cols`` pin one or both dimensions.
        ``reorder="auto"`` applies RCM when the matrix is square and the
        reordered tiling estimates cheaper; ``None`` disables.
        """
        m, n = csr.shape
        if m == 0 or csr.nnz == 0:
            return None
        itemsize = np.asarray(csr.values).dtype.itemsize

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
        if not tile_shapes and block_rows is not None:
            tile_shapes = [(int(block_rows), int(chunk_cols or 128))]

        coo = csr.to_coo()
        i0 = np.asarray(coo.row_indices).astype(np.int64)
        j0 = np.asarray(coo.col_indices).astype(np.int64)
        vals = np.asarray(coo.values)

        # Candidate orderings: as-given, plus RCM for square matrices.
        orderings = [(None, i0, j0)]
        if reorder == "auto" and m == n:
            from .reorder import rcm_ordering

            perm = rcm_ordering(csr)
            inv = np.empty(m, dtype=np.int64)
            inv[perm] = np.arange(m)
            orderings.append((perm, inv[i0], inv[j0]))

        gather_est = csr.nnz * GATHER_S_PER_ROW  # pure-ELL estimate
        best = None
        for perm, i, j in orderings:
            for R, C_cand in tile_shapes:
                est, threshold, dense, uniq, counts = windowed_cost_estimate(
                    i, j, m, n, R, C_cand, itemsize, k_nominal
                )
                tile_bytes = int(dense.sum()) * R * C_cand * itemsize
                if tile_bytes > max_inflation * csr.nnz * itemsize:
                    continue
                if best is None or est < best[0]:
                    best = (est, R, C_cand, perm, i, j, dense, uniq, counts)
        if best is None:
            return None
        est, R, C, perm, i, j, dense, uniq, counts = best
        if est > beat_gather_margin * gather_est or not dense.any():
            return None

        n_chunks = -(-n // C)
        key = (i // R).astype(np.int64) * n_chunks + (j // C).astype(np.int64)
        # Map each nnz to its pair id (position in the sorted unique keys).
        pair_of_entry = np.searchsorted(uniq, key)
        dense_ids = np.nonzero(dense)[0]
        remap = np.full(len(uniq), -1, dtype=np.int64)
        remap[dense_ids] = np.arange(len(dense_ids))
        p_entry = remap[pair_of_entry]
        in_dense = p_entry >= 0

        # Raw pairs, ascending by (block, chunk) — uniq is sorted.
        pb_raw = (uniq[dense_ids] // n_chunks).astype(np.int64)
        pc_raw = (uniq[dense_ids] % n_chunks).astype(np.int64)
        P_raw = len(dense_ids)
        nb = max(-(-m // R), 1)

        # Class packing: group row blocks by tile count, pad each block's
        # run to its class edge (zero tiles, chunk 0) so every class is
        # one dense einsum operand and every block is one contiguous run.
        counts_per_block = np.bincount(pb_raw, minlength=nb)
        occ_blocks = np.nonzero(counts_per_block)[0]
        nw_occ = counts_per_block[occ_blocks]
        edges = list(CLASS_EDGES)
        while nw_occ.max() > edges[-1]:
            edges.append(edges[-1] * 2)
        edges_arr = np.asarray(edges)
        block_cls = np.searchsorted(edges_arr, nw_occ)  # edge >= nw
        order = np.lexsort((occ_blocks, block_cls))
        block_ids = occ_blocks[order].astype(np.int32)
        cls_sorted = block_cls[order]
        run_len = edges_arr[cls_sorted]
        block_ptr = np.concatenate(
            [[0], np.cumsum(run_len)]).astype(np.int32)
        P = int(block_ptr[-1])
        nb_occ = len(block_ids)
        uniq_cls, cls_counts = np.unique(cls_sorted, return_counts=True)
        class_shapes = tuple(
            (int(cnt), int(edges_arr[c]))
            for c, cnt in zip(uniq_cls, cls_counts)
        )

        # Destination slot of each raw pair: its block's run start plus
        # its rank within the block (raw pairs are block-contiguous).
        pos_of_block = np.full(nb, nb_occ, dtype=np.int64)
        pos_of_block[block_ids] = np.arange(nb_occ)
        raw_starts = np.concatenate(
            [[0], np.cumsum(counts_per_block[occ_blocks])])
        rank_within = np.arange(P_raw) - np.repeat(
            raw_starts[:-1], counts_per_block[occ_blocks])
        dest = block_ptr[pos_of_block[pb_raw]] + rank_within

        pair_chunk = np.zeros(P, dtype=np.int32)
        pair_chunk[dest] = pc_raw
        tiles = np.zeros((P, R, C), dtype=vals.dtype)
        tiles[dest[p_entry[in_dense]], i[in_dense] % R,
              j[in_dense] % C] = vals[in_dense]
        inv_block_pos = np.full(nb, nb_occ, dtype=np.int32)
        inv_block_pos[block_ids] = np.arange(nb_occ, dtype=np.int32)

        # Honest estimate update: padding tiles stream too.
        est = est + (P - P_raw) * _pair_cost_s(R, C, itemsize, k_nominal)
        if est > beat_gather_margin * gather_est:
            return None

        spill = None
        if (~in_dense).any():
            from .matrix import COO

            spill_coo = COO.from_arrays(
                vals[~in_dense], i[~in_dense], j[~in_dense], (m, n)
            )
            # Off-tile stragglers are short rows: fine-grained bucket
            # widths cut padded gather rows (gather is per-row-bound).
            spill = BucketedELL.from_csr(
                spill_coo.to_csr(), width_align=4, max_buckets=12
            )

        inv_perm = None
        if perm is not None:
            inv_perm = np.empty(m, dtype=np.int32)
            inv_perm[perm] = np.arange(m, dtype=np.int32)
            perm = perm.astype(np.int32)
        return cls(
            tiles=tiles, pair_chunk=pair_chunk, block_ptr=block_ptr,
            block_ids=block_ids, inv_block_pos=inv_block_pos,
            spill=spill, perm=perm, inv_perm=inv_perm,
            shape=(m, n), block_rows=R, chunk_cols=C,
            class_shapes=class_shapes, est_seconds=float(est),
        )

    def to_dense(self) -> jax.Array:
        """Dense (original-order) reconstruction — test/debug only."""
        m, n = self.shape
        R, C = self.block_rows, self.chunk_cols
        tiles = np.asarray(self.tiles)
        ptr = np.asarray(self.block_ptr).astype(np.int64)
        bids = np.asarray(self.block_ids).astype(np.int64)
        pc = np.asarray(self.pair_chunk).astype(np.int64)
        nb = self.n_blocks
        n_chunks = -(-n // C)
        out = np.zeros((nb * R, n_chunks * C), dtype=tiles.dtype)
        for pos, b in enumerate(bids):
            for p in range(ptr[pos], ptr[pos + 1]):
                out[b * R:(b + 1) * R,
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
