"""Deterministic operand generators.

``generate_fat_vector`` mirrors the reference's ``generateLargeFatVector``
(``Source Code/utils.cpp:193-209``): an ``n x k`` dense matrix of integers
1..100 stored as floats. The reference never seeds ``rand()`` so its stream
is the fixed default-seed C stream; we use an explicit seed for the same
observable property (bit-identical operands across runs).

Synthetic sparse matrices stand in for the SuiteSparse fixtures the reference
benchmarks on (``scripts/batch_test.sh:15-37``) — this environment has no
network, so matrices with matched dims/nnz/structure are generated instead:

* ``random_csr`` — uniform scatter (amazon0302-like in density profile)
* ``banded_csr`` — FEM-style banded (FEM_3D_thermal1 / cop20k_A-like locality)
* ``powerlaw_csr`` — skewed row-degree (dc1 / web-graph-like) — the fixture
  class that motivates the non-zero-element (load-balanced) strategy
* ``cop20k_like`` — symmetric, 121,192^2, ~2.62 M nnz to match the headline
  benchmark matrix's stats (``report/425500_Report.tex:687``)
"""

from __future__ import annotations

import numpy as np

from ..formats.matrix import CSR
from .mtx import expand_and_build_csr

__all__ = [
    "generate_fat_vector",
    "random_csr",
    "banded_csr",
    "powerlaw_csr",
    "cop20k_like",
    "cage4_like",
]


def generate_fat_vector(n: int, k: int, seed: int = 0, dtype=np.float64):
    """Dense ``n x k`` fat vector of integers 1..100 (``utils.cpp:203``)."""
    rng = np.random.default_rng(seed)
    return rng.integers(1, 101, size=(n, k)).astype(dtype)


def _dedupe_build(rows, cols, vals, m, n, symmetric=False) -> CSR:
    # Deduplicate coordinates (keep first occurrence) then build CSR.
    key = rows.astype(np.int64) * n + cols.astype(np.int64)
    _, idx = np.unique(key, return_index=True)
    return expand_and_build_csr(
        rows[idx], cols[idx], vals[idx], m, n, symmetric=symmetric
    )


def random_csr(m: int, n: int, nnz: int, seed: int = 0,
               dtype=np.float64) -> CSR:
    """Uniformly scattered nonzeros (approximately ``nnz`` after dedupe)."""
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, size=nnz)
    cols = rng.integers(0, n, size=nnz)
    vals = rng.uniform(-1.0, 1.0, size=nnz).astype(dtype)
    return _dedupe_build(rows, cols, vals, m, n)


def banded_csr(m: int, bandwidth: int, nnz_per_row: int, seed: int = 0,
               dtype=np.float64) -> CSR:
    """FEM-like: nonzeros clustered in a band around the diagonal."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(m), nnz_per_row)
    offsets = rng.integers(-bandwidth, bandwidth + 1, size=rows.size)
    cols = np.clip(rows + offsets, 0, m - 1)
    vals = rng.uniform(-1.0, 1.0, size=rows.size).astype(dtype)
    return _dedupe_build(rows, cols, vals, m, m)


def powerlaw_csr(m: int, n: int, nnz: int, alpha: float = 1.5,
                 seed: int = 0, dtype=np.float64) -> CSR:
    """Skewed row-degree distribution (Zipf-like) — a few very dense rows.

    This is the load-imbalance regime where the reference's row-wise strategy
    loses to its non-zero-element strategy
    (``SparseMatrixFatVectorMultiplyNonZeroElement.cpp:24-39``'s rationale).
    """
    rng = np.random.default_rng(seed)
    # Zipf row weights -> multinomial draw of per-row counts.
    weights = 1.0 / np.arange(1, m + 1, dtype=np.float64) ** alpha
    weights /= weights.sum()
    row_ids = rng.permutation(m)  # detach degree rank from row index
    counts = rng.multinomial(nnz, weights)
    rows = row_ids[np.repeat(np.arange(m), counts)]
    cols = rng.integers(0, n, size=rows.size)
    vals = rng.uniform(-1.0, 1.0, size=rows.size).astype(dtype)
    return _dedupe_build(rows, cols, vals, m, n)


def cop20k_like(seed: int = 0, dtype=np.float64,
                scale: float = 1.0) -> CSR:
    """Synthetic stand-in for cop20k_A: symmetric 121,192^2, ~2.62 M nnz.

    Structure: banded + random off-band entries, symmetrized — similar row
    lengths (mean ~21.7 nnz/row) to the real accelerator-physics matrix.
    ``scale`` < 1 shrinks both dims and nnz for smoke tests.
    """
    m = max(int(121_192 * scale), 16)
    target_half = int(2_624_331 * scale) // 2
    rng = np.random.default_rng(seed)
    n_band = int(target_half * 0.8)
    rows_b = rng.integers(0, m, size=n_band)
    offs = rng.integers(1, 200, size=n_band)
    cols_b = np.minimum(rows_b + offs, m - 1)
    rows_r = rng.integers(0, m, size=target_half - n_band)
    cols_r = rng.integers(0, m, size=target_half - n_band)
    rows = np.concatenate([rows_b, rows_r, np.arange(m)])
    cols = np.concatenate([cols_b, cols_r, np.arange(m)])
    lower = rows < cols  # keep lower triangle convention: swap
    rows2 = np.where(lower, cols, rows)
    cols2 = np.where(lower, rows, cols)
    vals = rng.uniform(-1.0, 1.0, size=rows2.size).astype(dtype)
    key = rows2.astype(np.int64) * m + cols2.astype(np.int64)
    _, idx = np.unique(key, return_index=True)
    return expand_and_build_csr(
        rows2[idx], cols2[idx], vals[idx], m, m, symmetric=True
    )


def cage4_like(dtype=np.float64) -> CSR:
    """9x9, 49-nnz smoke-test matrix with the cage4 fixture's shape/density.

    (The real cage4 from SuiteSparse is the reference's smoke fixture,
    ``scripts/batch_test.sh:15``; this synthetic twin has identical dims and
    nnz count with a deterministic pattern.)
    """
    rng = np.random.default_rng(4)
    m = 9
    rows = np.repeat(np.arange(m), m)
    cols = np.tile(np.arange(m), m)
    keep_diag = rows == cols
    score = rng.permutation(m * m)
    score[keep_diag.nonzero()[0]] = -1  # force diagonal in
    idx = np.argsort(score)[:49]
    vals = rng.uniform(0.1, 1.0, size=49).astype(dtype)
    return expand_and_build_csr(rows[idx], cols[idx], vals, m, m, False)
