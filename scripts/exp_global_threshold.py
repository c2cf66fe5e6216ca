#!/usr/bin/env python
"""Host-side global dense/spill split optimization for WindowedPairs.

The round-1 cost model thresholds each tile independently
(``formats/windowed.py::windowed_cost_estimate``), ignoring that ANY
nonzero spill pays a fixed restore cost (~0.3-0.45 ms measured: the
bucketed-ELL inverse-permutation take over m rows, probe11 wa2 = 0.86 ms
total for 114k slots where the slot-gather alone models at 0.55 ms).

This probe computes, per tile shape, the exact total-cost curve over the
dense/spill threshold INCLUDING the fixed restore term, plus the
zero-spill endpoint (every nonempty tile dense). Pure numpy, runs on CPU.

Run: JAX_PLATFORM_NAME=cpu PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/exp_global_threshold.py
"""
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.reorder import rcm_ordering
from sparsematrixmultiplicationmpi_tpu.formats.windowed import (
    GATHER_S_PER_ROW, SPILL_RESTORE_S_PER_ROW, TILE_OVERHEAD_S,
    TILE_STREAM_BW,
)
from sparsematrixmultiplicationmpi_tpu.io.generate import cop20k_like

SPILL_SLOT_S = GATHER_S_PER_ROW
K = 32

csr = cop20k_like(dtype="float32")
m, n = csr.shape
perm = rcm_ordering(csr)
inv = np.empty(m, dtype=np.int64)
inv[perm] = np.arange(m)
coo = csr.to_coo()
i = inv[np.asarray(coo.row_indices).astype(np.int64)]
j = inv[np.asarray(coo.col_indices).astype(np.int64)]
nnz = len(i)
print(f"cop20k_like m={m} nnz={nnz} (RCM applied)")

for R, C in [(256, 256), (256, 128), (128, 128), (128, 256),
             (512, 256), (64, 128), (512, 128), (8, 128), (16, 128),
             (32, 128), (64, 256)]:
    n_chunks = -(-n // C)
    key = (i // R) * n_chunks + (j // C)
    uniq, counts = np.unique(key, return_counts=True)
    pair_cost = TILE_OVERHEAD_S + (R * C * 4 + C * K * 4) / TILE_STREAM_BW
    # Sort tiles by count descending; prefix t tiles dense, rest spill.
    order = np.argsort(-counts)
    cs = counts[order]
    spill_after = np.concatenate([cs[::-1].cumsum()[::-1], [0]])
    # total(t) = t*pair_cost + spill_nnz(t)*slot + (spill>0)*restore
    t_axis = np.arange(len(cs) + 1)
    spill_nnz = spill_after[np.minimum(t_axis, len(cs))]
    total = (t_axis * pair_cost + spill_nnz * SPILL_SLOT_S
             + (spill_nnz > 0) * m * SPILL_RESTORE_S_PER_ROW)
    best_t = int(np.argmin(total))
    zs_t = len(cs)   # zero-spill endpoint
    gbytes = lambda t: t * R * C * 4 / 1e9
    print(f"({R:3d},{C:3d}) tiles={len(cs):6d} "
          f"best: t={best_t:6d} cost={total[best_t]*1e3:7.3f}ms "
          f"tiles={gbytes(best_t):5.2f}GB spill={spill_nnz[best_t]:7d} | "
          f"zerospill: cost={total[zs_t]*1e3:7.3f}ms "
          f"tiles={gbytes(zs_t):5.2f}GB | "
          f"thresh_count={cs[best_t-1] if best_t else 0}")
