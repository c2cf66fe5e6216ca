#!/usr/bin/env python
"""Host-side structure analysis of the RCM-ordered cop20k stand-in.

Question: at strip granularity (r rows x C cols), how much does tile
inflation shrink vs the current 256x256 tiles, and what spill remains?
Drives the design of the two-level (superblock / strip) windowed kernel.

Run: JAX_PLATFORM_NAME=cpu python scripts/exp_strip_stats.py
"""
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.reorder import rcm_ordering
from sparsematrixmultiplicationmpi_tpu.io.generate import cop20k_like

csr = cop20k_like(dtype="float32")
m, n = csr.shape
coo = csr.to_coo()
i0 = np.asarray(coo.row_indices).astype(np.int64)
j0 = np.asarray(coo.col_indices).astype(np.int64)
perm = rcm_ordering(csr)
inv = np.empty(m, dtype=np.int64)
inv[perm] = np.arange(m)
i, j = inv[i0], inv[j0]
nnz = len(i)
print(f"m={m} nnz={nnz} mean_row={nnz/m:.1f}")

# Row-cluster spread: bandwidth after RCM
bw = np.abs(i - j)
print(f"|i-j|: p50={np.percentile(bw,50):.0f} p90={np.percentile(bw,90):.0f} "
      f"p99={np.percentile(bw,99):.0f} max={bw.max()}")

itemsize = 4
for r in (8, 16, 32, 64, 256):
    for C in (128, 256, 512):
        key = (i // r) * ((n + C - 1) // C) + (j // C)
        uniq, counts = np.unique(key, return_counts=True)
        P = len(uniq)
        tile_bytes = P * r * C * itemsize
        # spill if strips below an occupancy threshold t spill to gather:
        line = (f"r={r:3d} C={C:3d}: strips={P:7d} bytes={tile_bytes/1e6:7.0f}MB "
                f"infl={tile_bytes/(nnz*itemsize):5.1f}x")
        for t in (1, 4, 16, 64):
            sp = counts[counts < t].sum()
            line += f" | spill(<{t})={sp/nnz*100:4.1f}%"
        print(line, flush=True)

# pairs at superblock level (slab loads) for strip kernels
for R_super in (256, 512):
    for C in (128, 256, 512):
        key = (i // R_super) * ((n + C - 1) // C) + (j // C)
        pairs = len(np.unique(key))
        slab_mb = pairs * C * 32 * itemsize / 1e6
        print(f"R_super={R_super} C={C}: pairs={pairs} slab_traffic(k=32)="
              f"{slab_mb:.0f}MB")
