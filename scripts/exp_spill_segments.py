#!/usr/bin/env python
"""Host-side: can the windowed spill use segment-aligned ELL?

Current spill path (``BucketedELL``) bins rows by width, which forces a
restore ``take`` over ALL m rows (~0.58 ms at 4.8 ns/row on v5e) — a
fixed tax on any nonzero spill. Alternative: keep rows in natural
(permuted) order, cut them into segments of SEG consecutive rows, give
each segment a width class (power-of-2-ish >= its max row width), batch
the gather+reduce per class, and restore at SEGMENT granularity (a take
over m/SEG rows of SEG*k floats — BW-bound, ~0.04 ms).

Cost comparison per the measured constants: slots * 4.8 ns + restore.
This script reports the slot inflation of segment alignment on the real
production spill (cop20k_like, RCM, auto-chosen tiling).

Run: JAX_PLATFORM_NAME=cpu PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/exp_spill_segments.py
"""
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import cop20k_like

GATHER = 4.8e-9
RESTORE_BUCKETED = 0.45e-3

csr = cop20k_like(dtype="float32")
wp = WindowedPairs.from_csr(csr)
sp = wp.spill
m = wp.shape[0]
print(f"tiling R={wp.block_rows} C={wp.chunk_cols} P={wp.n_pairs} "
      f"tiles={wp.dense_bytes/1e6:.0f}MB")
if sp is None:
    print("no spill")
    raise SystemExit

# Reconstruct per-row spill widths in permuted row order via row_perm
# (concatenated bucket-row order -> original row id; m == padding).
widths = np.zeros(m + 1, dtype=np.int64)
row_perm = np.asarray(sp.row_perm)
cnts = np.concatenate(
    [np.asarray((b.vals != 0).sum(axis=1)) for b in sp.buckets])
np.add.at(widths, row_perm, cnts)
widths = widths[:m]
slots_bucketed = sum(b.m_padded * b.width for b in sp.buckets)
nnz_spill = int(widths.sum())
print(f"spill nnz={nnz_spill} rows_with_spill={(widths > 0).sum()} "
      f"bucketed slots={slots_bucketed} "
      f"cost={slots_bucketed*GATHER*1e3 + RESTORE_BUCKETED*1e3:.3f}ms")

for SEG in (32, 64, 128, 256):
    nseg = -(-m // SEG)
    wpad = np.zeros(nseg * SEG, dtype=np.int64)
    wpad[:m] = widths
    wmax = wpad.reshape(nseg, SEG).max(axis=1)
    # width classes: round up to {0,1,2,4,6,8,12,16,24,32,48,64,...}
    classes = np.array([0, 1, 2, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96,
                        128, 192, 256, 512, 1024])
    wcls = classes[np.searchsorted(classes, wmax)]
    slots = int((wcls * SEG).sum())
    # restore: one take over nseg segment-rows (BW-bound, negligible) —
    # charge 0.04 ms flat.
    cost = slots * GATHER + 0.04e-3
    nz_segs = int((wmax > 0).sum())
    print(f"SEG={SEG:4d}: segs={nseg} nonzero_segs={nz_segs} "
          f"slots={slots} (x{slots/max(nnz_spill,1):.2f}) "
          f"cost={cost*1e3:.3f}ms")
