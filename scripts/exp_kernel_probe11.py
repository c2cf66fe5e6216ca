#!/usr/bin/env python
"""Probe v11: spill finish alternatives on the real cop20k stand-in.

The windowed path's non-kernel cost is the bucketed spill gather
(~137k padded slots x ~4.8 ns) plus the full-m inverse-permutation take
(~121k rows x ~4.8 ns = 0.58 ms) that restores bucket order before the
dense add (ops/windowed.py::_finish). Only ~27k rows actually carry
spill, so a scatter-add of the compact bucket output should beat the
full-m take despite the ~2x per-row scatter premium measured in round 1.

Measures, on the auto-chosen WindowedPairs of cop20k_like (f32, k=32):
  A. baseline: spmm_bucketed + take(inv_row_perm) + add
  B. scatter:  per-bucket outputs scattered into the padded dense out
     (pad slots -> index pad_rows, dropped by mode=drop)
  C. B with width_align=2 spill (fewer padded slots)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_kernel_probe11.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.matrix import BucketedELL
from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector)
from sparsematrixmultiplicationmpi_tpu.ops.ell import spmm_ell
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

k = 32
csr = cop20k_like(dtype="float32")
t0 = time.time()
wp = WindowedPairs.from_csr(csr)
print(f"R={wp.block_rows} C={wp.chunk_cols} P={wp.n_pairs} "
      f"(build {time.time()-t0:.0f}s)", flush=True)
m, n = wp.shape
pad_rows = wp.pad_rows
v = jnp.asarray(generate_fat_vector(n, k, seed=0), jnp.float32)
v_p = np.asarray(wp.encode(v))

dev = jax.devices()[0]
a_vp = jax.device_put(v_p, dev)


def scatter_rows_of(bell: BucketedELL):
    rp = np.asarray(bell.row_perm).astype(np.int32)
    rp = np.where(rp >= m, pad_rows + 1, rp)  # pad slots -> dropped
    return rp


def finish_take(bell):
    def f(vp):
        parts = [spmm_ell(b, vp[:n], unpad=False) for b in bell.buckets]
        parts.append(jnp.zeros((1, k), parts[0].dtype))
        stacked = jnp.concatenate(parts, axis=0)
        sp = jnp.take(stacked, bell.inv_row_perm, axis=0)
        tail = pad_rows - m
        if tail > 0:
            sp = jnp.concatenate(
                [sp, jnp.zeros((tail, k), sp.dtype)], axis=0)
        return sp
    return f


def finish_scatter(bell, srows):
    def f(vp):
        parts = [spmm_ell(b, vp[:n], unpad=False) for b in bell.buckets]
        stacked = jnp.concatenate(parts, axis=0)
        out = jnp.zeros((pad_rows, k), stacked.dtype)
        return out.at[srows].add(stacked, mode="drop")
    return f


bells = {"wa4": wp.spill}
t0 = time.time()
# rebuild the same spill COO with finer width alignment
sp_csr = None
coo = csr.to_coo()
i0 = np.asarray(coo.row_indices).astype(np.int64)
j0 = np.asarray(coo.col_indices).astype(np.int64)
if wp.perm is not None:
    p_ = np.asarray(wp.perm).astype(np.int64)
    inv = np.empty(m, dtype=np.int64)
    inv[p_] = np.arange(m)
    i0, j0 = inv[i0], inv[j0]
dense = wp.to_dense  # not used; rebuild spill via threshold repro below

for wa in (2,):
    # Rebuild from the existing spill's entries (exact same nnz set).
    b0 = wp.spill
    rows_parts, cols_parts, vals_parts = [], [], []
    for b in b0.buckets:
        cols = np.asarray(b.cols)
        vals = np.asarray(b.vals)
        nz = vals != 0
        r_ids = np.repeat(np.arange(cols.shape[0]), cols.shape[1]).reshape(
            cols.shape)
        # map bucket-local padded rows back to original ids via row_perm
    # simpler: reconstruct spill COO from to_dense of spill (121k x n too
    # big) — instead use row_perm/slot structure:
    rp = np.asarray(b0.row_perm)
    off = 0
    for b in b0.buckets:
        cols = np.asarray(b.cols)
        vals = np.asarray(b.vals)
        rows = rp[off:off + cols.shape[0]]
        off += cols.shape[0]
        nz = vals != 0
        rr = np.broadcast_to(rows[:, None], cols.shape)[nz]
        rows_parts.append(rr)
        cols_parts.append(cols[nz])
        vals_parts.append(vals[nz])
    from sparsematrixmultiplicationmpi_tpu.formats.matrix import COO

    sp_coo = COO.from_arrays(
        np.concatenate(vals_parts), np.concatenate(rows_parts),
        np.concatenate(cols_parts), (m, n))
    bells[f"wa{wa}"] = BucketedELL.from_csr(
        sp_coo.to_csr(), width_align=wa, max_buckets=16)
print(f"(spill rebuild {time.time()-t0:.0f}s)", flush=True)

for name, bell in bells.items():
    slots = sum(b.m_padded * b.width for b in bell.buckets)
    rows = sum(b.cols.shape[0] for b in bell.buckets)
    print(f"{name}: buckets={len(bell.buckets)} rows={rows} slots={slots}",
          flush=True)

ref = None
for name, bell in bells.items():
    bell_dev = jax.device_put(bell, dev)
    for label, fin in (("take", finish_take(bell_dev)),
                       ("scatter", finish_scatter(
                           bell_dev, jax.device_put(
                               scatter_rows_of(bell), dev)))):
        f = jax.jit(fin)
        out = np.asarray(jax.block_until_ready(f(a_vp)))
        if ref is None:
            ref = out
        err = float(np.max(np.abs(out - ref)))
        timing, _ = measure_amortized(
            f, a_vp, inner=8, warmup=2, iters=3)
        per = timing.seconds_per_iter
        print(f"{name}/{label}: {per*1e3:.3f} ms (err vs A {err:.2e})",
              flush=True)
