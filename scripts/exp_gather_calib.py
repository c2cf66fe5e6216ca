#!/usr/bin/env python
"""Calibrate the gather-class cost model on the real TPU: bucketed ELL vs
COO+segment-sum vs BCOO on skewed and uniform scatter matrices.

Feeds the Auto format chooser (VERDICT round-1 weak #3: auto lost to the
nnz/COO path by 45% on powerlaw because it never considered it).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python scripts/exp_gather_calib.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.matrix import BucketedELL
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    generate_fat_vector, powerlaw_csr, random_csr,
)
from sparsematrixmultiplicationmpi_tpu.ops.ell import spmm_bucketed
from sparsematrixmultiplicationmpi_tpu.ops.library import spmm_bcoo, to_bcoo
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_coo
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

dev = jax.devices()[0]
print("device:", dev, flush=True)

MATS = {
    "powerlaw_100k": powerlaw_csr(100_000, 100_000, 1_000_000, seed=0,
                                  dtype=np.float32),
    "random_200k": random_csr(200_000, 200_000, 1_000_000, seed=1,
                              dtype=np.float32),
}

for name, csr in MATS.items():
    print(f"== {name}: m={csr.shape[0]} nnz={csr.nnz}", flush=True)
    for k in (1, 32):
        v = jax.device_put(
            jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=2),
                        dtype=jnp.float32), dev)

        bell = jax.device_put(BucketedELL.from_csr(csr), dev)
        padded_rows = sum(b.m_padded * b.width for b in bell.buckets)
        coo = jax.device_put(csr.to_coo(), dev)
        bcoo = jax.device_put(to_bcoo(csr), dev)

        for tag, fn, op in (
            ("bucketed_ell", lambda vv, o: spmm_bucketed(o, vv), bell),
            ("coo_segsum", lambda vv, o: spmm_coo(o, vv), coo),
            ("bcoo_library", lambda vv, o: spmm_bcoo(o, vv), bcoo),
        ):
            t0 = time.time()
            timing, _ = measure_amortized(fn, v, op, inner=8, warmup=2,
                                          iters=3)
            per = timing.seconds_per_iter
            extra = f" padded_rows={padded_rows}" if tag == "bucketed_ell" \
                else ""
            print(f"  k={k:2d} {tag:13s}: {per*1e3:8.3f} ms "
                  f"({csr.nnz/per/1e9:5.2f} Gnnz/s; "
                  f"{per/csr.nnz*1e9:5.2f} ns/nnz{extra}; "
                  f"wall {time.time()-t0:.0f}s)", flush=True)
print("done", flush=True)
