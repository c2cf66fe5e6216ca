#!/usr/bin/env python
"""Calibrate gather-class costs vs fat-vector width k on the real TPU.

Round-2 finding: the "4.8 ns/gathered-row regardless of width" constant
was measured at k <= 32 (rows <= 128 B). At GCN-scale k (128, 512 B
rows) the Auto router mis-chose COO over bucketed ELL (measured 2.7x
slower GCN steps), so this probe measures both paths' actual per-SpMM
time on the GCN graph across k, giving the model its k-dependence.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
       python scripts/exp_gather_calib2.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.matrix import BucketedELL
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.models import (
    normalize_adjacency, synthetic_node_classification,
)
from sparsematrixmultiplicationmpi_tpu.ops.ell import spmm_bucketed
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_coo
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

dev = jax.devices()[0]
adj, *_ = synthetic_node_classification(100_000, 64, 16, avg_degree=16,
                                        seed=1)
csr = normalize_adjacency(adj).astype(jnp.float32)
m = csr.shape[0]
bell = jax.device_put(BucketedELL.from_csr(csr), dev)
coo = jax.device_put(csr.to_coo(), dev)
slots = sum(b.m_padded * b.width for b in bell.buckets)
print(f"gcn graph m={m} nnz={csr.nnz} bell_slots={slots}", flush=True)

for k in (8, 32, 128):
    v = jax.device_put(jnp.asarray(
        generate_fat_vector(m, k, seed=3), jnp.float32), dev)
    for name, fn, op in (("bell", spmm_bucketed, bell),
                         ("coo", spmm_coo, coo)):
        t, _ = measure_amortized(lambda vv, o: fn(o, vv), v, op,
                                 inner=10, warmup=2, iters=3)
        per = t.seconds_per_iter
        ns_row = per / (slots if name == "bell" else csr.nnz) * 1e9
        print(f"k={k:4d} {name}: {per*1e3:7.3f} ms "
              f"({ns_row:5.2f} ns/slot-row)", flush=True)
