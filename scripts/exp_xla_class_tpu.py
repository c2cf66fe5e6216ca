#!/usr/bin/env python
"""Time the class-packed XLA windowed path on the real TPU (f32 + bf16).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
       python scripts/exp_xla_class_tpu.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.windowed import spmm_windowed_xla
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

k = 32
csr = cop20k_like(dtype="float32")
t0 = time.time()
wp = WindowedPairs.from_csr(csr)
print(f"build {time.time()-t0:.1f}s R={wp.block_rows} P={wp.n_pairs} "
      f"tiles={wp.dense_bytes/1e6:.0f}MB classes={wp.class_shapes} "
      f"est={wp.est_seconds*1e3:.3f}ms", flush=True)

v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=0), jnp.float32)
oracle = spmm_host_f64(csr, np.asarray(v))
dev = jax.devices()[0]
wp_dev = jax.device_put(wp, dev)
vp = jax.jit(lambda x: wp.encode(x))(jax.device_put(v, dev))

for tag, op in (("f32", wp_dev),
                ("bf16", jax.device_put(wp.astype(jnp.bfloat16), dev))):
    t0 = time.time()
    timing, out = measure_amortized(
        lambda vv, o: spmm_windowed_xla(o, vv), vp, op,
        inner=10, warmup=2, iters=3)
    out = np.asarray(jax.block_until_ready(wp.decode(out)))
    err = float(np.max(np.abs(out - oracle) / (np.abs(oracle) + 1)))
    per = timing.seconds_per_iter
    print(f"xla class {tag}: {per*1e3:.3f} ms = {csr.nnz/per/1e9:.2f} "
          f"Gnnz/s (rel err {err:.2e}; wall {time.time()-t0:.0f}s)",
          flush=True)
