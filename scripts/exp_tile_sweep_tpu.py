#!/usr/bin/env python
"""Sweep (R, C) tile shapes of the windowed format on the real TPU with
both the Pallas block-run kernel and the XLA class path; calibrates
TILE_OVERHEAD_S and picks the headline configuration.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_tile_sweep_tpu.py [dtype]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    spmm_windowed_pallas,
)
from sparsematrixmultiplicationmpi_tpu.ops.windowed import spmm_windowed_xla
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

dtype = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") \
    else jnp.float32
k = 32
csr = cop20k_like(dtype="float32")
v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=0), jnp.float32)
oracle = spmm_host_f64(csr, np.asarray(v))
dev = jax.devices()[0]

for R, C in [(128, 256), (256, 256), (128, 512), (256, 512), (128, 128)]:
    t0 = time.time()
    wp = WindowedPairs.from_csr(csr, block_rows=R, chunk_cols=C)
    if wp is None:
        print(f"R={R} C={C}: builder refused", flush=True)
        continue
    if dtype == jnp.bfloat16:
        wp = wp.astype(dtype)
    wp_dev = jax.device_put(wp, dev)
    vp = jax.jit(lambda x: wp.encode(x))(jax.device_put(v, dev))
    print(f"R={R} C={C}: P={wp.n_pairs} tiles "
          f"{wp.dense_bytes/1e6:.0f}MB est {wp.est_seconds*1e3:.3f}ms "
          f"(build {time.time()-t0:.0f}s)", flush=True)
    for tag, fn in (
        ("pallas", lambda vv, op: spmm_windowed_pallas(op, vv,
                                                       interpret=False)),
        ("xla", lambda vv, op: spmm_windowed_xla(op, vv)),
    ):
        t0 = time.time()
        try:
            timing, out = measure_amortized(fn, vp, wp_dev, inner=10,
                                            warmup=2, iters=3)
        except Exception as e:
            print(f"  {tag}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)
            continue
        out = np.asarray(jax.block_until_ready(wp.decode(out)),
                         dtype=np.float64)
        err = float(np.max(np.abs(out - oracle) / (np.abs(oracle) + 1)))
        per = timing.seconds_per_iter
        print(f"  {tag}: {per*1e3:7.3f} ms = {csr.nnz/per/1e9:5.2f} Gnnz/s "
              f"({per/wp.n_pairs*1e9:6.1f} ns/tile, rel err {err:.2e}, "
              f"wall {time.time()-t0:.0f}s)", flush=True)
print("done", flush=True)
