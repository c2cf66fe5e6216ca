#!/usr/bin/env python
"""TPU experiment: windowed tile-pair SpMM vs round-1 paths on the
cop20k-stats FEM matrix. Run on the real chip:

    timeout 1200 python scripts/exp_windowed_tpu.py [k] > /tmp/exp_win.log
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.ops.windowed import (
    spmm_windowed_xla,
)
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    spmm_windowed_pallas,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
print("devices:", jax.devices(), flush=True)

t0 = time.time()
csr = cop20k_like(dtype="float32")
print(f"gen {time.time()-t0:.1f}s nnz={csr.nnz}", flush=True)

t0 = time.time()
wp = WindowedPairs.from_csr(csr)
print(f"build {time.time()-t0:.1f}s R={wp.block_rows} C={wp.chunk_cols} "
      f"P={wp.n_pairs} tiles={wp.dense_bytes/1e6:.0f}MB "
      f"est={wp.est_seconds*1e3:.3f}ms perm={wp.perm is not None}",
      flush=True)
spill_nnz = 0
if wp.spill is not None:
    spill_nnz = sum(int(np.count_nonzero(np.asarray(b.vals)))
                    for b in wp.spill.buckets)
print(f"spill nnz: {spill_nnz} ({spill_nnz/csr.nnz*100:.2f}%)", flush=True)

v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=0),
                dtype=jnp.float32)
oracle = spmm_host_f64(csr, np.asarray(v))

dev = jax.devices()[0]
wp_dev = jax.device_put(wp, dev)
v_dev = jax.device_put(v, dev)


def bench(tag, fn, operand, vv, check_decode):
    t0 = time.time()
    timing, out = measure_amortized(fn, vv, operand, inner=10, warmup=2,
                                    iters=3)
    out = np.asarray(jax.block_until_ready(check_decode(out)))
    err = float(np.max(np.abs(out - oracle) / (np.abs(oracle) + 1.0)))
    per = timing.seconds_per_iter
    gn = csr.nnz / per / 1e9 if per == per else float("nan")
    print(f"{tag}: {per*1e3:.3f} ms = {gn:.2f} Gnnz/s "
          f"(rel err {err:.2e}; wall {time.time()-t0:.0f}s)", flush=True)


# Permuted-space chains (encode outside the loop).
vp = jax.jit(lambda x: wp.encode(x))(v_dev)

bench("pallas windowed f32", lambda vv, op: spmm_windowed_pallas(op, vv),
      wp_dev, vp, lambda o: wp.decode(o))
bench("xla    windowed f32", lambda vv, op: spmm_windowed_xla(op, vv),
      wp_dev, vp, lambda o: wp.decode(o))

wp16 = jax.device_put(wp.astype(jnp.bfloat16), dev)
bench("pallas windowed bf16-tiles",
      lambda vv, op: spmm_windowed_pallas(op, vv),
      wp16, vp, lambda o: wp.decode(o))

# Round-1 Auto path for comparison (BandedBlocks/BucketedELL).
from sparsematrixmultiplicationmpi_tpu.ops.auto import auto_format, spmm_any

t0 = time.time()
old = auto_format(csr)
print(f"round1 auto_format: {type(old).__name__} "
      f"({time.time()-t0:.1f}s)", flush=True)
old_dev = jax.device_put(old, dev)
bench("round-1 auto f32", lambda vv, op: spmm_any(op, vv),
      old_dev, v_dev, lambda o: o)
print("done", flush=True)
