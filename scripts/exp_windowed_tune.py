#!/usr/bin/env python
"""Tune the production windowed Pallas kernel (substreams S, depth D,
tile shape R x C) on the real cop20k-stats FEM matrix.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_windowed_tune.py > /tmp/win_tune.log
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    spmm_windowed_pallas,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

k = 32
dev = jax.devices()[0]
assert dev.platform != "cpu"

t0 = time.time()
csr = cop20k_like(dtype="float32")
print(f"gen {time.time()-t0:.1f}s nnz={csr.nnz}", flush=True)
v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=0),
                dtype=jnp.float32)
oracle = spmm_host_f64(csr, np.asarray(v))

for (R, C) in ((128, 128), (64, 128), (128, 256)):
    t0 = time.time()
    wp = WindowedPairs.from_csr(csr, block_rows=R, chunk_cols=C)
    if wp is None:
        print(f"R={R} C={C}: builder refused", flush=True)
        continue
    slab_mb = wp.n_pairs * C * k * 4 / 1e6
    print(f"R={R} C={C}: P={wp.n_pairs} tiles {wp.dense_bytes/1e6:.0f}MB "
          f"slabs {slab_mb:.0f}MB est {wp.est_seconds*1e3:.3f}ms "
          f"(build {time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    wp_dev = jax.device_put(wp, dev)
    jax.block_until_ready(jax.tree.leaves(wp_dev))
    print(f"  device_put {time.time()-t0:.0f}s", flush=True)
    vp = jax.block_until_ready(jax.jit(lambda x: wp_dev.encode(x))(
        jax.device_put(v, dev)))

    cfgs = [(4, 4), (2, 4), (4, 2), (4, 6)]
    for (S, D) in cfgs:
        if R % S or (R // S) % 8:
            continue
        t0 = time.time()
        try:
            timing, out = measure_amortized(
                lambda vv, op: spmm_windowed_pallas(
                    op, vv, substreams=S, depth=D),
                vp, wp_dev, inner=10, warmup=2, iters=3)
        except Exception as e:
            print(f"  S={S} D={D}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
            continue
        out = np.asarray(jax.block_until_ready(wp_dev.decode(out)))
        err = float(np.max(np.abs(out - oracle) / (np.abs(oracle) + 1.0)))
        per = timing.seconds_per_iter
        gn = csr.nnz / per / 1e9 if per == per else float("nan")
        bw = (wp.dense_bytes + slab_mb * 1e6) / per / 1e9
        print(f"  S={S} D={D} f32: {per*1e3:.3f} ms = {gn:.2f} Gnnz/s "
              f"(~{bw:.0f} GB/s, rel err {err:.2e}, wall "
              f"{time.time()-t0:.0f}s)", flush=True)

    # bf16 tier at the default (S=auto, D=4)
    wp16 = jax.device_put(wp.astype(jnp.bfloat16), dev)
    jax.block_until_ready(jax.tree.leaves(wp16))
    t0 = time.time()
    timing, out = measure_amortized(
        lambda vv, op: spmm_windowed_pallas(op, vv),
        vp, wp16, inner=10, warmup=2, iters=3)
    out = np.asarray(jax.block_until_ready(wp_dev.decode(out)))
    err = float(np.max(np.abs(out - oracle) / (np.abs(oracle) + 1.0)))
    per = timing.seconds_per_iter
    gn = csr.nnz / per / 1e9 if per == per else float("nan")
    print(f"  bf16 default: {per*1e3:.3f} ms = {gn:.2f} Gnnz/s "
          f"(rel err {err:.2e}, wall {time.time()-t0:.0f}s)", flush=True)
print("done", flush=True)
