#!/usr/bin/env python
"""Validate + time the refactored windowed path on the real-stats matrix.

Measures, per tile shape: (1) full padded-space core (pallas, with
spill), (2) kernel-only (no spill), (3) XLA core, all amortized
(chained dependent iterations, two-point slope). Correctness vs the
host f64 oracle.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_windowed_diag.py
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
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    windowed_matmul_pallas,
)
from sparsematrixmultiplicationmpi_tpu.ops.windowed import (
    spmm_windowed_core, spmm_windowed_xla,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

k = 32
dev = jax.devices()[0]
assert dev.platform != "cpu", dev

csr = cop20k_like(dtype="float32")
nnz = csr.nnz
v_host = generate_fat_vector(csr.shape[1], k, seed=0).astype(np.float32)
oracle = spmm_host_f64(csr, v_host)
o_norm = np.abs(oracle).max()

shapes = [(None, None), (256, 128), (512, 256), (256, 256)]
for R, C in shapes:
    t0 = time.time()
    wp = WindowedPairs.from_csr(csr, block_rows=R, chunk_cols=C)
    if wp is None:
        print(f"R={R} C={C}: builder refused", flush=True)
        continue
    tb = time.time() - t0
    spill_nnz = 0 if wp.spill is None else sum(
        b.m_padded * b.width for b in wp.spill.buckets)
    print(f"R={wp.block_rows} C={wp.chunk_cols} P={wp.n_pairs} "
          f"tiles {wp.dense_bytes/1e6:.0f}MB est {wp.est_seconds*1e3:.3f}ms "
          f"spill_slots={spill_nnz} perm={'y' if wp.perm is not None else 'n'} "
          f"(build {tb:.0f}s)", flush=True)

    wp_dev = jax.device_put(wp, dev)
    jax.block_until_ready(jax.tree.leaves(wp_dev))
    v = jnp.asarray(v_host)
    v_p = jax.device_put(jax.jit(wp_dev.encode)(v), dev)

    def check(fn):
        out = wp_dev.decode(fn(wp_dev, v_p))
        got = np.asarray(out)
        return np.abs(got - oracle).max() / o_norm

    variants = {
        "pallas-core": lambda wp_, vp_: spmm_windowed_core(
            wp_, vp_, use_pallas=True),
        "xla-core": spmm_windowed_xla,
    }
    for name, fn in variants.items():
        t0 = time.time()
        try:
            err = check(fn)
            # Operands must be jit ARGUMENTS (closure-captured arrays get
            # baked into the HLO -> HTTP 413 on the remote compiler).
            tm, _ = measure_amortized(
                lambda vp_, wp_: fn(wp_, vp_), v_p, wp_dev, inner=20,
                warmup=1, iters=3)
            per = tm.seconds_per_iter
            print(f"  {name:12s}: {per*1e3:8.3f} ms = "
                  f"{nnz/per/1e9:5.2f} Gnnz/s (rel err {err:.2e}, "
                  f"wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"  {name:12s}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # kernel+trans only (production dispatch on a spill-free operand)
    import dataclasses as _dc

    wp_nospill = _dc.replace(wp_dev, spill=None)
    try:
        t0 = time.time()
        tm, _ = measure_amortized(
            lambda vp_, wp_: spmm_windowed_core(wp_, vp_, use_pallas=True),
            v_p, wp_nospill, inner=20, warmup=1, iters=3)
        per = tm.seconds_per_iter
        bw = wp.dense_bytes / per / 1e9
        print(f"  kernel+trans: {per*1e3:8.3f} ms = {bw:5.0f} GB/s "
              f"({per/wp.n_pairs*1e9:6.1f} ns/tile, wall "
              f"{time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"  kernel+trans: FAILED {type(e).__name__}: {e}", flush=True)

    # spill-only (bucketed-ELL gather + restore, production spill object)
    if wp.spill is not None:
        from sparsematrixmultiplicationmpi_tpu.ops.ell import spmm_bucketed

        try:
            t0 = time.time()
            n_cols = wp.shape[1]
            tm, _ = measure_amortized(
                lambda vp_, sp_: spmm_bucketed(sp_, vp_[:n_cols]),
                v_p, wp_dev.spill, inner=20, warmup=1, iters=3)
            per = tm.seconds_per_iter
            print(f"  spill-only  : {per*1e3:8.3f} ms "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"  spill-only  : FAILED {type(e).__name__}: {e}",
                  flush=True)

print("done", flush=True)
