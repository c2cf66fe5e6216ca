#!/usr/bin/env python
"""Probe 16: U-pairs-per-step scratch-accumulator windowed kernel.

Measures the new ``windowed_matmul_multi`` (VMEM accumulator + manual
block flush, no per-block pad) against the production two-pair kernel
(``windowed_matmul_split3``) on the cop20k-stats matrix, across tile
shapes x U. Hypothesis (cost model, CLAUDE.md round-2 constants): the
~191 ns/step fixed overhead amortized over U pairs makes SMALL tiles
(128x128: 489 MB streamed vs 715 MB at 256x256) the optimum, cutting
kernel-only time from ~1.9 ms toward ~1.0 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_kernel_probe16.py
"""
import sys

sys.exit("probe16 is SUPERSEDED: the natural-layout U-pair kernel it "
         "measured (windowed_matmul_multi) could not compile on hardware "
         "(manual flush DMA minor-dim tiling) and was replaced by the "
         "transposed-state kernel. Run scripts/exp_kernel_probe17.py.")

import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    _pad_pairs_multi, windowed_matmul_multi, windowed_matmul_split3,
)
from sparsematrixmultiplicationmpi_tpu.ops.windowed import (
    _finish, spmm_windowed_core, spmm_windowed_xla,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

k = 32
dev = jax.devices()[0]
assert dev.platform != "cpu", dev

csr = cop20k_like(dtype="float32")
nnz = csr.nnz
v_host = generate_fat_vector(csr.shape[1], k, seed=0).astype(np.float32)

shapes = [(256, 256), (128, 128), (128, 256), (64, 128), (256, 128)]
for R, C in shapes:
    t0 = time.time()
    wp = WindowedPairs.from_csr(csr, block_rows=R, chunk_cols=C)
    if wp is None:
        print(f"R={R} C={C}: builder refused", flush=True)
        continue
    wp = jax.device_put(wp, dev)
    jax.block_until_ready(jax.tree.leaves(wp))
    v_p = jax.device_put(jax.jit(wp.encode)(jnp.asarray(v_host)), dev)
    ref = np.asarray(spmm_windowed_xla(wp, v_p))
    r_norm = np.abs(ref).max()
    import dataclasses

    wp_ns = dataclasses.replace(wp, spill=None)
    split_bytes = wp.n_pairs * R * 2 * C * 2
    print(f"R={R} C={C} P={wp.n_pairs} split_tiles "
          f"{split_bytes/1e6:.0f}MB est {wp.est_seconds*1e3:.3f}ms "
          f"(build {time.time()-t0:.0f}s)", flush=True)

    # Baseline: production two-pair split3 kernel (kernel+trans only).
    try:
        tm, _ = measure_amortized(
            lambda vp_, w_: spmm_windowed_core(w_, vp_, use_pallas=True),
            v_p, wp_ns, inner=20, warmup=1, iters=3)
        per = tm.seconds_per_iter
        print(f"  split3 U=2 : {per*1e3:8.3f} ms "
              f"({per/wp.n_pairs*1e9:6.1f} ns/tile)", flush=True)
    except Exception as e:
        print(f"  split3 U=2 : FAILED {type(e).__name__}: {e}"[:300],
              flush=True)

    for U in (4, 8, 16):
        pb, pc, ts = _pad_pairs_multi(
            wp.pair_block, wp.pair_chunk, wp.tiles_split, wp.n_blocks, U)
        pb, pc, ts = (jax.device_put(jnp.asarray(pb), dev),
                      jax.device_put(jnp.asarray(pc), dev),
                      jax.device_put(jnp.asarray(ts), dev))
        jax.block_until_ready((pb, pc, ts))

        def core(vp_, pb_, pc_, ts_, U=U):
            out = windowed_matmul_multi(
                pb_, pc_, ts_, vp_, nb=wp.n_blocks, pairs_per_step=U,
                split=True)
            return _finish(wp_ns, out, vp_)

        try:
            got = np.asarray(core(v_p, pb, pc, ts))
            # kernel-only parity (both spill-free)
            ref_ns = np.asarray(spmm_windowed_xla(wp_ns, v_p))
            err = np.abs(got - ref_ns).max() / r_norm
            tm, _ = measure_amortized(
                core, v_p, pb, pc, ts, inner=20, warmup=1, iters=3)
            per = tm.seconds_per_iter
            print(f"  multi  U={U:<2}: {per*1e3:8.3f} ms "
                  f"({per/wp.n_pairs*1e9:6.1f} ns/tile, rel err {err:.1e})",
                  flush=True)
        except Exception as e:
            print(f"  multi  U={U:<2}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)
from probe16_ns import multi_ns  # noqa: E402

for R, C in ((128, 128), (256, 256)):
    wp = WindowedPairs.from_csr(csr, block_rows=R, chunk_cols=C)
    if wp is None:
        continue
    wp = jax.device_put(wp, dev)
    jax.block_until_ready(jax.tree.leaves(wp))
    v_p = jax.device_put(jax.jit(wp.encode)(jnp.asarray(v_host)), dev)
    import dataclasses as _dc

    wp_ns0 = _dc.replace(wp, spill=None)
    ref_ns = np.asarray(spmm_windowed_xla(wp_ns0, v_p))
    r_norm = np.abs(ref_ns).max()
    for U in (8,):
        pb, pc, ts = _pad_pairs_multi(
            wp.pair_block, wp.pair_chunk, wp.tiles_split, wp.n_blocks, U)
        pb, pc, ts = (jax.device_put(jnp.asarray(pb), dev),
                      jax.device_put(jnp.asarray(pc), dev),
                      jax.device_put(jnp.asarray(ts), dev))
        jax.block_until_ready((pb, pc, ts))

        def core(vp_, pb_, pc_, ts_, U=U):
            out = multi_ns(pb_, pc_, ts_, vp_, nb=wp.n_blocks, U=U)
            from sparsematrixmultiplicationmpi_tpu.ops.windowed import (
                _finish as _f)

            return _f(wp_ns0, out, vp_)

        try:
            got = np.asarray(core(v_p, pb, pc, ts))
            err = np.abs(got - ref_ns).max() / r_norm
            tm, _ = measure_amortized(
                core, v_p, pb, pc, ts, inner=20, warmup=1, iters=3)
            per = tm.seconds_per_iter
            print(f"  multiNS R={R} C={C} U={U}: {per*1e3:8.3f} ms "
                  f"({per/wp.n_pairs*1e9:6.1f} ns/tile, rel err {err:.1e})",
                  flush=True)
        except Exception as e:
            print(f"  multiNS R={R} C={C} U={U}: FAILED "
                  f"{type(e).__name__}: {e}"[:300], flush=True)

# ---- phase 2: free cost-model search per U, full core (with spill) ----
import dataclasses

from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64

oracle = np.asarray(spmm_host_f64(csr, v_host))
o_norm = np.abs(oracle).max()
for U in (2, 8, 16):
    t0 = time.time()
    wp = WindowedPairs.from_csr(csr, pairs_per_step=U)
    if wp is None:
        print(f"U={U}: builder refused", flush=True)
        continue
    spill_slots = 0 if wp.spill is None else sum(
        b.m_padded * b.width for b in wp.spill.buckets)
    print(f"U={U} free search -> R={wp.block_rows} C={wp.chunk_cols} "
          f"P={wp.n_pairs} est {wp.est_seconds*1e3:.3f}ms "
          f"spill_slots={spill_slots} (build {time.time()-t0:.0f}s)",
          flush=True)
    wp = jax.device_put(wp, dev)
    jax.block_until_ready(jax.tree.leaves(wp))
    v_p = jax.device_put(jax.jit(wp.encode)(jnp.asarray(v_host)), dev)
    try:
        got = np.asarray(jax.jit(wp.decode)(
            spmm_windowed_core(wp, v_p, use_pallas=True)))
        err = np.abs(got - oracle).max() / o_norm
        tm, _ = measure_amortized(
            lambda vp_, w_: spmm_windowed_core(w_, vp_, use_pallas=True),
            v_p, wp, inner=20, warmup=1, iters=3)
        per = tm.seconds_per_iter
        print(f"  full core U={U}: {per*1e3:8.3f} ms = "
              f"{nnz/per/1e9:5.2f} Gnnz/s (rel err {err:.1e})", flush=True)
    except Exception as e:
        print(f"  full core U={U}: FAILED {type(e).__name__}: {e}"[:300],
              flush=True)
print("done", flush=True)
