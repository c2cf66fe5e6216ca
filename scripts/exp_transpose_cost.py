#!/usr/bin/env python
"""Measure the chunk-transpose relayout cost on the v5e.

The windowed kernel reads fat-vector slabs from a chunk-transposed
(n_chunks, k, C) view; building that view per iterate is a (pad_rows, k)
-> (n_chunks, k, C) relayout whose cost decides whether the encoded
space should be block-transposed instead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_transpose_cost.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

for k in (32, 8):
    for C in (128, 256):
        rows = 948 * 128
        v = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (rows, k)),
            jnp.float32)

        @jax.jit
        def tr(v):
            return jnp.swapaxes(v.reshape(-1, C, k), 1, 2)

        timing, _ = measure_amortized(
            lambda v_: tr(v_), v,
            inner=20, warmup=2, iters=3)
        per = timing.seconds_per_iter
        mb = v.nbytes / 1e6
        print(f"k={k} C={C}: {per*1e3:.3f} ms for {mb:.1f}MB "
              f"({2*v.nbytes/per/1e9:.0f} GB/s r+w)", flush=True)
