#!/usr/bin/env python
"""On-chip validation of the distributed windowed path's Pallas kernels.

The CPU test suite exercises the windowed-row strategy's kernel contract
in interpret mode; this runs the COMPILED Mosaic kernels through the
full strategy on the real chip (p=1 mesh — the tunnel exposes one chip),
for both kernel generations (pairs_per_step 2 and 8) and both f32/bf16,
on a fixture with odd per-block pair runs (the round-2 NaN class).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python scripts/tpu_windowed_mesh_check.py
Writes results/tpu_windowed_mesh_check.json; exit 1 on any mismatch.
"""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.io.generate import (
    fem3d_csr, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.parallel import make_mesh
from sparsematrixmultiplicationmpi_tpu.parallel.windowed_strategy import (
    WindowedRowWise,
)

dev = jax.devices()[0]
assert dev.platform != "cpu", dev

csr64 = fem3d_csr(20_000, 400_000, seed=301)
oracle_cache = {}
rows = []
ok_all = True
for dtype, rtol in ((jnp.float32, 5e-3), (jnp.bfloat16, 1e-1)):
    csr = csr64.astype(dtype)
    for U in (2, 8):
        mesh = make_mesh(1)
        strat = WindowedRowWise(block_rows=128, chunk_cols=256,
                                pairs_per_step=U)
        operand = strat.prepare(csr, mesh)
        k = 32
        v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=302),
                        dtype=dtype)
        out = np.asarray(strat.spmm(operand, v, mesh), dtype=np.float64)
        if k not in oracle_cache:
            oracle_cache[k] = spmm_host_f64(
                csr64, generate_fat_vector(csr64.shape[1], k, seed=302))
        oracle = oracle_cache[k]
        scale = np.abs(oracle).max()
        rel = float(np.abs(out - oracle).max() / scale)
        finite = bool(np.isfinite(out).all())
        ok = finite and rel < rtol
        ok_all &= ok
        print(f"dtype={dtype.__name__} U={U} mode={operand.input_mode}: "
              f"rel={rel:.2e} finite={finite} -> "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        rows.append({"dtype": dtype.__name__, "pairs_per_step": U,
                     "input_mode": operand.input_mode,
                     "rel_err": rel, "finite": finite, "ok": ok})

out_path = Path(__file__).resolve().parent.parent / "results" / \
    "tpu_windowed_mesh_check.json"
out_path.write_text(json.dumps(
    {"device_kind": dev.device_kind, "rows": rows, "ok": ok_all},
    indent=2))
print(json.dumps({"ok": ok_all}))
sys.exit(0 if ok_all else 1)
