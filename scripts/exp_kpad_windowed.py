#!/usr/bin/env python
"""k-pad probe: padded-Pallas vs XLA windowed path at sub-sublane k.

``spmm_windowed_core`` pads k%8!=0 fat vectors to the next sublane
multiple to unlock the fused Pallas kernel (Mosaic cannot lower
unaligned dots). This measures both paths at k in {1, 6, 12} x
pairs_per_step in {2, 8} on the cop20k-stats matrix and writes
results/kpad_probe.json. Decision rule: set ``formats/windowed.py::
KPAD_MIN_K`` to the smallest k where the padded kernel wins.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
       python scripts/exp_kpad_windowed.py
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.windowed import (
    spmm_windowed_core, spmm_windowed_xla,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

dev = jax.devices()[0]
assert dev.platform != "cpu", dev

csr = cop20k_like(dtype="float32")
nnz = csr.nnz

rows = []
for pps in (2, 8):
    wp = WindowedPairs.from_csr(csr, pairs_per_step=pps)
    assert wp is not None
    wp = jax.device_put(wp, dev)
    jax.block_until_ready(jax.tree.leaves(wp))
    for k in (1, 6, 12):
        v_host = generate_fat_vector(csr.shape[1], k, seed=0).astype(
            np.float32)
        v_p = jax.device_put(jax.jit(wp.encode)(jnp.asarray(v_host)), dev)
        oracle = spmm_host_f64(csr, v_host)
        o_norm = np.abs(oracle).max()
        row = {"pairs_per_step": pps, "k": k}
        for name, fn in (
            ("xla", lambda vp_, w_: spmm_windowed_xla(w_, vp_)),
            ("pallas_kpad",
             lambda vp_, w_: spmm_windowed_core(w_, vp_, use_pallas=True)),
        ):
            try:
                got = np.asarray(jax.jit(wp.decode)(fn(v_p, wp)))
                err = float(np.abs(got - oracle).max() / o_norm)
                tm, _ = measure_amortized(fn, v_p, wp,
                                          inner=20, warmup=1, iters=3)
                per = tm.seconds_per_iter
                row[name] = {"ms": round(per * 1e3, 4),
                             "gnnz_per_s": round(nnz / per / 1e9, 3),
                             "rel_err": err}
                print(f"pps={pps} k={k:>2} {name:>11}: {per*1e3:8.3f} ms "
                      f"(rel err {err:.1e})", flush=True)
            except Exception as e:
                row[name] = f"{type(e).__name__}: {e}"[:200]
                print(f"pps={pps} k={k:>2} {name:>11}: FAILED {row[name]}",
                      flush=True)
        rows.append(row)

out = Path(__file__).resolve().parent.parent / "results" / "kpad_probe.json"
out.write_text(json.dumps(
    {"device_kind": dev.device_kind, "matrix": "cop20k_like",
     "results": rows}, indent=2))
print("wrote", out, flush=True)
