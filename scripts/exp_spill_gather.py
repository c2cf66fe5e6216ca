#!/usr/bin/env python
"""Spill-gather probe: explicit-DMA Pallas gather vs the XLA take path.

The spill path's binding constant is XLA's ~4.8 ns per gathered row
(CLAUDE.md). This measures ``ops/pallas_gather.py::
ell_gather_rows_pallas`` (T*W in-flight row DMAs per grid step,
double-buffered) on the cop20k-stats spill geometry across
rows_per_step, against the XLA take+einsum on identical operands.
Decision rule (VERDICT r2 #5): flip ``ops/ell.py::SPILL_DMA_GATHER``
if < 2.5 ns/row, else record the negative result with numbers in
results/spill_gather_probe.json. The production wiring (``spmm_ell``'s
dma_gather route) is measured end-to-end at the bottom.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_spill_gather.py
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.ops.ell import spmm_ell
from sparsematrixmultiplicationmpi_tpu.ops.pallas_gather import (
    ell_gather_rows_pallas,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

dev = jax.devices()[0]
assert dev.platform != "cpu", dev

rng = np.random.default_rng(0)
n, k = 121_344, 32
# cop20k spill geometry: ~23k rows at width<=8; probe a few (rows, W).
cases = [(23_040, 2), (23_040, 4), (46_080, 2), (92_160, 1)]
v128 = jax.device_put(jnp.asarray(
    np.concatenate([rng.uniform(-1, 1, (n, k)).astype(np.float32),
                    np.zeros((n, 128 - k), np.float32)], axis=1)), dev)
v32 = v128[:, :k]

results = []
for Rt, W in cases:
    cols = rng.integers(0, n, (Rt, W)).astype(np.int32)
    vals = rng.uniform(-1, 1, (Rt, W)).astype(np.float32)
    cols_d = jax.device_put(jnp.asarray(cols), dev)
    vals_d = jax.device_put(jnp.asarray(vals), dev)

    # XLA baseline on the SAME geometry (take + weighted sum, k=32).
    def xla_body(v_, c_, w_):
        g = jnp.take(v_, c_.reshape(-1), axis=0).reshape(Rt, W, k)
        out = jnp.sum(w_[:, :, None] * g, axis=1)
        return jax.lax.dynamic_update_slice(
            v_, out[:1] * 1e-30 + v_[:1], (0, 0))

    tm, _ = measure_amortized(xla_body, v32, cols_d, vals_d,
                              inner=10, warmup=1, iters=3)
    xla_ns = tm.seconds_per_iter / (Rt * W) * 1e9
    print(f"Rt={Rt} W={W}: XLA take {xla_ns:6.2f} ns/row", flush=True)

    row = {"rows": Rt, "W": W, "xla_ns_per_row": round(xla_ns, 3),
           "pallas": {}}
    for T in (8, 16, 32):
        if (Rt % T) or T * W > 256:
            continue

        def pal_body(v_, c_, w_, T=T):
            out = ell_gather_rows_pallas(c_, w_, v_, rows_per_step=T)
            return jax.lax.dynamic_update_slice(
                v_, out[:1, :] * 1e-30 + v_[:1], (0, 0))

        try:
            got = np.asarray(ell_gather_rows_pallas(
                cols_d, vals_d, v128, rows_per_step=T))
            ref = np.einsum(
                "rw,rwk->rk", vals,
                np.asarray(v128)[cols.reshape(-1)].reshape(Rt, W, 128))
            err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
            tm, _ = measure_amortized(pal_body, v128, cols_d, vals_d,
                                      inner=10, warmup=1, iters=3)
            ns = tm.seconds_per_iter / (Rt * W) * 1e9
            print(f"  pallas T={T:<3}: {ns:6.2f} ns/row "
                  f"(rel err {err:.1e})", flush=True)
            row["pallas"][str(T)] = round(ns, 3)
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"[:200]
            print(f"  pallas T={T:<3}: FAILED {msg}", flush=True)
            row["pallas"][str(T)] = msg
    results.append(row)

# End-to-end A/B through the production spmm_ell wiring (includes the
# 128-lane v pad + output slice the kernel-only numbers exclude).
from sparsematrixmultiplicationmpi_tpu.formats.matrix import ELL

prod = {}
Rt, W = 23_040, 8
cols = rng.integers(0, n, (Rt, W)).astype(np.int32)
vals = rng.uniform(-1, 1, (Rt, W)).astype(np.float32)
ell = ELL(cols=jnp.asarray(cols), vals=jnp.asarray(vals), shape=(Rt, n))
ell = jax.device_put(ell, dev)
for label, dma in (("xla", False), ("dma", True)):
    def body(v_, e_, dma=dma):
        out = spmm_ell(e_, v_, unpad=False, dma_gather=dma)
        return jax.lax.dynamic_update_slice(
            v_, out[:1] * 1e-30 + v_[:1], (0, 0))

    try:
        tm, _ = measure_amortized(body, v32, ell, inner=10, warmup=1,
                                  iters=3)
        ns = tm.seconds_per_iter / (Rt * W) * 1e9
        print(f"spmm_ell {label}: {ns:6.2f} ns/row", flush=True)
        prod[label] = round(ns, 3)
    except Exception as e:
        prod[label] = f"{type(e).__name__}: {e}"[:200]
        print(f"spmm_ell {label}: FAILED {prod[label]}", flush=True)

out_path = Path(__file__).resolve().parent.parent / "results" / \
    "spill_gather_probe.json"
out_path.write_text(json.dumps(
    {"device_kind": dev.device_kind, "k": k, "results": results,
     "spmm_ell_end_to_end": prod},
    indent=2))
print(json.dumps(results))
