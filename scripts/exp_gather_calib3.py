#!/usr/bin/env python
"""Gather-class cost calibration over (m, nnz, k) — VERDICT r4 next #4.

The round-2 constants (``ops/auto.py``: COO 11.5 ns/nnz flat, ELL 2.5
ns/slot) were fit at m ~ 100k and missed the m-dependent term entirely:
on roadnet (m = 1.09 M, nnz/m = 1.4) the COO estimate was 4.5x
optimistic (17.9 est vs 80 ms measured) because the sorted segment-sum
and the output write scale with ROWS, not nonzeros. This probe measures
both gather paths across the sweep family grid and fits 3-term models:

    t_coo = c_nnz * nnz + c_row * m + c_byte * nnz * k * 4
    t_ell = e_slot * slots + e_row * m + e_byte * slots * k * 4

(slots = padded bucketed-ELL slots). Writes
results/gather_calib3.json with raw records, fitted constants,
per-record residuals, and the OLD model's error per record — the
before/after the routing change is judged on.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_gather_calib3.py
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from sparsematrixmultiplicationmpi_tpu.formats.matrix import BucketedELL
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    amazon0302_like, dc1_like, generate_fat_vector, powerlaw_csr,
    random_csr, roadnet_like,
)
from sparsematrixmultiplicationmpi_tpu.ops.auto import (
    COO_S_PER_NNZ, ELL_S_PER_SLOT, gather_class_estimates,
)
from sparsematrixmultiplicationmpi_tpu.ops.ell import spmm_bucketed
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_coo, spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

KS = (1, 6, 32)


def families():
    yield "powerlaw_100k", powerlaw_csr(100_000, 100_000, 1_500_000,
                                        seed=12)
    yield "uniform_random_100k", random_csr(100_000, 100_000, 1_200_000,
                                            seed=13)
    yield "uniform_random_20k", random_csr(20_000, 20_000, 200_000,
                                           seed=14)
    yield "amazon0302_like", amazon0302_like()
    yield "dc1_like", dc1_like()
    yield "roadnet_03", roadnet_like(scale=0.3)
    yield "roadnet_like", roadnet_like()


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    records = []
    for name, csr in families():
        csr = csr.astype(np.float32)
        m, n = csr.shape
        nnz = csr.nnz
        coo = jax.device_put(csr.to_coo(), dev)
        bell = BucketedELL.from_csr(csr)
        slots = sum(b.m_padded * b.width for b in bell.buckets)
        bell = jax.device_put(bell, dev)
        print(f"{name}: m={m} nnz={nnz} slots={slots} "
              f"(inflation {slots/nnz:.2f}x)", flush=True)
        for k in KS:
            v = np.asarray(generate_fat_vector(n, k, seed=0), np.float32)
            ref = spmm_host_f64(csr, v)
            scale = float(np.abs(ref).max()) or 1.0
            vd = jax.device_put(jnp.asarray(v), dev)
            for path, fn in (("coo", lambda vv: spmm_coo(coo, vv)),
                             ("ell", lambda vv: spmm_bucketed(bell, vv))):
                tag = f"{name} k={k} {path}"
                try:
                    jfn = jax.jit(fn)
                    out = np.asarray(jfn(vd), np.float64)
                    rel = float(np.abs(out - ref).max() / scale)
                    timing, _ = measure_amortized(
                        jfn, vd, inner=10, warmup=1, iters=3)
                    sec = timing.seconds_per_iter
                    print(f"  {tag}: {sec*1e3:.3f} ms "
                          f"({nnz/sec/1e9:.3f} Gnnz/s) rel={rel:.1e}",
                          flush=True)
                    records.append({
                        "family": name, "path": path, "m": m, "nnz": nnz,
                        "slots": slots, "k": k, "ms": sec * 1e3,
                        "rel_vs_oracle": rel,
                        "resolved": bool(timing.resolved),
                    })
                except Exception as e:  # noqa: BLE001
                    msg = f"{type(e).__name__}: {str(e)[:300]}"
                    print(f"  {tag}: FAILED {msg}", flush=True)
                    records.append({"family": name, "path": path,
                                    "k": k, "error": msg})

    # ---- fit 3-term models
    def fit(rows, work_key):
        A = np.array([[r[work_key], r["m"], r[work_key] * r["k"] * 4.0]
                      for r in rows])
        t = np.array([r["ms"] * 1e-3 for r in rows])
        coef, *_ = np.linalg.lstsq(A, t, rcond=None)
        coef = np.maximum(coef, 0.0)  # physical terms only
        # re-solve with zeroed terms dropped for a clean constrained fit
        keep = coef > 0
        if not keep.all():
            c2, *_ = np.linalg.lstsq(A[:, keep], t, rcond=None)
            coef[keep] = np.maximum(c2, 0.0)
        pred = A @ coef
        resid = np.abs(pred - t) / t
        return coef, pred, resid

    out = {"device": dev.device_kind, "records": records}
    fits = {}
    for path, work_key in (("coo", "nnz"), ("ell", "slots")):
        rows = [r for r in records
                if r.get("path") == path and r.get("resolved")]
        if len(rows) >= 4:
            coef, pred, resid = fit(rows, work_key)
            fits[path] = {
                "model": f"t = a*{work_key} + b*m + c*{work_key}*k*4B",
                "a_per_unit_ns": coef[0] * 1e9,
                "b_per_row_ns": coef[1] * 1e9,
                "c_gb_per_s": (1.0 / coef[2] / 1e9) if coef[2] > 0
                else None,
                "per_record": [
                    {"family": r["family"], "k": r["k"],
                     "measured_ms": r["ms"], "model_ms": p * 1e3,
                     "residual_rel": float(rr)}
                    for r, p, rr in zip(rows, pred, resid)],
                "max_residual_rel": float(np.max(resid)),
            }
            # old flat model's error on the same rows
            old_const = (COO_S_PER_NNZ if path == "coo"
                         else ELL_S_PER_SLOT)
            for rec, row in zip(fits[path]["per_record"], rows):
                old_est = old_const * row[work_key] \
                    + 2 * row[work_key] * row["k"] * 4 / 819e9 \
                    + row["m"] * row["k"] * 4 / 819e9
                rec["old_model_ms"] = old_est * 1e3
                rec["old_model_ratio"] = row["ms"] / (old_est * 1e3)
    out["fits"] = fits

    # current auto estimates vs measured best (routing check)
    routing = []
    for name, csr in families():
        csr = csr.astype(np.float32)
        ests = gather_class_estimates(csr, k_nominal=32)
        meas = {r["path"]: r["ms"] for r in records
                if r.get("family") == name and r.get("k") == 32
                and "ms" in r}
        routing.append({
            "family": name,
            "est_ms": {nm: ests[nm][0] * 1e3 for nm in ests},
            "measured_ms": meas,
        })
    out["routing_check_k32"] = routing

    dst = os.path.join(REPO, "results", "gather_calib3.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dst}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
