#!/usr/bin/env python
"""Single-chip TPU validation of the Auto mesh-routing cost model.

VERDICT r4 weak #6: ``Auto.prepare``'s multi-device gate
(``band_coverage >= 0.5``) carried no measurement. The CPU-mesh probe
(``exp_auto_mesh_threshold.py``, results/auto_mesh_threshold.json)
showed the boundary CANNOT be resolved on CPU — without an MXU the
gather-path hybrid wins at every coverage, inverting the known TPU
ordering — so round 5 replaced the bare constant with the measured
single-chip cost model (``Auto._mesh_route``), whose compute terms
divide ~uniformly by the device count for every candidate (the argmin
is p-invariant; comm favors the same ordering: the banded/windowed
strategies move O(halo) bytes by ppermute, the hybrid row strategy's
psum_scatter moves O(m*k)).

This probe validates that model's ARGMIN on the real chip: for a band-
coverage ladder (banded base + uniform off-band fraction, the same
construction as the CPU probe), it measures the three operand-class
kernels single-chip and records whether the model picks each rung's
measured winner.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_auto_threshold_tpu.py
Writes results/auto_threshold_tpu.json.
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from sparsematrixmultiplicationmpi_tpu.formats.banded import (
    BandedBlocks, band_coverage)
from sparsematrixmultiplicationmpi_tpu.formats.matrix import CSR
from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    banded_csr, generate_fat_vector, random_csr)
from sparsematrixmultiplicationmpi_tpu.ops.auto import (
    gather_class_estimates, spmm_any)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

M = 30_000
K = 32


def mixed_csr(off_band_frac: float, seed: int = 0) -> CSR:
    """Banded base + uniform off-band entries (CPU probe's ladder)."""
    base = banded_csr(M, 150, 12, seed=seed)
    if off_band_frac <= 0:
        return base
    n_off = int(base.nnz * off_band_frac / (1 - off_band_frac))
    rnd = random_csr(M, M, n_off, seed=seed + 1)
    import scipy.sparse as sp

    a = sp.csr_matrix(
        (np.asarray(base.values), np.asarray(base.col_indices),
         np.asarray(base.row_ptr)), shape=base.shape)
    b = sp.csr_matrix(
        (np.asarray(rnd.values), np.asarray(rnd.col_indices),
         np.asarray(rnd.row_ptr)), shape=rnd.shape)
    s = (a + b).tocsr()
    return CSR.from_arrays(s.data, s.indices, s.indptr, base.shape)


def refresh_estimates() -> int:
    """--estimates-only: recompute the artifact's MODEL columns at HEAD
    without touching the hardware measurements.

    The estimates are host-side pure functions of the matrix; when the
    cost model changes (round-5: calibrated spill re-pricing in both
    WindowedPairs and BandedBlocks), the stale model_est_ms columns
    would misrepresent HEAD's routing. Measurements stay verbatim; a
    provenance note records the refresh.
    """
    import datetime

    dst = os.path.join(REPO, "results", "auto_threshold_tpu.json")
    with open(dst) as f:
        out = json.load(f)
    for row in out["records"]:
        frac = row["off_band_frac"]
        csr = mixed_csr(frac, seed=int(frac * 100)).astype(np.float32)
        gests = gather_class_estimates(csr, k_nominal=K)
        gname = min(gests, key=lambda nm: gests[nm][0])
        bb = BandedBlocks.from_csr(csr, k_nominal=K)
        wp = WindowedPairs.from_csr(
            csr, k_nominal=K, gather_baseline_s=gests[gname][0])
        row["model_est_ms"] = {
            "banded": None if bb is None else bb.est_seconds * 1e3,
            "windowed": None if wp is None else wp.est_seconds * 1e3,
            f"gather_{gname}": gests[gname][0] * 1e3,
        }
        ests = {k_: v_ for k_, v_ in row["model_est_ms"].items()
                if v_ is not None}
        row["model_winner"] = min(ests, key=ests.get) if ests else None
        row["model_matches"] = (row["measured_winner"]
                                == row["model_winner"])
        print(f"cov={row['band_coverage']:.3f}: model="
              f"{row['model_winner']} measured={row['measured_winner']} "
              f"match={row['model_matches']}", flush=True)
    out["model_argmin_matches"] = all(
        r["model_matches"] for r in out["records"])
    out["estimates_refreshed"] = (
        "model_est_ms/model_winner recomputed at HEAD after the "
        "calibrated spill re-pricing landed in WindowedPairs and "
        "BandedBlocks (host-side pure functions); measured_ms are the "
        "hardware run's verbatim medians-of-3")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"refreshed {dst}", flush=True)
    return 0


def main() -> int:
    if "--estimates-only" in sys.argv:
        return refresh_estimates()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    records = []
    for frac in (0.0, 0.1, 0.25, 0.4, 0.55, 0.75):
        csr = mixed_csr(frac, seed=int(frac * 100)).astype(np.float32)
        cov = band_coverage(csr, 128)
        v = np.asarray(generate_fat_vector(M, K, seed=1), np.float32)
        ref = spmm_host_f64(csr, v)
        scale = float(np.abs(ref).max()) or 1.0
        vd = jax.device_put(jnp.asarray(v), dev)

        gests = gather_class_estimates(csr, k_nominal=K)
        gname = min(gests, key=lambda nm: gests[nm][0])
        gop = (csr.to_coo() if gname == "coo"
               else gests[gname][1])
        bb = BandedBlocks.from_csr(csr, k_nominal=K)
        wp = WindowedPairs.from_csr(
            csr, k_nominal=K, gather_baseline_s=gests[gname][0])

        row = {"off_band_frac": frac, "band_coverage": cov,
               "nnz": csr.nnz,
               "model_est_ms": {
                   "banded": None if bb is None
                   else bb.est_seconds * 1e3,
                   "windowed": None if wp is None
                   else wp.est_seconds * 1e3,
                   f"gather_{gname}": gests[gname][0] * 1e3,
               },
               "measured_ms": {}}
        print(f"coverage={cov:.3f} nnz={csr.nnz} ests={row['model_est_ms']}",
              flush=True)
        variants = [(f"gather_{gname}", gop)]
        if bb is not None:
            variants.append(("banded", bb))
        if wp is not None:
            variants.append(("windowed", wp))
        for name, op in variants:
            try:
                opd = jax.device_put(op, dev)
                # Median of 3 independent slope measurements (each is
                # itself warmed + two-point calibrated): the first run
                # of this probe recorded a physically impossible rung-0
                # ordering (banded slower on FEWER nnz than rung 1) —
                # the known ~2x run-to-run variance of the tunneled
                # chip. Publication-grade re-measure protocol
                # (bench/report.py sanity layer) applied at the source.
                secs = []
                last = None
                for _ in range(3):
                    timing, last = measure_amortized(
                        lambda x: spmm_any(opd, x), vd, inner=10)
                    secs.append(timing.seconds_per_iter
                                if timing.resolved
                                else timing.upper_bound)
                rel = float(np.abs(np.asarray(last, np.float64) - ref
                                   ).max() / scale)
                sec = float(np.median(secs))
                row["measured_ms"][name] = sec * 1e3
                row.setdefault("spread_ms", {})[name] = [
                    s * 1e3 for s in sorted(secs)]
                row.setdefault("rel_vs_oracle", {})[name] = rel
                print(f"  {name}: {sec*1e3:.3f} ms "
                      f"(spread {min(secs)*1e3:.3f}-{max(secs)*1e3:.3f}) "
                      f"rel={rel:.1e}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = f"{type(e).__name__}: {str(e)[:200]}"
                row["measured_ms"][name] = None
                row.setdefault("errors", {})[name] = msg
                print(f"  {name}: FAILED {msg}", flush=True)
        meas = {k_: v_ for k_, v_ in row["measured_ms"].items()
                if v_ is not None}
        ests = {k_: v_ for k_, v_ in row["model_est_ms"].items()
                if v_ is not None}
        row["measured_winner"] = min(meas, key=meas.get) if meas else None
        row["model_winner"] = min(ests, key=ests.get) if ests else None
        row["model_matches"] = row["measured_winner"] == row["model_winner"]
        records.append(row)

    out = {
        "device": dev.device_kind, "m": M, "k": K,
        "records": records,
        "model_argmin_matches": all(r["model_matches"] for r in records),
        "note": ("single-chip compute-side boundary; the per-device "
                 "compute of every candidate divides ~uniformly by p, "
                 "so this argmin is what Auto._mesh_route uses on a "
                 "mesh (comm ordering argued in its docstring)"),
    }
    dst = os.path.join(REPO, "results", "auto_threshold_tpu.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dst}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
