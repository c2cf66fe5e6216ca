#!/usr/bin/env python
"""Fit tmulti cost-model constants from a probe17 hardware artifact.

Model per configuration: ``t = S * F + bytes / BW`` with ``S = P/U``
grid steps and ``bytes`` the streamed tile+slab+flush traffic recorded
by the probe. Solves (F, BW) by least squares over all correct records,
reports the fastest measured configuration, and writes
``results/probe17_fit.json`` for the production flip
(``formats/windowed.py::PRODUCTION_PAIRS_PER_STEP`` + the U>2 branch of
``_pair_cost_s``).

Refuses CPU artifacts and artifacts with < 3 usable records — the fit
must come from real hardware (the round-3 fabrication lesson:
results/probe16_fit.json was once generated from a fake log; this
fitter consumes only the structured JSON the probe itself wrote on a
TPU device).

Run: python scripts/fit_probe17.py [results/probe17_tmulti.json]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fit(records):
    """(step_seconds, bytes_per_second, residual_rel) least squares."""
    rows = [r for r in records
            if r.get("correct") and "ms" in r and r.get("pairs")]
    if len(rows) < 3:
        raise ValueError(f"need >= 3 usable records, have {len(rows)}")
    S = np.array([r["pairs"] / r["U"] for r in rows])
    B = np.array([float(r["streamed_bytes"]) for r in rows])
    t = np.array([r["ms"] * 1e-3 for r in rows])
    # t = S*F + B*inv_bw
    A = np.stack([S, B], axis=1)
    (F, inv_bw), *_ = np.linalg.lstsq(A, t, rcond=None)
    if F <= 0 or inv_bw <= 0:
        raise ValueError(
            f"non-physical fit F={F:.3e}s inv_bw={inv_bw:.3e}: "
            "records too collinear or noisy; rerun the probe")
    pred = A @ np.array([F, inv_bw])
    resid = float(np.max(np.abs(pred - t) / t))
    if resid > 0.5:
        raise ValueError(
            f"fit residual {resid:.0%} — the two-term model does not "
            "describe these records; rerun the probe")
    return float(F), float(1.0 / inv_bw), resid, rows


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "results", "probe17_tmulti.json")
    with open(path) as f:
        art = json.load(f)
    if "cpu" in str(art.get("device", "")).lower():
        print(f"refusing CPU artifact {path}", file=sys.stderr)
        return 2
    F, bw, resid, rows = fit(art["records"])
    best = min(rows, key=lambda r: r["ms"])
    baseline = next((r for r in art["records"]
                     if r.get("config") == "baseline_auto_U2"), None)
    out = {
        "source": path,
        "device": art.get("device"),
        "fit": {"step_ns": F * 1e9, "stream_gb_per_s": bw / 1e9,
                "max_residual_rel": resid,
                "n_records": len(rows)},
        "recommendation": {
            "pairs_per_step": best["U"],
            "block_rows": best["R"], "chunk_cols": best["C"],
            "measured_ms": best["ms"],
            "measured_gnnz_per_s": best["gnnz_per_s"],
            "baseline_u2_ms": baseline and baseline.get("ms"),
            "speedup_vs_u2": (baseline and baseline.get("ms")
                              and baseline["ms"] / best["ms"]),
        },
    }
    dst = os.path.join(REPO, "results", "probe17_fit.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {dst}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
