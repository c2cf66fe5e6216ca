#!/usr/bin/env python
"""Weak-scaling projection from program-derived collective bytes.

No multi-chip hardware exists in this environment (one tunneled v5e
chip), so the one multi-chip performance claim we *can* support is a
model: combine

  * per-device collective output bytes parsed from compiled SPMD HLO at
    p in {2, 4, 8} (``results/collective_bytes.json`` — XLA partitions
    identically on a real pod, so these are the real wire volumes),
  * the measured single-chip compute rate (``results/bench_headline.json``),
  * published interconnect constants for TPU v5e,

into projected weak-scaling efficiency per strategy, next to the
reference's MEASURED efficiency collapse on its Ethernet-MPI cluster
(118 % at 2 ranks -> 6 % at 96, ``BASELINE.md`` / reference
``results/analysis.csv``). Writes ``results/WEAK_SCALING.md``.

Weak-scaling model: the per-device shard is the fixture matrix itself
(global problem grows with p; per-device nnz, and therefore per-device
compute time, stay constant):

    t(p)       = t_compute + t_comm(p)
    t_comm(p)  = sum over collectives of  bytes_c / BW + hops_c * LAT
    eff(p)     = t(1) / t(p) = t_compute / t(p)

Assumptions (stated, not hidden):
  * t_compute = per-device nnz / measured single-chip Gnnz/s. Uses the
    driver-verified headline rate; per-shard rates are somewhat lower
    (smaller matrices amortize fixed costs worse), which makes the
    efficiency projection *conservative* in the comm-bound regime and
    optimistic in the compute-bound one — the sensitivity row bounds it.
  * ICI: 45 GB/s per direction per link (v5e 2-D torus, 400 Gbps
    links), 1 us collective launch latency per hop. A ppermute pays one
    hop; all-gather/all-reduce at p devices pay ~log2(p) hops.
  * DCN (multi-host beyond one ICI domain): 6.25 GB/s per host
    (50 Gbps NIC, conservative), 25 us latency — the reference's
    cluster regime.
  * Collective bytes at p = 16 are extrapolated: halo ppermute volumes
    are structural (window width x shard boundary count) and measured
    flat-to-shrinking in p; gather/reduce volumes are the full m x k
    fat vector, constant in p under weak scaling per the HLO audit.
    Extrapolation uses the p = 8 bytes (documented upper bound for the
    halo rows).
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ICI_BW = 45e9          # B/s per direction (v5e 400 Gbps ICI link)
ICI_LAT = 1e-6         # s per collective hop on ICI
DCN_BW = 6.25e9        # B/s per host (50 Gbps NIC)
DCN_LAT = 25e-6        # s per collective hop on DCN

def _fixture_nnz() -> dict:
    """Exact nnz of the audit fixtures (same builders/seeds as
    scripts/run_scaling_sweep.py:62-69)."""
    import numpy as np

    sys.path.insert(0, REPO)
    from sparsematrixmultiplicationmpi_tpu.io.generate import (
        banded_csr, fem3d_csr, powerlaw_csr,
    )

    return {
        "fem3d_50k": fem3d_csr(50_000, 1_080_000, seed=0,
                               dtype=np.float32).nnz,
        "banded_60k": banded_csr(60_000, 120, 18, seed=1,
                                 dtype=np.float32).nnz,
        "powerlaw_60k": powerlaw_csr(60_000, 60_000, 600_000,
                                     seed=2, dtype=np.float32).nnz,
    }

HOPS = {  # collective launch hops in the t_comm model
    "collective-permute": 1,
    "all-gather": None,   # log2(p)
    "all-reduce": None,
    "reduce-scatter": None,
}


def _hops(kind: str, p: int) -> int:
    import math

    fixed = HOPS.get(kind, 1)
    return fixed if fixed is not None else max(1, int(math.log2(p)))


def t_comm(collectives: dict, p: int, bw: float, lat: float) -> float:
    t = 0.0
    for kind, rec in collectives.items():
        t += rec["bytes"] / bw + rec["count"] * _hops(kind, p) * lat
    return t


def main() -> int:
    with open(os.path.join(REPO, "results", "collective_bytes.json")) as f:
        audit = json.load(f)["records"]
    with open(os.path.join(REPO, "results", "bench_headline.json")) as f:
        head = json.load(f)
    if head.get("device_kind") == "cpu":
        print("refusing to project from a CPU-fallback headline",
              file=sys.stderr)
        return 1
    gnnz = head["value"] * 1e9  # nnz/s measured single chip
    FIXTURE_NNZ = _fixture_nnz()

    # Steady-state (chained) wire volume per (matrix, strategy, p).
    # Regime mapping (results/HALO_SCALING.md footnote 1): row_wise
    # consumes a REPLICATED fat vector, so chaining its row-sharded
    # output forces the re-gather that only the gathered program makes
    # explicit — use gathered bytes for it. Every other strategy's
    # output sharding matches its input sharding (halo chunks, k
    # shards, nnz all-reduce), so the ungathered program IS the chained
    # step; its gathered variant adds an optional final all-gather that
    # a chained consumer never pays.
    CHAINED_USES_GATHERED = {"row_wise"}
    rows = {}
    for r in audit:
        if r["gathered"] != (r["strategy"] in CHAINED_USES_GATHERED):
            continue
        key = (r["matrix"], r["strategy"])
        rows.setdefault(key, {})[r["devices"]] = r["collectives"]

    ps = (2, 4, 8, 16)
    lines = []
    lines.append("# Projected weak-scaling efficiency (model, not measurement)")
    lines.append("")
    lines.append(f"Generated by `scripts/project_weak_scaling.py` from "
                 f"`results/collective_bytes.json` (compiled-HLO per-device "
                 f"collective bytes, p∈{{2,4,8}}; p=16 uses p=8 volumes — "
                 f"an upper bound for halo rows) and the measured "
                 f"single-chip rate {head['value']} Gnnz/s "
                 f"(`results/bench_headline.json`, "
                 f"{head['device_kind']}). Steady-state (chained iterate, "
                 f"result stays sharded) — the solver/GNN regime.")
    lines.append("")
    lines.append("Model and assumptions are in the script docstring. "
                 "Headline claim under test: BASELINE.md weak-scaling "
                 "efficiency ≥ 70 % at 2+ devices.")
    lines.append("")

    verdict_rows = []
    for net, bw, lat in (("ICI", ICI_BW, ICI_LAT), ("DCN", DCN_BW, DCN_LAT)):
        lines.append(f"## {net} ({bw / 1e9:.2f} GB/s, {lat * 1e6:.0f} us/hop)")
        lines.append("")
        lines.append("| matrix | strategy | " +
                     " | ".join(f"p={p}" for p in ps) + " |")
        lines.append("|---|---|" + "---|" * len(ps))
        for (mat, strat), per_p in sorted(rows.items()):
            nnz = FIXTURE_NNZ.get(mat)
            if nnz is None or not per_p:
                continue
            t_c = nnz / gnnz
            effs = []
            for p in ps:
                coll = per_p.get(p, per_p[max(per_p)])
                e = t_c / (t_c + t_comm(coll, p, bw, lat))
                effs.append(e)
            lines.append(f"| {mat} | {strat} | " +
                         " | ".join(f"{e * 100:.1f}%" for e in effs) + " |")
            verdict_rows.append((net, mat, strat, effs))
        lines.append("")

    # Sensitivity: 10x slower wire for the flagship halo rows.
    lines.append("## Sensitivity (flagship windowed_row halo rows, "
                 "wire 10× slower than assumed)")
    lines.append("")
    lines.append("| matrix | net | " + " | ".join(f"p={p}" for p in ps) + " |")
    lines.append("|---|---|" + "---|" * len(ps))
    for net, bw, lat in (("ICI/10", ICI_BW / 10, ICI_LAT * 10),
                         ("DCN/10", DCN_BW / 10, DCN_LAT * 10)):
        for (mat, strat), per_p in sorted(rows.items()):
            if strat != "windowed_row_wise":
                continue
            nnz = FIXTURE_NNZ.get(mat)
            if nnz is None or not per_p:
                continue
            t_c = nnz / gnnz
            effs = [t_c / (t_c + t_comm(per_p.get(p, per_p[max(per_p)]),
                                        p, bw, lat)) for p in ps]
            lines.append(f"| {mat} | {net} | " +
                         " | ".join(f"{e * 100:.1f}%" for e in effs) + " |")
    lines.append("")

    # Verdict vs BASELINE >= 70 %.
    flag = [(net, mat, e) for net, mat, strat, e in verdict_rows
            if strat == "windowed_row_wise"]
    ok_ici = all(min(e) >= 0.70 for net, _, e in flag if net == "ICI")
    ok_dcn = all(min(e) >= 0.70 for net, _, e in flag if net == "DCN")
    lines.append("## Verdict on the ≥ 70 % claim")
    lines.append("")
    lines.append(
        f"* Flagship `windowed_row` (halo / replicate fallback): "
        f"{'SUPPORTED' if ok_ici else 'NOT SUPPORTED'} on ICI, "
        f"{'SUPPORTED' if ok_dcn else 'NOT SUPPORTED'} on DCN, "
        f"under the stated model.")
    lines.append(
        "* Gather/reduce strategies (`row_wise` chained, `nnz`, spill-heavy "
        "`banded_row_wise`) move the full fat vector every step; on DCN "
        "they reproduce the reference's measured collapse mechanism "
        "(BASELINE.md: 118 % → 6 % at 96 ranks) — that is the regime the "
        "halo design exists to escape.")
    lines.append(
        "* This is a projection: no multi-chip hardware exists here. The "
        "wire volumes are real (compiled HLO); the time constants are "
        "published figures; the compute time is driver-measured.")
    lines.append("")

    out = os.path.join(REPO, "results", "WEAK_SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    print("\n".join(lines[:40]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
