#!/usr/bin/env python
"""Fit the windowed cost-model constants from a probe16 log.

Parses ``scripts/exp_kernel_probe16.py`` output (``/tmp/tpu_probe16.log``
under the queue) and produces the flip decision for
``formats/windowed.py``:

* recommended ``PRODUCTION_PAIRS_PER_STEP`` — the U with the best
  measured FULL-CORE throughput (phase 2 lines, spill included — the
  production condition);
* per-U (fixed_ns, stream_GB/s) fits of ``_pair_cost_s``'s model
  ``per_tile = fixed + bytes/BW`` from the kernel-only multi lines at
  two tile shapes (split-path bytes: R*2C*2 + k*2C*2, k=32).

Usage: python scripts/fit_probe16.py [/tmp/tpu_probe16.log]
Writes results/probe16_fit.json and prints a summary. Purely a parser —
run after the probe; apply the flip by editing the constants it names.
"""

import json
import re
import sys
from pathlib import Path

K = 32

SHAPE_RE = re.compile(r"^R=(\d+) C=(\d+) P=(\d+)")
SPLIT3_RE = re.compile(
    r"^\s+split3 U=2\s*:\s*([\d.]+) ms \(\s*([\d.]+) ns/tile\)")
MULTI_RE = re.compile(
    r"^\s+multi\s+U=(\d+)\s*:\s*([\d.]+) ms \(\s*([\d.]+) ns/tile, "
    r"rel err ([\d.e+-]+)\)")
MULTINS_RE = re.compile(
    r"^\s+multiNS R=(\d+) C=(\d+) U=(\d+):\s*([\d.]+) ms "
    r"\(\s*([\d.]+) ns/tile, rel err ([\d.e+-]+)\)")
FULL_RE = re.compile(
    r"^\s+full core U=(\d+):\s*([\d.]+) ms =\s*([\d.]+) Gnnz/s "
    r"\(rel err ([\d.e+-]+)\)")
FREE_RE = re.compile(
    r"^U=(\d+) free search -> R=(\d+) C=(\d+) P=(\d+)")

MAX_REL_ERR = 1e-3  # configs above this are correctness failures


def parse(text: str):
    shape = None
    kernel_rows = []   # (U, R, C, ns_per_tile, rel_err, variant)
    full_rows = []     # (U, ms, gnnz, rel_err, R, C)
    free_shape = {}
    for line in text.splitlines():
        m = SHAPE_RE.match(line)
        if m:
            shape = (int(m.group(1)), int(m.group(2)))
            continue
        m = SPLIT3_RE.match(line)
        if m and shape:
            kernel_rows.append(
                (2, *shape, float(m.group(2)), 0.0, "split3"))
            continue
        m = MULTI_RE.match(line)
        if m and shape:
            kernel_rows.append(
                (int(m.group(1)), *shape, float(m.group(3)),
                 float(m.group(4)), "multi"))
            continue
        m = MULTINS_RE.match(line)
        if m:
            kernel_rows.append(
                (int(m.group(3)), int(m.group(1)), int(m.group(2)),
                 float(m.group(5)), float(m.group(6)), "multiNS"))
            continue
        m = FREE_RE.match(line)
        if m:
            free_shape[int(m.group(1))] = (int(m.group(2)),
                                           int(m.group(3)))
            continue
        m = FULL_RE.match(line)
        if m:
            u = int(m.group(1))
            R, C = free_shape.get(u, (None, None))
            full_rows.append((u, float(m.group(2)), float(m.group(3)),
                              float(m.group(4)), R, C))
    return kernel_rows, full_rows


def split_bytes(R: int, C: int, k: int = K) -> int:
    return R * 2 * C * 2 + k * 2 * C * 2


def fit_per_u(kernel_rows):
    """Two-point (or least-squares) fit per (U, variant):
    ns = fixed + bytes/BW."""
    from collections import defaultdict

    groups = defaultdict(list)
    for u, R, C, ns, err, variant in kernel_rows:
        if err > MAX_REL_ERR:
            continue
        groups[(u, variant)].append((split_bytes(R, C), ns))
    fits = {}
    for key, pts in groups.items():
        if len(pts) < 2:
            continue
        xs = [b for b, _ in pts]
        ys = [n for _, n in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        denom = n * sxx - sx * sx
        if denom == 0:
            continue
        slope = (n * sxy - sx * sy) / denom      # ns per byte
        fixed = (sy - slope * sx) / n            # ns
        if slope <= 0:
            continue
        fits["U=%d/%s" % key] = {
            "fixed_ns": round(fixed, 1),
            "stream_gb_s": round(1.0 / slope, 1),  # bytes/ns = GB/s
            "points": len(pts),
        }
    return fits


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_probe16.log"
    text = Path(path).read_text()
    kernel_rows, full_rows = parse(text)
    if not kernel_rows and not full_rows:
        print(f"no probe16 rows found in {path}", file=sys.stderr)
        return 1

    ok_full = [r for r in full_rows if r[3] <= MAX_REL_ERR]
    best = max(ok_full, key=lambda r: r[2]) if ok_full else None
    out = {
        "log": path,
        "kernel_rows": [
            {"U": u, "R": R, "C": C, "ns_per_tile": ns,
             "rel_err": err, "variant": v}
            for u, R, C, ns, err, v in kernel_rows],
        "full_core": [
            {"U": u, "ms": ms, "gnnz_per_s": g, "rel_err": err,
             "R": R, "C": C}
            for u, ms, g, err, R, C in full_rows],
        "fits": fit_per_u(kernel_rows),
        "recommendation": None if best is None else {
            "PRODUCTION_PAIRS_PER_STEP": best[0],
            "full_core_gnnz_per_s": best[2],
            "apply": "formats/windowed.py::PRODUCTION_PAIRS_PER_STEP"
                     f" = {best[0]}; re-run tests/test_auto_routing.py"
                     " and scripts/check_cost_constants.py",
        },
    }
    dst = Path(__file__).resolve().parent.parent / "results" / \
        "probe16_fit.json"
    dst.write_text(json.dumps(out, indent=2))
    print(json.dumps(out["fits"], indent=2))
    print("recommendation:", json.dumps(out["recommendation"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
