#!/usr/bin/env python
"""Drop correct=False rows from a sweep checkpoint so resume re-runs them.

One-shot round-4 fixup: the TPU sweep that started 2026-08-19 03:33 ran
with the pre-fix comparator that judged catastrophically cancelling rows
against |result| alone (powerlaw_100k k=12/k=32 false MISMATCHes —
see the condition-aware check commit). Removing those rows from the
append-only checkpoint makes ``sweep(resume_from=...)`` recompute and
re-judge exactly them; every other row is untouched.

Run: python scripts/requeue_mismatches.py [results/tpu_v5e_sweep.csv]
"""
import csv
import os
import sys

path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results", "tpu_v5e_sweep.csv")

with open(path) as f:
    rows = list(csv.DictReader(f))
    fields = rows[0].keys() if rows else []

keep = [r for r in rows if r.get("correct") != "False"]
dropped = [r for r in rows if r.get("correct") == "False"]
for r in dropped:
    print(f"requeue: {r['matrix']} k={r['k']} {r['strategy']} "
          f"devices={r['devices']} dtype={r.get('dtype')} "
          f"max_error={r.get('max_error')}")
if not dropped:
    print("no mismatch rows — nothing to do")
    sys.exit(0)

with open(path, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(fields))
    w.writeheader()
    w.writerows(keep)
print(f"kept {len(keep)}, dropped {len(dropped)} -> {path}")
