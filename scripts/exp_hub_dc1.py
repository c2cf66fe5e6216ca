#!/usr/bin/env python
"""Hub-column extraction on the dc1 circuit class — hardware decision.

VERDICT r4 next #5: dc1 was the last family with no structure-exploiting
path (auto routed to the gather class at 0.9 % roofline). Round 5 added
``formats/hub.py::HubExtracted`` (rail-net columns as a rank-h dense
MXU correction over an auto-formatted remainder) and wired it into
``ops/auto.py::auto_format``. This probe measures, on the real chip and
the SAME matrix:

  * the no-hub baseline (best gather-class format, what r4 shipped),
  * the hub-extracted hybrid (what auto now picks when it wins),

at k in {6, 32}, validated against the host f64 oracle, and records the
decision. Note the r4 sweep's 3.889 ms dc1 row was measured on the OLD
dc1_like generator (1.5 % rail degrees — too uniform to be a circuit
matrix; fixed this round to 35/10/3/1 % fractions per the docstring's
own model), so the honest comparison is hub-vs-no-hub on the same
matrix, which this artifact is.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
       python scripts/exp_hub_dc1.py
Writes results/hub_dc1.json.
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from sparsematrixmultiplicationmpi_tpu.formats.hub import HubExtracted
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    dc1_like, generate_fat_vector)
from sparsematrixmultiplicationmpi_tpu.ops.auto import (
    _auto_with_est, auto_format, spmm_any)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

KS = (6, 32)


def run_variant(name, op, v, ref, dev, out):
    opd = jax.device_put(op, dev)
    vd = jax.device_put(jnp.asarray(v), dev)
    timing, last = measure_amortized(
        lambda x: spmm_any(opd, x), vd, inner=20)
    rel = float(np.max(np.abs(np.asarray(last, np.float64) - ref))
                / (np.max(np.abs(ref)) or 1.0))
    secs = (timing.seconds_per_iter if timing.resolved
            else timing.upper_bound)
    rec = {"ms": secs * 1e3,
           "noise_s": timing.noise,
           "resolved": timing.resolved,
           "rel_vs_oracle": rel}
    out[name] = rec
    print(f"  {name}: {rec['ms']:.3f} ms rel={rel:.2e}", flush=True)
    return rec


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    csr = dc1_like().astype(np.float32)
    m, n = csr.shape
    result = {"device": dev.device_kind, "m": m, "nnz": csr.nnz,
              "ks": {}}

    hub_op = auto_format(csr, allow_hub=True)
    is_hub = isinstance(hub_op, HubExtracted)
    result["auto_picked_hub"] = is_hub
    if is_hub:
        result["n_hubs"] = hub_op.n_hubs
        result["remainder_format"] = type(hub_op.remainder).__name__
        result["remainder_nnz"] = int(
            getattr(hub_op.remainder, "nnz",
                    getattr(hub_op.remainder, "nnz_total", -1)))
    # The no-hub baseline: same candidate search, hub branch disabled.
    base_op, base_est = _auto_with_est(csr, "auto", {}, allow_hub=False)
    result["baseline_format"] = type(base_op).__name__

    for k in KS:
        v = np.asarray(generate_fat_vector(n, k, seed=0), np.float32)
        ref = np.asarray(spmm_host_f64(csr, v), np.float64)
        out = {}
        print(f"k={k}:", flush=True)
        run_variant("no_hub_gather", base_op, v, ref, dev, out)
        if is_hub:
            run_variant("hub_hybrid", hub_op, v, ref, dev, out)
            out["speedup"] = (out["no_hub_gather"]["ms"]
                              / out["hub_hybrid"]["ms"])
            print(f"  speedup: {out['speedup']:.2f}x", flush=True)
        result["ks"][str(k)] = out

    path = os.path.join(REPO, "results", "hub_dc1.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
