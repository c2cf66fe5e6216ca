#!/usr/bin/env python
"""Hardware drift check for the windowed cost-model constants.

``formats/windowed.py``'s measured v5e constants (GATHER_S_PER_ROW,
TILE_OVERHEAD_S, TILE_STREAM_BW) drive every format decision the Auto
strategy makes. This script re-measures all three on the attached chip
and FAILS LOUDLY (exit 1) when any moved more than ``--tolerance``
(default 30 %) from the stored value — run it before any sweep so a
runtime/compiler update cannot silently invalidate `auto` routing
(VERDICT r2 Weak #6).

Method:
* gather: amortized ``jnp.take`` of 2 M random rows from a (121344, 32)
  f32 array — the spill path's primitive (exp_gather_calib2 conditions).
* tile overhead + stream BW: per-tile cost of the production split3
  two-pair kernel (spill-free cop20k-stats WindowedPairs) at two tile
  shapes; 2x2 solve of ``per_tile = F + bytes/BW``.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
       python scripts/check_cost_constants.py [--tolerance 0.3]
Writes results/cost_constants_check.json.
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu.formats.windowed import (
    GATHER_S_PER_ROW, TILE_OVERHEAD_S, TILE_STREAM_BW, WindowedPairs,
)
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.windowed import spmm_windowed_core
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized


def measure_gather_s_per_row(dev) -> float:
    m, k, n_idx = 121_344, 32, 2_000_000
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.uniform(size=(m, k)).astype(np.float32)), dev)
    idx = jax.device_put(
        jnp.asarray(rng.integers(0, m, size=n_idx).astype(np.int32)), dev)

    def body(x_, idx_):
        g = jnp.take(x_, idx_, axis=0)
        # Reduce back to (m, k) so the chained carry keeps x's shape.
        return jax.lax.dynamic_update_slice(
            x_, g[:1] * 1e-30 + x_[:1], (0, 0))

    tm, _ = measure_amortized(body, x, idx, inner=10, warmup=1, iters=3)
    assert tm.resolved, tm
    return tm.seconds_per_iter / n_idx


def measure_tile_fit(dev):
    """(F_per_tile_s, BW_bytes_per_s) from two tile shapes."""
    csr = cop20k_like(dtype="float32")
    k = 32
    v_host = generate_fat_vector(csr.shape[1], k, seed=0).astype(np.float32)
    points = []
    for R, C in ((256, 256), (512, 256)):
        t0 = time.time()
        # Calibration shapes are pinned for the two-point fit; disable
        # the economic guards so the cost model can't refuse them (the
        # round-4 queue run died here: (512,256) inflates ~200x on the
        # stand-in and tripped max_inflation).
        wp = WindowedPairs.from_csr(csr, block_rows=R, chunk_cols=C,
                                    pairs_per_step=2,
                                    max_inflation=1e9,
                                    beat_gather_margin=1e9)
        assert wp is not None, (R, C)
        wp = dataclasses.replace(wp, spill=None)
        wp = jax.device_put(wp, dev)
        jax.block_until_ready(jax.tree.leaves(wp))
        v_p = jax.device_put(jax.jit(wp.encode)(jnp.asarray(v_host)), dev)
        tm, _ = measure_amortized(
            lambda vp_, w_: spmm_windowed_core(w_, vp_, use_pallas=True),
            v_p, wp, inner=20, warmup=1, iters=3)
        assert tm.resolved, tm
        per_tile = tm.seconds_per_iter / wp.n_pairs
        # bf16 hi|lo tile (R*2C*2 bytes) + bf16 hi|lo slab (k*2C*2).
        nbytes = R * 2 * C * 2 + k * 2 * C * 2
        points.append((per_tile, nbytes))
        print(f"  ({R},{C}): {tm.seconds_per_iter*1e3:.3f} ms, "
              f"{wp.n_pairs} pairs, {per_tile*1e9:.1f} ns/tile "
              f"(build {time.time()-t0:.0f}s)", flush=True)
    (p1, b1), (p2, b2) = points
    bw = (b2 - b1) / (p2 - p1)
    fixed = p1 - b1 / bw
    return fixed, bw


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tolerance", type=float, default=0.30)
    args = ap.parse_args()

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("refusing to calibrate on CPU — constants are TPU-measured",
              file=sys.stderr)
        return 2

    print("measuring gather ...", flush=True)
    g = measure_gather_s_per_row(dev)
    print(f"  gather: {g*1e9:.2f} ns/row (stored "
          f"{GATHER_S_PER_ROW*1e9:.2f})", flush=True)
    print("measuring tile fit ...", flush=True)
    fixed, bw = measure_tile_fit(dev)
    print(f"  tile: fixed {fixed*1e9:.1f} ns (stored "
          f"{TILE_OVERHEAD_S*1e9:.1f}), stream {bw/1e9:.0f} GB/s "
          f"(stored {TILE_STREAM_BW/1e9:.0f})", flush=True)

    rows = []
    ok_all = True
    for name, measured, stored in (
            ("GATHER_S_PER_ROW", g, GATHER_S_PER_ROW),
            ("TILE_OVERHEAD_S", fixed, TILE_OVERHEAD_S),
            ("TILE_STREAM_BW", bw, TILE_STREAM_BW)):
        ratio = measured / stored
        ok = (1 - args.tolerance) <= ratio <= (1 + args.tolerance)
        ok_all &= ok
        rows.append({"constant": name, "measured": measured,
                     "stored": stored, "ratio": round(ratio, 3),
                     "ok": ok})
    out = {
        "device_kind": dev.device_kind,
        "tolerance": args.tolerance,
        "constants": rows,
        "ok": ok_all,
    }
    path = Path(__file__).resolve().parent.parent / "results" / \
        "cost_constants_check.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    if not ok_all:
        print("DRIFT: update formats/windowed.py constants and re-run "
              "the routing regression (tests/test_auto_routing.py)",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
