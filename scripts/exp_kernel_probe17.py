#!/usr/bin/env python
"""Probe 17: transposed-state U-pair kernel (tmulti) on real hardware.

Successor to probe16 (whose natural-layout kernel could not compile —
manual flush DMA minor-dim tiling). Measures the production t-chain body
(``windowed_t_chain``: tmulti + fused resplit, zero per-step relayout)
on the cop20k stand-in across tile shapes x U, against the shipped
split3 U=2 baseline, all amortized two-point timings (the only reliable
clock through the tunnel — CLAUDE.md).

Per config reports: ms/iter, ns per real pair, effective GB/s over the
streamed tile+slab bytes, full-matrix Gnnz/s, and a correctness check
against the host f64 oracle. Writes results/probe17_tmulti.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_kernel_probe17.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.windowed import windowed_t_chain
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

K = 32
SHAPES = ((128, 128), (128, 256), (256, 128), (256, 256))
US = (4, 8, 16, 32)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    csr = cop20k_like(dtype=np.float32)
    nnz = csr.nnz
    v = np.asarray(generate_fat_vector(csr.shape[1], K, seed=0),
                   dtype=np.float32)
    oracle = spmm_host_f64(csr, v)
    o_scale = float(np.abs(oracle).max()) or 1.0
    records = []

    # Baseline: the shipped split3 U=2 free-search config via the natural
    # chain (what bench.py currently measures).
    from sparsematrixmultiplicationmpi_tpu.bench.harness import run_benchmark
    from sparsematrixmultiplicationmpi_tpu.parallel import Auto, make_mesh

    rec = run_benchmark(csr, K, Auto(), make_mesh(),
                        matrix_name="cop20k_like", warmup=2, iters=3,
                        check=True, dtype=jnp.float32, amortized=True,
                        inner=10)
    print(f"baseline auto (U=2 split3): {rec.execution_time*1e3:.3f} ms "
          f"= {rec.gnnz_per_s:.3f} Gnnz/s correct={rec.correct}",
          flush=True)
    records.append({"config": "baseline_auto_U2",
                    "ms": rec.execution_time * 1e3,
                    "gnnz_per_s": rec.gnnz_per_s,
                    "correct": bool(rec.correct)})

    for R, C in SHAPES:
        for U in US:
            tag = f"tmulti R={R} C={C} U={U}"
            try:
                t0 = time.time()
                wp = WindowedPairs.from_csr(
                    csr, block_rows=R, chunk_cols=C, pairs_per_step=U,
                    k_nominal=K)
                build_s = time.time() - t0
                if wp is None:
                    print(f"{tag}: format refused", flush=True)
                    records.append({"config": tag, "error": "refused"})
                    continue
                if not wp.supports_transposed_chain:
                    why = ("spill" if wp.spill is not None else "grid")
                    print(f"{tag}: t-chain unsupported ({why}, "
                          f"P={wp.n_pairs})", flush=True)
                    records.append({"config": tag,
                                    "error": f"unsupported:{why}",
                                    "pairs": wp.n_pairs})
                    continue
                ch = windowed_t_chain(wp, K)
                enc, body, dec = ch
                wp_dev = jax.device_put(wp, dev)
                state = jax.jit(enc)(jnp.asarray(v), wp_dev)
                timing, out_state = measure_amortized(
                    body, state, wp_dev, inner=10, warmup=1, iters=3)
                ms = timing.seconds_per_iter * 1e3
                out = np.asarray(jax.jit(dec)(
                    jax.jit(body)(state, wp_dev), wp_dev))
                rel = float(np.abs(out - oracle).max()) / o_scale
                P = wp.n_pairs
                # streamed bytes/iter: transposed tile planes + U slab
                # blocks (one per pair) + flush + resplit traffic
                tile_b = P * wp.tiles_t.shape[1] * wp.tiles_t.shape[2] * 2
                slab_b = P * K * 2 * C * 2
                out_b = wp.n_blocks * K * R * 4
                total_b = tile_b + slab_b + out_b * 3  # flush+resplit rw
                gbs = total_b / (timing.seconds_per_iter or float("inf")) \
                    / 1e9
                gnnz = nnz / (timing.seconds_per_iter or float("inf")) / 1e9
                ns_pair = (timing.seconds_per_iter or float("nan")) \
                    / P * 1e9
                print(f"{tag}: {ms:.3f} ms ({ns_pair:.1f} ns/pair, "
                      f"{gbs:.0f} GB/s, {gnnz:.3f} Gnnz/s) P={P} "
                      f"rel={rel:.2e} build={build_s:.0f}s", flush=True)
                records.append({
                    "config": tag, "R": R, "C": C, "U": U, "ms": ms,
                    "ns_per_pair": ns_pair, "gb_per_s": gbs,
                    "gnnz_per_s": gnnz, "pairs": P, "rel_err": rel,
                    "streamed_bytes": total_b,
                    "correct": bool(rel < 5e-3),
                })
            except Exception as e:  # noqa: BLE001 — record and continue
                msg = f"{type(e).__name__}: {e}"
                print(f"{tag}: FAILED {msg[:300]}", flush=True)
                records.append({"config": tag, "error": msg[:500]})

    out_path = os.path.join(REPO, "results", "probe17_tmulti.json")
    with open(out_path, "w") as f:
        json.dump({"device": dev.device_kind, "k": K, "nnz": nnz,
                   "records": records}, f, indent=2)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
