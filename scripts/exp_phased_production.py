#!/usr/bin/env python
"""Probe 19: the PRODUCTION phased VMEM-resident kernel on real hardware.

Round-4 probe18 measured the resident-slab kernel 27 % faster than the
streamed tmulti at the production (128, 128) U=16 shape, on a column
slice whose slabs fit VMEM. This probe validates the full
productionization (``windowed_matmul_tmulti_phased`` + the build-time
phase layout) on the whole cop20k stand-in:

  * correctness vs the host f64 oracle (single multiply, on device),
  * A/B: phased-resident vs per-phase-streamed vs the legacy streamed
    single-list kernel, amortized chained-iterate timing (the headline
    bench's measurement),
  * end-to-end Auto headline equivalent.

Writes results/probe19_phased.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_phased_production.py
"""
import json
import os
import sys

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
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    chunk_slabs, resplit_slabs, windowed_matmul_tmulti,
    windowed_matmul_tmulti_phased,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

K = 32


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    csr = cop20k_like(dtype=np.float32)
    m, n = csr.shape
    nnz = csr.nnz
    records = {"device": dev.device_kind, "k": K, "nnz": nnz}

    wp = WindowedPairs.from_csr(csr, phase_layout=True)
    assert wp is not None
    print(f"format: R={wp.block_rows} C={wp.chunk_cols} "
          f"U={wp.pairs_per_step} P={wp.n_pairs} "
          f"phases={None if wp.phases is None else len(wp.phases)} "
          f"cpp={wp.chunks_per_phase} spill={wp.spill is not None}",
          flush=True)
    records["format"] = {
        "R": wp.block_rows, "C": wp.chunk_cols, "U": wp.pairs_per_step,
        "P": wp.n_pairs,
        "P_ph": (None if wp.pair_block_ph is None
                 else int(len(wp.pair_block_ph))),
        "phases": None if wp.phases is None else list(wp.phases),
        "cpp": wp.chunks_per_phase, "spill": wp.spill is not None,
    }
    assert wp.phases is not None and len(wp.phases) > 1

    v = np.asarray(generate_fat_vector(n, K, seed=0), np.float32)

    # ---- correctness on device (single multiply through the dispatch)
    from sparsematrixmultiplicationmpi_tpu.ops.windowed import spmm_windowed

    out = np.asarray(spmm_windowed(wp, jnp.asarray(v)), np.float64)
    ref = spmm_host_f64(csr, v)
    rel = float(np.abs(out - ref).max() / (np.abs(ref).max() or 1.0))
    print(f"correctness: rel={rel:.2e}", flush=True)
    records["rel_vs_oracle"] = rel
    assert rel < 5e-3, "phased kernel WRONG on hardware"

    # ---- A/B on the chained-iterate hot body (the headline's shape):
    # state -> kernel -> resplit, amortized.
    v_p = wp.encode(jnp.asarray(v))
    (slabs,) = chunk_slabs(v_p, C=wp.chunk_cols, split=True)
    slabs = jax.device_put(slabs, dev)
    ts = jax.device_put(jnp.asarray(wp.tiles_t), dev)
    pb = jnp.asarray(wp.pair_block_ph)
    pc = jnp.asarray(wp.pair_chunk_ph)
    kwargs = dict(nb=wp.n_blocks, phases=wp.phases,
                  chunks_per_phase=wp.chunks_per_phase,
                  pairs_per_step=wp.pairs_per_step, split=True)

    def body_resident(st, ts_):
        return resplit_slabs(windowed_matmul_tmulti_phased(
            pb, pc, ts_, st, **kwargs))

    def body_streamed_ph(st, ts_):
        return resplit_slabs(windowed_matmul_tmulti_phased(
            pb, pc, ts_, st, force_streamed=True, **kwargs))

    for name, fn in (("resident", body_resident),
                     ("streamed_phase", body_streamed_ph)):
        try:
            timing, _ = measure_amortized(fn, slabs, ts, inner=10,
                                          warmup=1, iters=3)
            sec = timing.seconds_per_iter
            print(f"{name}: {sec*1e3:.3f} ms -> {nnz/sec/1e9:.3f} Gnnz/s",
                  flush=True)
            records[name] = {"ms": sec * 1e3,
                             "gnnz_per_s": nnz / sec / 1e9}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            records[name] = {"error": f"{type(e).__name__}: {str(e)[:500]}"}

    # ---- legacy streamed single-list kernel on a block-major rebuild
    # (what round 4 shipped), same measurement.
    try:
        from sparsematrixmultiplicationmpi_tpu.formats.windowed import (
            _tiles_t,
        )

        ts_legacy = jax.device_put(jnp.asarray(
            _tiles_t(np.asarray(wp.tiles), np.asarray(wp.tiles_split))),
            dev)
        pb_l = jnp.asarray(wp.pair_block)
        pc_l = jnp.asarray(wp.pair_chunk)

        def body_legacy(st, ts_):
            return resplit_slabs(windowed_matmul_tmulti(
                pb_l, pc_l, ts_, st, nb=wp.n_blocks,
                pairs_per_step=wp.pairs_per_step, split=True))

        timing, _ = measure_amortized(body_legacy, slabs, ts_legacy,
                                      inner=10, warmup=1, iters=3)
        sec = timing.seconds_per_iter
        print(f"legacy_streamed: {sec*1e3:.3f} ms -> "
              f"{nnz/sec/1e9:.3f} Gnnz/s", flush=True)
        records["legacy_streamed"] = {"ms": sec * 1e3,
                                      "gnnz_per_s": nnz / sec / 1e9}
    except Exception as e:  # noqa: BLE001
        print(f"legacy_streamed: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        records["legacy_streamed"] = {
            "error": f"{type(e).__name__}: {str(e)[:500]}"}

    out_path = os.path.join(REPO, "results", "probe19_phased.json")
    with open(out_path, "w") as f:
        json.dump(records, f, indent=2)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
