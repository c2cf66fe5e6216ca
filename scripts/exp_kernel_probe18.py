#!/usr/bin/env python
"""Probe 18: VMEM-resident-slab transposed kernel at fine tiles.

The tmulti kernel streams one slab block per pair (P x k x 2C x 2 B).
At fine tiles that slab re-streaming dominates (slab/tile byte ratio =
k/R), which is why the cost model keeps tiles coarse and inflation high
(64x at (128,128) on the cop20k stand-in vs 8.7x at (8,8)). This probe
keeps the WHOLE slab array resident in VMEM (one constant-index
BlockSpec block, loaded once) and dynamic-indexes it per pair — if the
per-pair scalar issue cost (dynamic slice + small dots) is low enough,
fine tiles cut streamed tile bytes 2-5x and the headline ceiling moves
from ~2.2 to ~4-6 Gnnz/s.

VMEM limits (~16 MB less buffers) cap the resident slabs at ~6-8 MB, so
the probe runs on a COLUMN SLICE of the cop20k stand-in (half the
chunks) — production would phase over chunk ranges with partial-output
sums. Measures ns/pair, effective GB/s over tile bytes, and projected
full-matrix Gnnz/s for (R, C) in {(128,128),(128,64),(128,32)} x
U in {8, 16, 32}, against the streamed-slab tmulti on the same slice.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_kernel_probe18.py
"""
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsematrixmultiplicationmpi_tpu.formats.matrix import COO
from sparsematrixmultiplicationmpi_tpu.formats.reorder import rcm_ordering
from sparsematrixmultiplicationmpi_tpu.formats.windowed import (
    _split_planes, build_dense_pairs,
)
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    _dot_kc_cr, _pad_pairs_multi, chunk_slabs, windowed_matmul_tmulti,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

K = 32


def _kernel_resident(pb_ref, pc_ref, tiles_ref, slabs_ref, out_ref,
                     acc, stage, cur, prev, cnt, sem, *, U, C):
    s = pl.program_id(0)
    S = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        cur[0] = pb_ref[0]
        cnt[0] = 0
        acc[...] = jnp.zeros(acc.shape, acc.dtype)

    def flush():
        @pl.when(cnt[0] == 1)
        def _():
            pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()
        stage[...] = acc[...]
        pltpu.make_async_copy(stage, out_ref.at[cur[0]], sem).start()
        prev[0] = cur[0]
        cnt[0] = 1
        acc[...] = jnp.zeros(acc.shape, acc.dtype)

    for u in range(U):
        b = pb_ref[s * U + u]

        @pl.when(b != cur[0])
        def _(b=b):
            flush()
            cur[0] = b

        t = tiles_ref[u]
        sl = slabs_ref[pc_ref[s * U + u]]  # dynamic VMEM leading index
        acc[...] += (_dot_kc_cr(sl[:, :C], t[:C])
                     + _dot_kc_cr(sl[:, :C], t[C:])
                     + _dot_kc_cr(sl[:, C:], t[:C]))

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


@functools.partial(
    jax.jit, static_argnames=("nb", "U", "interpret"))
def tmulti_resident(pb, pc, tiles_t, slabs, *, nb, U, interpret=False):
    P, C2, R = tiles_t.shape
    C = C2 // 2
    k8 = slabs.shape[1]
    S = P // U
    n_chunks = slabs.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((U, C2, R), lambda s, pb_, pc_: (s, 0, 0)),
            # whole slab array as ONE resident block: index never
            # changes, so Mosaic loads it exactly once.
            pl.BlockSpec((n_chunks, k8, 2 * C),
                         lambda s, pb_, pc_: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((k8, R), jnp.float32),
            pltpu.VMEM((k8, R), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_resident, U=U, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, k8, R), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
    )(pb, pc, tiles_t, slabs)


def build_slice(csr, n_cols, R, C):
    """Dense pairs (ALL nonempty tiles) for the column slice [0, n_cols)
    of the RCM-reordered matrix, transposed split planes + block
    coverage + a U-multiple-friendly list."""
    m, n = csr.shape
    coo = csr.to_coo()
    i = np.asarray(coo.row_indices).astype(np.int64)
    j = np.asarray(coo.col_indices).astype(np.int64)
    vals = np.asarray(coo.values)
    perm = rcm_ordering(csr)
    inv = np.empty(m, np.int64)
    inv[perm] = np.arange(m)
    i, j = inv[i], inv[j]
    sel = j < n_cols
    i, j, vals = i[sel], j[sel], vals[sel]
    nb = -(-m // R)
    n_chunks = n_cols // C
    key = i // R * n_chunks + j // C
    uniq, inv_k = np.unique(key, return_inverse=True)
    P0 = len(uniq)
    tiles = np.zeros((P0, R, C), np.float32)
    tiles[inv_k, i % R, j % C] = vals
    pb = (uniq // n_chunks).astype(np.int32)
    pc = (uniq % n_chunks).astype(np.int32)
    # block coverage: dummy zero tiles for absent blocks
    missing = np.setdiff1d(np.arange(nb, dtype=np.int32), pb)
    if len(missing):
        pb = np.concatenate([pb, missing])
        pc = np.concatenate([pc, np.zeros(len(missing), np.int32)])
        tiles = np.concatenate(
            [tiles, np.zeros((len(missing), R, C), np.float32)])
        order = np.argsort(pb, kind="stable")
        pb, pc, tiles = pb[order], pc[order], tiles[order]
    return pb, pc, tiles, nb, n_chunks, len(vals)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    csr = cop20k_like(dtype=np.float32)
    m, n = csr.shape
    nnz_full = csr.nnz
    records = []
    for R, C in ((128, 128), (128, 64), (128, 32)):
        # slab budget ~7 MB: n_cols chunks * k8 * 2C * 2 bytes
        n_cols = (7_000_000 // (K * 2 * C * 2)) * C
        n_cols = min(n_cols, (n // C) * C)
        pb, pc, tiles, nb, n_chunks, nnz_slice = build_slice(
            csr, n_cols, R, C)
        slab_mb = n_chunks * K * 2 * C * 2 / 1e6
        for U in (8, 16, 32):
            tag = f"resident R={R} C={C} U={U}"
            try:
                pbp, pcp, tp = _pad_pairs_multi(pb, pc, tiles, nb, U)
                ts_t = np.ascontiguousarray(
                    _split_planes(tp).swapaxes(1, 2))
                P = len(pbp)
                v = np.asarray(
                    generate_fat_vector(n_cols, K, seed=0), np.float32)
                (slabs,) = chunk_slabs(jnp.asarray(v), C=C, split=True)
                slabs = jax.device_put(slabs, dev)
                ts_dev = jax.device_put(jnp.asarray(ts_t), dev)
                pbd = jnp.asarray(pbp)
                pcd = jnp.asarray(pcp)

                def body(sl, ts):
                    return tmulti_resident(pbd, pcd, ts, sl, nb=nb, U=U)

                # correctness vs the streamed tmulti (already validated
                # against the oracle by tests/test_tmulti.py)
                out = np.asarray(body(slabs, ts_dev))
                ref_t = np.asarray(windowed_matmul_tmulti(
                    pbd, pcd, ts_dev, slabs, nb=nb, pairs_per_step=U,
                    split=True))
                rel = (np.abs(out - ref_t).max()
                       / (np.abs(ref_t).max() or 1.0))
                timing, _ = measure_amortized(
                    body, slabs, ts_dev, inner=10, warmup=1, iters=3)
                sec = timing.seconds_per_iter
                tile_b = P * 2 * C * R * 2
                ns_pair = sec / P * 1e9
                gbs = tile_b / sec / 1e9
                # projected full-matrix time: scale tile bytes by
                # nnz_full/nnz_slice at the same ns/pair and add the
                # one-time slab residency load
                proj = sec * nnz_full / max(nnz_slice, 1)
                print(f"{tag}: {sec*1e3:.3f} ms P={P} "
                      f"({ns_pair:.1f} ns/pair, tiles {gbs:.0f} GB/s, "
                      f"slabs {slab_mb:.1f} MB resident) rel={rel:.1e} "
                      f"proj_full={proj*1e3:.2f} ms "
                      f"-> {nnz_full/proj/1e9:.2f} Gnnz/s", flush=True)
                records.append({
                    "config": tag, "R": R, "C": C, "U": U,
                    "ms": sec * 1e3, "pairs": P, "ns_per_pair": ns_pair,
                    "tile_gb_per_s": gbs, "slab_mb": slab_mb,
                    "rel_vs_streamed": float(rel),
                    "proj_full_ms": proj * 1e3,
                    "proj_full_gnnz_per_s": nnz_full / proj / 1e9,
                })
            except Exception as e:  # noqa: BLE001
                msg = f"{type(e).__name__}: {e}"
                print(f"{tag}: FAILED {msg[:300]}", flush=True)
                records.append({"config": tag, "error": msg[:500]})
        # streamed tmulti baseline on the same slice at U=16
        try:
            pbp, pcp, tp = _pad_pairs_multi(pb, pc, tiles, nb, 16)
            ts_t = np.ascontiguousarray(_split_planes(tp).swapaxes(1, 2))
            v = np.asarray(generate_fat_vector(n_cols, K, seed=0),
                           np.float32)
            (slabs,) = chunk_slabs(jnp.asarray(v), C=C, split=True)
            slabs = jax.device_put(slabs, dev)
            ts_dev = jax.device_put(jnp.asarray(ts_t), dev)
            pbd, pcd = jnp.asarray(pbp), jnp.asarray(pcp)
            timing, _ = measure_amortized(
                lambda s_, t_: windowed_matmul_tmulti(
                    pbd, pcd, t_, s_, nb=nb, pairs_per_step=16,
                    split=True),
                slabs, ts_dev, inner=10, warmup=1, iters=3)
            sec = timing.seconds_per_iter
            print(f"streamed R={R} C={C} U=16: {sec*1e3:.3f} ms "
                  f"({sec/len(pbp)*1e9:.1f} ns/pair)", flush=True)
            records.append({"config": f"streamed R={R} C={C} U=16",
                            "ms": sec * 1e3, "pairs": len(pbp),
                            "ns_per_pair": sec / len(pbp) * 1e9})
        except Exception as e:  # noqa: BLE001
            print(f"streamed R={R} C={C}: FAILED {e}", flush=True)

    out_path = os.path.join(REPO, "results", "probe18_resident.json")
    with open(out_path, "w") as f:
        json.dump({"device": dev.device_kind, "k": K,
                   "records": records}, f, indent=2)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
