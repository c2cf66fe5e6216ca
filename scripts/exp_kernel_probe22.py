#!/usr/bin/env python
"""Probe 22: is the U-pair kernel bound by HBM BYTES or by per-stream
DMA ISSUE cost?

probe20/21: split3 U=16 sits at ~146 ns/pair; the no-MXU floor is 92
ns/pair (= 870 GB/s over tiles+slabs — AT the byte roofline, OR a
17-DMA-per-step issue floor of ~87 ns/DMA; the two coincide at C=128).
Banking/mstack/resident all failed to move it. This probe separates the
theories with stream-subset variants (timing only where the math is
wrong), full cop20k, legacy layout:

  all_nodot      : 17 streams (tile window + 16 slabs), no compute —
                   probe20's floor, re-measured
  tiles_nodot    : tile window stream ONLY (1 DMA/step) — BW theory:
                   705 MB -> ~0.86 ms; issue theory: ~0.1 ms
  slabs_nodot    : 16 slab streams only (172 MB) — BW: ~0.21 ms;
                   issue: ~1.4 ms
  tiles_split3   : dots on tiles + a FIXED slab (wrong math): adds the
                   MXU cost to the tile stream in isolation
  all_split3     : the production kernel (control)

Writes results/probe22_streams.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_kernel_probe22.py
"""
import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsematrixmultiplicationmpi_tpu.formats.windowed import (
    WindowedPairs, _tiles_t,
)
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    _dot_kc_cr, chunk_slabs,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

K = 32


def _kernel(pb_ref, pc_ref, tiles_ref, *rest, U, C, n_slabs, compute):
    slab_refs = rest[:n_slabs]
    out_ref, acc, stage, cur, prev, cnt, sem = rest[n_slabs:]
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

        sl = slab_refs[u][0] if n_slabs == U else slab_refs[0][0]
        if compute == "split3" and tiles_ref is not None:
            t = tiles_ref[u]
            acc[...] += (_dot_kc_cr(sl[:, :C], t[:C])
                         + _dot_kc_cr(sl[:, :C], t[C:])
                         + _dot_kc_cr(sl[:, C:], t[:C]))
        elif compute == "touch_tile" and tiles_ref is not None:
            # consume one vreg of the tile so the stream can't be elided
            acc[...] += tiles_ref[u][:1, :1].astype(jnp.float32)
        elif compute == "touch_slab":
            acc[...] += sl[:acc.shape[0], :acc.shape[1]].astype(
                jnp.float32)

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


@functools.partial(jax.jit, static_argnames=("nb", "U", "mode"))
def run_mode(pb, pc, tiles_t, slabs, *, nb, U, mode):
    P, C2, R = tiles_t.shape
    C = C2 // 2
    S = P // U
    k8 = K

    def slab_spec(u):
        return pl.BlockSpec(
            (1, k8, 2 * C), lambda s, pb_, pc_, u=u: (pc_[s * U + u], 0, 0))

    fixed_slab = pl.BlockSpec(
        (1, k8, 2 * C), lambda s, pb_, pc_: (0, 0, 0))
    tile_spec = pl.BlockSpec((U, C2, R), lambda s, pb_, pc_: (s, 0, 0))

    if mode == "all_nodot":
        in_specs = [tile_spec, *[slab_spec(u) for u in range(U)]]
        ops = (tiles_t, *([slabs] * U))
        compute, n_slabs, has_tiles = "touch_slab", U, True
    elif mode == "tiles_nodot":
        in_specs = [tile_spec, fixed_slab]
        ops = (tiles_t, slabs)
        compute, n_slabs, has_tiles = "touch_tile", 1, True
    elif mode == "slabs_nodot":
        in_specs = [tile_spec, *[slab_spec(u) for u in range(U)]]
        # tile window pinned to block 0: one re-used (cached) block,
        # so only the slab streams move bytes
        in_specs[0] = pl.BlockSpec((U, C2, R),
                                   lambda s, pb_, pc_: (0, 0, 0))
        ops = (tiles_t, *([slabs] * U))
        compute, n_slabs, has_tiles = "touch_slab", U, True
    elif mode == "tiles_split3":
        in_specs = [tile_spec, fixed_slab]
        ops = (tiles_t, slabs)
        compute, n_slabs, has_tiles = "split3", 1, True
    elif mode == "all_split3":
        in_specs = [tile_spec, *[slab_spec(u) for u in range(U)]]
        ops = (tiles_t, *([slabs] * U))
        compute, n_slabs, has_tiles = "split3", U, True
    else:
        raise ValueError(mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=in_specs,
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
        functools.partial(_kernel, U=U, C=C, n_slabs=n_slabs,
                          compute=compute),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, k8, R), jnp.float32),
    )(pb, pc, *ops)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    records = {"device": dev.device_kind, "k": K}

    csr = cop20k_like(dtype=np.float32)
    n = csr.shape[1]
    nnz = csr.nnz
    wp = WindowedPairs.from_csr(csr)
    R, C = wp.block_rows, wp.chunk_cols
    nb = wp.n_blocks
    ts = jax.device_put(jnp.asarray(
        _tiles_t(np.asarray(wp.tiles), np.asarray(wp.tiles_split))), dev)
    pb = jnp.asarray(wp.pair_block)
    pc = jnp.asarray(wp.pair_chunk)
    P = wp.n_pairs
    tile_mb = P * 2 * C * R * 2 / 1e6
    slab_mb = P * K * 2 * C * 2 / 1e6
    print(f"format: R={R} C={C} P={P} nb={nb} "
          f"tile_stream={tile_mb:.0f}MB slab_stream={slab_mb:.0f}MB",
          flush=True)
    records["format"] = {"R": R, "C": C, "P": P, "nb": nb,
                         "tile_stream_mb": tile_mb,
                         "slab_stream_mb": slab_mb}

    v = np.asarray(generate_fat_vector(n, K, seed=0), np.float32)
    v_p = wp.encode(jnp.asarray(v))
    (slabs,) = chunk_slabs(v_p, C=C, split=True)
    slabs = jax.device_put(slabs, dev)

    results = {}
    for mode in ("all_split3", "all_nodot", "tiles_nodot", "slabs_nodot",
                 "tiles_split3"):
        try:
            def body(sl, ts_):
                return run_mode(pb, pc, ts_, sl, nb=nb, U=16, mode=mode)

            timing, _ = measure_amortized(body, slabs, ts, inner=20,
                                          warmup=1, iters=5)
            sec = timing.seconds_per_iter
            print(f"{mode}: {sec*1e3:.3f} ms ({sec/P*1e9:.1f} ns/pair)",
                  flush=True)
            results[mode] = {"ms": sec * 1e3,
                             "ns_per_pair": sec / P * 1e9,
                             "noise_s": timing.noise}
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {str(e)[:400]}"
            print(f"{mode}: FAILED {msg}", flush=True)
            results[mode] = {"error": msg}
    records["modes"] = results

    out_path = os.path.join(REPO, "results", "probe22_streams.json")
    with open(out_path, "w") as f:
        json.dump(records, f, indent=2)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
