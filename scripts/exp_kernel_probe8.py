#!/usr/bin/env python
"""Probe v8: grouped multi-tile DMAs.

probe7 found that S parallel sub-copies per (R, C) tile reach ~460 GB/s
at (256, 256) but the production kernel at (256, 128) tiles sustains only
~280 GB/s — the sub-copies get too small. v8 groups G consecutive tiles
(contiguous in the pair array) into one (G*R, C) copy split into S
sub-streams, amortizing issue overhead G-fold and fattening each
sub-copy. Group runs are block-run-aligned: each block issues
ceil(run/G) group DMAs, the last one padded (tiles array is padded with
G zero tiles so overruns are safe); per-tile dots are masked by the true
run bound and use static slices of the group buffer (python unroll).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_kernel_probe8.py [R] [C] [dtype]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
C = int(sys.argv[2]) if len(sys.argv) > 2 else 128
tdtype = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") \
    else jnp.float32
k = 32
m = 121192
nb = m // R + 1
# Realistic pair count for the cop20k stand-in at this tile size
P = int(2624330 / (R * C * 0.018))
GMAX = 8

rng = np.random.default_rng(0)
pair_block = np.sort(rng.integers(0, nb, size=P).astype(np.int32))
block_ptr = np.searchsorted(pair_block, np.arange(nb + 1)).astype(np.int32)
pair_chunk = rng.integers(0, (m // C) - 1, size=P + GMAX).astype(np.int32)
tiles = np.zeros((P + GMAX, R, C), dtype=tdtype)
tiles[:P] = rng.uniform(-1, 1, size=(P, R, C)).astype(tdtype)
n_pad = (m // C + 1) * C
v_t = rng.uniform(-1, 1, size=(k, n_pad)).astype(tdtype)
tiles_flat = tiles.reshape(-1, C)  # ((P+GMAX)*R, C)


def make_kernel(G, S, D, DS):
    """G tiles per group DMA (S sub-streams, D group slots); slab copies
    stay per-tile on a DS-deep ring."""
    rows = G * R
    RS = rows // S

    def _kernel(ptr_ref, pc_ref, tflat_ref, v_ref, out_ref,
                gbufs, sbufs, gsems, ssems):
        b = pl.program_id(0)
        lo = ptr_ref[b]
        hi = ptr_ref[b + 1]
        n_groups = (hi - lo + G - 1) // G

        def group_copy(g, s):
            p0 = lo + g * G
            slot = g % D
            return pltpu.make_async_copy(
                tflat_ref.at[pl.ds(p0 * R + s * RS, RS), :],
                gbufs.at[slot, pl.ds(s * RS, RS), :],
                gsems.at[slot, s])

        def start_group(g):
            @pl.when(g < n_groups)
            def _():
                for s in range(S):
                    group_copy(g, s).start()

        def slab_copy(p):
            return pltpu.make_async_copy(
                v_ref.at[:, pl.ds(pc_ref[p] * C, C)],
                sbufs.at[p % DS],
                ssems.at[p % DS])

        for d in range(D - 1):
            start_group(jnp.int32(d))
        for d in range(DS - 1):
            @pl.when(jnp.int32(d) < hi - lo)
            def _(d=d):
                slab_copy(lo + jnp.int32(d)).start()

        out_ref[0] = jnp.zeros_like(out_ref[0])

        def body(g, _):
            start_group(g + D - 1)
            slot = g % D
            for s in range(S):
                group_copy(g, s).wait()
            for t in range(G):  # static unroll, static slices
                p = lo + g * G + t

                @pl.when(p < hi)
                def _(t=t, p=p):
                    @pl.when(p + DS - 1 < hi)
                    def _():
                        slab_copy(p + DS - 1).start()
                    slab_copy(p).wait()
                    out_ref[0] += jax.lax.dot_general(
                        gbufs[slot, t * R:(t + 1) * R], sbufs[p % DS],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=(jax.lax.Precision.HIGHEST
                                   if tiles.dtype == jnp.float32
                                   else jax.lax.Precision.DEFAULT))
            return 0

        jax.lax.fori_loop(0, n_groups, body, 0)

    return _kernel


def build(G, S, D, DS):
    @jax.jit
    def run(ptr, pc, tfl, vt):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, R, k), lambda b, ptr_, pc_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((D, G * R, C), tfl.dtype),
                pltpu.VMEM((DS, k, C), vt.dtype),
                pltpu.SemaphoreType.DMA((D, S)),
                pltpu.SemaphoreType.DMA((DS,)),
            ],
        )
        return pl.pallas_call(
            make_kernel(G, S, D, DS), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        )(ptr, pc, tfl, vt)
    return run


dev = jax.devices()[0]
a_ptr, a_pc, a_tfl, a_vt = [
    jax.device_put(x, dev)
    for x in (block_ptr, pair_chunk, tiles_flat, v_t)]
stream = P * R * C * tiles.dtype.itemsize \
    + P * C * k * tiles.dtype.itemsize + nb * R * k * 4
print(f"R={R} C={C} P={P} dtype={tiles.dtype} tiles "
      f"{P*R*C*tiles.dtype.itemsize/1e6:.0f}MB; ideal "
      f"{stream/819e9*1e3:.3f} ms", flush=True)

first = True
for (G, S, D, DS) in [(1, 4, 4, 4), (2, 4, 3, 6), (4, 4, 2, 8),
                      (4, 8, 2, 8), (8, 8, 2, 10), (4, 2, 3, 8),
                      (2, 2, 4, 6), (8, 4, 2, 10), (4, 4, 3, 8)]:
    if (G * R) % S:
        continue
    t0 = time.time()
    run = build(G, S, D, DS)
    try:
        out = np.asarray(run(a_ptr, a_pc, a_tfl, a_vt))
    except Exception as e:
        print(f"G={G} S={S} D={D} DS={DS}: FAILED "
              f"{type(e).__name__}: {str(e)[:140]}", flush=True)
        continue
    if first:
        for blk in (0, nb - 1):
            lo, hi = block_ptr[blk], block_ptr[blk + 1]
            ref = np.zeros((R, k), np.float32)
            for p in range(lo, hi):
                slab = v_t[:, pair_chunk[p] * C: pair_chunk[p] * C + C]
                ref += tiles[p].astype(np.float32) @ slab.T.astype(
                    np.float32)
            err = np.max(np.abs(out[blk] - ref) / (np.abs(ref) + 1))
            print(f"  block {blk}: pairs {hi-lo} rel err {err:.2e}",
                  flush=True)
        first = False
    timing, _ = measure_amortized(
        lambda vt_, ptr, pc, tfl: run(ptr, pc, tfl, vt_),
        a_vt, a_ptr, a_pc, a_tfl, inner=8, warmup=2, iters=3)
    per = timing.seconds_per_iter
    print(f"G={G} S={S:2d} D={D} DS={DS:2d}: {per*1e3:.3f} ms "
          f"({per/P*1e9:.1f} ns/tile, {stream/per/1e9:.0f} GB/s; "
          f"wall {time.time()-t0:.0f}s)", flush=True)
