#!/usr/bin/env python
"""Probe v10: auto-pipelined block-sparse matmul (no manual DMAs).

probe7/8 fought Mosaic with hand-rolled DMA chains and topped out at
~300-460 GB/s depending on control-flow details. This probe uses the
idiomatic Pallas block-sparse pattern instead: grid over pairs, tile and
slab fetched by BlockSpec index_maps that read the prefetched scalar
arrays (PrefetchScalarGridSpec), output block revisited across the
contiguous pair run of each row block (pair_block is sorted, so the
output index is non-decreasing and Mosaic keeps the accumulator in VMEM).
Mosaic's automatic pipeliner handles the double buffering — the same
machinery that gets dense matmuls to ~90 % of HBM bandwidth.

Blocks with zero pairs are never visited; their output garbage is masked
on the XLA side (measured separately here).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_kernel_probe10.py [R] [C] [dtype]
"""
import functools
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
PRECISION = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[
    sys.argv[4] if len(sys.argv) > 4 else "highest"]
k = 32
m = 121192
nb = m // R + 1
P = int(2624330 / (R * C * 0.018))

rng = np.random.default_rng(0)
pair_block = np.sort(rng.integers(0, nb, size=P).astype(np.int32))
pair_chunk = rng.integers(0, (m // C) - 1, size=P).astype(np.int32)
tiles = rng.uniform(-1, 1, size=(P, R, C)).astype(tdtype)
n_pad = (m // C + 1) * C
v_chunks = rng.uniform(-1, 1, size=(n_pad // C, k, C)).astype(tdtype)
# first-pair-of-block flag, computed host-side: zero the accumulator there
first = np.zeros(P, dtype=np.int32)
first[0] = 1
first[1:] = (pair_block[1:] != pair_block[:-1]).astype(np.int32)


def kernel(pb_ref, pc_ref, first_ref, tile_ref, slab_ref, out_ref):
    p = pl.program_id(0)

    @pl.when(first_ref[p] == 1)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += jax.lax.dot_general(
        tile_ref[0], slab_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(PRECISION if tiles.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT))


@jax.jit
def run(pb, pc, fr, tl, vc):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda p, pb, pc, fr: (p, 0, 0)),
            pl.BlockSpec((1, k, C), lambda p, pb, pc, fr: (pc[p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, k),
                               lambda p, pb, pc, fr: (pb[p], 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
    )(pb, pc, fr, tl, vc)


dev = jax.devices()[0]
a_pb, a_pc, a_fr, a_tl, a_vc = [
    jax.device_put(x, dev)
    for x in (pair_block, pair_chunk, first, tiles, v_chunks)]
stream = tiles.nbytes + P * C * k * tiles.dtype.itemsize + nb * R * k * 4
print(f"R={R} C={C} P={P} dtype={tiles.dtype} tiles "
      f"{tiles.nbytes/1e6:.0f}MB; ideal {stream/819e9*1e3:.3f} ms",
      flush=True)

t0 = time.time()
out = np.asarray(run(a_pb, a_pc, a_fr, a_tl, a_vc))
for blk in (0, nb - 1):
    sel = np.nonzero(pair_block == blk)[0]
    ref = np.zeros((R, k), np.float32)
    for p in sel:
        ref += tiles[p].astype(np.float32) @ \
            v_chunks[pair_chunk[p]].T.astype(np.float32)
    if len(sel):
        err = np.max(np.abs(out[blk] - ref) / (np.abs(ref) + 1))
        print(f"  block {blk}: pairs {len(sel)} rel err {err:.2e}",
              flush=True)

timing, _ = measure_amortized(
    lambda vc_, pb, pc, fr, tl: run(pb, pc, fr, tl, vc_),
    a_vc, a_pb, a_pc, a_fr, a_tl, inner=8, warmup=2, iters=3)
per = timing.seconds_per_iter
print(f"auto-pipeline: {per*1e3:.3f} ms ({per/P*1e9:.1f} ns/tile, "
      f"{stream/per/1e9:.0f} GB/s; wall {time.time()-t0:.0f}s)",
      flush=True)

# + the XLA-side zero-mask for never-visited blocks
mask = np.zeros(nb, dtype=bool)
mask[np.unique(pair_block)] = True
a_mask = jax.device_put(mask, dev)


@jax.jit
def run_masked(pb, pc, fr, tl, vc, msk):
    o = run(pb, pc, fr, tl, vc)
    return jnp.where(msk[:, None, None], o, 0.0)


timing, _ = measure_amortized(
    lambda vc_, pb, pc, fr, tl, msk: run_masked(pb, pc, fr, tl, vc_, msk),
    a_vc, a_pb, a_pc, a_fr, a_tl, a_mask, inner=8, warmup=2, iters=3)
per = timing.seconds_per_iter
print(f" + zero-mask: {per*1e3:.3f} ms ({stream/per/1e9:.0f} GB/s)",
      flush=True)
