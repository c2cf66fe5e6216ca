#!/usr/bin/env python
"""Probe v14: packed split3 — hi/lo planes in ONE array per stream.

probe13 split3 measured a ~274 ns/step fixed cost (vs 114 ns for the
2-stream plain kernel): the two extra BlockSpec streams cost real
per-step work. This packs hi|lo along the lane dim — tiles (P, R, 2C),
slabs (chunks, k, 2C) — restoring the 2-stream shape; the kernel slices
VMEM at C (128-aligned, free) and issues the same 3 dots.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
       python scripts/exp_kernel_probe14.py [R] [C]
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
C = int(sys.argv[2]) if len(sys.argv) > 2 else 256
k = 32
m = 121192
nb = m // R + 1
P = int(2624330 / (R * C * 0.018))

rng = np.random.default_rng(0)
pair_block = np.sort(rng.integers(0, nb, size=P).astype(np.int32))
pair_chunk = rng.integers(0, (m // C) - 1, size=P).astype(np.int32)
n_pad = (m // C + 1) * C
first = np.zeros(P, dtype=np.int32)
first[0] = 1
first[1:] = (pair_block[1:] != pair_block[:-1]).astype(np.int32)
dev = jax.devices()[0]

tiles32 = rng.uniform(-1, 1, size=(P, R, C)).astype(np.float32)
v32 = rng.uniform(-1, 1, size=(n_pad // C, k, C)).astype(np.float32)


def np_split(x):
    import ml_dtypes

    hi = x.astype(ml_dtypes.bfloat16)
    lo = (x.astype(np.float32) - hi.astype(np.float32)).astype(
        ml_dtypes.bfloat16)
    return hi, lo


th, tl = np_split(tiles32)
tiles_packed = np.concatenate([th, tl], axis=2)        # (P, R, 2C)
sh, sl = np_split(v32)
slabs_packed = np.concatenate([sh, sl], axis=2)        # (chunks, k, 2C)


def kernel(pb_ref, pc_ref, first_ref, tile_ref, slab_ref, out_ref):
    p = pl.program_id(0)

    @pl.when(first_ref[p] == 1)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    t = tile_ref[0]
    s = slab_ref[0]
    th_, tl_ = t[:, :C], t[:, C:]
    sh_, sl_ = s[:, :C], s[:, C:]

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    out_ref[0] += dot(th_, sh_) + dot(tl_, sh_) + dot(th_, sl_)


@jax.jit
def run(vc, pb, pc, fr, tp):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, R, 2 * C), lambda p, pb, pc, fr: (p, 0, 0)),
            pl.BlockSpec((1, k, 2 * C),
                         lambda p, pb, pc, fr: (pc[p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, k),
                               lambda p, pb, pc, fr: (pb[p], 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
    )(pb, pc, fr, tp, vc)


args = [jax.device_put(x, dev) for x in
        (slabs_packed, pair_block, pair_chunk, first, tiles_packed)]
stream = P * R * C * 4 + P * C * k * 4 + nb * R * k * 4
print(f"split3p R={R} C={C} P={P} stream {stream/1e6:.0f}MB; "
      f"ideal {stream/819e9*1e3:.3f} ms", flush=True)
t0 = time.time()
out = np.asarray(run(*args))
for blk in (0, nb // 2):
    sel = np.nonzero(pair_block == blk)[0]
    if not len(sel):
        continue
    ref = np.zeros((R, k), np.float64)
    for p in sel:
        ref += tiles32[p].astype(np.float64) @ \
            v32[pair_chunk[p]].T.astype(np.float64)
    err = np.max(np.abs(out[blk] - ref)) / (np.abs(ref).max() + 1e-30)
    print(f"  block {blk}: pairs {len(sel)} rel err {err:.2e}", flush=True)
timing, _ = measure_amortized(
    lambda vc, *a: run(vc, *a), *args, inner=8, warmup=2, iters=3)
per = timing.seconds_per_iter
print(f"split3p({R},{C}): {per*1e3:.3f} ms ({per/P*1e9:.1f} ns/tile, "
      f"{stream/per/1e9:.0f} GB/s) wall {time.time()-t0:.0f}s", flush=True)
