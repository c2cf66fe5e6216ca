#!/usr/bin/env python
"""Probe v15: two pairs per grid step (packed split3 kernel).

The packed split3 kernel's binding constant at (256,256) is the ~191 ns
per-grid-step overhead (probe14). probe12's unroll failed on the OLD
6-pass kernel (MXU-bound, padding ate the gain); with 3 passes and
packed streams the overhead share is larger, so re-test: grid of P/2
steps, each fetching a (2, R, 2C) tile window (one leading-dim DMA) and
two slab windows, issuing both pairs' dots into the same block
accumulator. Blocks' pair runs are padded to even length with zero
tiles (dots on zeros are harmless — no guard needed).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
       python scripts/exp_kernel_probe15.py [R] [C]
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
P0 = int(2624330 / (R * C * 0.018))

rng = np.random.default_rng(0)
pair_block0 = np.sort(rng.integers(0, nb, size=P0).astype(np.int32))
pair_chunk0 = rng.integers(0, (m // C) - 1, size=P0).astype(np.int32)
tiles32_0 = rng.uniform(-1, 1, size=(P0, R, C)).astype(np.float32)

# Pad each block's run to even length with zero tiles (same block,
# chunk copied from the run's last pair so the slab window is a repeat).
blocks, starts = np.unique(pair_block0, return_index=True)
runs = np.diff(np.append(starts, P0))
pb_l, pc_l, tl_l = [], [], []
for b, s, r in zip(blocks, starts, runs):
    sl = slice(s, s + r)
    pb_l.append(pair_block0[sl]); pc_l.append(pair_chunk0[sl])
    tl_l.append(tiles32_0[sl])
    if r % 2:
        pb_l.append(pair_block0[s + r - 1: s + r])
        pc_l.append(pair_chunk0[s + r - 1: s + r])
        tl_l.append(np.zeros((1, R, C), np.float32))
pair_block = np.concatenate(pb_l)
pair_chunk = np.concatenate(pc_l)
tiles32 = np.concatenate(tl_l)
P = len(pair_block)
assert P % 2 == 0
S = P // 2
n_pad = (m // C + 1) * C
v32 = rng.uniform(-1, 1, size=(n_pad // C, k, C)).astype(np.float32)

first = np.zeros(S, dtype=np.int32)
first[0] = 1
first[1:] = (pair_block[2::2] != pair_block[: -2: 2]).astype(np.int32)
pc_even = pair_chunk[0::2].copy()
pc_odd = pair_chunk[1::2].copy()
pb_step = pair_block[0::2].copy()


def np_split_packed(x):
    import ml_dtypes

    hi = x.astype(ml_dtypes.bfloat16)
    lo = (x.astype(np.float32) - hi.astype(np.float32)).astype(
        ml_dtypes.bfloat16)
    return np.concatenate([hi, lo], axis=-1)


tiles_packed = np_split_packed(tiles32)          # (P, R, 2C)
slabs_packed = np_split_packed(v32)              # (chunks, k, 2C)


def kernel(pb_ref, pce_ref, pco_ref, first_ref, tile_ref, slab0_ref,
           slab1_ref, out_ref):
    s = pl.program_id(0)

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    acc = jnp.zeros_like(out_ref[0])
    for u, sref in ((0, slab0_ref), (1, slab1_ref)):
        t = tile_ref[u]
        sl_ = sref[0]
        acc += (dot(t[:, :C], sl_[:, :C]) + dot(t[:, C:], sl_[:, :C])
                + dot(t[:, :C], sl_[:, C:]))
    out_ref[0] += acc


@jax.jit
def run(vc, pb, pce, pco, fr, tp):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((2, R, 2 * C),
                         lambda s, pb, pce, pco, fr: (s, 0, 0)),
            pl.BlockSpec((1, k, 2 * C),
                         lambda s, pb, pce, pco, fr: (pce[s], 0, 0)),
            pl.BlockSpec((1, k, 2 * C),
                         lambda s, pb, pce, pco, fr: (pco[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, k),
                               lambda s, pb, pce, pco, fr: (pb[s], 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
    )(pb, pce, pco, fr, tp, vc, vc)


dev = jax.devices()[0]
args = [jax.device_put(x, dev) for x in
        (slabs_packed, pb_step, pc_even, pc_odd, first, tiles_packed)]
stream = P0 * R * C * 4 + P0 * C * k * 4 + nb * R * k * 4
print(f"split3u2 R={R} C={C} P0={P0} P={P} (+{(P-P0)/P0*100:.1f}% pad) "
      f"stream {stream/1e6:.0f}MB", flush=True)
t0 = time.time()
out = np.asarray(run(*args))
for blk in (0, nb // 2):
    sel = np.nonzero(pair_block0 == blk)[0]
    if not len(sel):
        continue
    ref = np.zeros((R, k), np.float64)
    for p in sel:
        ref += tiles32_0[p].astype(np.float64) @ \
            v32[pair_chunk0[p]].T.astype(np.float64)
    err = np.max(np.abs(out[blk] - ref)) / (np.abs(ref).max() + 1e-30)
    print(f"  block {blk}: pairs {len(sel)} rel err {err:.2e}", flush=True)
timing, _ = measure_amortized(
    lambda vc, *a: run(vc, *a), *args, inner=8, warmup=2, iters=3)
per = timing.seconds_per_iter
print(f"split3u2({R},{C}): {per*1e3:.3f} ms ({per/P0*1e9:.1f} ns/real-tile, "
      f"{stream/per/1e9:.0f} GB/s) wall {time.time()-t0:.0f}s", flush=True)
