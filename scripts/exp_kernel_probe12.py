#!/usr/bin/env python
"""Probe v12: unrolled auto-pipelined block-sparse matmul.

probe10 fit the auto-pipelined kernel at ~114 ns fixed per grid step +
bytes/455 GB/s. Unrolling U pairs per grid step (U tile in_specs + U
slab in_specs, U dots) amortizes the fixed cost U-fold. Block runs are
padded to U-multiples at build time with zero tiles (chunk 0) so one
step never spans two output blocks (~nb*U/2 extra tiles, ~2-3 % bytes).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_kernel_probe12.py [R] [C] [U]
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
U = int(sys.argv[3]) if len(sys.argv) > 3 else 2
k = 32
m = 121192
nb = m // R + 1
P0 = int(2624330 / (R * C * 0.018))

rng = np.random.default_rng(0)
pair_block0 = np.sort(rng.integers(0, nb, size=P0).astype(np.int32))
pair_chunk0 = rng.integers(0, (m // C) - 1, size=P0).astype(np.int32)
tiles0 = rng.uniform(-1, 1, size=(P0, R, C)).astype(np.float32)

# Pad each block's run to a U-multiple with zero tiles (chunk 0).
runs = np.bincount(pair_block0, minlength=nb)
padded = -(-runs // U) * U
pad_total = int(padded.sum())
pair_block = np.repeat(np.arange(nb, dtype=np.int32), padded)
pair_chunk = np.zeros(pad_total, dtype=np.int32)
tiles = np.zeros((pad_total, R, C), dtype=np.float32)
dst_ptr = np.zeros(nb + 1, dtype=np.int64)
dst_ptr[1:] = np.cumsum(padded)
src_ptr = np.zeros(nb + 1, dtype=np.int64)
src_ptr[1:] = np.cumsum(runs)
idx = np.concatenate([
    np.arange(src_ptr[b], src_ptr[b + 1]) for b in range(nb)])
dst = np.concatenate([
    np.arange(dst_ptr[b], dst_ptr[b] + runs[b]) for b in range(nb)])
pair_chunk[dst] = pair_chunk0[idx]
tiles[dst] = tiles0[idx]
P = pad_total
n_pad = (m // C + 1) * C
v_chunks = rng.uniform(-1, 1, size=(n_pad // C, k, C)).astype(np.float32)
first = np.zeros(P // U, dtype=np.int32)
sb = pair_block[::U]
first[0] = 1
first[1:] = (sb[1:] != sb[:-1]).astype(np.int32)

print(f"R={R} C={C} U={U} P0={P0} P={P} (+{(P-P0)/P0*100:.1f}% pad)",
      flush=True)


def kernel(pb_ref, pc_ref, first_ref, *refs):
    tile_refs = refs[:U]
    slab_refs = refs[U:2 * U]
    out_ref = refs[2 * U]
    s = pl.program_id(0)

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    acc = None
    for u in range(U):
        prod = jax.lax.dot_general(
            tile_refs[u][0], slab_refs[u][0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        acc = prod if acc is None else acc + prod
    out_ref[0] += acc


@jax.jit
def run(pb, pc, fr, tl, vc):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P // U,),
        in_specs=(
            [pl.BlockSpec((1, R, C),
                          (lambda u: lambda s, pb, pc, fr:
                           (s * U + u, 0, 0))(u))
             for u in range(U)]
            + [pl.BlockSpec((1, k, C),
                            (lambda u: lambda s, pb, pc, fr:
                             (pc[s * U + u], 0, 0))(u))
               for u in range(U)]
        ),
        out_specs=pl.BlockSpec((1, R, k),
                               lambda s, pb, pc, fr: (pb[s * U], 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
    )(pb, pc, fr, *([tl] * U), *([vc] * U))


dev = jax.devices()[0]
a_pb, a_pc, a_fr, a_tl, a_vc = [
    jax.device_put(x, dev)
    for x in (pair_block, pair_chunk, first, tiles, v_chunks)]
stream = tiles.nbytes + P * C * k * 4 + nb * R * k * 4
print(f"tiles {tiles.nbytes/1e6:.0f}MB; ideal {stream/819e9*1e3:.3f} ms",
      flush=True)

t0 = time.time()
out = np.asarray(run(a_pb, a_pc, a_fr, a_tl, a_vc))
for blk in (0, nb - 1):
    sel = np.nonzero(pair_block0 == blk)[0]
    ref = np.zeros((R, k), np.float32)
    for p in sel:
        ref += tiles0[p] @ v_chunks[pair_chunk0[p]].T
    err = np.max(np.abs(out[blk] - ref) / (np.abs(ref) + 1))
    print(f"  block {blk}: pairs {len(sel)} rel err {err:.2e}", flush=True)

timing, _ = measure_amortized(
    lambda vc_, pb, pc, fr, tl: run(pb, pc, fr, tl, vc_),
    a_vc, a_pb, a_pc, a_fr, a_tl, inner=8, warmup=2, iters=3)
per = timing.seconds_per_iter
print(f"U={U}: {per*1e3:.3f} ms ({per/P0*1e9:.1f} ns/real-tile, "
      f"{stream/per/1e9:.0f} GB/s; wall {time.time()-t0:.0f}s)",
      flush=True)
