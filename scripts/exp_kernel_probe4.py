#!/usr/bin/env python
"""Probe v4: slab select on the LEADING dim of a (n_chunks, k, C) VMEM-resident v: whole fat vector resident in VMEM
(no per-pair slab DMA) + batched tile DMA (T consecutive tiles per copy).

Also probes the v5e VMEM capacity for the resident vector.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 \
       python scripts/exp_kernel_probe4.py [R] [C] [T] [dtype]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

R = int(sys.argv[1]) if len(sys.argv) > 1 else 128
C = int(sys.argv[2]) if len(sys.argv) > 2 else 128
T = int(sys.argv[3]) if len(sys.argv) > 3 else 4
tdtype = jnp.bfloat16 if (len(sys.argv) > 4 and sys.argv[4] == "bf16") \
    else jnp.float32
k = 32
m = 121192
nb = m // R + 1
P = int(2624330 / (R * C * 0.016))

rng = np.random.default_rng(0)
pair_block = np.sort(rng.integers(0, nb, size=P).astype(np.int32))
block_ptr = np.searchsorted(pair_block, np.arange(nb + 1)).astype(np.int32)
pair_chunk = np.concatenate([
    rng.integers(0, (m // C) - 1, size=P), np.zeros(T, np.int64)
]).astype(np.int32)
# Pad tiles (and chunks) by T so group DMAs/reads may overreach past P.
tiles = rng.uniform(-1, 1, size=(P + T, R, C)).astype(tdtype)
tiles[P:] = 0
n_chunks = m // C + 1
n_pad = n_chunks * C
# (n_chunks, k, C): slab select = leading-dim index (tile-granular
# addressing) instead of a dynamic lane-offset slice.
v_t = rng.uniform(-1, 1, size=(n_chunks, k, C)).astype(tdtype)
print(f"v VMEM size: {v_t.nbytes/1e6:.1f} MB", flush=True)


def _kernel(ptr_ref, pc_ref, tiles_ref, v_ref, out_ref, tbuf0, tbuf1, sems):
    b = pl.program_id(0)
    lo = ptr_ref[b]
    hi = ptr_ref[b + 1]
    ngroups = (hi - lo + T - 1) // T

    def start_group(g, buf, slot):
        pltpu.make_async_copy(
            tiles_ref.at[pl.ds(lo + g * T, T)], buf, sems.at[slot]
        ).start()

    # Warm-up: group 0 of this block. (Cross-block prefetch omitted: the
    # probe measures steady-state loop cost; block boundaries are ~10% of
    # groups.)
    @pl.when(ngroups > 0)
    def _():
        start_group(0, tbuf0, 0)

    out_ref[0] = jnp.zeros_like(out_ref[0])

    def body(g, _):
        even = g % 2 == 0

        @pl.when(jnp.logical_and(g + 1 < ngroups, even))
        def _():
            start_group(g + 1, tbuf1, 1)

        @pl.when(jnp.logical_and(g + 1 < ngroups, jnp.logical_not(even)))
        def _():
            start_group(g + 1, tbuf0, 0)

        def compute(buf):
            acc = jnp.zeros_like(out_ref[0])
            for i in range(T):
                p = lo + g * T + i
                slab = v_ref[pc_ref[p]]
                d = jax.lax.dot_general(
                    buf[i], slab,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=out_ref.dtype,
                    precision=(jax.lax.Precision.HIGHEST
                               if buf.dtype == jnp.float32
                               else jax.lax.Precision.DEFAULT),
                )
                acc = acc + jnp.where(p < hi, 1.0, 0.0).astype(d.dtype) * d
            return acc

        @pl.when(even)
        def _():
            pltpu.make_async_copy(
                tiles_ref.at[pl.ds(lo + g * T, T)], tbuf0, sems.at[0]).wait()
            out_ref[0] += compute(tbuf0)

        @pl.when(jnp.logical_not(even))
        def _():
            pltpu.make_async_copy(
                tiles_ref.at[pl.ds(lo + g * T, T)], tbuf1, sems.at[1]).wait()
            out_ref[0] += compute(tbuf1)
        return 0

    jax.lax.fori_loop(0, ngroups, body, 0)


@jax.jit
def run(ptr, pc, tl, vt):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # tiles in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v resident in VMEM
        ],
        out_specs=pl.BlockSpec((1, R, k), lambda b, ptr_, pc_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((T, R, C), tl.dtype),
            pltpu.VMEM((T, R, C), tl.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        )
    return pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110e6),
        ),
    )(ptr, pc, tl, vt)


dev = jax.devices()[0]
a_ptr, a_pc, a_tl, a_vt = [
    jax.device_put(x, dev) for x in (block_ptr, pair_chunk, tiles, v_t)]
stream = P * R * C * tiles.dtype.itemsize + nb * R * k * 4 + v_t.nbytes
print(f"R={R} C={C} T={T} P={P} dtype={tiles.dtype} "
      f"tiles {P*R*C*tiles.dtype.itemsize/1e6:.0f}MB; "
      f"ideal stream {stream/819e9*1e3:.3f} ms", flush=True)

out = np.asarray(run(a_ptr, a_pc, a_tl, a_vt))
for blk in (0, 1, nb - 1):
    lo, hi = block_ptr[blk], block_ptr[blk + 1]
    ref = np.zeros((R, k), np.float32)
    for p in range(lo, hi):
        slab = v_t[pair_chunk[p]]
        ref += tiles[p].astype(np.float32) @ slab.T.astype(np.float32)
    err = np.max(np.abs(out[blk] - ref) / (np.abs(ref) + 1))
    print(f"block {blk}: pairs {hi-lo} rel err {err:.2e}", flush=True)

t0 = time.time()
timing, _ = measure_amortized(
    lambda vt_, ptr, pc, tl: run(ptr, pc, tl, vt_),
    a_vt, a_ptr, a_pc, a_tl, inner=8, warmup=2, iters=3)
per = timing.seconds_per_iter
print(f"v4 kernel: {per*1e3:.3f} ms ({per/P*1e9:.1f} ns/pair, "
      f"{stream/per/1e9:.0f} GB/s; wall {time.time()-t0:.0f}s)", flush=True)
