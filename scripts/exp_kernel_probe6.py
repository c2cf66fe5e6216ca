#!/usr/bin/env python
"""Probe v6: split each tile DMA into S parallel sub-copies (separate
semaphores) to engage multiple DMA streams — a single chain measured
~200-230 GB/s on v5e regardless of tile size or buffering depth.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 \
       python scripts/exp_kernel_probe6.py [R] [C] [S] [dtype]
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
C = int(sys.argv[2]) if len(sys.argv) > 2 else 256
S = int(sys.argv[3]) if len(sys.argv) > 3 else 4
tdtype = jnp.bfloat16 if (len(sys.argv) > 4 and sys.argv[4] == "bf16") \
    else jnp.float32
k = 32
m = 121192
nb = m // R + 1
P = int(2624330 / (R * C * 0.018))

rng = np.random.default_rng(0)
pair_block = np.sort(rng.integers(0, nb, size=P).astype(np.int32))
block_ptr = np.searchsorted(pair_block, np.arange(nb + 1)).astype(np.int32)
pair_chunk = rng.integers(0, (m // C) - 1, size=P).astype(np.int32)
tiles = rng.uniform(-1, 1, size=(P, R, C)).astype(tdtype)
n_pad = (m // C + 1) * C
v_t = rng.uniform(-1, 1, size=(k, n_pad)).astype(tdtype)

RS = R // S  # sub-copy height


def _kernel(ptr_ref, pc_ref, tiles_ref, v_ref, out_ref,
            tbuf0, tbuf1, sbuf0, sbuf1, sems):
    b = pl.program_id(0)
    lo = ptr_ref[b]
    hi = ptr_ref[b + 1]
    total = ptr_ref[pl.num_programs(0)]

    def start_pair(p):
        @pl.when(p < total)
        def _():
            even = p % 2 == 0

            def go(tbuf, sbuf, base):
                for s in range(S):  # S parallel tile sub-streams
                    pltpu.make_async_copy(
                        tiles_ref.at[p, pl.ds(s * RS, RS), :],
                        tbuf.at[pl.ds(s * RS, RS), :],
                        sems.at[base + s],
                    ).start()
                pltpu.make_async_copy(
                    v_ref.at[:, pl.ds(pc_ref[p] * C, C)], sbuf,
                    sems.at[base + S]).start()

            @pl.when(even)
            def _():
                go(tbuf0, sbuf0, 0)

            @pl.when(jnp.logical_not(even))
            def _():
                go(tbuf1, sbuf1, S + 1)

    @pl.when(b == 0)
    def _():
        start_pair(jnp.int32(0))

    out_ref[0] = jnp.zeros_like(out_ref[0])

    def body(p, _):
        start_pair(p + 1)
        even = p % 2 == 0

        def accumulate(tbuf, sbuf, base):
            for s in range(S):
                pltpu.make_async_copy(
                    tiles_ref.at[p, pl.ds(s * RS, RS), :],
                    tbuf.at[pl.ds(s * RS, RS), :],
                    sems.at[base + s]).wait()
            pltpu.make_async_copy(
                v_ref.at[:, pl.ds(pc_ref[p] * C, C)], sbuf,
                sems.at[base + S]).wait()
            out_ref[0] += jax.lax.dot_general(
                tbuf[:], sbuf[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=out_ref.dtype,
                precision=(jax.lax.Precision.HIGHEST
                           if tbuf.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT))

        @pl.when(even)
        def _():
            accumulate(tbuf0, sbuf0, 0)

        @pl.when(jnp.logical_not(even))
        def _():
            accumulate(tbuf1, sbuf1, S + 1)
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)


@jax.jit
def run(ptr, pc, tl, vt):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, R, k), lambda b, ptr_, pc_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, C), tl.dtype),
            pltpu.VMEM((R, C), tl.dtype),
            pltpu.VMEM((k, C), vt.dtype),
            pltpu.VMEM((k, C), vt.dtype),
            pltpu.SemaphoreType.DMA((2 * (S + 1),)),
        ],
    )
    return pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
    )(ptr, pc, tl, vt)


dev = jax.devices()[0]
a_ptr, a_pc, a_tl, a_vt = [
    jax.device_put(x, dev) for x in (block_ptr, pair_chunk, tiles, v_t)]
stream = tiles.nbytes + P * C * k * tiles.dtype.itemsize + nb * R * k * 4
print(f"R={R} C={C} S={S} P={P} dtype={tiles.dtype} tiles "
      f"{tiles.nbytes/1e6:.0f}MB; ideal {stream/819e9*1e3:.3f} ms",
      flush=True)

out = np.asarray(run(a_ptr, a_pc, a_tl, a_vt))
for blk in (0, nb - 1):
    lo, hi = block_ptr[blk], block_ptr[blk + 1]
    ref = np.zeros((R, k), np.float32)
    for p in range(lo, hi):
        slab = v_t[:, pair_chunk[p] * C: pair_chunk[p] * C + C]
        ref += tiles[p].astype(np.float32) @ slab.T.astype(np.float32)
    err = np.max(np.abs(out[blk] - ref) / (np.abs(ref) + 1))
    print(f"block {blk}: pairs {hi-lo} rel err {err:.2e}", flush=True)

t0 = time.time()
timing, _ = measure_amortized(
    lambda vt_, ptr, pc, tl: run(ptr, pc, tl, vt_),
    a_vt, a_ptr, a_pc, a_tl, inner=8, warmup=2, iters=3)
per = timing.seconds_per_iter
print(f"v6 kernel: {per*1e3:.3f} ms ({per/P*1e9:.1f} ns/tile, "
      f"{stream/per/1e9:.0f} GB/s; wall {time.time()-t0:.0f}s)", flush=True)
