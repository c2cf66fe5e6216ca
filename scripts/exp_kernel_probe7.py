#!/usr/bin/env python
"""Probe v7: find the DMA bandwidth ceiling for the windowed-pair kernel.

v6 established that S parallel sub-copies (separate semaphores) per tile
break the single-chain ~220 GB/s wall: 332 GB/s @ S=4, 357 @ S=8,
417 GB/s with (256,256) tiles. v7 sweeps pipeline depth D (number of
tile buffers / outstanding pairs), sub-streams S, tile shape and dtype in
ONE process (the 583 MB tile upload through the tunnel is paid once per
shape), plus a no-matmul variant to separate the DMA ceiling from
compute overlap.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_kernel_probe7.py [R] [C] [dtype]
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
tdtype = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") \
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


def make_kernel(S, D, do_dot):
    RS = R // S

    def _kernel(ptr_ref, pc_ref, tiles_ref, v_ref, out_ref,
                tbufs, sbufs, sems):
        b = pl.program_id(0)
        lo = ptr_ref[b]
        hi = ptr_ref[b + 1]
        total = ptr_ref[pl.num_programs(0)]

        def start_pair(p):
            @pl.when(p < total)
            def _():
                slot = p % D
                for s in range(S):
                    pltpu.make_async_copy(
                        tiles_ref.at[p, pl.ds(s * RS, RS), :],
                        tbufs.at[slot, pl.ds(s * RS, RS), :],
                        sems.at[slot, s],
                    ).start()
                pltpu.make_async_copy(
                    v_ref.at[:, pl.ds(pc_ref[p] * C, C)], sbufs.at[slot],
                    sems.at[slot, S]).start()

        @pl.when(b == 0)
        def _():
            for d in range(D - 1):
                start_pair(jnp.int32(d))

        out_ref[0] = jnp.zeros_like(out_ref[0])

        def body(p, _):
            start_pair(p + D - 1)
            slot = p % D
            for s in range(S):
                pltpu.make_async_copy(
                    tiles_ref.at[p, pl.ds(s * RS, RS), :],
                    tbufs.at[slot, pl.ds(s * RS, RS), :],
                    sems.at[slot, s]).wait()
            pltpu.make_async_copy(
                v_ref.at[:, pl.ds(pc_ref[p] * C, C)], sbufs.at[slot],
                sems.at[slot, S]).wait()
            if do_dot:
                out_ref[0] += jax.lax.dot_general(
                    tbufs[slot], sbufs[slot],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=out_ref.dtype,
                    precision=(jax.lax.Precision.HIGHEST
                               if tiles.dtype == jnp.float32
                               else jax.lax.Precision.DEFAULT))
            else:  # touch both buffers so the DMAs are not dead code
                out_ref[0, 0, 0] += tbufs[slot, 0, 0] + sbufs[slot, 0, 0]
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)

    return _kernel


def build(S, D, do_dot):
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
                pltpu.VMEM((D, R, C), tl.dtype),
                pltpu.VMEM((D, k, C), vt.dtype),
                pltpu.SemaphoreType.DMA((D, S + 1)),
            ],
        )
        return pl.pallas_call(
            make_kernel(S, D, do_dot), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        )(ptr, pc, tl, vt)
    return run


dev = jax.devices()[0]
a_ptr, a_pc, a_tl, a_vt = [
    jax.device_put(x, dev) for x in (block_ptr, pair_chunk, tiles, v_t)]
stream = tiles.nbytes + P * C * k * tiles.dtype.itemsize + nb * R * k * 4
print(f"R={R} C={C} P={P} dtype={tiles.dtype} tiles "
      f"{tiles.nbytes/1e6:.0f}MB; ideal {stream/819e9*1e3:.3f} ms",
      flush=True)

first = True
for (S, D, do_dot) in [(8, 2, True), (8, 3, True), (8, 4, True),
                       (16, 2, True), (16, 3, True), (16, 4, True),
                       (8, 4, False), (16, 4, False), (4, 4, True),
                       (4, 6, True), (8, 6, True)]:
    if R % S:
        continue
    t0 = time.time()
    run = build(S, D, do_dot)
    try:
        out = np.asarray(run(a_ptr, a_pc, a_tl, a_vt))
    except Exception as e:  # VMEM overflow etc.
        print(f"S={S} D={D} dot={do_dot}: FAILED "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        continue
    if first and do_dot:
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
        lambda vt_, ptr, pc, tl: run(ptr, pc, tl, vt_),
        a_vt, a_ptr, a_pc, a_tl, inner=8, warmup=2, iters=3)
    per = timing.seconds_per_iter
    print(f"S={S:2d} D={D} dot={int(do_dot)}: {per*1e3:.3f} ms "
          f"({per/P*1e9:.1f} ns/tile, {stream/per/1e9:.0f} GB/s; "
          f"wall {time.time()-t0:.0f}s)", flush=True)
