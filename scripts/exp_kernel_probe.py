#!/usr/bin/env python
"""Isolate the cost components of the windowed Pallas kernel on the TPU.

Variants (all on synthetic pair data shaped like the cop20k build):
  full       — the real kernel (slab DMA + dynamic out revisit)
  noslab     — slab DMA only at p==0 (isolates DMA issue/wait cost)
  staticout  — out index fixed to block 0 (isolates dynamic-index cost)
  nodot      — copy tile row instead of matmul (isolates MXU cost)
Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python scripts/exp_kernel_probe.py
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

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
C = int(sys.argv[2]) if len(sys.argv) > 2 else 128
k = 32
P = 14000
nb = 121192 // R + 1
pairs_per_block = P // nb + 1

rng = np.random.default_rng(0)
pair_block = np.repeat(np.arange(nb, dtype=np.int32), pairs_per_block)[:P]
pair_chunk = rng.integers(0, 900, size=P).astype(np.int32)
tiles = rng.uniform(-1, 1, size=(P, R, C)).astype(np.float32)
n_pad = 947 * 128
v_t = rng.uniform(-1, 1, size=(k, n_pad)).astype(np.float32)


def make_kernel(slab_dma, static_out, do_dot, precision):
    def kernel(pb_ref, pc_ref, tiles_ref, v_ref, out_ref, buf0, buf1, sems):
        p = pl.program_id(0)
        num_p = pl.num_programs(0)

        def dma(buf, slot, idx):
            start = pc_ref[idx] * C
            return pltpu.make_async_copy(
                v_ref.at[:, pl.ds(start, C)], buf, sems.at[slot])

        if slab_dma:
            even = p % 2 == 0

            @pl.when(p == 0)
            def _():
                dma(buf0, 0, 0).start()

            @pl.when(jnp.logical_and(p + 1 < num_p, even))
            def _():
                dma(buf1, 1, p + 1).start()

            @pl.when(jnp.logical_and(p + 1 < num_p,
                                     jnp.logical_not(even)))
            def _():
                dma(buf0, 0, p + 1).start()

            @pl.when(even)
            def _():
                dma(buf0, 0, p).wait()

            @pl.when(jnp.logical_not(even))
            def _():
                dma(buf1, 1, p).wait()
            slab = jnp.where(even, buf0[:], buf1[:])
        else:
            @pl.when(p == 0)
            def _():
                d = dma(buf0, 0, 0)
                d.start()
                d.wait()
            slab = buf0[:]

        if do_dot:
            acc = jax.lax.dot_general(
                tiles_ref[0], slab,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=out_ref.dtype,
                precision=precision,
            )
        else:
            acc = tiles_ref[0, :, :k] * 1.0

        prev = pb_ref[jnp.maximum(p - 1, 0)]
        is_first = jnp.logical_or(p == 0, pb_ref[p] != prev)

        @pl.when(is_first)
        def _():
            out_ref[0] = acc

        @pl.when(jnp.logical_not(is_first))
        def _():
            out_ref[0] = out_ref[0] + acc

    if static_out:
        out_map = lambda p, pb, pc: (0, 0, 0)
    else:
        out_map = lambda p, pb, pc: (pb[p], 0, 0)

    @functools.partial(jax.jit, static_argnames=())
    def run(pb, pc, tl, vt):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(P,),
            in_specs=[
                pl.BlockSpec((1, R, C), lambda p, pb_, pc_: (p, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, R, k), out_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((k, C), vt.dtype),
                pltpu.VMEM((k, C), vt.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        )(pb, pc, tl, vt)

    return run


HI = jax.lax.Precision.HIGHEST
DE = jax.lax.Precision.DEFAULT
variants = [
    ("full f32-HI", make_kernel(True, False, True, HI)),
    ("full f32-DEF", make_kernel(True, False, True, DE)),
    ("noslab", make_kernel(False, False, True, HI)),
    ("staticout", make_kernel(True, True, True, HI)),
    ("nodot", make_kernel(True, False, False, HI)),
]

dev = jax.devices()[0]
args = [jax.device_put(x, dev) for x in (pair_block, pair_chunk, tiles, v_t)]
stream_bytes = tiles.nbytes + P * C * k * 4
print(f"R={R} C={C} P={P} tiles {tiles.nbytes/1e6:.0f}MB; "
      f"ideal stream {stream_bytes/819e9*1e3:.3f} ms", flush=True)
for tag, run in variants:
    t0 = time.time()
    timing, _ = measure_amortized(
        lambda vt_, pb, pc, tl: run(pb, pc, tl, vt_),
        args[3], args[0], args[1], args[2], inner=8, warmup=2, iters=3)
    per = timing.seconds_per_iter
    print(f"{tag:14s}: {per*1e3:7.3f} ms  ({per/P*1e9:6.1f} ns/pair; "
          f"wall {time.time()-t0:.0f}s)", flush=True)
