#!/usr/bin/env python
"""Probe v13: MXU-bound-kernel countermeasures (run each exp on TPU).

probe10 established the windowed pair kernel is MXU/overhead-bound, not
DMA-bound: f32 HIGHEST = 6 bf16 passes, and the k=32 output is padded to
128 MXU lanes (4x waste) — measured 403 ns/tile at (256,128) == model
(114 ns fixed + 6 passes x 48 ns k-padded). Candidates:

  split3  — manual 3-pass f32: tiles pre-split into bf16 hi/lo planes
            (hi = round-to-bf16, lo = residual, exactly representable),
            slab split in-kernel; out += th@sh + tl@sh + th@sl at DEFAULT
            precision. Mosaic lacks Precision.HIGH (probe10h), so this is
            the only 3-pass route. Same DMA bytes as f32.
  tdot    — transposed dot (k,C)@(C,R)->(k,R): output lanes = R (full MXU
            width) with k=32 on the streamed dim; probes whether Mosaic's
            MXU time scales with streamed rows or pads them.
  ptrans  — Pallas relayout kernel for the per-iterate chunk transpose
            (pad,32)->(chunks,32,C) that XLA runs at ~74 GB/s (0.4 ms);
            also the fused variant emitting bf16 hi/lo slabs directly.
  scat    — spill restore via scatter-add over the 23k spill rows vs the
            current take over all m rows (ops/ell.py::spmm_bucketed).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 \
       python scripts/exp_kernel_probe13.py <exp> [R] [C]
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

EXP = sys.argv[1]
R = int(sys.argv[2]) if len(sys.argv) > 2 else 256
C = int(sys.argv[3]) if len(sys.argv) > 3 else 128
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


def split_bf16(x32):
    hi = x32.astype(jnp.bfloat16)
    lo = (x32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def report(tag, per, stream_bytes, P_):
    print(f"{tag}: {per*1e3:.3f} ms ({per/P_*1e9:.1f} ns/tile, "
          f"{stream_bytes/per/1e9:.0f} GB/s)", flush=True)


if EXP == "split3":
    tiles32 = rng.uniform(-1, 1, size=(P, R, C)).astype(np.float32)
    v32 = rng.uniform(-1, 1, size=(n_pad // C, k, C)).astype(np.float32)
    th_np = tiles32.astype(jnp.bfloat16)
    tl_np = (tiles32 - np.asarray(th_np, np.float32)).astype(jnp.bfloat16)

    def kernel(pb_ref, pc_ref, first_ref, th_ref, tl_ref, slab_ref,
               out_ref):
        p = pl.program_id(0)

        @pl.when(first_ref[p] == 1)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        sh, sl = split_bf16(slab_ref[0])
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0] += dot(th_ref[0], sh) + dot(tl_ref[0], sh) \
            + dot(th_ref[0], sl)

    @jax.jit
    def run(vc, pb, pc, fr, th, tl):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(P,),
            in_specs=[
                pl.BlockSpec((1, R, C), lambda p, pb, pc, fr: (p, 0, 0)),
                pl.BlockSpec((1, R, C), lambda p, pb, pc, fr: (p, 0, 0)),
                pl.BlockSpec((1, k, C), lambda p, pb, pc, fr:
                             (pc[p], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, R, k),
                                   lambda p, pb, pc, fr: (pb[p], 0, 0)),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        )(pb, pc, fr, th, tl, vc)

    args = [jax.device_put(x, dev) for x in
            (v32, pair_block, pair_chunk, first, th_np, tl_np)]
    stream = P * R * C * 4 + P * C * k * 4 + nb * R * k * 4
    print(f"split3 R={R} C={C} P={P} stream {stream/1e6:.0f}MB; "
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
        err = np.max(np.abs(out[blk] - ref) / (np.abs(ref) + 1))
        print(f"  block {blk}: pairs {len(sel)} rel err {err:.2e}",
              flush=True)
    timing, _ = measure_amortized(
        lambda vc, *a: run(vc, *a), *args, inner=8, warmup=2, iters=3)
    report(f"split3({R},{C})", timing.seconds_per_iter, stream, P)
    print(f"wall {time.time()-t0:.0f}s", flush=True)

elif EXP == "tdot":
    tilesT32 = rng.uniform(-1, 1, size=(P, C, R)).astype(np.float32)
    v32 = rng.uniform(-1, 1, size=(n_pad // C, k, C)).astype(np.float32)

    def kernel(pb_ref, pc_ref, first_ref, tile_ref, slab_ref, out_ref):
        p = pl.program_id(0)

        @pl.when(first_ref[p] == 1)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        # (k, C) @ (C, R) -> (k, R): full MXU lanes, k on streamed dim.
        out_ref[0] += jax.lax.dot_general(
            slab_ref[0], tile_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def run(vc, pb, pc, fr, tl):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(P,),
            in_specs=[
                pl.BlockSpec((1, C, R), lambda p, pb, pc, fr: (p, 0, 0)),
                pl.BlockSpec((1, k, C), lambda p, pb, pc, fr:
                             (pc[p], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, k, R),
                                   lambda p, pb, pc, fr: (pb[p], 0, 0)),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, k, R), jnp.float32),
        )(pb, pc, fr, tl, vc)

    args = [jax.device_put(x, dev) for x in
            (v32, pair_block, pair_chunk, first, tilesT32)]
    stream = P * R * C * 4 + P * C * k * 4 + nb * R * k * 4
    print(f"tdot R={R} C={C} P={P} stream {stream/1e6:.0f}MB", flush=True)
    t0 = time.time()
    out = np.asarray(run(*args))
    blk = 0
    sel = np.nonzero(pair_block == blk)[0]
    ref = np.zeros((k, R), np.float64)
    for p in sel:
        ref += v32[pair_chunk[p]].astype(np.float64) @ \
            tilesT32[p].astype(np.float64)
    err = np.max(np.abs(out[blk] - ref) / (np.abs(ref) + 1))
    print(f"  block {blk}: pairs {len(sel)} rel err {err:.2e}", flush=True)
    timing, _ = measure_amortized(
        lambda vc, *a: run(vc, *a), *args, inner=8, warmup=2, iters=3)
    report(f"tdot({R},{C})", timing.seconds_per_iter, stream, P)
    print(f"wall {time.time()-t0:.0f}s", flush=True)

elif EXP == "ptrans":
    n_chunks = n_pad // C
    v = rng.uniform(-1, 1, size=(n_pad, k)).astype(np.float32)
    a_v = jax.device_put(v, dev)

    # XLA baseline.
    @jax.jit
    def xla_t(vv):
        return jnp.swapaxes(vv.reshape(-1, C, k), 1, 2)

    timing, _ = measure_amortized(xla_t, a_v, inner=16, warmup=2, iters=3)
    by = n_pad * k * 4 * 2
    print(f"xla swapaxes: {timing.seconds_per_iter*1e6:.0f} us "
          f"({by/timing.seconds_per_iter/1e9:.0f} GB/s)", flush=True)

    # Pallas transpose: grid over chunks, block (C, k) -> (k, C).
    def tkern(v_ref, out_ref):
        out_ref[0] = jnp.swapaxes(v_ref[0], 0, 1)

    @jax.jit
    def pallas_t(vv):
        return pl.pallas_call(
            tkern,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((1, C, k), lambda c: (c, 0, 0))],
            out_specs=pl.BlockSpec((1, k, C), lambda c: (c, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_chunks, k, C), jnp.float32),
        )(vv.reshape(n_chunks, C, k))

    ok = np.allclose(np.asarray(pallas_t(a_v)), np.asarray(xla_t(a_v)))
    timing, _ = measure_amortized(pallas_t, a_v, inner=16, warmup=2,
                                  iters=3)
    print(f"pallas trans: {timing.seconds_per_iter*1e6:.0f} us "
          f"({by/timing.seconds_per_iter/1e9:.0f} GB/s) ok={ok}",
          flush=True)

    # Fused variant: transpose + bf16 hi/lo split in one pass.
    def tsplit_kern(v_ref, hi_ref, lo_ref):
        t = jnp.swapaxes(v_ref[0], 0, 1)
        hi = t.astype(jnp.bfloat16)
        hi_ref[0] = hi
        lo_ref[0] = (t - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    @jax.jit
    def pallas_tsplit(vv):
        return pl.pallas_call(
            tsplit_kern,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((1, C, k), lambda c: (c, 0, 0))],
            out_specs=[
                pl.BlockSpec((1, k, C), lambda c: (c, 0, 0)),
                pl.BlockSpec((1, k, C), lambda c: (c, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks, k, C), jnp.bfloat16),
                jax.ShapeDtypeStruct((n_chunks, k, C), jnp.bfloat16),
            ],
        )(vv.reshape(n_chunks, C, k))

    hi, lo = pallas_tsplit(a_v)
    rec = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    ok = np.allclose(rec, np.asarray(xla_t(a_v)), atol=1e-7)
    timing, _ = measure_amortized(
        lambda vv: pallas_tsplit(vv)[0], a_v, inner=16, warmup=2, iters=3)
    print(f"pallas trans+split: {timing.seconds_per_iter*1e6:.0f} us "
          f"ok={ok}", flush=True)

elif EXP == "scat":
    n_rows = 23338
    idx = np.sort(rng.choice(m, size=n_rows, replace=False)).astype(
        np.int32)
    payload = rng.uniform(-1, 1, size=(n_rows, k)).astype(np.float32)
    base = rng.uniform(-1, 1, size=(n_pad, k)).astype(np.float32)
    a_i, a_p, a_b = [jax.device_put(x, dev) for x in (idx, payload, base)]

    @jax.jit
    def scatter_add(b, i, p):
        return b.at[i].add(p, indices_are_sorted=True,
                           unique_indices=True)

    timing, _ = measure_amortized(
        lambda b, i, p: scatter_add(b, i, p), a_b, a_i, a_p,
        inner=16, warmup=2, iters=3)
    print(f"scatter-add {n_rows} rows: "
          f"{timing.seconds_per_iter*1e6:.0f} us", flush=True)

    # Current restore analog: take over all m rows then full add.
    stacked = rng.uniform(-1, 1, size=(n_rows + 1, k)).astype(np.float32)
    inv = rng.integers(0, n_rows + 1, size=m).astype(np.int32)
    a_s, a_inv = jax.device_put(stacked, dev), jax.device_put(inv, dev)

    @jax.jit
    def take_restore(b, s, i):
        sp = jnp.take(s, i, axis=0)
        pad = b.shape[0] - sp.shape[0]
        sp = jnp.concatenate([sp, jnp.zeros((pad, k), sp.dtype)])
        return b + sp

    timing, _ = measure_amortized(
        lambda b, s, i: take_restore(b, s, i), a_b, a_s, a_inv,
        inner=16, warmup=2, iters=3)
    print(f"take-restore over m={m}: "
          f"{timing.seconds_per_iter*1e6:.0f} us", flush=True)
else:
    raise SystemExit(f"unknown exp {EXP}")
