#!/usr/bin/env python
"""Probe v9: two-level strip kernel feasibility.

The windowed-pair format at (256, 128) streams 619 MB for 11 MB of nnz
(1.7 % tile occupancy). Strip stats (exp_strip_stats.py) show 8-row
strips cover the same nnz in ~380 MB with near-zero spill. The open
questions for a strip kernel are per-item overheads, measured here:

  1. SMEM capacity: can PrefetchScalarGridSpec carry a (~93k,) int32
     per-strip offset array?
  2. Per-window cost: strips of a (superblock, chunk) pair are
     contiguous; process them in W-strip windows: one (W*r, C) DMA +
     one (W*r, C) x (C, k) dot + W masked dynamic-sublane-offset
     accumulates into the (R, k) output block. Measures ns/window and
     ns/strip; the window DMA may read past the pair's strips into the
     next pair (contiguous array, masked adds) so there are NO padding
     bytes anywhere.

Synthetic data mirrors the RCM cop20k stand-in at strip granularity:
~93k strips over 6.8k pairs over 474 superblocks (r=8).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python scripts/exp_kernel_probe9.py [r] [W]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

r = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
R = 256          # superblock rows
C = 128          # chunk cols
k = 32
m = 121192
nb = m // R + 1  # 474
n_off = R // r

# Strip counts per r calibrated to exp_strip_stats (all nonempty strips).
S_TOTAL = {8: 92755, 16: 50775, 32: 28669}[r]
P = 6858  # superblock-level pairs

rng = np.random.default_rng(0)
# Pairs: sorted by block; strips per pair ~ S_TOTAL/P with skew.
pair_block = np.sort(rng.integers(0, nb, size=P).astype(np.int32))
pair_ptr = np.searchsorted(pair_block, np.arange(nb + 1)).astype(np.int32)
pair_chunk = rng.integers(0, (m // C) - 1, size=P).astype(np.int32)
raw = rng.pareto(2.0, size=P) + 0.5
counts = np.maximum(1, (raw / raw.sum() * S_TOTAL).astype(np.int64))
strip_ptr = np.zeros(P + 1, dtype=np.int32)
strip_ptr[1:] = np.cumsum(counts)
S = int(strip_ptr[-1])
# Per-strip row offset within the superblock (sorted within each pair).
offs = np.concatenate([
    np.sort(rng.choice(n_off, size=min(int(c), n_off), replace=False))
    .astype(np.int32).repeat(-(-int(c) // n_off))[: int(c)]
    for c in counts
]) if n_off < 64 else np.concatenate([
    np.sort(rng.integers(0, n_off, size=int(c))).astype(np.int32)
    for c in counts
])
strips = rng.uniform(-1, 1, size=(S + W, r, C)).astype(np.float32)
strips_flat = strips.reshape(-1, C)
offs_pad = np.concatenate([offs, np.zeros(W, np.int32)])
n_pad = (m // C + 1) * C
v_t = rng.uniform(-1, 1, size=(k, n_pad)).astype(np.float32)

print(f"r={r} W={W} strips={S} pairs={P} blocks={nb} "
      f"strip_bytes={S*r*C*4/1e6:.0f}MB offs_smem={S*4/1024:.0f}KB",
      flush=True)


def make_kernel(DW, DS):
    """DW window-buffer slots, DS slab slots."""
    rows = W * r

    def _kernel(pptr_ref, sptr_ref, pc_ref, off_ref, sflat_ref, v_ref,
                out_ref, wbufs, sbufs, wsems, ssems):
        b = pl.program_id(0)
        plo = pptr_ref[b]
        phi = pptr_ref[b + 1]

        def slab_copy(pi):
            return pltpu.make_async_copy(
                v_ref.at[:, pl.ds(pc_ref[pi] * C, C)],
                sbufs.at[pi % DS], ssems.at[pi % DS])

        # Global window index: windows partition each pair's strip run.
        # Window w of pair pi covers strips [sptr[pi]+w*W, ...+W) (may
        # overrun into the next pair; adds are masked by the true bound).
        def win_copy(pi, w, slot):
            q0 = sptr_ref[pi] + w * W
            return pltpu.make_async_copy(
                sflat_ref.at[pl.ds(q0 * r, rows), :],
                wbufs.at[slot], wsems.at[slot])

        # Software pipeline over (pair, window) with lookahead inside the
        # pair only for windows; slabs prefetched DS-1 pairs ahead.
        for d in range(DS - 1):
            @pl.when(plo + jnp.int32(d) < phi)
            def _(d=d):
                slab_copy(plo + jnp.int32(d)).start()

        out_ref[0] = jnp.zeros_like(out_ref[0])

        def pair_body(pi, wslot):
            @pl.when(pi + DS - 1 < phi)
            def _():
                slab_copy(pi + DS - 1).start()
            slab_copy(pi).wait()
            s_lo = sptr_ref[pi]
            s_hi = sptr_ref[pi + 1]
            n_win = (s_hi - s_lo + W - 1) // W

            def start_win(w, slot):
                @pl.when(w < n_win)
                def _():
                    win_copy(pi, w, slot).start()

            for d in range(DW - 1):
                start_win(jnp.int32(d), (wslot + d) % DW)

            def win_body(w, wslot):
                slot = wslot % DW
                start_win(w + DW - 1, (wslot + DW - 1) % DW)
                win_copy(pi, w, slot).wait()
                prod = jax.lax.dot_general(
                    wbufs[slot], sbufs[pi % DS],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (W*r, k)
                for t in range(W):  # masked per-strip accumulates
                    q = s_lo + w * W + t

                    @pl.when(q < s_hi)
                    def _(t=t, q=q):
                        o = off_ref[q]
                        out_ref[0, pl.ds(o * r, r), :] += \
                            prod[t * r:(t + 1) * r]
                return wslot + 1

            return jax.lax.fori_loop(0, n_win, win_body, wslot)

        jax.lax.fori_loop(plo, phi, pair_body, 0)

    return _kernel


def build(DW, DS):
    @jax.jit
    def run(pptr, sptr, pc, off, sfl, vt):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, R, k),
                                   lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((DW, W * r, C), jnp.float32),
                pltpu.VMEM((DS, k, C), jnp.float32),
                pltpu.SemaphoreType.DMA((DW,)),
                pltpu.SemaphoreType.DMA((DS,)),
            ],
        )
        return pl.pallas_call(
            make_kernel(DW, DS), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        )(pptr, sptr, pc, off, sfl, vt)
    return run


dev = jax.devices()[0]
args = [jax.device_put(x, dev) for x in
        (pair_ptr, strip_ptr, pair_chunk, offs_pad, strips_flat, v_t)]
stream = S * r * C * 4 + P * C * k * 4 + nb * R * k * 4
print(f"stream {stream/1e6:.0f}MB; ideal {stream/819e9*1e3:.3f} ms",
      flush=True)

first = True
for (DW, DS) in [(4, 4), (8, 4), (2, 4), (6, 6)]:
    t0 = time.time()
    run = build(DW, DS)
    try:
        out = np.asarray(run(*args))
    except Exception as e:
        print(f"DW={DW} DS={DS}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        continue
    if first:
        for blk in (0, nb // 2):
            ref = np.zeros((R, k), np.float32)
            for pi in range(pair_ptr[blk], pair_ptr[blk + 1]):
                slab = v_t[:, pair_chunk[pi] * C: pair_chunk[pi] * C + C]
                for q in range(strip_ptr[pi], strip_ptr[pi + 1]):
                    o = offs[q]
                    ref[o * r:(o + 1) * r] += strips[q] @ slab.T
            err = np.max(np.abs(out[blk] - ref) / (np.abs(ref) + 1))
            print(f"  block {blk}: pairs {pair_ptr[blk+1]-pair_ptr[blk]} "
                  f"rel err {err:.2e}", flush=True)
        first = False
    timing, _ = measure_amortized(
        lambda vt_, *rest: run(*rest[:4], rest[4], vt_),
        args[-1], *args[:-1], inner=8, warmup=2, iters=3)
    per = timing.seconds_per_iter
    n_win = int(np.sum(-(-np.diff(strip_ptr) // W)))
    print(f"DW={DW} DS={DS}: {per*1e3:.3f} ms ({per/S*1e9:.0f} ns/strip, "
          f"{per/n_win*1e9:.0f} ns/window, {stream/per/1e9:.0f} GB/s; "
          f"wall {time.time()-t0:.0f}s)", flush=True)
