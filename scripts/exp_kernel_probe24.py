#!/usr/bin/env python
"""Probe 24: fuse the two th-terms of split3 into ONE MXU dot.

probe23 established the U-pair kernel is COMPUTE-leg-bound: the three
small per-pair dots + adds measure ~86 ns/pair standalone (dotsonly
1.32 ms vs 0.95 ms streams). The split3 sum

    acc += sh@th + sh@tl + sl@th

has two terms sharing the RHS ``th``. Row-stacking the slab planes
SUBLANE-wise, ``[sh; sl] (2k, C)``, computes both in one dot:

    r = [sh; sl] @ th        # (2k, R): rows [:k] = sh@th, [k:] = sl@th
    acc += r[:k] + r[k:] + sh @ tl

i.e. 2 dots/pair instead of 3 (identical arithmetic terms). If the
~86 ns/pair is fixed-per-dot issue/latency cost, this saves up to a
third of the compute leg (~0.25 ms on cop20k); if MXU cost scales with
total rows (32+32+32 = 64+32), it saves nothing — this probe decides.

The lane-stacked dual ([th | tl] (C, 2R), one (k, 2R) dot for the two
sh-terms) is measured too.

Variants (all CORRECT math, differentially checked in interpret mode):

  control   acc2 production kernel (re-measure; lane-packed slabs)
  vstack    sublane-stacked slabs (2k, C); 2 dots/pair; acc2
  hstack    lane-stacked tile planes (C2=2C kept, tiles relaid to
            (C, 2R)); 2 dots/pair; acc2

Writes results/probe24_dotfuse.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_kernel_probe24.py
"""
import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsematrixmultiplicationmpi_tpu.formats.windowed import (
    WindowedPairs, _tiles_t,
)
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    cop20k_like, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    _dot_kc_cr, chunk_slabs,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

K = 32
N_ACC = 2


def _kernel(pb_ref, pc_ref, tiles_ref, *rest, U, C, form):
    slab_refs = rest[:U]
    out_ref = rest[U]
    accs = rest[U + 1:U + 1 + N_ACC]
    stage, cur, prev, cnt, sem = rest[U + 1 + N_ACC:]
    s = pl.program_id(0)
    S = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        cur[0] = pb_ref[0]
        cnt[0] = 0
        for a in accs:
            a[...] = jnp.zeros(a.shape, a.dtype)

    def flush():
        @pl.when(cnt[0] == 1)
        def _():
            pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()
        total = accs[0][...]
        for a in accs[1:]:
            total = total + a[...]
        stage[...] = total
        pltpu.make_async_copy(stage, out_ref.at[cur[0]], sem).start()
        prev[0] = cur[0]
        cnt[0] = 1
        for a in accs:
            a[...] = jnp.zeros(a.shape, a.dtype)

    k = accs[0].shape[0]
    for u in range(U):
        b = pb_ref[s * U + u]

        @pl.when(b != cur[0])
        def _(b=b):
            flush()
            cur[0] = b

        acc = accs[u % N_ACC]
        t = tiles_ref[u]
        sl = slab_refs[u][0]
        if form == "control":
            # lane-packed slab (k, 2C); tiles (2C, R) sublane-stacked
            acc[...] += (_dot_kc_cr(sl[:, :C], t[:C])
                         + _dot_kc_cr(sl[:, :C], t[C:])
                         + _dot_kc_cr(sl[:, C:], t[:C]))
        elif form == "vstack":
            # sublane-stacked slab (2k, C); tiles (2C, R)
            r = _dot_kc_cr(sl, t[:C])          # (2k, R): sh@th ; sl@th
            acc[...] += (r[:k] + r[k:]
                         + _dot_kc_cr(sl[:k], t[C:]))
        else:  # hstack
            # lane-packed slab (k, 2C); tiles (C, 2R) lane-stacked
            r = _dot_kc_cr(sl[:, :C], t)       # (k, 2R): sh@th | sh@tl
            acc[...] += (r[:, :acc.shape[1]] + r[:, acc.shape[1]:]
                         + _dot_kc_cr(sl[:, C:], t[:, :acc.shape[1]]))

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


@functools.partial(jax.jit,
                   static_argnames=("nb", "U", "form", "interpret"))
def run_form(pb, pc, tiles, slabs, *, nb, U, form, interpret=False):
    P = tiles.shape[0]
    if form == "hstack":
        C = tiles.shape[1]
        R = tiles.shape[2] // 2
        tile_blk = (U, C, 2 * R)
    else:
        C = tiles.shape[1] // 2
        R = tiles.shape[2]
        tile_blk = (U, 2 * C, R)
    if form == "vstack":
        k8 = slabs.shape[1] // 2
        slab_blk = (1, 2 * k8, C)
    else:
        k8 = slabs.shape[1]
        slab_blk = (1, k8, 2 * C)
    S = P // U

    def slab_spec(u):
        return pl.BlockSpec(
            slab_blk, lambda s, pb_, pc_, u=u: (pc_[s * U + u], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec(tile_blk, lambda s, pb_, pc_: (s, 0, 0)),
            *[slab_spec(u) for u in range(U)],
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            *[pltpu.VMEM((k8, R), jnp.float32) for _ in range(N_ACC)],
            pltpu.VMEM((k8, R), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, U=U, C=C, form=form),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, k8, R), jnp.float32),
        interpret=interpret,
    )(pb, pc, *((tiles,) + (slabs,) * U))


def vstack_slabs(slabs_lane):
    """(n_chunks, k, 2C) lane-packed hi|lo -> (n_chunks, 2k, C)
    sublane-stacked [hi; lo]."""
    n, k, c2 = slabs_lane.shape
    c = c2 // 2
    return np.concatenate(
        [np.asarray(slabs_lane)[:, :, :c], np.asarray(slabs_lane)[:, :, c:]],
        axis=1)


def hstack_tiles(tiles_t):
    """(P, 2C, R) sublane-stacked [th; tl] -> (P, C, 2R) lane-stacked
    [th | tl]."""
    p, c2, r = tiles_t.shape
    c = c2 // 2
    t = np.asarray(tiles_t)
    return np.concatenate([t[:, :c, :], t[:, c:, :]], axis=2)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    records = {"device": dev.device_kind, "k": K, "n_acc": N_ACC}

    csr = cop20k_like(dtype=np.float32)
    n = csr.shape[1]
    wp = WindowedPairs.from_csr(csr)
    R, C = wp.block_rows, wp.chunk_cols
    nb, P = wp.n_blocks, wp.n_pairs
    ts_host = _tiles_t(np.asarray(wp.tiles), np.asarray(wp.tiles_split))
    pb = jnp.asarray(wp.pair_block)
    pc = jnp.asarray(wp.pair_chunk)
    records["format"] = {"R": R, "C": C, "P": P, "nb": nb}
    print(f"format: R={R} C={C} P={P} nb={nb}", flush=True)

    v = np.asarray(generate_fat_vector(n, K, seed=0), np.float32)
    v_p = wp.encode(jnp.asarray(v))
    (slabs_host,) = chunk_slabs(v_p, C=C, split=True)
    slabs_host = np.asarray(slabs_host)
    vslabs_host = vstack_slabs(slabs_host)
    htiles_host = hstack_tiles(ts_host)

    # Interpret-mode differential: all three forms are the same
    # arithmetic terms (vstack/hstack only reassociate the final sum).
    S_chk = 8
    P_chk = S_chk * 16
    touched = np.unique(np.asarray(pb[:P_chk]))
    ref = run_form(pb[:P_chk], pc[:P_chk], jnp.asarray(ts_host[:P_chk]),
                   jnp.asarray(slabs_host), nb=nb, U=16, form="control",
                   interpret=True)[touched]
    scale = float(jnp.abs(ref).max()) or 1.0
    for form, tt, ss in (("vstack", ts_host[:P_chk], vslabs_host),
                         ("hstack", htiles_host[:P_chk], slabs_host)):
        got = run_form(pb[:P_chk], pc[:P_chk], jnp.asarray(tt),
                       jnp.asarray(ss), nb=nb, U=16, form=form,
                       interpret=True)[touched]
        err = float(jnp.abs(got - ref).max()) / scale
        print(f"interpret check {form}: rel={err:.2e}", flush=True)
        assert err < 1e-5, (form, err)
    records["interpret_check"] = "vstack/hstack match control to 1e-5"

    ts = jax.device_put(jnp.asarray(ts_host), dev)
    hts = jax.device_put(jnp.asarray(htiles_host), dev)
    slabs = jax.device_put(jnp.asarray(slabs_host), dev)
    vslabs = jax.device_put(jnp.asarray(vslabs_host), dev)

    results = {}
    for form, tt, ss in (("control", ts, slabs), ("vstack", ts, vslabs),
                         ("hstack", hts, slabs)):
        try:
            def body(sl_, tt_, form=form):
                return run_form(pb, pc, tt_, sl_, nb=nb, U=16, form=form)

            timing, _ = measure_amortized(body, ss, tt, inner=10)
            sec = (timing.seconds_per_iter if timing.resolved
                   else timing.upper_bound)
            results[form] = {"ms": sec * 1e3,
                             "ns_per_pair": sec / P * 1e9,
                             "resolved": bool(timing.resolved)}
            print(f"{form}: {sec*1e3:.3f} ms ({sec/P*1e9:.1f} ns/pair)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            results[form] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{form}: FAILED {results[form]['error']}", flush=True)
    records["forms"] = results

    dst = os.path.join(REPO, "results", "probe24_dotfuse.json")
    with open(dst, "w") as f:
        json.dump(records, f, indent=2)
    print(f"wrote {dst}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
