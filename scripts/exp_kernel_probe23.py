#!/usr/bin/env python
"""Probe 23: why don't the MXU dots OVERLAP the tile/slab DMA streams?

probe22 decomposition on full cop20k (U=16, (128,128), split3):
  streams only (all_nodot)   0.95 ms   (843 MB -> ~at the byte floor)
  full kernel (all_split3)   1.45-1.49 ms
The full kernel behaves like STREAMS + DOTS (sum), not MAX(streams,
dots) — the ~0.5 ms of MXU work is not hidden behind the DMA pipeline.
If overlap were achieved, the headline would sit at the ~1.05-1.1 ms
DMA floor (~2.4 Gnnz/s, the BASELINE.md ceiling). Two serialization
suspects, each isolated here:

  (a) the SERIAL ACCUMULATOR chain: every pair's dots += into ONE VMEM
      scratch, so 16 MXU ops per step form a dependency chain;
  (b) the PER-PAIR @pl.when flush conditional (SMEM read + compare +
      side-effecting branch between every pair's dots) forbids Mosaic
      from reordering/pipelining across pairs.

Variants (wrong-math ones are TIMING ONLY, clearly marked):

  control      production split3 (re-measure)
  acc2         two alternating accumulators, flush sums them — CORRECT
               math (differentially checked in interpret mode); halves
               chain (a)
  nocond       flush only at step boundaries — WRONG math; removes (b)
  acc2_nocond  both — WRONG math; the overlap ceiling if (a)+(b) are
               the whole story
  dotsonly     fixed tile + fixed slab blocks, dots + conditionals but
               no byte streams — WRONG math; the pure compute+issue leg
  tiles_nodot  tile stream only, no dots (probe22's variant that died
               on a transient remote-compile HTTP 500) — WRONG math

Writes results/probe23_overlap.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_kernel_probe23.py
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


def _kernel(pb_ref, pc_ref, fl_ref, tiles_ref, *rest, U, C, n_slabs,
            n_acc, per_pair_cond, streams, precomp=False):
    # precomp: fl_ref carries HOST-PRECOMPUTED per-pair flush flags
    # (block differs from the previous pair). Removes the SMEM cur[0]
    # read-modify-write from the per-pair branch CONDITION; the branch
    # itself remains.
    slab_refs = rest[:n_slabs]
    out_ref = rest[n_slabs]
    accs = rest[n_slabs + 1:n_slabs + 1 + n_acc]
    stage, cur, prev, cnt, sem = rest[n_slabs + 1 + n_acc:]
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

    if not per_pair_cond:
        # WRONG MATH (timing only): one unconditional flush per step.
        @pl.when(s > 0)
        def _():
            cur[0] = pb_ref[s * U]
            flush()

    for u in range(U):
        if per_pair_cond and precomp:
            idx = s * U + u

            @pl.when(fl_ref[idx] != 0)
            def _(idx=idx):
                flush()
                cur[0] = pb_ref[idx]
        elif per_pair_cond:
            b = pb_ref[s * U + u]

            @pl.when(b != cur[0])
            def _(b=b):
                flush()
                cur[0] = b

        acc = accs[u % n_acc]
        sl = slab_refs[u][0] if n_slabs == U else slab_refs[0][0]
        if streams == "tiles_only_touch":
            acc[...] += tiles_ref[u][:1, :1].astype(jnp.float32)
        else:
            t = tiles_ref[u]
            acc[...] += (_dot_kc_cr(sl[:, :C], t[:C])
                         + _dot_kc_cr(sl[:, :C], t[C:])
                         + _dot_kc_cr(sl[:, C:], t[:C]))

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


@functools.partial(jax.jit,
                   static_argnames=("nb", "U", "mode", "interpret"))
def run_mode(pb, pc, tiles_t, slabs, *, nb, U, mode, interpret=False):
    P, C2, R = tiles_t.shape
    C = C2 // 2
    S = P // U
    k8 = K

    def slab_spec(u):
        return pl.BlockSpec(
            (1, k8, 2 * C),
            lambda s, pb_, pc_, fl_, u=u: (pc_[s * U + u], 0, 0))

    fixed_slab = pl.BlockSpec(
        (1, k8, 2 * C), lambda s, pb_, pc_, fl_: (0, 0, 0))
    tile_spec = pl.BlockSpec((U, C2, R), lambda s, pb_, pc_, fl_: (s, 0, 0))
    fixed_tile = pl.BlockSpec((U, C2, R),
                              lambda s, pb_, pc_, fl_: (0, 0, 0))

    n_acc, per_pair_cond, streams, precomp = {
        "control":      (1, True, "all", False),
        "acc2":         (2, True, "all", False),
        "acc4":         (4, True, "all", False),
        "nocond":       (1, False, "all", False),
        "acc2_nocond":  (2, False, "all", False),
        "precomp":      (1, True, "all", True),
        "acc2_precomp": (2, True, "all", True),
        "dotsonly":     (1, True, "none", False),
        "tiles_nodot":  (1, True, "tiles_only_touch", False),
    }[mode]
    # Host-precomputable flush flags: pair i flushes iff its block
    # differs from pair i-1's (pair 0 never flushes — cur starts there).
    flags = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (pb[1:] != pb[:-1]).astype(jnp.int32)])

    if streams == "all":
        in_specs = [tile_spec, *[slab_spec(u) for u in range(U)]]
        ops = (tiles_t, *([slabs] * U))
        n_slabs = U
    elif streams == "none":
        in_specs = [fixed_tile, fixed_slab]
        ops = (tiles_t, slabs)
        n_slabs = 1
    else:  # tiles_only_touch
        in_specs = [tile_spec, fixed_slab]
        ops = (tiles_t, slabs)
        n_slabs = 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            *[pltpu.VMEM((k8, R), jnp.float32) for _ in range(n_acc)],
            pltpu.VMEM((k8, R), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, U=U, C=C, n_slabs=n_slabs,
                          n_acc=n_acc, per_pair_cond=per_pair_cond,
                          streams=streams),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, k8, R), jnp.float32),
        interpret=interpret,
    )(pb, pc, flags, *ops)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    records = {"device": dev.device_kind, "k": K}

    csr = cop20k_like(dtype=np.float32)
    n = csr.shape[1]
    wp = WindowedPairs.from_csr(csr)
    R, C = wp.block_rows, wp.chunk_cols
    nb, P = wp.n_blocks, wp.n_pairs
    ts_host = _tiles_t(np.asarray(wp.tiles), np.asarray(wp.tiles_split))
    pb = jnp.asarray(wp.pair_block)
    pc = jnp.asarray(wp.pair_chunk)
    records["format"] = {"R": R, "C": C, "P": P, "nb": nb, "U": 16,
                         "nnz": csr.nnz}
    print(f"format: R={R} C={C} P={P} nb={nb}", flush=True)

    v = np.asarray(generate_fat_vector(n, K, seed=0), np.float32)
    v_p = wp.encode(jnp.asarray(v))
    (slabs_host,) = chunk_slabs(v_p, C=C, split=True)

    # Correctness gate for acc2/acc4 (interpret, tiny slice): the only
    # variants eligible for production must match control exactly.
    S_check = 8
    P_chk = S_check * 16
    tiles_chk = jnp.asarray(ts_host[:P_chk])
    ref = run_mode(pb[:P_chk], pc[:P_chk], tiles_chk,
                   jnp.asarray(slabs_host), nb=nb, U=16,
                   mode="control", interpret=True)
    # Only blocks covered by the truncated pair list are flushed; the
    # rest of the out buffer is uninitialized in BOTH runs — compare
    # the touched rows only.
    touched = np.unique(np.asarray(pb[:P_chk]))
    ref = ref[touched]
    scale = float(jnp.abs(ref).max()) or 1.0
    for mode in ("acc2", "acc4", "precomp", "acc2_precomp"):
        got = run_mode(pb[:P_chk], pc[:P_chk], tiles_chk,
                       jnp.asarray(slabs_host), nb=nb, U=16,
                       mode=mode, interpret=True)[touched]
        # Split accumulators reassociate the f32 pair sum — identical
        # arithmetic terms, different order, so equality is relative
        # (measured ~1e-5 rel on CPU interpret).
        err = float(jnp.abs(got - ref).max()) / scale
        print(f"interpret check {mode}: rel={err:.2e}", flush=True)
        assert err < 1e-5, (mode, err)
    records["interpret_check"] = "acc2/acc4 match control to 1e-5 rel"

    ts = jax.device_put(jnp.asarray(ts_host), dev)
    slabs = jax.device_put(jnp.asarray(slabs_host), dev)

    results = {}
    for mode in ("control", "acc2", "acc4", "nocond", "acc2_nocond",
                 "precomp", "acc2_precomp", "dotsonly", "tiles_nodot"):
        try:
            # tiles must be a jit ARGUMENT: a closure-captured 674 MB
            # array bakes into the HLO and breaks remote compile with
            # HTTP 413 (CLAUDE.md; probe22's body(sl, ts_) pattern).
            def body(sl, ts_, mode=mode):
                return run_mode(pb, pc, ts_, sl, nb=nb, U=16, mode=mode)

            timing, _ = measure_amortized(body, slabs, ts, inner=10)
            sec = (timing.seconds_per_iter if timing.resolved
                   else timing.upper_bound)
            results[mode] = {"ms": sec * 1e3,
                             "ns_per_pair": sec / P * 1e9,
                             "resolved": bool(timing.resolved)}
            print(f"{mode}: {sec*1e3:.3f} ms ({sec/P*1e9:.1f} ns/pair)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            results[mode] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{mode}: FAILED {results[mode]['error']}", flush=True)
    records["modes"] = results

    dst = os.path.join(REPO, "results", "probe23_overlap.json")
    with open(dst, "w") as f:
        json.dump(records, f, indent=2)
    print(f"wrote {dst}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
