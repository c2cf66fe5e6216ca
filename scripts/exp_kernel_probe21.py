#!/usr/bin/env python
"""Probe 21: accumulator banking — break the per-pair acc RAW chain.

probe20 decomposed the U=16 streamed kernel: byte floor 92 ns/pair
(~870 GB/s over tiles+slabs), split3 dots add ~55 ns/pair SERIALLY
(hi1 +39, each extra dot +8) — the MXU work is not hidden behind the
DMA stream. Hypothesis: every pair's ``acc[...] += d1 + d2 + d3``
serializes on the previous pair's result (a U-long RAW chain through
the single accumulator each step, with ~673 same-block runs making the
chain effectively P-long). Banked accumulators (pair u -> bank u % B,
summed at flush) cut the chain by B and let consecutive pairs' dots
pipeline.

Variants, full cop20k stand-in, legacy streamed layout, amortized
chained timing (inner=20, iters=5): split3 x banks {1, 2, 4}, hi1 x
banks {1, 2}. Correctness vs the host f64 oracle per variant.

Writes results/probe21_banks.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_kernel_probe21.py
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
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    _dot_kc_cr, chunk_slabs,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

K = 32


def _kernel_banked(pb_ref, pc_ref, tiles_ref, *rest, U, C, B, variant):
    slab_refs = rest[:U]
    out_ref, acc, stage, cur, prev, cnt, sem = rest[U:]
    s = pl.program_id(0)
    S = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        cur[0] = pb_ref[0]
        cnt[0] = 0
        acc[...] = jnp.zeros(acc.shape, acc.dtype)

    def flush():
        @pl.when(cnt[0] == 1)
        def _():
            pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()
        total = acc[0]
        for b in range(1, B):
            total = total + acc[b]
        stage[...] = total
        pltpu.make_async_copy(stage, out_ref.at[cur[0]], sem).start()
        prev[0] = cur[0]
        cnt[0] = 1
        acc[...] = jnp.zeros(acc.shape, acc.dtype)

    for u in range(U):
        b = pb_ref[s * U + u]

        @pl.when(b != cur[0])
        def _(b=b):
            flush()
            cur[0] = b

        t = tiles_ref[u]
        sl = slab_refs[u][0]
        if variant == "split3":
            d = (_dot_kc_cr(sl[:, :C], t[:C])
                 + _dot_kc_cr(sl[:, :C], t[C:])
                 + _dot_kc_cr(sl[:, C:], t[:C]))
        else:  # hi1
            d = _dot_kc_cr(sl[:, :C], t[:C])
        acc[u % B] += d

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


@functools.partial(jax.jit, static_argnames=("nb", "U", "B", "variant"))
def run_banked(pb, pc, tiles_t, slabs, *, nb, U, B, variant):
    P, C2, R = tiles_t.shape
    C = C2 // 2
    S = P // U
    k8 = K

    def slab_spec(u):
        return pl.BlockSpec(
            (1, k8, 2 * C), lambda s, pb_, pc_, u=u: (pc_[s * U + u], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((U, C2, R), lambda s, pb_, pc_: (s, 0, 0)),
            *[slab_spec(u) for u in range(U)],
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((B, k8, R), jnp.float32),
            pltpu.VMEM((k8, R), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_banked, U=U, C=C, B=B, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, k8, R), jnp.float32),
    )(pb, pc, tiles_t, *([slabs] * U))


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    records = {"device": dev.device_kind, "k": K}

    csr = cop20k_like(dtype=np.float32)
    m, n = csr.shape
    nnz = csr.nnz
    wp = WindowedPairs.from_csr(csr)
    R, C = wp.block_rows, wp.chunk_cols
    nb = wp.n_blocks
    ts = jax.device_put(jnp.asarray(
        _tiles_t(np.asarray(wp.tiles), np.asarray(wp.tiles_split))), dev)
    pb = jnp.asarray(wp.pair_block)
    pc = jnp.asarray(wp.pair_chunk)
    P = wp.n_pairs
    print(f"format: R={R} C={C} P={P} nb={nb}", flush=True)
    records["format"] = {"R": R, "C": C, "P": P, "nb": nb}

    v = np.asarray(generate_fat_vector(n, K, seed=0), np.float32)
    v_p = wp.encode(jnp.asarray(v))
    (slabs,) = chunk_slabs(v_p, C=C, split=True)
    slabs = jax.device_put(slabs, dev)
    ref = spmm_host_f64(csr, v)
    ref_scale = float(np.abs(ref).max()) or 1.0

    results = {}
    for variant, B in (("split3", 1), ("split3", 2), ("split3", 4),
                       ("split3", 8), ("hi1", 1), ("hi1", 2)):
        tag = f"{variant}_B{B}"
        try:
            def body(sl, ts_):
                return run_banked(pb, pc, ts_, sl, nb=nb, U=16, B=B,
                                  variant=variant)

            rel = None
            if variant == "split3":
                out = body(slabs, ts)
                comp = jnp.swapaxes(out, 1, 2).reshape(nb * R, K)
                got = np.asarray(wp.decode(comp[: wp.pad_rows]),
                                 np.float64)
                rel = float(np.abs(got - ref).max() / ref_scale)
            timing, _ = measure_amortized(body, slabs, ts, inner=20,
                                          warmup=1, iters=5)
            sec = timing.seconds_per_iter
            print(f"{tag}: {sec*1e3:.3f} ms ({sec/P*1e9:.1f} ns/pair) -> "
                  f"{nnz/sec/1e9:.3f} Gnnz/s"
                  + (f" rel={rel:.2e}" if rel is not None else ""),
                  flush=True)
            results[tag] = {"ms": sec * 1e3, "ns_per_pair": sec / P * 1e9,
                            "gnnz_per_s": nnz / sec / 1e9,
                            "rel_vs_oracle": rel,
                            "noise_s": timing.noise}
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {str(e)[:400]}"
            print(f"{tag}: FAILED {msg}", flush=True)
            results[tag] = {"error": msg}
    records["variants"] = results

    out_path = os.path.join(REPO, "results", "probe21_banks.json")
    with open(out_path, "w") as f:
        json.dump(records, f, indent=2)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
