#!/usr/bin/env python
"""Probe 20: what actually bounds the U=16 transposed kernel, and can
fewer/fatter MXU issues beat split3?

probe19 (production phased kernel, full cop20k) found:
  * streamed tmulti runs ~137 ns/pair (606 GB/s effective over
    tiles+slabs) — probe18's 184 ns/pair slice baseline was anomalous,
  * the VMEM-resident slab window LOSES: its per-pair dynamic-index
    scalar cost (~28 ns) exceeds the slab bytes it saves (~21 ns).

So the remaining headroom is the non-byte cost: ~29 ns/pair issue +
77 ns/step (probe17 fit) ~ 25 % of wall time. split3 spends 3 MXU
issues per pair, each with M = k = 32 of 128 (quarter-utilized). This
probe A/Bs, on the FULL cop20k stand-in (legacy streamed layout,
amortized chained timing, iters=5):

  split3   : today's 3 dots  sh@th + sh@tl + sl@th          (baseline)
  mstack   : 2 dots [sh;sl](2k,C)@th -> [hh;lh]; sh@tl = hl (same terms,
             slabs sublane-STACKED (2k8, C) instead of lane-packed)
  hi1      : 1 dot sh@th (bf16-tier arithmetic, f32 bytes — issue floor)
  nodot    : no MXU work at all (pure stream+flush floor)

plus U in {16, 32} for mstack (fewer issues may move the VMEM optimum),
and a single-phase production A/B (resident vs streamed vs legacy) on a
~57k-column matrix where the whole slab array fits one resident window.

Writes results/probe20_dots.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
       python scripts/exp_kernel_probe20.py
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
    cop20k_like, fem3d_csr, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    _dot_kc_cr, chunk_slabs, windowed_matmul_tmulti,
)
from sparsematrixmultiplicationmpi_tpu.utils.timing import measure_amortized

K = 32


def _kernel_variant(pb_ref, pc_ref, tiles_ref, *rest, U, C, variant):
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
        stage[...] = acc[...]
        pltpu.make_async_copy(stage, out_ref.at[cur[0]], sem).start()
        prev[0] = cur[0]
        cnt[0] = 1
        acc[...] = jnp.zeros(acc.shape, acc.dtype)

    k8 = acc.shape[0]
    for u in range(U):
        b = pb_ref[s * U + u]

        @pl.when(b != cur[0])
        def _(b=b):
            flush()
            cur[0] = b

        t = tiles_ref[u]
        sl = slab_refs[u][0]
        if variant == "split3":
            acc[...] += (_dot_kc_cr(sl[:, :C], t[:C])
                         + _dot_kc_cr(sl[:, :C], t[C:])
                         + _dot_kc_cr(sl[:, C:], t[:C]))
        elif variant == "mstack":
            d1 = _dot_kc_cr(sl, t[:C])          # (2k8, R) = [hh; lh]
            d2 = _dot_kc_cr(sl[:k8], t[C:])     # (k8, R)  = hl
            acc[...] += d1[:k8] + d1[k8:] + d2
        elif variant == "hi1":
            acc[...] += _dot_kc_cr(sl[:, :C], t[:C])
        elif variant == "nodot":
            acc[...] += sl[:k8, :acc.shape[1]].astype(jnp.float32) \
                if sl.shape[1] >= acc.shape[1] else 0.0
        else:
            raise ValueError(variant)

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


@functools.partial(jax.jit, static_argnames=("nb", "U", "variant",
                                             "slab_shape"))
def run_variant(pb, pc, tiles_t, slabs, *, nb, U, variant, slab_shape):
    P, C2, R = tiles_t.shape
    C = C2 // 2
    S = P // U
    k8 = K

    def slab_spec(u):
        return pl.BlockSpec(
            slab_shape, lambda s, pb_, pc_, u=u: (pc_[s * U + u], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((U, C2, R), lambda s, pb_, pc_: (s, 0, 0)),
            *[slab_spec(u) for u in range(U)],
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((k8, R), jnp.float32),
            pltpu.VMEM((k8, R), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_variant, U=U, C=C, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, k8, R), jnp.float32),
    )(pb, pc, tiles_t, *([slabs] * U))


def stacked_slabs(v_pad, C):
    """(pad, k) f32 -> (chunks, 2k8, C) bf16 sublane-stacked [hi; lo]."""
    n_chunks = v_pad.shape[0] // C
    t = jnp.swapaxes(v_pad.reshape(n_chunks, C, K), 1, 2)  # (ch, k, C)
    hi = t.astype(jnp.bfloat16)
    lo = (t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=1)  # (ch, 2k, C)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    records = {"device": dev.device_kind, "k": K}

    csr = cop20k_like(dtype=np.float32)
    m, n = csr.shape
    nnz = csr.nnz
    wp = WindowedPairs.from_csr(csr)
    assert wp is not None and wp.pairs_per_step > 2
    R, C = wp.block_rows, wp.chunk_cols
    nb = wp.n_blocks
    # legacy block-major transposed planes + ids
    ts_legacy = jax.device_put(jnp.asarray(
        _tiles_t(np.asarray(wp.tiles), np.asarray(wp.tiles_split))), dev)
    pb = jnp.asarray(wp.pair_block)
    pc = jnp.asarray(wp.pair_chunk)
    P = wp.n_pairs
    print(f"format: R={R} C={C} P={P} nb={nb}", flush=True)
    records["format"] = {"R": R, "C": C, "P": P, "nb": nb}

    v = np.asarray(generate_fat_vector(n, K, seed=0), np.float32)
    v_p = wp.encode(jnp.asarray(v))
    (slabs_packed,) = chunk_slabs(v_p, C=C, split=True)
    slabs_packed = jax.device_put(slabs_packed, dev)
    slabs_stacked = jax.device_put(stacked_slabs(v_p, C), dev)

    # reference for correctness of the variants that compute real math
    ref = spmm_host_f64(csr, v)
    ref_scale = float(np.abs(ref).max()) or 1.0

    def check(tag, out_t):
        comp = jnp.swapaxes(out_t, 1, 2).reshape(nb * R, K)
        got = np.asarray(wp.decode(comp[: wp.pad_rows]), np.float64)
        rel = float(np.abs(got - ref).max() / ref_scale)
        print(f"  {tag} rel={rel:.2e}", flush=True)
        return rel

    results = {}
    for variant, slabs, shape, U in (
            ("split3", slabs_packed, (1, K, 2 * C), 16),
            ("mstack", slabs_stacked, (1, 2 * K, C), 16),
            ("mstack", slabs_stacked, (1, 2 * K, C), 32),
            ("hi1", slabs_packed, (1, K, 2 * C), 16),
            ("nodot", slabs_packed, (1, K, 2 * C), 16),
    ):
        tag = f"{variant}_U{U}"
        try:
            if U != wp.pairs_per_step:
                from sparsematrixmultiplicationmpi_tpu.ops.\
                    pallas_windowed import _pad_pairs_multi

                pb_u, pc_u, ts_u = _pad_pairs_multi(
                    np.asarray(wp.pair_block), np.asarray(wp.pair_chunk),
                    np.asarray(_tiles_t(np.asarray(wp.tiles),
                                        np.asarray(wp.tiles_split))),
                    nb, U)
                pb_d, pc_d = jnp.asarray(pb_u), jnp.asarray(pc_u)
                ts_d = jax.device_put(jnp.asarray(ts_u), dev)
            else:
                pb_d, pc_d, ts_d = pb, pc, ts_legacy

            def body(sl, ts_):
                return run_variant(pb_d, pc_d, ts_, sl, nb=nb, U=U,
                                   variant=variant, slab_shape=shape)

            out = body(slabs, ts_d)
            rel = (check(tag, out)
                   if variant in ("split3", "mstack") else None)
            timing, _ = measure_amortized(body, slabs, ts_d, inner=20,
                                          warmup=1, iters=5)
            sec = timing.seconds_per_iter
            print(f"{tag}: {sec*1e3:.3f} ms ({sec/len(pb_d)*1e9:.1f} "
                  f"ns/pair) -> {nnz/sec/1e9:.3f} Gnnz/s", flush=True)
            results[tag] = {"ms": sec * 1e3, "pairs": int(len(pb_d)),
                            "ns_per_pair": sec / len(pb_d) * 1e9,
                            "gnnz_per_s": nnz / sec / 1e9,
                            "rel_vs_oracle": rel,
                            "noise_s": timing.noise}
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {str(e)[:400]}"
            print(f"{tag}: FAILED {msg}", flush=True)
            results[tag] = {"error": msg}
    records["cop20k_variants"] = results

    # ---- single-phase production A/B on a matrix whose slabs fit one
    # resident window (settles probe18's slice anomaly at today's chip
    # state).
    sp = {}
    try:
        csr2 = fem3d_csr(56000, 1_600_000, seed=7).astype(np.float32)
        wp2 = WindowedPairs.from_csr(csr2, block_rows=128, chunk_cols=128,
                                     beat_gather_margin=1e9,
                                     phase_layout=True)
        assert wp2 is not None and wp2.phases is not None
        sp["phases"] = len(wp2.phases)
        v2 = np.asarray(generate_fat_vector(csr2.shape[1], K, seed=8),
                        np.float32)
        v2_p = wp2.encode(jnp.asarray(v2))
        (sl2,) = chunk_slabs(v2_p, C=wp2.chunk_cols, split=True)
        sl2 = jax.device_put(sl2, dev)
        ts2 = jax.device_put(jnp.asarray(wp2.tiles_t), dev)
        pb2 = jnp.asarray(wp2.pair_block_ph)
        pc2 = jnp.asarray(wp2.pair_chunk_ph)
        from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
            windowed_matmul_tmulti_phased,
        )

        kwargs = dict(nb=wp2.n_blocks, phases=wp2.phases,
                      chunks_per_phase=wp2.chunks_per_phase,
                      pairs_per_step=wp2.pairs_per_step, split=True)
        ts2_leg = jax.device_put(jnp.asarray(_tiles_t(
            np.asarray(wp2.tiles), np.asarray(wp2.tiles_split))), dev)
        pb2_l = jnp.asarray(wp2.pair_block)
        pc2_l = jnp.asarray(wp2.pair_chunk)
        for tag, fn in (
            ("resident", lambda sl, ts_: windowed_matmul_tmulti_phased(
                pb2, pc2, ts_, sl, **kwargs)),
            ("streamed_phase",
             lambda sl, ts_: windowed_matmul_tmulti_phased(
                 pb2, pc2, ts_, sl, force_streamed=True, **kwargs)),
            ("legacy", lambda sl, ts_: windowed_matmul_tmulti(
                pb2_l, pc2_l, ts_, sl, nb=wp2.n_blocks,
                pairs_per_step=wp2.pairs_per_step, split=True)),
        ):
            ts_use = ts2 if tag != "legacy" else ts2_leg
            timing, _ = measure_amortized(fn, sl2, ts_use, inner=20,
                                          warmup=1, iters=5)
            sec = timing.seconds_per_iter
            print(f"fem56k {tag}: {sec*1e3:.3f} ms -> "
                  f"{csr2.nnz/sec/1e9:.3f} Gnnz/s", flush=True)
            sp[tag] = {"ms": sec * 1e3,
                       "gnnz_per_s": csr2.nnz / sec / 1e9}
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {str(e)[:400]}"
        print(f"fem56k: FAILED {msg}", flush=True)
        sp["error"] = msg
    records["single_phase_fem56k"] = sp

    out_path = os.path.join(REPO, "results", "probe20_dots.json")
    with open(out_path, "w") as f:
        json.dump(records, f, indent=2)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
