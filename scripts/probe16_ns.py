"""Probe16 natural-slab kernel variant: (C, k) f32 slab blocks with
in-kernel bf16 hi/lo split — no per-iterate chunk_slabs relayout.
Experimental (scripts-only) until measured on hardware."""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kernel_multi_ns(pb_ref, pc_ref, tile_ref, *rest, U, C):
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

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for u in range(U):
        b = pb_ref[s * U + u]

        @pl.when(b != cur[0])
        def _(b=b):
            flush()
            cur[0] = b

        t = tile_ref[u]
        sl32 = slab_refs[u][0]                      # (C, k) f32
        sh = sl32.astype(jnp.bfloat16)
        slo = (sl32 - sh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc[...] += (dot(t[:, :C], sh) + dot(t[:, C:], sh)
                     + dot(t[:, :C], slo))

    @pl.when(s == S - 1)
    def _():
        flush()
        pltpu.make_async_copy(stage, out_ref.at[prev[0]], sem).wait()


@functools.partial(jax.jit, static_argnames=("nb", "U", "interpret"))
def multi_ns(pair_block, pair_chunk, tiles_split, v_pad, *, nb, U,
             interpret=False):
    P, R, C2 = tiles_split.shape
    C = C2 // 2
    k = v_pad.shape[1]
    n_chunks = v_pad.shape[0] // C
    vc = v_pad.reshape(n_chunks, C, k)
    S = P // U

    def slab_spec(u):
        return pl.BlockSpec((1, C, k),
                            lambda s, pb, pc, u=u: (pc[s * U + u], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((U, R, C2), lambda s, pb, pc: (s, 0, 0)),
            *[slab_spec(u) for u in range(U)],
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((R, k), jnp.float32),
            pltpu.VMEM((R, k), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_multi_ns, U=U, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, k), jnp.float32),
        interpret=interpret,
    )(pair_block, pair_chunk, tiles_split, *([vc] * U))
    return out.reshape(nb * R, k)


