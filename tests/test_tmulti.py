"""Differential tests for the transposed-state U-pair kernel and the
zero-relayout chained-iterate protocol.

``windowed_matmul_tmulti`` (ops/pallas_windowed.py) is the round-4
replacement for the natural-layout U-pair kernel, whose manual flush DMA
could not compile on hardware (minor dim k < the 128 tiling). Everything
here runs the REAL kernel in interpret mode on CPU against the host f64
oracle (``ops/oracle.py``) per the repo test convention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparsematrixmultiplicationmpi_tpu.formats.matrix import CSR
from sparsematrixmultiplicationmpi_tpu.formats.windowed import WindowedPairs
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    banded_csr, fem3d_csr, generate_fat_vector,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.windowed import (
    spmm_windowed, windowed_t_chain,
)


def _build(csr, *, U, R=16, C=128, reorder=None):
    wp = WindowedPairs.from_csr(
        csr, block_rows=R, chunk_cols=C, reorder=reorder,
        pairs_per_step=U, beat_gather_margin=1e9, max_inflation=1e9,
    )
    assert wp is not None
    return wp


@pytest.mark.parametrize("U", [4, 8, 16])
@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_tmulti_matches_oracle(U, dtype):
    csr = fem3d_csr(256, 4096, seed=0).astype(
        jnp.bfloat16 if dtype == "bfloat16" else dtype)
    wp = _build(csr, U=U)
    assert wp.tiles_t is not None
    v = jnp.asarray(generate_fat_vector(csr.shape[1], 8, seed=1),
                    dtype=csr.values.dtype)
    out = spmm_windowed(wp, v)  # dispatches to tmulti (interpret on CPU)
    ref = spmm_host_f64(csr, v)
    scale = float(np.abs(ref).max()) or 1.0
    tol = 5e-3 if dtype == np.float32 else 2e-2
    assert float(np.abs(np.asarray(out) - ref).max()) / scale < tol


def test_tmulti_spans_blocks_mid_step():
    # Blocks with odd pair counts force steps to span block boundaries —
    # the flush-on-change path the two-pair kernel could never hit.
    csr = fem3d_csr(512, 8192, seed=2).astype(np.float32)
    wp = _build(csr, U=8, R=8, C=128)
    counts = np.diff(np.asarray(wp.block_ptr))
    assert (counts % 8 != 0).any(), "fixture too regular to test spanning"
    v = jnp.asarray(generate_fat_vector(csr.shape[1], 16, seed=3),
                    dtype=np.float32)
    out = spmm_windowed(wp, v)
    ref = spmm_host_f64(csr, v)
    scale = float(np.abs(ref).max()) or 1.0
    assert float(np.abs(np.asarray(out) - ref).max()) / scale < 5e-3


def _square_chain_format(U=8, dtype=np.float32):
    # Square R == C format, zero spill (max_inflation high + every tile
    # dense via beat_gather_margin): supports the transposed chain.
    m = 512
    csr = banded_csr(m, 24, 8, seed=4).astype(dtype)
    wp = WindowedPairs.from_csr(
        csr, block_rows=128, chunk_cols=128, reorder=None,
        pairs_per_step=U, beat_gather_margin=1e9, max_inflation=1e9,
    )
    assert wp is not None and wp.spill is None
    assert wp.supports_transposed_chain
    return csr, wp


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_t_chain_matches_natural_chain(dtype):
    dt = jnp.bfloat16 if dtype == "bfloat16" else dtype
    csr, wp = _square_chain_format(dtype=dt)
    k = 8
    v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=5),
                    dtype=csr.values.dtype)
    enc, body, dec = windowed_t_chain(wp, k)
    state = enc(v, wp)
    assert state.ndim == 3
    for _ in range(3):
        state = body(state, wp)
    out_t = np.asarray(dec(state, wp))

    # natural chain reference
    x = wp.encode(v)
    for _ in range(3):
        x = wp.iterate(x)
    out_n = np.asarray(wp.decode(x))

    scale = float(np.abs(out_n).max()) or 1.0
    tol = 5e-3 if dtype == np.float32 else 5e-2
    assert float(np.abs(out_t - out_n).max()) / scale < tol


def test_t_chain_single_step_matches_oracle():
    csr, wp = _square_chain_format()
    k = 16
    v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=6),
                    dtype=np.float32)
    enc, body, dec = windowed_t_chain(wp, k)
    out = np.asarray(dec(body(enc(v, wp), wp), wp))
    ref = spmm_host_f64(csr, v)
    scale = float(np.abs(ref).max()) or 1.0
    assert float(np.abs(out - ref).max()) / scale < 5e-3


def test_t_chain_gates():
    # spill present -> unsupported
    csr = fem3d_csr(512, 4096, seed=7).astype(np.float32)
    wp = WindowedPairs.from_csr(csr, block_rows=128, chunk_cols=128,
                                reorder=None, pairs_per_step=8,
                                max_inflation=1e9)
    if wp is not None and wp.spill is not None:
        assert not wp.supports_transposed_chain
        assert windowed_t_chain(wp, 8) is None
    # R != C -> unsupported
    csr2, wp2 = _square_chain_format()
    import dataclasses

    wp3 = dataclasses.replace(wp2, block_rows=64)
    assert not wp3.supports_transposed_chain
    # U == 2 -> no tiles_t, unsupported
    wp4 = WindowedPairs.from_csr(csr2, block_rows=128, chunk_cols=128,
                                 reorder=None, pairs_per_step=2,
                                 beat_gather_margin=1e9,
                                 max_inflation=1e9)
    assert wp4.tiles_t is None
    assert not wp4.supports_transposed_chain


def test_auto_chain_parts_uses_transposed_state():
    from sparsematrixmultiplicationmpi_tpu.parallel import Auto, make_mesh

    csr, wp = _square_chain_format()
    mesh = make_mesh(1)
    auto = Auto()
    enc, body, dec = auto.chain_parts(wp, mesh)
    k = 8
    v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=8),
                    dtype=np.float32)
    state = jax.jit(enc)(v, wp)
    assert state.ndim == 3, "Auto chain should pick the transposed state"
    state = jax.jit(body)(state, wp)
    out = np.asarray(jax.jit(dec)(state, wp))
    ref = spmm_host_f64(csr, v)
    scale = float(np.abs(ref).max()) or 1.0
    assert float(np.abs(out - ref).max()) / scale < 5e-3
    # unaligned k falls back to the natural 2-D state
    v5 = jnp.asarray(generate_fat_vector(csr.shape[1], 5, seed=9),
                     dtype=np.float32)
    st5 = jax.jit(enc)(v5, wp)
    assert st5.ndim == 2
    out5 = np.asarray(jax.jit(dec)(jax.jit(body)(st5, wp), wp))
    ref5 = spmm_host_f64(csr, v5)
    scale5 = float(np.abs(ref5).max()) or 1.0
    assert float(np.abs(out5 - ref5).max()) / scale5 < 5e-3


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_fuse_resplit_matches_unfused(dtype):
    """fuse_resplit emits the next chain state straight from the flush
    (VERDICT r4 #6): bitwise-identical to kernel + resplit_slabs/cast
    (same acc, same rounding, different plumbing)."""
    from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
        chunk_slabs, resplit_slabs, windowed_matmul_tmulti,
    )

    dt = jnp.bfloat16 if dtype == "bfloat16" else dtype
    csr, wp = _square_chain_format(U=8, dtype=dt)
    split = dtype == np.float32
    k = 16
    v = jnp.asarray(generate_fat_vector(csr.shape[1], k, seed=31),
                    dtype=csr.values.dtype)
    slab_dtype = jnp.float32 if split else jnp.bfloat16
    (state,) = chunk_slabs(wp.encode(v).astype(slab_dtype),
                           C=wp.chunk_cols, split=split, interpret=True)
    kwargs = dict(nb=wp.n_blocks, pairs_per_step=wp.pairs_per_step,
                  split=split, interpret=True)
    out_t = windowed_matmul_tmulti(
        wp.pair_block, wp.pair_chunk, jnp.asarray(wp.tiles_t), state,
        **kwargs)
    want = (resplit_slabs(out_t) if split
            else out_t.astype(jnp.bfloat16))
    got = windowed_matmul_tmulti(
        wp.pair_block, wp.pair_chunk, jnp.asarray(wp.tiles_t), state,
        fuse_resplit=True, **kwargs)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fuse_resplit_rejects_unaligned_k():
    from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
        chunk_slabs, windowed_matmul_tmulti,
    )

    csr, wp = _square_chain_format(U=8)
    v = jnp.asarray(generate_fat_vector(csr.shape[1], 8, seed=32),
                    dtype=np.float32)
    (state,) = chunk_slabs(wp.encode(v), C=wp.chunk_cols, split=True,
                           interpret=True)
    with pytest.raises(ValueError, match="fuse_resplit"):
        windowed_matmul_tmulti(
            wp.pair_block, wp.pair_chunk, jnp.asarray(wp.tiles_t), state,
            nb=wp.n_blocks, pairs_per_step=wp.pairs_per_step, split=True,
            interpret=True, fuse_resplit=True)
