"""Differential tests for the phased VMEM-resident transposed kernel.

``windowed_matmul_tmulti_phased`` (ops/pallas_windowed.py) productionizes
the round-4 probe18 finding (resident slab window: 135 vs 184 ns/pair at
the production shape on v5e, results/probe18_resident.json): pairs are
grouped by chunk window at build time (``formats/windowed.py::
build_phase_layout``), each phase's slabs stay resident in VMEM, and
block-range partial outputs are summed. Everything here runs the REAL
kernel in interpret mode on CPU against the host f64 oracle per the repo
test convention; spanning/spill/dtype coverage mirrors test_tmulti.py.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from sparsematrixmultiplicationmpi_tpu.formats.windowed import (
    WindowedPairs, _phase_fields, build_phase_layout,
)
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    banded_csr, fem3d_csr, generate_fat_vector, powerlaw_csr,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
    windowed_matmul_tmulti_phased,
)
from sparsematrixmultiplicationmpi_tpu.ops.windowed import (
    spmm_windowed, windowed_t_chain,
)


def test_build_phase_layout_properties():
    rng = np.random.default_rng(0)
    nb, n_chunks, cpp, U = 11, 10, 3, 4
    P = 57
    pb = np.sort(rng.integers(0, nb, P)).astype(np.int32)
    pc = rng.integers(0, n_chunks, P).astype(np.int32)
    pb_ph, pc_ph, src, phases = build_phase_layout(
        pb, pc, nb, n_chunks, cpp, U)
    assert len(pb_ph) == len(pc_ph) == len(src)
    assert sum(ph[1] for ph in phases) == len(pb_ph)
    covered = np.zeros(len(pb_ph), dtype=bool)
    seen_src = []
    for off, n, chunk_lo, block_lo, nb_ph in phases:
        assert off % U == 0 and n % U == 0
        covered[off:off + n] = True
        lb = pb_ph[off:off + n]
        lc = pc_ph[off:off + n]
        s = src[off:off + n]
        # block-ascending, phase-local ids in range
        assert (np.diff(lb) >= 0).all()
        assert lb.min() == 0 and lb.max() == nb_ph - 1
        assert (lc >= 0).all() and (lc < cpp).all()
        # every local block in the range is visited (coverage dummies)
        assert len(np.unique(lb)) == nb_ph
        # real pairs round-trip to their originals
        real = s >= 0
        np.testing.assert_array_equal(pb[s[real]], lb[real] + block_lo)
        np.testing.assert_array_equal(pc[s[real]], lc[real] + chunk_lo)
        assert (pc[s[real]] // cpp == chunk_lo // cpp).all()
        seen_src.extend(s[real].tolist())
    assert covered.all()
    # every input pair appears exactly once across phases
    assert sorted(seen_src) == list(range(P))


def _oracle_rel(wp, csr, v):
    out = spmm_windowed(wp, jnp.asarray(v))
    ref = spmm_host_f64(csr, v)
    scale = float(np.abs(ref).max()) or 1.0
    return float(np.abs(np.asarray(out, np.float64) - ref).max()) / scale


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_single_phase_resident_matches_oracle(dtype):
    """R == 128 builds now carry the phase layout; the dispatch runs the
    resident kernel (one phase on a small matrix) in interpret mode."""
    dt = jnp.bfloat16 if dtype == "bfloat16" else dtype
    csr = banded_csr(512, 24, 8, seed=4).astype(dt)
    wp = WindowedPairs.from_csr(
        csr, block_rows=128, chunk_cols=128, reorder=None,
        pairs_per_step=16, beat_gather_margin=1e9, max_inflation=1e9,
        phase_layout=True)
    assert wp is not None and wp.phases is not None
    assert len(wp.phases) == 1
    v = np.asarray(generate_fat_vector(csr.shape[1], 8, seed=5),
                   dtype=np.asarray(csr.values).dtype)
    rel = _oracle_rel(wp, csr, v)
    assert rel < (5e-3 if dtype == np.float32 else 5e-2)


def _multi_phase_format(csr, U=8, k_nominal=32):
    """Force a multi-phase layout on a small matrix by rebuilding the
    phase fields with a tiny chunks-per-phase."""
    wp = WindowedPairs.from_csr(
        csr, block_rows=128, chunk_cols=128, reorder=None,
        pairs_per_step=U, beat_gather_margin=1e9, max_inflation=1e9,
        k_nominal=k_nominal, phase_layout=True)
    assert wp is not None and wp.phases is not None
    cpp = 2
    tiles_t, pb_ph, pc_ph, phases = _phase_fields(
        np.asarray(wp.tiles),
        None if wp.tiles_split is None else np.asarray(wp.tiles_split),
        wp.pair_block, wp.pair_chunk, wp.n_blocks, wp.n_chunks, cpp, U)
    wp = dataclasses.replace(
        wp, tiles_t=tiles_t, pair_block_ph=pb_ph, pair_chunk_ph=pc_ph,
        phases=phases, chunks_per_phase=cpp)
    assert len(wp.phases) > 1
    return wp


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_multi_phase_resident_matches_oracle(dtype):
    """Several phases with overlapping block ranges: partial pad+add
    combine, per-phase coverage dummies, per-phase U pads."""
    dt = jnp.bfloat16 if dtype == "bfloat16" else dtype
    csr = fem3d_csr(1024, 16384, seed=11).astype(dt)
    wp = _multi_phase_format(csr, U=8)
    v = np.asarray(generate_fat_vector(csr.shape[1], 16, seed=12),
                   dtype=np.asarray(csr.values).dtype)
    rel = _oracle_rel(wp, csr, v)
    assert rel < (5e-3 if dtype == np.float32 else 5e-2)


def test_multi_phase_streamed_fallback_matches_resident():
    """force_streamed runs the per-phase streamed kernel on the same
    phase-major layout — identical results (same math, same order)."""
    csr = fem3d_csr(1024, 16384, seed=21).astype(np.float32)
    wp = _multi_phase_format(csr, U=8)
    v = np.asarray(generate_fat_vector(csr.shape[1], 8, seed=22),
                   np.float32)
    from sparsematrixmultiplicationmpi_tpu.ops.pallas_windowed import (
        chunk_slabs,
    )

    v_p = wp.encode(jnp.asarray(v))
    (slabs,) = chunk_slabs(v_p, C=wp.chunk_cols, split=True,
                           interpret=True)
    kwargs = dict(nb=wp.n_blocks, phases=wp.phases,
                  chunks_per_phase=wp.chunks_per_phase,
                  pairs_per_step=wp.pairs_per_step, split=True,
                  interpret=True)
    res = windowed_matmul_tmulti_phased(
        wp.pair_block_ph, wp.pair_chunk_ph, jnp.asarray(wp.tiles_t),
        slabs, **kwargs)
    str_ = windowed_matmul_tmulti_phased(
        wp.pair_block_ph, wp.pair_chunk_ph, jnp.asarray(wp.tiles_t),
        slabs, force_streamed=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(res), np.asarray(str_))


def test_multi_phase_with_spill_matches_oracle():
    """Phasing composes with the bucketed-ELL spill restore (hub rows
    spill; dense tiles run phased)."""
    csr = powerlaw_csr(2048, 2048, 30000, seed=31).astype(np.float32)
    wp = WindowedPairs.from_csr(
        csr, block_rows=128, chunk_cols=128, reorder=None,
        pairs_per_step=8, beat_gather_margin=1e9, phase_layout=True)
    if wp is None or wp.spill is None:
        pytest.skip("fixture did not produce a spill split")
    assert wp.phases is not None
    v = np.asarray(generate_fat_vector(csr.shape[1], 8, seed=32),
                   np.float32)
    rel = _oracle_rel(wp, csr, v)
    assert rel < 5e-3


def test_t_chain_phased_matches_oracle():
    """The zero-relayout chain over the phased kernel: 3 chained
    iterates vs 3 host-f64 multiplies."""
    csr = banded_csr(1024, 24, 8, seed=41).astype(np.float32)
    wp = _multi_phase_format(csr, U=8)
    assert wp.supports_transposed_chain
    k = 8
    v = np.asarray(generate_fat_vector(csr.shape[1], k, seed=42),
                   np.float32)
    enc, body, dec = windowed_t_chain(wp, k)
    state = enc(jnp.asarray(v), wp)
    assert state.ndim == 3
    ref = v.astype(np.float64)
    for _ in range(3):
        state = body(state, wp)
        ref = spmm_host_f64(csr, ref)
    out = np.asarray(dec(state, wp), np.float64)
    scale = float(np.abs(ref).max()) or 1.0
    assert float(np.abs(out - ref).max()) / scale < 2e-2


def test_astype_rebuilds_phase_layout():
    csr = banded_csr(512, 24, 8, seed=51).astype(np.float32)
    wp = WindowedPairs.from_csr(
        csr, block_rows=128, chunk_cols=128, reorder=None,
        pairs_per_step=16, beat_gather_margin=1e9, max_inflation=1e9,
        phase_layout=True)
    wb = wp.astype(jnp.bfloat16)
    assert wb.phases == wp.phases
    assert wb.tiles_t is not None
    # bf16 transposed planes are single-plane (C, R) — half the f32
    # split width
    assert wb.tiles_t.shape[1] * 2 == wp.tiles_t.shape[1]
    v = np.asarray(generate_fat_vector(csr.shape[1], 8, seed=52),
                   np.float32)
    rel = _oracle_rel(wb, csr.astype(jnp.bfloat16), v)
    assert rel < 5e-2
