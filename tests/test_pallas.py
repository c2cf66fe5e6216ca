"""Pallas band kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrixmultiplicationmpi_tpu.formats.banded import BandedBlocks
from sparsematrixmultiplicationmpi_tpu.io.generate import (
    banded_csr, generate_fat_vector, random_csr,
)
from sparsematrixmultiplicationmpi_tpu.ops.oracle import spmm_host_f64
from sparsematrixmultiplicationmpi_tpu.ops.pallas_banded import (
    spmm_banded_pallas,
)


@pytest.mark.parametrize("k", [1, 8, 32])
def test_pallas_band_matches_oracle(k):
    csr = banded_csr(300, 7, 5, seed=131).astype(jnp.float32)
    bb = BandedBlocks.from_csr(csr, block_rows=8)
    v = jnp.asarray(generate_fat_vector(300, k, seed=132), jnp.float32)
    out = np.asarray(spmm_banded_pallas(bb, v, interpret=True))
    oracle = spmm_host_f64(csr, np.asarray(v))
    rel = np.max(np.abs(out - oracle) / np.maximum(np.abs(oracle), 1))
    assert rel < 1e-4


def test_pallas_band_with_spill():
    b = banded_csr(200, 4, 3, seed=133)
    r = random_csr(200, 200, 250, seed=134)
    from sparsematrixmultiplicationmpi_tpu import CSR

    csr = CSR.from_dense(
        np.asarray(b.to_dense()) + np.asarray(r.to_dense())
    ).astype(jnp.float32)
    bb = BandedBlocks.from_csr(csr, block_rows=8)
    assert bb.spill is not None
    v = jnp.asarray(generate_fat_vector(200, 5, seed=135), jnp.float32)
    out = np.asarray(spmm_banded_pallas(bb, v, interpret=True))
    oracle = spmm_host_f64(csr, np.asarray(v))
    rel = np.max(np.abs(out - oracle) / np.maximum(np.abs(oracle), 1))
    assert rel < 1e-4


def test_pallas_band_odd_rows():
    csr = banded_csr(101, 3, 2, seed=136).astype(jnp.float32)
    bb = BandedBlocks.from_csr(csr, block_rows=8)
    v = jnp.asarray(generate_fat_vector(101, 3, seed=137), jnp.float32)
    out = np.asarray(spmm_banded_pallas(bb, v, interpret=True))
    assert out.shape == (101, 3)
    oracle = spmm_host_f64(csr, np.asarray(v))
    rel = np.max(np.abs(out - oracle) / np.maximum(np.abs(oracle), 1))
    assert rel < 1e-4


@pytest.mark.parametrize("k", [6, 12])
def test_pallas_band_k_not_sublane_aligned(k):
    """k % 8 != 0 runs through the kernel via column padding (round-2 fix:
    k=1/6/12 previously fell back to the XLA einsum silently)."""
    csr = banded_csr(300, 7, 5, seed=141).astype(jnp.float32)
    bb = BandedBlocks.from_csr(csr, block_rows=8)
    v = jnp.asarray(generate_fat_vector(300, k, seed=142), jnp.float32)
    out = np.asarray(spmm_banded_pallas(bb, v, interpret=True))
    assert out.shape == (300, k)
    oracle = spmm_host_f64(csr, np.asarray(v))
    rel = np.max(np.abs(out - oracle) / np.maximum(np.abs(oracle), 1))
    assert rel < 1e-4


def test_ell_gather_rows_pallas_interpret():
    """Experimental DMA-gather spill kernel (ops/pallas_gather.py):
    differential vs direct numpy gather, interpret mode."""
    import numpy as np
    import jax.numpy as jnp

    from sparsematrixmultiplicationmpi_tpu.ops.pallas_gather import (
        ell_gather_rows_pallas,
    )

    rng = np.random.default_rng(0)
    Rt, W, n = 64, 3, 500
    cols = rng.integers(0, n, (Rt, W)).astype(np.int32)
    vals = rng.uniform(-1, 1, (Rt, W)).astype(np.float32)
    vals[rng.uniform(size=(Rt, W)) < 0.3] = 0.0  # ELL padding slots
    v = rng.uniform(-1, 1, (n, 128)).astype(np.float32)
    out = np.asarray(ell_gather_rows_pallas(
        jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(v),
        rows_per_step=8, interpret=True))
    ref = np.einsum("rw,rwk->rk", vals, v[cols])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ell_gather_rows_pallas_rejects_bad_shapes():
    import numpy as np
    import jax.numpy as jnp
    import pytest

    from sparsematrixmultiplicationmpi_tpu.ops.pallas_gather import (
        ell_gather_rows_pallas,
    )

    cols = jnp.zeros((10, 2), jnp.int32)
    vals = jnp.zeros((10, 2), jnp.float32)
    v128 = jnp.zeros((16, 128), jnp.float32)
    with pytest.raises(ValueError):
        ell_gather_rows_pallas(cols, vals, v128, rows_per_step=8)
    with pytest.raises(ValueError):
        ell_gather_rows_pallas(
            jnp.zeros((16, 2), jnp.int32), jnp.zeros((16, 2)),
            jnp.zeros((16, 32), jnp.float32), rows_per_step=8)


def test_spmm_ell_dma_gather_route_matches_take():
    """Production wiring for the DMA-gather spill route (gated off by
    default, ops/ell.py::SPILL_DMA_GATHER): forced on, it must match the
    XLA take path bit-for-tolerance on padded ELL planes at both
    sublane-odd rows and k < 128."""
    import numpy as np
    import jax.numpy as jnp

    from sparsematrixmultiplicationmpi_tpu.formats.matrix import ELL
    from sparsematrixmultiplicationmpi_tpu.io.generate import random_csr
    from sparsematrixmultiplicationmpi_tpu.ops.ell import spmm_ell

    csr = random_csr(101, 90, 700, seed=31).astype(np.float32)  # 101 % 8 != 0
    ell = ELL.from_csr(csr)
    for k in (5, 32):
        rng = np.random.default_rng(k)
        v = jnp.asarray(rng.uniform(-1, 1, (90, k)).astype(np.float32))
        ref = np.asarray(spmm_ell(ell, v, dma_gather=False))
        got = np.asarray(spmm_ell(ell, v, dma_gather=True))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
