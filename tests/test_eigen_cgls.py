"""Lanczos eigensolver and CGLS least-squares tests."""

import jax.numpy as jnp
import numpy as np

from sparsematrixmultiplicationmpi_tpu import CSR, BucketedELL, spmm_bucketed
from sparsematrixmultiplicationmpi_tpu.io.generate import banded_csr, random_csr
from sparsematrixmultiplicationmpi_tpu.models import cgls, lanczos, topk_eigsh
from sparsematrixmultiplicationmpi_tpu.ops.autodiff import make_spmm


def _sym_csr(n=60, seed=211, shift=6.0):
    d = np.asarray(banded_csr(n, 4, 3, seed=seed).to_dense())
    sym = d + d.T + shift * np.eye(n)
    return CSR.from_dense(sym), sym


def _closure(csr):
    bell = BucketedELL.from_csr(csr)
    return lambda v: spmm_bucketed(bell, v)


def test_topk_eigsh_matches_dense():
    csr, sym = _sym_csr()
    vals, vecs = topk_eigsh(_closure(csr), 60, k=3, steps=60)
    dense_vals = np.linalg.eigvalsh(sym)
    top3 = dense_vals[np.argsort(-np.abs(dense_vals))[:3]]
    np.testing.assert_allclose(
        np.sort(np.asarray(vals)), np.sort(top3), rtol=1e-8
    )
    # Residual check: ||A v - lambda v|| small.
    for i in range(3):
        v = np.asarray(vecs[:, i])
        r = sym @ v - float(vals[i]) * v
        assert np.linalg.norm(r) < 1e-6


def test_lanczos_orthogonal_basis():
    csr, _ = _sym_csr(seed=212)
    res = lanczos(_closure(csr), 60, steps=20)
    q = np.asarray(res.vectors)
    gram = q @ q.T
    np.testing.assert_allclose(gram, np.eye(20), atol=1e-8)


def test_cgls_overdetermined():
    # min ||A x - b|| with A (80 x 30): normal-equations solution.
    csr = random_csr(80, 30, 500, seed=213)
    f = make_spmm(csr)
    from sparsematrixmultiplicationmpi_tpu.ops.autodiff import transpose_csr

    ft = _closure(transpose_csr(csr))
    rng = np.random.default_rng(214)
    b = rng.normal(size=(80, 2))
    res = cgls(f, ft, jnp.asarray(b), tol=1e-14, max_iter=500)
    a = np.asarray(csr.to_dense())
    x_ref = np.linalg.lstsq(a, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-6)


def test_cgls_1d_rhs():
    csr = random_csr(40, 25, 300, seed=215)
    from sparsematrixmultiplicationmpi_tpu.ops.autodiff import transpose_csr

    f = _closure(csr)
    ft = _closure(transpose_csr(csr))
    b = np.random.default_rng(216).normal(size=40)
    res = cgls(f, ft, jnp.asarray(b), tol=1e-14)
    a = np.asarray(csr.to_dense())
    x_ref = np.linalg.lstsq(a, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-6)
    assert res.x.shape == (25,)
