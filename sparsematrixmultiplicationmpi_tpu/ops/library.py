"""Vendor-library yardstick path.

The reference benchmarks its hand-written kernels against PETSc
``MatMatMult`` (``Source Code/main.cpp:290-396``) as the "what does the
vendor library achieve" baseline. The JAX ecosystem analog is
``jax.experimental.sparse`` (BCOO) — XLA's own sparse lowering — plus a
plain dense ``jnp.matmul`` for very small matrices.
"""

from __future__ import annotations

import jax

from jax.experimental import sparse as jsparse

from ..formats.matrix import COO, CSR

__all__ = ["to_bcoo", "spmm_bcoo"]


def to_bcoo(matrix) -> jsparse.BCOO:
    """Convert CSR/COO to a jax.experimental.sparse BCOO matrix."""
    if isinstance(matrix, CSR):
        matrix = matrix.to_coo()
    if not isinstance(matrix, COO):
        raise TypeError(f"expected CSR or COO, got {type(matrix)}")
    import jax.numpy as jnp

    indices = jnp.stack([matrix.row_indices, matrix.col_indices], axis=1)
    return jsparse.BCOO(
        (matrix.values, indices), shape=matrix.shape,
        indices_sorted=True, unique_indices=True,
    )


def spmm_bcoo(bcoo: jsparse.BCOO, v: jax.Array) -> jax.Array:
    """SpMM via the library path (PETSc MatMatMult analog,
    ``main.cpp:345-348``)."""
    return bcoo @ v
