"""PageRank / power iteration on top of the distributed SpMM strategies.

The reference stops at the raw SpMM benchmark; these models are the
framework's demonstration that the kernels compose into real sparse
workloads (what a user of a sparse linear-algebra library actually runs).
All iteration is ``lax.while_loop`` — compiler-friendly control flow, no
host round trips per step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.matrix import CSR

__all__ = ["pagerank", "power_iteration", "normalize_columns"]


def normalize_columns(csr: CSR) -> CSR:
    """Column-stochastic rescale: A[:, j] /= colsum[j] (dangling cols -> 0)."""
    cols = np.asarray(csr.col_indices)
    vals = np.asarray(csr.values)
    colsum = np.zeros(csr.shape[1])
    np.add.at(colsum, cols, vals)
    scale = np.where(colsum > 0, 1.0 / np.where(colsum == 0, 1, colsum), 0.0)
    import dataclasses

    return dataclasses.replace(csr, values=jnp.asarray(vals * scale[cols]))


def pagerank(spmm: Callable[[jax.Array], jax.Array], n: int, *,
             damping: float = 0.85, tol: float = 1e-8,
             max_iter: int = 200, dtype=jnp.float64):
    """PageRank via power iteration.

    ``spmm`` maps ``(n, k)`` -> ``(n, k)`` (use any prepared strategy with
    a column-normalized adjacency). Returns ``(ranks, iterations)``.
    """
    r0 = jnp.full((n, 1), 1.0 / n, dtype=dtype)

    def cond(state):
        _, delta, i = state
        return jnp.logical_and(delta > tol, i < max_iter)

    def body(state):
        r, _, i = state
        r_new = damping * spmm(r) + (1.0 - damping) / n
        r_new = r_new / jnp.sum(r_new)
        return r_new, jnp.max(jnp.abs(r_new - r)), i + 1

    r, _, iters = jax.lax.while_loop(
        cond, body, (r0, jnp.asarray(jnp.inf, dtype), jnp.asarray(0))
    )
    return r[:, 0], iters


def power_iteration(spmm: Callable[[jax.Array], jax.Array], n: int, *,
                    tol: float = 1e-10, max_iter: int = 500,
                    seed: int = 0, dtype=jnp.float64):
    """Dominant eigenpair of a (square) sparse matrix via power iteration.

    Returns ``(eigenvalue, eigenvector, iterations)``.
    """
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n, 1), dtype=dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def cond(state):
        _, _, delta, i = state
        return jnp.logical_and(delta > tol, i < max_iter)

    def body(state):
        v, lam, _, i = state
        w = spmm(v)
        lam_new = jnp.vdot(v, w)
        v_new = w / jnp.linalg.norm(w)
        return v_new, lam_new, jnp.abs(lam_new - lam), i + 1

    v, lam, _, iters = jax.lax.while_loop(
        cond, body,
        (v0, jnp.asarray(0.0, dtype), jnp.asarray(jnp.inf, dtype),
         jnp.asarray(0)),
    )
    return lam, v[:, 0], iters


#: Backwards-compatible private alias.
_normalize_columns = normalize_columns
