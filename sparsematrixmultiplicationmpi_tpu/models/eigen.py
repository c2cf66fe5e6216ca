"""Lanczos eigensolver over the framework's SpMM.

Top-k eigenvalues/vectors of a symmetric sparse matrix via the Lanczos
iteration with full reorthogonalization — each iteration is one SpMM plus
dense vector work, all inside ``lax.fori_loop`` (single compiled program,
no host round trips). Works with any spmm closure, distributed included.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["lanczos", "topk_eigsh"]


class LanczosResult(NamedTuple):
    alphas: jax.Array   # (steps,) tridiagonal diagonal
    betas: jax.Array    # (steps,) off-diagonal (beta[0] unused)
    vectors: jax.Array  # (steps, n) Lanczos basis


def lanczos(spmm: Callable[[jax.Array], jax.Array], n: int, steps: int, *,
            seed: int = 0, dtype=jnp.float64) -> LanczosResult:
    """Run ``steps`` Lanczos iterations with full reorthogonalization.

    ``spmm`` maps ``(n, 1) -> (n, 1)`` (a symmetric operator).
    """
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    vectors = jnp.zeros((steps, n), dtype).at[0].set(v0)
    alphas = jnp.zeros((steps,), dtype)
    betas = jnp.zeros((steps,), dtype)

    def body(i, state):
        vectors, alphas, betas = state
        v = vectors[i]
        w = spmm(v[:, None])[:, 0]
        alpha = jnp.vdot(v, w)
        w = w - alpha * v - jnp.where(i > 0, betas[i], 0.0) * vectors[
            jnp.maximum(i - 1, 0)
        ]
        # Full reorthogonalization against the basis built so far (mask
        # rows > i, which are still zero).
        coeffs = vectors @ w                      # (steps,)
        w = w - coeffs @ vectors
        beta = jnp.linalg.norm(w)
        next_v = jnp.where(beta > 1e-12, w / jnp.where(beta == 0, 1, beta),
                           0.0)
        vectors = jax.lax.cond(
            i + 1 < steps,
            lambda vs: vs.at[i + 1].set(next_v),
            lambda vs: vs,
            vectors,
        )
        alphas = alphas.at[i].set(alpha)
        betas = jax.lax.cond(
            i + 1 < steps,
            lambda bs: bs.at[i + 1].set(beta),
            lambda bs: bs,
            betas,
        )
        return vectors, alphas, betas

    vectors, alphas, betas = jax.lax.fori_loop(
        0, steps, body, (vectors, alphas, betas)
    )
    return LanczosResult(alphas, betas, vectors)


def topk_eigsh(spmm: Callable[[jax.Array], jax.Array], n: int, k: int, *,
               steps: int | None = None, seed: int = 0,
               dtype=jnp.float64) -> Tuple[jax.Array, jax.Array]:
    """Top-k (largest-magnitude) eigenpairs of a symmetric operator.

    Returns ``(eigenvalues (k,), eigenvectors (n, k))``.
    """
    if steps is None:
        steps = min(max(4 * k, 32), n)
    res = lanczos(spmm, n, steps, seed=seed, dtype=dtype)
    # Tridiagonal eigendecomposition (small, dense).
    t = (
        jnp.diag(res.alphas)
        + jnp.diag(res.betas[1:], 1)
        + jnp.diag(res.betas[1:], -1)
    )
    evals, evecs = jnp.linalg.eigh(t)
    order = jnp.argsort(-jnp.abs(evals))[:k]
    ritz_vals = evals[order]
    ritz_vecs = (res.vectors.T @ evecs[:, order])
    ritz_vecs = ritz_vecs / jnp.linalg.norm(ritz_vecs, axis=0, keepdims=True)
    return ritz_vals, ritz_vecs
