"""Graph attention layer (GAT-style) — SDDMM + sparse softmax + SpMM.

The second canonical sparse-ML workload after the GCN: attention scores
are computed only at the graph's edges (SDDMM), normalized per
destination row with a segment softmax, then applied as SpMM weights.
All three stages are the framework's own primitives; everything is
functional and differentiable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..formats.matrix import COO
from ..ops.oracle import spmm_coo
from ..ops.sddmm import sddmm_coo

__all__ = ["GATParams", "init_gat", "gat_layer", "segment_softmax"]


class GATParams(NamedTuple):
    w: jax.Array        # (f_in, f_out) projection
    att_src: jax.Array  # (f_out,)
    att_dst: jax.Array  # (f_out,)


def init_gat(key: jax.Array, f_in: int, f_out: int,
             dtype=jnp.float32) -> GATParams:
    k1, k2, k3 = jax.random.split(key, 3)
    s = jnp.sqrt(2.0 / f_in).astype(dtype)
    return GATParams(
        w=jax.random.normal(k1, (f_in, f_out), dtype) * s,
        att_src=jax.random.normal(k2, (f_out,), dtype) * 0.1,
        att_dst=jax.random.normal(k3, (f_out,), dtype) * 0.1,
    )


def segment_softmax(values: jax.Array, segment_ids: jax.Array,
                    num_segments: int) -> jax.Array:
    """Numerically stable softmax within row segments (sorted ids)."""
    seg_max = jax.ops.segment_max(
        values, segment_ids, num_segments=num_segments,
        indices_are_sorted=True,
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    exp = jnp.exp(values - seg_max[segment_ids])
    denom = jax.ops.segment_sum(
        exp, segment_ids, num_segments=num_segments,
        indices_are_sorted=True,
    )
    return exp / jnp.maximum(denom[segment_ids], 1e-30)


def gat_layer(params: GATParams, adj: COO, x: jax.Array) -> jax.Array:
    """One attention head: ``out = softmax_rows(scores) @ (x W)`` with
    GAT-style additive scores ``leaky_relu(a_dst.h_i + a_src.h_j)`` at the
    adjacency's edges."""
    h = jnp.dot(x, params.w, preferred_element_type=x.dtype)
    # Additive attention as an SDDMM with rank-1 factors:
    # score_ij = <[h_i, 1], [a_dst.h_i ... ]> — computed directly from two
    # per-node scalars gathered at the edges.
    alpha_dst = h @ params.att_dst           # (m,)
    alpha_src = h @ params.att_src           # (n,)
    scores = (
        jnp.take(alpha_dst, adj.row_indices)
        + jnp.take(alpha_src, adj.col_indices)
    )
    scores = jax.nn.leaky_relu(scores, negative_slope=0.2)
    weights = segment_softmax(
        scores, adj.row_indices, num_segments=adj.shape[0]
    )
    import dataclasses

    attention = dataclasses.replace(adj, values=weights)
    return spmm_coo(attention, h)


def multi_head_gat(params_list, adj: COO, x: jax.Array,
                   concat: bool = True) -> jax.Array:
    """Multi-head attention: run each head's ``gat_layer`` and concat (or
    average) — the standard GAT composition."""
    outs = [gat_layer(p, adj, x) for p in params_list]
    if concat:
        return jnp.concatenate(outs, axis=1)
    return sum(outs) / len(outs)
