"""2-D (rows x k) sharded SpMM — composing the reference's row-wise and
column-wise decompositions on a 2-D device mesh.

The reference treats row-partitioning and k-partitioning as mutually
exclusive strategies (its report's conclusion weighs one against the
other). On a TPU mesh they compose: shard output rows over one mesh axis
and fat-vector columns over the other. Each device owns an
(m/p_r) x (k/p_c) output tile, the matrix is replicated only along the
column axis (not globally), and gathers ride separate ICI axes — the
layout that keeps both the replication footprint and the per-link gather
volume at 1/p of the reference's design.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.matrix import CSR, ELL
from .strategies import STRATEGIES, Strategy, _pad_axis

__all__ = ["Grid2D"]


class Grid2D(Strategy):
    """Rows x k 2-D sharding over a 2-axis mesh (``make_mesh_2d``)."""

    name = "grid2d"

    def __init__(self, width_align: int = 8):
        self.width_align = width_align

    @staticmethod
    def _axes(mesh: Mesh):
        if len(mesh.axis_names) != 2:
            raise ValueError(
                f"grid2d needs a 2-D mesh, got axes {mesh.axis_names}"
            )
        return mesh.axis_names

    def prepare(self, csr: CSR, mesh: Mesh):
        rows_ax, cols_ax = self._axes(mesh)
        p_r = mesh.shape[rows_ax]
        ell = ELL.from_csr(
            csr, row_align=8 * p_r, width_align=self.width_align
        )
        # Rows sharded over the row axis; replicated along the col axis.
        sharded = NamedSharding(mesh, P(rows_ax, None))
        return dataclasses.replace(
            ell,
            cols=jax.device_put(ell.cols, sharded),
            vals=jax.device_put(ell.vals, sharded),
        )

    def spmm(self, operand: ELL, v: jax.Array, mesh: Mesh, *,
             gather_result: bool = True) -> jax.Array:
        rows_ax, cols_ax = self._axes(mesh)
        p_c = mesh.shape[cols_ax]
        k = v.shape[1]
        v = _pad_axis(v, 1, p_c)
        v = jax.device_put(v, NamedSharding(mesh, P(None, cols_ax)))
        out = _grid2d_spmm(
            mesh, rows_ax, cols_ax, gather_result,
            operand.cols, operand.vals, v,
        )
        return out[: operand.shape[0], :k]


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _grid2d_spmm(mesh, rows_ax, cols_ax, gather, cols, vals, v):
    def body(cols_blk, vals_blk, v_blk):
        # cols_blk/vals_blk: local row block (full width); v_blk: local
        # k-slice (full n rows). Output tile: (rows_local, k_local).
        gathered = jnp.take(v_blk, cols_blk.reshape(-1), axis=0)
        gathered = gathered.reshape(*cols_blk.shape, v_blk.shape[1])
        out = jnp.sum(
            vals_blk[:, :, None].astype(v_blk.dtype) * gathered, axis=1
        )
        if gather:
            out = jax.lax.all_gather(out, cols_ax, axis=1, tiled=True)
            out = jax.lax.all_gather(out, rows_ax, tiled=True)
        return out

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(rows_ax, None), P(rows_ax, None), P(None, cols_ax),
        ),
        out_specs=(
            P(None, None) if gather else P(rows_ax, cols_ax)
        ),
        check_vma=False,
    )(cols, vals, v)


STRATEGIES["grid2d"] = Grid2D
