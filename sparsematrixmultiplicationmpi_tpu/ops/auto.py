"""Automatic format/kernel selection.

The reference makes the user pick a strategy per run (``./main`` runs all
four and prints a comparison). A TPU framework can decide from the matrix's
structure: banded/FEM matrices take the MXU band-dense path, skewed or
scattered matrices take the bucketed-ELL gather path.
"""

from __future__ import annotations

from typing import Union

import jax

from ..formats.banded import BandedBlocks
from ..formats.matrix import BucketedELL, CSR
from .banded import spmm_banded
from .ell import spmm_bucketed

__all__ = ["auto_format", "spmm_any", "spmm"]

AutoFormat = Union[BandedBlocks, BucketedELL]


def auto_format(csr: CSR, **banded_kwargs) -> AutoFormat:
    """Pick the fastest storage for this matrix's structure: band-dense
    when the diagonal band covers enough nnz to beat the gather path,
    bucketed ELL otherwise."""
    bb = BandedBlocks.from_csr(csr, **banded_kwargs)
    if bb is not None:
        return bb
    return BucketedELL.from_csr(csr)


def _on_accelerator() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def spmm_any(operand: AutoFormat, v: jax.Array,
             use_pallas: bool | None = None) -> jax.Array:
    """Dispatch SpMM on the operand's format (trace-time, zero overhead).

    ``use_pallas=None`` auto-selects: the fused Pallas band kernel on TPU
    (measured slightly ahead of the XLA einsum at block_rows>=256), the
    XLA path on CPU (where Pallas would need interpret mode).
    """
    if isinstance(operand, BandedBlocks):
        if use_pallas is None:
            # Mosaic rejects the transposed-window scratch for fat-vector
            # widths that are not sublane-aligned (observed: k=6/12 fail,
            # k=1/32 compile); gate on k % 8 == 0.
            use_pallas = (
                _on_accelerator()
                and operand.block_rows >= 256
                and v.shape[1] % 8 == 0
            )
        if use_pallas:
            from .pallas_banded import spmm_banded_pallas

            return spmm_banded_pallas(operand, v)
        return spmm_banded(operand, v)
    if isinstance(operand, BucketedELL):
        return spmm_bucketed(operand, v)
    raise TypeError(f"unsupported operand format: {type(operand)}")


def spmm(csr: CSR, v: jax.Array) -> jax.Array:
    """One-shot convenience: auto-format then multiply."""
    return spmm_any(auto_format(csr), v)
