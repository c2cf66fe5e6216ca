"""Automatic format/kernel selection.

The reference makes the user pick a strategy per run (``./main`` runs all
four and prints a comparison, ``main.cpp:162-280`` — precisely because
none dominates). A TPU framework can decide from the matrix's structure
using measured hardware constants (CLAUDE.md "Measured TPU v5e facts"):

* **WindowedPairs** — dense (R, C) tiles over every region where tile
  streaming beats the ~5 ns/row gather wall, RCM-reordered when that
  tightens the tiling; spill to bucketed ELL. Wins on mesh/FEM/banded
  structure (the cop20k_A class) and on clustered hubs.
* **BandedBlocks** — the fixed 3-block diagonal window specialization;
  kept for explicitly banded use (its halo structure also backs the
  multi-chip ``BandedRowWise`` ppermute strategy).
* **BucketedELL** — the gather path for scatter structure with row-length
  skew (power-law graphs), where densification loses everywhere.

Selection is by estimated per-SpMM seconds from the same cost model the
builders use, so "auto" is consistent end-to-end.
"""

from __future__ import annotations

from typing import Union

import jax

from ..formats.banded import BandedBlocks
from ..formats.matrix import BucketedELL, CSR
from ..formats.windowed import WindowedPairs
from .banded import spmm_banded
from .ell import spmm_bucketed

__all__ = ["auto_format", "spmm_any", "spmm"]

AutoFormat = Union[WindowedPairs, BandedBlocks, BucketedELL]


def auto_format(csr: CSR, *, reorder: str | None = "auto",
                **format_kwargs) -> AutoFormat:
    """Pick the fastest storage for this matrix's structure.

    Windowed tiles when enough nonzeros cluster into MXU tiles (after an
    optional RCM reorder), band-dense for explicitly-requested banded
    storage, bucketed ELL otherwise. ``format_kwargs`` are forwarded to
    ``WindowedPairs.from_csr`` (e.g. ``block_rows``, ``candidates``).
    """
    wp = WindowedPairs.from_csr(csr, reorder=reorder, **format_kwargs)
    if wp is not None:
        return wp
    bb = BandedBlocks.from_csr(csr)
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

    ``use_pallas=None`` auto-selects the fused Pallas kernels on
    accelerator backends and the XLA paths on CPU (where Pallas would need
    interpret mode). Iterative consumers should use the operand's
    ``encode``/``iterate``/``decode`` protocol where available instead of
    paying any boundary transforms per call.
    """
    if isinstance(operand, WindowedPairs):
        from .windowed import spmm_windowed

        return spmm_windowed(operand, v, use_pallas=use_pallas)
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
