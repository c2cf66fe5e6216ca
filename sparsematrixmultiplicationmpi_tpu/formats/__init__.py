from .banded import BandedBlocks, band_coverage
from .matrix import COO, CSR, ELL, BucketedELL
from .reorder import (
    apply_symmetric_permutation, bandwidth, permute_rows, rcm_ordering,
)
from .serialize import load_format, save_format

__all__ = [
    "BandedBlocks", "band_coverage", "COO", "CSR", "ELL", "BucketedELL",
    "apply_symmetric_permutation", "bandwidth", "permute_rows",
    "rcm_ordering", "load_format", "save_format",
]
