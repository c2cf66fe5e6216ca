from .auto import auto_format, spmm, spmm_any
from .autodiff import make_spmm, make_symmetric_spmm, transpose_csr
from .banded import spmm_banded
from .ell import spmm_bucketed, spmm_ell
from .library import spmm_bcoo, to_bcoo
from .sddmm import sddmm, sddmm_coo
from .oracle import spmm_coo, spmm_dense, spmm_host_f64, spmm_sequential

__all__ = [
    "auto_format", "spmm", "spmm_any",
    "make_spmm", "make_symmetric_spmm", "transpose_csr",
    "spmm_banded", "spmm_bucketed", "spmm_ell",
    "spmm_bcoo", "to_bcoo",
    "spmm_coo", "spmm_dense", "spmm_host_f64", "spmm_sequential",
    "sddmm", "sddmm_coo",
]
