"""Sparse kernel layer: the TPU-native replacement for torch-scatter /
torch-sparse / cuSPARSE that forms the compute floor of the reference
(reference README.md:19-22).

Public API
----------
segment_sum / segment_mean / segment_max   segment reductions over sorted or
                                           unsorted integer ids
spmm_coo                                   COO sparse @ dense  (the Laplacian
                                           filter mat-vec, reference
                                           lib/Hodge_Cheb_Conv.py:518-519)
sddmm_coo                                  sampled dense-dense matmul on a COO
                                           pattern (transpose-SpMM gradients)
boundary_s2t / boundary_t2s                |B1| / B1 boundary-operator products
                                           expressed as gathers + segment sums
                                           (reference lib/Hodge_Cheb_Conv.py:100-101)
"""

from hl_hgat_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from hl_hgat_tpu.ops.spmm import (
    coo_transpose,
    sddmm_coo,
    spmm_coo,
    spmm_dense_oracle,
)
from hl_hgat_tpu.ops.boundary import (
    boundary_abs_s2t,
    boundary_abs_t2s,
    boundary_s2t,
    boundary_t2s,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "spmm_coo",
    "sddmm_coo",
    "coo_transpose",
    "spmm_dense_oracle",
    "boundary_s2t",
    "boundary_t2s",
    "boundary_abs_s2t",
    "boundary_abs_t2s",
]
