"""Neural operator library (the reference's L2, lib/Hodge_Cheb_Conv.py).

flax.linen modules over the sparse op substrate:

LaguerreConv / ChebConv   K-term spectral polynomial filters of a Hodge
                          Laplacian (reference HodgeLaguerreConv :452-523,
                          HodgeChebConv :366-448)
NodeEdgeInt (alias MSI)   cross-simplex interaction, value + attention modes
                          (reference :255-309, duplicate :61-115)
SAPool                    simplicial attention pooling (reference :36-59)
HLFilter                  dense-concat filtering block (reference :117-188)
Inception1D               fMRI time-series embedding (reference :317-362)
MaskedBatchNorm           padding-aware BatchNorm1d (PyG gnn.BatchNorm)
"""

from hl_hgat_tpu.nn.norm import MaskedBatchNorm
from hl_hgat_tpu.nn.conv import ChebConv, LaguerreConv, chebyshev_matvec, laguerre_matvec
from hl_hgat_tpu.nn.interaction import MSI, NodeEdgeInt
from hl_hgat_tpu.nn.pool import SAPool, global_mean_pool, sapool_scatter
from hl_hgat_tpu.nn.inception import Inception1D
from hl_hgat_tpu.nn.blocks import HLFilter

__all__ = [
    "MaskedBatchNorm",
    "LaguerreConv",
    "ChebConv",
    "laguerre_matvec",
    "chebyshev_matvec",
    "NodeEdgeInt",
    "MSI",
    "SAPool",
    "sapool_scatter",
    "global_mean_pool",
    "Inception1D",
    "HLFilter",
]
