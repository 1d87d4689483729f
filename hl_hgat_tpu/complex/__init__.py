"""Simplicial-complex construction, static-shape batching, and coarsening.

This is the TPU-native replacement for the reference's L1 data layer
(reference lib/Hodge_Dataset.py): `PairData` + PyG ragged collation become a
padded, masked `ComplexBatch` pytree with precomputed segment ids, and all
one-time math (boundary operators, Hodge Laplacians, eigen positional
encodings, graclus/MLGC coarsening pyramids) runs in a NumPy preprocessing
pipeline.
"""

from hl_hgat_tpu.complex.batch import (
    ComplexBatch,
    ComplexLevel,
    CooMatrix,
    PoolMap,
)
from hl_hgat_tpu.complex.build import (
    GraphSample,
    build_complex,
    canonical_undirected,
    collate,
    coo_to_ell,
    eig_pe,
    hodge_laplacians,
)
from hl_hgat_tpu.complex.coarsen import MLGCLevel, graclus_cluster, mlgc
from hl_hgat_tpu.complex.dense import (
    DenseBatch,
    DenseLevel,
    DensePool,
    collate_dense,
    collate_dense_packed,
    pack_graphs,
    dense_pad_spec,
)

__all__ = [
    "ComplexBatch",
    "ComplexLevel",
    "CooMatrix",
    "PoolMap",
    "GraphSample",
    "build_complex",
    "canonical_undirected",
    "collate",
    "coo_to_ell",
    "eig_pe",
    "hodge_laplacians",
    "MLGCLevel",
    "graclus_cluster",
    "mlgc",
    "DenseBatch",
    "DenseLevel",
    "DensePool",
    "collate_dense",
    "collate_dense_packed",
    "pack_graphs",
    "dense_pad_spec",
]
