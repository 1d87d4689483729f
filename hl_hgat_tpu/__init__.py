"""HL-HGAT-TPU: a TPU-native simplicial graph neural network framework.

A from-scratch JAX / XLA / Pallas re-design of the capability surface of the
HL-HGAT reference (Hodge-Laplacian Heterogeneous Graph Attention Network,
IPMI 2023 / arXiv:2403.06687).  Graphs are lifted to simplicial complexes:
nodes carry 0-simplex features, undirected edges carry 1-simplex features,
and spectral filters are polynomials of the Hodge Laplacians L0 / L1 coupled
through the boundary operator B1.

Design pillars (deliberately *not* a port of the CUDA/PyG reference):
  * static shapes everywhere: bucketed padding + validity masks instead of
    ragged PyG batching, so every step is a single XLA compilation;
  * the sparse compute floor (torch-scatter / torch-sparse / cuSPARSE in the
    reference) is re-built as segment reductions and COO SpMM that XLA maps
    onto TPU scatter/gather hardware, with Pallas kernels for the hot paths;
  * precomputed segment ids kill the reference's per-forward host loops
    (reference lib/Hodge_ST_Model.py:611-615);
  * scale-out through ``jax.sharding`` meshes: batch data-parallelism and
    edge-partitioned single-complex graph parallelism with XLA collectives
    over ICI, not hand-written NCCL.

Subpackages
-----------
ops       sparse kernel layer: segment reduce, SpMM, SDDMM (XLA + Pallas)
complex   simplicial-complex construction, batching, coarsening (MLGC)
nn        neural operator library (Laguerre/Chebyshev conv, MSI, SAPool, ...)
models    the HL-HGAT model families (ZINC, Peptides, TSP, CIFAR10-SP, brain)
data      dataset pipelines and loaders
train     losses, metrics, optimizers, training loop, checkpointing
parallel  device meshes, data parallelism, graph (simplex) partitioning
utils     profiling, logging, visualization
"""

__version__ = "0.1.0"

from hl_hgat_tpu.complex.batch import ComplexBatch, ComplexLevel, PoolMap

__all__ = [
    "ComplexBatch",
    "ComplexLevel",
    "PoolMap",
    "__version__",
]
