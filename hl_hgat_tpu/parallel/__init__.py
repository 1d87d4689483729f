"""Parallelism: device meshes, data parallelism, graph (simplex) partitioning.

The reference is strictly single-GPU (SURVEY.md §2.10) — this subsystem is
new capability mandated by the north star: batch data-parallelism over the
``data`` mesh axis (each device owns whole padded sub-batches, gradients and
BN statistics pmean-reduced over ICI) and edge-partitioned single-complex
graph parallelism over the ``graph`` axis (node shards + halo exchange) for
complexes too large for one chip.
"""

from hl_hgat_tpu.parallel.mesh import make_mesh
from hl_hgat_tpu.parallel.data_parallel import (
    make_dp_train_step,
    shard_batches,
    stack_batches,
)
from hl_hgat_tpu.parallel.graph_parallel import (
    GraphShard,
    HaloShard,
    halo_spmm,
    partition_complex,
    partition_halo,
    sharded_spmm,
)
from hl_hgat_tpu.parallel.gp_model import build_gp_batch
from hl_hgat_tpu.parallel.dp_trainer import DataParallelTrainer

__all__ = [
    "DataParallelTrainer",
    "build_gp_batch",
    "make_mesh",
    "stack_batches",
    "shard_batches",
    "make_dp_train_step",
    "GraphShard",
    "HaloShard",
    "partition_complex",
    "partition_halo",
    "sharded_spmm",
    "halo_spmm",
]
