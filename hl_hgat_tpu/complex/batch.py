"""Static-shape batched simplicial complexes (the `PairData` replacement).

The reference batches graphs with PyG's ragged block-diagonal collation driven
by ``PairData.__inc__`` (reference lib/Hodge_Dataset.py:27-48) and rebuilds
graph-membership vectors with a host-side Python loop on every forward pass
(reference lib/Hodge_ST_Model.py:611-615).  Under XLA we need static shapes,
so a batch is padded to fixed sizes with validity masks, and all segment ids
(graph membership, pooling cluster assignments) are precomputed array fields.

Everything here is a registered JAX pytree and flows through `jit`, `vmap`,
`pjit`, and `shard_map` unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


def _pytree_dataclass(cls=None, *, meta: tuple[str, ...] = ()):
    """Register a dataclass as a pytree with the given static (meta) fields."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta)
        )
        return c

    return wrap(cls) if cls is not None else wrap


@_pytree_dataclass(meta=("shape", "symmetric"))
class CooMatrix:
    """Padded COO sparse matrix; padding entries must have ``vals == 0``.

    The reference stores L0/L1 as ``(edge_index, edge_weight)`` pairs from
    ``dense_to_sparse`` (reference lib/Hodge_Dataset.py:467-470); this is the
    same information with a static nnz and an explicit logical shape.

    ``ell_cols``/``ell_vals`` optionally carry the same pattern packed in ELL
    [rows, width] form (built by ``collate(..., with_ell=True)``) — the input
    of the Pallas row-gather SpMM kernel.  ``symmetric`` marks operators equal
    to their transpose (L0/L1 are), which lets the ELL path serve its own
    backward pass.
    """

    rows: Array  # [nnz] int32
    cols: Array  # [nnz] int32
    vals: Array  # [nnz] float32
    shape: tuple[int, int]  # logical (padded) shape — static
    ell_cols: Array | None = None  # [num_rows, width] int32
    ell_vals: Array | None = None  # [num_rows, width] float32
    symmetric: bool = False

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]


@_pytree_dataclass(meta=("num_graphs",))
class ComplexLevel:
    """Structure of one resolution level of a batched simplicial complex.

    Holds everything a model layer needs that is *not* a learned feature:
    the boundary operator (as src/dst endpoint lists — B1 has exactly two
    entries per column so it never needs a sparse matrix, cf.
    ``hl_hgat_tpu.ops.boundary``), the Hodge Laplacians, per-simplex validity
    masks, graph-membership segment ids, and node degrees.
    """

    src: Array  # [E] int32 — edge source endpoints (canonical src < dst)
    dst: Array  # [E] int32
    node_mask: Array  # [N] float32 — 1 for real nodes, 0 for padding
    edge_mask: Array  # [E] float32
    n_id: Array  # [N] int32 — graph id per node; padding points at num_graphs
    s_id: Array  # [E] int32 — graph id per edge
    l0: CooMatrix  # node Hodge Laplacian, spectrum rescaled into [0, 2]
    l1: CooMatrix  # edge Hodge Laplacian
    deg: Array  # [N] float32 node degree (no epsilon; models add their own)
    num_graphs: int  # static

    @property
    def num_nodes(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_mask.shape[0]


@_pytree_dataclass
class PoolMap:
    """Fine→coarse assignment produced by MLGC coarsening.

    ``pos_t[n]`` is the batched coarse node id for fine node ``n`` (reference
    stores it as feature column 0, reference lib/Hodge_Dataset.py:523-527,
    and offsets it per graph at forward time, lib/Hodge_ST_Model.py:1029-1038
    — here it is already globally offset).  ``pos_s[e]`` is the coarse edge
    id; intra-cluster edges (``inf`` markers in the reference, reference
    lib/Hodge_Dataset.py:262-274) and padded edges point at the coarse dump
    slot ``num_coarse_edges`` and are dropped by segment-sum range semantics.
    """

    pos_t: Array  # [N_fine] int32 in [0, N_coarse]  (N_coarse = dump)
    pos_s: Array  # [E_fine] int32 in [0, E_coarse]  (E_coarse = dump/deleted)


@_pytree_dataclass(meta=("num_graphs",))
class ComplexBatch:
    """A batch of simplex graphs, padded, with a pooling pyramid.

    levels[0] is the input resolution; levels[k+1] is the MLGC-coarsened
    complex reached through pools[k].  Labels ``y`` live per graph (or per
    edge for TSP-style tasks; the trailing pad rows of per-edge labels are
    masked by ``levels[0].edge_mask``).
    """

    x_t: Array  # [N, Ft] node (0-simplex) features
    x_s: Array  # [E, Fs] edge (1-simplex) features
    y: Array  # [G, ...] or [E, ...]
    levels: tuple[ComplexLevel, ...]
    pools: tuple[PoolMap, ...]
    num_graphs: int  # static
    # Link-prediction query pairs (PCQM-Contact; the reference ships the
    # loader with edge_label_index/edge_label fields,
    # lib/LRGBDataset.py:81-95, but no model).  ``pairs``: [P, 2] int32
    # global node-row ids, laid out in contiguous groups of
    # (1 positive first, then its negatives); ``y`` then carries the [P]
    # pair labels and ``pair_mask`` kills padded rows.  None for every
    # other task — the fields ride the pytree as empty subtrees.
    pairs: Array | None = None
    pair_mask: Array | None = None

    @property
    def level0(self) -> ComplexLevel:
        return self.levels[0]

    def replace(self, **kw: Any) -> "ComplexBatch":
        return dataclasses.replace(self, **kw)


def graph_sizes(level: ComplexLevel) -> tuple[Array, Array]:
    """Per-graph (num_nodes, num_edges) recovered from masks + segment ids."""
    n = jax.ops.segment_sum(
        level.node_mask, level.n_id, num_segments=level.num_graphs
    )
    e = jax.ops.segment_sum(
        level.edge_mask, level.s_id, num_segments=level.num_graphs
    )
    return n, e
