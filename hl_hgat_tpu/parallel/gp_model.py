"""FULL-model graph parallelism: one large complex sharded across chips.

Strategy (the TPU-idiomatic split of labor):

* The **model runs unmodified at global view under jit/GSPMD** — every
  per-simplex array (features, masks, segment ids, pool assignments) is
  row-sharded over the ``graph`` mesh axis via `NamedSharding`, and XLA
  auto-partitions the pointwise ops, GEMMs, BatchNorm reductions, segment
  pools, and readouts, inserting psums/all-gathers over ICI itself.
* The one op XLA cannot partition well — the Laplacian SpMM inside every
  Laguerre conv — is routed through the halo-exchange ``shard_map`` kernel
  (`graph_parallel.halo_spmm`): L0/L1 are stored as `HaloShard`s and the
  dispatch layer (`ops.dispatch.lap_matvec`) recognizes them, so
  `nn.LaguerreConv` and every model built on it distribute without change.

This covers the whole brain/"sequence-parallel" regime of SURVEY.md §2.10
(the reference has no distributed support at all): single complex too large
for one chip, pooling pyramid included — `sharded_layer.py` remains the
fully-explicit single-layer variant used for collective-level testing.

Semantics match the single-device path exactly (same masks, same dump-bucket
pooling, masked BN statistics are padding-independent); asserted in
tests/test_parallel.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hl_hgat_tpu.complex.batch import ComplexBatch, ComplexLevel, PoolMap
from hl_hgat_tpu.complex.build import GraphSample, GraphStructure
from hl_hgat_tpu.parallel.graph_parallel import partition_halo

Array = jax.Array


def _pad_to(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    out[: a.shape[0]] = a
    return out


def _build_gp_level(
    st: GraphStructure, n_parts: int, mesh: Mesh | None
) -> tuple[ComplexLevel, int, int]:
    """One pyramid level padded to part-aligned sizes, L0/L1 as HaloShards."""
    import dataclasses

    n, e = st.num_nodes, st.num_edges
    n_local = -(-max(n, 1) // n_parts)
    e_local = -(-max(e, 1) // n_parts)
    np_pad, ep_pad = n_parts * n_local, n_parts * e_local

    l0, _ = partition_halo(st.l0_rows, st.l0_cols, st.l0_vals, np_pad, n_parts)
    l1, _ = partition_halo(st.l1_rows, st.l1_cols, st.l1_vals, ep_pad, n_parts)
    l0 = dataclasses.replace(l0, mesh=mesh)
    l1 = dataclasses.replace(l1, mesh=mesh)

    deg = np.zeros(np_pad, np.float32)
    np.add.at(deg, st.src, 1.0)
    np.add.at(deg, st.dst, 1.0)
    node_mask = np.zeros(np_pad, np.float32)
    node_mask[:n] = 1.0
    edge_mask = np.zeros(ep_pad, np.float32)
    edge_mask[:e] = 1.0
    # single complex: every simplex belongs to graph 0; padding → dump id 1
    n_id = np.where(node_mask > 0, 0, 1).astype(np.int32)
    s_id = np.where(edge_mask > 0, 0, 1).astype(np.int32)

    level = ComplexLevel(
        src=_pad_to(st.src.astype(np.int32), ep_pad),
        dst=_pad_to(st.dst.astype(np.int32), ep_pad),
        node_mask=node_mask,
        edge_mask=edge_mask,
        n_id=n_id,
        s_id=s_id,
        l0=l0,
        l1=l1,
        deg=deg,
        num_graphs=1,
    )
    return level, np_pad, ep_pad


def _level_specs(level: ComplexLevel) -> ComplexLevel:
    """Mirror of a gp level with PartitionSpecs in place of arrays."""
    import dataclasses

    row = P("graph")

    def shard_halo(h):
        return dataclasses.replace(
            h,
            rows=row, cols=row, vals=row, send_idx=row, send_mask=row,
        )

    return dataclasses.replace(
        level,
        src=row, dst=row, node_mask=row, edge_mask=row, n_id=row, s_id=row,
        deg=row, l0=shard_halo(level.l0), l1=shard_halo(level.l1),
    )


def build_gp_batch(
    sample: GraphSample, n_parts: int, mesh: Mesh | None = None
) -> ComplexBatch:
    """Pack ONE large complex (+ pyramid) for graph-axis sharding.

    Every per-simplex dimension is padded to a multiple of ``n_parts`` so a
    contiguous row partition is balanced; global simplex id == padded row
    position (tail padding), so pool assignments and segment ids keep plain
    global-id semantics.  With ``mesh`` given, arrays are device_put with
    their 'graph' shardings (features/masks/ids row-sharded, y replicated).
    """
    levels, pads = [], []
    for st in sample.levels:
        level, np_pad, ep_pad = _build_gp_level(st, n_parts, mesh)
        levels.append(level)
        pads.append((np_pad, ep_pad))

    pools = []
    for k, (c_node, c_edge) in enumerate(sample.pools):
        npc, epc = pads[k + 1]
        pos_t = _pad_to(c_node.astype(np.int32), pads[k][0], fill=npc)
        c_edge = c_edge.astype(np.int32)
        c_edge = np.where(c_edge < 0, epc, c_edge)  # deleted → coarse dump
        pos_s = _pad_to(c_edge, pads[k][1], fill=epc)
        pools.append(PoolMap(pos_t=pos_t, pos_s=pos_s))

    x_t = _pad_to(sample.x_t.astype(np.float32), pads[0][0])
    x_s = _pad_to(sample.x_s.astype(np.float32), pads[0][1])
    y = np.asarray(sample.y, np.float32).reshape(1, -1)

    batch = ComplexBatch(
        x_t=x_t, x_s=x_s, y=y,
        levels=tuple(levels), pools=tuple(pools), num_graphs=1,
    )
    if mesh is None:
        return jax.tree.map(jnp.asarray, batch)

    specs = ComplexBatch(
        x_t=P("graph"), x_s=P("graph"), y=P(),
        levels=tuple(_level_specs(lv) for lv in levels),
        pools=tuple(PoolMap(pos_t=P("graph"), pos_s=P("graph")) for _ in pools),
        num_graphs=1,
    )
    return jax.tree.map(
        lambda a, s: jax.device_put(jnp.asarray(a), NamedSharding(mesh, s)),
        batch,
        specs,
    )
