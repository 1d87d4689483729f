"""Graph (simplex) partitioning: one large complex sharded across chips.

For complexes too big for one device (brain FC graphs, dense TSP edge sets),
nodes/edges are partitioned into row shards of L0/L1; each device computes
its owned rows.  Round-1 communication strategy: all-gather the sharded
feature block over the ``graph`` axis, then local SpMM on owned rows — one
XLA all-gather per polynomial step riding ICI.  (The halo-exchange/ppermute
overlap refinement is the planned upgrade; SURVEY.md §7 hard-part 5.)

Host-side ``partition_complex`` builds the shard layout: balanced contiguous
node blocks (callers can pre-permute by BFS/METIS order for locality), column
ids rewritten into the padded gathered layout.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hl_hgat_tpu.complex.batch import _pytree_dataclass
from hl_hgat_tpu.ops.spmm import spmm_coo

Array = jax.Array


@_pytree_dataclass(meta=("n_local", "n_parts"))
class GraphShard:
    """Row-sharded COO operator, stacked along the device axis.

    rows are LOCAL row ids within the shard; cols are GLOBAL ids in the
    padded gathered layout (part * n_local + local).
    """

    rows: Array  # [Pn, nnz_local] int32
    cols: Array  # [Pn, nnz_local] int32 (global padded)
    vals: Array  # [Pn, nnz_local] float32
    n_local: int
    n_parts: int


def partition_complex(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    num_rows: int,
    n_parts: int,
    *,
    x: np.ndarray | None = None,
) -> tuple[GraphShard, np.ndarray | None]:
    """Split a COO operator into balanced contiguous row shards.

    Returns the shard pytree and (optionally) the feature array padded and
    reshaped to [n_parts, n_local, F] matching the shard layout.  Assumes a
    square operator (rows and cols index the same simplex set), which holds
    for L0/L1.
    """
    n_local = -(-num_rows // n_parts)
    part_of = lambda g: g // n_local  # noqa: E731
    local_of = lambda g: g % n_local  # noqa: E731

    keep = vals != 0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    owner = part_of(rows)
    # global padded column ids: identity under contiguous partition
    nnz_per = np.bincount(owner, minlength=n_parts)
    nnz_local = max(int(nnz_per.max()) if nnz_per.size else 1, 1)

    r = np.zeros((n_parts, nnz_local), np.int32)
    c = np.zeros((n_parts, nnz_local), np.int32)
    v = np.zeros((n_parts, nnz_local), np.float32)
    cursor = np.zeros(n_parts, np.int64)
    for rr, cc, vv in zip(rows, cols, vals):
        p = part_of(rr)
        k = cursor[p]
        r[p, k] = local_of(rr)
        c[p, k] = cc  # contiguous partition => global padded id == global id
        v[p, k] = vv
        cursor[p] = k + 1

    shard = GraphShard(rows=r, cols=c, vals=v, n_local=n_local, n_parts=n_parts)
    if x is None:
        return shard, None
    f = x.shape[1]
    xp = np.zeros((n_parts * n_local, f), x.dtype)
    xp[:num_rows] = x
    return shard, xp.reshape(n_parts, n_local, f)


def sharded_spmm(shard: GraphShard, x_sharded: Array, mesh: Mesh) -> Array:
    """``L @ x`` with L row-sharded and x block-sharded over 'graph'.

    x_sharded: [n_parts, n_local, F] with leading axis sharded.  Returns the
    result in the same sharded layout.
    """

    def local(rows, cols, vals, x_local):
        # squeeze the per-device leading axis of size 1
        rows, cols, vals, x_local = (
            rows[0], cols[0], vals[0], x_local[0],
        )
        x_full = jax.lax.all_gather(x_local, "graph", tiled=True)  # [N, F]
        out = spmm_coo(rows, cols, vals, x_full, x_local.shape[0])
        return out[None]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("graph"), P("graph"), P("graph"), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    return fn(shard.rows, shard.cols, shard.vals, x_sharded)


def place_shard(shard: GraphShard, x_blocks, mesh: Mesh):
    """Device-put the shard + features with the 'graph' sharding."""
    sh = NamedSharding(mesh, P("graph"))
    put = lambda t: jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), t)  # noqa: E731
    return put(shard), put(x_blocks)
