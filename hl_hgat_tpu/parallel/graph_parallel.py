"""Graph (simplex) partitioning: one large complex sharded across chips.

For complexes too big for one device (brain FC graphs, dense TSP edge sets),
nodes/edges are partitioned into row shards of L0/L1; each device computes
its owned rows.  Two communication strategies are implemented: all-gather
the sharded feature block over the ``graph`` axis then local SpMM on owned
rows (one XLA all-gather per polynomial step riding ICI), and the
halo-exchange path (``HaloShard``/``halo_spmm`` below: each shard ppermutes
only boundary rows to its neighbours — SURVEY.md §7 hard-part 5), equality-
tested against each other and run in the driver dryrun.

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


# ---------------------------------------------------------------------------
# halo-exchange SpMM: communicate only the boundary rows each part needs
# ---------------------------------------------------------------------------


@_pytree_dataclass(
    meta=("n_local", "c_local", "n_parts", "halo_per_round", "seg_nnz", "mesh")
)
class HaloShard:
    """Row-sharded operator with precomputed halo exchange schedule.

    Entries are grouped by the ring round their column arrives in:
    ``seg_nnz[0]`` local-column entries first (cols in [0, c_local)), then
    for rounds r = 1..P−1 ``seg_nnz[r]`` entries whose cols are REBASED into
    that round's [H, F] halo block (received from part (p − r) mod P).  The
    static segmentation lets the SpMM consume each block the moment it
    lands, overlapping the remaining ppermutes with compute.
    ``send_idx[r−1]`` lists the local rows that part (p + r) mod P needs
    from us (mask-padded to H).

    Communication is P−1 ``ppermute`` steps of [H, F] blocks riding ICI —
    volume = Σ halo sizes instead of the all-gather's (P−1)·N·F
    (SURVEY.md §7 hard-part 5).
    """

    rows: Array  # [Pn, Σ seg_nnz] local row ids, round-segmented
    cols: Array  # [Pn, Σ seg_nnz] per-segment-rebased column ids
    vals: Array  # [Pn, Σ seg_nnz]
    send_idx: Array  # [Pn, P-1, H] local col-space rows to send at round r
    send_mask: Array  # [Pn, P-1, H]
    n_local: int  # output rows per part
    c_local: int  # x rows per part (== n_local for square operators)
    n_parts: int
    halo_per_round: int
    seg_nnz: tuple[int, ...] = ()  # static per-round entry counts (padded)
    # mesh to shard_map over when this shard stands in for a CooMatrix inside
    # a jit-traced model (full-model graph parallelism, parallel.gp_model);
    # None for explicitly-driven use where the caller passes the mesh.
    mesh: Mesh | None = None


def partition_halo(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    num_rows: int,
    n_parts: int,
    *,
    num_cols: int | None = None,
    x: np.ndarray | None = None,
) -> tuple[HaloShard, np.ndarray | None]:
    """Build the halo schedule for a contiguous row partition (host-side).

    Rectangular operators are supported (``num_cols`` ≠ ``num_rows`` — e.g.
    the boundary operator B1 [nodes × edges] or B1ᵀ): rows are partitioned
    into blocks of ``ceil(num_rows/P)``, the x features live col-partitioned
    in blocks of ``ceil(num_cols/P)``, and the halo exchanges col-type rows.
    """
    if num_cols is None:
        num_cols = num_rows
    keep = vals != 0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    n_local = -(-num_rows // n_parts)
    c_local = -(-num_cols // n_parts)
    row_owner = lambda g: g // n_local  # noqa: E731
    owner = lambda g: g // c_local  # noqa: E731  (col-space ownership)

    # per-part needed remote col-space globals, grouped by owning part
    need: list[dict[int, np.ndarray]] = []
    nnz_per = np.zeros(n_parts, np.int64)
    for p in range(n_parts):
        sel = row_owner(rows) == p
        nnz_per[p] = int(sel.sum())
        remote = np.unique(cols[sel][owner(cols[sel]) != p])
        need.append(
            {
                q: np.sort(remote[owner(remote) == q])
                for q in np.unique(owner(remote))
            }
        )
    halo_per_round = 1
    for p in range(n_parts):
        for q, lst in need[p].items():
            halo_per_round = max(halo_per_round, lst.size)

    # group each part's entries by the ring round their column arrives in
    # (round 0 = local), rebasing cols into that round's block
    per_part: list[list[tuple[np.ndarray, np.ndarray, np.ndarray]]] = []
    seg_counts = np.zeros((n_parts, n_parts), np.int64)
    for p in range(n_parts):
        sel = row_owner(rows) == p
        rr, cc, vv = rows[sel] - p * n_local, cols[sel], vals[sel]
        entry_round = (p - owner(cc)) % n_parts
        segs = []
        for r in range(n_parts):
            in_r = entry_round == r
            cr = cc[in_r]
            if r == 0:
                cr = cr - p * c_local
            else:
                lst = need[p].get((p - r) % n_parts, np.zeros(0, np.int64))
                cr = np.searchsorted(lst, cr)  # position in the halo block
            segs.append((rr[in_r].astype(np.int32), cr.astype(np.int32),
                         vv[in_r].astype(np.float32)))
            seg_counts[p, r] = cr.size
        per_part.append(segs)
    seg_nnz = tuple(
        max(int(seg_counts[:, r].max()), 1 if r == 0 else 0)
        for r in range(n_parts)
    )
    total = sum(seg_nnz)

    r_arr = np.zeros((n_parts, total), np.int32)
    c_arr = np.zeros((n_parts, total), np.int32)
    v_arr = np.zeros((n_parts, total), np.float32)
    send_idx = np.zeros((n_parts, max(n_parts - 1, 1), halo_per_round),
                        np.int32)
    send_mask = np.zeros((n_parts, max(n_parts - 1, 1), halo_per_round),
                         np.float32)

    for p in range(n_parts):
        off = 0
        for r in range(n_parts):
            rr, cr, vv = per_part[p][r]
            r_arr[p, off : off + rr.size] = rr
            c_arr[p, off : off + rr.size] = cr
            v_arr[p, off : off + rr.size] = vv
            off += seg_nnz[r]
        # what we send at round r: the col rows (p + r) % P needs from us
        for r in range(1, n_parts):
            q = (p + r) % n_parts
            lst = need[q].get(p, np.zeros(0, np.int64))
            send_idx[p, r - 1, : lst.size] = lst - p * c_local
            send_mask[p, r - 1, : lst.size] = 1.0

    shard = HaloShard(
        rows=r_arr, cols=c_arr, vals=v_arr, send_idx=send_idx,
        send_mask=send_mask, n_local=n_local, c_local=c_local,
        n_parts=n_parts, halo_per_round=halo_per_round, seg_nnz=seg_nnz,
    )
    if x is None:
        return shard, None
    f = x.shape[1]
    xp = np.zeros((n_parts * c_local, f), x.dtype)
    xp[:num_cols] = x
    return shard, xp.reshape(n_parts, c_local, f)


def halo_matvec_local(
    shard: HaloShard,
    x_local: Array,
    *,
    rows: Array | None = None,
    cols: Array | None = None,
    vals: Array | None = None,
    send_idx: Array | None = None,
    send_mask: Array | None = None,
    axis: str = "graph",
) -> Array:
    """One part's ``L @ x`` inside shard_map, with transfer/compute overlap.

    All P−1 ppermutes are issued up front; the local-column segment is
    multiplied while they fly, and each round's segment accumulates as its
    halo block lands — XLA schedules the ICI DMAs concurrently with the
    gather/segment-sum work of earlier rounds.  Defaults read the per-part
    arrays from ``shard`` (leading stacked axis of size 1, the shard_map
    layout); explicit keyword arrays override for pre-squeezed callers.
    """
    p_total = shard.n_parts
    rows = shard.rows[0] if rows is None else rows
    cols = shard.cols[0] if cols is None else cols
    vals = shard.vals[0] if vals is None else vals
    send_idx = shard.send_idx[0] if send_idx is None else send_idx
    send_mask = shard.send_mask[0] if send_mask is None else send_mask

    halos = []
    for r in range(1, p_total):
        block = x_local[send_idx[r - 1]] * send_mask[r - 1][:, None]
        perm = [(i, (i + r) % p_total) for i in range(p_total)]
        halos.append(jax.lax.ppermute(block, axis, perm))

    seg = shard.seg_nnz
    out = spmm_coo(
        rows[: seg[0]], cols[: seg[0]], vals[: seg[0]], x_local, shard.n_local
    )
    off = seg[0]
    for r in range(1, p_total):
        s = seg[r]
        if s:
            out = out + spmm_coo(
                rows[off : off + s], cols[off : off + s],
                vals[off : off + s], halos[r - 1], shard.n_local,
            )
        off += s
    return out


def halo_spmm(shard: HaloShard, x_sharded: Array, mesh: Mesh) -> Array:
    """``L @ x`` exchanging only halo rows via P−1 ``ppermute`` rounds,
    with communication/compute overlap.

    The local-column entries are multiplied FIRST (they depend on no
    transfer), and each halo round's entries accumulate as soon as that
    round's block arrives — so XLA's scheduler is free to run round r's
    ppermute on the ICI DMA engines while round r−1's partial SpMM occupies
    the vector units (the CP/ring-attention overlap pattern, SURVEY.md §7
    hard-part 5).  All ppermutes are issued up front so their sends don't
    serialize behind compute.  Same result as `sharded_spmm`, a fraction of
    the communication volume.
    """
    def local(rows, cols, vals, send_idx, send_mask, x_local):
        out = halo_matvec_local(
            shard, x_local[0],
            rows=rows[0], cols=cols[0], vals=vals[0],
            send_idx=send_idx[0], send_mask=send_mask[0],
        )
        return out[None]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("graph"),) * 6,
        out_specs=P("graph"),
        check_vma=False,
    )
    return fn(
        shard.rows, shard.cols, shard.vals, shard.send_idx, shard.send_mask,
        x_sharded,
    )
