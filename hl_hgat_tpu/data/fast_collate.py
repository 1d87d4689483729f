"""Native packed collate: per-epoch batch assembly without NumPy loops.

`complex/dense.py::collate_dense_packed` is the semantic reference: it
scatters each graph's Laplacian COO, boundary, masks, degrees, features and
pooling operators into block-diagonal dense superblocks with ~15 small
NumPy calls per graph.  The reference framework hides the equivalent cost
in PyG's multi-worker DataLoader collate (reference lib/Hodge_Dataset.py
PairData `__inc__` batching); here the host is the bottleneck instead, so:

* `FlatSamples` flattens the dataset ONCE into contiguous arenas
  (concatenated COO/feature arrays + prefix offsets), and
* `collate_packed_fast` assembles a batch with three C calls per level
  (`native/hlhgat_native.cpp::packed_fill_*`); Python only computes the
  bin placements (pure integer arithmetic).

Bit-compatible with `collate_dense_packed` — tests/test_data.py asserts
array equality; falls back to it transparently when the native library is
unavailable.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hl_hgat_tpu import native
from hl_hgat_tpu.complex.build import GraphSample
from hl_hgat_tpu.complex.dense import (
    DenseBatch,
    DenseLevel,
    DensePad,
    DensePool,
    collate_dense_packed,
)


def _prefix(counts) -> np.ndarray:
    counts = np.asarray(counts, np.int64)
    off = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    return off


@dataclasses.dataclass
class _FlatLevel:
    num_nodes: np.ndarray  # [N] int32
    num_edges: np.ndarray  # [N] int32
    l0_off: np.ndarray  # [N+1] int64
    l0_rows: np.ndarray
    l0_cols: np.ndarray
    l0_vals: np.ndarray
    l1_off: np.ndarray
    l1_rows: np.ndarray
    l1_cols: np.ndarray
    l1_vals: np.ndarray
    e_off: np.ndarray  # [N+1] int64 (src/dst)
    src: np.ndarray
    dst: np.ndarray
    max_eig: np.ndarray  # [N] float64 — λmax of the unscaled L0 per graph


class FlatSamples:
    """Once-per-dataset contiguous arenas for the native packed collate."""

    def __init__(self, samples: list[GraphSample]):
        self.samples = samples  # kept for the NumPy fallback
        self.depth = len(samples[0].levels)
        self.levels: list[_FlatLevel] = []
        i32 = lambda a: np.ascontiguousarray(a, np.int32)  # noqa: E731
        f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
        cat = np.concatenate
        for lv in range(self.depth):
            sts = [s.levels[lv] for s in samples]
            self.levels.append(
                _FlatLevel(
                    num_nodes=i32([st.num_nodes for st in sts]),
                    num_edges=i32([st.num_edges for st in sts]),
                    l0_off=_prefix([st.l0_rows.size for st in sts]),
                    l0_rows=i32(cat([st.l0_rows for st in sts])),
                    l0_cols=i32(cat([st.l0_cols for st in sts])),
                    l0_vals=f32(cat([st.l0_vals for st in sts])),
                    l1_off=_prefix([st.l1_rows.size for st in sts]),
                    l1_rows=i32(cat([st.l1_rows for st in sts])),
                    l1_cols=i32(cat([st.l1_cols for st in sts])),
                    l1_vals=f32(cat([st.l1_vals for st in sts])),
                    e_off=_prefix([st.src.size for st in sts]),
                    src=i32(cat([st.src for st in sts])),
                    dst=i32(cat([st.dst for st in sts])),
                    max_eig=np.asarray(
                        [st.max_eig for st in sts], np.float64
                    ),
                )
            )
        lvl0 = self.levels[0]
        self.n_off = _prefix(lvl0.num_nodes)
        self.x_t = np.ascontiguousarray(
            cat([s.x_t for s in samples]), np.float32
        )
        self.x_s = np.ascontiguousarray(
            cat([s.x_s for s in samples]), np.float32
        )
        # pools[k]: flattened fine→coarse assignments (−1 = dropped)
        self.c_node: list[np.ndarray] = []
        self.c_edge: list[np.ndarray] = []
        self.cn_off: list[np.ndarray] = []
        self.ce_off: list[np.ndarray] = []
        for lv in range(self.depth - 1):
            cns = [s.pools[lv][0].reshape(-1) for s in samples]
            ces = [s.pools[lv][1].reshape(-1) for s in samples]
            self.c_node.append(np.ascontiguousarray(cat(cns), np.int64))
            self.c_edge.append(np.ascontiguousarray(cat(ces), np.int64))
            self.cn_off.append(_prefix([c.size for c in cns]))
            self.ce_off.append(_prefix([c.size for c in ces]))
        ys = [np.asarray(s.y, np.float32) for s in samples]
        flat_ys = [y.reshape(-1) for y in ys]
        if len({y.shape for y in flat_ys}) == 1:
            self.y_graph = np.ascontiguousarray(np.stack(flat_ys))
        else:
            self.y_graph = None  # ragged (per-edge labels): y_per_edge only
        # per-edge labels share the level-0 edge arena layout
        self.y_edge = np.ascontiguousarray(
            cat([y.reshape(y.shape[0], -1) for y in ys])
        )
        self.y_edge_feat = self.y_edge.shape[1]
        self.y_trailing = ys[0].shape[1:]

    def __len__(self) -> int:
        return len(self.samples)


def pack_indices(
    flat: FlatSamples, indices: np.ndarray, node_cap: int, edge_cap: int
) -> list[list[int]]:
    """Multi-order first-fit-decreasing bin packing — identical
    orders/assignment to `complex/dense.py::pack_plan` (bins hold positions
    into ``indices``).

    Round 4: next-fit → FFD (flagship bench batch 72 → 66 blocks).
    Round 5: FFD under several deterministic sort keys (max(n,e), n+e, e,
    n — `_PACK_SORT_KEYS` there), fewest bins kept, earliest order winning
    ties; max(n,e) targets the binding resource — best-of-orders never
    loses to the old single (n+e) order and finds 78 where it packs 79 on
    some ZINC-shaped draws (see pack_plan's comment)."""
    n = flat.levels[0].num_nodes[indices]
    e = flat.levels[0].num_edges[indices]
    if int(n.max()) > node_cap or int(e.max()) > edge_cap:
        bad = int(np.argmax((n > node_cap) | (e > edge_cap)))
        raise ValueError(
            f"graph ({n[bad]} nodes, {e[bad]} edges) exceeds pack caps "
            f"({node_cap}, {edge_cap})"
        )
    n64 = n.astype(np.int64)
    e64 = e.astype(np.int64)
    best: list[list[int]] | None = None
    for key in (np.maximum(n64, e64), n64 + e64, e64, n64):
        bins: list[list[int]] = []
        rem_n: list[int] = []
        rem_e: list[int] = []
        for pos in np.argsort(-key, kind="stable").tolist():
            nn, ee = int(n[pos]), int(e[pos])
            for b in range(len(bins)):
                if rem_n[b] >= nn and rem_e[b] >= ee:
                    bins[b].append(pos)
                    rem_n[b] -= nn
                    rem_e[b] -= ee
                    break
            else:
                bins.append([pos])
                rem_n.append(node_cap - nn)
                rem_e.append(edge_cap - ee)
        if best is None or len(bins) < len(best):
            best = bins
    return best or []


@dataclasses.dataclass
class _Placements:
    """Bin-major slot layout of one packed batch (shared by the dense and
    compact collates)."""

    bins: list
    nb: int
    ng: int
    sample_idx: np.ndarray  # global dataset index per slot
    gid: np.ndarray  # slot -> position in the original batch order
    bin_of: np.ndarray
    caps: list
    offs_n: list  # per level, node offset of each slot within its bin
    offs_e: list


def _placements(
    flat, indices, bins, node_cap, edge_cap, multiple, num_blocks, level_caps
) -> _Placements:
    if bins is None:
        bins = pack_indices(flat, indices, node_cap, edge_cap)
    nb = len(bins)
    if num_blocks is not None:
        if nb > num_blocks:
            raise ValueError(f"packing needs {nb} blocks > cap {num_blocks}")
        nb = num_blocks
    ng = len(indices)
    rnd = lambda x: max(-(-x // multiple) * multiple, multiple)  # noqa: E731

    # slots are bin-major (bin order, member order) so fills write each
    # destination block contiguously; gid keeps the sample's position in
    # the ORIGINAL batch order (= enumerate(samples) in the NumPy path).
    flat_order = np.asarray(
        [p for members in bins for p in members], np.int64
    )
    sample_idx = indices[flat_order]
    gid = flat_order.astype(np.int32)
    bin_of = np.ascontiguousarray(
        np.repeat(
            np.arange(len(bins), dtype=np.int32),
            [len(m) for m in bins],
        )
    )

    caps: list[DensePad] = []
    offs_n: list[np.ndarray] = []
    offs_e: list[np.ndarray] = []
    for lv in range(flat.depth):
        n_sz = flat.levels[lv].num_nodes[sample_idx].astype(np.int64)
        e_sz = flat.levels[lv].num_edges[sample_idx].astype(np.int64)
        no = np.zeros(len(sample_idx), np.int64)
        eo = np.zeros(len(sample_idx), np.int64)
        max_n = max_e = 0
        pos = 0
        for members in bins:
            k = len(members)
            if k:
                no[pos : pos + k] = np.cumsum(n_sz[pos : pos + k]) - n_sz[
                    pos : pos + k
                ]
                eo[pos : pos + k] = np.cumsum(e_sz[pos : pos + k]) - e_sz[
                    pos : pos + k
                ]
                max_n = max(max_n, int(no[pos + k - 1] + n_sz[pos + k - 1]))
                max_e = max(max_e, int(eo[pos + k - 1] + e_sz[pos + k - 1]))
            pos += k
        if lv == 0:
            caps.append(DensePad(nodes=rnd(node_cap), edges=rnd(edge_cap)))
        elif level_caps is not None:
            cn, ce = level_caps[lv - 1]
            if max_n > cn or max_e > ce:
                raise ValueError(
                    f"level {lv} bin ({max_n}, {max_e}) exceeds caps "
                    f"({cn}, {ce})"
                )
            caps.append(DensePad(nodes=rnd(cn), edges=rnd(ce)))
        else:
            caps.append(DensePad(nodes=rnd(max_n), edges=rnd(max_e)))
        offs_n.append(np.ascontiguousarray(no, np.int32))
        offs_e.append(np.ascontiguousarray(eo, np.int32))
    return _Placements(
        bins=bins, nb=nb, ng=ng, sample_idx=sample_idx, gid=gid,
        bin_of=bin_of, caps=caps, offs_n=offs_n, offs_e=offs_e,
    )


def collate_packed_fast(
    flat: FlatSamples,
    indices,
    *,
    node_cap: int = 128,
    edge_cap: int = 128,
    multiple: int = 8,
    y_per_edge: bool = False,
    num_blocks: int | None = None,
    level_caps: list[tuple[int, int]] | None = None,
    bins: list[list[int]] | None = None,
) -> DenseBatch:
    """Assemble `collate_dense_packed(samples[indices], ...)` natively.

    ``bins`` (positions into ``indices``) may be precomputed via
    `pack_indices` — e.g. the loader packs first to round the block count.
    """
    lib = native.load()
    indices = np.ascontiguousarray(indices, np.int64)
    if lib is None:
        return collate_dense_packed(
            [flat.samples[i] for i in indices],
            node_cap=node_cap, edge_cap=edge_cap, multiple=multiple,
            y_per_edge=y_per_edge, num_blocks=num_blocks,
            level_caps=level_caps,
        )
    pl = _placements(
        flat, indices, bins, node_cap, edge_cap, multiple, num_blocks,
        level_caps,
    )
    nb, ng = pl.nb, pl.ng
    sample_idx, gid, bin_of = pl.sample_idx, pl.gid, pl.bin_of
    caps, offs_n, offs_e = pl.caps, pl.offs_n, pl.offs_e

    nbatch = len(sample_idx)
    levels: list[DenseLevel] = []
    for lv in range(flat.depth):
        fl = flat.levels[lv]
        s_pad, e_pad = caps[lv].nodes, caps[lv].edges
        l0 = np.zeros((nb, s_pad, s_pad), np.float32)
        l1 = np.zeros((nb, e_pad, e_pad), np.float32)
        b1 = np.zeros((nb, s_pad, e_pad), np.float32)
        nm = np.zeros((nb, s_pad), np.float32)
        em = np.zeros((nb, e_pad), np.float32)
        deg = np.zeros((nb, s_pad), np.float32)
        n_gid_a = np.full((nb, s_pad), ng, np.int32)
        s_gid_a = np.full((nb, e_pad), ng, np.int32)
        # The NumPy path enumerates samples in batch order; both orders
        # write disjoint destinations, so bin-major is equivalent — except
        # n_gid/s_gid, which carry the batch position explicitly via `gid`.
        lib.packed_fill_level(
            nbatch, sample_idx, bin_of, offs_n[lv], offs_e[lv],
            fl.num_nodes, fl.num_edges,
            fl.l0_off, fl.l0_rows, fl.l0_cols, fl.l0_vals,
            fl.l1_off, fl.l1_rows, fl.l1_cols, fl.l1_vals,
            fl.e_off, fl.src, fl.dst,
            gid,
            s_pad, e_pad,
            l0, l1, b1, nm, em, deg, n_gid_a, s_gid_a,
        )
        levels.append(
            DenseLevel(
                l0=l0, l1=l1, b1=b1, node_mask=nm, edge_mask=em, deg=deg,
                num_graphs=ng, n_gid=n_gid_a, s_gid=s_gid_a,
            )
        )

    pools: list[DensePool] = []
    for lv in range(flat.depth - 1):
        sc, ec = caps[lv + 1].nodes, caps[lv + 1].edges
        sf, ef = caps[lv].nodes, caps[lv].edges
        p_t = np.zeros((nb, sc, sf), np.float32)
        p_s = np.zeros((nb, ec, ef), np.float32)
        lib.packed_fill_pool(
            nbatch, sample_idx, bin_of,
            offs_n[lv], offs_e[lv], offs_n[lv + 1], offs_e[lv + 1],
            flat.cn_off[lv], flat.c_node[lv],
            flat.ce_off[lv], flat.c_edge[lv],
            nb, sc, sf, ec, ef,
            p_t, p_s,
        )
        pools.append(DensePool(p_t=p_t, p_s=p_s))

    ft = flat.x_t.shape[1]
    fs = flat.x_s.shape[1]
    x_t = np.zeros((nb, caps[0].nodes, ft), np.float32)
    x_s = np.zeros((nb, caps[0].edges, fs), np.float32)
    lvl0 = flat.levels[0]
    lib.packed_fill_rows(
        nbatch, sample_idx, bin_of, offs_n[0], flat.n_off, flat.x_t,
        ft, caps[0].nodes, x_t,
    )
    lib.packed_fill_rows(
        nbatch, sample_idx, bin_of, offs_e[0], lvl0.e_off, flat.x_s,
        fs, caps[0].edges, x_s,
    )

    if y_per_edge:
        y = np.zeros(
            (nb, caps[0].edges) + flat.y_trailing, np.float32
        )
        lib.packed_fill_rows(
            nbatch, sample_idx, bin_of, offs_e[0], lvl0.e_off,
            flat.y_edge, flat.y_edge_feat, caps[0].edges,
            y.reshape(nb, caps[0].edges, -1),
        )
    else:
        y = flat.y_graph[indices]

    return DenseBatch(
        x_t=x_t, x_s=x_s, y=y, levels=tuple(levels), pools=tuple(pools),
        num_graphs=ng,
    )


def collate_packed_compact(
    flat: FlatSamples,
    indices,
    *,
    node_cap: int = 128,
    edge_cap: int = 128,
    multiple: int = 8,
    y_per_edge: bool = False,
    num_blocks: int | None = None,
    level_caps: list[tuple[int, int]] | None = None,
    bins: list[list[int]] | None = None,
    nnz_caps=None,
    nnz_multiple: int = 2048,
    pool_caps: list[int] | None = None,
    operators: str = "coo",
    slim: bool = True,
    pack_rows: bool = True,
    row_caps: tuple[int, int] | None = None,
    row_multiple: int = 256,
):
    """Packed batch in the compact transfer format (complex/compact.py):
    same placements as `collate_packed_fast`, but operators travel as COO
    triplets and densify ON DEVICE via `inflate` (Trainer does so
    automatically).  `inflate(collate_packed_compact(...))` equals
    `collate_packed_fast(...)` exactly (tests/test_data.py).

    ``operators='derived'`` ships only B1 + per-graph 2/λmax and rebuilds
    L0/L1/deg on device (≤1 ulp vs the host values; CompactLevel docstring).

    ``slim`` drops the masks from the transfer (derived from gids on
    device) and narrows id columns to int16 where ranges fit;
    ``pack_rows`` ships only the real feature rows plus their flat
    destinations instead of the zero-padded dense feature blocks
    (~20-25% of feature bytes on packed superblocks).  Both are exact.

    Pure vectorized NumPy — no native library required.  Pin ``nnz_caps`` /
    ``pool_caps`` / ``row_caps`` across batches for static jit shapes
    (defaults round up to ``nnz_multiple``)."""
    from hl_hgat_tpu.complex.compact import (
        CompactBatch,
        CompactPool,
        _gather_ranges,
        _pad_i32,
        _pad_ids,
        _round_cap,
        compact_operators,
        flat_positions,
    )

    indices = np.ascontiguousarray(indices, np.int64)
    pl = _placements(
        flat, indices, bins, node_cap, edge_cap, multiple, num_blocks,
        level_caps,
    )
    nb, ng = pl.nb, pl.ng
    sample_idx, bin_of = pl.sample_idx, pl.bin_of
    levels, _ = compact_operators(
        flat, sample_idx, pl.gid, bin_of, pl.offs_n, pl.offs_e, pl.caps,
        nb, ng, nnz_multiple=nnz_multiple, nnz_caps=nnz_caps,
        operators=operators, slim=slim,
    )

    lvl0 = flat.levels[0]
    n_sz = lvl0.num_nodes[sample_idx].astype(np.int64)
    e_sz = lvl0.num_edges[sample_idx].astype(np.int64)
    rows0 = flat_positions(bin_of, pl.offs_n[0], n_sz, pl.caps[0].nodes)
    cols0 = flat_positions(bin_of, pl.offs_e[0], e_sz, pl.caps[0].edges)
    ft, fs = flat.x_t.shape[1], flat.x_s.shape[1]
    xt_rows = flat.x_t[_gather_ranges(flat.n_off, sample_idx)]
    xs_rows = flat.x_s[_gather_ranges(lvl0.e_off, sample_idx)]
    x_t_rows = x_s_rows = None
    if pack_rows:
        n_flat = nb * pl.caps[0].nodes
        e_flat = nb * pl.caps[0].edges
        if row_caps is not None:
            ncap, ecap = row_caps
        else:
            # finer rounding than the nnz caps (features are wide, so cap
            # slack is expensive), never beyond the dense row count
            ncap = min(_round_cap(rows0.size, row_multiple), n_flat)
            ecap = min(_round_cap(cols0.size, row_multiple), e_flat)
        if rows0.size > ncap or cols0.size > ecap:
            raise ValueError(
                f"feature rows ({rows0.size}, {cols0.size}) exceed "
                f"row_caps ({ncap}, {ecap})"
            )
        x_t = np.zeros((ncap, ft), np.float32)
        x_t[: rows0.size] = xt_rows
        x_s = np.zeros((ecap, fs), np.float32)
        x_s[: cols0.size] = xs_rows
        # padding entries point one past the end → dropped by the scatter
        x_t_rows = _pad_ids(rows0, ncap, n_flat, n_flat)
        x_s_rows = _pad_ids(cols0, ecap, e_flat, e_flat)
    else:
        x_t = np.zeros((nb * pl.caps[0].nodes, ft), np.float32)
        x_t[rows0] = xt_rows
        x_s = np.zeros((nb * pl.caps[0].edges, fs), np.float32)
        x_s[cols0] = xs_rows

    pools = []
    for lv in range(flat.depth - 1):
        sc, ec = pl.caps[lv + 1].nodes, pl.caps[lv + 1].edges
        sf, ef = pl.caps[lv].nodes, pl.caps[lv].edges
        cn = flat.c_node[lv][_gather_ranges(flat.cn_off[lv], sample_idx)]
        ce = flat.c_edge[lv][_gather_ranges(flat.ce_off[lv], sample_idx)]
        fn_sz = (
            flat.cn_off[lv][sample_idx + 1] - flat.cn_off[lv][sample_idx]
        ).astype(np.int64)
        fe_sz = (
            flat.ce_off[lv][sample_idx + 1] - flat.ce_off[lv][sample_idx]
        ).astype(np.int64)
        local_n = np.arange(int(fn_sz.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(fn_sz) - fn_sz, fn_sz
        )
        local_e = np.arange(int(fe_sz.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(fe_sz) - fe_sz, fe_sz
        )
        tb = np.repeat(bin_of, fn_sz)
        tr = cn + np.repeat(pl.offs_n[lv + 1].astype(np.int64), fn_sz)
        tc = local_n + np.repeat(pl.offs_n[lv].astype(np.int64), fn_sz)
        keep = cn >= 0
        tb, tr, tc = tb[keep], tr[keep], tc[keep]
        sb = np.repeat(bin_of, fe_sz)
        sr = ce + np.repeat(pl.offs_e[lv + 1].astype(np.int64), fe_sz)
        sc_col = local_e + np.repeat(pl.offs_e[lv].astype(np.int64), fe_sz)
        keep = ce >= 0
        sb, sr, sc_col = sb[keep], sr[keep], sc_col[keep]
        cap = (
            pool_caps[lv]
            if pool_caps is not None
            else _round_cap(max(tb.size, sb.size), nnz_multiple)
        )
        if tb.size > cap or sb.size > cap:
            raise ValueError(
                f"pool {lv} entries ({tb.size}, {sb.size}) exceed cap {cap}"
            )
        if slim:
            pools.append(
                CompactPool(
                    t_b=_pad_ids(tb, cap, nb, nb),
                    t_r=_pad_ids(tr, cap, 0, sc),
                    t_c=_pad_ids(tc, cap, 0, sf),
                    s_b=_pad_ids(sb, cap, nb, nb),
                    s_r=_pad_ids(sr, cap, 0, ec),
                    s_c=_pad_ids(sc_col, cap, 0, ef),
                    sc=sc, sf=sf, ec=ec, ef=ef,
                )
            )
        else:
            pools.append(
                CompactPool(
                    t_b=_pad_i32(tb, cap, nb), t_r=_pad_i32(tr, cap, 0),
                    t_c=_pad_i32(tc, cap, 0),
                    s_b=_pad_i32(sb, cap, nb), s_r=_pad_i32(sr, cap, 0),
                    s_c=_pad_i32(sc_col, cap, 0),
                    sc=sc, sf=sf, ec=ec, ef=ef,
                )
            )

    y_packed = False
    if y_per_edge:
        ye_rows = flat.y_edge[_gather_ranges(lvl0.e_off, sample_idx)]
        if pack_rows:
            # y packs with the edge rows (shares x_s_rows); inflate
            # rebuilds [nb, E, *trailing]
            y = np.zeros((x_s.shape[0],) + flat.y_trailing, np.float32)
            y.reshape(x_s.shape[0], -1)[: cols0.size] = ye_rows.reshape(
                cols0.size, -1
            )
            y_packed = True
        else:
            y = np.zeros(
                (nb * pl.caps[0].edges, flat.y_edge_feat), np.float32
            )
            y[cols0] = ye_rows
            y = y.reshape((nb, pl.caps[0].edges) + flat.y_trailing)
    else:
        y = flat.y_graph[indices]

    if not pack_rows:
        x_t = x_t.reshape(nb, pl.caps[0].nodes, ft)
        x_s = x_s.reshape(nb, pl.caps[0].edges, fs)
    return CompactBatch(
        x_t=x_t, x_s=x_s,
        y=y, levels=tuple(levels), pools=tuple(pools), num_graphs=ng,
        x_t_rows=x_t_rows, x_s_rows=x_s_rows, y_packed=y_packed,
    )
