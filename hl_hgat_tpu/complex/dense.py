"""Dense-block batch format — the MXU fast path.

Benchmark graphs are small (ZINC ~23 nodes, CIFAR10-SP ~117, Peptides ~151):
padding each graph's Hodge Laplacians to a dense [S, S] tile and batching
[G, S, S] turns EVERY sparse op in the model — Laplacian mat-vecs, |B1|
boundary products, cluster pooling, readout — into batched dense matmuls
that run on the 128×128 systolic array at full rate.  The FLOP overhead vs
COO (~S/deg per row) is repaid by orders-of-magnitude higher throughput per
FLOP; this is the core "sparse graphs on dense hardware" design decision
(SURVEY.md §7; Fast-Training-of-Sparse-GNNs pattern).

The COO path (`ComplexBatch`) remains the general/scale-out representation;
models dispatch on the batch type, so the two paths share all module code.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from hl_hgat_tpu.complex.batch import CooMatrix, _pytree_dataclass
from hl_hgat_tpu.complex.build import GraphSample, boundary_dense, hodge_laplacians


@_pytree_dataclass
class BlockDiagMatrix:
    """Dense block-diagonal operator + COO spill for cross-block entries.

    ``blocks`` [G, S, S] holds the within-block entries (MXU batched
    matmuls); ``spill`` is a :class:`CooMatrix` over the FLATTENED
    ``G·S`` row/col space carrying entries whose endpoints land in
    different blocks — present only when a graph is larger than one block
    (the large-graph fast path: TSP 500-node instances, brain complexes).
    ``lap_matvec`` adds ``spmm_coo`` of the spill over ``x.reshape(G·S,
    C)`` to the batched matmul — with a locality ordering (``bfs_order``)
    the spill carries a few percent of nnz, so the op stays MXU-bound.

    ``band_up``/``band_dn`` [G, S, S] carry the entries that couple a block
    to its immediate neighbour (col-block = row-block ± 1) as TWO more
    batched matmuls over block-shifted operands instead of COO scatter:
    with the BFS ordering nearly all cross-block entries are
    nearest-neighbour, and the round-2 TSP profile measured each spill
    scatter at ~60 GB/s (~4.9 ms for 286k nnz × 256 features) vs ~100 us
    for the equivalent banded matmuls — the scatter dominated the whole
    training step.  Only entries |row_block − col_block| ≥ 2 remain in
    ``spill``.
    """

    blocks: Any  # [G, S, S]
    spill: Any = None  # CooMatrix over (G*S, G*S) flat slots, or None
    band_up: Any = None  # [G, S, S]: row-block g ← col-block g+1, or None
    band_dn: Any = None  # [G, S, S]: row-block g ← col-block g-1, or None


@_pytree_dataclass(meta=("num_graphs",))
class DenseLevel:
    """One resolution level in dense-block layout.

    Two packings share this container:

    * one graph per block (``collate_dense``): ``n_gid``/``s_gid`` are None
      and per-graph readout reduces over axis 1;
    * **superblock packing** (``collate_dense_packed``): several small graphs
      share one [S, S] tile with block-diagonal operators, and
      ``n_gid``/``s_gid`` carry each row's global graph id (padding rows
      point at ``num_graphs`` — the dump-bucket idiom).  Rationale: the MXU
      processes 128×128 tiles per pass, so a 40×40 per-graph Laplacian
      mat-vec wastes ~90% of every pass; packing ~4–5 ZINC-sized graphs per
      128-row tile cuts tile passes by the packing factor and shrinks total
      padded rows.  Graphs LARGER than one block span several consecutive
      blocks; their cross-block operator entries ride in ``BlockDiagMatrix
      .spill`` / ``b1_sp`` (no hard size cap — closes the COO-fallback
      cliff for reference TSP-500/brain workloads).
    """

    l0: Any  # [G, S, S] float32, or BlockDiagMatrix when spill present
    l1: Any  # [G, E, E] (same)
    b1: Any  # [G, S, E] signed incidence (−1 src, +1 dst)
    node_mask: Any  # [G, S]
    edge_mask: Any  # [G, E]
    deg: Any  # [G, S]
    num_graphs: int
    n_gid: Any = None  # [G, S] int32 — packed layout only
    s_gid: Any = None  # [G, E] int32 — packed layout only
    b1_sp: Any = None  # CooMatrix (G*S, G*E) — far cross-block B1 entries
    b1_bu: Any = None  # [G, S, E]: B1 rows of block g vs edge cols g+1
    b1_bd: Any = None  # [G, S, E]: same vs edge cols g-1

    @property
    def nodes_per_graph(self) -> int:
        return self.node_mask.shape[1]

    @property
    def edges_per_graph(self) -> int:
        return self.edge_mask.shape[1]


@_pytree_dataclass
class DensePool:
    """Fine→coarse averaging operators (row-stochastic over members).

    ``p_t_sp``/``p_s_sp`` carry cross-block assignment entries for graphs
    spanning several blocks (CooMatrix over flat coarse×fine slots; values
    already divided by the global member count so dense+spill sum to the
    scatter-mean)."""

    p_t: Any  # [G, S_c, S_f]
    p_s: Any  # [G, E_c, E_f]
    p_t_sp: Any = None
    p_s_sp: Any = None


@_pytree_dataclass(meta=("num_graphs",))
class DenseBatch:
    x_t: Any  # [G, S, Ft]
    x_s: Any  # [G, E, Fs]
    y: Any
    levels: tuple[DenseLevel, ...]
    pools: tuple[DensePool, ...]
    num_graphs: int

    @property
    def level0(self) -> DenseLevel:
        return self.levels[0]

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DensePad:
    nodes: int
    edges: int


def dense_pad_spec(samples: list[GraphSample], *, multiple: int = 8):
    """Per-level (max nodes, max edges) over the batch, rounded up."""
    rnd = lambda x: max(-(-x // multiple) * multiple, multiple)  # noqa: E731
    depth = len(samples[0].levels)
    return [
        DensePad(
            nodes=rnd(max(s.levels[lv].num_nodes for s in samples)),
            edges=rnd(max(s.levels[lv].num_edges for s in samples)),
        )
        for lv in range(depth)
    ]


def collate_dense(
    samples: list[GraphSample],
    pads: list[DensePad] | None = None,
    *,
    multiple: int = 8,
    y_per_edge: bool = False,
) -> DenseBatch:
    """Pack samples into the dense-block layout."""
    if pads is None:
        pads = dense_pad_spec(samples, multiple=multiple)
    g = len(samples)
    depth = len(samples[0].levels)

    levels: list[DenseLevel] = []
    for lv in range(depth):
        s_pad, e_pad = pads[lv].nodes, pads[lv].edges
        l0 = np.zeros((g, s_pad, s_pad), np.float32)
        l1 = np.zeros((g, e_pad, e_pad), np.float32)
        b1 = np.zeros((g, s_pad, e_pad), np.float32)
        nm = np.zeros((g, s_pad), np.float32)
        em = np.zeros((g, e_pad), np.float32)
        deg = np.zeros((g, s_pad), np.float32)
        for i, s in enumerate(samples):
            st = s.levels[lv]
            n, e = st.num_nodes, st.num_edges
            if n > s_pad or e > e_pad:
                raise ValueError(
                    f"sample exceeds dense pad: {n}>{s_pad} or {e}>{e_pad}"
                )
            d0 = np.zeros((n, n), np.float32)
            d0[st.l0_rows, st.l0_cols] = st.l0_vals
            d1 = np.zeros((e, e), np.float32)
            d1[st.l1_rows, st.l1_cols] = st.l1_vals
            l0[i, :n, :n] = d0
            l1[i, :e, :e] = d1
            b1[i, :n, :e] = boundary_dense(st.src, st.dst, n)
            nm[i, :n] = 1.0
            em[i, :e] = 1.0
            np.add.at(deg[i], st.src, 1.0)
            np.add.at(deg[i], st.dst, 1.0)
        levels.append(
            DenseLevel(
                l0=l0, l1=l1, b1=b1, node_mask=nm, edge_mask=em, deg=deg,
                num_graphs=g,
            )
        )

    pools: list[DensePool] = []
    for lv in range(depth - 1):
        sc, ec = pads[lv + 1].nodes, pads[lv + 1].edges
        sf, ef = pads[lv].nodes, pads[lv].edges
        p_t = np.zeros((g, sc, sf), np.float32)
        p_s = np.zeros((g, ec, ef), np.float32)
        for i, s in enumerate(samples):
            c_node, c_edge = s.pools[lv]
            cn = c_node.reshape(-1)
            valid_n = cn >= 0
            idx = np.nonzero(valid_n)[0]
            p_t[i, cn[idx], idx] = 1.0
            ce = c_edge.reshape(-1)
            valid_e = ce >= 0
            idx = np.nonzero(valid_e)[0]
            p_s[i, ce[idx], idx] = 1.0
            # row-normalize to means (scatter_mean semantics)
            for p in (p_t, p_s):
                rs = p[i].sum(axis=1, keepdims=True)
                p[i] = p[i] / np.maximum(rs, 1.0)
        pools.append(DensePool(p_t=p_t, p_s=p_s))

    ft = samples[0].x_t.shape[1]
    fs = samples[0].x_s.shape[1]
    x_t = np.zeros((g, pads[0].nodes, ft), np.float32)
    x_s = np.zeros((g, pads[0].edges, fs), np.float32)
    for i, s in enumerate(samples):
        x_t[i, : s.num_nodes] = s.x_t
        x_s[i, : s.num_edges] = s.x_s

    if y_per_edge:
        y = np.zeros((g, pads[0].edges) + samples[0].y.shape[1:], np.float32)
        for i, s in enumerate(samples):
            y[i, : s.num_edges] = s.y
    else:
        y = np.stack([np.asarray(s.y, np.float32).reshape(-1) for s in samples])

    return DenseBatch(
        x_t=x_t, x_s=x_s, y=y, levels=tuple(levels), pools=tuple(pools),
        num_graphs=g,
    )


# ---------------------------------------------------------------------------
# superblock packing — several graphs per dense tile
# ---------------------------------------------------------------------------


def collate_dense_shared(
    samples: "list[GraphSample]",
    *,
    multiple: int = 8,
    y_per_edge: bool = False,
) -> DenseBatch:
    """Dense layout for SHARED-SKELETON datasets (the brain family): every
    sample must carry IDENTICAL structure at every level, so the operators
    are built ONCE with a leading broadcast dim of 1 — ``l0``/``l1``/``b1``
    are [1, S, S]-shaped and every mat-vec becomes a single
    [S, S] @ [S, G·C] MXU GEMM over all subjects (ops/dispatch.py ``_bmm``
    broadcast branch) instead of G scattered SpMMs.

    Motivation (benchmarks/RESULTS.md round 3): the reference brain
    workload (Brain_MLGC_ALL, HL-HGAT-DEMO/lib/Hodge_Dataset.py:110-145)
    shares one Shen-268 skeleton across all subjects; its FC-dense L1
    (~134 nnz/edge) has no block locality (48% of entries fall ≥2 blocks
    off-diagonal after BFS reorder), so both the COO path (23k edges/s)
    and the banded-spill path are scatter-bound — while the SHARED dense
    operator is one 162 MB bf16 matrix read once per mat-vec for the whole
    batch.

    Features/masks stay per-graph [G, S, *]; pooling matrices are shared
    [1, S_c, S_f] as well.  Rows keep the samples' original simplex order
    (no BFS reorder), so flatten-readout heads and checkpoint imports see
    the reference ordering.
    """
    g = len(samples)
    ref = samples[0]
    depth = len(ref.levels)
    for smp in samples[1:]:
        for lv in range(depth):
            a, b = ref.levels[lv], smp.levels[lv]
            if not (np.array_equal(a.src, b.src)
                    and np.array_equal(a.dst, b.dst)):
                raise ValueError(
                    "collate_dense_shared requires identical structure "
                    f"across samples (level {lv} differs)"
                )
            # operators are taken from samples[0]; topologically identical
            # samples with different Laplacian WEIGHTS would otherwise
            # batch silently under the wrong operators
            if not (np.array_equal(a.l0_vals, b.l0_vals)
                    and np.array_equal(a.l1_vals, b.l1_vals)):
                raise ValueError(
                    "collate_dense_shared requires identical operator "
                    f"values across samples (level {lv} L0/L1 differ)"
                )
        for lv, (pa, pb) in enumerate(zip(ref.pools, smp.pools)):
            if not (np.array_equal(pa[0], pb[0])
                    and np.array_equal(pa[1], pb[1])):
                raise ValueError(
                    "collate_dense_shared requires identical pooling "
                    f"assignments across samples (pool {lv} differs)"
                )

    def rnd(x: int) -> int:
        return ((x + multiple - 1) // multiple) * multiple

    levels: list[DenseLevel] = []
    for lv in range(depth):
        st = ref.levels[lv]
        n, e = st.num_nodes, st.num_edges
        s_pad, e_pad = rnd(n), rnd(e)
        l0 = np.zeros((1, s_pad, s_pad), np.float32)
        l1 = np.zeros((1, e_pad, e_pad), np.float32)
        b1 = np.zeros((1, s_pad, e_pad), np.float32)
        l0[0, st.l0_rows, st.l0_cols] = st.l0_vals
        l1[0, st.l1_rows, st.l1_cols] = st.l1_vals
        b1[0, :n, :e] = boundary_dense(st.src, st.dst, n)
        nm = np.zeros((g, s_pad), np.float32)
        em = np.zeros((g, e_pad), np.float32)
        nm[:, :n] = 1.0
        em[:, :e] = 1.0
        deg = np.zeros((g, s_pad), np.float32)
        np.add.at(deg[0], st.src, 1.0)
        np.add.at(deg[0], st.dst, 1.0)
        deg[1:] = deg[0]
        levels.append(DenseLevel(
            l0=l0, l1=l1, b1=b1, node_mask=nm, edge_mask=em, deg=deg,
            num_graphs=g,
        ))

    pools: list[DensePool] = []
    for lv in range(depth - 1):
        sc, ec = rnd(ref.levels[lv + 1].num_nodes), rnd(
            ref.levels[lv + 1].num_edges)
        sf, ef = rnd(ref.levels[lv].num_nodes), rnd(ref.levels[lv].num_edges)
        p_t = np.zeros((1, sc, sf), np.float32)
        p_s = np.zeros((1, ec, ef), np.float32)
        c_node, c_edge = ref.pools[lv]
        cn = np.asarray(c_node).reshape(-1)
        idx = np.nonzero(cn >= 0)[0]
        p_t[0, cn[idx], idx] = 1.0
        ce = np.asarray(c_edge).reshape(-1)
        idx = np.nonzero(ce >= 0)[0]
        p_s[0, ce[idx], idx] = 1.0
        for p in (p_t, p_s):
            rs = p[0].sum(axis=1, keepdims=True)
            p[0] = p[0] / np.maximum(rs, 1.0)
        pools.append(DensePool(p_t=p_t, p_s=p_s))

    n0, e0 = ref.levels[0].num_nodes, ref.levels[0].num_edges
    s_pad, e_pad = rnd(n0), rnd(e0)
    x_t = np.zeros((g, s_pad, ref.x_t.shape[1]), np.float32)
    x_s = np.zeros((g, e_pad, ref.x_s.shape[1]), np.float32)
    for i, smp in enumerate(samples):
        x_t[i, :n0] = smp.x_t
        x_s[i, :e0] = smp.x_s
    if y_per_edge:
        y = np.zeros((g, e_pad) + ref.y.shape[1:], np.float32)
        for i, smp in enumerate(samples):
            y[i, :e0] = smp.y
    else:
        y = np.stack([np.asarray(smp.y, np.float32).reshape(-1)
                      for smp in samples])

    return DenseBatch(
        x_t=x_t, x_s=x_s, y=y, levels=tuple(levels), pools=tuple(pools),
        num_graphs=g,
    )


def pack_graphs(
    samples: list[GraphSample], node_cap: int, edge_cap: int
) -> list[list[int]]:
    """Next-fit-decreasing bin packing by level-0 (nodes, edges).

    Sorting by size first keeps bins homogeneous; next-fit is O(G) — the
    host CPU here is heavily throttled, so no quadratic first-fit scan.
    """
    bins, spans = pack_plan(samples, node_cap, edge_cap, allow_span=False)
    return bins


# Deterministic FFD sort keys, best-of kept (see pack_plan).  max(n, e)
# targets the binding resource; the rest cover skewed distributions.
# Shared contract with data/fast_collate.py::pack_indices.
_PACK_SORT_KEYS = (
    lambda n, e: max(n, e),
    lambda n, e: n + e,
    lambda n, e: e,
    lambda n, e: n,
)


def pack_plan(
    samples: list[GraphSample],
    node_cap: int,
    edge_cap: int,
    *,
    allow_span: bool = True,
) -> tuple[list[list[int]], dict[int, int]]:
    """Bin packing that also handles graphs LARGER than one block.

    Oversized graphs become single-member bins spanning
    ``max(⌈n/node_cap⌉, ⌈e/edge_cap⌉)`` consecutive blocks (``spans[i]``);
    their cross-block operator entries go to the COO spill at collate time.
    """
    # Round-5 packer: first-fit decreasing tried under SEVERAL deterministic
    # sort keys, keeping the fewest-bin result (earliest order wins ties).
    # Round 4's single (n+e)-sorted FFD took next-fit's 72 blocks down to
    # 66 on the 320-graph flagship batch.  On the committed batch-384 bench
    # distribution every order lands on 78 blocks (lower bound 76; a
    # 400-restart randomized probe found nothing below 78 — the practical
    # floor), but on closely related draws (n+e) alone packs 79 where
    # max(n, e) — the classic vector-packing surrogate for the binding
    # resource — finds 78, so best-of-orders never loses and guards the
    # loader's real data distributions.  Must stay identical to
    # data/fast_collate.py::pack_indices (the loader's packer) — same
    # orders, same tie-break.
    spans: dict[int, int] = {}
    packable: list[int] = []
    span_bins: list[list[int]] = []
    for i in range(len(samples)):
        n, e = samples[i].num_nodes, samples[i].num_edges
        if n > node_cap or e > edge_cap:
            if not allow_span:
                raise ValueError(
                    f"graph ({n} nodes, {e} edges) exceeds pack caps "
                    f"({node_cap}, {edge_cap})"
                )
            span_bins.append([i])
            spans[i] = max(-(-n // node_cap), -(-e // edge_cap))
        else:
            packable.append(i)

    def ffd(order: list[int]) -> list[list[int]]:
        bins: list[list[int]] = []
        rem_n: list[int] = []
        rem_e: list[int] = []
        for i in order:
            n, e = samples[i].num_nodes, samples[i].num_edges
            for b in range(len(rem_n)):
                if rem_n[b] >= n and rem_e[b] >= e:
                    bins[b].append(i)
                    rem_n[b] -= n
                    rem_e[b] -= e
                    break
            else:
                bins.append([i])
                rem_n.append(node_cap - n)
                rem_e.append(edge_cap - e)
        return bins

    keys = _PACK_SORT_KEYS
    best: list[list[int]] | None = None
    for key in keys:
        order = sorted(
            packable,
            key=lambda i: (
                -key(samples[i].num_nodes, samples[i].num_edges), i
            ),
        )
        bins = ffd(order)
        if best is None or len(bins) < len(best):
            best = bins
    # spanning bins first: keeps their block ranges contiguous and stable
    return span_bins + (best or []), spans


# ---------------------------------------------------------------------------
# locality ordering for spanning graphs
# ---------------------------------------------------------------------------


def bfs_node_order(src, dst, num_nodes: int) -> np.ndarray:
    """BFS relabelling (old → new id) so neighbours land in nearby slots.

    For a graph split across 128-row blocks, the share of operator entries
    that cross block boundaries (→ COO spill) is roughly the share of
    edges whose endpoints sit ≥128 apart in the ordering; BFS keeps most
    within a frontier's width."""
    adj_head = np.full(num_nodes, -1, np.int64)
    nxt = np.empty(2 * src.shape[0], np.int64)
    pts = np.empty(2 * src.shape[0], np.int64)
    for k, (u, v) in enumerate(((src, dst), (dst, src))):
        base = k * src.shape[0]
        for j in range(src.shape[0]):
            pts[base + j] = v[j]
            nxt[base + j] = adj_head[u[j]]
            adj_head[u[j]] = base + j
    perm = np.full(num_nodes, -1, np.int64)
    order = []
    for seed in range(num_nodes):
        if perm[seed] >= 0:
            continue
        queue = [seed]
        perm[seed] = 0  # mark visited; renumber later
        while queue:
            u = queue.pop(0)
            order.append(u)
            ptr = adj_head[u]
            while ptr >= 0:
                v = int(pts[ptr])
                if perm[v] < 0:
                    perm[v] = 0
                    queue.append(v)
                ptr = nxt[ptr]
    out = np.empty(num_nodes, np.int64)
    out[np.asarray(order)] = np.arange(num_nodes)
    return out


def reorder_sample(sample: GraphSample, *, y_per_edge: bool = False) -> GraphSample:
    """Locality-permute level 0 (BFS nodes, endpoint-sorted edges).

    Graph ops are permutation-equivariant, so models produce identical
    per-graph outputs (per-simplex outputs permuted alongside their
    features/labels).  Edge orientations are preserved — B1 signs are
    untouched.  Only level 0 is permuted; pool assignments are re-indexed.
    """
    st = sample.levels[0]
    n, e = st.num_nodes, st.num_edges
    nperm = bfs_node_order(st.src, st.dst, n)  # old → new
    new_src = nperm[st.src]
    new_dst = nperm[st.dst]
    ekey = np.minimum(new_src, new_dst) * (n + 1) + np.maximum(new_src, new_dst)
    e_order = np.argsort(ekey, kind="stable")  # new position → old idx
    eperm = np.empty(e, np.int64)  # old → new
    eperm[e_order] = np.arange(e)

    import dataclasses as _dc

    new_level = _dc.replace(
        st,
        src=new_src[e_order].astype(np.int32),
        dst=new_dst[e_order].astype(np.int32),
        l0_rows=nperm[st.l0_rows].astype(np.int32),
        l0_cols=nperm[st.l0_cols].astype(np.int32),
        l1_rows=eperm[st.l1_rows].astype(np.int32),
        l1_cols=eperm[st.l1_cols].astype(np.int32),
    )
    n_new2old = np.empty(n, np.int64)
    n_new2old[nperm] = np.arange(n)
    x_t = sample.x_t[n_new2old]
    x_s = sample.x_s[e_order]
    y = sample.y[e_order] if y_per_edge else sample.y
    pools = list(sample.pools)
    if pools:
        c_node, c_edge = pools[0]
        pools[0] = (
            np.asarray(c_node).reshape(-1)[n_new2old],
            np.asarray(c_edge).reshape(-1)[e_order],
        )
    return _dc.replace(
        sample, x_t=x_t, x_s=x_s, y=y,
        levels=[new_level] + list(sample.levels[1:]), pools=pools,
    )


def _make_spill(rows, cols, vals, shape, *, pad_multiple, symmetric=False):
    """Pad a spill entry list to a static nnz and wrap as CooMatrix.

    Padding entries are (0, 0, 0.0) — zero values contribute nothing to the
    segment sums.  nnz rounds up to ``pad_multiple`` (pin batch shapes by
    keeping batch composition stable, or raise the multiple)."""
    nnz = rows.shape[0]
    if nnz == 0:
        return None
    target = -(-nnz // pad_multiple) * pad_multiple
    pad = target - nnz
    rows = np.pad(rows.astype(np.int32), (0, pad))
    cols = np.pad(cols.astype(np.int32), (0, pad))
    vals = np.pad(vals.astype(np.float32), (0, pad))
    return CooMatrix(
        rows=rows, cols=cols, vals=vals, shape=shape, symmetric=symmetric
    )


def collate_dense_packed(
    samples: list[GraphSample],
    *,
    node_cap: int = 128,
    edge_cap: int = 128,
    multiple: int = 8,
    y_per_edge: bool = False,
    bins: list[list[int]] | None = None,
    spans: dict[int, int] | None = None,
    num_blocks: int | None = None,
    level_caps: list[tuple[int, int]] | None = None,
    spill_pad_multiple: int = 256,
) -> DenseBatch:
    """Pack several graphs per dense block (block-diagonal operators).

    Level-0 blocks are capped at (node_cap, edge_cap) — 128 is the MXU tile
    quantum and measurably optimal; coarser levels reuse the same graph→bin
    assignment with caps derived from the largest bin.  Per-graph readout
    uses the ``n_gid``/``s_gid`` segment ids (ops/dispatch.py).

    Graphs larger than one block (reference TSP 500-node instances,
    lib/Hodge_Dataset.py:670-745; brain complexes) span consecutive blocks:
    within-block operator entries stay dense, cross-block entries ride in
    COO spills (``BlockDiagMatrix.spill``, ``DenseLevel.b1_sp``,
    ``DensePool.p_*_sp``) applied as flat-slot ``spmm_coo`` corrections.
    Pre-permute such samples with :func:`reorder_sample` (BFS locality) to
    keep the spill small.  In spill mode every level uses the level-0 caps.

    For static shapes across batches (the jit contract), pass ``num_blocks``
    (extra blocks are all-padding) and ``level_caps`` = [(nodes, edges)] per
    level ≥ 1 (level 0 always uses node_cap/edge_cap).
    """
    if bins is None:
        bins, spans = pack_plan(samples, node_cap, edge_cap)
    elif spans is None:
        spans = {}
    ng = len(samples)
    depth = len(samples[0].levels)
    rnd = lambda x: max(-(-x // multiple) * multiple, multiple)  # noqa: E731
    spill_mode = bool(spans)

    # block index of each bin (spanning bins occupy several blocks)
    block_of_bin: list[int] = []
    cursor = 0
    for members in bins:
        block_of_bin.append(cursor)
        if len(members) == 1 and members[0] in spans:
            cursor += spans[members[0]]
        else:
            cursor += 1
    nb = cursor
    if num_blocks is not None:
        if nb > num_blocks:
            raise ValueError(f"packing needs {nb} blocks > cap {num_blocks}")
        nb = num_blocks

    # per-level caps + per-graph GLOBAL (node_slot, edge_slot) starts
    caps: list[DensePad] = []
    offs: list[dict[int, tuple[int, int]]] = []
    lvl_caps: list[tuple[int, int]] = []
    for lv in range(depth):
        max_n = max_e = 0
        for b, members in enumerate(bins):
            if len(members) == 1 and members[0] in spans:
                continue  # spanning bins handled by level-0 caps
            no = eo = 0
            for i in members:
                st = samples[i].levels[lv]
                no += st.num_nodes
                eo += st.num_edges
            max_n = max(max_n, no)
            max_e = max(max_e, eo)
        if lv == 0 or spill_mode:
            caps.append(DensePad(nodes=rnd(node_cap), edges=rnd(edge_cap)))
        elif level_caps is not None:
            cn, ce = level_caps[lv - 1]
            if max_n > cn or max_e > ce:
                raise ValueError(
                    f"level {lv} bin ({max_n}, {max_e}) exceeds caps ({cn}, {ce})"
                )
            caps.append(DensePad(nodes=rnd(cn), edges=rnd(ce)))
        else:
            caps.append(DensePad(nodes=rnd(max_n), edges=rnd(max_e)))
        s_lv, e_lv = caps[lv].nodes, caps[lv].edges
        lvl_caps.append((s_lv, e_lv))
        placement: dict[int, tuple[int, int]] = {}
        for b, members in enumerate(bins):
            blk0 = block_of_bin[b]
            is_span = len(members) == 1 and members[0] in spans
            no = eo = 0
            for i in members:
                st = samples[i].levels[lv]
                placement[i] = (blk0 * s_lv + no, blk0 * e_lv + eo)
                no += st.num_nodes
                eo += st.num_edges
            if not is_span and (no > s_lv or eo > e_lv):
                raise ValueError(
                    f"bin overflow at level {lv}: ({no}, {eo}) > "
                    f"({s_lv}, {e_lv})"
                )
        offs.append(placement)

    levels: list[DenseLevel] = []
    for lv in range(depth):
        s_pad, e_pad = caps[lv].nodes, caps[lv].edges
        l0 = np.zeros((nb, s_pad, s_pad), np.float32)
        l1 = np.zeros((nb, e_pad, e_pad), np.float32)
        b1 = np.zeros((nb, s_pad, e_pad), np.float32)
        nm = np.zeros((nb * s_pad,), np.float32)
        em = np.zeros((nb * e_pad,), np.float32)
        deg = np.zeros((nb * s_pad,), np.float32)
        n_gid = np.full((nb * s_pad,), ng, np.int32)
        s_gid = np.full((nb * e_pad,), ng, np.int32)
        sp0 = [[], [], []]
        sp1 = [[], [], []]
        spb = [[], [], []]
        # nearest-neighbour cross-block entries become band matmuls
        # (allocated lazily on first use); only |br-bc| >= 2 stays COO
        bands: dict[int, np.ndarray] = {}

        def band(key, shape):
            if key not in bands:
                bands[key] = np.zeros(shape, np.float32)
            return bands[key]

        def put(dense, r_gl, c_gl, v, s_r, s_c, spill, bkey):
            br = r_gl // s_r
            bc = c_gl // s_c
            same = br == bc
            dense[br[same], r_gl[same] % s_r, c_gl[same] % s_c] = v[same]
            if same.all():
                return
            up = bc == br + 1
            dn = bc == br - 1
            if up.any():
                band(bkey + "u", (nb, s_r, s_c))[
                    br[up], r_gl[up] % s_r, c_gl[up] % s_c
                ] = v[up]
            if dn.any():
                band(bkey + "d", (nb, s_r, s_c))[
                    br[dn], r_gl[dn] % s_r, c_gl[dn] % s_c
                ] = v[dn]
            far = ~(same | up | dn)
            if far.any():
                spill[0].append(r_gl[far])
                spill[1].append(c_gl[far])
                spill[2].append(v[far])

        for i, s in enumerate(samples):
            st = s.levels[lv]
            ns, es = offs[lv][i]
            n, e = st.num_nodes, st.num_edges
            put(l0, ns + st.l0_rows.astype(np.int64),
                ns + st.l0_cols.astype(np.int64), st.l0_vals, s_pad, s_pad,
                sp0, "l0")
            put(l1, es + st.l1_rows.astype(np.int64),
                es + st.l1_cols.astype(np.int64), st.l1_vals, e_pad, e_pad,
                sp1, "l1")
            ecols = es + np.arange(e, dtype=np.int64)
            put(b1, ns + st.src.astype(np.int64), ecols,
                -np.ones(e, np.float32), s_pad, e_pad, spb, "b1")
            put(b1, ns + st.dst.astype(np.int64), ecols,
                np.ones(e, np.float32), s_pad, e_pad, spb, "b1")
            nm[ns : ns + n] = 1.0
            em[es : es + e] = 1.0
            np.add.at(deg, ns + st.src, 1.0)
            np.add.at(deg, ns + st.dst, 1.0)
            n_gid[ns : ns + n] = i
            s_gid[es : es + e] = i

        def fin(spill, shape, symmetric):
            if not spill[0]:
                return None
            return _make_spill(
                np.concatenate(spill[0]), np.concatenate(spill[1]),
                np.concatenate(spill[2]), shape,
                pad_multiple=spill_pad_multiple, symmetric=symmetric,
            )

        spill0 = fin(sp0, (nb * s_pad, nb * s_pad), True)
        spill1 = fin(sp1, (nb * e_pad, nb * e_pad), True)
        spillb = fin(spb, (nb * s_pad, nb * e_pad), False)
        bd = bands.get
        l0_banded = spill0 is not None or "l0u" in bands or "l0d" in bands
        l1_banded = spill1 is not None or "l1u" in bands or "l1d" in bands
        levels.append(
            DenseLevel(
                l0=BlockDiagMatrix(l0, spill0, bd("l0u"), bd("l0d"))
                if l0_banded else l0,
                l1=BlockDiagMatrix(l1, spill1, bd("l1u"), bd("l1d"))
                if l1_banded else l1,
                b1=b1,
                node_mask=nm.reshape(nb, s_pad),
                edge_mask=em.reshape(nb, e_pad),
                deg=deg.reshape(nb, s_pad),
                num_graphs=ng,
                n_gid=n_gid.reshape(nb, s_pad),
                s_gid=s_gid.reshape(nb, e_pad),
                b1_sp=spillb,
                b1_bu=bd("b1u"),
                b1_bd=bd("b1d"),
            )
        )

    pools: list[DensePool] = []
    for lv in range(depth - 1):
        sc, ec = caps[lv + 1].nodes, caps[lv + 1].edges
        sf, ef = caps[lv].nodes, caps[lv].edges
        p_t = np.zeros((nb, sc, sf), np.float32)
        p_s = np.zeros((nb, ec, ef), np.float32)
        cnt_t = np.zeros(nb * sc, np.float64)
        cnt_s = np.zeros(nb * ec, np.float64)
        ent_t: list[tuple[np.ndarray, np.ndarray]] = []
        ent_s: list[tuple[np.ndarray, np.ndarray]] = []
        for i, s in enumerate(samples):
            fn, fe = offs[lv][i]
            cn_off, ce_off = offs[lv + 1][i]
            c_node, c_edge = s.pools[lv]
            cn = np.asarray(c_node).reshape(-1)
            idx = np.nonzero(cn >= 0)[0]
            r_gl = cn_off + cn[idx].astype(np.int64)
            c_gl = fn + idx.astype(np.int64)
            np.add.at(cnt_t, r_gl, 1.0)
            ent_t.append((r_gl, c_gl))
            ce = np.asarray(c_edge).reshape(-1)
            idx = np.nonzero(ce >= 0)[0]
            r_gl = ce_off + ce[idx].astype(np.int64)
            c_gl = fe + idx.astype(np.int64)
            np.add.at(cnt_s, r_gl, 1.0)
            ent_s.append((r_gl, c_gl))
        spt = [[], [], []]
        sps = [[], [], []]
        for (dense, cnt, ents, s_r, s_c, spill) in (
            (p_t, cnt_t, ent_t, sc, sf, spt),
            (p_s, cnt_s, ent_s, ec, ef, sps),
        ):
            for r_gl, c_gl in ents:
                v = (1.0 / np.maximum(cnt[r_gl], 1.0)).astype(np.float32)
                br, bc = r_gl // s_r, c_gl // s_c
                same = br == bc
                dense[br[same], r_gl[same] % s_r, c_gl[same] % s_c] = v[same]
                if not same.all():
                    spill[0].append(r_gl[~same])
                    spill[1].append(c_gl[~same])
                    spill[2].append(v[~same])

        def finp(spill, shape):
            if not spill[0]:
                return None
            return _make_spill(
                np.concatenate(spill[0]), np.concatenate(spill[1]),
                np.concatenate(spill[2]), shape,
                pad_multiple=spill_pad_multiple,
            )

        pools.append(DensePool(
            p_t=p_t, p_s=p_s,
            p_t_sp=finp(spt, (nb * sc, nb * sf)),
            p_s_sp=finp(sps, (nb * ec, nb * ef)),
        ))

    ft = samples[0].x_t.shape[1]
    fs = samples[0].x_s.shape[1]
    x_t = np.zeros((nb * caps[0].nodes, ft), np.float32)
    x_s = np.zeros((nb * caps[0].edges, fs), np.float32)
    for i, s in enumerate(samples):
        ns, es = offs[0][i]
        x_t[ns : ns + s.num_nodes] = s.x_t
        x_s[es : es + s.num_edges] = s.x_s
    x_t = x_t.reshape(nb, caps[0].nodes, ft)
    x_s = x_s.reshape(nb, caps[0].edges, fs)

    if y_per_edge:
        y = np.zeros((nb * caps[0].edges,) + samples[0].y.shape[1:], np.float32)
        for i, s in enumerate(samples):
            _, es = offs[0][i]
            y[es : es + s.num_edges] = s.y
        y = y.reshape((nb, caps[0].edges) + samples[0].y.shape[1:])
    else:
        y = np.stack([np.asarray(s.y, np.float32).reshape(-1) for s in samples])

    return DenseBatch(
        x_t=x_t, x_s=x_s, y=y, levels=tuple(levels), pools=tuple(pools),
        num_graphs=ng,
    )
