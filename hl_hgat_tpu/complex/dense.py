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

from hl_hgat_tpu.complex.batch import _pytree_dataclass
from hl_hgat_tpu.complex.build import GraphSample, boundary_dense, hodge_laplacians


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
      padded rows.
    """

    l0: Any  # [G, S, S] float32
    l1: Any  # [G, E, E]
    b1: Any  # [G, S, E] signed incidence (−1 src, +1 dst)
    node_mask: Any  # [G, S]
    edge_mask: Any  # [G, E]
    deg: Any  # [G, S]
    num_graphs: int
    n_gid: Any = None  # [G, S] int32 — packed layout only
    s_gid: Any = None  # [G, E] int32 — packed layout only

    @property
    def nodes_per_graph(self) -> int:
        return self.node_mask.shape[1]

    @property
    def edges_per_graph(self) -> int:
        return self.edge_mask.shape[1]


@_pytree_dataclass
class DensePool:
    """Fine→coarse averaging operators (row-stochastic over members)."""

    p_t: Any  # [G, S_c, S_f]
    p_s: Any  # [G, E_c, E_f]


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


def pack_graphs(
    samples: list[GraphSample], node_cap: int, edge_cap: int
) -> list[list[int]]:
    """Next-fit-decreasing bin packing by level-0 (nodes, edges).

    Sorting by size first keeps bins homogeneous; next-fit is O(G) — the
    host CPU here is heavily throttled, so no quadratic first-fit scan.
    """
    order = sorted(
        range(len(samples)),
        key=lambda i: -(samples[i].num_nodes + samples[i].num_edges),
    )
    bins: list[list[int]] = []
    cur: list[int] = []
    cn = ce = 0
    for i in order:
        n, e = samples[i].num_nodes, samples[i].num_edges
        if n > node_cap or e > edge_cap:
            raise ValueError(
                f"graph ({n} nodes, {e} edges) exceeds pack caps "
                f"({node_cap}, {edge_cap})"
            )
        if cn + n > node_cap or ce + e > edge_cap:
            bins.append(cur)
            cur, cn, ce = [], 0, 0
        cur.append(i)
        cn += n
        ce += e
    if cur:
        bins.append(cur)
    return bins


def collate_dense_packed(
    samples: list[GraphSample],
    *,
    node_cap: int = 128,
    edge_cap: int = 128,
    multiple: int = 8,
    y_per_edge: bool = False,
    bins: list[list[int]] | None = None,
    num_blocks: int | None = None,
    level_caps: list[tuple[int, int]] | None = None,
) -> DenseBatch:
    """Pack several graphs per dense block (block-diagonal operators).

    Level-0 blocks are capped at (node_cap, edge_cap) — 128 is the MXU tile
    quantum and measurably optimal; coarser levels reuse the same graph→bin
    assignment with caps derived from the largest bin.  Per-graph readout
    uses the ``n_gid``/``s_gid`` segment ids (ops/dispatch.py).

    For static shapes across batches (the jit contract), pass ``num_blocks``
    (extra blocks are all-padding) and ``level_caps`` = [(nodes, edges)] per
    level ≥ 1 (level 0 always uses node_cap/edge_cap).
    """
    if bins is None:
        bins = pack_graphs(samples, node_cap, edge_cap)
    nb = len(bins)
    if num_blocks is not None:
        if nb > num_blocks:
            raise ValueError(f"packing needs {nb} blocks > cap {num_blocks}")
        nb = num_blocks
    ng = len(samples)
    depth = len(samples[0].levels)
    rnd = lambda x: max(-(-x // multiple) * multiple, multiple)  # noqa: E731

    # per-level caps + per-graph (bin, node_off, edge_off) placements
    caps: list[DensePad] = []
    offs: list[dict[int, tuple[int, int, int]]] = []
    for lv in range(depth):
        placement: dict[int, tuple[int, int, int]] = {}
        max_n = max_e = 0
        for b, members in enumerate(bins):
            no = eo = 0
            for i in members:
                st = samples[i].levels[lv]
                placement[i] = (b, no, eo)
                no += st.num_nodes
                eo += st.num_edges
            max_n = max(max_n, no)
            max_e = max(max_e, eo)
        if lv == 0:
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
        offs.append(placement)

    levels: list[DenseLevel] = []
    for lv in range(depth):
        s_pad, e_pad = caps[lv].nodes, caps[lv].edges
        l0 = np.zeros((nb, s_pad, s_pad), np.float32)
        l1 = np.zeros((nb, e_pad, e_pad), np.float32)
        b1 = np.zeros((nb, s_pad, e_pad), np.float32)
        nm = np.zeros((nb, s_pad), np.float32)
        em = np.zeros((nb, e_pad), np.float32)
        deg = np.zeros((nb, s_pad), np.float32)
        n_gid = np.full((nb, s_pad), ng, np.int32)
        s_gid = np.full((nb, e_pad), ng, np.int32)
        for i, s in enumerate(samples):
            st = s.levels[lv]
            b, no, eo = offs[lv][i]
            n, e = st.num_nodes, st.num_edges
            l0[b, no + st.l0_rows, no + st.l0_cols] = st.l0_vals
            l1[b, eo + st.l1_rows, eo + st.l1_cols] = st.l1_vals
            b1[b, no : no + n, eo : eo + e] = boundary_dense(st.src, st.dst, n)
            nm[b, no : no + n] = 1.0
            em[b, eo : eo + e] = 1.0
            np.add.at(deg[b], no + st.src, 1.0)
            np.add.at(deg[b], no + st.dst, 1.0)
            n_gid[b, no : no + n] = i
            s_gid[b, eo : eo + e] = i
        levels.append(
            DenseLevel(
                l0=l0, l1=l1, b1=b1, node_mask=nm, edge_mask=em, deg=deg,
                num_graphs=ng, n_gid=n_gid, s_gid=s_gid,
            )
        )

    pools: list[DensePool] = []
    for lv in range(depth - 1):
        sc, ec = caps[lv + 1].nodes, caps[lv + 1].edges
        sf, ef = caps[lv].nodes, caps[lv].edges
        p_t = np.zeros((nb, sc, sf), np.float32)
        p_s = np.zeros((nb, ec, ef), np.float32)
        for i, s in enumerate(samples):
            b, fn, fe = offs[lv][i]
            _, cn_off, ce_off = offs[lv + 1][i]
            c_node, c_edge = s.pools[lv]
            cn = c_node.reshape(-1)
            idx = np.nonzero(cn >= 0)[0]
            p_t[b, cn_off + cn[idx], fn + idx] = 1.0
            ce = c_edge.reshape(-1)
            idx = np.nonzero(ce >= 0)[0]
            p_s[b, ce_off + ce[idx], fe + idx] = 1.0
        for b in range(nb):
            for p in (p_t, p_s):
                rs = p[b].sum(axis=1, keepdims=True)
                p[b] = p[b] / np.maximum(rs, 1.0)
        pools.append(DensePool(p_t=p_t, p_s=p_s))

    ft = samples[0].x_t.shape[1]
    fs = samples[0].x_s.shape[1]
    x_t = np.zeros((nb, caps[0].nodes, ft), np.float32)
    x_s = np.zeros((nb, caps[0].edges, fs), np.float32)
    for i, s in enumerate(samples):
        b, no, eo = offs[0][i]
        x_t[b, no : no + s.num_nodes] = s.x_t
        x_s[b, eo : eo + s.num_edges] = s.x_s

    if y_per_edge:
        y = np.zeros((nb, caps[0].edges) + samples[0].y.shape[1:], np.float32)
        for i, s in enumerate(samples):
            b, _, eo = offs[0][i]
            y[b, eo : eo + s.num_edges] = s.y
    else:
        y = np.stack([np.asarray(s.y, np.float32).reshape(-1) for s in samples])

    return DenseBatch(
        x_t=x_t, x_s=x_s, y=y, levels=tuple(levels), pools=tuple(pools),
        num_graphs=ng,
    )
