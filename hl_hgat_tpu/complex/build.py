"""Host-side (NumPy) construction of simplicial complexes.

Everything the reference does per sample inside PyG ``Dataset.process()`` /
``get()`` — undirected canonicalization, boundary operator, Hodge Laplacians,
eigen positional encodings (reference lib/Hodge_Dataset.py:442-477) — runs
here as a one-time NumPy pipeline producing `GraphSample`s, which `collate`
packs into padded, masked `ComplexBatch` pytrees.

The reference recomputes B1 on device every forward block (reference
lib/Hodge_ST_Model.py:623) and even runs a dense ``eigh`` per sample per epoch
for CIFAR10-SP (reference lib/Hodge_Dataset.py:769-804); the TPU build does
all of it exactly once per sample.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hl_hgat_tpu.complex.batch import ComplexBatch, ComplexLevel, CooMatrix, PoolMap


@dataclasses.dataclass
class GraphStructure:
    """One resolution level of a single (unbatched) complex, NumPy arrays."""

    src: np.ndarray  # [e] int32, canonical src < dst
    dst: np.ndarray  # [e] int32
    l0_rows: np.ndarray
    l0_cols: np.ndarray
    l0_vals: np.ndarray
    l1_rows: np.ndarray
    l1_cols: np.ndarray
    l1_vals: np.ndarray
    num_nodes: int
    num_edges: int
    max_eig: float


@dataclasses.dataclass
class GraphSample:
    """A single preprocessed simplex graph plus its coarsening pyramid.

    ``pools[k] = (c_node, c_edge)``: fine→coarse assignments between
    ``levels[k]`` and ``levels[k+1]``; ``c_edge`` uses −1 for intra-cluster
    edges deleted at pooling (the reference marks them ``inf``, reference
    lib/Hodge_Dataset.py:262-274).
    """

    x_t: np.ndarray  # [n, Ft]
    x_s: np.ndarray  # [e, Fs]
    y: np.ndarray
    levels: list[GraphStructure]
    pools: list[tuple[np.ndarray, np.ndarray]]
    extra: dict | None = None  # task-specific extras (e.g. link-pred pairs)

    @property
    def num_nodes(self) -> int:
        return self.levels[0].num_nodes

    @property
    def num_edges(self) -> int:
        return self.levels[0].num_edges


# ---------------------------------------------------------------------------
# per-graph construction
# ---------------------------------------------------------------------------


def canonical_undirected(
    edge_index: np.ndarray,
    edge_attr: np.ndarray | None = None,
    *,
    reduce: str = "min",
) -> tuple[np.ndarray, np.ndarray | None]:
    """Dedup a directed edge list into canonical undirected (src < dst) form.

    Mirrors ``to_undirected(..., reduce='min')`` followed by the
    ``edge_index[0] < edge_index[1]`` filter the reference applies in every
    ``process()`` (reference lib/Hodge_Dataset.py:447-450).  Self-loops are
    dropped (they have no 1-simplex).
    """
    src, dst = edge_index[0], edge_index[1]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    attr = edge_attr[keep] if edge_attr is not None else None
    lo = np.minimum(src, dst).astype(np.int64)
    hi = np.maximum(src, dst).astype(np.int64)
    key = lo * (hi.max() + 1 if hi.size else 1) + hi
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    uniq_mask = np.ones(key_sorted.shape, dtype=bool)
    uniq_mask[1:] = key_sorted[1:] != key_sorted[:-1]
    first_idx = order[uniq_mask]
    out_ei = np.stack([lo[first_idx], hi[first_idx]]).astype(np.int32)
    if attr is None:
        return out_ei, None
    if reduce == "min":
        # reduce attributes over duplicate (lo, hi) groups with a minimum
        grp = np.cumsum(uniq_mask) - 1
        attr_sorted = attr[order]
        out_attr = np.full(
            (first_idx.size,) + attr.shape[1:], np.inf, dtype=np.float64
        )
        np.minimum.at(out_attr, grp, attr_sorted)
        out_attr = out_attr.astype(attr.dtype)
    elif reduce == "mean":
        grp = np.cumsum(uniq_mask) - 1
        attr_sorted = attr[order].astype(np.float64)
        out_attr = np.zeros((first_idx.size,) + attr.shape[1:], dtype=np.float64)
        np.add.at(out_attr, grp, attr_sorted)
        counts = np.bincount(grp, minlength=first_idx.size).astype(np.float64)
        out_attr = (out_attr / counts.reshape((-1,) + (1,) * (attr.ndim - 1))).astype(
            attr.dtype if np.issubdtype(attr.dtype, np.floating) else np.float64
        )
    else:
        raise ValueError(f"unknown reduce {reduce!r}")
    return out_ei, out_attr


def par2adj(par1: np.ndarray) -> np.ndarray:
    """Recover the canonical edge list from a dense boundary operator.

    Inverse of ``boundary_dense`` (reference ``par2adj``,
    lib/Hodge_Dataset.py:194-209): each column has −1 at src and +1 at dst.
    """
    srcs, dsts = [], []
    for e in range(par1.shape[1]):
        nz = np.nonzero(par1[:, e])[0]
        lo = nz[par1[nz, e] < 0]
        hi = nz[par1[nz, e] > 0]
        srcs.append(int(lo[0]))
        dsts.append(int(hi[0]))
    return np.stack([np.asarray(srcs, np.int32), np.asarray(dsts, np.int32)])


def post2poss(
    pos_t: np.ndarray, edge_index: np.ndarray, edge_index1: np.ndarray
) -> np.ndarray:
    """Edge cluster assignment from node clusters.

    Semantics of the reference's O(E·E′) helper (lib/Hodge_Dataset.py:212-238,
    superseded by the MLGC-internal dedup): intra-cluster edges map to −1
    (the reference's ``inf``), others to the index of the coarse edge
    (min, max) in ``edge_index1``."""
    coarse = {
        (int(a), int(b)): i
        for i, (a, b) in enumerate(zip(edge_index1[0], edge_index1[1]))
    }
    pos_t = np.asarray(pos_t).reshape(-1)
    out = np.empty(edge_index.shape[1], np.int64)
    for i in range(edge_index.shape[1]):
        a, b = pos_t[edge_index[0, i]], pos_t[edge_index[1, i]]
        if a == b:
            out[i] = -1
        else:
            out[i] = coarse[(int(min(a, b)), int(max(a, b)))]
    return out


def unbatch_edge_attr(
    edge_attr: np.ndarray, s_id: np.ndarray, edge_mask: np.ndarray,
    num_graphs: int,
) -> list[np.ndarray]:
    """Split batched per-edge tensors back per graph (reference
    ``unbatch_edge_attr``, lib/Hodge_Cheb_Conv.py:244-251)."""
    s_id = np.asarray(s_id)
    valid = np.asarray(edge_mask) > 0
    return [
        np.asarray(edge_attr)[(s_id == g) & valid] for g in range(num_graphs)
    ]


def boundary_dense(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Dense B1: [num_nodes, num_edges] with −1 at src, +1 at dst per column.

    Semantics of ``adj2par1`` (reference lib/Hodge_Dataset.py:169-191).
    """
    e = src.shape[0]
    b1 = np.zeros((num_nodes, e), dtype=np.float64)
    b1[src, np.arange(e)] = -1.0
    b1[dst, np.arange(e)] = 1.0
    return b1


def hodge_laplacians(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, *, with_l1: bool = True
) -> tuple[np.ndarray, np.ndarray, float]:
    """L0 = 2 B1 B1ᵀ / λmax, L1 = 2 B1ᵀ B1 / λmax (dense, float64).

    λmax is the largest eigenvalue of the *unscaled* L0, so both rescaled
    spectra live in [0, 2] (reference lib/Hodge_Dataset.py:451-456; L0 and L1
    share nonzero spectra).  ``with_l1=False`` skips the [E, E] product
    (the dominant cost on edge-dense graphs) when only L0 is consumed.
    """
    b1 = boundary_dense(src, dst, num_nodes)
    l0 = b1 @ b1.T
    if num_nodes > 0:
        max_eig = float(np.linalg.eigvalsh(l0).max())
    else:
        max_eig = 1.0
    if max_eig <= 0:
        max_eig = 1.0
    l0 = 2.0 * l0 / max_eig
    l1 = 2.0 * (b1.T @ b1) / max_eig if with_l1 else None
    return l0, l1, max_eig


def dense_to_coo(m: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact-nonzero COO extraction (PyG ``dense_to_sparse`` semantics)."""
    rows, cols = np.nonzero(m)
    return rows.astype(np.int32), cols.astype(np.int32), m[rows, cols].astype(
        np.float32
    )


def eig_pe(lap: np.ndarray, k: int = 9) -> np.ndarray:
    """Laplacian eigenvector positional encoding.

    Eigenvectors sorted by eigenvalue, dropping the first (constant) mode and
    keeping columns 1..k−1 (reference lib/Hodge_Dataset.py:97-112).  Output is
    zero-padded when the complex has fewer than k−1 usable modes, matching the
    feature-dim padding the reference applies at load time (reference
    lib/Hodge_Dataset.py:430-437).
    """
    if lap.shape[0] == 0:
        return np.zeros((0, max(k - 1, 0)), dtype=np.float32)
    eig_vals, eig_vecs = np.linalg.eigh(lap)
    eig_vecs = np.real(eig_vecs[:, np.argsort(eig_vals, kind="stable")])
    pe = eig_vecs[:, 1:k]
    if pe.shape[1] < k - 1:
        pe = np.concatenate(
            [pe, np.zeros((pe.shape[0], k - 1 - pe.shape[1]))], axis=1
        )
    return pe.astype(np.float32)


def hodge_laplacians_coo(
    src: np.ndarray, dst: np.ndarray, num_nodes: int
) -> tuple[tuple, tuple, float]:
    """Sparse-direct L0/L1 construction — never densifies.

    nnz(L1) ≈ Σ deg² (edge pairs sharing a vertex) instead of E² for the
    dense path; λmax comes from sparse Lanczos.  Same math as
    `hodge_laplacians` (reference lib/Hodge_Dataset.py:451-456):

      L0[i, i] = deg(i);  L0[i, j] = −1 per edge {i, j}
      L1[e, e] = 2;       L1[e, f] = B1[v, e]·B1[v, f] for the shared v,
                          with B1[v, e] = −1 if v == src(e) else +1.
    """
    e = src.shape[0]
    deg = np.bincount(src, minlength=num_nodes) + np.bincount(
        dst, minlength=num_nodes
    )
    # --- L0 ---
    l0_rows = np.concatenate([np.arange(num_nodes), src, dst])
    l0_cols = np.concatenate([np.arange(num_nodes), dst, src])
    l0_vals = np.concatenate(
        [deg.astype(np.float64), -np.ones(2 * e), ]
    )
    # --- λmax via sparse Lanczos on L0 ---
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    l0_mat = sp.coo_matrix(
        (l0_vals, (l0_rows, l0_cols)), shape=(num_nodes, num_nodes)
    ).tocsr()
    if num_nodes <= 2:
        max_eig = float(np.linalg.eigvalsh(l0_mat.toarray()).max())
    else:
        max_eig = float(
            spla.eigsh(l0_mat, k=1, which="LA", return_eigenvectors=False,
                       tol=1e-9)[0]
        )
    if max_eig <= 0:
        max_eig = 1.0
    scale = 2.0 / max_eig
    # --- L1: prefer the C++ single-pass construction when built ---
    from hl_hgat_tpu import native

    l1_native = native.hodge_l1(src, dst, num_nodes, scale)
    if l1_native is not None:
        l0_mat.eliminate_zeros()
        l0_coo = l0_mat.tocoo()
        return (
            (
                l0_coo.row.astype(np.int32),
                l0_coo.col.astype(np.int32),
                (l0_coo.data * scale).astype(np.float32),
            ),
            l1_native,
            max_eig,
        )
    # --- L1 (NumPy fallback): group incident edges per node ---
    inc_node = np.concatenate([src, dst])
    inc_edge = np.concatenate([np.arange(e), np.arange(e)])
    inc_sign = np.concatenate([-np.ones(e), np.ones(e)])
    order = np.argsort(inc_node, kind="stable")
    inc_node, inc_edge, inc_sign = (
        inc_node[order], inc_edge[order], inc_sign[order],
    )
    starts = np.searchsorted(inc_node, np.arange(num_nodes + 1))
    counts = (starts[1:] - starts[:-1]).astype(np.int64)
    # vectorized all-ordered-pairs within each node's incidence group
    sq = counts * counts
    total = int(sq.sum())
    grp = np.repeat(np.arange(num_nodes), sq)
    pair_start = np.concatenate([[0], np.cumsum(sq)])[:-1]
    pos = np.arange(total) - pair_start[grp]
    c_g = counts[grp]
    g_start = starts[:-1][grp]
    idx_row = g_start + pos // np.maximum(c_g, 1)
    idx_col = g_start + pos % np.maximum(c_g, 1)
    l1_rows = inc_edge[idx_row]
    l1_cols = inc_edge[idx_col]
    l1_vals = inc_sign[idx_row] * inc_sign[idx_col]
    # coalesce duplicates (each edge's diagonal appears once per endpoint);
    # manual key-sort — scipy's sum_duplicates is much slower at this size
    key = l1_rows.astype(np.int64) * e + l1_cols
    uniq, inv = np.unique(key, return_inverse=True)
    summed = np.bincount(inv, weights=l1_vals, minlength=uniq.size)
    keep = summed != 0
    uniq, summed = uniq[keep], summed[keep]
    l0_mat.eliminate_zeros()
    l0_coo = l0_mat.tocoo()
    return (
        (
            l0_coo.row.astype(np.int32),
            l0_coo.col.astype(np.int32),
            (l0_coo.data * scale).astype(np.float32),
        ),
        (
            (uniq // e).astype(np.int32),
            (uniq % e).astype(np.int32),
            (summed * scale).astype(np.float32),
        ),
        max_eig,
    )


# Above this edge count the O(E²) dense L1 is replaced by the sparse-direct
# construction (identical values up to float tolerance and COO ordering).
SPARSE_BUILD_THRESHOLD = 1024


def build_structure(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    sparse_threshold: int = SPARSE_BUILD_THRESHOLD,
) -> GraphStructure:
    """Boundary + Laplacians for one complex level (dense for small graphs,
    sparse-direct beyond ``sparse_threshold`` edges)."""
    if src.shape[0] > sparse_threshold:
        (l0r, l0c, l0v), (l1r, l1c, l1v), max_eig = hodge_laplacians_coo(
            src, dst, num_nodes
        )
    else:
        l0, l1, max_eig = hodge_laplacians(src, dst, num_nodes)
        l0r, l0c, l0v = dense_to_coo(l0)
        l1r, l1c, l1v = dense_to_coo(l1)
    return GraphStructure(
        src=src.astype(np.int32),
        dst=dst.astype(np.int32),
        l0_rows=l0r,
        l0_cols=l0c,
        l0_vals=l0v,
        l1_rows=l1r,
        l1_cols=l1c,
        l1_vals=l1v,
        num_nodes=int(num_nodes),
        num_edges=int(src.shape[0]),
        max_eig=max_eig,
    )


def build_complex(
    edge_index: np.ndarray,
    num_nodes: int,
    *,
    x_t: np.ndarray | None = None,
    x_s: np.ndarray | None = None,
    edge_attr: np.ndarray | None = None,
    y: np.ndarray | None = None,
    keig: int = 0,
    reduce: str = "min",
) -> GraphSample:
    """Lift a plain graph to a 1-level simplex sample.

    With ``keig > 0``, appends the L0 eigen-PE to node features and the L1
    eigen-PE to edge features (the layout every reference ``process()`` uses,
    e.g. reference lib/Hodge_Dataset.py:457-462).
    """
    ei, ea = canonical_undirected(edge_index, edge_attr, reduce=reduce)
    src, dst = ei[0], ei[1]
    structure = build_structure(src, dst, num_nodes)
    l0, l1, _ = hodge_laplacians(src, dst, num_nodes)
    xt = (
        x_t.astype(np.float32)
        if x_t is not None
        else np.zeros((num_nodes, 0), dtype=np.float32)
    )
    if x_s is not None:
        xs = x_s.astype(np.float32)
    elif ea is not None:
        xs = np.asarray(ea, dtype=np.float32).reshape(src.shape[0], -1)
    else:
        xs = np.zeros((src.shape[0], 0), dtype=np.float32)
    if keig > 0:
        xt = np.concatenate([xt, eig_pe(l0, k=keig)], axis=1)
        xs = np.concatenate([xs, eig_pe(l1, k=keig)], axis=1)
    yy = np.zeros((1,), dtype=np.float32) if y is None else np.asarray(y)
    return GraphSample(x_t=xt, x_s=xs, y=yy, levels=[structure], pools=[])


# ---------------------------------------------------------------------------
# batching / collation
# ---------------------------------------------------------------------------


def _pad_to(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, constant_values=fill)


@dataclasses.dataclass(frozen=True)
class LevelPad:
    nodes: int
    edges: int
    nnz0: int
    nnz1: int


def pad_spec(
    samples: list[GraphSample], *, multiple: int = 8, slack: float = 1.0
) -> list[LevelPad]:
    """Compute padded sizes per level for a batch (round up to ``multiple``)."""

    def rnd(x: int) -> int:
        x = int(np.ceil(x * slack))
        return max(((x + multiple - 1) // multiple) * multiple, multiple)

    depth = len(samples[0].levels)
    out = []
    for lv in range(depth):
        out.append(
            LevelPad(
                nodes=rnd(sum(s.levels[lv].num_nodes for s in samples)),
                edges=rnd(sum(s.levels[lv].num_edges for s in samples)),
                nnz0=rnd(sum(s.levels[lv].l0_rows.size for s in samples)),
                nnz1=rnd(sum(s.levels[lv].l1_rows.size for s in samples)),
            )
        )
    return out


def _build_ell(rows, cols, vals, num_rows):
    from hl_hgat_tpu import native

    out = native.coo_to_ell(rows, cols, vals, num_rows)
    if out is None:
        out = coo_to_ell(rows, cols, vals, num_rows)
    return out


def _collate_level(
    structs: list[GraphStructure], pad: LevelPad, num_graphs: int,
    with_ell: bool = False,
) -> tuple[ComplexLevel, np.ndarray, np.ndarray]:
    """Block-diagonal concatenation of one level across the batch.

    Returns the level plus the per-graph node/edge offsets (needed to
    globalize pooling assignments).
    """
    n_off = np.cumsum([0] + [s.num_nodes for s in structs])
    e_off = np.cumsum([0] + [s.num_edges for s in structs])
    n_tot, e_tot = int(n_off[-1]), int(e_off[-1])
    if n_tot > pad.nodes or e_tot > pad.edges:
        raise ValueError(
            f"batch exceeds pad spec: nodes {n_tot}>{pad.nodes} or edges "
            f"{e_tot}>{pad.edges}"
        )

    src = np.concatenate(
        [s.src + o for s, o in zip(structs, n_off)] or [np.zeros(0, np.int32)]
    )
    dst = np.concatenate(
        [s.dst + o for s, o in zip(structs, n_off)] or [np.zeros(0, np.int32)]
    )
    # Padded edges point at the last padded node slot: harmless under masks.
    pad_node_ptr = pad.nodes - 1
    src = _pad_to(src.astype(np.int32), pad.edges, fill=pad_node_ptr)
    dst = _pad_to(dst.astype(np.int32), pad.edges, fill=pad_node_ptr)

    def cat_coo(rows_l, cols_l, vals_l, offs, nnz_pad):
        rows = np.concatenate(
            [r + o for r, o in zip(rows_l, offs)] or [np.zeros(0, np.int32)]
        )
        cols = np.concatenate(
            [c + o for c, o in zip(cols_l, offs)] or [np.zeros(0, np.int32)]
        )
        vals = np.concatenate(vals_l or [np.zeros(0, np.float32)])
        if rows.size > nnz_pad:
            raise ValueError(f"nnz {rows.size} exceeds pad {nnz_pad}")
        return (
            _pad_to(rows.astype(np.int32), nnz_pad),
            _pad_to(cols.astype(np.int32), nnz_pad),
            _pad_to(vals.astype(np.float32), nnz_pad),
        )

    l0r, l0c, l0v = cat_coo(
        [s.l0_rows for s in structs],
        [s.l0_cols for s in structs],
        [s.l0_vals for s in structs],
        n_off,
        pad.nnz0,
    )
    l1r, l1c, l1v = cat_coo(
        [s.l1_rows for s in structs],
        [s.l1_cols for s in structs],
        [s.l1_vals for s in structs],
        e_off,
        pad.nnz1,
    )

    node_mask = np.zeros(pad.nodes, np.float32)
    node_mask[:n_tot] = 1.0
    edge_mask = np.zeros(pad.edges, np.float32)
    edge_mask[:e_tot] = 1.0
    n_id = np.full(pad.nodes, num_graphs, np.int32)
    s_id = np.full(pad.edges, num_graphs, np.int32)
    for g, s in enumerate(structs):
        n_id[n_off[g] : n_off[g + 1]] = g
        s_id[e_off[g] : e_off[g + 1]] = g

    deg = np.zeros(pad.nodes, np.float32)
    np.add.at(deg, src[:e_tot], 1.0)
    np.add.at(deg, dst[:e_tot], 1.0)

    ell0 = _build_ell(l0r, l0c, l0v, pad.nodes) if with_ell else (None, None)
    ell1 = _build_ell(l1r, l1c, l1v, pad.edges) if with_ell else (None, None)
    level = ComplexLevel(
        src=src,
        dst=dst,
        node_mask=node_mask,
        edge_mask=edge_mask,
        n_id=n_id,
        s_id=s_id,
        l0=CooMatrix(
            rows=l0r, cols=l0c, vals=l0v, shape=(pad.nodes, pad.nodes),
            ell_cols=ell0[0], ell_vals=ell0[1], symmetric=True,
        ),
        l1=CooMatrix(
            rows=l1r, cols=l1c, vals=l1v, shape=(pad.edges, pad.edges),
            ell_cols=ell1[0], ell_vals=ell1[1], symmetric=True,
        ),
        deg=deg,
        num_graphs=num_graphs,
    )
    return level, n_off, e_off


def collate(
    samples: list[GraphSample],
    pads: list[LevelPad] | None = None,
    *,
    multiple: int = 8,
    y_per_edge: bool = False,
    y_per_node: bool = False,
    with_ell: bool = False,
) -> ComplexBatch:
    """Pack samples into one padded `ComplexBatch`.

    Replaces PyG collation via ``PairData.__inc__`` (reference
    lib/Hodge_Dataset.py:40-48): edge endpoints offset by node counts, L1
    indices by edge counts, pooling assignments globalized by coarse counts
    (the offsets the reference rebuilds per forward at
    lib/Hodge_ST_Model.py:1035-1038).
    """
    if pads is None:
        pads = pad_spec(samples, multiple=multiple)
    num_graphs = len(samples)
    depth = len(samples[0].levels)

    levels: list[ComplexLevel] = []
    offs: list[tuple[np.ndarray, np.ndarray]] = []
    for lv in range(depth):
        level, n_off, e_off = _collate_level(
            [s.levels[lv] for s in samples], pads[lv], num_graphs,
            with_ell=with_ell,
        )
        levels.append(level)
        offs.append((n_off, e_off))

    pools: list[PoolMap] = []
    for lv in range(depth - 1):
        fine_pad, coarse_pad = pads[lv], pads[lv + 1]
        cn_off, ce_off = offs[lv + 1]
        pos_t = np.full(fine_pad.nodes, coarse_pad.nodes, np.int32)
        pos_s = np.full(fine_pad.edges, coarse_pad.edges, np.int32)
        fn_off, fe_off = offs[lv]
        for g, s in enumerate(samples):
            c_node, c_edge = s.pools[lv]
            cn = c_node.reshape(-1).astype(np.int64).copy()
            dropped_n = cn < 0  # isolated nodes pruned by the brain MLGC
            cn = cn + cn_off[g]
            cn[dropped_n] = coarse_pad.nodes  # dump slot
            pos_t[fn_off[g] : fn_off[g + 1]] = cn
            ce = c_edge.reshape(-1).astype(np.int64).copy()
            deleted = ce < 0
            ce = ce + ce_off[g]
            ce[deleted] = coarse_pad.edges  # dump slot
            pos_s[fe_off[g] : fe_off[g + 1]] = ce
        pools.append(PoolMap(pos_t=pos_t, pos_s=pos_s))

    ft = samples[0].x_t.shape[1]
    fs = samples[0].x_s.shape[1]
    x_t = np.zeros((pads[0].nodes, ft), np.float32)
    x_s = np.zeros((pads[0].edges, fs), np.float32)
    fn_off, fe_off = offs[0]
    for g, s in enumerate(samples):
        x_t[fn_off[g] : fn_off[g + 1]] = s.x_t
        x_s[fe_off[g] : fe_off[g + 1]] = s.x_s

    if y_per_edge:
        y = np.zeros((pads[0].edges,) + samples[0].y.shape[1:], np.float32)
        for g, s in enumerate(samples):
            y[fe_off[g] : fe_off[g + 1]] = s.y
    elif y_per_node:
        y = np.zeros((pads[0].nodes,) + samples[0].y.shape[1:], np.float32)
        for g, s in enumerate(samples):
            y[fn_off[g] : fn_off[g + 1]] = s.y
    else:
        y = np.stack([np.asarray(s.y, np.float32).reshape(-1) for s in samples])

    return ComplexBatch(
        x_t=x_t,
        x_s=x_s,
        y=y,
        levels=tuple(levels),
        pools=tuple(pools),
        num_graphs=num_graphs,
    )


def attach_link_pairs(
    batch: ComplexBatch,
    samples: list[GraphSample],
    rng: np.random.Generator,
    *,
    n_queries: int = 4,
    n_neg: int = 8,
) -> ComplexBatch:
    """Attach PCQM-Contact-style link-prediction queries to a flat batch.

    The reference dataset carries per-graph ``edge_label_index`` /
    ``edge_label`` (reference lib/LRGBDataset.py:81-95) but ships no model
    or loop; this is the batch-level encoding our ``HLHGCNNLinkPred``
    consumes: per graph, ``n_queries`` positive pairs (existing edges,
    sampled with replacement) each followed by ``n_neg`` non-adjacent
    negatives — contiguous groups of (1+n_neg) rows, positive FIRST, so
    MRR is a [Q, 1+n_neg] reshape.  Static shape: P = G·n_queries·(1+n_neg)
    rows for every batch of G graphs.  ``batch.y`` is REPLACED by the [P]
    pair labels; ``pair_mask`` kills nothing here (padded graphs are the
    loader's filler duplicates, the usual final-partial-batch bias).

    ``samples`` must be the graphs behind ``batch`` in order (flat COO
    collate: node rows are contiguous per graph, build.py:566)."""
    offs = np.cumsum([0] + [s.num_nodes for s in samples])[:-1]
    pairs, labels = [], []
    for off, s in zip(offs, samples):
        st = s.levels[0]
        es = set(zip(st.src.tolist(), st.dst.tolist()))
        extra = getattr(s, "extra", None) or {}
        if "edge_label_index" in extra:
            # real PCQM-Contact raw fields: query the dataset's POSITIVE
            # contact pairs (edge_label == 1), negatives re-sampled per
            # positive so MRR groups stay uniform
            eli = np.asarray(extra["edge_label_index"])
            el = np.asarray(extra["edge_label"]).reshape(-1)
            pos_pool = eli[:, el > 0] if (el > 0).any() else eli
            sel = rng.choice(pos_pool.shape[1], n_queries, replace=True)
            pos_pairs = [(int(pos_pool[0, i]), int(pos_pool[1, i]))
                         for i in sel]
        else:
            pos_idx = rng.choice(st.num_edges, n_queries, replace=True)
            pos_pairs = [(int(st.src[pi]), int(st.dst[pi]))
                         for pi in pos_idx]
        for pa, pb in pos_pairs:
            pairs.append((off + pa, off + pb))
            labels.append(1.0)
            negs = 0
            while negs < n_neg:
                a, b = rng.integers(0, st.num_nodes, 2)
                lo, hi = int(min(a, b)), int(max(a, b))
                if lo == hi or (lo, hi) in es:
                    continue
                pairs.append((off + lo, off + hi))
                labels.append(0.0)
                negs += 1
    return batch.replace(
        pairs=np.asarray(pairs, np.int32),
        y=np.asarray(labels, np.float32),
        pair_mask=np.ones(len(labels), np.float32),
    )


# ---------------------------------------------------------------------------
# ELL packing for the Pallas SpMM kernel
# ---------------------------------------------------------------------------


def coo_to_ell(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    num_rows: int,
    *,
    width: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Pack COO into ELL [num_rows, width] (cols, vals), zero-padded rows.

    Host-side companion of ``hl_hgat_tpu.ops.pallas_spmm.spmm_ell_pallas``.
    """
    counts = np.bincount(rows[vals != 0], minlength=num_rows)
    w = int(counts.max()) if width is None else width
    w = max(w, 1)
    ell_cols = np.zeros((num_rows, w), np.int32)
    ell_vals = np.zeros((num_rows, w), np.float32)
    cursor = np.zeros(num_rows, np.int64)
    for r, c, v in zip(rows, cols, vals):
        if v == 0:
            continue
        k = cursor[r]
        if k >= w:
            raise ValueError(f"row {r} exceeds ELL width {w}")
        ell_cols[r, k] = c
        ell_vals[r, k] = v
        cursor[r] = k + 1
    return ell_cols, ell_vals
