"""Multi-level graph coarsening (MLGC) — graclus matching + coarse complex.

The reference delegates node matching to torch-cluster's native
``graclus_cluster`` (reference lib/Hodge_Dataset.py:252,311) and builds the
coarse edge set with a Python dict-dedup loop (reference
lib/Hodge_Dataset.py:260-274).  Coarsening is dataset preprocessing — never
on the training hot path — so the TPU build keeps it host-side in NumPy with
identical matching *semantics* (greedy heavy-edge matching).  graclus is
greedy and order-dependent, so cluster assignments are reproducible given the
same visit order but not bit-identical to the CUDA kernel's; downstream
training parity is statistical (documented in SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hl_hgat_tpu.complex.build import GraphStructure, build_structure


@dataclasses.dataclass
class MLGCLevel:
    """Result of one coarsening step."""

    structure: GraphStructure  # the coarse complex
    c_node: np.ndarray  # [n_fine] int32 coarse node id per fine node
    c_edge: np.ndarray  # [e_fine] int32 coarse edge id; −1 = deleted
    x_s_pool: np.ndarray | None = None  # pooled edge features (brain variant)


def graclus_cluster(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None,
    num_nodes: int,
    *,
    rng: np.random.Generator | None = None,
    visit: np.ndarray | None = None,
    directed: bool = False,
    impl: str = "auto",
) -> np.ndarray:
    """Greedy heavy-edge matching; returns a cluster id per node.

    Semantics of torch-cluster ``graclus_cluster``: visit nodes (in index
    order, or shuffled when ``rng`` is given), match each unmatched node with
    its heaviest-edged unmatched neighbour, leave isolated/odd nodes as
    singletons.  Ids are representative node indices, remapped to dense
    0..C−1 by the caller exactly as the reference's ``torch.unique`` + dict
    pass does (reference lib/Hodge_Dataset.py:254-259).

    ``visit``/``directed`` reproduce torch-cluster's exact behaviour on a
    CANONICAL (src<dst) edge list: torch-cluster visits nodes in a
    ``torch.randperm`` order and does NOT symmetrize the input, so a node
    only sees neighbours it points TO.  ``visit=torch.randperm(n)`` under
    ``torch.manual_seed(10086)`` + ``directed=True`` reproduces the shipped
    brain checkpoint's training pyramid EXACTLY (268→139 nodes,
    8997→2676 edges, num_nodepedge 2815 = the checkpoint's flatten-head
    width; OHBM_DEMO.ipynb cell 46 sets that seed before MLGC_Weight).
    """
    if impl == "native_or_sym":
        # unweighted matching with ascending-by-index neighbour order: sort
        # the canonical list row-major (coarse levels come out of the
        # first-seen dedup UNSORTED), then the native symmetrizing matcher
        # visits each node's neighbours ascending by index (see mlgc);
        # falls back to the symmetrized Python walk
        from hl_hgat_tpu import native

        srt = np.lexsort((dst, src))
        src, dst = (
            np.ascontiguousarray(src[srt]), np.ascontiguousarray(dst[srt])
        )
        out = native.graclus_match(src, dst, None, num_nodes)
        if out is not None:
            return out
        ss = np.concatenate([src, dst])
        dd = np.concatenate([dst, src])
        order = np.lexsort((dd, ss))
        src, dst, directed = ss[order], dd[order], True
    elif rng is None and visit is None and not directed and impl != "python":
        from hl_hgat_tpu import native

        out = native.graclus_match(src, dst, weight, num_nodes)
        if out is not None:
            return out
    w = np.ones(src.shape[0], np.float64) if weight is None else np.asarray(
        weight, np.float64
    )
    # adjacency as arrays-of-neighbours sorted by descending weight
    order = np.argsort(-w, kind="stable")
    nbr: list[list[tuple[int, float]]] = [[] for _ in range(num_nodes)]
    for i in order:
        u, v = int(src[i]), int(dst[i])
        if u == v:
            continue
        nbr[u].append((v, w[i]))
        if not directed:
            nbr[v].append((u, w[i]))
    match = np.full(num_nodes, -1, np.int64)
    if visit is not None:
        visit = np.asarray(visit, np.int64)
    else:
        visit = np.arange(num_nodes)
        if rng is not None:
            rng.shuffle(visit)
    for u in visit:
        if match[u] >= 0:
            continue
        best = -1
        for v, _ in nbr[u]:
            if match[v] < 0 and v != u:
                best = v
                break  # neighbours pre-sorted by weight
        if best >= 0:
            rep = min(u, best)
            match[u] = rep
            match[best] = rep
        else:
            match[u] = u
    return match.astype(np.int64)


def coarse_edges(
    c_node: np.ndarray, src: np.ndarray, dst: np.ndarray, *, impl: str = "auto"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Coarse edge set with first-seen ordering + fine→coarse edge map.

    Mirrors the reference's dict-dedup over fine edges (reference
    lib/Hodge_Dataset.py:260-274): a fine edge whose endpoints collapse into
    the same cluster is deleted (map −1, the reference's ``inf``); otherwise
    the coarse edge (min, max) is created on first sight and reused after.
    """
    if impl != "python":
        from hl_hgat_tpu import native

        out = native.coarse_edges(c_node, src, dst)
        if out is not None:
            return out
    c_edge = np.zeros(src.shape[0], np.int64)
    ei0: list[int] = []
    ei1: list[int] = []
    seen: dict[tuple[int, int], int] = {}
    for i in range(src.shape[0]):
        a, b = int(c_node[src[i]]), int(c_node[dst[i]])
        if a == b:
            c_edge[i] = -1
            continue
        key = (min(a, b), max(a, b))
        if key in seen:
            c_edge[i] = seen[key]
        else:
            seen[key] = len(ei0)
            c_edge[i] = len(ei0)
            ei0.append(key[0])
            ei1.append(key[1])
    return (
        np.asarray(ei0, np.int32),
        np.asarray(ei1, np.int32),
        c_edge,
    )


def mlgc(
    structure: GraphStructure,
    *,
    edge_weight: np.ndarray | None = None,
    x_s: np.ndarray | None = None,
    prune_single_fine_edges: bool = False,
    drop_isolated_nodes: bool = False,
    visit: np.ndarray | None = None,
    directed_match: bool = False,
) -> MLGCLevel:
    """One MLGC coarsening step.

    * default: unweighted graclus on the node graph — reference ``MLGC``
      (reference lib/Hodge_Dataset.py:241-295);
    * ``edge_weight`` given: weighted matching — reference ``MLGC_weighted``
      (lib/Hodge_Dataset.py:298-353) where the caller passes
      ``exp(−x_s[:,0]²)``, or the brain ``MLGC_Weight`` with FC weights;
    * ``prune_single_fine_edges`` / ``drop_isolated_nodes``: the brain-demo
      refinements (reference HL-HGAT-DEMO/lib/Hodge_Dataset.py:219-242) that
      delete coarse edges backed by exactly one fine edge and remove nodes
      left isolated, remapping assignments accordingly;
    * ``x_s`` given: also mean-pools the fine edge features onto the coarse
      complex (reference HL-HGAT-DEMO/lib/Hodge_Dataset.py:255-258).
    """
    src, dst = structure.src, structure.dst
    n = structure.num_nodes
    if edge_weight is None and visit is None and not directed_match:
        # Reference MLGC runs graclus on the L0 SPARSITY PATTERN
        # (``data.edge_index_t`` — symmetrized, row-major sorted, reference
        # lib/Hodge_Dataset.py:252), so each node's effective neighbour
        # order is ASCENDING BY INDEX.  Matching from the canonical
        # (src<dst) skeleton instead visits neighbours in edge order, which
        # agrees on many small graphs but diverges on deeper pyramid
        # levels (caught by the 2-pool ABCD fixture).
        #
        # Fast path (round-5 advisor fix): for a CANONICAL row-major
        # skeleton the native symmetrizing matcher already yields
        # ascending-by-index neighbour order — node u's <u neighbours are
        # appended from the (s, u) edges of the s<u blocks (s ascending)
        # BEFORE its >u neighbours from the contiguous (u, d) block
        # (d ascending) — so it equals matching on the symmetric row-major
        # list (pinned by tests/test_complex.py::test_mlgc_native_matches
        # _symmetrized_python on random graphs + deep pyramids, and by the
        # 2-pool ABCD executed-reference fixture).  The previous
        # directed=True detour forced the per-edge Python loop onto the
        # ~100x-throttled host for every unweighted pyramid build.
        rep = graclus_cluster(src, dst, None, n, impl="native_or_sym")
    else:
        # weighted matching orders neighbours by descending weight
        # (continuous weights — insertion order is not load-bearing), and
        # the brain path pins its exact torch-cluster semantics via
        # ``visit``/``directed_match``
        rep = graclus_cluster(
            src, dst, edge_weight, n, visit=visit, directed=directed_match)
    uniq = np.unique(rep)
    remap = {int(r): i for i, r in enumerate(uniq)}
    c_node = np.asarray([remap[int(r)] for r in rep], np.int64)
    n_coarse = uniq.size

    csrc, cdst, c_edge = coarse_edges(c_node, src, dst)

    if prune_single_fine_edges:
        backing = np.bincount(
            c_edge[c_edge >= 0].astype(np.int64), minlength=csrc.size
        )
        keep_edge = backing >= 2
        new_ids = np.cumsum(keep_edge) - 1
        csrc, cdst = csrc[keep_edge], cdst[keep_edge]
        remapped = np.full_like(c_edge, -1)
        valid = c_edge >= 0
        kept = valid.copy()
        kept[valid] = keep_edge[c_edge[valid]]
        remapped[kept] = new_ids[c_edge[kept]]
        c_edge = remapped

    if drop_isolated_nodes:
        used = np.zeros(n_coarse, bool)
        used[csrc] = True
        used[cdst] = True
        node_new = np.full(n_coarse, -1, np.int64)
        node_new[used] = np.arange(int(used.sum()))
        csrc = node_new[csrc].astype(np.int32)
        cdst = node_new[cdst].astype(np.int32)
        c_node = node_new[c_node]  # dropped fine nodes map to −1
        n_coarse = int(used.sum())

    coarse = build_structure(csrc.astype(np.int32), cdst.astype(np.int32), n_coarse)

    x_s_pool = None
    if x_s is not None:
        e_coarse = csrc.size
        x_s_pool = np.zeros((e_coarse,) + x_s.shape[1:], np.float64)
        cnt = np.zeros(e_coarse, np.float64)
        valid = c_edge >= 0
        np.add.at(x_s_pool, c_edge[valid], x_s[valid])
        np.add.at(cnt, c_edge[valid], 1.0)
        x_s_pool = (
            x_s_pool / np.maximum(cnt, 1.0).reshape((-1,) + (1,) * (x_s.ndim - 1))
        ).astype(np.float32)

    return MLGCLevel(
        structure=coarse,
        c_node=c_node.astype(np.int32),
        c_edge=c_edge.astype(np.int32),
        x_s_pool=x_s_pool,
    )


def build_pyramid(
    sample_levels: list[GraphStructure],
    num_pool: int,
    *,
    weighted_by: np.ndarray | None = None,
) -> tuple[list[GraphStructure], list[tuple[np.ndarray, np.ndarray]]]:
    """Repeatedly coarsen, returning the level list + pool assignments.

    Matches the dataset-build loop of the MLGC dataset classes (reference
    lib/Hodge_Dataset.py:523-527).
    """
    levels = list(sample_levels)
    pools: list[tuple[np.ndarray, np.ndarray]] = []
    weight = weighted_by
    for _ in range(num_pool):
        lvl = mlgc(levels[-1], edge_weight=weight)
        levels.append(lvl.structure)
        pools.append((lvl.c_node, lvl.c_edge))
        weight = None  # weights only apply to the first (feature-bearing) level
    return levels, pools
