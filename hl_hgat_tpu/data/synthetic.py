"""Synthetic simplex-graph generators shaped like the real benchmarks.

Used by the test suite and `bench.py`: ZINC-like (~23-node molecules,
one-hot + eig-PE features), TSP-like (k-NN point clouds with tour labels on
edges), brain-like (shared dense FC skeleton, fMRI time courses).  Scales
from BASELINE.md / reference lib/LRGBDataset.py:70-105.
"""

from __future__ import annotations

import numpy as np

from hl_hgat_tpu.complex.batch import ComplexBatch
from hl_hgat_tpu.complex.build import GraphSample, build_complex, collate
from hl_hgat_tpu.complex.coarsen import build_pyramid


def _random_connected(rng: np.random.Generator, n: int, extra: int):
    parents = rng.integers(0, np.maximum(np.arange(1, n), 1))
    pairs = {
        (int(min(p, i)), int(max(p, i)))
        for i, p in zip(range(1, n), parents)
    }
    for _ in range(extra):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((int(min(a, b)), int(max(a, b))))
    arr = np.array(sorted(pairs), np.int64)
    return arr[:, 0], arr[:, 1]


def random_simplex_sample(
    rng: np.random.Generator,
    *,
    n_nodes: int = 23,
    extra_edges: int = 4,
    node_feat: int = 21,
    edge_feat: int = 3,
    keig: int = 8,
    num_pool: int = 0,
    y_dim: int = 1,
) -> GraphSample:
    src, dst = _random_connected(rng, n_nodes, extra_edges)
    e = src.shape[0]
    sample = build_complex(
        np.stack([src, dst]),
        n_nodes,
        x_t=rng.standard_normal((n_nodes, node_feat)).astype(np.float32),
        x_s=rng.standard_normal((e, edge_feat)).astype(np.float32),
        y=rng.standard_normal(y_dim).astype(np.float32),
        keig=keig,
    )
    if num_pool:
        sample.levels, sample.pools = build_pyramid(sample.levels, num_pool)
    return sample


def synthetic_zinc_batch(
    batch_size: int = 8,
    *,
    seed: int = 0,
    keig: int = 16,
    num_pool: int = 0,
    embed_ids: bool = False,
    with_ell: bool = False,
) -> ComplexBatch:
    """ZINC-like: ~23 heavy atoms, categorical features + eig PE.

    ``embed_ids=True`` puts integer atom/bond ids in column 0 for the
    embedding-table model variant (reference main_zinc...py:120-121).
    ``with_ell=True`` attaches ELL forms to L0/L1 (gather-SpMM fast path)."""
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(batch_size):
        n = int(rng.integers(15, 33))
        s = random_simplex_sample(
            rng, n_nodes=n, extra_edges=int(rng.integers(2, 6)),
            node_feat=1 if embed_ids else 21, edge_feat=1 if embed_ids else 3,
            keig=keig, num_pool=num_pool,
        )
        if embed_ids:
            s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
            s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
        samples.append(s)
    return collate(samples, with_ell=with_ell)


def synthetic_tsp_batch(batch_size: int = 4, *, seed: int = 0) -> ComplexBatch:
    """TSP-like: 2-d coords on nodes, [distance, aug_mask] on edges, binary
    per-edge tour labels."""
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(batch_size):
        n = int(rng.integers(50, 101))
        pos = rng.random((n, 2)).astype(np.float32)
        # tour ring + random chords, like sparsified TSP instances
        order = rng.permutation(n)
        tour = set()
        for i in range(n):
            a, b = int(order[i]), int(order[(i + 1) % n])
            tour.add((min(a, b), max(a, b)))
        pairs = set(tour)
        for _ in range(3 * n):
            a, b = rng.integers(0, n, 2)
            if a != b:
                pairs.add((int(min(a, b)), int(max(a, b))))
        arr = np.array(sorted(pairs), np.int64)
        src, dst = arr[:, 0], arr[:, 1]
        dist = np.linalg.norm(pos[src] - pos[dst], axis=1, keepdims=True)
        aug_mask = np.ones_like(dist)
        y = np.array(
            [1.0 if (int(a), int(b)) in tour else 0.0 for a, b in zip(src, dst)],
            np.float32,
        )
        s = build_complex(
            np.stack([src, dst]), n,
            x_t=pos,
            x_s=np.concatenate([dist, aug_mask], axis=1).astype(np.float32),
            y=y,
        )
        samples.append(s)
    return collate(samples, y_per_edge=True)


def synthetic_brain_batch(
    batch_size: int = 4,
    *,
    seed: int = 0,
    n_rois: int = 32,
    t_len: int = 64,
    density: float = 0.2,
    num_pool: int = 2,
) -> tuple[ComplexBatch, int, int]:
    """Brain-like: one shared skeleton across subjects, fMRI time courses on
    nodes, FC weights on edges (reference HL-HGAT-DEMO pipeline).

    Returns (batch, nodes_per_graph_final, edges_per_graph_final)."""
    rng = np.random.default_rng(seed)
    # shared skeleton
    src, dst = _random_connected(
        rng, n_rois, int(density * n_rois * (n_rois - 1) / 2)
    )
    levels = None
    pools = None
    samples = []
    for _ in range(batch_size):
        ts = rng.standard_normal((n_rois, t_len)).astype(np.float32)
        fc = rng.standard_normal((src.shape[0], 1)).astype(np.float32)
        s = build_complex(
            np.stack([src, dst]), n_rois, x_t=ts, x_s=fc,
            y=rng.standard_normal(1).astype(np.float32),
        )
        if levels is None:
            levels, pools = build_pyramid(s.levels, num_pool)
        s.levels, s.pools = levels, pools
        samples.append(s)
    batch = collate(samples, multiple=1)
    final = samples[0].levels[-1]
    return batch, final.num_nodes, final.num_edges


def synthetic_fmri_series(
    rng: np.random.Generator,
    n_subjects: int,
    n_rois: int,
    t_len: int,
    *,
    k_latent: int = 4,
    y_mean: float = 95.1377,
    y_std: float = 7.3,
) -> tuple[np.ndarray, np.ndarray]:
    """Learnable synthetic fMRI: latent network signal + noise, with the IQ
    score correlated with the strength of one latent component — the
    smoke-mode stand-in for the reference's DEMO_DATA.mat subject series
    (LFS-missing upstream; reference HL-HGAT-DEMO/OHBM_DEMO.ipynb cell 16
    describes the real format).  Score constants mirror the reference's
    z-scoring (HL-HGAT-DEMO/lib/Hodge_Dataset.py:140).

    Returns (timeseries [N, R, T], scores [N])."""
    mixing = rng.standard_normal((n_rois, k_latent))
    ts_all = np.empty((n_subjects, n_rois, t_len))
    scores = np.empty(n_subjects)
    for s in range(n_subjects):
        strength = rng.uniform(0.5, 2.0)
        lat = rng.standard_normal((k_latent, t_len))
        lat[0] *= strength
        ts_all[s] = mixing @ lat + 0.5 * rng.standard_normal(
            (n_rois, t_len)
        )
        scores[s] = y_mean + y_std * (strength - 1.25)
    return ts_all, scores
