"""Visualization data extraction (reference L5).

Array-producing equivalents of the reference's analysis utilities — the
plotting itself is left to the caller's matplotlib:

* ``collect_outputs``  — batch-collect final-layer features + predictions
  (reference ``visualize``, lib/Hodge_Dataset.py:51-70)
* ``feature_trends``   — per-layer feature-magnitude trends from backbone
  snapshots (reference lib/Visualization.py:126-165 / fig/tsp_trend.png)
* ``attention_fc_matrix`` + ``sort_by_parcels`` — edge-attention scores as a
  symmetric ROI×ROI matrix ordered by anatomical parcel labels (reference
  ``plt_sort_anatomy``, HL-HGAT-DEMO/lib/Hodge_Dataset.py:53-107)
* ``edge_index_from_level`` — recover the directed adjacency from the
  canonical boundary (reference ``pdata2data`` realignment,
  lib/Visualization.py:126-165)
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

from hl_hgat_tpu.complex.batch import ComplexBatch, ComplexLevel


def collect_outputs(
    batches: Iterable[ComplexBatch],
    apply_fn: Callable[[ComplexBatch], tuple],
) -> dict[str, np.ndarray]:
    """Run ``apply_fn(batch) -> (latent, pred)`` over a loader and stack.

    Mirrors the reference ``visualize`` loop (lib/Hodge_Dataset.py:51-70):
    returns latents, predictions, and labels concatenated over the dataset.
    """
    outs, preds, ys = [], [], []
    for batch in batches:
        latent, pred = apply_fn(batch)
        outs.append(np.asarray(latent))
        preds.append(np.asarray(pred))
        ys.append(np.asarray(batch.y))
    return dict(
        latent=np.concatenate(outs),
        pred=np.concatenate(preds),
        y=np.concatenate(ys),
    )


def feature_trends(
    snapshots: list[tuple[np.ndarray, np.ndarray]],
    level: ComplexLevel,
) -> dict[str, np.ndarray]:
    """Mean |activation| per layer for nodes and edges (valid simplices
    only) — the quantity behind the reference's TSP trend figure."""
    node_mask = np.asarray(level.node_mask) > 0
    edge_mask = np.asarray(level.edge_mask) > 0
    t_trend = np.asarray(
        [np.abs(np.asarray(x_t))[node_mask].mean() for x_t, _ in snapshots]
    )
    s_trend = np.asarray(
        [np.abs(np.asarray(x_s))[edge_mask].mean() for _, x_s in snapshots]
    )
    return dict(node=t_trend, edge=s_trend)


def attention_fc_matrix(
    edge_att: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
) -> np.ndarray:
    """Scatter per-edge attention into a symmetric ROI×ROI matrix."""
    m = np.zeros((num_nodes, num_nodes), np.float64)
    a = np.asarray(edge_att).reshape(-1)
    m[src, dst] = a
    m[dst, src] = a
    return m


def sort_by_parcels(
    matrix: np.ndarray, parcel_labels: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reorder an ROI×ROI matrix by parcel (lobe) membership.

    Returns (sorted matrix, permutation, parcel boundary indices) — the data
    behind the reference's anatomically-sorted FC attention plot
    (``plt_sort_anatomy``)."""
    perm = np.argsort(np.asarray(parcel_labels), kind="stable")
    sorted_m = matrix[np.ix_(perm, perm)]
    sorted_labels = np.asarray(parcel_labels)[perm]
    boundaries = np.nonzero(np.diff(sorted_labels))[0] + 1
    return sorted_m, perm, boundaries


def edge_index_from_level(level: ComplexLevel) -> np.ndarray:
    """Directed (both-ways) adjacency recovered from the canonical boundary
    lists — what the reference's ``par2adj``/``pdata2data`` realignment
    produces for plotting."""
    e = int(np.asarray(level.edge_mask).sum())
    src = np.asarray(level.src)[:e]
    dst = np.asarray(level.dst)[:e]
    return np.concatenate(
        [np.stack([src, dst]), np.stack([dst, src])], axis=1
    )
