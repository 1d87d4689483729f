"""Metrics.  Pure JAX/NumPy replacements for torchmetrics / sklearn
(SURVEY.md §2.6): denormalized MAE (ZINC), accuracy (CIFAR10-SP), per-graph
BinaryF1 (TSP, reference main_TSP...py:344-352), macro Average Precision
(Peptides, reference lib/Hodge_Dataset.py:73-94), Pearson correlation (brain
demo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def mae(pred: Array, target: Array, *, denorm: float = 1.0) -> Array:
    """Mean absolute error, optionally rescaled to raw label units
    (ZINC: × 2.0109, reference main_zinc...py:177)."""
    return jnp.mean(jnp.abs(pred.reshape(-1) - target.reshape(-1))) * denorm


def accuracy(logits: Array, labels: Array) -> Array:
    return jnp.mean(
        (jnp.argmax(logits, axis=-1) == labels.astype(jnp.int32)).astype(
            jnp.float32
        )
    )


def per_graph_binary_f1(
    logits: Array,
    targets: Array,
    seg_id: Array,
    num_graphs: int,
    mask: Array | None = None,
    *,
    threshold_logit: float = 0.0,
) -> Array:
    """Mean over graphs of the binary F1 of thresholded per-edge logits.

    torchmetrics BinaryF1Score applies sigmoid+0.5 to logits — equivalent to
    thresholding the logit at 0 (reference main_TSP...py:344-352 computes F1
    per unbatched graph then averages)."""
    pred = (logits.reshape(-1) > threshold_logit).astype(jnp.float32)
    t = targets.reshape(-1).astype(jnp.float32)
    m = (
        jnp.ones_like(pred)
        if mask is None
        else mask.reshape(-1).astype(jnp.float32)
    )
    tp = jax.ops.segment_sum(pred * t * m, seg_id, num_segments=num_graphs)
    fp = jax.ops.segment_sum(pred * (1 - t) * m, seg_id, num_segments=num_graphs)
    fn = jax.ops.segment_sum((1 - pred) * t * m, seg_id, num_segments=num_graphs)
    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-12)
    return jnp.mean(f1)


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """sklearn-compatible AP for one task: sum_n (R_n − R_{n−1}) · P_n."""
    y_true = np.asarray(y_true).reshape(-1)
    y_score = np.asarray(y_score).reshape(-1)
    order = np.argsort(-y_score, kind="stable")
    yt = y_true[order]
    tp = np.cumsum(yt)
    fp = np.cumsum(1 - yt)
    precision = tp / np.maximum(tp + fp, 1e-12)
    n_pos = yt.sum()
    if n_pos == 0:
        return 0.0
    recall = tp / n_pos
    # collapse ties on score: keep the last entry of each tie block
    distinct = np.nonzero(np.diff(y_score[order]))[0]
    idx = np.r_[distinct, yt.size - 1]
    precision, recall = precision[idx], recall[idx]
    return float(np.sum(np.diff(np.r_[0.0, recall]) * precision))


def eval_ap(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Macro AP over tasks, skipping tasks without both classes
    (reference ``eval_ap``, lib/Hodge_Dataset.py:73-94)."""
    aps = []
    for i in range(y_true.shape[1]):
        col = y_true[:, i]
        if (col == 1).any() and (col == 0).any():
            labeled = col == col  # drop NaNs
            aps.append(average_precision(col[labeled], y_pred[labeled, i]))
    if not aps:
        raise RuntimeError("no positively labeled task")
    return float(np.mean(aps))


def macro_f1(
    logits: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    mask: np.ndarray | None = None,
) -> float:
    """Macro-averaged multiclass F1 (the LRGB node-classification metric for
    PascalVOC-SP / COCO-SP).  Classes absent from both prediction and truth
    are skipped, matching sklearn's default macro averaging over present
    labels."""
    pred = np.argmax(np.asarray(logits), axis=-1).reshape(-1)
    labels = np.asarray(labels).reshape(-1).astype(np.int64)
    if mask is not None:
        keep = np.asarray(mask).reshape(-1) > 0
        pred, labels = pred[keep], labels[keep]
    f1s = []
    for c in range(num_classes):
        tp = float(np.sum((pred == c) & (labels == c)))
        fp = float(np.sum((pred == c) & (labels != c)))
        fn = float(np.sum((pred != c) & (labels == c)))
        if tp + fp + fn == 0:
            continue
        f1s.append(2 * tp / max(2 * tp + fp + fn, 1e-12))
    return float(np.mean(f1s)) if f1s else 0.0


def mrr(pos_scores: np.ndarray, neg_scores: np.ndarray) -> float:
    """Mean reciprocal rank (the PCQM-Contact link-prediction metric).

    ``pos_scores``: [Q] score of each query's true link; ``neg_scores``:
    [Q, K] scores of its negative candidates.  Optimistic-tie handling
    (rank = 1 + #negatives strictly greater), the torchmetrics default."""
    pos = np.asarray(pos_scores).reshape(-1, 1)
    neg = np.asarray(neg_scores).reshape(pos.shape[0], -1)
    rank = 1.0 + np.sum(neg > pos, axis=1)
    return float(np.mean(1.0 / rank))


def pearson_corr(pred: Array, target: Array) -> Array:
    p = pred.reshape(-1) - jnp.mean(pred)
    t = target.reshape(-1) - jnp.mean(target)
    return jnp.sum(p * t) / jnp.maximum(
        jnp.linalg.norm(p) * jnp.linalg.norm(t), 1e-12
    )
