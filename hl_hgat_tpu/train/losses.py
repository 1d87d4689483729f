"""Losses.  All support an optional element mask so padded simplices/graphs
never contribute; reductions divide by the valid count (torch 'mean'
semantics over the unpadded batch).

Reference: L1 (main_zinc...py:213), CrossEntropy (main_cifar10SP...py:203),
FocalLoss ×1e4 (lib/Loss_function.py:14-26 — note it is a GLOBAL focal term
built from the mean BCE, not per-element), SoftDice and weighted MSE
(lib/Loss_function.py:29-47, shipped-but-unused in the mains).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(x: Array, mask: Array | None) -> Array:
    """Mean over valid elements; mask broadcasts over trailing dims."""
    if mask is None:
        return jnp.mean(x)
    m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(x.dtype)
    denom = jnp.sum(m) * (x.size / m.size)
    return jnp.sum(x * m) / jnp.maximum(denom, 1.0)


def l1_loss(pred: Array, target: Array, mask: Array | None = None) -> Array:
    return _masked_mean(jnp.abs(pred - target), mask)


def mse_loss(pred: Array, target: Array, mask: Array | None = None) -> Array:
    return _masked_mean((pred - target) ** 2, mask)


def softmax_ce_loss(
    logits: Array, labels: Array, mask: Array | None = None
) -> Array:
    """labels: int class ids [N]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[
        :, 0
    ]
    return _masked_mean(nll, mask)


def bce_logits_loss(
    logits: Array, targets: Array, mask: Array | None = None
) -> Array:
    """BCEWithLogits, numerically stable."""
    z = jnp.clip(logits, -30.0, 30.0)
    per = jnp.maximum(z, 0) - z * targets + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return _masked_mean(per, mask)


def focal_loss(
    logits: Array,
    targets: Array,
    mask: Array | None = None,
    *,
    alpha: float = 0.25,
    gamma: float = 2.0,
    scale: float = 1e4,
) -> Array:
    """The reference's global focal term: ``logpt = −mean BCE``,
    ``loss = −(1−e^{logpt})^γ · α · logpt · scale``
    (reference lib/Loss_function.py:21-25)."""
    logpt = -bce_logits_loss(logits, targets, mask)
    pt = jnp.exp(logpt)
    return -((1.0 - pt) ** gamma) * alpha * logpt * scale


def soft_dice_loss(
    logits: Array, targets: Array, mask: Array | None = None, *, smooth: float = 1.0
) -> Array:
    """reference lib/Loss_function.py:29-43."""
    probs = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1).astype(probs.dtype)
    if mask is not None:
        m = mask.reshape(-1).astype(probs.dtype)
        probs, t = probs * m, t * m
    inter = jnp.sum(probs * t)
    score = 2.0 * (inter + smooth) / (jnp.sum(probs) + jnp.sum(t) + smooth)
    return 1.0 - score


def weighted_mse_loss(
    pred: Array, target: Array, mask: Array | None = None
) -> Array:
    """reference lib/Loss_function.py:46-47 (sum-reduced)."""
    per = jnp.exp(jnp.abs(target)) * (pred - target) ** 2
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (per.ndim - mask.ndim))
        per = per * m.astype(per.dtype)
    return jnp.sum(per)
