"""Padding-aware BatchNorm (replaces PyG ``gnn.BatchNorm``).

The reference normalizes over all simplices in the ragged batch
(BatchNorm1d inside every conv block, e.g. reference
lib/Hodge_ST_Model.py:580).  Under static-shape padding the batch statistics
must be computed over *valid* rows only — including zero pad rows would bias
the mean toward 0 and shrink the variance — and the normalized output is
re-masked so padding stays exactly zero for downstream segment ops.

Matches torch defaults: eps 1e-5, momentum 0.1 (running = 0.9*running +
0.1*batch), biased variance for normalization, affine scale/offset.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class MaskedBatchNorm(nn.Module):
    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    use_running_average: bool | None = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask: Array | None = None,
        *,
        use_running_average: bool | None = None,
    ) -> Array:
        """x: [N, C] or [N, T, C]; mask: [N] (1 = valid row)."""
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = self.features
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        offset = self.param("offset", nn.initializers.zeros, (c,))

        reduce_axes = tuple(range(x.ndim - 1))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                count = 1
                for d in x.shape[:-1]:
                    count *= int(d)
                n_valid = jnp.asarray(float(count), jnp.float32)
                total = jnp.sum(xf, axis=reduce_axes)
                total_sq = jnp.sum(xf * xf, axis=reduce_axes)
            else:
                m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(
                    jnp.float32
                )
                # elements per masked row beyond the mask's own dims
                per_row = 1.0
                for d in x.shape[mask.ndim : -1]:
                    per_row *= int(d)
                n_valid = jnp.maximum(jnp.sum(m) * per_row, 1.0)
                total = jnp.sum(xf * m, axis=reduce_axes)
                total_sq = jnp.sum(xf * xf * m, axis=reduce_axes)
            mean = total / n_valid
            var = total_sq / n_valid - mean * mean
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                # torch uses the unbiased variance for the running stat
                unbiased = var * n_valid / jnp.maximum(n_valid - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        # Folded affine apply: y = x·a + b with a = γ/√(var+ε) and
        # b = β − μ·a precomputed per channel — one fused multiply-add per
        # element instead of the (x−μ)·inv·γ+β chain (the BN apply/accum
        # fusion class ran at ~4.8× its bandwidth floor in the round-4
        # rollup; the per-channel prework is [C]-sized, free).  Same math
        # reassociated (~1-ulp f32 drift vs torch's ordering; parity
        # fixtures assert 1e-4).
        a = scale * jnp.reciprocal(jnp.sqrt(var + self.eps))
        b = offset - mean * a
        y = x.astype(jnp.float32) * a + b
        if mask is not None:
            y = y * mask.reshape(
                mask.shape + (1,) * (x.ndim - mask.ndim)
            ).astype(y.dtype)
        return y.astype(x.dtype)
