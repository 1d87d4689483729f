"""Inception1D — fMRI time-course embedding (reference lib/Hodge_Cheb_Conv.py:317-362).

Stem Conv1d(1→C, k=5) → inception stage 1 (1/3/5 kernels → C/4, C/2, C/4) →
BN → LeakyReLU → MaxPool1d(3, stride 2, pad 1) → inception stage 2 (1/3/5 →
nc, 2nc, nc) → BN → LeakyReLU; ``if_readout`` reduces the time axis.

``readout_mode`` selects between the two reference variants: the main lib
mean-pools time (lib/Hodge_Cheb_Conv.py:358-360, ``"mean"``), while the
DEMO fork — the one the shipped pretrained brain checkpoint was trained
with — concatenates max-pool and mean-pool
(HL-HGAT-DEMO/lib/Hodge_Cheb_Conv.py:512-514, ``"max_mean"``; 2× wider).

TPU layout: features-last [N, T, C] so the convs are NTC→lax.conv with the
channel contraction on the MXU (torch uses [N, C, T]).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hl_hgat_tpu.nn.norm import MaskedBatchNorm

Array = jnp.ndarray


class Inception1D(nn.Module):
    in_channels: int = 64
    num_channels: int = 8
    maxpool: int = 3
    leaky_slope: float = 0.1
    if_readout: bool = False
    readout_mode: str = "mean"  # "mean" (main lib) | "max_mean" (DEMO)
    # computation dtype for the Conv1d stack ("bfloat16" halves the large
    # [N, T, C] intermediate traffic — the round-3 brain trace showed the
    # f32 stem/stage tensors among the top HBM movers); params stay f32,
    # BN statistics are computed in f32 regardless
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask: Array | None = None,
        *,
        deterministic: bool = False,
    ) -> Array:
        """x: [N, T] raw time series; mask: [N] simplex validity."""
        c = self.in_channels
        dt = jnp.dtype(self.compute_dtype)
        x = x.astype(dt)[:, :, None]  # [N, T, 1]
        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f, (k,), padding="SAME", dtype=dt, name=name)
        x = conv(c, 5, "embedding")(x)
        x1 = conv(c // 4, 1, "channel1_1")(x)
        x2 = conv(c // 2, 3, "channel2_1")(x)
        x3 = conv(c // 4, 5, "channel3_1")(x)
        x = jnp.concatenate([x1, x2, x3], axis=-1)
        x = MaskedBatchNorm(c, name="bn1")(x, mask, use_running_average=deterministic)
        x = nn.leaky_relu(x, self.leaky_slope)
        k = self.maxpool
        x = nn.max_pool(
            x, window_shape=(k,), strides=(k - 1,), padding=[((k - 1) // 2,) * 2]
        )
        nc = self.num_channels
        x1 = conv(nc, 1, "channel1_2")(x)
        x2 = conv(nc * 2, 3, "channel2_2")(x)
        x3 = conv(nc, 5, "channel3_2")(x)
        x = jnp.concatenate([x1, x2, x3], axis=-1)
        x = MaskedBatchNorm(nc * 4, name="bn2")(
            x, mask, use_running_average=deterministic
        )
        x = nn.leaky_relu(x, self.leaky_slope)
        if self.if_readout:
            if self.readout_mode == "max_mean":
                return jnp.concatenate(
                    [x.max(axis=1), x.mean(axis=1)], axis=-1
                )  # [N, 8*nc]
            return x.mean(axis=1)  # [N, 4*nc]
        return x  # [N, T', 4*nc] — feeds the 3-D conv path
