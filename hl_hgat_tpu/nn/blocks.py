"""Reusable HL-filtering blocks shared by all model families.

The universal template (SURVEY.md §2.5): each layer is
  MSI (value mode) → [node LaguerreConv → BN → act → dropout]
                     ∥ [edge LaguerreConv → BN → act → dropout]
  → DenseNet-style concat onto the running feature stacks.

``HLFilter`` is the modular block of the DEMO rewrite (reference
lib/Hodge_Cheb_Conv.py:117-188); the benchmark models compose the same pieces
with per-model quirks (activation, gate inputs) in `hl_hgat_tpu.models`.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from hl_hgat_tpu.complex.batch import ComplexLevel
from hl_hgat_tpu.nn.conv import LaguerreConv
from hl_hgat_tpu.nn.interaction import NodeEdgeInt
from hl_hgat_tpu.nn.norm import MaskedBatchNorm

Array = jnp.ndarray


def activation(name: str, leaky_slope: float = 0.1) -> Callable[[Array], Array]:
    if name == "relu":
        return nn.relu
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, leaky_slope)
    raise ValueError(f"unknown activation {name!r}")


class ConvBNAct(nn.Module):
    """LaguerreConv → masked BN → activation → dropout, on one simplex order."""

    features: int
    k: int
    act: str = "relu"
    leaky_slope: float = 0.1
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x, lap, mask, *, deterministic: bool = False
    ) -> Array:
        x = LaguerreConv(self.features, self.k, name="conv")(x, lap)
        x = MaskedBatchNorm(self.features, name="bn")(
            x, mask, use_running_average=deterministic
        )
        x = activation(self.act, self.leaky_slope)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class NEConvPair(nn.Module):
    """The paired node/edge filter of every reference block
    (gnn.Sequential at e.g. reference lib/Hodge_ST_Model.py:578-589)."""

    features: int
    k: int
    act: str = "relu"
    leaky_slope: float = 0.1
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x_t, x_s, level: ComplexLevel, deterministic: bool = False
    ):
        # positional-friendly ``deterministic`` for nn.remat static_argnums
        x_t = ConvBNAct(
            self.features, self.k, self.act, self.leaky_slope, self.dropout,
            name="node",
        )(x_t, level.l0, level.node_mask, deterministic=deterministic)
        x_s = ConvBNAct(
            self.features, self.k, self.act, self.leaky_slope, self.dropout,
            name="edge",
        )(x_s, level.l1, level.edge_mask, deterministic=deterministic)
        return x_t, x_s


class HLFilter(nn.Module):
    """``channels`` stacked (MSI → NEConvPair → dense concat) layers
    (reference HL_filter, lib/Hodge_Cheb_Conv.py:117-188)."""

    channels: int = 2
    filters: int = 32
    k: int = 4
    act: str = "leaky_relu"
    leaky_slope: float = 0.1
    dropout: float = 0.0
    if_dense: bool = True

    @nn.compact
    def __call__(
        self,
        x_t0,
        x_s0,
        level: ComplexLevel,
        deg: Array,
        *,
        deterministic: bool = False,
    ):
        for j in range(self.channels):
            if self.if_dense:
                x_t, x_s = NodeEdgeInt(dv=self.filters, name=f"MSI{j}")(
                    x_t0, x_s0, level, deg, deterministic=deterministic
                )
                x_t, x_s = NEConvPair(
                    self.filters, self.k, self.act, self.leaky_slope,
                    self.dropout, name=f"NEConv{j}",
                )(x_t, x_s, level, deterministic=deterministic)
                x_t0 = jnp.concatenate([x_t0, x_t], axis=-1)
                x_s0 = jnp.concatenate([x_s0, x_s], axis=-1)
            else:
                x_t0, x_s0 = NEConvPair(
                    self.filters, self.k, self.act, self.leaky_slope,
                    self.dropout, name=f"NEConv{j}",
                )(x_t0, x_s0, level, deterministic=deterministic)
        return x_t0, x_s0
