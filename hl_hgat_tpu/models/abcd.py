"""Brain/ABCD model: fMRI time-series nodes + FC edges with flatten readout.

Reference ``HL_HGCNN_ABCD_dense_int3_attpool`` (lib/Hodge_ST_Model.py:26-168):
``Inception1D`` node embedding, dense-int3 trunk with attention pooling
(gates computed from the last-layer features, multiplied into the stacks),
K=1 conv readout to one channel per simplex, then an MLP over the flattened
``[edges ‖ nodes]`` vector — valid because every brain graph shares one
skeleton, so per-graph simplex counts are constant.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hl_hgat_tpu.complex.batch import ComplexBatch
from hl_hgat_tpu.models.backbone import (
    BackboneConfig,
    MLPHead,
    head_cast,
    make_backbone,
)
from hl_hgat_tpu.nn.conv import LaguerreConv
from hl_hgat_tpu.nn.inception import Inception1D

Array = jnp.ndarray


def flatten_per_graph(x: Array, num_graphs: int, per_graph: int) -> Array:
    """[N, 1] (flat) or [G, S, 1] (dense layout) → [G, per_graph]; relies on
    per-graph-contiguous rows with padding only at the tail (both collates
    guarantee this for shared-skeleton datasets)."""
    if x.ndim == 3:
        return x[:, :per_graph, 0]
    return x[: num_graphs * per_graph].reshape(num_graphs, per_graph)


class HLHGCNNAbcd(nn.Module):
    cfg: BackboneConfig
    mlp_channels: tuple[int, ...] = ()
    num_classes: int = 1
    dropout_mlp: float = 0.0
    inception_channels: int = 64
    inception_num_channels: int = 8
    nodes_per_graph: int = 0  # on the final (pooled) level
    edges_per_graph: int = 0

    @nn.compact
    def __call__(
        self,
        batch: ComplexBatch,
        *,
        deterministic: bool = False,
        return_atts: bool = False,
    ):
        level0 = batch.level0
        # x_t rows are raw time courses: [N, T] flat, or [G, S, T] dense —
        # Inception1D expects 2-D rows, so the dense layout flattens the
        # (graph, simplex) axes around it
        x_t = batch.x_t
        dense_shape = x_t.shape[:2] if x_t.ndim == 3 else None
        if dense_shape is not None:
            x_t = x_t.reshape(-1, x_t.shape[-1])
            mask_flat = level0.node_mask.reshape(-1)
        else:
            mask_flat = level0.node_mask
        x_t = Inception1D(
            in_channels=self.inception_channels,
            num_channels=self.inception_num_channels,
            if_readout=True,
            compute_dtype=self.cfg.compute_dtype,
            name="node_embedding",
        )(x_t, mask_flat, deterministic=deterministic)
        x_t = x_t * mask_flat[:, None]
        if dense_shape is not None:
            x_t = x_t.reshape(dense_shape + (x_t.shape[-1],))
        feats = make_backbone(self.cfg)(
            x_t, batch.x_s, batch, deterministic
        )
        level = batch.levels[feats["level_idx"]]
        f_t, f_s = head_cast(self.cfg, feats["x_t"], feats["x_s"])
        # K=1 conv readout to one channel per simplex (reference :86-91)
        r_t = LaguerreConv(1, 1, name="readout_node")(f_t, level.l0)
        r_s = LaguerreConv(1, 1, name="readout_edge")(f_s, level.l1)
        x = jnp.concatenate(
            [
                flatten_per_graph(r_s, batch.num_graphs, self.edges_per_graph),
                flatten_per_graph(r_t, batch.num_graphs, self.nodes_per_graph),
            ],
            axis=-1,
        )
        out = MLPHead(
            self.mlp_channels, self.num_classes, self.cfg.act,
            self.cfg.leaky_slope, self.dropout_mlp, name="head",
        )(x, deterministic=deterministic)
        if return_atts:
            return out, feats["atts"]
        return out
