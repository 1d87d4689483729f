"""HL-HGAT attention-pooling model (the DEMO's modular rewrite).

Reference ``HL_HGAT_attpool``
(HL-HGAT-DEMO/lib/Hodge_Cheb_Conv.py:250-399): Inception1D embedding →
dense-int3 trunk pooling at the first ``pool_num`` blocks with sigmoid gates
computed from the feature *stacks* → K=1 conv readout → flatten MLP.
Returns ``(pred, latent, node_att, edge_att)`` where the attention maps are
the first-level gates reshaped per graph (reference :374-376, :399) — the
tensors the OHBM analysis notebook visualizes.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hl_hgat_tpu.complex.batch import ComplexBatch
from hl_hgat_tpu.models.abcd import flatten_per_graph
from hl_hgat_tpu.models.backbone import BackboneConfig, MLPHead, make_backbone
from hl_hgat_tpu.nn.conv import LaguerreConv
from hl_hgat_tpu.nn.inception import Inception1D

Array = jnp.ndarray


class HLHGATAttpool(nn.Module):
    cfg: BackboneConfig
    mlp_channels: tuple[int, ...] = ()
    num_classes: int = 1
    dropout_mlp: float = 0.0
    nodes_per_graph: int = 0  # final level
    edges_per_graph: int = 0
    fine_nodes_per_graph: int = 0  # level 0 (for the attention maps)
    fine_edges_per_graph: int = 0
    use_inception: bool = True

    @nn.compact
    def __call__(self, batch: ComplexBatch, *, deterministic: bool = False):
        level0 = batch.level0
        x_t = batch.x_t
        if self.use_inception:
            # dense layout carries [G, S, T]; Inception1D expects 2-D rows
            dense_shape = x_t.shape[:2] if x_t.ndim == 3 else None
            if dense_shape is not None:
                x_t = x_t.reshape(-1, x_t.shape[-1])
                mask_flat = level0.node_mask.reshape(-1)
            else:
                mask_flat = level0.node_mask
            x_t = Inception1D(
                if_readout=True, readout_mode="max_mean",
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
        r_t = LaguerreConv(1, 1, name="readout_node")(feats["x_t"], level.l0)
        r_s = LaguerreConv(1, 1, name="readout_edge")(feats["x_s"], level.l1)
        x = jnp.concatenate(
            [
                flatten_per_graph(r_s, batch.num_graphs, self.edges_per_graph),
                flatten_per_graph(r_t, batch.num_graphs, self.nodes_per_graph),
            ],
            axis=-1,
        )
        pred, latent = MLPHead(
            self.mlp_channels, self.num_classes, self.cfg.act,
            self.cfg.leaky_slope, self.dropout_mlp, name="head",
        )(x, deterministic=deterministic, return_latent=True)
        a_t, a_s = feats["atts"][0]
        node_att = flatten_per_graph(
            a_t, batch.num_graphs, self.fine_nodes_per_graph
        )
        edge_att = flatten_per_graph(
            a_s, batch.num_graphs, self.fine_edges_per_graph
        )
        return pred, latent, node_att, edge_att
