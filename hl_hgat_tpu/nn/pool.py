"""Pooling: global masked readouts + simplicial attention pooling (SAPool).

SAPool semantics (reference lib/Hodge_Cheb_Conv.py:36-59 and the inlined
copies in every attpool model, e.g. reference lib/Hodge_ST_Model.py:276-290):
gate node/edge features with MSI attention, scatter-mean nodes into their
MLGC clusters, drop intra-cluster edges (``inf`` markers → here the dump
index), scatter-mean surviving edges, then continue on the coarse level's
L0/L1/B1.

Static shapes: fine and coarse levels both live at fixed padded sizes inside
one `ComplexBatch`; "simplex count drops" becomes "coarse level uses its own
(smaller) padding", with no recompilation.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hl_hgat_tpu.complex.batch import ComplexLevel, PoolMap
from hl_hgat_tpu.nn.interaction import NodeEdgeInt
from hl_hgat_tpu.ops.segment import segment_mean

Array = jnp.ndarray


def global_mean_pool(
    x: Array, seg_id: Array, num_graphs: int, mask: Array | None = None
) -> Array:
    """Per-graph mean over valid simplices (PyG ``global_mean_pool``).

    Padding rows carry ``seg_id == num_graphs`` and are dropped by segment
    range semantics; ``mask`` additionally removes them from the denominator.
    """
    return segment_mean(x, seg_id, num_graphs, weights=mask)


def sapool_scatter(
    x_t: Array,
    x_s: Array,
    pool,
    fine,
    coarse,
) -> tuple[Array, Array]:
    """Scatter-mean gated features into the coarse complex.

    Matches ``scatter_mean(x, pos, dim=0)`` after dropping ``inf`` edges
    (reference lib/Hodge_ST_Model.py:282-285): deleted fine edges and all
    padding point at the coarse dump slot and vanish; denominators count
    valid fine members only.  Layout-polymorphic (COO segment means or dense
    assignment matmuls).
    """
    from hl_hgat_tpu.ops.dispatch import pool_to_coarse

    return pool_to_coarse(pool, fine, coarse, x_t, x_s)


class SAPool(nn.Module):
    """Gate-then-pool module (reference SAPool, lib/Hodge_Cheb_Conv.py:36-59).

    ``sigma``/``lam`` configure the attention head; ``max_normalize`` divides
    the gates by their max first (the CIFAR10 variant, reference
    lib/Hodge_ST_Model.py:1061-1062).
    """

    dk: int = 32
    sigma: str = "sigmoid"
    lam: float = 0.9
    max_normalize: bool = False

    @nn.compact
    def __call__(
        self,
        x_t: Array,
        x_s: Array,
        pool: PoolMap,
        fine: ComplexLevel,
        coarse: ComplexLevel,
        deg: Array,
        *,
        deterministic: bool = False,
    ) -> tuple[Array, Array, Array, Array]:
        att = NodeEdgeInt(
            dk=self.dk, only_att=True, sigma=self.sigma, lam=self.lam,
            name="NEAtt",
        )
        a_t, a_s = att(x_t, x_s, fine, deg, deterministic=deterministic)
        if self.max_normalize:
            a_t = a_t / jnp.maximum(jnp.max(a_t), 1e-12)
            a_s = a_s / jnp.maximum(jnp.max(a_s), 1e-12)
        # gated multiply in the activation dtype (the f32 att-head scale
        # would otherwise promote the wide product to f32 — see the same
        # cast in models/backbone.py); returned gates stay f32
        x_t_c, x_s_c = sapool_scatter(
            x_t * a_t.astype(x_t.dtype), x_s * a_s.astype(x_s.dtype),
            pool, fine, coarse,
        )
        return x_t_c, x_s_c, a_t, a_s
