"""Node–edge interaction (MSI / NodeEdgeInt): cross-simplex coupling via B1.

Semantics of the reference module (two verbatim copies, reference
lib/Hodge_Cheb_Conv.py:61-115 and :255-309):

  x_s2t = D⁻¹ · |B1| · x_s          (nodes gather incident edge features)
  x_t2s = |B1|ᵀ · x_t / 2           (edges average endpoint node features)

Value mode: two 2-layer MLPs (Linear→BN→ReLU ×2) on the concatenations
[x_s2t ‖ x_t] and [x_t2s ‖ x_s] (reference :276-289,:307-308).

Attention mode (``only_att``): scalar gate per simplex
  a_t = σ(((1−λ)·⟨WQ_E x_s2t, WK_N x_t⟩ + λ·⟨WQ_N x_t, WK_N x_t⟩)/√dk)
  a_s = σ(((1−λ)·⟨WQ_N x_t2s, WK_E x_s⟩ + λ·⟨WQ_E x_s, WK_E x_s⟩)/√dk)
(reference :299-304); σ is Sigmoid or ReLU per model, λ fixed (0.9 default,
0.5 for CIFAR/peptides).

TPU notes: the boundary products are gathers + one segment-sum
(``hl_hgat_tpu.ops.boundary``) — no sparse matrix is materialized, unlike
``adj2par1`` on device each block in the reference.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hl_hgat_tpu.complex.batch import ComplexLevel
from hl_hgat_tpu.nn.linear import TorchLinear
from hl_hgat_tpu.nn.norm import MaskedBatchNorm
from hl_hgat_tpu.ops.dispatch import abs_b1_s2t, abs_b1_t2s

Array = jnp.ndarray


def _sigma(name: str):
    if name == "sigmoid":
        return nn.sigmoid
    if name == "relu":
        return nn.relu
    raise ValueError(f"unknown attention activation {name!r}")


def cross_simplex(
    x_t: Array,
    x_s: Array,
    level,
    deg: Array,
) -> tuple[Array, Array]:
    """(x_s2t, x_t2s) boundary couplings; ``deg`` already carries any eps.

    Layout-polymorphic: flat COO levels use gathers + segment sums, dense
    levels use batched |B1| matmuls (hl_hgat_tpu.ops.dispatch).
    """
    s2t = abs_b1_s2t(level, x_s)
    # Padded/isolated nodes have deg == 0 when the model's deg_eps is 0 (the
    # zinc quirk): guard the division — the numerator is 0 there anyway.
    safe_deg = jnp.where(deg > 0, deg, 1.0)
    x_s2t = s2t / safe_deg[..., None].astype(s2t.dtype)
    x_t2s = abs_b1_t2s(level, x_t) / 2.0
    return x_s2t, x_t2s


class _ValueHead(nn.Module):
    dv: int

    @nn.compact
    def __call__(self, x: Array, mask: Array, deterministic: bool) -> Array:
        x = TorchLinear(self.dv)(x)
        x = MaskedBatchNorm(self.dv)(x, mask, use_running_average=deterministic)
        x = nn.relu(x)
        x = TorchLinear(self.dv)(x)
        x = MaskedBatchNorm(self.dv)(x, mask, use_running_average=deterministic)
        return nn.relu(x)


class NodeEdgeInt(nn.Module):
    """Cross-simplex interaction; ``only_att=True`` yields scalar gates."""

    dv: int = 64
    dk: int = 32
    only_att: bool = False
    sigma: str = "sigmoid"
    lam: float = 0.9

    @nn.compact
    def __call__(
        self,
        x_t: Array,
        x_s: Array,
        level,
        deg: Array,
        deterministic: bool = False,
    ) -> tuple[Array, Array]:
        # ``deterministic`` is positional-friendly so nn.remat can mark it
        # static (backbone remat path, static_argnums=(5,))
        x_s2t, x_t2s = cross_simplex(x_t, x_s, level, deg)
        if self.only_att:
            act = _sigma(self.sigma)
            wq_n = TorchLinear(self.dk, name="WQ_Node")
            wk_n = TorchLinear(self.dk, name="WK_Node")
            wq_e = TorchLinear(self.dk, name="WQ_Edge")
            wk_e = TorchLinear(self.dk, name="WK_Edge")
            scale = 1.0 / jnp.sqrt(jnp.asarray(self.dk, jnp.float32))
            lam = self.lam
            a_t = act(
                (
                    (1.0 - lam)
                    * jnp.sum(wq_e(x_s2t) * wk_n(x_t), axis=-1, keepdims=True)
                    + lam * jnp.sum(wq_n(x_t) * wk_n(x_t), axis=-1, keepdims=True)
                )
                * scale
            )
            a_s = act(
                (
                    (1.0 - lam)
                    * jnp.sum(wq_n(x_t2s) * wk_e(x_s), axis=-1, keepdims=True)
                    + lam * jnp.sum(wq_e(x_s) * wk_e(x_s), axis=-1, keepdims=True)
                )
                * scale
            )
            return a_t, a_s
        x_t1 = _ValueHead(self.dv, name="WV_Node")(
            jnp.concatenate([x_s2t, x_t], axis=-1), level.node_mask, deterministic
        )
        x_s1 = _ValueHead(self.dv, name="WV_Edge")(
            jnp.concatenate([x_t2s, x_s], axis=-1), level.edge_mask, deterministic
        )
        return x_t1, x_s1


# The reference ships the same module twice under two names
# (lib/Hodge_Cheb_Conv.py:61 `MSI`, :255 `NodeEdgeInt`).
MSI = NodeEdgeInt
