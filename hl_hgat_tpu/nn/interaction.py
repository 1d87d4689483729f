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
from hl_hgat_tpu.nn.linear import (
    TorchLinear,
    torch_bias_init,
    torch_kaiming_uniform,
)
from hl_hgat_tpu.nn.norm import MaskedBatchNorm
from hl_hgat_tpu.ops.dispatch import abs_b1_s2t, abs_b1_t2s

Array = jnp.ndarray

# ---------------------------------------------------------------------------
# Project-then-couple: GEMMs commute with the boundary SpMM.
#
# The reference computes x_s2t = D⁻¹·|B1|·x_s at FULL feature width and only
# then projects it (reference lib/Hodge_Cheb_Conv.py:294-308).  Since |B1|
# mixes rows and W mixes channels, (D⁻¹|B1|x_s)·W ≡ D⁻¹|B1|(x_s·W) exactly
# (up to fp reassociation) — so we apply the Linear FIRST and run the
# boundary product at the output width (dv or dk) instead of the dense-concat
# stack width (grows past 1300 channels).  On a memory-bound TPU step this
# shrinks the coupling traffic and FLOPs by the width ratio (5–40×) with the
# same math.  Parameter trees stay identical to the TorchLinear versions.
# ---------------------------------------------------------------------------


class CoupledLinear(nn.Module):
    """TorchLinear whose matmul may be followed by a row-mixing ``couple``
    before the bias is added: y = couple(x @ W) + b."""

    features: int

    @nn.compact
    def __call__(self, x: Array, couple=None) -> Array:
        fan_in = x.shape[-1]
        w = self.param("kernel", torch_kaiming_uniform, (fan_in, self.features))
        b = self.param("bias", torch_bias_init(fan_in), (self.features,))
        y = jnp.einsum(
            "...c,cf->...f", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if couple is not None:
            y = couple(y)
        return y + b.astype(y.dtype)


class _SplitFirstLinear(nn.Module):
    """First MLP layer of a value head on a virtual concat [cross ‖ self]:
    the cross half goes through ``couple`` AFTER its kernel slice.  Param
    tree and init match ``TorchLinear(features)`` on the concat input."""

    features: int

    @nn.compact
    def __call__(self, x_cross_pre: Array, x_self: Array, couple) -> Array:
        c_cross = x_cross_pre.shape[-1]
        fan_in = c_cross + x_self.shape[-1]
        w = self.param("kernel", torch_kaiming_uniform, (fan_in, self.features))
        b = self.param("bias", torch_bias_init(fan_in), (self.features,))
        wa = w[:c_cross].astype(x_cross_pre.dtype)
        wb = w[c_cross:].astype(x_self.dtype)
        za = couple(
            jnp.einsum(
                "...c,cf->...f", x_cross_pre, wa,
                preferred_element_type=jnp.float32,
            ).astype(x_cross_pre.dtype)
        )
        zb = jnp.einsum(
            "...c,cf->...f", x_self, wb, preferred_element_type=jnp.float32
        ).astype(x_self.dtype)
        return za + zb + b.astype(zb.dtype)


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
    """2-layer MLP on the virtual concat [coupled ‖ self] (reference
    lib/Hodge_Cheb_Conv.py:276-289).  The first Linear is split so the
    boundary product runs at width ``dv`` (project-then-couple, see module
    header); tree-compatible with the concat formulation."""

    dv: int

    @nn.compact
    def __call__(
        self, x_cross_pre: Array, x_self: Array, couple, mask: Array,
        deterministic: bool,
    ) -> Array:
        x = _SplitFirstLinear(self.dv, name="TorchLinear_0")(
            x_cross_pre, x_self, couple
        )
        x = MaskedBatchNorm(self.dv)(x, mask, use_running_average=deterministic)
        x = nn.relu(x)
        x = TorchLinear(self.dv, name="TorchLinear_1")(x)
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
        safe_deg = jnp.where(deg > 0, deg, 1.0)

        def couple_s2t(z: Array) -> Array:
            # D⁻¹·|B1|·z — the x_s2t coupling at projected width
            out = abs_b1_s2t(level, z)
            return out / safe_deg[..., None].astype(out.dtype)

        def couple_t2s(z: Array) -> Array:
            return abs_b1_t2s(level, z) / 2.0

        if self.only_att:
            act = _sigma(self.sigma)
            wq_n = CoupledLinear(self.dk, name="WQ_Node")
            wk_n = CoupledLinear(self.dk, name="WK_Node")
            wq_e = CoupledLinear(self.dk, name="WQ_Edge")
            wk_e = CoupledLinear(self.dk, name="WK_Edge")
            scale = 1.0 / jnp.sqrt(jnp.asarray(self.dk, jnp.float32))
            lam = self.lam
            # WQ_E(x_s2t) ≡ couple(x_s @ K_qe) + b_qe etc. — boundary
            # products run at dk channels instead of the stack width
            a_t = act(
                (
                    (1.0 - lam)
                    * jnp.sum(
                        wq_e(x_s, couple=couple_s2t) * wk_n(x_t),
                        axis=-1, keepdims=True,
                    )
                    + lam * jnp.sum(wq_n(x_t) * wk_n(x_t), axis=-1, keepdims=True)
                )
                * scale
            )
            a_s = act(
                (
                    (1.0 - lam)
                    * jnp.sum(
                        wq_n(x_t, couple=couple_t2s) * wk_e(x_s),
                        axis=-1, keepdims=True,
                    )
                    + lam * jnp.sum(wq_e(x_s) * wk_e(x_s), axis=-1, keepdims=True)
                )
                * scale
            )
            return a_t, a_s
        x_t1 = _ValueHead(self.dv, name="WV_Node")(
            x_s, x_t, couple_s2t, level.node_mask, deterministic
        )
        x_s1 = _ValueHead(self.dv, name="WV_Edge")(
            x_t, x_s, couple_t2s, level.edge_mask, deterministic
        )
        return x_t1, x_s1


# The reference ships the same module twice under two names
# (lib/Hodge_Cheb_Conv.py:61 `MSI`, :255 `NodeEdgeInt`).
MSI = NodeEdgeInt
