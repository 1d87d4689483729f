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
# Two exact-math traffic cuts over the reference formulation:
#
# 1. Project-then-couple: GEMMs commute with the boundary SpMM.  The
#    reference computes x_s2t = D⁻¹·|B1|·x_s at FULL feature width and only
#    then projects it (reference lib/Hodge_Cheb_Conv.py:294-308).  Since |B1|
#    mixes rows and W mixes channels, (D⁻¹|B1|x_s)·W ≡ D⁻¹|B1|(x_s·W)
#    exactly (up to fp reassociation) — so we apply the Linear FIRST and run
#    the boundary product at the output width (dv or dk) instead of the
#    dense-concat stack width (grows past 1300 channels).
#
# 2. Operand sharing across the two heads: each wide input feeds TWO
#    first-layer kernels (value mode: x_t is read by WV_Node's self slice
#    and WV_Edge's cross slice; attention mode: x_t feeds WQ_Node and
#    WK_Node).  XLA does not merge separate dots over the same operand, so
#    a memory-bound step pays the x_t0/x_s0 stack read twice.  We emit ONE
#    GEMM per operand, x @ [W_a ‖ W_b], halving the stack reads (~15% of
#    step traffic at flagship scale; benchmarks/RESULTS.md).  Column blocks
#    of a dot are independent, so results match the separate dots.
#
# Parameter trees stay identical to TorchLinear heads on the reference's
# concat inputs — same paths, same shapes, same init streams — so golden
# fixtures and checkpoints are unaffected.
# ---------------------------------------------------------------------------


class _ParamsOnly(nn.Module):
    """Declares a TorchLinear-compatible (kernel, bias) pair and returns it
    without computing, so the caller can batch several kernels into one
    merged GEMM.  Path/shape/init match ``TorchLinear(features)`` applied
    to a ``fan_in``-wide input."""

    features: int
    fan_in: int

    @nn.compact
    def __call__(self) -> tuple[Array, Array]:
        w = self.param(
            "kernel", torch_kaiming_uniform, (self.fan_in, self.features)
        )
        b = self.param("bias", torch_bias_init(self.fan_in), (self.features,))
        return w, b


Pieces = "Array | tuple[Array, ...]"


def _as_pieces(x) -> tuple[Array, ...]:
    """A wide operand may arrive as a *virtual concat* — a tuple of narrow
    column pieces (the backbone's dense-concat stacks, models/backbone.py).
    Keeping the pieces unmaterialized kills the O(L²) concat writes and
    lets autodiff save each layer output ONCE instead of once per stack
    copy; the GEMM below decomposes over kernel row-slices exactly."""
    return tuple(x) if isinstance(x, (tuple, list)) else (x,)


def _width(x) -> int:
    return sum(p.shape[-1] for p in _as_pieces(x))


def _merged_gemm(x, *kernels: Array) -> list[Array]:
    """One (virtual) GEMM x @ [k0 ‖ k1 ‖ …] reading ``x`` once; returns the
    column blocks (f32-accumulated, cast back to x.dtype) in kernel order.
    ``x`` may be a tuple of column pieces: the product is then the sum of
    per-piece GEMMs over the matching kernel row-slices (exact math, f32
    accumulation across pieces)."""
    from hl_hgat_tpu.nn.gemm import stack_gemm

    pieces = _as_pieces(x)
    dtype = pieces[0].dtype
    w = jnp.concatenate(kernels, axis=1) if len(kernels) > 1 else kernels[0]
    z, row = None, 0
    for p in pieces:
        c = p.shape[-1]
        zz = stack_gemm(p, w[row : row + c])
        z = zz if z is None else z + zz
        row += c
    z = z.astype(dtype)
    outs, lo = [], 0
    for k in kernels:
        outs.append(z[..., lo : lo + k.shape[1]])
        lo += k.shape[1]
    return outs


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
    lib/Hodge_Cheb_Conv.py:276-289).  The first Linear's kernel is only
    *declared* here (``first_params``) — the parent runs it inside a merged
    GEMM shared with the sibling head (see module header) and hands the
    post-couple sum back through ``finish``.  Submodule attribute names are
    load-bearing: they reproduce the param paths of the original compact
    formulation (TorchLinear_0 / MaskedBatchNorm_0 / …)."""

    dv: int
    c_cross: int
    c_self: int

    def setup(self):
        self.TorchLinear_0 = _ParamsOnly(self.dv, self.c_cross + self.c_self)
        self.MaskedBatchNorm_0 = MaskedBatchNorm(self.dv)
        self.TorchLinear_1 = TorchLinear(self.dv)
        self.MaskedBatchNorm_1 = MaskedBatchNorm(self.dv)

    def first_params(self) -> tuple[Array, Array]:
        """(kernel [c_cross+c_self, dv], bias [dv]); rows [:c_cross] apply
        to the coupled operand, rows [c_cross:] to the self operand."""
        return self.TorchLinear_0()

    def finish(self, z: Array, mask: Array, deterministic: bool) -> Array:
        x = self.MaskedBatchNorm_0(z, mask, use_running_average=deterministic)
        x = nn.relu(x)
        x = self.TorchLinear_1(x)
        x = self.MaskedBatchNorm_1(x, mask, use_running_average=deterministic)
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

        # x_t / x_s may be virtual concats (tuples of column pieces) — see
        # _as_pieces; all GEMMs below decompose over kernel row-slices.
        c_t, c_s = _width(x_t), _width(x_s)
        if self.only_att:
            act = _sigma(self.sigma)
            dk = self.dk
            kqn, bqn = _ParamsOnly(dk, c_t, name="WQ_Node")()
            kkn, bkn = _ParamsOnly(dk, c_t, name="WK_Node")()
            kqe, bqe = _ParamsOnly(dk, c_s, name="WQ_Edge")()
            kke, bke = _ParamsOnly(dk, c_s, name="WK_Edge")()
            # WQ_E(x_s2t) ≡ couple(x_s @ K_qe) + b_qe etc. — boundary
            # products run at dk channels instead of the stack width; each
            # wide operand is read by ONE merged q/k GEMM (module header),
            # and the pre-couple product x@K_q is shared between the gate's
            # self term and the sibling gate's cross term.
            qn_pre, kn_pre = _merged_gemm(x_t, kqn, kkn)
            qe_pre, ke_pre = _merged_gemm(x_s, kqe, kke)
            q_n = qn_pre + bqn.astype(qn_pre.dtype)
            k_n = kn_pre + bkn.astype(kn_pre.dtype)
            q_e = qe_pre + bqe.astype(qe_pre.dtype)
            k_e = ke_pre + bke.astype(ke_pre.dtype)
            q_e2t = couple_s2t(qe_pre)
            q_e2t = q_e2t + bqe.astype(q_e2t.dtype)
            q_n2s = couple_t2s(qn_pre)
            q_n2s = q_n2s + bqn.astype(q_n2s.dtype)
            scale = 1.0 / jnp.sqrt(jnp.asarray(self.dk, jnp.float32))
            lam = self.lam
            a_t = act(
                (
                    (1.0 - lam)
                    * jnp.sum(q_e2t * k_n, axis=-1, keepdims=True)
                    + lam * jnp.sum(q_n * k_n, axis=-1, keepdims=True)
                )
                * scale
            )
            a_s = act(
                (
                    (1.0 - lam)
                    * jnp.sum(q_n2s * k_e, axis=-1, keepdims=True)
                    + lam * jnp.sum(q_e * k_e, axis=-1, keepdims=True)
                )
                * scale
            )
            return a_t, a_s
        dv = self.dv
        head_n = _ValueHead(dv, c_cross=c_s, c_self=c_t, name="WV_Node")
        head_e = _ValueHead(dv, c_cross=c_t, c_self=c_s, name="WV_Edge")
        wn, bn_b = head_n.first_params()
        we, be_b = head_e.first_params()
        # One merged GEMM per wide operand (module header): x_t feeds the
        # node head's self slice AND the edge head's cross slice; x_s the
        # converse.
        zt_self, zt_cross = _merged_gemm(x_t, wn[c_s:], we[:c_t])
        zs_self, zs_cross = _merged_gemm(x_s, we[c_t:], wn[:c_s])
        z_node = couple_s2t(zs_cross) + zt_self + bn_b.astype(zt_self.dtype)
        z_edge = couple_t2s(zt_cross) + zs_self + be_b.astype(zs_self.dtype)
        x_t1 = head_n.finish(z_node, level.node_mask, deterministic)
        x_s1 = head_e.finish(z_edge, level.edge_mask, deterministic)
        return x_t1, x_s1


# The reference ships the same module twice under two names
# (lib/Hodge_Cheb_Conv.py:61 `MSI`, :255 `NodeEdgeInt`).
MSI = NodeEdgeInt
