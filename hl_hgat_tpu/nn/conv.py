"""Spectral polynomial filters over Hodge Laplacians.

One conv primitive serves both simplex orders: filter node features with L0
or edge features with L1 (the reference instantiates the same class for both,
reference lib/Hodge_Cheb_Conv.py:452-523).

Recurrences (matching the canonical main-lib semantics — the DEMO fast-conv
K>2 deviation at HL-HGAT-DEMO/lib/Hodge_Cheb_Conv.py:561 is deliberately NOT
reproduced; SURVEY.md §2.4):

  Laguerre:   T0 = x,  T1 = x − Lx,
              T_{k+1} = (−L·T_k + (2k+1)·T_k − k·T_{k−1}) / (k+1)
              (reference lib/Hodge_Cheb_Conv.py:494,507)
  Chebyshev:  T0 = x,  T1 = Lx,  T_{k+1} = 2·L·T_k − T_{k−1}
              (reference lib/Hodge_Cheb_Conv.py:412,432)

Output: sum_k T_k @ W_k + b.  TPU-first: the K per-term GEMMs are fused into
ONE MXU matmul by concatenating the polynomial terms along the feature axis
([N, K·C] @ [K·C, F]), and each L application is one SpMM.  Weights are
bias-free Glorot per term like the PyG ``Linear(weight_initializer='glorot')``
stack (reference lib/Hodge_Cheb_Conv.py:462-465), held as a single [K, C, F]
tensor.

3-D inputs [N, T, C] (fMRI time axis) flatten the trailing axes for the SpMM
exactly like the reference's view/reshape dance (reference
lib/Hodge_Cheb_Conv.py:493-505).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.complex.batch import CooMatrix
from hl_hgat_tpu.ops.dispatch import lap_matvec as _dispatch_matvec

Array = jnp.ndarray

glorot_per_term = nn.initializers.variance_scaling(
    scale=1.0, mode="fan_avg", distribution="uniform", in_axis=-2, out_axis=-1,
    batch_axis=(0,),
)


import os

_fused_dense_flag = os.environ.get("HLHGAT_FUSED_DENSE", "0") == "1"
_terms_kernel_flag = os.environ.get("HLHGAT_TERMS_KERNEL", "0") == "1"
_adjoint_conv_flag = os.environ.get("HLHGAT_ADJOINT_CONV", "0") == "1"


def use_adjoint_conv(enable: bool | None = None) -> bool:
    """Get/set the symmetric-adjoint backward for the polynomial convs.

    The Laplacians are symmetric, so p_k(L)ᵀ = p_k(L) and the weight/input
    gradients can be written without the forward's polynomial terms:

        dW_k = T_kᵀ g = (p_k(L) x)ᵀ g = xᵀ (p_k(L) g) = xᵀ h_k
        dx   = Σ_k p_k(L) (g W_kᵀ)     = Σ_k h_k W_kᵀ

    where h_k = p_k(L) g is the SAME recurrence run on the output cotangent.
    Standard autodiff already runs K−1 adjoint mat-vecs through the linear
    recurrence AND saves T_1..T_{K−1} as residuals for dW_k; this formulation
    does the same K−1 mat-vecs (on g) but saves only x — identical FLOPs,
    and (K−1)·N·C of saved-activation HBM residency per conv disappears.
    Exact math: gradients match the autodiff path to float reordering
    (tests/test_conv_adjoint.py).

    **Measured on the flagship step (v5e, packed bf16, benchmarks/
    RESULTS.md): default OFF.**  The residency cut does not translate into
    throughput — batch 320: 1.720M vs 1.769M edges/s; 448: 1.746M vs
    1.759M; 768: 1.331M vs 1.458M.  XLA's own backward fuses the dW GEMMs
    with the adjoint recurrence streams, while the custom VJP re-reads x
    per term and materializes every h_k between kernels; on a memory-bound
    step those extra streams cost more than the saved residuals.  The same
    lesson as the three Pallas conv kernels: at these block counts the XLA
    autodiff pipeline is the fastest implementation available.  The path
    stays fully tested as the memory-lever option for workloads whose
    activations genuinely do not fit (enable via HLHGAT_ADJOINT_CONV=1 or
    this setter).
    """
    global _adjoint_conv_flag
    if enable is not None:
        _adjoint_conv_flag = enable
    return _adjoint_conv_flag


def use_terms_kernel(enable: bool | None = None) -> bool:
    """Get/set whether dense-block polynomial terms are produced by the
    VMEM-resident Pallas recurrence kernel
    (`ops/pallas_hodge.laguerre_terms_dense`) instead of K separate XLA
    mat-vecs.  The output GEMMs stay in XLA either way (terms remain
    materialized, so the saved-terms backward is preserved)."""
    global _terms_kernel_flag
    if enable is not None:
        _terms_kernel_flag = enable
    return _terms_kernel_flag


def use_fused_dense(enable: bool | None = None) -> bool:
    """Get/set whether dense-block Laguerre convs route through the fused
    Pallas kernel (`hl_hgat_tpu.ops.pallas_hodge`).  Also settable via the
    ``HLHGAT_FUSED_DENSE=1`` environment variable."""
    global _fused_dense_flag
    if enable is not None:
        _fused_dense_flag = enable
    return _fused_dense_flag


def _lap_matvec(lap) -> Callable[[Array], Array]:
    """Laplacian application — COO (flat) or dense-block layout
    (`hl_hgat_tpu.ops.dispatch`)."""
    return lambda v: _dispatch_matvec(lap, v)


def polynomial_terms(
    x: Array, lap, k: int, *, kind: str = "laguerre"
) -> list[Array]:
    """The K polynomial features [T_0(L)x, ..., T_{K-1}(L)x].

    ``kind='laguerre_demo'`` reproduces the DEMO fast-conv's K>2 deviation
    (HL-HGAT-DEMO/lib/Hodge_Cheb_Conv.py:561 applies L to the ORIGINAL
    input instead of the previous term, so every step reuses L·x).  The
    shipped ``HL_HGAT_Brain.pt`` checkpoint was trained WITH that
    recurrence at K=4, so running it faithfully requires this mode; it is
    opt-in (``demo_compat``) and the canonical recurrence stays the
    default."""
    matvec = _lap_matvec(lap)
    terms = [x]
    if k > 1:
        lx = matvec(x)
        t1 = x - lx if kind != "chebyshev" else lx
        terms.append(t1)
    if kind == "laguerre":
        j = 1
        for _ in range(2, k):
            t2 = (-matvec(terms[-1]) + (2 * j + 1) * terms[-1] - j * terms[-2]) / (
                j + 1
            )
            j += 1
            terms.append(t2)
    elif kind == "laguerre_demo":
        j = 1
        for _ in range(2, k):
            t2 = (-lx + (2 * j + 1) * terms[-1] - j * terms[-2]) / (j + 1)
            j += 1
            terms.append(t2)
    else:
        for _ in range(2, k):
            terms.append(2.0 * matvec(terms[-1]) - terms[-2])
    return terms


def laguerre_matvec(
    x: Array, lap, weights: Array, bias: Array | None = None,
    *, demo_compat: bool = False,
) -> Array:
    """Functional Laguerre filter: weights [K, C, F], x [N, C] or [N, T, C]."""
    return _apply_poly(
        x, lap, weights, bias,
        kind="laguerre_demo" if demo_compat else "laguerre",
    )


def chebyshev_matvec(
    x: Array, lap, weights: Array, bias: Array | None = None
) -> Array:
    return _apply_poly(x, lap, weights, bias, kind="chebyshev")


_stacked_terms_flag = os.environ.get("HLHGAT_STACKED_TERMS", "0") == "1"


def use_stacked_terms(enable: bool | None = None) -> bool:
    """Get/set the single-GEMM term combine (``HLHGAT_STACKED_TERMS``):
    concatenate the K polynomial terms on the feature axis and run ONE
    [N, K·C] @ [K·C, F] matmul instead of K per-term GEMMs.  Candidate for
    cutting the per-GEMM layout-change fusions the round-2 profile surfaced
    (each GEMM operand gets a {1,2,0}<->{2,1,0} transpose); costs one
    materialized term-stack copy instead."""
    global _stacked_terms_flag
    if enable is not None:
        _stacked_terms_flag = enable
    return _stacked_terms_flag


_emit_barrier_flag = os.environ.get("HLHGAT_CONV_EMIT_BARRIER", "0") == "1"


def use_emit_barrier(enable: bool | None = None) -> bool:
    """Get/set the conv-output materialization barrier
    (``HLHGAT_CONV_EMIT_BARRIER``).  The conv GEMMs accumulate f32 and the
    module rounds to the compute dtype (``out.astype``), but XLA may
    materialize the PRE-convert f32 buffer and re-derive the convert inside
    every consumer — on the bandwidth-bound pooled/banded families that
    doubles the GEMM→BN link traffic (round-5 attpool trace: f32[64,408,C]
    buffers feeding 160 µs multiply_select fusions).  The barrier pins the
    bf16 value as the materialization point, fusing the convert into the
    GEMM epilogue.  Read at trace time."""
    global _emit_barrier_flag
    if enable is not None:
        _emit_barrier_flag = enable
    return _emit_barrier_flag


def emit_cast(out, out_dtype):
    """Round a GEMM output to the compute dtype; under `use_emit_barrier`
    also pin the rounded value as the buffer XLA materializes."""
    out = out.astype(out_dtype)
    if _emit_barrier_flag and out.dtype != jnp.float32:
        out = jax.lax.optimization_barrier(out)
    return out


def _combine_terms(terms, weights, bias, out_dtype):
    """sum_k T_k @ W_k (+ b) with a shared f32 accumulator.

    Default: per-term GEMMs — the row count is huge (every simplex in the
    batch), so K separate [N, C]@[C, F] matmuls run the MXU exactly as well
    as one [N, K·C] one without materializing the concatenated term stack.
    `use_stacked_terms` switches to the one-GEMM form (see its docstring)."""
    if use_stacked_terms() and len(terms) > 1:
        k, c, f = weights.shape
        stack = jnp.concatenate(terms, axis=-1)
        out = jnp.einsum(
            "...c,cf->...f", stack,
            weights.reshape(k * c, f).astype(stack.dtype),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return emit_cast(out, out_dtype)
    from hl_hgat_tpu.nn.gemm import stack_gemm

    out = None
    for kk, t in enumerate(terms):
        part = stack_gemm(t, weights[kk])
        out = part if out is None else out + part
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return emit_cast(out, out_dtype)


def _zero_cotangent(leaf):
    """Structural zero cotangent (float0 for integer/bool leaves)."""
    if isinstance(leaf, (jnp.ndarray, np.ndarray)) or hasattr(leaf, "dtype"):
        if jnp.issubdtype(leaf.dtype, jnp.inexact):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, jax.dtypes.float0)
    return None


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _poly_adjoint(x, lap, weights, bias, kind):
    """Polynomial filter with the symmetric-adjoint backward
    (`use_adjoint_conv`): forward numerics identical to the default path,
    backward recomputes h_k = p_k(L)·g from the cotangent instead of reading
    saved terms.  The operator cotangent is structurally zero (operators are
    data — nothing in the framework differentiates w.r.t. L)."""
    terms = polynomial_terms(x, lap, weights.shape[0], kind=kind)
    return _combine_terms(terms, weights, bias, x.dtype)


def _poly_adjoint_fwd(x, lap, weights, bias, kind):
    out = _poly_adjoint(x, lap, weights, bias, kind)
    return out, (x, lap, weights, bias)


def _poly_adjoint_bwd(kind, res, g):
    x, lap, weights, bias = res
    k = weights.shape[0]
    # h_k = p_k(L) g — the forward recurrence applied to the cotangent
    # (legal because L is symmetric, hence p_k(L)ᵀ = p_k(L)).
    h = polynomial_terms(g, lap, k, kind=kind)
    # dW_k = xᵀ h_k, contracting every leading axis; f32 accumulation.
    dw = jnp.stack(
        [
            jnp.einsum(
                "...c,...f->cf", x, hk, preferred_element_type=jnp.float32
            )
            for hk in h
        ]
    ).astype(weights.dtype)
    dx = None
    for kk, hk in enumerate(h):
        part = jnp.einsum(
            "...f,cf->...c", hk, weights[kk].astype(hk.dtype),
            preferred_element_type=jnp.float32,
        )
        dx = part if dx is None else dx + part
    dx = dx.astype(x.dtype)
    db = (
        None
        if bias is None
        else g.astype(jnp.float32)
        .sum(axis=tuple(range(g.ndim - 1)))
        .astype(bias.dtype)
    )
    dlap = jax.tree.map(_zero_cotangent, lap)
    return dx, dlap, dw, db


_poly_adjoint.defvjp(_poly_adjoint_fwd, _poly_adjoint_bwd)


def _adjoint_applicable(lap) -> bool:
    """The adjoint backward requires a symmetric operator: dense [G, S, S]
    blocks are L0/L1 by construction; COO operators carry a flag.  Halo
    shards keep the standard autodiff path (their SpMM has its own
    shard_map machinery)."""
    if isinstance(lap, CooMatrix):
        return bool(lap.symmetric)
    return getattr(lap, "ndim", 0) == 3


def _apply_poly(x, lap, weights, bias, *, kind):
    k = weights.shape[0]
    if (
        kind == "laguerre"
        and use_fused_dense()
        and not isinstance(lap, CooMatrix)
        and getattr(lap, "ndim", 0) == 3
        and x.ndim == 3
    ):
        from hl_hgat_tpu.ops.pallas_hodge import laguerre_dense_fused

        b = bias if bias is not None else jnp.zeros(
            (weights.shape[-1],), weights.dtype
        )
        return laguerre_dense_fused(lap, x, weights, b)
    if (
        kind == "laguerre"
        and use_terms_kernel()
        and not isinstance(lap, CooMatrix)
        and getattr(lap, "ndim", 0) == 3
        and x.ndim == 3
        and k > 1
    ):
        from hl_hgat_tpu.ops.pallas_hodge import laguerre_terms_dense

        t = laguerre_terms_dense(lap, x, k)
        terms = [t[kk] for kk in range(k)]
        return _combine_terms(terms, weights, bias, x.dtype)
    if k > 1 and use_adjoint_conv() and _adjoint_applicable(lap):
        return _poly_adjoint(x, lap, weights, bias, kind)
    terms = polynomial_terms(x, lap, k, kind=kind)
    return _combine_terms(terms, weights, bias, x.dtype)


class LaguerreConv(nn.Module):
    """K-term Laguerre spectral conv (reference HodgeLaguerreConv).

    ``demo_compat`` opts into the DEMO fast-conv K>2 recurrence deviation
    (see :func:`polynomial_terms`) — required to run the shipped pretrained
    brain checkpoint bit-faithfully."""

    features: int
    k: int
    use_bias: bool = True
    demo_compat: bool = False

    @nn.compact
    def __call__(self, x: Array, lap, *, just_params: bool = False):
        c_in = x.shape[-1]
        w = self.param("weights", glorot_per_term, (self.k, c_in, self.features))
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if just_params:
            # parameter tap for the merged node/edge pair execution
            # (nn/blocks.py merged_conv_pair): params are created in THIS
            # scope — the tree is identical to the unmerged path — while the
            # caller runs the recurrence + GEMM on the concatenated blocks
            return w, b
        return laguerre_matvec(x, lap, w, b, demo_compat=self.demo_compat)


class ChebConv(nn.Module):
    """K-term Chebyshev spectral conv (reference HodgeChebConv; shipped for
    capability parity — no reference model instantiates it)."""

    features: int
    k: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, lap) -> Array:
        c_in = x.shape[-1]
        w = self.param("weights", glorot_per_term, (self.k, c_in, self.features))
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return chebyshev_matvec(x, lap, w, b)
