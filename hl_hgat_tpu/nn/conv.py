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

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

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
    """The K polynomial features [T_0(L)x, ..., T_{K-1}(L)x]."""
    matvec = _lap_matvec(lap)
    terms = [x]
    if k > 1:
        t1 = x - matvec(x) if kind == "laguerre" else matvec(x)
        terms.append(t1)
    if kind == "laguerre":
        j = 1
        for _ in range(2, k):
            t2 = (-matvec(terms[-1]) + (2 * j + 1) * terms[-1] - j * terms[-2]) / (
                j + 1
            )
            j += 1
            terms.append(t2)
    else:
        for _ in range(2, k):
            terms.append(2.0 * matvec(terms[-1]) - terms[-2])
    return terms


def laguerre_matvec(
    x: Array, lap, weights: Array, bias: Array | None = None
) -> Array:
    """Functional Laguerre filter: weights [K, C, F], x [N, C] or [N, T, C]."""
    return _apply_poly(x, lap, weights, bias, kind="laguerre")


def chebyshev_matvec(
    x: Array, lap, weights: Array, bias: Array | None = None
) -> Array:
    return _apply_poly(x, lap, weights, bias, kind="chebyshev")


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
    else:
        terms = polynomial_terms(x, lap, k, kind=kind)
    # Per-term GEMMs with a shared f32 accumulator.  The row count is huge
    # (every simplex in the batch), so K separate [N, C]@[C, F] matmuls run
    # the MXU exactly as well as one [N, K·C] one — but skip materializing
    # the concatenated term stack in HBM (a full extra copy per conv; the
    # step is memory-bound, benchmarks/RESULTS.md).
    out = None
    for kk, t in enumerate(terms):
        part = jnp.einsum(
            "...c,cf->...f", t, weights[kk].astype(t.dtype),
            preferred_element_type=jnp.float32,
        )
        out = part if out is None else out + part
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


class LaguerreConv(nn.Module):
    """K-term Laguerre spectral conv (reference HodgeLaguerreConv)."""

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
        return laguerre_matvec(x, lap, w, b)


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
