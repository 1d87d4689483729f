"""COO SpMM / SDDMM — the TPU-native replacement for torch-sparse / cuSPARSE.

In the reference every spectral-filter step is one cuSPARSE SpMM launched via
PyG message passing (reference lib/Hodge_Cheb_Conv.py:494,502,518-519) or
``torch.sparse.mm`` (reference lib/Hodge_Cheb_Conv.py:100-101, fused variant
HL-HGAT-DEMO/lib/Hodge_Cheb_Conv.py:577-578).  Here the same contraction is a
gather → scale → segment-sum pipeline with static shapes, which XLA fuses into
a single gather/scatter kernel, plus an optional Pallas row-bucketed kernel
(`hl_hgat_tpu.ops.pallas_spmm`) for speed-of-light on large rows.

Shapes are static everywhere: nnz arrays are padded, padded entries must have
``vals == 0`` (rows/cols then point anywhere in range; zero values make them
no-ops under the sum).

Gradients are custom — backward of ``A @ X`` is
  dX    = A^T @ G        (another SpMM on the transposed pattern)
  dvals = <G[row], X[col]>  (an SDDMM on the same pattern)
so fwd+bwd never leaves the sparse kernel layer.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

Array = jax.Array

Impl = Literal["auto", "xla", "pallas"]

# Minimum row count at which the Pallas gather kernel wins over the XLA
# scatter lowering (empirically tuned on v5e; see benchmarks/).
_PALLAS_MIN_ROWS = 1024


def _spmm_xla(rows: Array, cols: Array, vals: Array, x: Array, num_rows: int) -> Array:
    gathered = x[cols] * vals[:, None].astype(x.dtype)
    acc = gathered.astype(jnp.float32)
    out = jax.ops.segment_sum(acc, rows, num_segments=num_rows)
    return out.astype(x.dtype)


def _sddmm_xla(rows: Array, cols: Array, a: Array, b: Array) -> Array:
    return jnp.sum(
        a[rows].astype(jnp.float32) * b[cols].astype(jnp.float32), axis=-1
    ).astype(a.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def spmm_coo(
    rows: Array,
    cols: Array,
    vals: Array,
    x: Array,
    num_rows: int,
    impl: Impl = "auto",
) -> Array:
    """``out[r] = sum_nnz vals[i] * x[cols[i]]`` for ``rows[i] == r``.

    rows/cols: [nnz] int32 (padding entries: vals == 0); vals: [nnz] float;
    x: [num_cols, F].  Returns [num_rows, F].
    """
    return _spmm_impl(rows, cols, vals, x, num_rows, impl)


def _spmm_impl(rows, cols, vals, x, num_rows, impl):
    if impl == "pallas" or (impl == "auto" and _use_pallas(num_rows, x)):
        from hl_hgat_tpu.ops.pallas_spmm import spmm_coo_pallas

        return spmm_coo_pallas(rows, cols, vals, x, num_rows)
    return _spmm_xla(rows, cols, vals, x, num_rows)


def _use_pallas(num_rows: int, x: Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    feat = x.shape[-1] if x.ndim > 1 else 1
    return num_rows >= _PALLAS_MIN_ROWS and feat >= 8


def _spmm_fwd(rows, cols, vals, x, num_rows, impl):
    out = _spmm_impl(rows, cols, vals, x, num_rows, impl)
    return out, (rows, cols, vals, x)


def _spmm_bwd(num_rows, impl, residuals, g):
    rows, cols, vals, x = residuals
    num_cols = x.shape[0]
    # dX = A^T G: swap the roles of rows and cols on the same value list.
    dx = _spmm_impl(cols, rows, vals, g, num_cols, impl)
    dvals = _sddmm_xla(rows, cols, g, x)
    return None, None, dvals, dx


spmm_coo.defvjp(_spmm_fwd, _spmm_bwd)


@jax.custom_vjp
def spmm_ell_sym(ell_cols: Array, ell_vals: Array, x: Array) -> Array:
    """``out[r] = sum_w ell_vals[r, w] * x[ell_cols[r, w]]`` for a SYMMETRIC
    operator in ELL [rows, width] form (padding slots carry vals == 0).

    TPU-first COO alternative: a row gather is a vectorizable dense load
    pattern, where the COO path's segment-sum lowers to serialized scatters.
    Molecular/superpixel Laplacians have tiny max degree, so width stays
    small and the gather reads ~width·N rows instead of scattering nnz
    updates.  Symmetry makes the VJP the SAME gather (dx = A g), so the
    backward pass never scatters either.
    """
    return _ell_apply(ell_cols, ell_vals, x)


def _ell_apply(ell_cols, ell_vals, x):
    gathered = x[ell_cols]  # [rows, width, F...]
    vals = ell_vals.reshape(ell_vals.shape + (1,) * (x.ndim - 1))
    return (
        (gathered.astype(jnp.float32) * vals.astype(jnp.float32)).sum(axis=1)
    ).astype(x.dtype)


def _ell_fwd(ell_cols, ell_vals, x):
    return _ell_apply(ell_cols, ell_vals, x), (ell_cols, ell_vals, x)


def _ell_bwd(res, g):
    ell_cols, ell_vals, x = res
    dx = _ell_apply(ell_cols, ell_vals, g)  # Aᵀ = A
    # dvals[r, w] = <g[r], x[cols[r, w]]>
    dvals = jnp.sum(
        g[:, None].astype(jnp.float32) * x[ell_cols].astype(jnp.float32),
        axis=tuple(range(2, x.ndim + 1)),
    ).astype(ell_vals.dtype)
    return None, dvals, dx


spmm_ell_sym.defvjp(_ell_fwd, _ell_bwd)


def sddmm_coo(rows: Array, cols: Array, a: Array, b: Array) -> Array:
    """Sampled dense-dense matmul: ``out[i] = <a[rows[i]], b[cols[i]]>``.

    The gradient kernel of SpMM w.r.t. the sparse values, also usable for
    computing attention logits on a sparse pattern.  a: [N, F], b: [M, F],
    returns [nnz].
    """
    return _sddmm_xla(rows, cols, a, b)


def coo_transpose(rows: Array, cols: Array, vals: Array) -> tuple[Array, Array, Array]:
    """Transpose a COO pattern (no resorting needed — SpMM is order-free)."""
    return cols, rows, vals


def spmm_dense_oracle(
    rows: Array, cols: Array, vals: Array, x: Array, num_rows: int
) -> Array:
    """Dense reference implementation for unit tests: materialize A, matmul."""
    dense = jnp.zeros((num_rows, x.shape[0]), dtype=jnp.float32)
    dense = dense.at[rows, cols].add(vals.astype(jnp.float32))
    return (dense @ x.astype(jnp.float32)).astype(x.dtype)
