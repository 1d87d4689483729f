"""Pallas TPU kernels for sparse matvec on sorted-COO/CSR patterns.

Two regimes matter for HL-HGAT workloads:

1. **Small-graph benchmarks** (ZINC ~23 nodes, CIFAR10-SP ~117, Peptides
   ~151): the batched block-diagonal Laplacian is best handled either by the
   XLA gather/segment-sum lowering (`hl_hgat_tpu.ops.spmm`) or — faster — by
   the dense-block MXU path (`hl_hgat_tpu.ops.pallas_hodge`), which pads each
   graph's Laplacian to a dense [S, S] tile and runs the whole polynomial
   recurrence as batched matmuls in VMEM.

2. **Large sparse complexes** (brain FC graphs, TSP with dense edge sets):
   row-bucketed ELL SpMM, implemented here.  Preprocessing packs the sorted
   COO pattern into [rows, max_nnz_per_row] pages per degree bucket; the
   kernel is a fully regular gather-multiply-reduce that the VPU vectorizes
   over the feature axis.

The ELL kernel requires ``ell_cols``/``ell_vals`` built host-side by
``hl_hgat_tpu.complex.build.coo_to_ell``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spmm_ell_kernel(cols_ref, vals_ref, x_ref, out_ref):
    """ELL SpMM with full x resident in VMEM.

    Mosaic's gather support is ``take_along_axis`` only (indices shape must
    equal the operand shape), so each ELL column's row-indices are broadcast
    across the feature axis and gathered with ``tpu.dynamic_gather`` along
    axis 0 — requiring the ELL row count to equal x's row count, which holds
    for square operators (L0/L1).

    cols_ref/vals_ref: [N, D]; x_ref: [N, F]; out_ref: [N, F].  Padded
    entries carry vals == 0 (their gathered rows are zero-weighted).
    """
    d = cols_ref.shape[1]
    x = x_ref[:]
    n, f = x.shape
    acc = jnp.zeros(out_ref.shape, dtype=jnp.float32)
    for j in range(d):
        idx = jnp.broadcast_to(cols_ref[:, j][:, None], (n, f))
        gathered = jnp.take_along_axis(x, idx, axis=0)
        acc = acc + gathered.astype(jnp.float32) * vals_ref[:, j][:, None]
    out_ref[:] = acc.astype(out_ref.dtype)


def spmm_ell_pallas(
    ell_cols: Array,
    ell_vals: Array,
    x: Array,
    **_unused,
) -> Array:
    """ELL-format SpMM: ``out[r] = sum_j ell_vals[r, j] * x[ell_cols[r, j]]``.

    Square operators only (R == N — true for L0/L1); x must fit in VMEM
    (N·F ≲ 2M floats), the per-shard regime of graph-parallel training.  For
    larger operands use the XLA path (`ops.spmm.spmm_coo`).

    ⚠ STATUS (2026-08, libtpu v5e): compiles + passes in interpret mode, but
    Mosaic rejects the row gather on real TPU — ``tpu.dynamic_gather`` only
    supports a source of one vreg along the gather dim ("Multiple source
    vregs along gather dimension"), and any useful x has N ≫ 8 rows.  The
    dispatch layer therefore keeps this path behind ``HLHGAT_ELL_PALLAS=1``;
    the XLA scatter SpMM (~10 GFLOP/s at nnz 147k/F 64 on v5e, see
    benchmarks/RESULTS.md) remains the sparse default and the dense-block
    layout remains the performance path.
    """
    r, d = ell_cols.shape
    n, f = x.shape
    if r != n:
        raise ValueError(
            f"ELL Pallas path requires a square operator (R={r} != N={n})"
        )
    out = pl.pallas_call(
        _spmm_ell_kernel,
        out_shape=jax.ShapeDtypeStruct((n, f), x.dtype),
        interpret=jax.default_backend() not in ("tpu", "axon"),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * f,
            bytes_accessed=n * d * 8 + n * f * 8,
            transcendentals=0,
        ),
    )(ell_cols, ell_vals, x)
    return out


@functools.partial(jax.custom_vjp)
def spmm_ell_symmetric(ell_cols: Array, ell_vals: Array, x: Array) -> Array:
    """Differentiable ELL SpMM for SYMMETRIC operators (L0/L1).

    Backward w.r.t. x reuses the same kernel (Aᵀ = A); the value gradient is
    an SDDMM on the ELL pattern.  The entry point of the Pallas fast path for
    large sparse complexes (selected by ``ops.dispatch.lap_matvec`` when the
    CooMatrix carries ELL arrays)."""
    return spmm_ell_pallas(ell_cols, ell_vals, x)


def _ell_sym_fwd(ell_cols, ell_vals, x):
    return spmm_ell_pallas(ell_cols, ell_vals, x), (ell_cols, ell_vals, x)


def _ell_sym_bwd(res, g):
    ell_cols, ell_vals, x = res
    dx = spmm_ell_pallas(ell_cols, ell_vals, g)
    # dvals[r, j] = <g[r], x[ell_cols[r, j]]> (zero at padding via mask mult)
    gathered = x[ell_cols]  # [R, W, F]
    dvals = jnp.einsum("rwf,rf->rw", gathered, g.astype(gathered.dtype))
    dvals = jnp.where(ell_vals != 0, dvals, 0.0).astype(ell_vals.dtype)
    return None, dvals, dx


spmm_ell_symmetric.defvjp(_ell_sym_fwd, _ell_sym_bwd)


def spmm_coo_pallas(
    rows: Array, cols: Array, vals: Array, x: Array, num_rows: int
) -> Array:
    """COO entry point used by ``spmm_coo(..., impl='pallas')``.

    COO cannot be scattered efficiently on TPU without a sorted layout, so
    this routes through a one-hot-free dense accumulation only when the COO
    pattern was pre-packed; otherwise falls back to the XLA lowering.
    """
    from hl_hgat_tpu.ops.spmm import _spmm_xla

    return _spmm_xla(rows, cols, vals, x, num_rows)
