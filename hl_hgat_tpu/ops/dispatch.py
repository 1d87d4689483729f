"""Layout-polymorphic graph primitives.

Every model op exists in two layouts sharing one call site:

* **COO / flat** (`ComplexLevel`): gathers + segment sums — the general
  representation, required for huge complexes and graph-axis sharding;
* **dense-block** (`DenseLevel`): batched dense matmuls on [G, S, *] tiles —
  the MXU fast path for small-graph benchmarks.

Modules call these functions and never branch themselves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hl_hgat_tpu.complex.batch import ComplexLevel, CooMatrix, PoolMap
from hl_hgat_tpu.complex.dense import BlockDiagMatrix, DenseLevel, DensePool
from hl_hgat_tpu.ops import boundary as B
from hl_hgat_tpu.ops.segment import segment_mean
from hl_hgat_tpu.ops.spmm import spmm_coo

Array = jax.Array


def _bmm(a: Array, b: Array) -> Array:
    if a.shape[0] == 1 and b.shape[0] != 1:
        # shared-operator layout (collate_dense_shared): ONE [S, S]
        # operator broadcast over all graphs — XLA lowers this to a single
        # [S, S] @ [S, G·C] GEMM instead of G small batched matmuls
        return jnp.einsum(
            "ij,gj...->gi...", a[0], b, preferred_element_type=jnp.float32
        ).astype(b.dtype)
    return jnp.einsum(
        "gij,gj...->gi...", a, b, preferred_element_type=jnp.float32
    ).astype(b.dtype)


def _shift_blocks(x: Array, k: int) -> Array:
    """out[g] = x[g+k], zero-padded at the ends (block axis 0)."""
    zero = jnp.zeros_like(x[:1])
    if k == 1:
        return jnp.concatenate([x[1:], zero], axis=0)
    return jnp.concatenate([zero, x[:-1]], axis=0)


def _band_add(y: Array, bu, bd, x: Array,
              *, transpose: bool = False, absolute: bool = False) -> Array:
    """y += banded nearest-neighbour coupling (complex/dense.py
    BlockDiagMatrix band_up/band_dn): batched matmuls over block-shifted
    operands — the MXU replacement for the COO spill scatter measured at
    ~60 GB/s on TSP-shaped batches (benchmarks/RESULTS.md round 2).

    Forward (transpose=False): y[g] += U[g] @ x[g+1] + D[g] @ x[g-1].
    Transpose: contributions flow the other way —
    y[g] += U[g-1]ᵀ @ x[g-1] + D[g+1]ᵀ @ x[g+1].
    """
    def prep(m):
        m = jnp.abs(m) if absolute else m
        return m.astype(x.dtype)

    if not transpose:
        if bu is not None:
            y = y + _bmm(prep(bu), _shift_blocks(x, 1))
        if bd is not None:
            y = y + _bmm(prep(bd), _shift_blocks(x, -1))
        return y
    if bu is not None:
        w = jnp.einsum("gse,gsf->gef", prep(bu), x,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y + _shift_blocks(w, -1)
    if bd is not None:
        w = jnp.einsum("gse,gsf->gef", prep(bd), x,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y + _shift_blocks(w, 1)
    return y


def _spill_add(y: Array, spill: CooMatrix | None, x: Array,
               *, transpose: bool = False, absolute: bool = False) -> Array:
    """y += (|S| or S or Sᵀ) @ x over flattened block slots.

    ``x``/``y`` are [G, S, C] dense-block tensors; the spill CooMatrix
    indexes their flattened G·S row space (complex/dense.py collate).

    Round 5: scatter-add DIRECTLY into ``y`` instead of
    ``y + spmm_coo(...)`` — the TSP trace showed each spill add burning
    ~650-730 µs on materializing a [G·S, C] zero buffer, scattering 8.7k
    rows into it, and then a full-tensor add onto y (three extra full
    passes of a ~119 MB tensor per op, ~10 ms of a 59 ms step across the
    52 spill sites).  The direct form gathers the nnz contributions and
    scatters them into y's own buffer; autodiff transposes it to the
    mirror gather/scatter pair (exact same math, f32 accumulation via the
    contribution product)."""
    if spill is None:
        return y
    flat = x.reshape(-1, x.shape[-1])
    rows, cols = (spill.cols, spill.rows) if transpose else (
        spill.rows, spill.cols)
    vals = jnp.abs(spill.vals) if absolute else spill.vals
    contrib = vals.astype(flat.dtype)[:, None] * jnp.take(
        flat, cols, axis=0
    )
    out = y.reshape(-1, y.shape[-1]).at[rows].add(
        contrib.astype(y.dtype), mode="drop"
    )
    return out.reshape(y.shape)


# x (and one temp of the same size) must sit in VMEM alongside the ELL
# arrays; ~2M f32 elements keeps the kernel's working set under ~8 MB.
_ELL_VMEM_ELEMS = 2 * 1024 * 1024


def _ell_fits_vmem(lap: CooMatrix, flat: Array) -> bool:
    n, f = flat.shape
    w = lap.ell_cols.shape[1]
    return n * f <= _ELL_VMEM_ELEMS and n * w <= _ELL_VMEM_ELEMS


def _ell_pallas_enabled() -> bool:
    # Opt-in only: Mosaic (current libtpu) rejects tpu.dynamic_gather when
    # the source spans multiple vregs along the gather dim ("Multiple source
    # vregs along gather dimension"), so the ELL row-gather kernel cannot
    # compile for any real operand size on TPU — measured 2026-08; see
    # benchmarks/spmm_ell.py + benchmarks/RESULTS.md.  Re-enable via env when
    # Mosaic gains multi-vreg gather.
    import os

    return os.environ.get("HLHGAT_ELL_PALLAS", "0") == "1"


def lap_matvec(lap, x: Array) -> Array:
    """L @ x for a CooMatrix (flat [N, ...]), dense blocks [G, S, S], or a
    HaloShard (graph-axis-sharded operator → halo-exchange shard_map SpMM).

    A CooMatrix carrying ELL arrays for a symmetric operator routes through
    the Pallas row-gather kernel on TPU backends when the operand fits the
    kernel's VMEM-resident regime."""
    from hl_hgat_tpu.parallel.graph_parallel import HaloShard, halo_spmm

    if isinstance(lap, HaloShard):
        flat = x.reshape(x.shape[0], -1)
        blocks = flat.reshape(lap.n_parts, lap.c_local, flat.shape[1])
        out = halo_spmm(lap, blocks, lap.mesh)
        return out.reshape((lap.n_parts * lap.n_local,) + x.shape[1:])
    if isinstance(lap, CooMatrix):
        flat = x.reshape(x.shape[0], -1)
        if (
            lap.ell_cols is not None
            and lap.symmetric
            and _ell_fits_vmem(lap, flat)
            and _ell_pallas_enabled()
        ):
            from hl_hgat_tpu.ops.pallas_spmm import spmm_ell_symmetric

            out = spmm_ell_symmetric(lap.ell_cols, lap.ell_vals, flat)
        elif lap.ell_cols is not None and lap.symmetric:
            # XLA ELL gather: row gathers instead of segment-sum scatters
            # (ops/spmm.py spmm_ell_sym; symmetric VJP is scatter-free too)
            from hl_hgat_tpu.ops.spmm import spmm_ell_sym

            out = spmm_ell_sym(lap.ell_cols, lap.ell_vals, flat)
        else:
            out = spmm_coo(lap.rows, lap.cols, lap.vals, flat, lap.shape[0])
        return out.reshape(x.shape)
    if isinstance(lap, BlockDiagMatrix):
        # large-graph dense path: batched within-block matmul + banded
        # nearest-neighbour matmuls + COO spill for far entries
        out = _bmm(lap.blocks, x)
        out = _band_add(out, getattr(lap, "band_up", None),
                        getattr(lap, "band_dn", None), x)
        return _spill_add(out, lap.spill, x)
    return _bmm(lap, x)


def abs_b1_s2t(level, x_s: Array) -> Array:
    """|B1| @ x_s (node gathers incident edges)."""
    if isinstance(level, ComplexLevel):
        return B.boundary_abs_s2t(
            x_s, level.src, level.dst, level.num_nodes,
            edge_mask=level.edge_mask,
        )
    out = _bmm(jnp.abs(level.b1), x_s)
    out = _band_add(out, getattr(level, "b1_bu", None),
                    getattr(level, "b1_bd", None), x_s, absolute=True)
    return _spill_add(out, level.b1_sp, x_s, absolute=True)


def _t2s_mm(b1: Array, x_t: Array) -> Array:
    """B1ᵀ-style contraction, broadcast-aware for the shared layout."""
    if b1.shape[0] == 1 and x_t.shape[0] != 1:
        return jnp.einsum(
            "se,gsf->gef", b1[0], x_t, preferred_element_type=jnp.float32
        ).astype(x_t.dtype)
    return jnp.einsum(
        "gse,gsf->gef", b1, x_t, preferred_element_type=jnp.float32
    ).astype(x_t.dtype)


def abs_b1_t2s(level, x_t: Array) -> Array:
    """|B1|ᵀ @ x_t (edge sums endpoints)."""
    if isinstance(level, ComplexLevel):
        return B.boundary_abs_t2s(
            x_t, level.src, level.dst, edge_mask=level.edge_mask
        )
    out = _t2s_mm(jnp.abs(level.b1), x_t)
    out = _band_add(out, getattr(level, "b1_bu", None),
                    getattr(level, "b1_bd", None), x_t,
                    transpose=True, absolute=True)
    return _spill_add(out, level.b1_sp, x_t, transpose=True, absolute=True)


def b1_t2s(level, x_t: Array) -> Array:
    """B1ᵀ @ x_t (signed endpoint difference)."""
    if isinstance(level, ComplexLevel):
        return B.boundary_t2s(
            x_t, level.src, level.dst, edge_mask=level.edge_mask
        )
    out = _t2s_mm(level.b1, x_t)
    out = _band_add(out, getattr(level, "b1_bu", None),
                    getattr(level, "b1_bd", None), x_t, transpose=True)
    return _spill_add(out, level.b1_sp, x_t, transpose=True)


# Scatter readouts measured ~10x below stream bandwidth on the packed
# layout (99 us per 4.7 MB segment-sum; benchmarks/RESULTS.md round-2
# profile); the one-hot matmul form wins whenever its [G, rows] matrix
# stays modest.  Budget is expressed in BYTES of the persistent one-hot
# operands: the step-invariant matrix is hoisted out of the scanned train
# loop, so its f32 copy (4 B/elem) plus the bf16 compute copy (2 B/elem)
# stay resident in HBM for the whole run — 6 B/elem, capped at 48 MB
# (= 8M elements, e.g. 320 graphs x 25k rows).  Kill switch:
# HLHGAT_MATMUL_READOUT=0.
_MATMUL_READOUT_MAX_BYTES = 48 * 1024 * 1024
_MATMUL_READOUT_BYTES_PER_ELEM = 6


def _matmul_readout_ok(rows: int, num_segments: int) -> bool:
    import os

    if os.environ.get("HLHGAT_MATMUL_READOUT", "1") != "1":
        return False
    return (rows * num_segments * _MATMUL_READOUT_BYTES_PER_ELEM
            <= _MATMUL_READOUT_MAX_BYTES)


def _packed_mean(x, gid, mask, num_graphs):
    flat = x.reshape(-1, x.shape[-1])
    gid = gid.reshape(-1)
    w = mask.reshape(-1)
    if _matmul_readout_ok(flat.shape[0], num_graphs):
        from hl_hgat_tpu.ops.segment import segment_mean_onehot

        return segment_mean_onehot(flat, gid, num_graphs, weights=w)
    return segment_mean(flat, gid, num_graphs, weights=w)


def masked_mean_nodes(level, x: Array, num_graphs: int) -> Array:
    """Per-graph mean over valid nodes → [G, F]."""
    if isinstance(level, ComplexLevel):
        return segment_mean(x, level.n_id, num_graphs, weights=level.node_mask)
    if level.n_gid is not None:
        # packed superblocks: rows of one tile belong to several graphs
        return _packed_mean(x, level.n_gid, level.node_mask, num_graphs)
    m = level.node_mask[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0
    )


def masked_mean_edges(level, x: Array, num_graphs: int) -> Array:
    if isinstance(level, ComplexLevel):
        return segment_mean(x, level.s_id, num_graphs, weights=level.edge_mask)
    if level.s_gid is not None:
        return _packed_mean(x, level.s_gid, level.edge_mask, num_graphs)
    m = level.edge_mask[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def pool_to_coarse(pool, fine, coarse, x_t: Array, x_s: Array):
    """scatter-mean features into the coarse level (either layout)."""
    if isinstance(pool, PoolMap):
        x_t_c = segment_mean(
            x_t, pool.pos_t, coarse.num_nodes, weights=fine.node_mask
        )
        x_s_c = segment_mean(
            x_s, pool.pos_s, coarse.num_edges, weights=fine.edge_mask
        )
        x_t_c = x_t_c * coarse.node_mask[:, None].astype(x_t_c.dtype)
        x_s_c = x_s_c * coarse.edge_mask[:, None].astype(x_s_c.dtype)
        return x_t_c, x_s_c
    assert isinstance(pool, DensePool)
    x_t_c = _spill_add(_bmm(pool.p_t, x_t), pool.p_t_sp, x_t)
    x_s_c = _spill_add(_bmm(pool.p_s, x_s), pool.p_s_sp, x_s)
    x_t_c = x_t_c * coarse.node_mask[..., None]
    x_s_c = x_s_c * coarse.edge_mask[..., None]
    return x_t_c, x_s_c


def cast_operators(batch, dtype):
    """Cast the operator tensors (L0/L1/B1, pool matrices, COO values) to the
    compute dtype.

    With bf16 activations but f32 operators, XLA upcasts the bf16 operand and
    every Laplacian mat-vec runs at the f32 MXU rate; casting the operators
    keeps the matvecs on the native bf16×bf16(+f32 accumulate) path — 2× MXU
    rate and half the HBM traffic on the L tiles, which are the largest
    arrays in a dense-layout batch.  Masks, degrees and segment ids stay f32/
    int32 (they feed divisions and segment ops, not matmuls).
    """
    import dataclasses

    dtype = jnp.dtype(dtype)
    if dtype == jnp.float32:
        return batch

    def cast_coo(m):
        if not isinstance(m, CooMatrix):
            return m  # HaloShard etc. manage their own dtypes
        return dataclasses.replace(
            m,
            vals=m.vals.astype(dtype),
            ell_vals=None if m.ell_vals is None
            else m.ell_vals.astype(dtype),
        )

    def cast_band(b):
        return None if b is None else b.astype(dtype)

    def cast_op(m):
        if isinstance(m, BlockDiagMatrix):
            return dataclasses.replace(
                m, blocks=m.blocks.astype(dtype), spill=cast_coo(m.spill),
                band_up=cast_band(getattr(m, "band_up", None)),
                band_dn=cast_band(getattr(m, "band_dn", None)),
            )
        return m.astype(dtype)

    def cast_level(lvl):
        if isinstance(lvl, ComplexLevel):
            return dataclasses.replace(lvl, l0=cast_coo(lvl.l0),
                                       l1=cast_coo(lvl.l1))
        if isinstance(lvl, DenseLevel):
            return dataclasses.replace(
                lvl, l0=cast_op(lvl.l0), l1=cast_op(lvl.l1),
                b1=lvl.b1.astype(dtype),
                b1_sp=None if lvl.b1_sp is None else cast_coo(lvl.b1_sp),
                b1_bu=cast_band(getattr(lvl, "b1_bu", None)),
                b1_bd=cast_band(getattr(lvl, "b1_bd", None)),
            )
        return lvl

    def cast_pool(p):
        if isinstance(p, DensePool):
            return dataclasses.replace(
                p, p_t=p.p_t.astype(dtype), p_s=p.p_s.astype(dtype),
                p_t_sp=None if p.p_t_sp is None else cast_coo(p.p_t_sp),
                p_s_sp=None if p.p_s_sp is None else cast_coo(p.p_s_sp),
            )
        return p

    return batch.replace(
        levels=tuple(cast_level(l) for l in batch.levels),
        pools=tuple(cast_pool(p) for p in batch.pools),
    )


def apply_node_mask(level, x: Array) -> Array:
    return x * level.node_mask[..., None].astype(x.dtype)


def apply_edge_mask(level, x: Array) -> Array:
    return x * level.edge_mask[..., None].astype(x.dtype)
