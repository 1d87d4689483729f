"""Segment reductions — the TPU-native replacement for torch-scatter.

The reference leans on torch-scatter's CUDA kernels for every aggregation:
``scatter_mean`` pooling (reference lib/Hodge_ST_Model.py:282-285), the
``aggr='add'`` of PyG ``MessagePassing.propagate`` inside the spectral convs
(reference lib/Hodge_Cheb_Conv.py:502,518-519), and ``scatter_max`` imports
(reference lib/Hodge_Cheb_Conv.py:25).

On TPU the idiomatic lowering is ``jax.ops.segment_sum`` — XLA compiles the
scatter-add to the on-chip scatter unit and fuses the surrounding elementwise
work.  All shapes are static: callers pass ``num_segments`` and invalid
(padding) rows must either carry zero data or point at a dump segment that the
caller slices away.

Accumulation is fp32 regardless of the input dtype (bf16-safe), matching the
reference semantics where torch-scatter accumulates in the input dtype but the
reference always runs fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -jnp.inf


def segment_sum(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> Array:
    """Sum ``data`` rows into ``num_segments`` buckets.

    data: [M, ...]; segment_ids: [M] int32 in [0, num_segments).  Ids >=
    num_segments are dropped by XLA scatter semantics — we use this to route
    padding to an implicit dump bucket.
    """
    acc = data.astype(jnp.float32) if data.dtype == jnp.bfloat16 else data
    out = jax.ops.segment_sum(
        acc,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return out.astype(data.dtype)


def segment_count(
    segment_ids: Array,
    num_segments: int,
    *,
    weights: Array | None = None,
) -> Array:
    """Number of (optionally weighted) elements per segment: [num_segments]."""
    ones = (
        jnp.ones(segment_ids.shape, dtype=jnp.float32)
        if weights is None
        else weights.astype(jnp.float32)
    )
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    *,
    weights: Array | None = None,
    eps: float = 0.0,
) -> Array:
    """Mean of ``data`` rows per segment (torch-scatter ``scatter_mean``).

    Empty segments yield 0 (torch-scatter yields 0 as well since it divides by
    clamp(count, 1)).  ``weights`` lets callers exclude padded rows: a padded
    row with weight 0 contributes neither to the numerator nor the count.
    """
    if weights is not None:
        data = data * weights.reshape((-1,) + (1,) * (data.ndim - 1)).astype(data.dtype)
    total = segment_sum(data, segment_ids, num_segments)
    count = segment_count(segment_ids, num_segments, weights=weights)
    denom = jnp.maximum(count, 1.0) + eps
    return total / denom.reshape((-1,) + (1,) * (data.ndim - 1)).astype(total.dtype)


def segment_max(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    *,
    mask_value: float = 0.0,
) -> Array:
    """Max of ``data`` rows per segment; empty segments yield ``mask_value``."""
    out = jax.ops.segment_max(
        data.astype(jnp.float32), segment_ids, num_segments=num_segments
    )
    out = jnp.where(jnp.isneginf(out), jnp.asarray(mask_value, out.dtype), out)
    return out.astype(data.dtype)


def segment_softmax(
    logits: Array,
    segment_ids: Array,
    num_segments: int,
    *,
    mask: Array | None = None,
) -> Array:
    """Numerically stable softmax within each segment (PyG ``utils.softmax``).

    Used by attention-style gating heads; ``mask`` (0/1 per element) removes
    padded rows from both the max and the normalizer.
    """
    x = logits.astype(jnp.float32)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(bool)
        x = jnp.where(m, x, _NEG_INF)
    seg_max = jax.ops.segment_max(x, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isneginf(seg_max), 0.0, seg_max)
    shifted = x - seg_max[segment_ids]
    expx = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (expx.ndim - mask.ndim))
        expx = expx * m.astype(expx.dtype)
    denom = jax.ops.segment_sum(expx, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return (expx / denom[segment_ids]).astype(logits.dtype)


# ---------------------------------------------------------------------------
# MXU-routed segment ops (round-2 profile findings, benchmarks/RESULTS.md):
# on the packed dense layout the scatter-based graph readout ran ~10x below
# stream bandwidth (99 us for a 4.7 MB segment-sum) and the embedding-table
# gradient scatter ~16x below.  For SMALL segment counts both are cheaper as
# one-hot matmuls: the one-hot matrix is built from step-invariant ids, so
# XLA hoists it out of a scanned training loop, and the matmul (forward AND
# transpose backward) rides the MXU scatter-free.

def segment_mean_onehot(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    *,
    weights: Array | None = None,
) -> Array:
    """`segment_mean` as a one-hot matmul — use when
    ``rows x num_segments`` is small (readouts, pooled heads).

    Exact products (one-hot entries and 0/1 weights are exact in bf16);
    f32 accumulation like `segment_sum`, summation order differs only.
    """
    onehot = (
        segment_ids[None, :]
        == jnp.arange(num_segments, dtype=segment_ids.dtype)[:, None]
    )
    w32 = (
        onehot.astype(jnp.float32)
        if weights is None
        else onehot.astype(jnp.float32) * weights.astype(jnp.float32)[None, :]
    )
    count = w32.sum(axis=1)  # [G], step-invariant -> hoisted
    m = w32.astype(data.dtype if data.dtype == jnp.bfloat16 else jnp.float32)
    total = jnp.einsum(
        "gr,rf->gf", m, data, preferred_element_type=jnp.float32
    )
    denom = jnp.maximum(count, 1.0)
    # cast the f32 accumulation to the data dtype BEFORE dividing — the same
    # order as `segment_mean` (whose segment_sum casts its total first), so
    # flipping HLHGAT_MATMUL_READOUT is bit-stable in f32 and the bf16
    # divergence is the rounding of one division, not of the whole total
    total = total.astype(data.dtype)
    return total / denom[:, None].astype(total.dtype)


@jax.custom_vjp
def embed_lookup(table: Array, ids: Array) -> Array:
    """``table[ids]`` whose BACKWARD is a one-hot matmul, not a scatter.

    The forward gather is fast on TPU; autodiff's backward scatter-add is
    not (measured 64 us for a [9216] -> [28, 49] table gradient).  dTable =
    onehotᵀ @ g runs on the MXU in f32 (vocabulary axes here are tiny).

    Round-5 negative: replacing the forward gather with a (bit-exact)
    one-hot f32 matmul — aimed at the 2×12.8 µs/step gather fusions in
    the flagship trace — measured 2.254M vs 2.263M edges/s end-to-end;
    the f32 one-hot materialization costs what the gather did.  The
    gather forward stands."""
    return table[ids]


def _embed_lookup_fwd(table, ids):
    # dtype carried as a zero-size array (np.dtype is not a JAX type)
    return table[ids], (ids, table.shape, jnp.zeros((0,), table.dtype))


def _embed_lookup_bwd(res, g):
    ids, shape, tproto = res
    ids_flat = ids.reshape(-1)
    g_flat = g.reshape(len(ids_flat), shape[1]).astype(jnp.float32)
    onehot = (
        ids_flat[:, None] == jnp.arange(shape[0], dtype=ids_flat.dtype)[None, :]
    ).astype(jnp.float32)
    dtable = jnp.einsum(
        "rv,rf->vf", onehot, g_flat, preferred_element_type=jnp.float32
    )
    import numpy as _np

    return dtable.astype(tproto.dtype), _np.zeros(ids.shape, jax.dtypes.float0)


embed_lookup.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)
