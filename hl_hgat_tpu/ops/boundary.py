"""Boundary-operator products as gathers + segment sums.

The reference materializes the sparse boundary matrix B1 on device every
block (``adj2par1``, reference lib/Hodge_Dataset.py:169-191) and multiplies
with ``torch.sparse.mm`` (reference lib/Hodge_Cheb_Conv.py:100-101).  But B1
has exactly two entries per column (-1 at the edge's source row, +1 at its
target row), so every B1 product is expressible without any sparse matrix at
all:

  (B1 x_s)[n]      = sum_{e: dst e = n} x_s[e] - sum_{e: src e = n} x_s[e]
  (|B1| x_s)[n]    = sum_{e incident n} x_s[e]
  (B1^T x_t)[e]    = x_t[dst e] - x_t[src e]          (pure gather!)
  (|B1|^T x_t)[e]  = x_t[dst e] + x_t[src e]          (pure gather!)

On TPU the transpose products are free (vectorized gathers) and the forward
products are one segment-sum each — no COO arrays, no nnz padding.  Padded
edges are removed by multiplying with ``edge_mask``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked(x_s: Array, edge_mask: Array | None) -> Array:
    if edge_mask is None:
        return x_s
    return x_s * edge_mask.reshape((-1,) + (1,) * (x_s.ndim - 1)).astype(x_s.dtype)


def boundary_abs_s2t(
    x_s: Array,
    src: Array,
    dst: Array,
    num_nodes: int,
    *,
    edge_mask: Array | None = None,
) -> Array:
    """``|B1| @ x_s``: each node sums its incident-edge features.

    Matches ``torch.sparse.mm(par.abs(), x_s)``
    (reference lib/Hodge_Cheb_Conv.py:100).
    """
    xm = _masked(x_s, edge_mask).astype(jnp.float32)
    out = jax.ops.segment_sum(xm, src, num_segments=num_nodes)
    out = out + jax.ops.segment_sum(xm, dst, num_segments=num_nodes)
    return out.astype(x_s.dtype)


def boundary_s2t(
    x_s: Array,
    src: Array,
    dst: Array,
    num_nodes: int,
    *,
    edge_mask: Array | None = None,
) -> Array:
    """``B1 @ x_s``: signed incidence sum (−1 at src, +1 at dst)."""
    xm = _masked(x_s, edge_mask).astype(jnp.float32)
    out = jax.ops.segment_sum(xm, dst, num_segments=num_nodes)
    out = out - jax.ops.segment_sum(xm, src, num_segments=num_nodes)
    return out.astype(x_s.dtype)


def boundary_abs_t2s(
    x_t: Array, src: Array, dst: Array, *, edge_mask: Array | None = None
) -> Array:
    """``|B1|^T @ x_t``: each edge sums its two endpoint features.

    Matches ``torch.sparse.mm(par.abs().T, x_t)``
    (reference lib/Hodge_Cheb_Conv.py:101).
    """
    out = x_t[src] + x_t[dst]
    return _masked(out, edge_mask)


def boundary_t2s(
    x_t: Array, src: Array, dst: Array, *, edge_mask: Array | None = None
) -> Array:
    """``B1^T @ x_t``: signed endpoint difference (dst − src).

    The TSP readout uses ``|B1^T x_t|/2`` (reference lib/Hodge_ST_Model.py:848).
    """
    out = x_t[dst] - x_t[src]
    return _masked(out, edge_mask)


def node_degree(
    src: Array,
    dst: Array,
    num_nodes: int,
    *,
    edge_mask: Array | None = None,
    eps: float = 0.0,
) -> Array:
    """Degree of each node in the (undirected, deduped) edge list.

    Matches ``degree(edge_index.view(-1)) (+ 1e-6)``
    (reference lib/Hodge_ST_Model.py:385,624 — some call sites add the
    epsilon, zinc pyr/attpool do not; callers pass ``eps`` accordingly).
    """
    ones = (
        jnp.ones(src.shape, dtype=jnp.float32)
        if edge_mask is None
        else edge_mask.astype(jnp.float32)
    )
    deg = jax.ops.segment_sum(ones, src, num_segments=num_nodes)
    deg = deg + jax.ops.segment_sum(ones, dst, num_segments=num_nodes)
    return deg + eps
