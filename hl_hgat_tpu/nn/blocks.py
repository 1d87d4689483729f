"""Reusable HL-filtering blocks shared by all model families.

The universal template (SURVEY.md §2.5): each layer is
  MSI (value mode) → [node LaguerreConv → BN → act → dropout]
                     ∥ [edge LaguerreConv → BN → act → dropout]
  → DenseNet-style concat onto the running feature stacks.

``HLFilter`` is the modular block of the DEMO rewrite (reference
lib/Hodge_Cheb_Conv.py:117-188); the benchmark models compose the same pieces
with per-model quirks (activation, gate inputs) in `hl_hgat_tpu.models`.
"""

from __future__ import annotations

import os
from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from hl_hgat_tpu.complex.batch import ComplexLevel, CooMatrix
from hl_hgat_tpu.complex.dense import BlockDiagMatrix
from hl_hgat_tpu.nn.conv import (
    LaguerreConv,
    emit_cast,
    polynomial_terms,
    use_adjoint_conv,
    use_fused_dense,
    use_terms_kernel,
)
from hl_hgat_tpu.nn.interaction import NodeEdgeInt
from hl_hgat_tpu.nn.norm import MaskedBatchNorm

Array = jnp.ndarray

_merged_pair_flag = os.environ.get("HLHGAT_MERGED_PAIR", "0") == "1"


def use_merged_pair(enable: bool | None = None) -> bool:
    """Get/set merged node/edge conv execution (``HLHGAT_MERGED_PAIR``).

    Measured DEFAULT OFF (benchmarks/RESULTS.md round 2): concatenating the
    node/edge recurrences into one chain of batched matmuls with a [C, 2F]
    column-concat epilogue GEMM halves the kernel count of the conv chain,
    but the flagship step measured 1.288M vs 1.769M edges/s — the conv
    kernels are bandwidth-bound INTERNALLY (not pure launch latency), so
    the 2x weight/output bytes of the widened GEMM and the per-step
    operator/feature concats cost more than the saved launches.  Kept as a
    fully tested design point (tests cover it via model-level equality);
    exact math either way.
    """
    global _merged_pair_flag
    if enable is not None:
        _merged_pair_flag = enable
    return _merged_pair_flag


def _blocks_and_spill(lap):
    """(blocks [G,S,S], spill | None) for dense-block operators, else None.

    Banded operators (nearest-neighbour coupling between consecutive
    blocks) are NOT mergeable: concatenating node and edge blocks would
    create a spurious band coupling across the node/edge boundary."""
    if isinstance(lap, BlockDiagMatrix):
        if getattr(lap, "band_up", None) is not None or getattr(
            lap, "band_dn", None
        ) is not None:
            return None, None
        return lap.blocks, lap.spill
    if hasattr(lap, "ndim") and getattr(lap, "ndim", 0) == 3:
        return lap, None
    return None, None


def _offset_coo(m: CooMatrix, off: int, n: int) -> CooMatrix:
    return CooMatrix(
        rows=m.rows + off, cols=m.cols + off, vals=m.vals, shape=(n, n),
        symmetric=m.symmetric,
    )


def _merge_spills(st, ss, off: int, n: int):
    """Concatenate two flat-slot spill matrices, offsetting the second by
    ``off`` row/col slots.  Dump-bucket entries keep ``vals == 0`` so an
    offset entry landing in-range still contributes nothing."""
    if st is None and ss is None:
        return None
    parts = []
    if st is not None:
        parts.append(CooMatrix(st.rows, st.cols, st.vals, (n, n),
                               symmetric=st.symmetric))
    if ss is not None:
        parts.append(_offset_coo(ss, off, n))
    if len(parts) == 1:
        return parts[0]
    # `symmetric` only gates the ELL fast path (ops/spmm.py), and spill
    # CooMatrices never carry ELL arrays — the merged matrix always takes
    # the plain COO path, so the flag is advisory here.  Assert the parts
    # agree so a future mixed-flag merge fails loudly instead of silently
    # downgrading.
    assert len({p.symmetric for p in parts}) == 1, (
        "merged spill parts disagree on `symmetric`"
    )
    return CooMatrix(
        rows=jnp.concatenate([p.rows for p in parts]),
        cols=jnp.concatenate([p.cols for p in parts]),
        vals=jnp.concatenate([p.vals for p in parts]),
        shape=(n, n),
        symmetric=parts[0].symmetric,
    )


def merged_conv_pair(
    node: "ConvBNAct", edge: "ConvBNAct", x_t, x_s, level,
    deterministic: bool,
):
    """Run two ConvBNActs with ONE merged recurrence + GEMM chain, or None
    if the layouts don't merge (caller falls back to separate execution).

    Mergeable when both operators are dense blocks of the same tile size
    and both feature tensors are [G, S, C] with equal S and C.  Params and
    BN stay in their own module scopes (LaguerreConv ``just_params`` tap),
    so the parameter tree and batch statistics are identical to the
    unmerged path.
    """
    if not use_merged_pair() or node.k != edge.k:
        return None
    if node.demo_compat or edge.demo_compat:
        return None  # compat recurrence runs the plain per-path terms
    if use_fused_dense() or use_terms_kernel() or use_adjoint_conv():
        return None  # those paths have their own kernels/backwards
    bt, st = _blocks_and_spill(level.l0)
    bs, ss = _blocks_and_spill(level.l1)
    if bt is None or bs is None:
        return None
    if x_t.ndim != 3 or x_s.ndim != 3:
        return None
    if x_t.shape[1] != x_s.shape[1] or x_t.shape[-1] != x_s.shape[-1]:
        return None
    if bt.shape[1] != bs.shape[1]:
        return None

    w_t, b_t = node(x_t, None, None, just_conv_params=True)
    w_s, b_s = edge(x_s, None, None, just_conv_params=True)
    gt, s = x_t.shape[0], x_t.shape[1]
    z = jnp.concatenate([x_t, x_s], axis=0)
    blocks = jnp.concatenate([bt, bs], axis=0)
    spill = _merge_spills(st, ss, gt * s, blocks.shape[0] * s)
    lap = blocks if spill is None else BlockDiagMatrix(blocks, spill)
    terms = polynomial_terms(z, lap, node.k)
    # one epilogue GEMM per term over BOTH paths: [*, C] @ [C, 2F]
    w_cat = jnp.concatenate([w_t, w_s], axis=-1)  # [K, C, Ft + Fs]
    out = None
    for kk, t in enumerate(terms):
        part = jnp.einsum(
            "...c,cf->...f", t, w_cat[kk].astype(t.dtype),
            preferred_element_type=jnp.float32,
        )
        out = part if out is None else out + part
    ft = node.features
    y_t, y_s = out[:gt, :, :ft], out[gt:, :, ft:]
    if b_t is not None:
        y_t = y_t + b_t.astype(y_t.dtype)
    if b_s is not None:
        y_s = y_s + b_s.astype(y_s.dtype)
    x_t = node(x_t, level.l0, level.node_mask, deterministic=deterministic,
               conv_result=emit_cast(y_t, x_t.dtype))
    x_s = edge(x_s, level.l1, level.edge_mask, deterministic=deterministic,
               conv_result=emit_cast(y_s, x_s.dtype))
    return x_t, x_s


def activation(name: str, leaky_slope: float = 0.1) -> Callable[[Array], Array]:
    if name == "relu":
        return nn.relu
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, leaky_slope)
    raise ValueError(f"unknown activation {name!r}")


class ConvBNAct(nn.Module):
    """LaguerreConv → masked BN → activation → dropout, on one simplex order."""

    features: int
    k: int
    act: str = "relu"
    leaky_slope: float = 0.1
    dropout: float = 0.0
    demo_compat: bool = False  # DEMO K>2 recurrence (nn/conv.py)

    @nn.compact
    def __call__(
        self, x, lap, mask, *, deterministic: bool = False,
        just_conv_params: bool = False, conv_result=None
    ):
        # Merged node/edge execution protocol (merged_conv_pair): the first
        # call (``just_conv_params=True``) creates this path's conv params
        # in their usual scope and returns them; the caller runs the
        # recurrence + GEMM on the concatenated blocks and calls again with
        # ``conv_result`` so only BN/act/dropout run here.
        conv = LaguerreConv(self.features, self.k,
                            demo_compat=self.demo_compat, name="conv")
        if just_conv_params:
            return conv(x, lap, just_params=True)
        x = conv(x, lap) if conv_result is None else conv_result
        x = MaskedBatchNorm(self.features, name="bn")(
            x, mask, use_running_average=deterministic
        )
        x = activation(self.act, self.leaky_slope)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class NEConvPair(nn.Module):
    """The paired node/edge filter of every reference block
    (gnn.Sequential at e.g. reference lib/Hodge_ST_Model.py:578-589)."""

    features: int
    k: int
    act: str = "relu"
    leaky_slope: float = 0.1
    dropout: float = 0.0
    demo_compat: bool = False

    @nn.compact
    def __call__(
        self, x_t, x_s, level: ComplexLevel, deterministic: bool = False
    ):
        # positional-friendly ``deterministic`` for nn.remat static_argnums
        node = ConvBNAct(
            self.features, self.k, self.act, self.leaky_slope, self.dropout,
            demo_compat=self.demo_compat, name="node",
        )
        edge = ConvBNAct(
            self.features, self.k, self.act, self.leaky_slope, self.dropout,
            demo_compat=self.demo_compat, name="edge",
        )
        merged = merged_conv_pair(node, edge, x_t, x_s, level, deterministic)
        if merged is not None:
            return merged
        x_t = node(x_t, level.l0, level.node_mask, deterministic=deterministic)
        x_s = edge(x_s, level.l1, level.edge_mask, deterministic=deterministic)
        return x_t, x_s


class HLFilter(nn.Module):
    """``channels`` stacked (MSI → NEConvPair → dense concat) layers
    (reference HL_filter, lib/Hodge_Cheb_Conv.py:117-188)."""

    channels: int = 2
    filters: int = 32
    k: int = 4
    act: str = "leaky_relu"
    leaky_slope: float = 0.1
    dropout: float = 0.0
    if_dense: bool = True

    @nn.compact
    def __call__(
        self,
        x_t0,
        x_s0,
        level: ComplexLevel,
        deg: Array,
        *,
        deterministic: bool = False,
    ):
        for j in range(self.channels):
            if self.if_dense:
                x_t, x_s = NodeEdgeInt(dv=self.filters, name=f"MSI{j}")(
                    x_t0, x_s0, level, deg, deterministic=deterministic
                )
                x_t, x_s = NEConvPair(
                    self.filters, self.k, self.act, self.leaky_slope,
                    self.dropout, name=f"NEConv{j}",
                )(x_t, x_s, level, deterministic=deterministic)
                x_t0 = jnp.concatenate([x_t0, x_t], axis=-1)
                x_s0 = jnp.concatenate([x_s0, x_s], axis=-1)
            else:
                x_t0, x_s0 = NEConvPair(
                    self.filters, self.k, self.act, self.leaky_slope,
                    self.dropout, name=f"NEConv{j}",
                )(x_t0, x_s0, level, deterministic=deterministic)
        return x_t0, x_s0
