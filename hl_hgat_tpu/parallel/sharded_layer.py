"""Graph-sharded HL-HGAT layer: one large complex across the 'graph' axis.

The single-complex ("brain") regime: node features live node-block-sharded,
edge features edge-block-sharded, and one HL layer runs fully distributed —

  * Laguerre convs over L0 (node-partitioned rows) and L1 (edge-partitioned)
    via halo-exchange SpMM,
  * the MSI boundary couplings via rectangular halo shards of |B1| and |B1|ᵀ
    (nodes×edges and edges×nodes),
  * BatchNorm statistics psum-reduced over the 'graph' axis so normalization
    matches the unsharded layer bit-for-bit,
  * pointwise MLPs/activations purely local.

This is the "sequence-parallel" analog for simplicial complexes (SURVEY.md
§2.10): the partitioned axis is simplex count, the exchanged state is
boundary features, all collectives ride ICI.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from hl_hgat_tpu.complex.batch import _pytree_dataclass
from hl_hgat_tpu.complex.build import GraphStructure
from hl_hgat_tpu.parallel.graph_parallel import HaloShard, partition_halo

Array = jax.Array


@_pytree_dataclass(meta=("n_parts",))
class ShardedComplex:
    """One complex partitioned for the 'graph' axis (leading dim = parts)."""

    l0: HaloShard  # nodes × nodes
    l1: HaloShard  # edges × edges
    b1_abs: HaloShard  # nodes × edges (values |B1| = 1)
    b1t_abs: HaloShard  # edges × nodes
    deg: Array  # [P, n_local]
    node_mask: Array  # [P, n_local]
    edge_mask: Array  # [P, e_local]
    n_parts: int


def build_sharded_complex(
    st: GraphStructure, n_parts: int
) -> ShardedComplex:
    """Host-side partitioning of one complex into halo shards."""
    n, e = st.num_nodes, st.num_edges
    l0, _ = partition_halo(st.l0_rows, st.l0_cols, st.l0_vals, n, n_parts)
    l1, _ = partition_halo(st.l1_rows, st.l1_cols, st.l1_vals, e, n_parts)
    eidx = np.arange(e, dtype=np.int32)
    ones = np.ones(e, np.float32)
    b1_abs, _ = partition_halo(
        np.concatenate([st.src, st.dst]),
        np.concatenate([eidx, eidx]),
        np.concatenate([ones, ones]),
        n, n_parts, num_cols=e,
    )
    b1t_abs, _ = partition_halo(
        np.concatenate([eidx, eidx]),
        np.concatenate([st.src, st.dst]),
        np.concatenate([ones, ones]),
        e, n_parts, num_cols=n,
    )
    n_local, e_local = l0.n_local, l1.n_local
    deg = np.zeros(n_parts * n_local, np.float32)
    np.add.at(deg, st.src, 1.0)
    np.add.at(deg, st.dst, 1.0)
    node_mask = np.zeros(n_parts * n_local, np.float32)
    node_mask[:n] = 1.0
    edge_mask = np.zeros(n_parts * e_local, np.float32)
    edge_mask[:e] = 1.0
    return ShardedComplex(
        l0=l0, l1=l1, b1_abs=b1_abs, b1t_abs=b1t_abs,
        deg=deg.reshape(n_parts, n_local),
        node_mask=node_mask.reshape(n_parts, n_local),
        edge_mask=edge_mask.reshape(n_parts, e_local),
        n_parts=n_parts,
    )


def pad_features(x: np.ndarray, n_parts: int) -> np.ndarray:
    """[N, F] → [P, ceil(N/P), F] block layout."""
    n_local = -(-x.shape[0] // n_parts)
    xp = np.zeros((n_parts * n_local,) + x.shape[1:], x.dtype)
    xp[: x.shape[0]] = x
    return xp.reshape((n_parts, n_local) + x.shape[1:])


# --- device-side primitives (run inside shard_map over 'graph') ------------


def _halo_matvec_local(shard: HaloShard, x_local: Array) -> Array:
    """One part's L @ x with ring halo exchange (inside shard_map)."""
    from hl_hgat_tpu.parallel.graph_parallel import halo_matvec_local

    return halo_matvec_local(shard, x_local)


def _sharded_bn(x: Array, mask: Array, scale, offset, eps=1e-5) -> Array:
    """BatchNorm with statistics psum'd over 'graph' — identical to the
    unsharded masked BN."""
    m = mask[:, None]
    count = jax.lax.psum(jnp.sum(m), "graph")
    total = jax.lax.psum(jnp.sum(x * m, axis=0), "graph")
    mean = total / jnp.maximum(count, 1.0)
    var = jax.lax.psum(jnp.sum((x - mean) ** 2 * m, axis=0), "graph")
    var = jnp.maximum(var / jnp.maximum(count, 1.0), 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + offset
    return y * m


def _laguerre_local(shard: HaloShard, x: Array, w: Array, b: Array) -> Array:
    k = w.shape[0]
    terms = [x]
    if k > 1:
        terms.append(x - _halo_matvec_local(shard, x))
    j = 1
    for _ in range(2, k):
        lt = _halo_matvec_local(shard, terms[-1])
        terms.append((-lt + (2 * j + 1) * terms[-1] - j * terms[-2]) / (j + 1))
        j += 1
    stacked = jnp.concatenate(terms, axis=-1)
    return stacked @ w.reshape(-1, w.shape[-1]) + b


@dataclasses.dataclass(frozen=True)
class HLLayerWeights:
    """Explicit weights of one MSI + conv-pair layer (pytree of arrays)."""

    wv_node1: Array
    bv_node1: Array
    wv_node2: Array
    bv_node2: Array
    wv_edge1: Array
    bv_edge1: Array
    wv_edge2: Array
    bv_edge2: Array
    conv_t_w: Array  # [K, C, F]
    conv_t_b: Array
    conv_s_w: Array
    conv_s_b: Array
    bn_scales: tuple  # 6 (scale, offset) pairs: msi×4, conv×2


jax.tree_util.register_dataclass(
    HLLayerWeights,
    data_fields=[f.name for f in dataclasses.fields(HLLayerWeights)],
    meta_fields=[],
)


def sharded_hl_layer(
    weights: HLLayerWeights,
    comp: ShardedComplex,
    x_t: Array,  # [P, n_local, C] sharded over 'graph'
    x_s: Array,  # [P, e_local, C]
    mesh: Mesh,
    *,
    deg_eps: float = 1e-6,
) -> tuple[Array, Array]:
    """One full HL layer (MSI value mode → Laguerre conv pair → BN → ReLU),
    distributed over the 'graph' axis.  Bit-equivalent to the unsharded
    layer math (eval-mode BN) — asserted in tests."""

    def local(comp, x_t, x_s, w: HLLayerWeights):
        x_t, x_s = x_t[0], x_s[0]
        deg = comp.deg[0] + deg_eps
        nmask, emask = comp.node_mask[0], comp.edge_mask[0]

        # MSI boundary couplings via rectangular halo shards
        s2t = _halo_matvec_local(comp.b1_abs, x_s)
        s2t = s2t / jnp.where(deg > 0, deg, 1.0)[:, None]
        t2s = _halo_matvec_local(comp.b1t_abs, x_t) / 2.0

        def value_head(z, mask, w1, b1, w2, b2, bn1, bn2):
            z = z @ w1 + b1
            z = _sharded_bn(z, mask, *bn1)
            z = jax.nn.relu(z)
            z = z @ w2 + b2
            z = _sharded_bn(z, mask, *bn2)
            return jax.nn.relu(z)

        bns = w.bn_scales
        v_t = value_head(
            jnp.concatenate([s2t, x_t], axis=-1), nmask,
            w.wv_node1, w.bv_node1, w.wv_node2, w.bv_node2, bns[0], bns[1],
        )
        v_s = value_head(
            jnp.concatenate([t2s, x_s], axis=-1), emask,
            w.wv_edge1, w.bv_edge1, w.wv_edge2, w.bv_edge2, bns[2], bns[3],
        )

        # Laguerre conv pair + BN + ReLU
        y_t = _laguerre_local(comp.l0, v_t, w.conv_t_w, w.conv_t_b)
        y_t = jax.nn.relu(_sharded_bn(y_t, nmask, *bns[4]))
        y_s = _laguerre_local(comp.l1, v_s, w.conv_s_w, w.conv_s_b)
        y_s = jax.nn.relu(_sharded_bn(y_s, emask, *bns[5]))
        return y_t[None], y_s[None]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("graph"), P("graph"), P("graph"), P()),
        out_specs=(P("graph"), P("graph")),
        check_vma=False,
    )
    return fn(comp, x_t, x_s, weights)
