"""Large-graph dense-block path: blocks + COO spill vs the COO oracle.

Graphs exceeding the 128-row pack caps (reference TSP-500 workloads,
lib/Hodge_Dataset.py:670-745; brain complexes) span several dense blocks
with cross-block operator entries carried in COO spills
(complex/dense.py BlockDiagMatrix / b1_sp / p_*_sp).  These tests assert
the spill path reproduces the flat COO layout's model semantics exactly,
and that the BFS locality reorder is a pure relabelling.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.complex.build import collate
from hl_hgat_tpu.complex.coarsen import build_pyramid
from hl_hgat_tpu.complex.dense import (
    BlockDiagMatrix,
    bfs_node_order,
    collate_dense_packed,
    pack_plan,
    reorder_sample,
)
from hl_hgat_tpu.data.synthetic import random_simplex_sample
from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph, HLHGCNNTsp
from hl_hgat_tpu.nn import LaguerreConv
from hl_hgat_tpu.ops.dispatch import lap_matvec


def dev(b):
    return jax.tree.map(jnp.asarray, b)


def big_and_small(rng, *, big_nodes=300, num_pool=0, edge_feat=5, tsp=False):
    """One graph well past the 128 caps + two block-sized ones."""
    samples = []
    for n, extra in ((big_nodes, big_nodes // 2), (14, 4), (19, 5)):
        s = random_simplex_sample(
            rng, n_nodes=n, extra_edges=extra, node_feat=6,
            edge_feat=edge_feat, keig=0, num_pool=num_pool,
        )
        if tsp:
            s.x_s[:, -1] = 1.0
            s.y = (rng.random(s.num_edges) > 0.5).astype(np.float32)
        samples.append(reorder_sample(s, y_per_edge=tsp))
    return samples


def per_graph_rows(dense_out, level, samples, coo_out):
    """Compare dense-layout rows against COO rows graph by graph via gids."""
    gid = np.asarray(level.n_gid).reshape(-1)
    flat = np.asarray(dense_out).reshape(-1, dense_out.shape[-1])
    o = 0
    for g, s in enumerate(samples):
        rows = flat[gid == g]
        np.testing.assert_allclose(
            rows, np.asarray(coo_out)[o : o + s.num_nodes],
            rtol=1e-4, atol=1e-5,
        )
        o += s.num_nodes


def test_pack_plan_spans_oversized():
    rng = np.random.default_rng(0)
    samples = big_and_small(rng)
    bins, spans = pack_plan(samples, 128, 128)
    assert len(spans) == 1
    (i, span), = spans.items()
    n, e = samples[i].num_nodes, samples[i].num_edges
    assert span == max(-(-n // 128), -(-e // 128))


def test_bfs_order_is_permutation():
    rng = np.random.default_rng(1)
    s = random_simplex_sample(rng, n_nodes=50, extra_edges=20, node_feat=3,
                              edge_feat=3, keig=0)
    st = s.levels[0]
    perm = bfs_node_order(st.src, st.dst, st.num_nodes)
    assert sorted(perm.tolist()) == list(range(st.num_nodes))


def test_reorder_sample_preserves_graph_outputs():
    """Model outputs are permutation-invariant per graph → the reorder is
    semantics-free."""
    rng = np.random.default_rng(2)
    s = random_simplex_sample(rng, n_nodes=40, extra_edges=25, node_feat=6,
                              edge_feat=5, keig=0)
    model = HLHGCNNGraph(
        cfg=BackboneConfig(channels=(1,), filters=(8,), k=3, init_k=2),
        num_classes=2,
    )
    b0 = dev(collate([s]))
    b1 = dev(collate([reorder_sample(s)]))
    p = model.init({"params": jax.random.key(0)}, b0, deterministic=True)
    out0 = model.apply(p, b0, deterministic=True)
    out1 = model.apply(p, b1, deterministic=True)
    np.testing.assert_allclose(out0, out1, rtol=1e-4, atol=1e-5)


def test_spill_lap_matvec_matches_dense_oracle():
    rng = np.random.default_rng(3)
    samples = big_and_small(rng)
    batch = collate_dense_packed(samples)
    lvl = batch.levels[0]
    assert isinstance(lvl.l0, BlockDiagMatrix)
    # nearest-neighbour cross-block entries ride the band matmuls now;
    # a spanning graph must produce at least one of band/spill
    assert lvl.l0.spill is not None or lvl.l0.band_up is not None
    nb, s_pad, _ = lvl.l0.blocks.shape
    # oracle: full flat operator from blocks + bands + spill
    full = np.zeros((nb * s_pad, nb * s_pad), np.float64)
    for b in range(nb):
        full[b * s_pad : (b + 1) * s_pad, b * s_pad : (b + 1) * s_pad] = (
            lvl.l0.blocks[b]
        )
        if lvl.l0.band_up is not None and b + 1 < nb:
            full[b * s_pad : (b + 1) * s_pad,
                 (b + 1) * s_pad : (b + 2) * s_pad] = lvl.l0.band_up[b]
        if lvl.l0.band_dn is not None and b > 0:
            full[b * s_pad : (b + 1) * s_pad,
                 (b - 1) * s_pad : b * s_pad] = lvl.l0.band_dn[b]
    if lvl.l0.spill is not None:
        sp = lvl.l0.spill
        np.add.at(full, (np.asarray(sp.rows), np.asarray(sp.cols)),
                  np.asarray(sp.vals, np.float64))
    x = rng.standard_normal((nb, s_pad, 7)).astype(np.float32)
    got = np.asarray(lap_matvec(dev(lvl).l0, jnp.asarray(x)))
    want = (full @ x.reshape(-1, 7)).reshape(nb, s_pad, 7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spill_laguerre_conv_equal():
    rng = np.random.default_rng(4)
    samples = big_and_small(rng)
    coo = dev(collate(samples))
    dense = dev(collate_dense_packed(samples))
    conv = LaguerreConv(7, 4)
    p = conv.init(jax.random.key(0), coo.x_t, coo.levels[0].l0)
    out_coo = conv.apply(p, coo.x_t, coo.levels[0].l0)
    out_dense = conv.apply(p, dense.x_t, dense.levels[0].l0)
    per_graph_rows(out_dense, dense.levels[0], samples, out_coo)


def test_spill_full_model_equal():
    rng = np.random.default_rng(5)
    samples = big_and_small(rng)
    coo = dev(collate(samples))
    dense = dev(collate_dense_packed(samples))
    model = HLHGCNNGraph(
        cfg=BackboneConfig(channels=(1, 1), filters=(8, 16), k=3, init_k=3),
        num_classes=2,
    )
    p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
    out_coo = model.apply(p, coo, deterministic=True)
    out_dense = model.apply(p, dense, deterministic=True)
    np.testing.assert_allclose(out_dense, out_coo, rtol=1e-3, atol=1e-4)


def test_spill_tsp_model_equal():
    rng = np.random.default_rng(6)
    samples = big_and_small(rng, edge_feat=5, tsp=True)
    coo = dev(collate(samples, y_per_edge=True))
    dense = dev(collate_dense_packed(samples, y_per_edge=True))
    model = HLHGCNNTsp(
        cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
        num_classes=1,
    )
    p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
    out_coo = np.asarray(model.apply(p, coo, deterministic=True))
    out_dense = np.asarray(model.apply(p, dense, deterministic=True))
    gid = np.asarray(dense.levels[0].s_gid).reshape(-1)
    flat = out_dense.reshape(-1, out_dense.shape[-1])
    o = 0
    for g, s in enumerate(samples):
        np.testing.assert_allclose(
            flat[gid == g], out_coo[o : o + s.num_edges],
            rtol=1e-3, atol=1e-4,
        )
        o += s.num_edges


def test_spill_attpool_model_equal():
    """Pooled model: pool spills (p_*_sp) must reproduce scatter-mean."""
    rng = np.random.default_rng(7)
    samples = big_and_small(rng, big_nodes=260, num_pool=1)
    coo = dev(collate(samples))
    dense = dev(collate_dense_packed(samples))
    model = HLHGCNNGraph(
        cfg=BackboneConfig(
            channels=(1, 1), filters=(8, 16), k=2, init_k=2,
            pool_locs=(0,), att_sigma="relu", gate_input="last",
            gate_target="last",
        ),
        num_classes=2,
    )
    p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
    out_coo = model.apply(p, coo, deterministic=True)
    out_dense = model.apply(p, dense, deterministic=True)
    np.testing.assert_allclose(out_dense, out_coo, rtol=1e-3, atol=1e-4)


def test_small_graph_batches_unchanged():
    """No spill fields when every graph fits one block (the flagship path
    must stay byte-identical)."""
    rng = np.random.default_rng(8)
    samples = [
        random_simplex_sample(rng, n_nodes=15, extra_edges=4, node_feat=6,
                              edge_feat=5, keig=0)
        for _ in range(4)
    ]
    batch = collate_dense_packed(samples)
    lvl = batch.levels[0]
    assert not isinstance(lvl.l0, BlockDiagMatrix)
    assert not isinstance(lvl.l1, BlockDiagMatrix)
    assert lvl.b1_sp is None
