"""Visualization extraction utilities (utils/viz.py — reference L5)."""

import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.complex.build import collate
from hl_hgat_tpu.data.synthetic import random_simplex_sample
from hl_hgat_tpu.utils.viz import (
    attention_fc_matrix,
    collect_outputs,
    edge_index_from_level,
    feature_trends,
    sort_by_parcels,
)


def _batch(rng, n_graphs=2):
    samples = [
        random_simplex_sample(
            rng, n_nodes=int(rng.integers(8, 14)), node_feat=4, edge_feat=3,
            keig=0,
        )
        for _ in range(n_graphs)
    ]
    return samples, jax.tree.map(jnp.asarray, collate(samples))


class TestViz:
    def test_collect_outputs_stacks(self, rng):
        _, b1 = _batch(rng)
        _, b2 = _batch(rng)
        fn = lambda b: (b.x_t[:3], b.y)  # noqa: E731
        out = collect_outputs([b1, b2], fn)
        assert out["latent"].shape[0] == 6
        assert out["pred"].shape[0] == out["y"].shape[0]

    def test_feature_trends_ignores_padding(self, rng):
        samples, batch = _batch(rng)
        lvl = batch.levels[0]
        x_t = np.asarray(batch.x_t).copy()
        x_s = np.asarray(batch.x_s).copy()
        # poison the padded rows — trends must not change
        x_t_bad = x_t.copy()
        x_t_bad[np.asarray(lvl.node_mask) == 0] = 1e6
        x_s_bad = x_s.copy()
        x_s_bad[np.asarray(lvl.edge_mask) == 0] = -1e6
        t1 = feature_trends([(x_t, x_s)], lvl)
        t2 = feature_trends([(x_t_bad, x_s_bad)], lvl)
        np.testing.assert_allclose(t1["node"], t2["node"])
        np.testing.assert_allclose(t1["edge"], t2["edge"])
        # layered snapshots give one trend point per layer
        t3 = feature_trends([(x_t, x_s), (2 * x_t, 2 * x_s)], lvl)
        assert t3["node"].shape == (2,)
        np.testing.assert_allclose(t3["node"][1], 2 * t3["node"][0])

    def test_attention_fc_roundtrip_and_sort(self, rng):
        n = 10
        src = np.array([0, 1, 2, 5])
        dst = np.array([3, 4, 6, 7])
        att = rng.random(4)
        m = attention_fc_matrix(att, src, dst, n)
        np.testing.assert_allclose(m, m.T)
        np.testing.assert_allclose(m[src, dst], att)
        labels = np.array([1, 0, 1, 0, 2, 2, 0, 1, 0, 2])
        sorted_m, perm, bounds = sort_by_parcels(m, labels)
        # permutation symmetry preserved, labels grouped contiguously
        np.testing.assert_allclose(sorted_m, sorted_m.T)
        grouped = labels[perm]
        assert (np.diff(grouped) >= 0).all()
        assert list(bounds) == [4, 7]
        # sorted matrix is a consistent relabeling
        np.testing.assert_allclose(
            sorted_m, m[np.ix_(perm, perm)]
        )

    def test_edge_index_from_level(self, rng):
        samples, batch = _batch(rng, n_graphs=1)
        ei = edge_index_from_level(batch.levels[0])
        e = samples[0].num_edges
        assert ei.shape == (2, 2 * e)
        # both directions present, canonical src<dst in the first half
        assert (ei[0, :e] < ei[1, :e]).all()
        np.testing.assert_array_equal(ei[0, e:], ei[1, :e])
