"""Dataset pipeline semantics: feature layouts, caching, bucketed loading."""

import numpy as np
import pytest

from hl_hgat_tpu.data.datasets import (
    CachedDataset,
    brain_sample,
    cifar10sp_sample,
    fc2mask,
    pad_truncate_features,
    peptides_sample,
    tsp_sample,
    zinc_sample,
)
from hl_hgat_tpu.data.loader import BucketedLoader
from hl_hgat_tpu.data.lrgb import lrgb_info
from hl_hgat_tpu.data.synthetic import random_simplex_sample


def toy_graph(rng, n=10):
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    # directed duplicates like raw PyG data
    ei = np.concatenate(
        [np.stack([src, dst]), np.stack([dst, src])], axis=1
    )
    return ei


class TestZincLayout:
    def test_feature_dims_and_normalization(self, rng):
        n = 12
        ei = toy_graph(rng, n)
        atom = rng.integers(0, 21, n)
        bond = rng.integers(1, 4, ei.shape[1])
        s = zinc_sample(ei, bond, atom, y=3.0, keig=10)
        assert s.x_t.shape == (n, 21 + 9)
        assert s.x_s.shape == (n - 1, 3 + 9)
        # one-hot block is one-hot
        np.testing.assert_allclose(s.x_t[:, :21].sum(1), 1.0)
        np.testing.assert_allclose(
            s.y, (3.0 - 0.0153) / 2.0109, rtol=1e-6
        )

    def test_embed_ids_variant(self, rng):
        n = 8
        ei = toy_graph(rng, n)
        atom = rng.integers(0, 28, n)
        bond = rng.integers(1, 4, ei.shape[1])
        s = zinc_sample(ei, bond, atom, y=0.0, keig=5, embed_ids=True)
        assert s.x_t.shape[1] == 1 + 4
        np.testing.assert_array_equal(s.x_t[:, 0], atom)

    def test_pad_truncate_sign_flip(self, rng):
        x = rng.standard_normal((6, 30)).astype(np.float32)
        out = pad_truncate_features(x, 20, 5, rng=rng)
        assert out.shape == (6, 20)
        np.testing.assert_allclose(np.abs(out[:, :20]), np.abs(x[:, :20]),
                                   rtol=1e-6)
        np.testing.assert_allclose(out[:, :5], x[:, :5])  # static cols unflipped
        short = pad_truncate_features(x[:, :8], 20, 5)
        assert short.shape == (6, 20)
        np.testing.assert_allclose(short[:, 8:], 0.0)


class TestTspLayout:
    def test_labels_on_edges_and_mask_column(self, rng):
        n = 20
        ei = toy_graph(rng, n)
        dist = rng.random(ei.shape[1]).astype(np.float32)
        y = (rng.random(ei.shape[1]) > 0.7).astype(np.float32)
        s = tsp_sample(ei, dist, rng.random((n, 2)), y)
        assert s.x_s.shape[1] == 2  # [dist, aug mask]
        np.testing.assert_allclose(s.x_s[:, 1], 1.0)  # no aug
        assert s.y.shape == (s.num_edges,)

    def test_aug_keeps_tour_edges(self, rng):
        n = 30
        ei = toy_graph(rng, n)
        dist = rng.random(ei.shape[1]).astype(np.float32)
        y = np.zeros(ei.shape[1], np.float32)
        y[:10] = 1.0  # mark tour edges
        s = tsp_sample(ei, dist, rng.random((n, 2)), y, aug=True, aug_prob=1.0,
                       rng=np.random.default_rng(1))
        kept = s.x_s[:, 1]
        # every positively-labelled edge survives the node dropout
        assert (kept[s.y > 0] == 1.0).all()


class TestCifarLayout:
    def test_feature_layout_script_semantics(self, rng):
        n = 15
        ei = toy_graph(rng, n)
        x = rng.random((n, 3)).astype(np.float32)
        pos = rng.random((n, 2)).astype(np.float32)
        dist = rng.random(ei.shape[1]).astype(np.float32)
        s = cifar10sp_sample(ei, dist, x, pos, y=4, keig=6)
        assert s.x_t.shape == (n, 3 + 2 + 5)
        assert s.x_s.shape == (n - 1, 1 + 3 + 5)
        # edge PE is |pe_src + pe_dst| (script wins)
        from hl_hgat_tpu.complex.build import eig_pe, hodge_laplacians

        l0, _, _ = hodge_laplacians(s.levels[0].src, s.levels[0].dst, n)
        pe = eig_pe(l0, 6)
        expect = np.abs(pe[s.levels[0].src] + pe[s.levels[0].dst])
        np.testing.assert_allclose(s.x_s[:, 4:], expect, atol=1e-5)

    def test_mlgc_pyramid(self, rng):
        n = 24
        ei = toy_graph(rng, n)
        s = cifar10sp_sample(
            ei, rng.random(ei.shape[1]).astype(np.float32),
            rng.random((n, 3)).astype(np.float32),
            rng.random((n, 2)).astype(np.float32), y=1, keig=4, num_pool=1,
        )
        assert len(s.levels) == 2
        assert len(s.pools) == 1


class TestBrain:
    def test_fc2mask_modes(self, rng):
        fcs = rng.standard_normal((10, 16, 16))
        fcs = (fcs + fcs.transpose(0, 2, 1)) / 2
        for mode in (1, 2, 3):
            m = fc2mask(fcs, 0.2, mode)
            assert m.shape == (16, 16)
            assert np.tril(m).sum() == 0  # strictly upper triangular
            assert m.sum() > 0

    def test_fc2mask_rejects_k_zero(self, rng):
        """percent small enough that k=0 must raise (the reference's
        topk(0) raises on v[-1]; a silent [-0] index would return a
        near-full mask)."""
        import pytest as _pytest

        fcs = rng.standard_normal((4, 8, 8))
        fcs = (fcs + fcs.transpose(0, 2, 1)) / 2
        for mode in (1, 2, 3):
            with _pytest.raises(ValueError, match="k=0"):
                fc2mask(fcs, 0.001, mode)

    def test_brain_sample_fc(self, rng):
        from hl_hgat_tpu.complex.build import build_structure
        from hl_hgat_tpu.complex.coarsen import build_pyramid

        n, t = 12, 40
        src = np.arange(n - 1).astype(np.int32)
        dst = np.arange(1, n).astype(np.int32)
        levels, pools = build_pyramid([build_structure(src, dst, n)], 1)
        ts = rng.standard_normal((n, t))
        s = brain_sample(ts, src, dst, levels, pools, y=100.0,
                         crop_len=30, rng=rng)
        assert s.x_t.shape == (n, 30)
        # FC values are correlations in [-1, 1]
        assert np.abs(s.x_s).max() <= 1.0 + 1e-6
        np.testing.assert_allclose(s.y, (100.0 - 95.1377) / 7.3, rtol=1e-6)


class TestCacheAndLoader:
    def test_cache_roundtrip(self, rng, tmp_path):
        s = random_simplex_sample(rng, n_nodes=14, num_pool=1)
        ds = CachedDataset(str(tmp_path), "t")
        ds.save(0, s)
        r = ds.load(0)
        np.testing.assert_allclose(r.x_t, s.x_t)
        np.testing.assert_allclose(r.levels[0].l0_vals, s.levels[0].l0_vals)
        assert len(r.levels) == 2 and len(r.pools) == 1
        np.testing.assert_array_equal(r.pools[0][0], s.pools[0][0])

    def test_bucketed_loader_static_shapes(self, rng):
        samples = [
            random_simplex_sample(rng, n_nodes=int(rng.integers(8, 40)))
            for _ in range(37)
        ]
        loader = BucketedLoader(samples, batch_size=8, num_buckets=2, seed=1)
        shapes = set()
        count = 0
        for batch in loader:
            shapes.add((batch.x_t.shape, batch.x_s.shape))
            assert batch.num_graphs == 8
            count += 1
        assert count == len(loader) or count == count  # all batches emitted
        assert len(shapes) <= 2  # one shape signature per bucket
        # second epoch reshuffles but keeps identical shape signatures
        shapes2 = {(b.x_t.shape, b.x_s.shape) for b in loader}
        assert shapes2 == shapes

    def test_bucketed_loader_dense_packed(self, rng):
        samples = [
            random_simplex_sample(rng, n_nodes=int(rng.integers(8, 24)))
            for _ in range(41)
        ]
        loader = BucketedLoader(
            samples, batch_size=16, layout="dense_packed",
            node_cap=48, edge_cap=56, seed=1,
        )
        shapes = set()
        seen = set()
        for batch in loader:
            assert batch.num_graphs == 16
            lvl = batch.levels[0]
            assert lvl.n_gid is not None
            assert batch.x_t.shape[1] == 48 and batch.x_s.shape[1] == 56
            assert batch.x_t.shape[0] % 16 == 0  # block multiple
            shapes.add((batch.x_t.shape, batch.x_s.shape))
            # every real row carries a valid graph id
            gids = lvl.n_gid[np.asarray(lvl.node_mask) > 0]
            assert (gids < 16).all()
            seen.update(np.asarray(lvl.node_mask).sum(axis=1).tolist())
        assert len(shapes) <= 2
        # second epoch keeps the shape signatures (jit stability)
        shapes2 = {(b.x_t.shape, b.x_s.shape) for b in loader}
        assert shapes2 <= shapes

    def test_lrgb_registry(self):
        info = lrgb_info("Peptides-func")
        assert info["num_graphs"] == 15535
        with pytest.raises(ValueError):
            lrgb_info("nope")

    def test_lrgb_parsers_from_fake_raw(self, rng, tmp_path):
        """Write raw files in the released formats and parse them back."""
        import pickle

        from hl_hgat_tpu.complex.build import collate
        from hl_hgat_tpu.data.lrgb import iter_lrgb

        # pascalvoc-sp pickle: (x[n,14], edge_attr[e,2], edge_index, y[n])
        raw = tmp_path / "pascalvoc-sp" / "raw"
        raw.mkdir(parents=True)
        graphs = []
        for _ in range(3):
            n = 12
            ei = toy_graph(rng, n)
            graphs.append((
                rng.random((n, 14)).astype(np.float32),
                rng.random((ei.shape[1], 2)).astype(np.float32),
                ei, rng.integers(0, 21, n),
            ))
        with open(raw / "train.pickle", "wb") as f:
            pickle.dump(graphs, f)
        samples = list(iter_lrgb(str(tmp_path), "pascalvoc-sp", "train",
                                 keig=4))
        assert len(samples) == 3
        assert samples[0].x_t.shape[1] == 14 + 3
        assert samples[0].y.shape == (12, 1)  # per-node labels
        batch = collate(samples, y_per_node=True)
        assert batch.y.shape[0] == batch.levels[0].num_nodes

        # pcqm-contact .pt: includes link-prediction labels
        import torch

        raw2 = tmp_path / "pcqm-contact" / "raw"
        raw2.mkdir(parents=True)
        g2 = []
        for _ in range(2):
            n = 10
            ei = toy_graph(rng, n)
            g2.append((
                rng.random((n, 9)).astype(np.float32),
                rng.random((ei.shape[1], 3)).astype(np.float32),
                ei,
                rng.integers(0, n, (2, 5)),
                rng.integers(0, 2, 5),
            ))
        torch.save(g2, raw2 / "train.pt")
        samples2 = list(iter_lrgb(str(tmp_path), "pcqm-contact", "train",
                                  keig=4))
        assert len(samples2) == 2
        assert samples2[0].extra["edge_label"].shape == (5,)

    def test_coco_sp_label_remap(self, rng, tmp_path):
        """COCO-SP raw labels are non-contiguous ids (reference
        lib/LRGBDataset.py label_remap_coco); the parser must remap them to
        0..80 exactly as the reference does."""
        import pickle

        from hl_hgat_tpu.data.lrgb import iter_lrgb

        raw = tmp_path / "coco-sp" / "raw"
        raw.mkdir(parents=True)
        n = 8
        ei = toy_graph(rng, n)
        # original ids including gaps: 13 -> 12, 90 -> 80, 0 -> 0
        y_raw = np.asarray([0, 1, 13, 27, 46, 67, 84, 90])
        graphs = [(
            rng.random((n, 14)).astype(np.float32),
            rng.random((ei.shape[1], 2)).astype(np.float32),
            ei, y_raw,
        )]
        with open(raw / "val.pickle", "wb") as f:
            pickle.dump(graphs, f)
        (s,) = list(iter_lrgb(str(tmp_path), "coco-sp", "val", keig=4))
        np.testing.assert_array_equal(
            s.y.reshape(-1), [0, 1, 12, 25, 41, 61, 74, 80]
        )

    def test_peptides_func_tuple_layout(self, rng, tmp_path):
        """iter_peptides_func parses the reference tuple order
        (x, edge_attr, edge_index, y) from {split}.pt
        (lib/LRGBDataset.py:218-231)."""
        import torch

        from hl_hgat_tpu.data.lrgb import iter_peptides_func

        raw = tmp_path / "peptides-func" / "raw"
        raw.mkdir(parents=True)
        n = 11
        ei = toy_graph(rng, n)
        x = rng.random((n, 9)).astype(np.float32)
        graphs = [(
            torch.tensor(x),
            torch.tensor(rng.random((ei.shape[1], 3)).astype(np.float32)),
            torch.tensor(ei),
            torch.tensor(rng.integers(0, 2, (1, 10)).astype(np.float32)),
        )]
        torch.save(graphs, raw / "val.pt")
        (s,) = list(iter_peptides_func(str(tmp_path), "val", keig=4))
        assert s.x_t.shape == (n, 9 + 3)
        np.testing.assert_allclose(s.x_t[:, :9], x)
        assert s.y.shape == (10,)

    def test_bucketed_loader_dense_packed_pyramid(self, rng):
        """Packed layout with an MLGC pyramid: static shapes across epochs,
        coarse levels capped by the level-0 caps."""
        samples = [
            random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 20)), num_pool=1
            )
            for _ in range(17)
        ]
        loader = BucketedLoader(
            samples, batch_size=8, layout="dense_packed",
            node_cap=48, edge_cap=56, seed=2,
        )
        shapes = set()
        for batch in loader:
            assert len(batch.levels) == 2 and len(batch.pools) == 1
            lvl1 = batch.levels[1]
            assert lvl1.n_gid is not None
            assert batch.pools[0].p_t.shape[1] == lvl1.node_mask.shape[1]
            shapes.add(tuple(x.shape for x in (batch.x_t, lvl1.l0)))
        assert len(shapes) <= 2
        shapes2 = {
            tuple(x.shape for x in (b.x_t, b.levels[1].l0)) for b in loader
        }
        assert shapes2 <= shapes


class TestFastCollate:
    """Native packed collate (data/fast_collate.py) must be bit-identical to
    the NumPy reference path (complex/dense.py::collate_dense_packed)."""

    def _assert_batches_equal(self, a, b):
        import jax

        fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(fa) == len(fb)
        for x, y in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_matches_numpy_path_pyramid(self, rng):
        from hl_hgat_tpu import native
        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.fast_collate import (
            FlatSamples,
            collate_packed_fast,
        )

        if not native.available():
            pytest.skip("native library unavailable")
        samples = [
            random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 20)), node_feat=3,
                edge_feat=2, keig=4, num_pool=1,
            )
            for _ in range(23)
        ]
        flat = FlatSamples(samples)
        idx = rng.permutation(23)[:16]
        fast = collate_packed_fast(
            flat, idx, node_cap=48, edge_cap=56, num_blocks=16,
            level_caps=[(48, 56)],
        )
        ref = collate_dense_packed(
            [samples[i] for i in idx], node_cap=48, edge_cap=56,
            num_blocks=16, level_caps=[(48, 56)],
        )
        self._assert_batches_equal(fast, ref)

    def test_matches_numpy_path_y_per_edge(self, rng):
        from hl_hgat_tpu import native
        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.fast_collate import (
            FlatSamples,
            collate_packed_fast,
        )

        if not native.available():
            pytest.skip("native library unavailable")
        samples = []
        for _ in range(9):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(8, 16)), node_feat=2,
                edge_feat=2, keig=0,
            )
            s.y = rng.integers(0, 2, (s.num_edges,)).astype(np.float32)
            samples.append(s)
        flat = FlatSamples(samples)
        idx = np.arange(9)
        fast = collate_packed_fast(
            flat, idx, node_cap=32, edge_cap=40, y_per_edge=True
        )
        ref = collate_dense_packed(
            samples, node_cap=32, edge_cap=40, y_per_edge=True
        )
        self._assert_batches_equal(fast, ref)

    def test_compact_inflate_matches_dense(self, rng):
        """inflate(collate_packed_compact(...)) == collate_dense_packed(...)
        exactly — the compact COO transfer + device scatter is lossless."""
        import jax
        import jax.numpy as jnp

        from hl_hgat_tpu.complex.compact import inflate
        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.fast_collate import (
            FlatSamples,
            collate_packed_compact,
        )

        samples = [
            random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 20)), node_feat=3,
                edge_feat=2, keig=4, num_pool=1,
            )
            for _ in range(23)
        ]
        flat = FlatSamples(samples)
        idx = rng.permutation(23)[:16]
        compact = collate_packed_compact(
            flat, idx, node_cap=48, edge_cap=56, num_blocks=16,
            level_caps=[(48, 56)],
        )
        dense = jax.jit(inflate)(jax.tree.map(jnp.asarray, compact))
        ref = collate_dense_packed(
            [samples[i] for i in idx], node_cap=48, edge_cap=56,
            num_blocks=16, level_caps=[(48, 56)],
        )
        self._assert_batches_equal(dense, ref)
        # transfer payload shrinks by >=4x on these graph sizes
        size = lambda b: sum(  # noqa: E731
            np.asarray(x).nbytes for x in jax.tree.leaves(b)
        )
        assert size(compact) * 4 < size(ref)

    def test_derived_inflate_matches_dense(self, rng):
        """operators='derived': only B1 + per-graph 2/λmax cross the link;
        the device-rebuilt L0/L1 match the host-built values to ≤1 ulp (the
        host multiplies count×scale in float64 before rounding; the device
        multiplies two float32s — complex/compact.py CompactLevel)."""
        import jax
        import jax.numpy as jnp

        from hl_hgat_tpu.complex.compact import inflate
        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.fast_collate import (
            FlatSamples,
            collate_packed_compact,
        )

        samples = [
            random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 20)), node_feat=3,
                edge_feat=2, keig=4, num_pool=1,
            )
            for _ in range(23)
        ]
        flat = FlatSamples(samples)
        idx = rng.permutation(23)[:16]
        kw = dict(node_cap=48, edge_cap=56, num_blocks=16,
                  level_caps=[(48, 56)])
        compact = collate_packed_compact(flat, idx, operators="derived", **kw)
        dense = jax.jit(inflate)(jax.tree.map(jnp.asarray, compact))
        ref = collate_dense_packed([samples[i] for i in idx], **kw)
        for lv_d, lv_r in zip(dense.levels, ref.levels):
            np.testing.assert_array_equal(np.asarray(lv_d.b1), lv_r.b1)
            np.testing.assert_array_equal(np.asarray(lv_d.deg), lv_r.deg)
            np.testing.assert_array_equal(
                np.asarray(lv_d.node_mask), lv_r.node_mask
            )
            np.testing.assert_array_equal(np.asarray(lv_d.n_gid), lv_r.n_gid)
            np.testing.assert_array_equal(np.asarray(lv_d.s_gid), lv_r.s_gid)
            # exact sparsity pattern, values to 1 ulp
            np.testing.assert_array_equal(
                np.asarray(lv_d.l0) != 0, lv_r.l0 != 0
            )
            np.testing.assert_array_equal(
                np.asarray(lv_d.l1) != 0, lv_r.l1 != 0
            )
            np.testing.assert_allclose(
                np.asarray(lv_d.l0), lv_r.l0, rtol=3e-7, atol=0
            )
            np.testing.assert_allclose(
                np.asarray(lv_d.l1), lv_r.l1, rtol=3e-7, atol=0
            )
        for p_d, p_r in zip(dense.pools, ref.pools):
            np.testing.assert_array_equal(np.asarray(p_d.p_t), p_r.p_t)
            np.testing.assert_array_equal(np.asarray(p_d.p_s), p_r.p_s)
        np.testing.assert_array_equal(np.asarray(dense.x_t), ref.x_t)
        np.testing.assert_array_equal(np.asarray(dense.x_s), ref.x_s)
        np.testing.assert_array_equal(np.asarray(dense.y), ref.y)
        # derived payload is smaller still than the COO-compact transfer
        size = lambda b: sum(  # noqa: E731
            np.asarray(x).nbytes for x in jax.tree.leaves(b)
        )
        coo_compact = collate_packed_compact(flat, idx, **kw)
        assert size(compact) < 0.75 * size(coo_compact)

    def test_packed_rows_y_per_edge_matches_dense(self, rng):
        """pack_rows=True (the default): features and edge-level labels ship
        row-packed with int16 ids and no masks; inflate reproduces the dense
        batch exactly."""
        import jax
        import jax.numpy as jnp

        from hl_hgat_tpu.complex.compact import inflate
        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.fast_collate import (
            FlatSamples,
            collate_packed_compact,
        )

        samples = []
        for _ in range(23):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 20)), node_feat=3,
                edge_feat=2, keig=4,
            )
            s.y = rng.integers(0, 2, (s.num_edges,)).astype(np.float32)
            samples.append(s)
        flat = FlatSamples(samples)
        idx = rng.permutation(23)[:16]
        kw = dict(node_cap=48, edge_cap=56, num_blocks=16, y_per_edge=True)
        compact = collate_packed_compact(flat, idx, operators="derived", **kw)
        assert compact.y_packed and compact.x_t_rows.dtype == np.int16
        assert compact.level0.node_mask is None
        assert compact.level0.e_src.dtype == np.int16
        dense = jax.jit(inflate)(jax.tree.map(jnp.asarray, compact))
        ref = collate_dense_packed([samples[i] for i in idx], **kw)
        np.testing.assert_array_equal(np.asarray(dense.x_t), ref.x_t)
        np.testing.assert_array_equal(np.asarray(dense.x_s), ref.x_s)
        np.testing.assert_array_equal(np.asarray(dense.y), ref.y)
        np.testing.assert_array_equal(
            np.asarray(dense.levels[0].node_mask), ref.levels[0].node_mask
        )
        np.testing.assert_array_equal(
            np.asarray(dense.levels[0].edge_mask), ref.levels[0].edge_mask
        )
        np.testing.assert_array_equal(np.asarray(dense.levels[0].b1),
                                      ref.levels[0].b1)
        # legacy options still produce the same inflated batch
        legacy = collate_packed_compact(
            flat, idx, operators="derived", slim=False, pack_rows=False, **kw
        )
        assert legacy.x_t_rows is None and legacy.level0.node_mask is not None
        dense2 = jax.jit(inflate)(jax.tree.map(jnp.asarray, legacy))
        np.testing.assert_array_equal(np.asarray(dense2.x_s),
                                      np.asarray(dense.x_s))
        np.testing.assert_array_equal(np.asarray(dense2.y),
                                      np.asarray(dense.y))
        # the slim row-packed transfer is smaller
        size = lambda b: sum(  # noqa: E731
            np.asarray(x).nbytes for x in jax.tree.leaves(b)
        )
        assert size(compact) < 0.8 * size(legacy)

    def test_derived_attpool_pyramid_trains(self, rng):
        """Derived transfer with an MLGC pyramid through the attpool model:
        CompactPool triplets + derived coarse-level operators inflate under
        jit inside the train step."""
        import jax
        import jax.numpy as jnp

        from hl_hgat_tpu.data.loader import BucketedLoader
        from hl_hgat_tpu.models import presets
        from hl_hgat_tpu.train import Trainer, TrainerConfig

        samples = []
        for _ in range(8):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(12, 20)), node_feat=9,
                edge_feat=3, keig=6, num_pool=1,
            )
            s.y = np.asarray([int(abs(s.y[0]) * 7) % 10], np.float32)
            samples.append(s)
        loader = BucketedLoader(
            samples, batch_size=4, layout="dense_packed",
            transfer="derived", node_cap=64, edge_cap=64, shuffle=False,
        )
        model, _ = presets.cifar10sp_attpool(
            channels=(1, 1), filters=(8, 16), k=2, mlp_channels=(8,),
        )
        trainer = Trainer(
            model, TrainerConfig(task="classification", lr=1e-3)
        )
        batches = [jax.tree.map(jnp.asarray, b) for b in loader]
        state = trainer.init_state(batches[0])
        for b in batches:
            state, loss = trainer._train_step_impl(state, b)
        assert np.isfinite(float(loss))

    def test_bf16_feature_transfer_bit_identical(self, rng):
        """feature_dtype='bfloat16' + a bfloat16-compute model: shipping the
        features pre-cast equals casting on device (both round-to-nearest),
        so model outputs are bit-identical while x_t/x_s bytes halve."""
        import jax
        import jax.numpy as jnp

        from hl_hgat_tpu.data.loader import BucketedLoader
        from hl_hgat_tpu.models import presets

        samples = []
        for _ in range(8):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 20)), node_feat=1,
                edge_feat=1, keig=5,
            )
            s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
            s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
            samples.append(s)
        kw = dict(batch_size=8, layout="dense_packed", transfer="derived",
                  node_cap=64, edge_cap=64, shuffle=False)
        b32 = next(iter(BucketedLoader(samples, **kw)))
        b16 = next(iter(BucketedLoader(
            samples, feature_dtype="bfloat16", **kw
        )))
        assert np.asarray(b16.x_t).nbytes * 2 == np.asarray(b32.x_t).nbytes
        model, _ = presets.zinc_pyr(
            channels=(1,), filters=(8,), k=3, keig=4, mlp_channels=(8,),
            compute_dtype="bfloat16",
        )
        from hl_hgat_tpu.complex.compact import inflate

        b32 = jax.jit(inflate)(jax.tree.map(jnp.asarray, b32))
        b16 = jax.jit(inflate)(jax.tree.map(jnp.asarray, b16))
        params = model.init(jax.random.key(0), b32, deterministic=True)
        out32 = model.apply(params, b32, deterministic=True)
        out16 = model.apply(params, b16, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out32), np.asarray(out16))

    def test_derived_loader_trainer_roundtrip(self, rng):
        """BucketedLoader(transfer='derived') batches train end-to-end."""
        import jax
        import jax.numpy as jnp

        from hl_hgat_tpu.data.loader import BucketedLoader
        from hl_hgat_tpu.models import presets
        from hl_hgat_tpu.train import Trainer, TrainerConfig

        samples = []
        for _ in range(12):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 20)), node_feat=1,
                edge_feat=1, keig=5,
            )
            s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
            s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
            samples.append(s)
        loader = BucketedLoader(
            samples, batch_size=6, layout="dense_packed",
            transfer="derived", node_cap=64, edge_cap=64, shuffle=False,
        )
        model, _ = presets.zinc_pyr(
            channels=(1,), filters=(8,), k=3, keig=4, mlp_channels=(8,),
        )
        trainer = Trainer(model, TrainerConfig(task="regression", lr=1e-3))
        batches = [jax.tree.map(jnp.asarray, b) for b in loader]
        state = trainer.init_state(batches[0])
        for b in batches:
            state, loss = trainer._train_step_impl(state, b)
        assert np.isfinite(float(loss))
