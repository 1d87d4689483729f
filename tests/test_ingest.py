"""Real-data ingestion (hl_hgat_tpu/data/ingest.py): raw public formats →
GraphSamples → npz cache round trip."""

import os
import pickle

import numpy as np
import pytest

from hl_hgat_tpu.data.ingest import cache_size, load_samples


def _ring_edges(n):
    src = np.arange(n)
    dst = (src + 1) % n
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    return ei.astype(np.int64)


def _fake_zinc_raw(root, n_mols=6, with_index=True):
    """The PyG ZINC raw layout: {split}.pickle list-of-dicts of torch
    tensors + optional {split}.index subset selector."""
    import torch

    rng = np.random.default_rng(0)
    mols = []
    for _ in range(n_mols):
        n = int(rng.integers(8, 14))
        adj = np.zeros((n, n), np.int64)
        for i in range(n - 1):  # chain + a random extra bond
            t = int(rng.integers(1, 4))
            adj[i, i + 1] = adj[i + 1, i] = t
        a, b = rng.choice(n, 2, replace=False)
        adj[a, b] = adj[b, a] = 1
        mols.append(
            dict(
                atom_type=torch.tensor(rng.integers(0, 21, n)),
                bond_type=torch.tensor(adj),
                logP_SA_cycle_normalized=torch.tensor([rng.normal()]),
            )
        )
    os.makedirs(root, exist_ok=True)
    for split in ("train", "val"):
        with open(os.path.join(root, f"{split}.pickle"), "wb") as f:
            pickle.dump(mols, f)
        if with_index:
            with open(os.path.join(root, f"{split}.index"), "w") as f:
                f.write(",".join(str(i) for i in range(n_mols - 2)))
    return n_mols


class TestIngest:
    def test_zinc_raw_and_cache(self, tmp_path):
        root = str(tmp_path)
        n = _fake_zinc_raw(root)
        samples = load_samples("zinc", root, "train", keig=6)
        assert len(samples) == n - 2  # .index subset honored
        s = samples[0]
        # embed-id column + keig-1 PE columns (reference feature layout)
        assert s.x_t.shape[1] == 1 + 5
        assert s.x_s.shape[1] == 1 + 5
        assert s.x_t[:, 0].max() < 21 and s.x_s[:, 0].min() >= 0
        assert np.isfinite(s.y).all()
        # second call hits the npz cache and reproduces the arrays
        assert cache_size(root, "zinc", "train", 6, 0) == n - 2
        again = load_samples("zinc", root, "train", keig=6)
        np.testing.assert_array_equal(again[0].x_t, s.x_t)
        np.testing.assert_array_equal(
            again[0].levels[0].l1_vals, s.levels[0].l1_vals
        )
        # the cache key carries the build params: a different keig must NOT
        # serve the stale arrays
        other = load_samples("zinc", root, "train", keig=4)
        assert other[0].x_t.shape[1] == 1 + 3
        # an incomplete cache (manifest missing) is rebuilt, not truncated
        os.remove(os.path.join(root, "zinc-train-k6p0_manifest.json"))
        assert cache_size(root, "zinc", "train", 6, 0) == 0

    def test_tsp_exported_pkl(self, tmp_path):
        root = str(tmp_path)
        rng = np.random.default_rng(1)
        graphs = []
        for _ in range(3):
            n = 12
            ei = _ring_edges(n)
            graphs.append(
                dict(
                    pos=rng.random((n, 2)).astype(np.float32),
                    edge_index=ei,
                    edge_attr=rng.random(ei.shape[1]).astype(np.float32),
                    y=(rng.random(ei.shape[1]) > 0.5).astype(np.float32),
                )
            )
        with open(os.path.join(root, "tsp_train.pkl"), "wb") as f:
            pickle.dump(graphs, f)
        samples = load_samples("tsp", root, "train")
        assert len(samples) == 3
        s = samples[0]
        assert s.x_t.shape == (12, 2)
        assert s.x_s.shape[1] == 2  # dist + aug-mask column
        assert s.y.shape[0] == s.levels[0].num_edges

    def test_cifar10sp_exported_pkl_with_pyramid(self, tmp_path):
        root = str(tmp_path)
        rng = np.random.default_rng(2)
        graphs = []
        for _ in range(2):
            n = 20
            ei = _ring_edges(n)
            graphs.append(
                dict(
                    x=rng.random((n, 3)).astype(np.float32),
                    pos=rng.random((n, 2)).astype(np.float32),
                    edge_index=ei,
                    edge_attr=rng.random(ei.shape[1]).astype(np.float32),
                    y=np.asarray([7]),
                )
            )
        with open(os.path.join(root, "cifar10sp_train.pkl"), "wb") as f:
            pickle.dump(graphs, f)
        samples = load_samples("cifar10sp", root, "train", keig=5, num_pool=1)
        s = samples[0]
        assert len(s.levels) == 2 and len(s.pools) == 1
        # x_t = [rgb(3), pos(2), pe(4)]
        assert s.x_t.shape[1] == 3 + 2 + 4
        assert s.y[0] == 7

    def test_missing_raw_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_samples("tsp", str(tmp_path), "train")
