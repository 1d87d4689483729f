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

    def test_pepfunc_raw_pt_reference_tuples(self, tmp_path):
        """peptides-func raw format per reference lib/LRGBDataset.py:218-231:
        torch-saved {split}.pt of (x[n,9], edge_attr[e,3], edge_index[2,e],
        y[1,10]) TUPLES — tuple order must match the reference exactly."""
        import torch

        root = str(tmp_path)
        raw = os.path.join(root, "peptides-func", "raw")
        os.makedirs(raw)
        rng = np.random.default_rng(4)
        graphs = []
        for _ in range(3):
            n = 15
            ei = _ring_edges(n)
            # distinctive shapes so a swapped unpack cannot pass by accident
            graphs.append((
                torch.tensor(rng.random((n, 9)), dtype=torch.float32),
                torch.tensor(
                    rng.random((ei.shape[1], 3)), dtype=torch.float32
                ),
                torch.tensor(ei),
                torch.tensor(
                    rng.integers(0, 2, (1, 10)), dtype=torch.float32
                ),
            ))
        torch.save(graphs, os.path.join(raw, "train.pt"))
        samples = load_samples("pepfunc", root, "train", keig=5, num_pool=1)
        assert len(samples) == 3
        s = samples[0]
        assert s.x_t.shape == (15, 9 + 4)  # 9 raw + (keig-1) PE
        assert s.x_s.shape[1] == 3 + 4
        assert s.y.shape == (10,)
        assert len(s.levels) == 2 and len(s.pools) == 1  # MLGC pyramid
        # cache round trip serves identical arrays
        again = load_samples("pepfunc", root, "train", keig=5, num_pool=1)
        np.testing.assert_array_equal(again[1].x_s, samples[1].x_s)
        # loader -> one forward pass of the pepfunc model (end-to-end)
        from hl_hgat_tpu.data.loader import BucketedLoader
        from hl_hgat_tpu.models import presets

        loader = BucketedLoader(
            samples, batch_size=3, layout="dense_packed", node_cap=32,
            edge_cap=32, shuffle=False,
        )
        (batch,) = list(loader)
        model, _ = presets.pepfunc_attpool(
            channels=(1, 1), filters=(8, 8), k=2, keig=5, dropout=0.0,
            mlp_channels=(8,),
        )
        import jax

        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        out = model.apply(params, batch, deterministic=True)
        pred = out[0] if isinstance(out, tuple) else out
        assert np.isfinite(np.asarray(pred)).all()

    def test_missing_raw_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_samples("tsp", str(tmp_path), "train")

    def test_aug_variants_tsp(self, tmp_path):
        """aug_variants preprocesses A independent dropout rolls per graph
        (variant 0 unaugmented), stored consecutively for the loader."""
        root = str(tmp_path)
        rng = np.random.default_rng(3)
        graphs = []
        for _ in range(4):
            n = 14
            ei = _ring_edges(n)
            y = np.zeros(ei.shape[1], np.float32)
            y[: n // 2] = 1.0  # some tour edges to protect
            graphs.append(
                dict(
                    pos=rng.random((n, 2)).astype(np.float32),
                    edge_index=ei, y=y,
                    edge_attr=rng.random(ei.shape[1]).astype(np.float32),
                )
            )
        with open(os.path.join(root, "tsp_train.pkl"), "wb") as f:
            pickle.dump(graphs, f)
        A = 3
        samples = load_samples("tsp", root, "train", aug_variants=A)
        assert len(samples) == 4 * A
        for g in range(4):
            group = samples[g * A : (g + 1) * A]
            # same graph, same labels, different aug mask rolls possible
            for s in group:
                np.testing.assert_array_equal(s.y, group[0].y)
                np.testing.assert_array_equal(s.x_t, group[0].x_t)
            assert (group[0].x_s[:, -1] == 1.0).all()  # variant 0 clean
        # at least one roll across the dataset actually dropped something
        assert any(
            (s.x_s[:, -1] == 0.0).any() for s in samples
        ), "no aug variant rolled a dropout — seeds degenerate?"
        # eval splits never get variants
        with open(os.path.join(root, "tsp_val.pkl"), "wb") as f:
            pickle.dump(graphs, f)
        val = load_samples("tsp", root, "val", aug_variants=A)
        assert len(val) == 4
        # the seed keys augmented caches: fold 1 gets its own rolls
        s1 = load_samples("tsp", root, "train", aug_variants=A, seed=1)
        assert os.path.exists(
            os.path.join(root, "tsp-train-k100p0a3s1_manifest.json")
        )
        assert len(s1) == 4 * A
        # invalid variant counts are rejected up front
        import pytest as _pytest

        with _pytest.raises(ValueError):
            load_samples("tsp", root, "train", aug_variants=0)

    def test_loader_cycles_variants_per_epoch(self, rng):
        from hl_hgat_tpu.data.loader import BucketedLoader
        from hl_hgat_tpu.data.synthetic import random_simplex_sample

        A, N = 3, 6
        samples = []
        for g in range(N):
            base = random_simplex_sample(
                rng, n_nodes=12, node_feat=2, edge_feat=2, keig=0
            )
            for v in range(A):
                import copy

                s = copy.deepcopy(base)
                s.x_t[:] = g + 100 * v  # mark (graph, variant)
                samples.append(s)
        loader = BucketedLoader(
            samples, batch_size=N, layout="dense_packed", node_cap=64,
            edge_cap=64, shuffle=False, variants=A,
        )
        assert len(loader) == 1
        seen = []
        for _ in range(3):  # three epochs
            (batch,) = list(loader)
            # recover (graph, variant) marks from the features
            marks = set()
            x = np.asarray(batch.x_t)
            m = np.asarray(batch.levels[0].node_mask) > 0
            gid = np.asarray(batch.levels[0].n_gid)
            for g in range(N):
                vals = x[..., 0][(gid == g) & m]
                marks.add((int(vals[0]) % 100, int(vals[0]) // 100))
            assert len(marks) == N  # one variant per graph
            seen.append(frozenset(marks))
        # epochs serve different variant assignments
        assert len(set(seen)) == 3
