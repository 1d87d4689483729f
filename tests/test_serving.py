"""Batch inference API (hl_hgat_tpu/serving.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.data.synthetic import random_simplex_sample
from hl_hgat_tpu.models import presets
from hl_hgat_tpu.serving import Predictor
from hl_hgat_tpu.train import Trainer, TrainerConfig


def _zinc_samples(rng, n):
    samples = []
    for _ in range(n):
        s = random_simplex_sample(
            rng, n_nodes=int(rng.integers(10, 18)), node_feat=1,
            edge_feat=1, keig=5,
        )
        s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
        s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
        samples.append(s)
    return samples


class TestPredictor:
    def test_graph_task_order_and_fill_stripping(self, rng, tmp_path):
        samples = _zinc_samples(rng, 11)  # 11 % 4 != 0: filler exercised
        model, _ = presets.zinc_pyr(
            channels=(1,), filters=(8,), k=3, keig=4, mlp_channels=(8,),
        )
        trainer = Trainer(
            model,
            TrainerConfig(task="regression", lr=1e-3, save_gate=None,
                          ckpt_dir=str(tmp_path / "ck")),
        )
        from hl_hgat_tpu.data.loader import BucketedLoader

        loader = BucketedLoader(
            samples, batch_size=4, layout="dense_packed",
            transfer="derived", node_cap=64, edge_cap=64, shuffle=False,
        )
        batches = [jax.tree.map(jnp.asarray, b) for b in loader]
        state = trainer.init_state(batches[0])
        state = trainer.fit(
            state, lambda: iter(batches), lambda: iter(batches[:1]),
            epochs=1, verbose=False,
        )

        pred = Predictor.from_checkpoint(
            model, str(tmp_path / "ck"), samples[:2], batch_size=4,
            node_cap=64, edge_cap=64,
        )
        out = pred(samples)
        assert out.shape[0] == 11
        assert np.isfinite(out).all()
        # unlabeled serving inputs work (y filled with zeros internally)
        import dataclasses

        unlabeled = [dataclasses.replace(s, y=None) for s in samples[:4]]
        np.testing.assert_allclose(
            pred(unlabeled), out[:4], rtol=1e-5, atol=1e-6
        )
        # per-sample determinism + order: predicting a sub-list matches
        sub = pred(samples[3:6])
        np.testing.assert_allclose(sub, out[3:6], rtol=1e-5, atol=1e-6)

    def test_edge_task_returns_per_graph_arrays(self, rng):
        samples = []
        for _ in range(5):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 16)), node_feat=2,
                edge_feat=2, keig=0,
            )
            s.x_s[:, -1] = 1.0
            s.y = (rng.random(s.num_edges) > 0.5).astype(np.float32)
            samples.append(s)
        model, _ = presets.tsp_pyr(
            channels=(1,), filters=(8,), k=2, mlp_channels=(8,)
        )
        # untrained weights are fine: this tests the batching geometry
        pred = Predictor(
            model, None, batch_size=2, edge_level=True, node_cap=64,
            edge_cap=64,
        )
        batch = next(iter(pred._loader(samples[:2])))
        from hl_hgat_tpu.complex.compact import maybe_inflate

        variables = model.init(
            {"params": jax.random.key(0)},
            maybe_inflate(jax.tree.map(jnp.asarray, batch)),
            deterministic=True,
        )
        pred.variables = variables
        outs = pred(samples)
        assert len(outs) == 5
        for s, o in zip(samples, outs):
            assert o.shape[0] == s.num_edges
            assert np.isfinite(o).all()


def test_brain_predictor_real_checkpoint():
    """BrainPredictor over the REAL structure + REAL imported checkpoint:
    predictions and attention maps match the direct model forward, in
    input order, across short final batches."""
    import os

    import jax
    import numpy as np

    if not os.path.isdir("/root/reference/HL-HGAT-DEMO/data"):
        import pytest

        pytest.skip("real brain data unavailable")

    from hl_hgat_tpu.data.brain import build_real_brain_pyramid
    from hl_hgat_tpu.models.presets import hgat_attpool
    from hl_hgat_tpu.serving import BrainPredictor
    from hl_hgat_tpu.utils.torch_import import (
        import_hgat_attpool,
        load_torch_state_dict,
    )

    levels, pools, _ = build_real_brain_pyramid(pool_num=2)
    n0, e0 = levels[0].num_nodes, levels[0].src.shape[0]
    n1, e1 = levels[1].num_nodes, levels[1].src.shape[0]
    model, _meta = hgat_attpool(
        pool_num=1, mlp_channels=(),
        nodes_per_graph=n1, edges_per_graph=e1,
        fine_nodes_per_graph=n0, fine_edges_per_graph=e0,
        demo_conv_compat=True,
    )
    rng = np.random.default_rng(0)
    series = [rng.standard_normal((n0, 48)) for _ in range(3)]

    from hl_hgat_tpu.complex.dense import collate_dense_shared
    from hl_hgat_tpu.data.datasets import brain_sample
    import jax.numpy as jnp

    probe = jax.tree.map(jnp.asarray, collate_dense_shared(
        [brain_sample(series[0], levels[0].src, levels[0].dst, levels,
                      pools, y=0.0, y_mean=0.0, y_std=1.0)] * 2,
        multiple=1))
    variables = model.init(jax.random.key(0), probe, deterministic=True)
    sd = load_torch_state_dict(
        "/root/reference/HL-HGAT-DEMO/weights/HL_HGAT_Brain.pt")
    variables, _ = import_hgat_attpool(variables, sd)

    pred = BrainPredictor(model, variables, levels, pools, batch_size=2)
    out = pred(series)  # 3 subjects through batch_size 2 → filler strip
    assert out["pred"].shape[0] == 3
    assert out["node_att"].shape == (3, n0)
    assert out["edge_att"].shape == (3, e0)
    # matches the direct forward on the same subjects
    direct = model.apply(
        variables,
        jax.tree.map(jnp.asarray, collate_dense_shared(
            [brain_sample(ts, levels[0].src, levels[0].dst, levels, pools,
                          y=0.0, y_mean=0.0, y_std=1.0) for ts in series[:2]],
            multiple=1)),
        deterministic=True)
    np.testing.assert_allclose(out["pred"][:2], np.asarray(direct[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        out["edge_att"][:2], np.asarray(direct[3]), rtol=1e-5, atol=1e-6)
