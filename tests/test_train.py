"""Training layer: loss/metric parity vs torch/sklearn + end-to-end smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hl_hgat_tpu.train import (
    ReduceLROnPlateau,
    Trainer,
    TrainerConfig,
    accuracy,
    adam_l2,
    average_precision,
    bce_logits_loss,
    focal_loss,
    l1_loss,
    per_graph_binary_f1,
    softmax_ce_loss,
)
from hl_hgat_tpu.train.metrics import eval_ap


class TestLossParity:
    def test_bce_and_focal_match_torch(self, rng):
        import torch

        logits = rng.standard_normal(40).astype(np.float32)
        targets = (rng.random(40) > 0.5).astype(np.float32)
        t_bce = torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(logits), torch.from_numpy(targets)
        ).item()
        np.testing.assert_allclose(
            float(bce_logits_loss(jnp.asarray(logits), jnp.asarray(targets))),
            t_bce, rtol=1e-5,
        )
        # reference FocalLoss (lib/Loss_function.py:14-26)
        logpt = -t_bce
        pt = np.exp(logpt)
        t_focal = -((1 - pt) ** 2) * 0.25 * logpt * 1e4
        np.testing.assert_allclose(
            float(focal_loss(jnp.asarray(logits), jnp.asarray(targets))),
            t_focal, rtol=1e-4,
        )

    def test_ce_matches_torch(self, rng):
        import torch

        logits = rng.standard_normal((12, 5)).astype(np.float32)
        labels = rng.integers(0, 5, 12)
        t = torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits), torch.from_numpy(labels)
        ).item()
        np.testing.assert_allclose(
            float(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(labels))),
            t, rtol=1e-5,
        )

    def test_masked_l1(self, rng):
        pred = jnp.asarray([1.0, 2.0, 100.0])
        tgt = jnp.asarray([0.0, 0.0, 0.0])
        mask = jnp.asarray([1.0, 1.0, 0.0])
        np.testing.assert_allclose(float(l1_loss(pred, tgt, mask)), 1.5)


class TestMetricParity:
    def test_ap_matches_sklearn(self, rng):
        from sklearn.metrics import average_precision_score

        y = (rng.random(60) > 0.6).astype(np.float32)
        s = rng.standard_normal(60)
        np.testing.assert_allclose(
            average_precision(y, s), average_precision_score(y, s), rtol=1e-6
        )

    def test_eval_ap_skips_single_class_tasks(self, rng):
        y = np.zeros((20, 3), np.float32)
        y[:, 0] = (rng.random(20) > 0.5).astype(np.float32)
        y[:, 1] = 1.0  # single-class: skipped
        y[:, 2] = (rng.random(20) > 0.5).astype(np.float32)
        s = rng.standard_normal((20, 3))
        from sklearn.metrics import average_precision_score

        expect = np.mean(
            [average_precision_score(y[:, i], s[:, i]) for i in (0, 2)]
        )
        np.testing.assert_allclose(eval_ap(y, s), expect, rtol=1e-6)

    def test_per_graph_f1(self):
        # graph 0: perfect; graph 1: half precision
        logits = jnp.asarray([2.0, -2.0, 2.0, 2.0])
        y = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        seg = jnp.asarray([0, 0, 1, 1], jnp.int32)
        f1 = float(per_graph_binary_f1(logits, y, seg, 2))
        np.testing.assert_allclose(f1, (1.0 + 2 / 3) / 2, rtol=1e-5)


class TestOptim:
    def test_adam_l2_matches_torch(self, rng):
        import torch

        w0 = rng.standard_normal(6).astype(np.float32)
        g = rng.standard_normal(6).astype(np.float32)

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = torch.optim.Adam([tw], lr=1e-2, weight_decay=1e-3)
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

        tx = adam_l2(1e-2, weight_decay=1e-3)
        params = jnp.asarray(w0)
        st = tx.init(params)
        for _ in range(2):
            up, st = tx.update(jnp.asarray(g), st, params)
            params = params + up
        np.testing.assert_allclose(params, tw.detach().numpy(), rtol=1e-5,
                                   atol=1e-7)

    def test_plateau(self):
        sch = ReduceLROnPlateau(lr=1.0, patience=1, factor=0.5)
        assert sch.step(1.0) == 1.0  # improvement
        assert sch.step(1.0) == 1.0  # bad 1
        assert sch.step(1.0) == 0.5  # bad 2 > patience → halve
        assert sch.step(0.5) == 0.5  # improvement resets

    def test_plateau_max_mode_matches_torch(self):
        """mode='max' (the CIFAR script schedules on validation ACCURACY,
        reference main_cifar10SP...py:201-202) must replay torch's
        decisions on an arbitrary metric sequence."""
        import torch

        metrics = [0.1, 0.2, 0.2, 0.2, 0.2, 0.2, 0.25, 0.25, 0.25, 0.25,
                   0.25, 0.3, 0.1, 0.1, 0.1, 0.1, 0.1]
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=1.0)
        tsch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="max", patience=2, factor=0.5, min_lr=1e-3,
            threshold=1e-3)
        ours = ReduceLROnPlateau(lr=1.0, patience=2, factor=0.5,
                                 min_lr=1e-3, threshold=1e-3, mode="max")
        for m in metrics:
            tsch.step(m)
            assert ours.step(m) == opt.param_groups[0]["lr"], m


class TestEndToEnd:
    def test_zinc_smoke_learns(self):
        """Few-epoch ZINC-like run: loss must drop and gating must fire."""
        from hl_hgat_tpu.data import synthetic_zinc_batch
        from hl_hgat_tpu.models import presets

        batches = [
            jax.tree.map(jnp.asarray, synthetic_zinc_batch(6, seed=s, keig=8))
            for s in range(3)
        ]
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph

        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1,), filters=(12,), k=2, init_k=2),
            num_classes=1,
        )
        cfg = TrainerConfig(
            task="regression", lr=5e-3, weight_decay=0.0,
            save_gate=None, metric_mode="min", denorm=1.0,
        )
        trainer = Trainer(model, cfg)
        state = trainer.init_state(batches[0])
        state = trainer.fit(
            state, lambda: batches[:2], lambda: batches[2:],
            epochs=8, verbose=False,
        )
        losses = [h["train_loss"] for h in trainer.history]
        assert losses[-1] < losses[0]
        assert any(h["improved"] for h in trainer.history)

    def test_prng_impl_rbg(self):
        """TrainerConfig.prng_impl='rbg' (TPU-native generator, +8.4% on
        the dropout-0.25 pooled family step): param init must stay on the
        threefry stream (identical weights across impls), and a dropout-
        active train step must run finite under the rbg training stream."""
        from hl_hgat_tpu.data import synthetic_zinc_batch
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph

        batch = jax.tree.map(
            jnp.asarray, synthetic_zinc_batch(6, seed=0, keig=8)
        )
        model = HLHGCNNGraph(
            cfg=BackboneConfig(
                channels=(1,), filters=(12,), k=2, init_k=2, dropout=0.25,
            ),
            num_classes=1,
        )
        states, trainers = {}, {}
        for impl in ("threefry2x32", "rbg"):
            tr = Trainer(model, TrainerConfig(
                task="regression", lr=5e-3, weight_decay=0.0,
                prng_impl=impl,
            ))
            trainers[impl] = tr
            states[impl] = tr.init_state(batch)
        for a, b in zip(
            jax.tree.leaves(states["threefry2x32"].params),
            jax.tree.leaves(states["rbg"].params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        s, loss = trainers["rbg"]._train_step(states["rbg"], batch)
        assert np.isfinite(float(loss))
        # the stream key really is the requested implementation
        from jax.random import key_impl

        assert "rbg" in str(key_impl(s.rng))

    def test_prng_impl_rbg_checkpoint_roundtrip(self, tmp_path):
        """An rbg training stream must survive save/restore with its impl
        (checkpoint.py rewraps key data with the TARGET key's impl — the
        wrap_key_data default would silently hand back a threefry key)."""
        from hl_hgat_tpu.data import synthetic_zinc_batch
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
        from hl_hgat_tpu.train.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        batch = jax.tree.map(
            jnp.asarray, synthetic_zinc_batch(4, seed=0, keig=8)
        )
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            num_classes=1,
        )
        tr = Trainer(model, TrainerConfig(task="regression", prng_impl="rbg"))
        state = tr.init_state(batch)
        save_checkpoint(str(tmp_path / "ck"), state, extra=dict(epoch=1))
        restored = restore_checkpoint(str(tmp_path / "ck"), state)
        from jax.random import key_impl

        assert "rbg" in str(key_impl(restored.rng))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(restored.rng)),
            np.asarray(jax.random.key_data(state.rng)),
        )
        # and the restored stream continues the run
        s2, loss = tr._train_step(restored, batch)
        assert np.isfinite(float(loss))

    def test_auto_resume(self, tmp_path):
        from hl_hgat_tpu.data import synthetic_zinc_batch
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph

        batches = [
            jax.tree.map(jnp.asarray, synthetic_zinc_batch(4, seed=s, keig=8))
            for s in range(2)
        ]
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            num_classes=1,
        )
        cfg = TrainerConfig(task="regression", ckpt_dir=str(tmp_path / "ck"),
                            save_gate=None)
        t1 = Trainer(model, cfg)
        state = t1.init_state(batches[0])
        t1.fit(state, lambda: batches[:1], lambda: batches[1:], epochs=3,
               verbose=False)
        saved_epochs = [h["epoch"] for h in t1.history if h["improved"]]
        assert saved_epochs, "no checkpoint was written"

        # a fresh trainer resumes from the checkpointed epoch
        t2 = Trainer(model, cfg)
        state2 = t2.init_state(batches[0])
        restored, start = t2.maybe_restore(state2)
        assert start == saved_epochs[-1] + 1
        assert t2.best_metric == t1.best_metric

    def test_periodic_checkpoint_resumes_without_improvement(self, tmp_path):
        """ckpt_every saves the FULL state each N epochs to <dir>/latest —
        a crashed run resumes from its last epoch even when the metric gate
        never fired (SURVEY §5 failure-recovery plan)."""
        from hl_hgat_tpu.data import synthetic_zinc_batch
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph

        batches = [
            jax.tree.map(jnp.asarray, synthetic_zinc_batch(4, seed=s, keig=8))
            for s in range(2)
        ]
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            num_classes=1,
        )
        cfg = TrainerConfig(
            task="regression", ckpt_dir=str(tmp_path / "ck"),
            save_gate=-1.0, metric_mode="min",  # impossible gate: no best
            ckpt_every=2,
        )
        t1 = Trainer(model, cfg)
        state = t1.init_state(batches[0])
        t1.fit(state, lambda: batches[:1], lambda: batches[1:], epochs=4,
               verbose=False)
        assert not any(h["improved"] for h in t1.history)

        t2 = Trainer(model, cfg)
        restored, start = t2.maybe_restore(t2.init_state(batches[0]))
        assert start == 5  # epoch 4 periodic save is the newest
        assert int(np.asarray(restored.step)) == 4
        # prefer='best' (test/inference semantics) ignores the periodic
        # save — with no gated best checkpoint it reports nothing to load
        _, start_best = t2.maybe_restore(
            t2.init_state(batches[0]), prefer="best"
        )
        assert start_best == 1

    def test_checkpoint_roundtrip(self, tmp_path):
        from hl_hgat_tpu.data import synthetic_zinc_batch
        from hl_hgat_tpu.models import presets
        from hl_hgat_tpu.train.checkpoint import (
            load_metadata,
            restore_checkpoint,
            save_checkpoint,
        )

        batch = jax.tree.map(jnp.asarray, synthetic_zinc_batch(4, keig=8))
        model, _ = presets.pepfunc_pyr(channels=(1,), filters=(8,), k=2)
        trainer = Trainer(model, TrainerConfig(task="multilabel"))
        state = trainer.init_state(batch)
        state, _ = trainer._train_step(state, batch)
        save_checkpoint(str(tmp_path / "ck"), state, extra=dict(epoch=1))
        restored = restore_checkpoint(str(tmp_path / "ck"), state)

        def as_np(x):
            if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key
            ):
                return np.asarray(jax.random.key_data(x))
            return np.asarray(x)

        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_allclose(as_np(a), as_np(b), rtol=1e-6)
        assert load_metadata(str(tmp_path / "ck"))["epoch"] == 1


class TestEdgeBinaryDenseEval:
    def test_evaluate_tsp_dense_and_packed(self, rng):
        """edge_binary loss + per-graph F1 must work in all three layouts."""
        from hl_hgat_tpu.complex.build import collate
        from hl_hgat_tpu.complex.dense import collate_dense, collate_dense_packed
        from hl_hgat_tpu.data.synthetic import random_simplex_sample
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNTsp

        samples = []
        for _ in range(5):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(8, 16)), node_feat=3,
                edge_feat=2, keig=0,
            )
            s.x_s[:, -1] = 1.0
            s.y = (rng.random(s.num_edges) > 0.5).astype(np.float32)
            samples.append(s)
        model = HLHGCNNTsp(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            mlp_channels=(8,),
        )
        tr = Trainer(model, TrainerConfig(task="edge_binary", metric_mode="max"))
        batches = {
            "coo": collate(samples, y_per_edge=True),
            "dense": collate_dense(samples, y_per_edge=True),
            "packed": collate_dense_packed(
                samples, node_cap=32, edge_cap=40, y_per_edge=True
            ),
        }
        batches = {k: jax.tree.map(jnp.asarray, v) for k, v in batches.items()}
        state = tr.init_state(batches["coo"])
        results = {}
        for name, b in batches.items():
            st = tr.init_state(b)
            st, loss = tr._train_step(st, b)
            assert np.isfinite(float(loss))
            _, metric = tr.evaluate(state, [b])
            results[name] = metric
        # same params + same graphs => same per-graph F1 in every layout
        assert results["coo"] == pytest.approx(results["dense"], abs=1e-5)
        assert results["coo"] == pytest.approx(results["packed"], abs=1e-5)


class TestCompactPipeline:
    def test_fit_with_compact_loader(self, tmp_path):
        """End-to-end Trainer.fit on a compact-transfer packed loader: init,
        train epochs, evaluate — the batches cross as COO triplets and
        densify inside the jitted steps (complex/compact.py)."""
        import numpy as np

        from hl_hgat_tpu.data.loader import BucketedLoader
        from hl_hgat_tpu.data.synthetic import random_simplex_sample
        from hl_hgat_tpu.models import presets

        rng = np.random.default_rng(7)
        samples = []
        for _ in range(24):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 18)), node_feat=4,
                edge_feat=3, keig=4,
            )
            s.y = np.asarray([float(s.num_edges)], np.float32)
            samples.append(s)
        loader = BucketedLoader(
            samples, batch_size=8, layout="dense_packed", transfer="compact",
            node_cap=32, edge_cap=40, seed=1,
        )
        model, _ = presets.zinc_pyr(
            channels=(1,), filters=(8,), k=2, keig=4, mlp_channels=(8,),
            use_embedding=False,
        )
        tr = Trainer(model, TrainerConfig(task="regression", lr=1e-2))
        first = next(iter(loader))
        from hl_hgat_tpu.complex.compact import CompactBatch

        assert isinstance(first, CompactBatch)
        state = tr.init_state(jax.tree.map(jnp.asarray, first))
        to_dev = lambda it: (  # noqa: E731
            jax.tree.map(jnp.asarray, b) for b in it
        )
        state = tr.fit(
            state, lambda: to_dev(loader), lambda: to_dev(loader),
            epochs=2, verbose=False,
        )
        assert len(tr.history) == 2
        assert np.isfinite(tr.history[-1]["val_loss"])
