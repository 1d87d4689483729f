"""MXU-routed segment ops + merged conv pair (round-2 profile levers).

segment_mean_onehot / embed_lookup replace scatter-based readout and
embedding-gradient paths with one-hot matmuls (ops/segment.py); the merged
node/edge conv execution (nn/blocks.py merged_conv_pair, default OFF —
measured slower, kept as a design point) must stay exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.ops.segment import (
    embed_lookup,
    segment_mean,
    segment_mean_onehot,
)


class TestOneHotSegment:
    def test_matches_scatter_mean(self, rng):
        x = rng.standard_normal((50, 7)).astype(np.float32)
        gid = rng.integers(0, 6, 50).astype(np.int32)
        w = (rng.random(50) > 0.3).astype(np.float32)
        a = segment_mean(jnp.asarray(x), jnp.asarray(gid), 6,
                         weights=jnp.asarray(w))
        b = segment_mean_onehot(jnp.asarray(x), jnp.asarray(gid), 6,
                                weights=jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    def test_dump_bucket_rows_dropped(self, rng):
        """Ids >= num_segments (padding dump idiom) must contribute nothing
        — matching XLA scatter semantics."""
        x = np.ones((8, 3), np.float32)
        gid = np.asarray([0, 0, 1, 1, 2, 5, 9, 9], np.int32)  # 5,9,9 dumped
        out = segment_mean_onehot(jnp.asarray(x), jnp.asarray(gid), 3)
        np.testing.assert_allclose(np.asarray(out), np.ones((3, 3)))

    def test_bf16_close(self, rng):
        x = rng.standard_normal((40, 5)).astype(np.float32)
        gid = rng.integers(0, 4, 40).astype(np.int32)
        w = np.ones(40, np.float32)
        a = segment_mean(jnp.asarray(x), jnp.asarray(gid), 4,
                         weights=jnp.asarray(w))
        b = segment_mean_onehot(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(gid), 4,
            weights=jnp.asarray(w),
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b, np.float32), rtol=2e-2, atol=2e-2
        )

    def test_grad_matches_scatter_path(self, rng):
        x = rng.standard_normal((30, 4)).astype(np.float32)
        gid = rng.integers(0, 5, 30).astype(np.int32)
        w = (rng.random(30) > 0.2).astype(np.float32)

        def f_scatter(x):
            return segment_mean(x, jnp.asarray(gid), 5,
                                weights=jnp.asarray(w)).sum()

        def f_onehot(x):
            return segment_mean_onehot(x, jnp.asarray(gid), 5,
                                       weights=jnp.asarray(w)).sum()

        g1 = jax.grad(f_scatter)(jnp.asarray(x))
        g2 = jax.grad(f_onehot)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)


class TestEmbedLookup:
    def test_forward_and_table_grad(self, rng):
        table = rng.standard_normal((9, 6)).astype(np.float32)
        ids = rng.integers(0, 9, (4, 11)).astype(np.int32)

        out = embed_lookup(jnp.asarray(table), jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(out), table[ids])

        def loss_custom(t):
            return (embed_lookup(t, jnp.asarray(ids)) ** 2).sum()

        def loss_autodiff(t):
            return (t[jnp.asarray(ids)] ** 2).sum()

        g1 = jax.grad(loss_custom)(jnp.asarray(table))
        g2 = jax.grad(loss_autodiff)(jnp.asarray(table))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-5)


class TestMergedPair:
    @pytest.mark.parametrize("spill", [False, True])
    def test_model_equal_merged_vs_separate(self, rng, spill):
        """Full flagship-shaped model: merged conv execution equals the
        separate path (params identical, outputs + grads equal)."""
        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.synthetic import random_simplex_sample
        from hl_hgat_tpu.models import presets
        from hl_hgat_tpu.nn.blocks import use_merged_pair
        from hl_hgat_tpu.train import Trainer, TrainerConfig

        n_lo, n_hi = (40, 60) if spill else (10, 20)
        samples = [
            random_simplex_sample(
                rng, n_nodes=int(rng.integers(n_lo, n_hi)), node_feat=3,
                edge_feat=3, keig=0,
            )
            for _ in range(6)
        ]
        batch = collate_dense_packed(samples, node_cap=32, edge_cap=64)
        batch = jax.tree.map(jnp.asarray, batch)
        model, _ = presets.zinc_pyr(
            channels=(1, 1), filters=(8, 16), k=3, keig=2,
            use_embedding=False, mlp_channels=(8,),
        )
        tr = Trainer(model, TrainerConfig(task="regression", lr=1e-2))

        try:
            # _train_step donates its state: one fresh (seed-identical)
            # init per variant
            use_merged_pair(False)
            s_a, loss_a = tr._train_step(tr.init_state(batch), batch)
            use_merged_pair(True)
            s_b, loss_b = tr._train_step(tr.init_state(batch), batch)
        finally:
            use_merged_pair(False)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s_a.params),
                        jax.tree.leaves(s_b.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
