"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.data import synthetic_zinc_batch
from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
from hl_hgat_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    partition_complex,
    shard_batches,
    sharded_spmm,
    stack_batches,
)
from hl_hgat_tpu.parallel.data_parallel import replicate_state
from hl_hgat_tpu.parallel.graph_parallel import place_shard
from hl_hgat_tpu.train import Trainer, TrainerConfig
from hl_hgat_tpu.train.losses import l1_loss


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh(data=8)


@pytest.fixture(scope="module")
def mesh_graph():
    return make_mesh(data=1, graph=8)


def small_model():
    return HLHGCNNGraph(
        cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
        num_classes=1,
    )


class TestDataParallel:
    def test_dp_matches_single_device(self, mesh8):
        model = small_model()
        loss_fn = lambda out, b: l1_loss(out.reshape(-1), b.y.reshape(-1))  # noqa: E731
        trainer = Trainer(model, TrainerConfig(task="regression", lr=1e-2,
                                               weight_decay=1e-3))
        base = synthetic_zinc_batch(4, seed=0, keig=8)
        state = trainer.init_state(jax.tree.map(jnp.asarray, base))

        # 8 IDENTICAL sub-batches → pmean(grads) == local grads
        stacked = stack_batches([base] * 8)
        sharded = shard_batches(stacked, mesh8)
        dp_step = make_dp_train_step(model, trainer.tx, loss_fn, mesh8)
        dp_state, dp_loss = dp_step(
            replicate_state(state, mesh8), sharded
        )

        local_state, local_loss = trainer._train_step(
            trainer.init_state(jax.tree.map(jnp.asarray, base)),
            jax.tree.map(jnp.asarray, base),
        )
        np.testing.assert_allclose(
            float(dp_loss), float(local_loss), rtol=1e-4
        )
        # parameters after the step agree (same grads, same optimizer)
        for a, b in zip(
            jax.tree.leaves(dp_state.params), jax.tree.leaves(local_state.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_dp_distinct_batches_runs(self, mesh8):
        model = small_model()
        loss_fn = lambda out, b: l1_loss(out.reshape(-1), b.y.reshape(-1))  # noqa: E731
        trainer = Trainer(model, TrainerConfig(task="regression"))
        batches = [synthetic_zinc_batch(2, seed=s, keig=8) for s in range(8)]
        # identical pad shapes required for stacking
        from hl_hgat_tpu.complex.build import LevelPad, collate, pad_spec
        from hl_hgat_tpu.data.synthetic import random_simplex_sample

        rng = np.random.default_rng(0)
        samples = [
            [random_simplex_sample(rng, n_nodes=20, keig=8) for _ in range(2)]
            for _ in range(8)
        ]
        pads = [LevelPad(64, 64, 512, 512)]
        batches = [collate(s, pads) for s in samples]
        stacked = stack_batches(batches)
        sharded = shard_batches(stacked, mesh8)
        state = trainer.init_state(jax.tree.map(jnp.asarray, batches[0]))
        dp_step = make_dp_train_step(model, trainer.tx, loss_fn, mesh8)
        new_state, loss = dp_step(replicate_state(state, mesh8), sharded)
        assert np.isfinite(float(loss))
        assert int(new_state.step) == 1


class TestGraphParallel:
    def test_sharded_spmm_matches_dense(self, mesh_graph, rng):
        from hl_hgat_tpu.ops import spmm_dense_oracle

        n, f, nnz = 96, 6, 700
        rows = rng.integers(0, n, nnz).astype(np.int32)
        cols = rng.integers(0, n, nnz).astype(np.int32)
        vals = rng.standard_normal(nnz).astype(np.float32)
        x = rng.standard_normal((n, f)).astype(np.float32)

        shard, x_blocks = partition_complex(rows, cols, vals, n, 8, x=x)
        shard, x_blocks = place_shard(shard, jnp.asarray(x_blocks), mesh_graph)
        out = sharded_spmm(shard, x_blocks, mesh_graph)
        out_flat = np.asarray(out).reshape(-1, f)[:n]
        expect = spmm_dense_oracle(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(x), n,
        )
        np.testing.assert_allclose(out_flat, expect, rtol=1e-4, atol=1e-5)

    def test_halo_spmm_matches_dense(self, mesh_graph, rng):
        from hl_hgat_tpu.ops import spmm_dense_oracle
        from hl_hgat_tpu.parallel.graph_parallel import (
            halo_spmm,
            partition_halo,
            place_shard,
        )
        import jax.numpy as jnp

        n, f, nnz = 96, 6, 600
        rows = rng.integers(0, n, nnz).astype(np.int32)
        cols = rng.integers(0, n, nnz).astype(np.int32)
        vals = rng.standard_normal(nnz).astype(np.float32)
        x = rng.standard_normal((n, f)).astype(np.float32)
        shard, x_blocks = partition_halo(rows, cols, vals, n, 8, x=x)
        shard, x_blocks = place_shard(shard, jnp.asarray(x_blocks), mesh_graph)
        out = halo_spmm(shard, x_blocks, mesh_graph)
        out_flat = np.asarray(out).reshape(-1, f)[:n]
        expect = spmm_dense_oracle(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(x), n,
        )
        np.testing.assert_allclose(out_flat, expect, rtol=1e-4, atol=1e-5)

    def test_halo_volume_smaller_than_allgather(self, rng):
        """A locality-friendly (banded) operator needs far less halo traffic
        than the all-gather strategy."""
        from hl_hgat_tpu.parallel.graph_parallel import partition_halo

        n = 256
        rows = np.arange(n - 1, dtype=np.int32)
        cols = (np.arange(n - 1) + 1).astype(np.int32)
        vals = np.ones(n - 1, np.float32)
        shard, _ = partition_halo(rows, cols, vals, n, 8)
        halo_total = 7 * shard.halo_per_round
        assert halo_total < shard.n_local  # banded: ~1 remote row per part

    def test_partition_balance(self, rng):
        rows = rng.integers(0, 100, 400).astype(np.int32)
        cols = rng.integers(0, 100, 400).astype(np.int32)
        vals = rng.standard_normal(400).astype(np.float32)
        shard, _ = partition_complex(rows, cols, vals, 100, 8)
        assert shard.n_local == 13
        assert shard.rows.shape[0] == 8
