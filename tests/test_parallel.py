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

    def test_dp_spill_matches_single_device(self, mesh8):
        """Large-graph (BlockDiagMatrix) batches through the DP step: graphs
        spanning several dense blocks carry banded/spill operators, and the
        sharded step must equal the single-device step on them (the
        large-graph layout x parallelism product)."""
        from hl_hgat_tpu.complex.build import build_complex
        from hl_hgat_tpu.complex.dense import (
            BlockDiagMatrix,
            collate_dense_packed,
            reorder_sample,
        )

        rng = np.random.default_rng(7)
        samples = []
        for _ in range(4):
            n = int(rng.integers(56, 88))  # > node_cap: spans 2-3 blocks
            src = np.arange(n - 1)
            dst = np.arange(1, n)
            extra = rng.integers(0, n, (2, 40))
            keep = extra[0] != extra[1]
            src = np.concatenate([src, np.minimum(extra[0], extra[1])[keep]])
            dst = np.concatenate([dst, np.maximum(extra[0], extra[1])[keep]])
            key = src.astype(np.int64) * n + dst
            uniq = np.unique(key)
            ei = np.stack([uniq // n, uniq % n]).astype(np.int64)
            e = ei.shape[1]
            s_ = build_complex(
                ei, n,
                x_t=rng.standard_normal((n, 6)).astype(np.float32),
                x_s=rng.standard_normal((e, 6)).astype(np.float32),
                y=rng.standard_normal(1).astype(np.float32),
            )
            samples.append(reorder_sample(s_))
        batch = collate_dense_packed(samples, node_cap=32, edge_cap=96)
        lvl = batch.levels[0]
        assert isinstance(lvl.l0, BlockDiagMatrix), "batch must exercise spill"
        assert (lvl.l0.band_up is not None or lvl.l0.spill is not None)

        model = small_model()
        loss_fn = lambda out, b: l1_loss(out.reshape(-1), b.y.reshape(-1))  # noqa: E731
        trainer = Trainer(model, TrainerConfig(task="regression", lr=1e-2))
        state = trainer.init_state(jax.tree.map(jnp.asarray, batch))
        dp_step = make_dp_train_step(model, trainer.tx, loss_fn, mesh8)
        sharded = shard_batches(stack_batches([batch] * 8), mesh8)
        dp_state, dp_loss = dp_step(replicate_state(state, mesh8), sharded)

        local_state, local_loss = trainer._train_step(
            trainer.init_state(jax.tree.map(jnp.asarray, batch)),
            jax.tree.map(jnp.asarray, batch),
        )
        np.testing.assert_allclose(float(dp_loss), float(local_loss), rtol=1e-4)
        for a, b in zip(
            jax.tree.leaves(dp_state.params),
            jax.tree.leaves(local_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_dp_spill_tsp500_distinct_shards(self, mesh8):
        """TSP-500-shaped banded-spill batches at the SHIPPING caps (S=128,
        edge_cap=512, KNN graphs spanning several blocks) with DISTINCT
        sub-batches per shard — uneven per-shard band/spill nnz is the
        failure mode the toy identical-shard test cannot catch (VERDICT r3
        weak #6).  The DP step must equal the manual pmean reference."""
        import optax

        from hl_hgat_tpu.complex.build import build_complex
        from hl_hgat_tpu.complex.dense import (
            BlockDiagMatrix,
            collate_dense_packed,
            reorder_sample,
        )
        from hl_hgat_tpu.models.backbone import HLHGCNNTsp
        from hl_hgat_tpu.train.losses import focal_loss

        rng = np.random.default_rng(3)

        def knn_sample(n, k=5):
            pts = rng.random((n, 2))
            d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
            np.fill_diagonal(d2, np.inf)
            nbr = np.argsort(d2, axis=1)[:, :k]
            src = np.repeat(np.arange(n), k)
            dst = nbr.reshape(-1)
            lo, hi = np.minimum(src, dst), np.maximum(src, dst)
            uniq = np.unique(lo.astype(np.int64) * n + hi)
            ei = np.stack([uniq // n, uniq % n]).astype(np.int64)
            e = ei.shape[1]
            dist = np.sqrt(d2[ei[0], ei[1]]).astype(np.float32)
            x_s = np.concatenate(
                [dist[:, None], np.ones((e, 1), np.float32)], axis=1
            )
            s = build_complex(
                ei, n, x_t=pts.astype(np.float32), x_s=x_s,
                y=(rng.random(e) > 0.8).astype(np.float32),
            )
            return reorder_sample(s, y_per_edge=True)

        # 8 distinct sub-batches, 2 graphs each, 150-400 nodes (the real
        # TSP spread) at the shipping caps; shapes pinned via num_blocks +
        # a coarse spill pad so stacking works with uneven nnz
        sizes = rng.integers(150, 400, (8, 2))
        collate_kw = dict(node_cap=128, edge_cap=512, y_per_edge=True,
                          num_blocks=8, spill_pad_multiple=4096)
        batches = [
            collate_dense_packed([knn_sample(int(a)), knn_sample(int(b))],
                                 **collate_kw)
            for a, b in sizes
        ]
        lvl = batches[0].levels[0]
        assert isinstance(lvl.l0, BlockDiagMatrix)
        assert lvl.l1.band_up is not None  # banded path exercised
        model = HLHGCNNTsp(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            mlp_channels=(8,),
        )
        loss_fn = lambda out, b: focal_loss(  # noqa: E731
            out.reshape(-1), b.y.reshape(-1),
            b.levels[0].edge_mask.reshape(-1),
        )
        trainer = Trainer(model, TrainerConfig(task="edge_binary", lr=1e-2))
        state = trainer.init_state(jax.tree.map(jnp.asarray, batches[0]))
        # SGD for the equality check: with DISTINCT shards some leaves'
        # mean gradient is cancellation-dominated, and Adam's first-step
        # scale invariance amplifies f32 summation-order noise to ±lr —
        # under SGD the param delta IS the pmean'd gradient, so the
        # comparison is meaningful at float tolerance
        import dataclasses as _dc

        tx = optax.sgd(1e-2)
        state = _dc.replace(state, opt_state=tx.init(state.params))

        # manual reference FIRST (the DP step donates its state buffers):
        # per-batch grads at the same params, tree-mean, one optimizer step
        # (exactly what pmean-of-grads must equal)
        def compute(params, batch):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)},
            )
            if isinstance(out, tuple):
                out = out[0]
            return loss_fn(out, batch), mut["batch_stats"]

        per = [
            jax.value_and_grad(compute, has_aux=True)(
                state.params, jax.tree.map(jnp.asarray, b)
            )
            for b in batches
        ]
        losses = [p[0][0] for p in per]
        grads = jax.tree.map(
            lambda *xs: sum(xs) / len(xs), *[p[1] for p in per]
        )
        ref_loss = float(sum(jax.tree.map(float, losses)) / len(losses))
        updates, _ = tx.update(grads, state.opt_state, state.params)
        ref_params = optax.apply_updates(state.params, updates)
        ref_params = jax.tree.map(np.asarray, ref_params)  # host copies

        dp_step = make_dp_train_step(model, tx, loss_fn, mesh8)
        sharded = shard_batches(stack_batches(batches), mesh8)
        dp_state, dp_loss = dp_step(replicate_state(state, mesh8), sharded)

        np.testing.assert_allclose(float(dp_loss), ref_loss, rtol=1e-4)
        # atol=1e-5: the focal x1e4 loss amplifies f32 summation-order
        # noise in cancellation-dominated mean-grads to ~1e-6 in param
        # space; band/spill mishandling across uneven shards would show
        # as O(1)-relative differences, far above this bar
        for a, b in zip(jax.tree.leaves(dp_state.params),
                        jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
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

    def test_sharded_hl_layer_matches_dense_math(self, mesh_graph, rng,
                                                  graph_factory):
        """A full MSI+conv layer sharded over 8 devices equals the dense
        single-device math (BN in eval-mode form with psum'd stats)."""
        import jax.numpy as jnp

        from hl_hgat_tpu.complex.build import (
            boundary_dense,
            build_structure,
            hodge_laplacians,
        )
        from hl_hgat_tpu.parallel.sharded_layer import (
            HLLayerWeights,
            build_sharded_complex,
            pad_features,
            sharded_hl_layer,
        )

        n = 48
        src, dst = graph_factory(n=n, extra_edges=40)
        st = build_structure(src, dst, n)
        e = st.num_edges
        c, f, k = 6, 5, 3
        x_t = rng.standard_normal((n, c)).astype(np.float32)
        x_s = rng.standard_normal((e, c)).astype(np.float32)

        def lin(ci, co):
            return (rng.standard_normal((ci, co)).astype(np.float32) * 0.3,
                    rng.standard_normal(co).astype(np.float32) * 0.1)

        w1t, b1t = lin(2 * c, f)
        w2t, b2t = lin(f, f)
        w1s, b1s = lin(2 * c, f)
        w2s, b2s = lin(f, f)
        cwt = rng.standard_normal((k, f, f)).astype(np.float32) * 0.3
        cbt = rng.standard_normal(f).astype(np.float32) * 0.1
        cws = rng.standard_normal((k, f, f)).astype(np.float32) * 0.3
        cbs = rng.standard_normal(f).astype(np.float32) * 0.1
        bns = tuple(
            (np.abs(rng.standard_normal(f)).astype(np.float32) + 0.5,
             rng.standard_normal(f).astype(np.float32) * 0.1)
            for _ in range(6)
        )
        weights = HLLayerWeights(
            wv_node1=w1t, bv_node1=b1t, wv_node2=w2t, bv_node2=b2t,
            wv_edge1=w1s, bv_edge1=b1s, wv_edge2=w2s, bv_edge2=b2s,
            conv_t_w=cwt, conv_t_b=cbt, conv_s_w=cws, conv_s_b=cbs,
            bn_scales=bns,
        )

        # ---- dense single-device oracle ----
        b1 = boundary_dense(src, dst, n)
        l0, l1, _ = hodge_laplacians(src, dst, n)
        deg = np.abs(b1).sum(1) + 1e-6

        def bn(x, sc):
            mean = x.mean(0)
            var = x.var(0)
            return (x - mean) / np.sqrt(var + 1e-5) * sc[0] + sc[1]

        def relu(x):
            return np.maximum(x, 0)

        s2t = (np.abs(b1) @ x_s) / deg[:, None]
        t2s = np.abs(b1).T @ x_t / 2
        v_t = relu(bn(relu(bn(np.concatenate([s2t, x_t], 1) @ w1t + b1t,
                              bns[0])) @ w2t + b2t, bns[1]))
        v_s = relu(bn(relu(bn(np.concatenate([t2s, x_s], 1) @ w1s + b1s,
                              bns[2])) @ w2s + b2s, bns[3]))

        def laguerre(L, x, w, b):
            terms = [x, x - L @ x]
            j = 1
            for _ in range(2, w.shape[0]):
                terms.append((-L @ terms[-1] + (2 * j + 1) * terms[-1]
                              - j * terms[-2]) / (j + 1))
                j += 1
            return sum(t @ w[i] for i, t in enumerate(terms)) + b

        y_t = relu(bn(laguerre(l0, v_t, cwt, cbt), bns[4]))
        y_s = relu(bn(laguerre(l1, v_s, cws, cbs), bns[5]))

        # ---- sharded over 8 devices ----
        comp = build_sharded_complex(st, 8)
        comp_dev = jax.tree.map(jnp.asarray, comp)
        xt_s = jnp.asarray(pad_features(x_t, 8))
        xs_s = jnp.asarray(pad_features(x_s, 8))
        from hl_hgat_tpu.parallel.graph_parallel import place_shard

        comp_dev, (xt_s, xs_s) = place_shard(comp_dev, (xt_s, xs_s),
                                             mesh_graph)
        w_dev = jax.tree.map(jnp.asarray, weights)
        out_t, out_s = sharded_hl_layer(w_dev, comp_dev, xt_s, xs_s,
                                        mesh_graph)
        out_t = np.asarray(out_t).reshape(-1, f)[:n]
        out_s = np.asarray(out_s).reshape(-1, f)[:e]
        np.testing.assert_allclose(out_t, y_t, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(out_s, y_s, rtol=1e-3, atol=1e-4)

    def test_gp_full_model_matches_single_device(self, mesh_graph, rng):
        """The FULL graph-level model (backbone + MSI + Laguerre convs +
        attention pooling + readout + MLP head) on one complex sharded over
        8 devices equals the single-device forward, and one Adam train step
        produces identical parameters (grads flow through the halo SpMM)."""
        import jax.numpy as jnp

        from hl_hgat_tpu.complex.build import collate
        from hl_hgat_tpu.data.synthetic import random_simplex_sample
        from hl_hgat_tpu.parallel.gp_model import build_gp_batch
        from hl_hgat_tpu.train.losses import l1_loss

        sample = random_simplex_sample(
            rng, n_nodes=56, extra_edges=40, node_feat=6, edge_feat=4,
            keig=0, num_pool=1,
        )
        model = HLHGCNNGraph(
            cfg=BackboneConfig(
                channels=(1, 1), filters=(8, 8), k=3, init_k=2,
                pool_locs=(0,), att_locs=(0,), att_sigma="sigmoid",
            ),
            mlp_channels=(16,),
            num_classes=1,
        )

        oracle_batch = jax.tree.map(jnp.asarray, collate([sample]))
        gp_batch = build_gp_batch(sample, 8, mesh_graph)

        trainer = Trainer(
            model, TrainerConfig(task="regression", lr=1e-2, weight_decay=0.0)
        )
        state = trainer.init_state(oracle_batch)

        out_ref = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            oracle_batch, deterministic=True,
        )
        out_gp = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            gp_batch, deterministic=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_gp), np.asarray(out_ref), rtol=1e-4, atol=1e-5
        )

        # one full train step each; parameters must agree
        s_ref, loss_ref = trainer._train_step(state, oracle_batch)
        s_gp, loss_gp = trainer._train_step(
            trainer.init_state(oracle_batch), gp_batch
        )
        np.testing.assert_allclose(
            float(loss_gp), float(loss_ref), rtol=1e-4
        )
        for a, b in zip(
            jax.tree.leaves(s_gp.params), jax.tree.leaves(s_ref.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )

    def test_partition_balance(self, rng):
        rows = rng.integers(0, 100, 400).astype(np.int32)
        cols = rng.integers(0, 100, 400).astype(np.int32)
        vals = rng.standard_normal(400).astype(np.float32)
        shard, _ = partition_complex(rows, cols, vals, 100, 8)
        assert shard.n_local == 13
        assert shard.rows.shape[0] == 8


class TestDpCompact:
    @pytest.mark.parametrize("operators", ["coo", "derived"])
    def test_dp_compact_matches_dense(self, mesh8, operators):
        """DP step on compact sub-batches == DP step on the dense collate of
        the same graphs (per_device inflates after the shard strip).  The
        derived mode rebuilds L0/L1/deg from B1 on device inside the
        shard_map (None operator leaves must flow through stack/shard)."""
        from hl_hgat_tpu.data.fast_collate import (
            FlatSamples,
            collate_packed_compact,
            collate_packed_fast,
        )
        from hl_hgat_tpu.data.synthetic import random_simplex_sample

        rng = np.random.default_rng(3)
        samples = [
            random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 16)), node_feat=4,
                edge_feat=3, keig=4,
            )
            for _ in range(32)
        ]
        flat = FlatSamples(samples)
        kw = dict(node_cap=32, edge_cap=40, num_blocks=4,
                  nnz_caps=[(512, 512, 512)]
                  if operators == "coo" else [(0, 0, 512)],
                  operators=operators)
        # legacy transfer options for the tight post-Adam param compare:
        # slim/pack_rows reproduce the same inflated batch exactly
        # (tests/test_data.py) but the in-graph feature scatter changes XLA
        # fusion, which perturbs reductions at the 1e-7 reassociation level
        # — Adam's sign-like first step amplifies that on near-zero grads.
        # The default (slim, row-packed) mode is asserted at loss level
        # below.
        compact = [
            collate_packed_compact(flat, np.arange(i * 4, i * 4 + 4),
                                   slim=False, pack_rows=False, **kw)
            for i in range(8)
        ]
        compact_slim = [
            collate_packed_compact(flat, np.arange(i * 4, i * 4 + 4), **kw)
            for i in range(8)
        ]
        if operators == "derived":
            # the derived Laplacians differ from the host-built ones by
            # ≤1 ulp (complex/compact.py), and Adam's first step is
            # sign-like — it amplifies ulp-level grad noise into visible
            # param deltas.  The DP invariant under test is: the sharded
            # step on derived batches == the same step on their densified
            # form — so densify the SAME batches for the reference.
            from hl_hgat_tpu.complex.compact import inflate

            dense = [
                jax.tree.map(
                    np.asarray,
                    jax.jit(inflate)(jax.tree.map(jnp.asarray, c)),
                )
                for c in compact
            ]
        else:
            dense = [
                collate_packed_fast(
                    flat, np.arange(i * 4, i * 4 + 4),
                    node_cap=32, edge_cap=40, num_blocks=4,
                )
                for i in range(8)
            ]
        model = small_model()
        loss_fn = lambda out, b: l1_loss(  # noqa: E731
            out.reshape(-1), b.y.reshape(-1)
        )
        trainer = Trainer(
            model, TrainerConfig(task="regression", lr=1e-2)
        )
        dp_step = make_dp_train_step(model, trainer.tx, loss_fn, mesh8)
        outs = {}
        for name, subs in (("compact", compact), ("dense", dense),
                           ("slim", compact_slim)):
            # fresh state per branch: dp_step donates its (replicated) state
            # argument, whose buffers may alias the source via device_put
            st = replicate_state(
                trainer.init_state(jax.tree.map(jnp.asarray, dense[0])),
                mesh8,
            )
            st, loss = dp_step(
                st, shard_batches(stack_batches(subs), mesh8)
            )
            outs[name] = (st, float(loss))
        assert outs["compact"][1] == pytest.approx(outs["dense"][1], rel=1e-5)
        # default slim/row-packed transfer: same loss through the DP step
        assert outs["slim"][1] == pytest.approx(outs["dense"][1], rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(outs["compact"][0].params),
            jax.tree.leaves(outs["dense"][0].params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )


class TestDataParallelTrainer:
    def test_fit_loop_on_mesh(self, mesh8, tmp_path):
        """Full fit (plateau, gated checkpointing, eval) through the DP
        step on the 8-device mesh, per-device batches from the loader."""
        from hl_hgat_tpu.data.loader import BucketedLoader
        from hl_hgat_tpu.data.synthetic import random_simplex_sample
        from hl_hgat_tpu.parallel.dp_trainer import DataParallelTrainer

        rng = np.random.default_rng(5)
        samples = []
        for _ in range(40):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 16)), node_feat=4,
                edge_feat=3, keig=4,
            )
            # learnable target: mean node feature
            s.y = np.asarray([s.x_t[:, 0].mean()], np.float32)
            samples.append(s)
        # 40 samples / per-device batch 2 = 20 batches = 2 full groups of 8
        # + a trailing partial group of 4 (exercises the cycle fill)
        loader = BucketedLoader(
            samples, batch_size=2, layout="dense_packed", transfer="derived",
            node_cap=32, edge_cap=32, shuffle=False,
        )
        val = BucketedLoader(
            samples[:8], batch_size=2, layout="dense_packed",
            transfer="derived", node_cap=32, edge_cap=32, shuffle=False,
        )
        trainer = DataParallelTrainer(
            small_model(),
            TrainerConfig(
                task="regression", lr=1e-2,
                ckpt_dir=str(tmp_path / "ckpt"),
            ),
            mesh8,
        )
        state = trainer.init_state(
            jax.tree.map(jnp.asarray, next(iter(loader)))
        )
        state = trainer.fit(
            state, lambda: iter(loader), lambda: iter(val), epochs=3,
            verbose=False,
        )
        hist = trainer.history
        assert len(hist) == 3
        assert all(np.isfinite(h["val_loss"]) for h in hist)
        # training moves the loss
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        # the mesh step actually advanced the (replicated) step counter:
        # ceil(20/8)=3 groups per epoch x 3 epochs
        assert int(np.asarray(state.step)) == 9


class TestSharedSkeletonDP:
    def test_dp_shared_matches_single_device(self, mesh8):
        """Shared-skeleton dense batches (collate_dense_shared, broadcast
        [1, S, S] operators) through the sharded DP step == single device —
        the brain-family layout x parallelism product."""
        from hl_hgat_tpu.complex.build import build_structure
        from hl_hgat_tpu.complex.coarsen import build_pyramid
        from hl_hgat_tpu.complex.dense import collate_dense_shared
        from hl_hgat_tpu.data.datasets import brain_sample

        rng = np.random.default_rng(11)
        n = 16
        src = np.arange(n - 1).astype(np.int32)
        dst = np.arange(1, n).astype(np.int32)
        extra = rng.integers(0, n, (2, 24))
        keep = extra[0] != extra[1]
        uniq = np.unique(
            np.minimum(extra[0], extra[1])[keep].astype(np.int64) * n
            + np.maximum(extra[0], extra[1])[keep])
        src = np.concatenate([src, (uniq // n).astype(np.int32)])
        dst = np.concatenate([dst, (uniq % n).astype(np.int32)])
        order = np.argsort(src * n + dst)
        src, dst = src[order], dst[order]
        levels, pools = build_pyramid([build_structure(src, dst, n)], 0)

        samples = [
            brain_sample(rng.standard_normal((n, 8)), src, dst,
                         levels, pools, y=95.0 + i)
            for i in range(4)
        ]
        batch = collate_dense_shared(samples, multiple=1)
        # graph-level regression head on the dense layout
        model = small_model()
        loss_fn = lambda out, b: l1_loss(out.reshape(-1), b.y.reshape(-1))  # noqa: E731
        trainer = Trainer(model, TrainerConfig(task="regression", lr=1e-2))
        state = trainer.init_state(jax.tree.map(jnp.asarray, batch))
        dp_step = make_dp_train_step(model, trainer.tx, loss_fn, mesh8)
        sharded = shard_batches(stack_batches([batch] * 8), mesh8)
        dp_state, dp_loss = dp_step(replicate_state(state, mesh8), sharded)

        local_state, local_loss = trainer._train_step(
            trainer.init_state(jax.tree.map(jnp.asarray, batch)),
            jax.tree.map(jnp.asarray, batch),
        )
        np.testing.assert_allclose(float(dp_loss), float(local_loss),
                                   rtol=1e-4)
        for a, b in zip(
            jax.tree.leaves(dp_state.params),
            jax.tree.leaves(local_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
