"""Forward/backward smoke + shape checks for every reference model preset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.data.synthetic import (
    synthetic_brain_batch,
    synthetic_tsp_batch,
    synthetic_zinc_batch,
)
from hl_hgat_tpu.models import presets


def to_device(batch):
    return jax.tree.map(jnp.asarray, batch)


def init_and_forward(model, batch, **kw):
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, deterministic=True, **kw,
    )
    out = model.apply(variables, batch, deterministic=True, **kw)
    return variables, out


def loss_and_grads(model, variables, batch):
    def loss_fn(params):
        out = model.apply(
            {**variables, "params": params}, batch,
            deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )[0]
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out**2)

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    return val, leaves


class TestGraphModels:
    def test_zinc_pyr_embedding(self):
        batch = to_device(synthetic_zinc_batch(4, keig=16, embed_ids=True))
        model, meta = presets.zinc_pyr(
            channels=(1, 1), filters=(16, 32), k=3, keig=8,
            mlp_channels=(16,),
        )
        variables, out = init_and_forward(model, batch)
        assert out.shape == (4, 1)
        val, leaves = loss_and_grads(model, variables, batch)
        assert np.isfinite(float(val))
        assert all(bool(jnp.isfinite(g).all()) for g in leaves)

    def test_zinc_attpool(self):
        batch = to_device(synthetic_zinc_batch(4, keig=8, num_pool=1))
        model, _ = presets.zinc_attpool(
            channels=(1, 1), filters=(8, 16), k=2, mlp_channels=(8,)
        )
        variables, out = init_and_forward(model, batch)
        assert out.shape == (4, 1)
        val, leaves = loss_and_grads(model, variables, batch)
        assert np.isfinite(float(val))

    def test_zinc_poolint3(self):
        batch = to_device(synthetic_zinc_batch(3, keig=8))
        model, _ = presets.zinc_poolint3_pyr(
            channels=(1, 1), filters=(8, 16), k=2
        )
        variables, out = init_and_forward(model, batch)
        assert out.shape == (3, 1)

    def test_pepfunc_attpool_script_variant(self):
        batch = to_device(synthetic_zinc_batch(4, keig=8, num_pool=1))
        # pool at a non-final block (the reference never pools at the last
        # block: its readout uses the post-pool coarse segment ids)
        model, meta = presets.pepfunc_attpool(
            channels=(1, 1, 1), filters=(8, 16, 16), k=2, pool_loc=1,
            mlp_channels=(8,),
        )
        assert meta["task"] == "multilabel"
        variables, out = init_and_forward(model, batch)
        assert out.shape == (4, 10)
        val, leaves = loss_and_grads(model, variables, batch)
        assert np.isfinite(float(val))

    def test_cifar_attpool_returns_atts(self):
        batch = to_device(synthetic_zinc_batch(4, keig=8, num_pool=1))
        model, _ = presets.cifar10sp_attpool(
            channels=(1, 1), filters=(8, 16), k=2, mlp_channels=(8,)
        )
        variables = model.init(
            {"params": jax.random.key(0)}, batch, deterministic=True
        )
        out, extras = model.apply(
            variables, batch, deterministic=True, return_atts=True
        )
        assert out.shape == (4, 10)
        (a_t, a_s), = extras["atts"]
        # max-normalized ReLU gates
        assert float(jnp.max(a_t)) <= 1.0 + 1e-5
        assert float(jnp.min(a_t)) >= 0.0


class TestTsp:
    def test_edge_level_output_masked(self):
        batch = to_device(synthetic_tsp_batch(2))
        model, _ = presets.tsp_pyr(
            channels=(1, 1), filters=(8, 16), k=2, mlp_channels=(16,)
        )
        variables, out = init_and_forward(model, batch)
        lvl = batch.levels[0]
        assert out.shape == (lvl.num_edges, 1)
        # padded edges have aug_mask 0 => logits exactly 0
        pad = np.asarray(lvl.edge_mask) == 0
        np.testing.assert_allclose(np.asarray(out)[pad], 0.0)
        val, leaves = loss_and_grads(model, variables, batch)
        assert np.isfinite(float(val))


class TestLrgbHeads:
    def test_node_classification_masked(self):
        from hl_hgat_tpu.complex.build import collate
        from hl_hgat_tpu.data.synthetic import random_simplex_sample

        rng = np.random.default_rng(0)
        samples = []
        for _ in range(3):
            s = random_simplex_sample(
                rng, n_nodes=12, node_feat=14, edge_feat=2, keig=4, y_dim=1
            )
            s.y = rng.integers(0, 21, (s.num_nodes, 1)).astype(np.float32)
            samples.append(s)
        batch = to_device(collate(samples, y_per_node=True))
        model, meta = presets.pascalvoc_node(
            channels=(1,), filters=(8,), k=2, mlp_channels=(8,)
        )
        assert meta["task"] == "node_classification"
        variables, out = init_and_forward(model, batch)
        lvl = batch.levels[0]
        assert out.shape == (lvl.num_nodes, 21)
        pad = np.asarray(lvl.node_mask) == 0
        np.testing.assert_allclose(np.asarray(out)[pad], 0.0)
        val, leaves = loss_and_grads(model, variables, batch)
        assert np.isfinite(float(val))

    def test_link_prediction_head(self):
        from hl_hgat_tpu.complex.build import collate
        from hl_hgat_tpu.data.synthetic import random_simplex_sample

        rng = np.random.default_rng(1)
        s = random_simplex_sample(
            rng, n_nodes=16, node_feat=9, edge_feat=3, keig=4
        )
        batch = to_device(collate([s]))
        n = s.num_nodes
        pairs = jnp.asarray(
            rng.integers(0, n, (10, 2)).astype(np.int32)
        )
        pair_mask = jnp.asarray((np.arange(10) < 7).astype(np.float32))
        model, meta = presets.pcqm_link(
            channels=(1,), filters=(8,), k=2, mlp_channels=(8,)
        )
        assert meta["task"] == "link_prediction"
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, pairs, pair_mask, deterministic=True,
        )
        out = model.apply(
            variables, batch, pairs, pair_mask, deterministic=True
        )
        assert out.shape == (10,)
        np.testing.assert_allclose(np.asarray(out)[7:], 0.0)

        def loss_fn(params):
            o, _ = model.apply(
                {**variables, "params": params}, batch, pairs, pair_mask,
                deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(2)},
            )
            return jnp.sum(o**2)

        val, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(val))
        assert all(
            np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads)
        )

    def test_macro_f1_and_mrr(self):
        from hl_hgat_tpu.train.metrics import macro_f1, mrr

        logits = np.array(
            [[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 2.0, 0.0], [9.0, 0, 0]]
        )
        labels = np.array([0, 1, 0, 0])
        # mask drops the last row; pred = [0,1,1], truth = [0,1,0]
        # class 0: tp=1 fp=0 fn=1 → f1=2/3; class1: tp=1 fp=1 fn=0 → 2/3
        f1 = macro_f1(logits, labels, 3, mask=np.array([1, 1, 1, 0]))
        np.testing.assert_allclose(f1, 2 / 3, rtol=1e-6)
        # ranks: 1 (no neg above 0.9) and 3 (two negs above 0.1)
        m = mrr(np.array([0.9, 0.1]),
                np.array([[0.5, 0.2, 0.1], [0.5, 0.2, 0.05]]))
        np.testing.assert_allclose(m, (1.0 + 1.0 / 3.0) / 2.0, rtol=1e-6)


class TestBrain:
    def test_abcd_attpool(self):
        batch, n_f, e_f = synthetic_brain_batch(3, n_rois=24, t_len=32,
                                                num_pool=1)
        batch = to_device(batch)
        model, _ = presets.abcd_attpool(
            channels=(1, 1), filters=(8, 16), k=2,
            nodes_per_graph=n_f, edges_per_graph=e_f, mlp_channels=(8,),
        )
        variables, out = init_and_forward(model, batch)
        assert out.shape == (3, 1)
        val, leaves = loss_and_grads(model, variables, batch)
        assert np.isfinite(float(val))

    def test_abcd_attpool_two_pools(self):
        """ABCD 2-pool variant (reference pool_loc=[0,1] list,
        lib/Hodge_ST_Model.py:28,111,141) at brain-like scale: forward +
        grads through both structural pools; the flatten head reads the
        level-2 counts.  Semantics pinned by model_abcd_attpool2."""
        batch, n_f, e_f = synthetic_brain_batch(3, n_rois=48, t_len=32,
                                                num_pool=2)
        batch = to_device(batch)
        model, _ = presets.abcd_attpool(
            channels=(1, 1, 1), filters=(8, 8, 16), k=2, pool_num=2,
            nodes_per_graph=n_f, edges_per_graph=e_f, mlp_channels=(8,),
        )
        variables, out = init_and_forward(model, batch)
        assert out.shape == (3, 1)
        val, leaves = loss_and_grads(model, variables, batch)
        assert np.isfinite(float(val))
        assert all(bool(jnp.isfinite(g).all()) for g in leaves)
        with pytest.raises(ValueError):
            presets.abcd_attpool(channels=(1, 1), filters=(8, 16),
                                 pool_num=2)

    def test_hgat_attpool_returns_quadruple(self):
        batch, n_f, e_f = synthetic_brain_batch(2, n_rois=24, t_len=32,
                                                num_pool=2)
        fine = batch.levels[0]
        n0 = int(np.asarray(fine.node_mask).sum()) // 2
        e0 = int(np.asarray(fine.edge_mask).sum()) // 2
        batch = to_device(batch)
        model, _ = presets.hgat_attpool(
            channels=(1, 1, 1), filters=(8, 8, 16), k=2, pool_num=2,
            nodes_per_graph=n_f, edges_per_graph=e_f,
            fine_nodes_per_graph=n0, fine_edges_per_graph=e0,
            mlp_channels=(8,),
        )
        variables = model.init(
            {"params": jax.random.key(0)}, batch, deterministic=True
        )
        pred, latent, node_att, edge_att = model.apply(
            variables, batch, deterministic=True
        )
        assert pred.shape == (2, 1)
        assert latent.shape == (2, 8)
        assert node_att.shape == (2, n0)
        assert edge_att.shape == (2, e0)


class TestPaddingInvariance:
    def test_prediction_invariant_to_batch_padding(self):
        """Core static-shape guarantee: the same graph produces the same
        prediction regardless of how much padding the batch carries."""
        from hl_hgat_tpu.complex.build import LevelPad, collate, pad_spec
        from hl_hgat_tpu.data.synthetic import random_simplex_sample

        rng = np.random.default_rng(3)
        s = random_simplex_sample(rng, n_nodes=12, node_feat=4, edge_feat=4,
                                  keig=4)
        tight = collate([s])
        pads = pad_spec([s])
        loose = collate(
            [s],
            [LevelPad(pads[0].nodes + 64, pads[0].edges + 64,
                      pads[0].nnz0 + 128, pads[0].nnz1 + 128)],
        )
        model, _ = presets.pepfunc_pyr(channels=(1,), filters=(8,), k=3)
        v = model.init(
            {"params": jax.random.key(0)}, to_device(tight),
            deterministic=True,
        )
        out_tight = model.apply(v, to_device(tight), deterministic=True)
        out_loose = model.apply(v, to_device(loose), deterministic=True)
        np.testing.assert_allclose(out_tight, out_loose, rtol=1e-4, atol=1e-5)


class TestStackGranularity:
    def test_stack_concat_modes_are_exact(self):
        """stack_concat='layer'/'block'/'never' must produce identical
        predictions and grads: the virtual-concat pieces and merged GEMMs
        (nn/interaction.py) are a traffic optimization, not a model change.
        Grad comparison uses f32 on an MSI-per-layer pyramid model so every
        piece path (gating, pooling scatter, merged value/attention GEMMs)
        is exercised."""
        import dataclasses

        batch = to_device(synthetic_zinc_batch(4, keig=8, num_pool=1))
        model, _ = presets.zinc_attpool(
            channels=(1, 1), filters=(8, 16), k=3, keig=8, mlp_channels=(8,)
        )
        outs, grads = [], []
        for mode in ("layer", "block", "never"):
            m = dataclasses.replace(
                model, cfg=dataclasses.replace(model.cfg, stack_concat=mode)
            )
            variables, out = init_and_forward(m, batch)
            outs.append(np.asarray(out))

            def loss_fn(params):
                o = m.apply(
                    {**variables, "params": params}, batch,
                    deterministic=False, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(2)},
                )[0]
                if isinstance(o, tuple):
                    o = o[0]
                return jnp.sum(o**2)

            g = jax.grad(loss_fn)(variables["params"])
            grads.append(np.concatenate(
                [np.asarray(x).ravel() for x in jax.tree.leaves(g)]
            ))
        for i in (1, 2):
            np.testing.assert_allclose(outs[0], outs[i], rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(
                grads[0], grads[i], rtol=2e-4, atol=2e-5
            )


class TestHeadDtype:
    def test_f32_head_on_bf16_trunk(self):
        """head_dtype mixed precision (the bf16 regression-penalty
        mitigation, benchmarks/RESULTS.md round 4): param tree unchanged,
        f32+head_dtype is a no-op, and on a bf16 trunk the f32 head's
        output lands closer to the all-f32 reference than the all-bf16
        path on a fixed batch."""
        import dataclasses

        batch = to_device(synthetic_zinc_batch(6, keig=16, embed_ids=True))
        model, _ = presets.zinc_pyr(
            channels=(2,), filters=(16,), k=2, keig=8, mlp_channels=(8,)
        )

        def forward(compute_dtype, head_dtype):
            m = dataclasses.replace(
                model, cfg=dataclasses.replace(
                    model.cfg, compute_dtype=compute_dtype,
                    head_dtype=head_dtype,
                )
            )
            variables, out = init_and_forward(m, batch)
            return variables, np.asarray(out)

        v_ref, out_f32 = forward("float32", None)
        v_noop, out_noop = forward("float32", "float32")
        v_bf16, out_bf16 = forward("bfloat16", None)
        v_mix, out_mix = forward("bfloat16", "float32")
        # identical param trees (head_dtype is a cast, not a module change)
        ref_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(
            v_ref["params"])[0]}
        for v in (v_noop, v_bf16, v_mix):
            paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(
                v["params"])[0]}
            assert paths == ref_paths
        np.testing.assert_array_equal(out_noop, out_f32)  # exact no-op
        err_bf16 = float(np.abs(out_bf16 - out_f32).mean())
        err_mix = float(np.abs(out_mix - out_f32).mean())
        assert err_mix < err_bf16, (err_mix, err_bf16)
