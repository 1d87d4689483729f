"""Dense-block (MXU path) vs COO path: identical model semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.complex.build import collate
from hl_hgat_tpu.complex.coarsen import build_pyramid
from hl_hgat_tpu.complex.dense import collate_dense, collate_dense_packed
from hl_hgat_tpu.data.synthetic import random_simplex_sample
from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph, HLHGCNNTsp
from hl_hgat_tpu.nn import LaguerreConv, NodeEdgeInt


def make_samples(rng, n_graphs=3, num_pool=0, edge_feat=5, tsp=False):
    samples = []
    for _ in range(n_graphs):
        s = random_simplex_sample(
            rng, n_nodes=int(rng.integers(10, 20)), node_feat=6,
            edge_feat=edge_feat, keig=0, num_pool=num_pool,
        )
        if tsp:
            s.x_s[:, -1] = 1.0  # aug mask column
            s.y = (rng.random(s.num_edges) > 0.5).astype(np.float32)
        samples.append(s)
    return samples


def dev(b):
    return jax.tree.map(jnp.asarray, b)


class TestDenseEquivalence:
    def test_laguerre_conv_equal(self, rng):
        samples = make_samples(rng)
        coo = dev(collate(samples))
        dense = dev(collate_dense(samples))
        conv = LaguerreConv(7, 4)
        p = conv.init(jax.random.key(0), coo.x_t, coo.levels[0].l0)
        out_coo = conv.apply(p, coo.x_t, coo.levels[0].l0)
        out_dense = conv.apply(p, dense.x_t, dense.levels[0].l0)
        # compare valid rows: dense layout is [G, S, F]
        o = 0
        for g, s in enumerate(samples):
            n = s.num_nodes
            np.testing.assert_allclose(
                np.asarray(out_dense)[g, :n],
                np.asarray(out_coo)[o : o + n],
                rtol=1e-4, atol=1e-5,
            )
            o += n

    def test_msi_value_equal(self, rng):
        samples = make_samples(rng)
        coo = dev(collate(samples))
        dense = dev(collate_dense(samples))
        mod = NodeEdgeInt(dv=8)
        deg_c = coo.levels[0].deg + 1e-6
        deg_d = dense.levels[0].deg + 1e-6
        p = mod.init(
            jax.random.key(0), coo.x_t, coo.x_s, coo.levels[0], deg_c,
            deterministic=True,
        )
        yc_t, yc_s = mod.apply(
            p, coo.x_t, coo.x_s, coo.levels[0], deg_c, deterministic=True
        )
        yd_t, yd_s = mod.apply(
            p, dense.x_t, dense.x_s, dense.levels[0], deg_d,
            deterministic=True,
        )
        o = 0
        for g, s in enumerate(samples):
            n = s.num_nodes
            np.testing.assert_allclose(
                np.asarray(yd_t)[g, :n], np.asarray(yc_t)[o : o + n],
                rtol=1e-4, atol=1e-5,
            )
            o += n

    def test_full_model_equal(self, rng):
        samples = make_samples(rng)
        coo = dev(collate(samples))
        dense = dev(collate_dense(samples))
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1, 1), filters=(8, 16), k=3,
                               init_k=3),
            num_classes=2,
        )
        p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
        out_coo = model.apply(p, coo, deterministic=True)
        out_dense = model.apply(p, dense, deterministic=True)
        np.testing.assert_allclose(out_dense, out_coo, rtol=1e-3, atol=1e-4)

    def test_attpool_model_equal(self, rng):
        samples = make_samples(rng, num_pool=1)
        coo = dev(collate(samples))
        dense = dev(collate_dense(samples))
        model = HLHGCNNGraph(
            cfg=BackboneConfig(
                channels=(1, 1), filters=(8, 16), k=2, init_k=2,
                pool_locs=(0,), att_sigma="sigmoid", gate_input="stack",
                gate_target="stack",
            ),
            num_classes=1,
        )
        p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
        out_coo = model.apply(p, coo, deterministic=True)
        out_dense = model.apply(p, dense, deterministic=True)
        np.testing.assert_allclose(out_dense, out_coo, rtol=1e-3, atol=1e-4)

    def test_tsp_model_equal(self, rng):
        samples = make_samples(rng, edge_feat=2, tsp=True)
        coo = dev(collate(samples, y_per_edge=True))
        dense = dev(collate_dense(samples, y_per_edge=True))
        model = HLHGCNNTsp(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            mlp_channels=(8,),
        )
        p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
        out_coo = model.apply(p, coo, deterministic=True)
        out_dense = model.apply(p, dense, deterministic=True)
        o = 0
        for g, s in enumerate(samples):
            e = s.num_edges
            np.testing.assert_allclose(
                np.asarray(out_dense)[g, :e], np.asarray(out_coo)[o : o + e],
                rtol=1e-3, atol=1e-4,
            )
            o += e

    def test_packed_full_model_equal(self, rng):
        # superblock packing: several graphs per dense tile, block-diagonal
        # operators, gid-segment readout — must match COO exactly
        samples = make_samples(rng, n_graphs=7)
        coo = dev(collate(samples))
        packed = dev(
            collate_dense_packed(samples, node_cap=48, edge_cap=56)
        )
        assert packed.x_t.shape[0] < len(samples)  # actually packed
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1, 1), filters=(8, 16), k=3,
                               init_k=3),
            num_classes=2,
        )
        p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
        out_coo = model.apply(p, coo, deterministic=True)
        out_packed = model.apply(p, packed, deterministic=True)
        np.testing.assert_allclose(out_packed, out_coo, rtol=1e-3, atol=1e-4)

    def test_packed_attpool_model_equal(self, rng):
        samples = make_samples(rng, n_graphs=6, num_pool=1)
        coo = dev(collate(samples))
        packed = dev(
            collate_dense_packed(samples, node_cap=48, edge_cap=56)
        )
        model = HLHGCNNGraph(
            cfg=BackboneConfig(
                channels=(1, 1), filters=(8, 16), k=2, init_k=2,
                pool_locs=(0,), att_sigma="sigmoid", gate_input="stack",
                gate_target="stack",
            ),
            num_classes=1,
        )
        p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
        out_coo = model.apply(p, coo, deterministic=True)
        out_packed = model.apply(p, packed, deterministic=True)
        np.testing.assert_allclose(out_packed, out_coo, rtol=1e-3, atol=1e-4)

    def test_packed_tsp_model_equal(self, rng):
        samples = make_samples(rng, n_graphs=6, edge_feat=2, tsp=True)
        coo = dev(collate(samples, y_per_edge=True))
        packed = dev(
            collate_dense_packed(
                samples, node_cap=48, edge_cap=56, y_per_edge=True
            )
        )
        model = HLHGCNNTsp(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            mlp_channels=(8,),
        )
        p = model.init({"params": jax.random.key(0)}, coo, deterministic=True)
        out_coo = model.apply(p, coo, deterministic=True)
        out_packed = model.apply(p, packed, deterministic=True)
        # align by gid/offset: packed y rows were placed at the same offsets
        s_gid = np.asarray(packed.levels[0].s_gid)
        em = np.asarray(packed.levels[0].edge_mask)
        flat_out = np.asarray(out_packed).reshape(-1)
        flat_gid = s_gid.reshape(-1)
        flat_m = em.reshape(-1) > 0
        coo_flat = np.asarray(out_coo).reshape(-1)
        o = 0
        for g, s in enumerate(samples):
            e = s.num_edges
            got = flat_out[(flat_gid == g) & flat_m]
            np.testing.assert_allclose(
                np.sort(got), np.sort(coo_flat[o : o + e]),
                rtol=1e-3, atol=1e-4,
            )
            o += e

    def test_bf16_cast_operators_close_to_f32(self, rng):
        """compute_dtype=bfloat16 casts L0/L1/B1 to bf16 inside the backbone
        (ops/dispatch.cast_operators); outputs must stay close to f32 in
        every layout."""
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph

        samples = make_samples(rng, n_graphs=5)
        cfg = dict(channels=(1, 1), filters=(8, 16), k=3, init_k=3)
        m32 = HLHGCNNGraph(cfg=BackboneConfig(**cfg), num_classes=2)
        m16 = HLHGCNNGraph(
            cfg=BackboneConfig(**cfg, compute_dtype="bfloat16"), num_classes=2
        )
        for batch in (
            dev(collate(samples)),
            dev(collate_dense(samples)),
            dev(collate_dense_packed(samples, node_cap=48, edge_cap=56)),
        ):
            p = m32.init({"params": jax.random.key(0)}, batch,
                         deterministic=True)
            out32 = m32.apply(p, batch, deterministic=True)
            out16 = m16.apply(p, batch, deterministic=True)
            np.testing.assert_allclose(
                np.asarray(out16), np.asarray(out32), rtol=0.1, atol=0.1
            )

    def test_dense_grads_finite(self, rng):
        samples = make_samples(rng)
        dense = dev(collate_dense(samples))
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            num_classes=1,
        )
        v = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            dense, deterministic=True,
        )

        def loss(params):
            out, _ = model.apply(
                {**v, "params": params}, dense, deterministic=False,
                mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
            )
            return jnp.sum(out**2)

        g = jax.grad(loss)(v["params"])
        assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


class TestSharedSkeleton:
    def test_shared_dense_matches_flat(self, rng):
        """collate_dense_shared (ONE broadcast operator per level) must
        reproduce the flat-COO model output on identical shared-skeleton
        samples — the brain-family fast path (complex/dense.py)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from hl_hgat_tpu.complex.build import build_structure, collate
        from hl_hgat_tpu.complex.coarsen import build_pyramid
        from hl_hgat_tpu.complex.dense import collate_dense_shared
        from hl_hgat_tpu.data.datasets import brain_sample
        from hl_hgat_tpu.models.presets import hgat_attpool

        n = 18
        src = np.arange(n - 1).astype(np.int32)
        dst = np.arange(1, n).astype(np.int32)
        extra = rng.integers(0, n, (2, 30))
        keep = extra[0] != extra[1]
        uniq = np.unique(
            np.minimum(extra[0], extra[1])[keep].astype(np.int64) * n
            + np.maximum(extra[0], extra[1])[keep])
        src = np.concatenate([src, (uniq // n).astype(np.int32)])
        dst = np.concatenate([dst, (uniq % n).astype(np.int32)])
        order = np.argsort(src * n + dst)
        src, dst = src[order], dst[order]
        levels, pools = build_pyramid([build_structure(src, dst, n)], 1)

        samples = [
            brain_sample(rng.standard_normal((n, 12)), src, dst,
                         levels, pools, y=95.0 + i)
            for i in range(3)
        ]
        flat = jax.tree.map(jnp.asarray, collate(samples, multiple=1))
        shared = jax.tree.map(
            jnp.asarray, collate_dense_shared(samples, multiple=1))

        final = levels[-1]
        model, _ = hgat_attpool(
            channels=(1, 1), filters=(8, 8), k=2, pool_num=1,
            mlp_channels=(8,),
            nodes_per_graph=final.num_nodes,
            edges_per_graph=final.src.shape[0],
            fine_nodes_per_graph=n, fine_edges_per_graph=src.shape[0],
        )
        variables = model.init(jax.random.key(0), flat, deterministic=True)
        out_flat = model.apply(variables, flat, deterministic=True)
        out_shared = model.apply(variables, shared, deterministic=True)
        for a, b, name in zip(out_flat, out_shared,
                              ("pred", "latent", "node_att", "edge_att")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=name)

    def test_shared_requires_identical_structure(self, rng):
        import pytest as _pytest

        from hl_hgat_tpu.complex.build import build_structure
        from hl_hgat_tpu.complex.coarsen import build_pyramid
        from hl_hgat_tpu.complex.dense import collate_dense_shared
        from hl_hgat_tpu.data.datasets import brain_sample

        def chain(n):
            src = np.arange(n - 1).astype(np.int32)
            dst = np.arange(1, n).astype(np.int32)
            return build_pyramid([build_structure(src, dst, n)], 0)

        la, pa = chain(10)
        lb, pb = chain(11)
        sa = brain_sample(rng.standard_normal((10, 8)),
                          la[0].src, la[0].dst, la, pa, y=95.0)
        sb = brain_sample(rng.standard_normal((11, 8)),
                          lb[0].src, lb[0].dst, lb, pb, y=95.0)
        with _pytest.raises(ValueError, match="identical structure"):
            collate_dense_shared([sa, sb])

    def test_shared_requires_identical_operator_values(self, rng):
        """Topologically identical samples with different Laplacian weights
        must be rejected — operators are taken from samples[0]."""
        import copy

        import pytest as _pytest

        from hl_hgat_tpu.complex.build import build_structure
        from hl_hgat_tpu.complex.coarsen import build_pyramid
        from hl_hgat_tpu.complex.dense import collate_dense_shared
        from hl_hgat_tpu.data.datasets import brain_sample

        src = np.arange(9).astype(np.int32)
        dst = np.arange(1, 10).astype(np.int32)
        levels, pools = build_pyramid([build_structure(src, dst, 10)], 0)
        sa = brain_sample(rng.standard_normal((10, 8)),
                          src, dst, levels, pools, y=95.0)
        sb = copy.deepcopy(sa)
        sb.levels[0].l1_vals = sb.levels[0].l1_vals * 1.5
        with _pytest.raises(ValueError, match="operator values"):
            collate_dense_shared([sa, sb])
