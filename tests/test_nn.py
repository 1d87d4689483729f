"""Operator-level parity vs dense NumPy oracles (SURVEY.md §4 plan)."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.complex.batch import CooMatrix, PoolMap
from hl_hgat_tpu.complex.build import build_complex, collate, hodge_laplacians
from hl_hgat_tpu.complex.coarsen import build_pyramid
from hl_hgat_tpu.nn import (
    ChebConv,
    HLFilter,
    Inception1D,
    LaguerreConv,
    MaskedBatchNorm,
    NodeEdgeInt,
    SAPool,
    global_mean_pool,
    sapool_scatter,
)


def dense_from_coo(coo: CooMatrix) -> np.ndarray:
    d = np.zeros(coo.shape)
    np.add.at(d, (np.asarray(coo.rows), np.asarray(coo.cols)), np.asarray(coo.vals))
    return d


def laguerre_dense(L, x, K):
    """Oracle: Laguerre recurrence with dense matmuls
    (reference lib/Hodge_Cheb_Conv.py:487-510 math)."""
    terms = [x]
    if K > 1:
        terms.append(x - L @ x)
    k = 1
    for _ in range(2, K):
        t2 = (-L @ terms[-1] + (2 * k + 1) * terms[-1] - k * terms[-2]) / (k + 1)
        k += 1
        terms.append(t2)
    return terms


def make_batch(rng, graph_factory, n_graphs=3, ft=6, fs=5):
    samples = []
    for _ in range(n_graphs):
        n = int(rng.integers(8, 16))
        src, dst = graph_factory(n=n, extra_edges=6)
        e = src.shape[0]
        samples.append(
            build_complex(
                np.stack([src, dst]), n,
                x_t=rng.standard_normal((n, ft)).astype(np.float32),
                x_s=rng.standard_normal((e, fs)).astype(np.float32),
                y=rng.standard_normal(1),
            )
        )
    return samples, collate(samples)


class TestLaguerreConv:
    @pytest.mark.parametrize("K", [1, 2, 4, 6])
    def test_matches_dense_recurrence(self, rng, graph_factory, K):
        _, batch = make_batch(rng, graph_factory)
        lvl = batch.levels[0]
        x = jnp.asarray(batch.x_t)
        conv = LaguerreConv(features=7, k=K)
        params = conv.init(jax.random.key(0), x, lvl.l0)
        out = conv.apply(params, x, lvl.l0)

        L = dense_from_coo(lvl.l0)
        terms = laguerre_dense(L, np.asarray(x, np.float64), K)
        W = np.asarray(params["params"]["weights"], np.float64)
        b = np.asarray(params["params"]["bias"], np.float64)
        expect = sum(t @ W[k] for k, t in enumerate(terms)) + b
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    def test_3d_time_axis(self, rng, graph_factory):
        _, batch = make_batch(rng, graph_factory)
        lvl = batch.levels[0]
        n = lvl.num_nodes
        x = jnp.asarray(rng.standard_normal((n, 4, 6)).astype(np.float32))
        conv = LaguerreConv(features=5, k=3)
        params = conv.init(jax.random.key(0), x, lvl.l0)
        out = conv.apply(params, x, lvl.l0)
        assert out.shape == (n, 4, 5)
        # Laplacian acts independently per time step: compare step 2
        x2 = x[:, 2, :]
        out2 = conv.apply(params, x2, lvl.l0)
        np.testing.assert_allclose(out[:, 2, :], out2, rtol=1e-4, atol=1e-5)

    def test_cheb_matches_dense(self, rng, graph_factory):
        _, batch = make_batch(rng, graph_factory)
        lvl = batch.levels[0]
        x = jnp.asarray(batch.x_s)
        conv = ChebConv(features=4, k=4)
        params = conv.init(jax.random.key(1), x, lvl.l1)
        out = conv.apply(params, x, lvl.l1)
        L = dense_from_coo(lvl.l1)
        xx = np.asarray(x, np.float64)
        terms = [xx, L @ xx]
        for _ in range(2, 4):
            terms.append(2 * L @ terms[-1] - terms[-2])
        W = np.asarray(params["params"]["weights"], np.float64)
        b = np.asarray(params["params"]["bias"], np.float64)
        expect = sum(t @ W[k] for k, t in enumerate(terms)) + b
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


class TestMaskedBatchNorm:
    def test_padding_invariance(self, rng):
        x_valid = rng.standard_normal((10, 4)).astype(np.float32)
        x_pad = np.concatenate([x_valid, 7.0 * np.ones((6, 4), np.float32)])
        mask = np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32)
        bn = MaskedBatchNorm(4)
        p = bn.init(jax.random.key(0), jnp.asarray(x_pad), jnp.asarray(mask),
                    use_running_average=False)
        out_pad, vars_pad = bn.apply(
            p, jnp.asarray(x_pad), jnp.asarray(mask),
            use_running_average=False, mutable=["batch_stats"],
        )
        out_ref, vars_ref = bn.apply(
            p, jnp.asarray(x_valid), jnp.ones(10),
            use_running_average=False, mutable=["batch_stats"],
        )
        np.testing.assert_allclose(out_pad[:10], out_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out_pad[10:], 0.0)  # padding re-masked
        np.testing.assert_allclose(
            vars_pad["batch_stats"]["mean"], vars_ref["batch_stats"]["mean"],
            rtol=1e-5,
        )

    def test_matches_torch_semantics(self, rng):
        import torch

        x = rng.standard_normal((32, 6)).astype(np.float32)
        bn = MaskedBatchNorm(6)
        p = bn.init(jax.random.key(0), jnp.asarray(x), use_running_average=False)
        out, mutated = bn.apply(
            p, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
        )
        tbn = torch.nn.BatchNorm1d(6)
        tout = tbn(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(out, tout, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            mutated["batch_stats"]["mean"],
            tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            mutated["batch_stats"]["var"],
            tbn.running_var.numpy(), rtol=1e-4, atol=1e-6,
        )


class TestNodeEdgeInt:
    def test_attention_formula(self, rng, graph_factory):
        _, batch = make_batch(rng, graph_factory, ft=6, fs=6)
        lvl = batch.levels[0]
        deg = jnp.asarray(lvl.deg) + 1e-6
        mod = NodeEdgeInt(dk=8, only_att=True, sigma="sigmoid", lam=0.9)
        x_t, x_s = jnp.asarray(batch.x_t), jnp.asarray(batch.x_s)
        p = mod.init(jax.random.key(0), x_t, x_s, lvl, deg)
        a_t, a_s = mod.apply(p, x_t, x_s, lvl, deg)
        assert a_t.shape == (lvl.num_nodes, 1)
        assert a_s.shape == (lvl.num_edges, 1)
        assert (np.asarray(a_t) >= 0).all() and (np.asarray(a_t) <= 1).all()

        # manual oracle via dense |B1|
        from hl_hgat_tpu.complex.build import boundary_dense
        e_tot = int(np.asarray(lvl.edge_mask).sum())
        n_tot = int(np.asarray(lvl.node_mask).sum())
        b1 = np.zeros((lvl.num_nodes, lvl.num_edges))
        src, dst = np.asarray(lvl.src), np.asarray(lvl.dst)
        for i in range(e_tot):
            b1[src[i], i] = -1
            b1[dst[i], i] = 1
        x_s2t = (np.abs(b1) @ np.asarray(x_s)) / np.asarray(deg)[:, None]
        pp = p["params"]

        def lin(name, v):
            return v @ np.asarray(pp[name]["kernel"]) + np.asarray(pp[name]["bias"])

        lam, dk = 0.9, 8
        logits = (
            (1 - lam) * (lin("WQ_Edge", x_s2t) * lin("WK_Node", np.asarray(x_t))).sum(1)
            + lam * (lin("WQ_Node", np.asarray(x_t)) * lin("WK_Node", np.asarray(x_t))).sum(1)
        ) / np.sqrt(dk)
        expect = 1 / (1 + np.exp(-logits))
        np.testing.assert_allclose(
            np.asarray(a_t)[:n_tot, 0], expect[:n_tot], rtol=1e-4, atol=1e-5
        )

    def test_value_mode_shapes_and_masking(self, rng, graph_factory):
        _, batch = make_batch(rng, graph_factory)
        lvl = batch.levels[0]
        deg = jnp.asarray(lvl.deg) + 1e-6
        mod = NodeEdgeInt(dv=16)
        x_t, x_s = jnp.asarray(batch.x_t), jnp.asarray(batch.x_s)
        p = mod.init(jax.random.key(0), x_t, x_s, lvl, deg)
        y_t, y_s = mod.apply(
            p, x_t, x_s, lvl, deg, mutable=["batch_stats"]
        )[0]
        assert y_t.shape == (lvl.num_nodes, 16)
        assert y_s.shape == (lvl.num_edges, 16)
        pad = np.asarray(lvl.node_mask) == 0
        np.testing.assert_allclose(np.asarray(y_t)[pad], 0.0)


class TestPooling:
    def test_global_mean_pool_ignores_padding(self, rng, graph_factory):
        samples, batch = make_batch(rng, graph_factory)
        lvl = batch.levels[0]
        out = global_mean_pool(
            jnp.asarray(batch.x_t), jnp.asarray(lvl.n_id), 3,
            mask=jnp.asarray(lvl.node_mask),
        )
        for g, s in enumerate(samples):
            np.testing.assert_allclose(out[g], s.x_t.mean(0), rtol=1e-4, atol=1e-5)

    def test_sapool_scatter_matches_manual(self, rng, graph_factory):
        samples = []
        for _ in range(2):
            n = 12
            src, dst = graph_factory(n=n, extra_edges=8)
            s = build_complex(
                np.stack([src, dst]), n,
                x_t=rng.standard_normal((n, 4)).astype(np.float32),
                x_s=rng.standard_normal((src.size, 4)).astype(np.float32),
                y=np.zeros(1),
            )
            s.levels, s.pools = build_pyramid(s.levels, 1)
            samples.append(s)
        batch = collate(samples)
        fine, coarse = batch.levels[0], batch.levels[1]
        pool = batch.pools[0]
        x_t_c, x_s_c = sapool_scatter(
            jnp.asarray(batch.x_t), jnp.asarray(batch.x_s), pool, fine, coarse
        )
        # manual per-sample means
        n_off = 0
        cn_off = 0
        for s in samples:
            c_node, c_edge = s.pools[0]
            n_coarse = s.levels[1].num_nodes
            for c in range(n_coarse):
                members = np.nonzero(c_node == c)[0]
                np.testing.assert_allclose(
                    np.asarray(x_t_c)[cn_off + c],
                    s.x_t[members].mean(0), rtol=1e-4, atol=1e-5,
                )
            n_off += s.num_nodes
            cn_off += n_coarse

    def test_sapool_module(self, rng, graph_factory):
        samples = []
        for _ in range(2):
            s = build_complex(
                np.stack(graph_factory(n=10, extra_edges=6)), 10,
                x_t=rng.standard_normal((10, 8)).astype(np.float32),
                x_s=rng.standard_normal(
                    (graph_factory(n=10, extra_edges=0)[0].size, 8)
                ).astype(np.float32) * 0,
                y=np.zeros(1),
            )
            # rebuild x_s with right edge count
            s.x_s = rng.standard_normal((s.num_edges, 8)).astype(np.float32)
            s.levels, s.pools = build_pyramid(s.levels, 1)
            samples.append(s)
        batch = collate(samples)
        fine, coarse = batch.levels[0], batch.levels[1]
        mod = SAPool(dk=4, sigma="relu", max_normalize=True)
        deg = jnp.asarray(fine.deg) + 1e-6
        p = mod.init(
            jax.random.key(0), jnp.asarray(batch.x_t), jnp.asarray(batch.x_s),
            batch.pools[0], fine, coarse, deg,
        )
        x_t_c, x_s_c, a_t, a_s = mod.apply(
            p, jnp.asarray(batch.x_t), jnp.asarray(batch.x_s),
            batch.pools[0], fine, coarse, deg,
        )
        assert x_t_c.shape == (coarse.num_nodes, 8)
        assert float(jnp.max(a_t)) <= 1.0 + 1e-5


class TestInceptionAndBlocks:
    def test_inception_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((6, 40)).astype(np.float32))
        mod = Inception1D(in_channels=16, num_channels=4, if_readout=True)
        p = mod.init(jax.random.key(0), x, deterministic=True)
        out = mod.apply(p, x, deterministic=True)
        assert out.shape == (6, 16)
        mod2 = Inception1D(in_channels=16, num_channels=4, if_readout=False)
        p2 = mod2.init(jax.random.key(0), x, deterministic=True)
        out2 = mod2.apply(p2, x, deterministic=True)
        assert out2.shape[0] == 6 and out2.shape[2] == 16

    def test_hlfilter_dense_growth(self, rng, graph_factory):
        _, batch = make_batch(rng, graph_factory, ft=8, fs=8)
        lvl = batch.levels[0]
        deg = jnp.asarray(lvl.deg) + 1e-6
        mod = HLFilter(channels=2, filters=8, k=3)
        x_t, x_s = jnp.asarray(batch.x_t), jnp.asarray(batch.x_s)
        p = mod.init(jax.random.key(0), x_t, x_s, lvl, deg, deterministic=True)
        y_t, y_s = mod.apply(p, x_t, x_s, lvl, deg, deterministic=True)
        assert y_t.shape == (lvl.num_nodes, 8 + 2 * 8)
        assert y_s.shape == (lvl.num_edges, 8 + 2 * 8)
        pad = np.asarray(lvl.node_mask) == 0
        np.testing.assert_allclose(np.asarray(y_t)[pad, 8:], 0.0, atol=1e-6)


class TestSwapDwGemm:
    def test_model_grads_match_default(self, rng):
        """HLHGAT_SWAP_DW (nn/gemm.py): the swapped-dW stack-GEMM backward
        must produce the same loss/grads as einsum autodiff at model level
        (exact math, different association only)."""
        from hl_hgat_tpu.complex.build import build_complex, collate
        from hl_hgat_tpu.models.backbone import BackboneConfig, HLHGCNNGraph
        from hl_hgat_tpu.nn import gemm

        n = 12
        src = np.arange(n - 1).astype(np.int64)
        dst = np.arange(1, n).astype(np.int64)
        extra = rng.integers(0, n, (2, 10))
        keep = extra[0] != extra[1]
        ei = np.unique(
            np.minimum(extra[0], extra[1])[keep] * n
            + np.maximum(extra[0], extra[1])[keep]
        )
        src = np.concatenate([src, ei // n])
        dst = np.concatenate([dst, ei % n])
        uniq = np.unique(src * n + dst)
        ei2 = np.stack([uniq // n, uniq % n])
        s = build_complex(
            ei2, n,
            x_t=rng.standard_normal((n, 5)).astype(np.float32),
            x_s=rng.standard_normal((ei2.shape[1], 4)).astype(np.float32),
            y=np.ones(1, np.float32),
        )
        batch = jax.tree.map(jnp.asarray, collate([s], multiple=1))
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(2,), filters=(8,), k=3, init_k=2),
            num_classes=1,
        )
        variables = model.init(jax.random.key(0), batch, deterministic=True)

        def loss(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                batch, deterministic=False, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)

        try:
            gemm.use_swap_dw(False)
            l0, g0 = jax.value_and_grad(loss)(variables["params"])
            gemm.use_swap_dw(True)
            l1, g1 = jax.value_and_grad(loss)(variables["params"])
        finally:
            gemm.use_swap_dw(False)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_emit_barrier_identity(self, rng, graph_factory, dtype):
        """HLHGAT_CONV_EMIT_BARRIER (nn/conv.py::emit_cast): the conv-output
        materialization barrier is semantically the identity — values and
        grads must match the default path exactly in both dtypes (the
        barrier only pins WHERE XLA materializes the rounded value)."""
        from hl_hgat_tpu.nn import conv as conv_mod
        from hl_hgat_tpu.nn.conv import laguerre_matvec

        _, batch = make_batch(rng, graph_factory)
        lvl = batch.levels[0]
        x = jnp.asarray(batch.x_t).astype(dtype)
        w = jnp.asarray(rng.standard_normal((3, 6, 4)).astype(np.float32))

        def run(xx, ww):
            return jnp.sum(laguerre_matvec(xx, lvl.l0, ww) ** 2)

        try:
            conv_mod.use_emit_barrier(False)
            l0, (gx0, gw0) = jax.value_and_grad(run, argnums=(0, 1))(x, w)
            conv_mod.use_emit_barrier(True)
            l1, (gx1, gw1) = jax.value_and_grad(run, argnums=(0, 1))(x, w)
        finally:
            conv_mod.use_emit_barrier(False)
        assert float(l0) == float(l1)
        np.testing.assert_array_equal(np.asarray(gx0), np.asarray(gx1))
        np.testing.assert_array_equal(np.asarray(gw0), np.asarray(gw1))

    def test_bf16_packed_grads(self, rng):
        """The swap backward must hand back cotangents in the PRIMAL dtypes
        — a bf16 packed model exposes the recurrence transpose (this was a
        real bug: dx in the f32 cotangent dtype broke lax.div in the
        Laguerre recurrence's transpose)."""
        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.synthetic import random_simplex_sample
        from hl_hgat_tpu.models.backbone import BackboneConfig, HLHGCNNGraph
        from hl_hgat_tpu.nn import gemm

        samples = [random_simplex_sample(rng, n_nodes=12, keig=4)
                   for _ in range(8)]
        batch = jax.tree.map(
            jnp.asarray, collate_dense_packed(samples, node_cap=32,
                                              edge_cap=40))
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1, 1), filters=(8, 16), k=3,
                               init_k=3, compute_dtype="bfloat16"),
            num_classes=1,
        )
        variables = model.init(jax.random.key(0), batch, deterministic=True)

        def loss(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                batch, deterministic=False, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        try:
            gemm.use_swap_dw(False)
            l0, g0 = jax.value_and_grad(loss)(variables["params"])
            gemm.use_swap_dw(True)
            l1, g1 = jax.value_and_grad(loss)(variables["params"])
        finally:
            gemm.use_swap_dw(False)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        # bf16 tolerance note: custom VJPs must return cotangents in the
        # PRIMAL dtype, so the swap path rounds dx to bf16 after each
        # GEMM, while XLA autodiff carries f32 cotangents through the
        # whole backward — a per-layer rounding delta (~3e-3 abs here),
        # not an algebraic difference (the f32 test above is tight).
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-2, atol=5e-3)
