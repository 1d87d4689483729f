"""Symmetric-adjoint conv backward (nn/conv.py use_adjoint_conv).

The custom VJP exploits p_k(L)ᵀ = p_k(L) for symmetric L to compute
dW_k = xᵀ·p_k(L)·g without saving the forward's polynomial terms.  These
tests pin exact-math equivalence: forward bit-identical (same code path),
gradients allclose against standard autodiff on every layout / kind / shape
the models exercise.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.complex.build import collate
from hl_hgat_tpu.complex.dense import collate_dense, collate_dense_packed
from hl_hgat_tpu.data.synthetic import random_simplex_sample
from hl_hgat_tpu.nn.conv import (
    chebyshev_matvec,
    laguerre_matvec,
    use_adjoint_conv,
)


def _samples(rng, n=3):
    return [
        random_simplex_sample(
            rng, n_nodes=int(rng.integers(10, 20)), node_feat=6, edge_feat=5,
            keig=0,
        )
        for _ in range(n)
    ]


def _grads(fn, x, lap, w, b, r):
    def loss(x, w, b):
        out = fn(x, lap, w, b)
        return jnp.sum(out * r)

    argnums = (0, 1) if b is None else (0, 1, 2)
    return jax.grad(loss, argnums=argnums)(x, w, b)


def _assert_grads_match(fn, x, lap, w, b):
    r = jnp.asarray(
        np.random.default_rng(7).standard_normal(
            jax.eval_shape(lambda: fn(x, lap, w, b)).shape
        ),
        jnp.float32,
    )
    prev = use_adjoint_conv()
    try:
        use_adjoint_conv(True)
        g_adj = _grads(fn, x, lap, w, b, r)
        out_adj = fn(x, lap, w, b)
        use_adjoint_conv(False)
        g_std = _grads(fn, x, lap, w, b, r)
        out_std = fn(x, lap, w, b)
    finally:
        use_adjoint_conv(prev)
    np.testing.assert_array_equal(np.asarray(out_adj), np.asarray(out_std))
    for a, s in zip(g_adj, g_std):
        # fp-reordering only: the adjoint accumulates the same products in a
        # different association (larger K → more reassociation)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(s), rtol=2e-4, atol=1e-4
        )


class TestAdjointConv:
    @pytest.mark.parametrize("kind", ["laguerre", "chebyshev"])
    @pytest.mark.parametrize("k", [2, 4, 6])
    def test_dense_blocks(self, rng, kind, k):
        samples = _samples(rng)
        batch = jax.tree.map(jnp.asarray, collate_dense(samples))
        lap = batch.levels[0].l0
        x = jnp.asarray(rng.standard_normal(batch.x_t.shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, x.shape[-1], 7)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(7), jnp.float32)
        fn = laguerre_matvec if kind == "laguerre" else chebyshev_matvec
        _assert_grads_match(fn, x, lap, w, b)

    def test_dense_packed_edge_lap(self, rng):
        samples = _samples(rng, n=5)
        batch = jax.tree.map(
            jnp.asarray, collate_dense_packed(samples, node_cap=64,
                                              edge_cap=64)
        )
        lap = batch.levels[0].l1
        x = jnp.asarray(rng.standard_normal(batch.x_s.shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((6, x.shape[-1], 5)), jnp.float32)
        _assert_grads_match(laguerre_matvec, x, lap, w, None)

    def test_coo_layout(self, rng):
        samples = _samples(rng)
        batch = jax.tree.map(jnp.asarray, collate(samples))
        lap = batch.levels[0].l0
        assert lap.symmetric
        x = jnp.asarray(rng.standard_normal(batch.x_t.shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((4, x.shape[-1], 3)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(3), jnp.float32)
        _assert_grads_match(laguerre_matvec, x, lap, w, b)

    def test_3d_time_axis(self, rng):
        samples = _samples(rng)
        batch = jax.tree.map(jnp.asarray, collate_dense(samples))
        lap = batch.levels[0].l0
        g, s = lap.shape[0], lap.shape[1]
        x = jnp.asarray(rng.standard_normal((g, s, 4, 6)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 6, 7)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(7), jnp.float32)
        _assert_grads_match(laguerre_matvec, x, lap, w, b)

    def test_k1_uses_standard_path(self, rng):
        # K=1 has no recurrence — the custom VJP is skipped (no benefit);
        # just assert grads are well-defined and finite.
        samples = _samples(rng)
        batch = jax.tree.map(jnp.asarray, collate_dense(samples))
        lap = batch.levels[0].l0
        x = jnp.asarray(rng.standard_normal(batch.x_t.shape), jnp.float32)
        w = jnp.asarray(rng.standard_normal((1, x.shape[-1], 2)), jnp.float32)
        g = _grads(laguerre_matvec, x, lap, w, None,
                   jnp.ones((lap.shape[0], lap.shape[1], 2)))
        assert all(np.isfinite(np.asarray(t)).all() for t in g)

    def test_model_level_flagship(self, rng):
        """Full flagship-model grads match with the flag on vs off."""
        from hl_hgat_tpu.models import presets
        from hl_hgat_tpu.train import Trainer, TrainerConfig

        samples = []
        for _ in range(4):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(12, 24)), extra_edges=3,
                node_feat=1, edge_feat=1, keig=5,
            )
            s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
            s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
            samples.append(s)
        batch = jax.tree.map(
            jnp.asarray,
            collate_dense_packed(samples, node_cap=64, edge_cap=64),
        )
        model, _ = presets.zinc_pyr(
            channels=(1, 1), filters=(8, 16), k=4, keig=4,
            mlp_channels=(16,), compute_dtype="float32",
        )
        trainer = Trainer(
            model, TrainerConfig(task="regression", lr=1e-3)
        )
        state = trainer.init_state(batch)

        step_rng = jax.random.key(3)

        def grads():
            def loss_fn(params):
                out, _ = trainer._apply(
                    params, state.batch_stats, batch, train=True,
                    rng=step_rng,
                )
                if isinstance(out, tuple):
                    out = out[0]
                return trainer._loss_fn(out, batch)

            return jax.grad(loss_fn)(state.params)

        prev = use_adjoint_conv()
        try:
            use_adjoint_conv(True)
            g_adj = grads()
            use_adjoint_conv(False)
            g_std = grads()
        finally:
            use_adjoint_conv(prev)
        flat_a, _ = jax.flatten_util.ravel_pytree(g_adj)
        flat_s, _ = jax.flatten_util.ravel_pytree(g_std)
        np.testing.assert_allclose(
            np.asarray(flat_a), np.asarray(flat_s), rtol=1e-4, atol=1e-6
        )
