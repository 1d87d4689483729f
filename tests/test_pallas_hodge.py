"""Fused dense-Laguerre Pallas kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.nn.conv import laguerre_matvec
from hl_hgat_tpu.ops.pallas_hodge import laguerre_dense_fused


def setup(rng, g=3, s=16, c=8, f=8, k=4):
    l = rng.standard_normal((g, s, s)).astype(np.float32)
    l = (l + l.transpose(0, 2, 1)) / 4  # symmetric, like a Hodge Laplacian
    x = rng.standard_normal((g, s, c)).astype(np.float32)
    w = rng.standard_normal((k, c, f)).astype(np.float32) * 0.1
    b = rng.standard_normal(f).astype(np.float32)
    return jnp.asarray(l), jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)


class TestFusedLaguerre:
    @pytest.mark.parametrize("k", [1, 2, 4, 6])
    def test_forward_matches_xla(self, rng, k):
        l, x, w, b = setup(rng, k=k)
        out = laguerre_dense_fused(l, x, w, b)
        expect = laguerre_matvec(x, l, w, b)
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k", [1, 2, 4, 6])
    def test_gradients_match_xla(self, rng, k):
        l, x, w, b = setup(rng, k=k)

        def f_fused(x, w, b):
            return jnp.sum(laguerre_dense_fused(l, x, w, b) ** 2)

        def f_xla(x, w, b):
            return jnp.sum(laguerre_matvec(x, l, w, b) ** 2)

        gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(f_xla, argnums=(0, 1, 2))(x, w, b)
        for a, e, name in zip(gf, gx, ("dx", "dw", "db")):
            np.testing.assert_allclose(
                a, e, rtol=2e-3, atol=1e-3, err_msg=name
            )

    def test_channel_tiled_matches_xla(self, rng):
        """C > _CT_MAX exercises the c-tile grid (the recurrence is
        channel-independent, so tiling is exact) including zero-padding of
        the ragged last tile."""
        l, x, w, b = setup(rng, g=2, s=8, c=600, f=8, k=3)

        out = laguerre_dense_fused(l, x, w, b)
        expect = laguerre_matvec(x, l, w, b)
        np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-3)

        def f_fused(x, w, b):
            return jnp.sum(laguerre_dense_fused(l, x, w, b) ** 2)

        def f_xla(x, w, b):
            return jnp.sum(laguerre_matvec(x, l, w, b) ** 2)

        gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(f_xla, argnums=(0, 1, 2))(x, w, b)
        for a, e, name in zip(gf, gx, ("dx", "dw", "db")):
            np.testing.assert_allclose(a, e, rtol=2e-3, atol=2e-3, err_msg=name)

    def test_msi_remat_fused_model_grads_match_plain(self, rng):
        """The default bench recipe — fused conv kernel + MSI-only remat —
        must produce the same gradients as the plain XLA path."""
        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.synthetic import random_simplex_sample
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
        from hl_hgat_tpu.nn.conv import use_fused_dense

        samples = [
            random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 18)), node_feat=4,
                edge_feat=3, keig=0,
            )
            for _ in range(4)
        ]
        batch = jax.tree.map(
            jnp.asarray,
            collate_dense_packed(samples, node_cap=40, edge_cap=48),
        )
        cfg = dict(channels=(1, 1), filters=(8, 16), k=4, init_k=4)
        grads = {}
        try:
            for name, remat, fused in (
                ("plain", False, False),
                ("msi_fused", "msi", True),
                ("dots", "dots", False),
            ):
                use_fused_dense(fused)
                model = HLHGCNNGraph(
                    cfg=BackboneConfig(**cfg, remat=remat), num_classes=1
                )
                v = model.init(
                    {"params": jax.random.key(0)}, batch, deterministic=True
                )

                def loss(p):
                    out, _ = model.apply(
                        {**v, "params": p}, batch, deterministic=False,
                        mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(1)},
                    )
                    return jnp.sum(out ** 2)

                grads[name] = jax.grad(loss)(v["params"])
        finally:
            use_fused_dense(False)
        for other in ("msi_fused", "dots"):
            diffs = jax.tree.map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))),
                grads["plain"], grads[other],
            )
            assert max(jax.tree.leaves(diffs)) < 1e-3, other

    def test_jit_and_scan(self, rng):
        """The kernel must compose with jit + scan (the bench pattern)."""
        l, x, w, b = setup(rng, k=3)

        @jax.jit
        def step(w, _):
            out = laguerre_dense_fused(l, x, w, b)
            return w - 1e-3 * jax.grad(
                lambda ww: jnp.sum(laguerre_dense_fused(l, x, ww, b) ** 2)
            )(w), jnp.sum(out)

        w2, sums = jax.lax.scan(step, w, None, length=3)
        assert np.isfinite(np.asarray(sums)).all()


class TestTermsKernel:
    """Terms-only recurrence kernel (laguerre_terms_dense): VMEM-resident
    term production with a linear-adjoint backward, vs the XLA mat-vec
    chain.  Kept as a design point (measured slower end-to-end at flagship
    block counts, benchmarks/RESULTS.md) — correctness is pinned here."""

    def test_terms_and_grads_match_xla(self):
        import numpy as np

        from hl_hgat_tpu.nn.conv import polynomial_terms
        from hl_hgat_tpu.ops.pallas_hodge import laguerre_terms_dense

        rng = np.random.default_rng(1)
        g, s, c, k = 3, 16, 24, 6
        a = rng.standard_normal((g, s, s)).astype(np.float32)
        lap = jnp.asarray((a + a.transpose(0, 2, 1)) / 8.0)
        x = jnp.asarray(rng.standard_normal((g, s, c)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k, c, 8)).astype(np.float32))

        t_kernel = laguerre_terms_dense(lap, x, k)
        t_ref = polynomial_terms(x, lap, k)
        for kk in range(k):
            np.testing.assert_allclose(
                t_kernel[kk], t_ref[kk], rtol=2e-5, atol=2e-5
            )

        def loss(fn):
            def inner(xx):
                t = fn(xx)
                return jnp.sum(
                    jnp.stack([t[kk] @ w[kk] for kk in range(k)]) ** 2
                )

            return inner

        g1 = jax.grad(loss(lambda xx: laguerre_terms_dense(lap, xx, k)))(x)
        g2 = jax.grad(loss(lambda xx: polynomial_terms(xx, lap, k)))(x)
        np.testing.assert_allclose(g1, g2, rtol=2e-4, atol=2e-4)

    def test_model_grads_match(self, rng):
        """Full model fwd+bwd equality with the kernel routed in."""
        import numpy as np

        from hl_hgat_tpu.complex.dense import collate_dense_packed
        from hl_hgat_tpu.data.synthetic import random_simplex_sample
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
        from hl_hgat_tpu.nn.conv import use_terms_kernel

        samples = [
            random_simplex_sample(
                rng, n_nodes=int(rng.integers(10, 18)), node_feat=4,
                edge_feat=3, keig=0,
            )
            for _ in range(4)
        ]
        batch = jax.tree.map(
            jnp.asarray,
            collate_dense_packed(samples, node_cap=40, edge_cap=48),
        )
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1, 1), filters=(8, 16), k=4,
                               init_k=4),
            num_classes=1,
        )
        grads = {}
        try:
            for name, enable in (("xla", False), ("kernel", True)):
                use_terms_kernel(enable)
                v = model.init(
                    {"params": jax.random.key(0)}, batch, deterministic=True
                )

                def loss(p):
                    out, _ = model.apply(
                        {**v, "params": p}, batch, deterministic=False,
                        mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(1)},
                    )
                    return jnp.sum(out ** 2)

                grads[name] = jax.grad(loss)(v["params"])
        finally:
            use_terms_kernel(False)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            grads["xla"], grads["kernel"],
        )
        assert max(jax.tree.leaves(diffs)) < 1e-3
