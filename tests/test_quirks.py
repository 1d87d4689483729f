"""Regression tests for the documented reference behavior quirks
(SURVEY.md §7 'behavior contract') — these are load-bearing for parity and
must not be 'fixed' accidentally."""

import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.data.synthetic import synthetic_zinc_batch
from hl_hgat_tpu.models import presets


def dev(b):
    return jax.tree.map(jnp.asarray, b)


class TestGatingQuirks:
    def test_zinc_attpool_gates_do_not_touch_pooled_stacks(self):
        """zinc-attpool multiplies the gates into x_t/x_s but pools x_t0
        (reference lib/Hodge_ST_Model.py:517-521) — with the pool at a
        non-final block the gate params must therefore receive ZERO gradient
        (the gated tensors are overwritten before any use)."""
        batch = dev(synthetic_zinc_batch(4, keig=8, num_pool=1))
        model, _ = presets.zinc_attpool(
            channels=(1, 1), filters=(8, 16), k=2, mlp_channels=()
        )
        v = model.init({"params": jax.random.key(0)}, batch,
                       deterministic=True)

        def loss(params):
            out = model.apply({**v, "params": params}, batch,
                              deterministic=True)
            return jnp.sum(out**2)

        g = jax.grad(loss)(v["params"])
        att = g["backbone"]["NEAtt0"]
        for leaf in jax.tree.leaves(att):
            np.testing.assert_allclose(np.asarray(leaf), 0.0)

    def test_pepfunc_gates_do_affect_output(self):
        """pepfunc gates the stacks (x_t0/x_s0) — its attention params must
        receive nonzero gradients (reference main_pepfunc...py:134-136)."""
        batch = dev(synthetic_zinc_batch(4, keig=8, num_pool=1))
        model, _ = presets.pepfunc_attpool(
            channels=(1, 1, 1), filters=(8, 8, 8), k=2, pool_loc=1,
            mlp_channels=(),
        )
        v = model.init({"params": jax.random.key(0)}, batch,
                       deterministic=True)

        def loss(params):
            out = model.apply({**v, "params": params}, batch,
                              deterministic=True)
            return jnp.sum(out**2)

        g = jax.grad(loss)(v["params"])
        att = g["backbone"]["NEAtt0"]
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(att))
        assert total > 0


class TestDegEpsQuirk:
    def test_zinc_uses_no_epsilon(self):
        model, _ = presets.zinc_pyr()
        assert model.cfg.deg_eps == 0.0  # reference lib/Hodge_ST_Model.py:624
        model, _ = presets.pepfunc_pyr()
        assert model.cfg.deg_eps == 1e-6


class TestPeSignFlipAug:
    def test_flip_preserves_static_columns(self):
        from hl_hgat_tpu.complex.augment import pe_sign_flip

        x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 10)),
                        jnp.float32)
        out = pe_sign_flip(jax.random.key(3), x, num_static=4)
        np.testing.assert_allclose(out[:, :4], x[:, :4])
        np.testing.assert_allclose(np.abs(out), np.abs(x), rtol=1e-6)
        # dense layout [G, S, F]
        xd = x.reshape(2, 3, 10)
        outd = pe_sign_flip(jax.random.key(3), xd, num_static=4)
        np.testing.assert_allclose(np.asarray(outd).reshape(6, 10), out)

    def test_trainer_applies_flip(self):
        from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
        from hl_hgat_tpu.train import Trainer, TrainerConfig

        batch = dev(synthetic_zinc_batch(4, keig=8))
        model = HLHGCNNGraph(
            cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
            num_classes=1,
        )
        cfg = TrainerConfig(task="regression", pe_flip_node_static=21,
                            pe_flip_edge_static=3)
        trainer = Trainer(model, cfg)
        state = trainer.init_state(batch)
        state, loss = trainer._train_step(state, batch)
        assert np.isfinite(float(loss))
