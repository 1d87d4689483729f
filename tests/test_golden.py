"""Golden-fixture regression: model outputs on a fixed graph must stay
stable across rounds (catches silent semantic drift).

Fixtures are generated once (`--regen` via GOLDEN_REGEN=1) and committed;
asserts run on CPU in f32 with loose-enough tolerances to survive compiler
updates but not semantic changes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def build_fixture():
    from hl_hgat_tpu.complex.build import build_complex, collate
    from hl_hgat_tpu.complex.coarsen import build_pyramid
    from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph

    rng = np.random.default_rng(1234)
    edges = np.array(
        [[0, 0, 1, 2, 3, 3, 4, 5, 6, 7, 8, 2, 1, 4],
         [1, 5, 2, 3, 4, 7, 5, 6, 7, 8, 9, 9, 6, 8]]
    )
    samples = []
    for _ in range(2):
        s = build_complex(
            edges, 10,
            x_t=rng.standard_normal((10, 5)).astype(np.float32),
            x_s=rng.standard_normal((14, 5)).astype(np.float32),
            y=np.zeros(1), keig=4,
        )
        s.levels, s.pools = build_pyramid(s.levels, 1)
        samples.append(s)
    batch = jax.tree.map(jnp.asarray, collate(samples))
    model = HLHGCNNGraph(
        cfg=BackboneConfig(
            channels=(1, 1), filters=(8, 16), k=3, init_k=3,
            pool_locs=(0,), gate_input="stack", gate_target="stack",
        ),
        mlp_channels=(8,),
        num_classes=3,
    )
    variables = model.init(
        {"params": jax.random.key(42)}, batch, deterministic=True
    )
    out = model.apply(variables, batch, deterministic=True)
    return np.asarray(out)


def build_fixture_tsp():
    """TSP preset on a fixed graph — guards the edge-level head (B1ᵀ
    endpoint readout, abs-after-matmul, mask-gated logits; reference
    lib/Hodge_ST_Model.py:848-852)."""
    from hl_hgat_tpu.complex.build import build_complex, collate
    from hl_hgat_tpu.models import presets

    rng = np.random.default_rng(99)
    edges = np.array(
        [[0, 0, 1, 2, 3, 3, 4, 5, 6, 7, 8, 2, 1, 4],
         [1, 5, 2, 3, 4, 7, 5, 6, 7, 8, 9, 9, 6, 8]]
    )
    samples = []
    for _ in range(2):
        x_s = rng.standard_normal((14, 2)).astype(np.float32)
        x_s[:, 1] = 1.0  # aug-mask column
        s = build_complex(
            edges, 10,
            x_t=rng.standard_normal((10, 2)).astype(np.float32),
            x_s=x_s,
            y=(rng.random(14) > 0.5).astype(np.float32), keig=0,
        )
        samples.append(s)
    batch = jax.tree.map(jnp.asarray, collate(samples, y_per_edge=True))
    model, _ = presets.tsp_pyr(
        channels=(1, 1), filters=(8, 16), k=3, mlp_channels=(8,)
    )
    variables = model.init(
        {"params": jax.random.key(7)}, batch, deterministic=True
    )
    out = model.apply(variables, batch, deterministic=True)
    return np.asarray(out)


@pytest.mark.parametrize(
    "name,builder",
    [("attpool_model_out", build_fixture),
     ("tsp_model_out", build_fixture_tsp)],
)
def test_golden_model_output(name, builder):
    path = os.path.join(GOLDEN, f"{name}.npy")
    out = builder()
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(path):
        os.makedirs(GOLDEN, exist_ok=True)
        np.save(path, out)
        pytest.skip("golden fixture (re)generated")
    expect = np.load(path)
    np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-4)
