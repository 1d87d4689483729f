"""Importing the reference's pretrained torch checkpoint.

The reference ships exactly one trained artifact:
``HL-HGAT-DEMO/weights/HL_HGAT_Brain.pt`` (state dict of
``HL_HGAT_attpool(channels=[2,2,2], filters=[32,64,128], K=4, pool_num=1,
mlp_channels=[], num_nodepedge=2815)``, loaded at OHBM_DEMO.ipynb cell 47).
These tests load it — all 346 tensors — into our ``HLHGATAttpool`` and run
the forward, proving the migration path for reference-trained weights.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.utils.torch_import import (
    import_hgat_attpool,
    infer_hgat_config,
    load_torch_state_dict,
)

BRAIN_PT = "/root/reference/HL-HGAT-DEMO/weights/HL_HGAT_Brain.pt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BRAIN_PT), reason="reference checkpoint not present"
)


@pytest.fixture(scope="module")
def brain_sd():
    return load_torch_state_dict(BRAIN_PT)


def test_infer_config(brain_sd):
    cfg = infer_hgat_config(brain_sd)
    assert cfg == dict(
        channels=(2, 2, 2), filters=(32, 64, 128), k=4, pool_num=1,
        mlp_channels=(), num_classes=1, num_nodepedge=2815,
        node_dim=64, edge_dim=1,
    )


@pytest.fixture(scope="module")
def brain_batch():
    """A brain-shaped complex whose 1-level coarse size is exactly the
    checkpoint's ``num_nodepedge``: 400 ROIs / 2585 FC edges coarsen to
    211 nodes + 2604 edges = 2815 (seed pinned)."""
    from hl_hgat_tpu.complex.build import build_complex, collate
    from hl_hgat_tpu.complex.coarsen import build_pyramid
    from hl_hgat_tpu.data.synthetic import _random_connected

    rng = np.random.default_rng(0)
    src, dst = _random_connected(rng, 400, 2585)
    ts = rng.standard_normal((400, 32)).astype(np.float32)
    fc = rng.standard_normal((src.shape[0], 1)).astype(np.float32)
    s = build_complex(
        np.stack([src, dst]), 400, x_t=ts, x_s=fc,
        y=np.zeros(1, np.float32),
    )
    s.levels, s.pools = build_pyramid(s.levels, 1)
    coarse = s.levels[-1]
    assert coarse.num_nodes + coarse.num_edges == 2815
    batch = collate([s], multiple=1)
    return jax.tree.map(jnp.asarray, batch), s


def test_full_checkpoint_import_and_forward(brain_sd, brain_batch):
    from hl_hgat_tpu.models import presets

    batch, sample = brain_batch
    cfg = infer_hgat_config(brain_sd)
    fine, coarse = sample.levels[0], sample.levels[-1]
    model, _ = presets.hgat_attpool(
        channels=cfg["channels"], filters=cfg["filters"], k=cfg["k"],
        pool_num=cfg["pool_num"], mlp_channels=cfg["mlp_channels"],
        nodes_per_graph=coarse.num_nodes, edges_per_graph=coarse.num_edges,
        fine_nodes_per_graph=fine.num_nodes,
        fine_edges_per_graph=fine.num_edges,
    )
    variables = model.init(
        {"params": jax.random.key(0)}, batch, deterministic=True
    )

    imported, report = import_hgat_attpool(variables, brain_sd)

    n_tracked = sum(k.endswith("num_batches_tracked") for k in brain_sd)
    assert len(report.consumed) == len(brain_sd) - n_tracked
    assert report.dropped and len(report.dropped) == n_tracked
    assert not report.unmatched
    assert not report.untouched

    # spot-check layout translations against the raw torch tensors
    p = imported["params"]
    np.testing.assert_array_equal(
        p["backbone"]["init_node"]["conv"]["weights"][2],
        brain_sd["HL_init_conv.module_0.lins.2.weight"].T,
    )
    np.testing.assert_array_equal(
        p["node_embedding"]["channel2_1"]["kernel"],
        brain_sd["node_embedding.channel2_1.weight"].transpose(2, 1, 0),
    )
    np.testing.assert_array_equal(
        imported["batch_stats"]["backbone"]["NEConv10"]["edge"]["bn"]["var"],
        brain_sd["NEConv10.module_5.module.running_var"],
    )
    np.testing.assert_array_equal(
        p["head"]["out"]["kernel"], brain_sd["out.weight"].T
    )

    pred, latent, node_att, edge_att = model.apply(
        imported, batch, deterministic=True
    )
    assert pred.shape == (1, 1)
    assert latent.shape == (1, 2815)
    assert node_att.shape == (1, fine.num_nodes)
    assert edge_att.shape == (1, fine.num_edges)
    for arr in (pred, latent, node_att, edge_att):
        assert np.isfinite(np.asarray(arr)).all()
    # sigmoid attention gates stay in (0, 1)
    assert (np.asarray(node_att) > 0).all() and (np.asarray(node_att) < 1).all()


def test_strict_rejects_mismatched_architecture(brain_sd):
    """A model built at the wrong width must fail loudly, not half-load."""
    from hl_hgat_tpu.data.synthetic import synthetic_brain_batch
    from hl_hgat_tpu.models import presets

    batch, n_f, e_f = synthetic_brain_batch(1, n_rois=16, t_len=16,
                                            num_pool=1)
    model, _ = presets.hgat_attpool(
        channels=(1, 1), filters=(8, 8), k=2, pool_num=1,
        nodes_per_graph=n_f, edges_per_graph=e_f,
        fine_nodes_per_graph=8, fine_edges_per_graph=8,
    )
    variables = model.init(
        {"params": jax.random.key(0)},
        jax.tree.map(jnp.asarray, batch), deterministic=True,
    )
    with pytest.raises(ValueError, match="torch import failed"):
        import_hgat_attpool(variables, brain_sd)
