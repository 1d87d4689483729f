"""Real-data validation: the reference's shipped brain data end-to-end.

The ONLY real data in the environment lives in the reference tree:
``Group_FC.mat`` (group-mean FC), ``Group_FCMask.mat`` (the study's
skeleton), ``affiliations.mat`` (anatomical lobes), and the pretrained
``HL_HGAT_Brain.pt`` checkpoint.  These tests pin, against fixtures
produced by EXECUTING the reference DEMO code
(scripts/make_reference_fixtures_demo.py):

* ``fc2mask`` on the real group FC (incl. the reference's mode-3
  loop-variable quirk);
* the real Shen-268 skeleton → MLGC_Weight pyramid, whose level-1
  ``nodes+edges = 2815`` equals the checkpoint's flatten-head width —
  proof the rebuild matches the authors' actual training structure;
* the full ``HL_HGAT_attpool`` forward with the REAL checkpoint weights on
  the REAL structure (fast-conv K>2 compat recurrence), including the
  attention maps the OHBM notebook visualizes, lobe-sorted with the real
  ``affiliations.mat``.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

FIX_DIR = os.path.join(os.path.dirname(__file__), "golden", "reference")
DATA_DIR = "/root/reference/HL-HGAT-DEMO/data"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(os.path.join(FIX_DIR, "model_hgat_attpool.npz"))
         and os.path.isdir(DATA_DIR)),
    reason="real brain data / DEMO fixtures not available",
)


def load(name):
    with np.load(os.path.join(FIX_DIR, f"{name}.npz")) as z:
        return {k: z[k] for k in z.files}


def test_fc2mask_matches_reference_on_real_fc():
    from hl_hgat_tpu.data.datasets import fc2mask

    fx = load("fc2mask_real")
    real = fx["fc_mean"][None].astype(np.float32)
    for mode in (1, 3):
        ours = fc2mask(real, percent=0.25, mode=mode)
        np.testing.assert_array_equal(
            ours, fx[f"real_mode{mode}"].astype(np.float32), err_msg=f"mode {mode}")
    for mode in (1, 2, 3):
        ours = fc2mask(fx["stack"], percent=0.2, mode=mode)
        np.testing.assert_array_equal(
            ours, fx[f"stack_mode{mode}"].astype(np.float32),
            err_msg=f"stack mode {mode}")


def test_real_pyramid_matches_reference():
    """build_real_brain_pyramid must reproduce the reference MLGC_Weight
    run (executed via the shim with torch-faithful graclus) EXACTLY —
    assignments, coarse edge lists, and the 2815 checkpoint anchor."""
    from hl_hgat_tpu.data.brain import build_real_brain_pyramid

    fx = load("model_hgat_attpool")
    levels, pools, w = build_real_brain_pyramid(DATA_DIR, pool_num=2)

    np.testing.assert_array_equal(levels[0].src, fx["skeleton_src"])
    np.testing.assert_array_equal(levels[0].dst, fx["skeleton_dst"])
    np.testing.assert_allclose(w, fx["skeleton_val"], rtol=1e-6)

    for k, (pt, ps) in enumerate([("pos_t0", "pos_s0"), ("pos_t1", "pos_s1")]):
        c_node, c_edge = pools[k]
        ref_cn = fx[pt].reshape(-1)
        ref_ce = fx[ps].reshape(-1)
        ours_cn = np.where(c_node < 0, np.inf, c_node.astype(np.float64))
        ours_ce = np.where(c_edge < 0, np.inf, c_edge.astype(np.float64))
        np.testing.assert_array_equal(ours_cn, ref_cn.astype(np.float64))
        np.testing.assert_array_equal(ours_ce, ref_ce.astype(np.float64))

    for lvl, key in [(levels[1], "l1_edge_index"), (levels[2], "l2_edge_index")]:
        np.testing.assert_array_equal(
            np.stack([lvl.src, lvl.dst]), fx[key])

    nn_ = fx["num_node"].astype(int)
    ee_ = fx["num_edge"].astype(int)
    assert [lv.num_nodes for lv in levels] == list(nn_)
    assert [lv.src.shape[0] for lv in levels] == list(ee_)
    assert nn_[1] + ee_[1] == 2815  # the checkpoint's flatten-head width


def test_hgat_attpool_real_checkpoint_matches_reference():
    """Forward the imported HL_HGAT_Brain.pt on the REAL structure and match
    the executed reference: predictions, latent, and the notebook's
    attention maps (OHBM_DEMO.ipynb cells 47-49)."""
    import jax
    import jax.numpy as jnp

    from hl_hgat_tpu.complex.build import collate
    from hl_hgat_tpu.data.brain import (
        build_real_brain_pyramid,
        load_affiliations,
        lobe_sorted_matrix,
    )
    from hl_hgat_tpu.data.datasets import brain_sample
    from hl_hgat_tpu.models.presets import hgat_attpool
    from hl_hgat_tpu.utils.torch_import import (
        import_hgat_attpool,
        load_torch_state_dict,
    )
    from hl_hgat_tpu.utils.viz import attention_fc_matrix

    fx = load("model_hgat_attpool")
    levels, pools, _ = build_real_brain_pyramid(DATA_DIR, pool_num=2)
    src, dst = fx["skeleton_src"], fx["skeleton_dst"]

    samples = [
        brain_sample(fx["subjects"][i], src, dst, levels, pools, y=95.1377)
        for i in range(fx["subjects"].shape[0])
    ]
    batch = jax.tree.map(jnp.asarray, collate(samples, multiple=1))

    n0, e0 = len(np.unique(np.concatenate([src, dst]))), src.shape[0]
    n1 = int(fx["num_node"][1])
    e1 = int(fx["num_edge"][1])
    model, _meta = hgat_attpool(
        pool_num=1, mlp_channels=(),
        nodes_per_graph=n1, edges_per_graph=e1,
        fine_nodes_per_graph=n0, fine_edges_per_graph=e0,
        demo_conv_compat=True,
    )
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    sd = load_torch_state_dict(
        "/root/reference/HL-HGAT-DEMO/weights/HL_HGAT_Brain.pt")
    variables, report = import_hgat_attpool(variables, sd)
    pred, latent, node_att, edge_att = model.apply(
        variables, batch, deterministic=True)

    np.testing.assert_allclose(np.asarray(pred), fx["pred"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(latent), fx["latent"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(node_att), fx["node_att"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(edge_att), fx["edge_att"],
                               rtol=1e-4, atol=1e-5)

    # the OHBM attention matrix (cell 49), lobe-sorted with the REAL
    # affiliations (plt_sort_anatomy's permutation)
    attmap = attention_fc_matrix(
        np.asarray(edge_att).mean(axis=0), src, dst, 268)
    np.testing.assert_allclose(attmap, fx["attmap"], rtol=1e-4, atol=1e-5)
    aff = load_affiliations(DATA_DIR)
    sorted_out = lobe_sorted_matrix(
        attmap, aff["affiliation"], aff["lobe_names"])
    assert sorted_out["matrix"].shape == (268, 268)
    assert sorted_out["sizes"].sum() == 268
    assert sorted(sorted_out["perm"].tolist()) == list(range(268))
    assert len(sorted_out["labels"]) == 20
    # permutation consistency: sorted matrix is attmap under perm
    p = sorted_out["perm"]
    np.testing.assert_allclose(
        sorted_out["matrix"], attmap[np.ix_(p, p)])


def test_brain_loader_static_shapes():
    """BrainLoader: shared-skeleton batches with per-epoch crop re-rolls —
    static shapes across batches and epochs (one compile)."""
    import numpy as np

    from hl_hgat_tpu.complex.build import build_structure
    from hl_hgat_tpu.complex.coarsen import build_pyramid
    from hl_hgat_tpu.data.brain import BrainLoader

    rng = np.random.default_rng(0)
    n = 12
    src = np.arange(n - 1).astype(np.int32)
    dst = np.arange(1, n).astype(np.int32)
    levels, pools = build_pyramid([build_structure(src, dst, n)], 1)
    ts = [rng.standard_normal((n, 40 + i)) for i in range(7)]
    scores = 95 + rng.standard_normal(7)
    loader = BrainLoader(ts, scores, levels, pools, batch_size=3,
                         crop_len=32, seed=1)
    assert len(loader) == 2
    shapes = set()
    seen_xt = []
    for _ in range(2):  # two epochs: crops re-roll, shapes stay fixed
        for batch in loader:
            shapes.add((batch.x_t.shape, batch.x_s.shape,
                        batch.levels[0].l0.shape))
            seen_xt.append(np.asarray(batch.x_t).copy())
    assert len(shapes) == 1
    (xt_shape, xs_shape, l0_shape) = next(iter(shapes))
    assert xt_shape[2] == 32  # crop_len pins the time axis
    assert l0_shape[0] == 1  # shared broadcast operator
    # augmentation actually re-rolls across epochs
    assert not np.array_equal(seen_xt[0], seen_xt[2])
