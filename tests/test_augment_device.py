"""On-device TSP structure augmentation (complex/augment.py
tsp_dropout_device) vs the reference's load-time dropout_node semantics
(reference lib/Hodge_Dataset.py:142-166 via TSP_EigPE.get :690-708)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.complex.augment import tsp_dropout_device
from hl_hgat_tpu.complex.build import collate
from hl_hgat_tpu.complex.dense import collate_dense_packed
from hl_hgat_tpu.data.synthetic import random_simplex_sample


def tsp_samples(rng, n_graphs=3):
    samples = []
    for _ in range(n_graphs):
        s = random_simplex_sample(
            rng, n_nodes=int(rng.integers(12, 20)), extra_edges=8,
            node_feat=2, edge_feat=2, keig=0,
        )
        s.x_s[:, -1] = 1.0
        s.y = (rng.random(s.num_edges) > 0.6).astype(np.float32)
        samples.append(s)
    return samples


def dense_l1(level):
    m = np.zeros(level.l1.shape, np.float64)
    np.add.at(m, (np.asarray(level.l1.rows), np.asarray(level.l1.cols)),
              np.asarray(level.l1.vals, np.float64))
    return m


def test_masking_matches_reference_subgraph():
    """Given the same keep mask, multiplying L1 by keep[r]·keep[c] must
    equal the reference's induced ``subgraph`` on edge_index_s — executed
    from the actual reference module via the pyg shim."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from scripts.pyg_shim import install

    install()
    sys.path.insert(0, "/root/reference")
    import torch
    from lib.Hodge_Dataset import dropout_node

    rng = np.random.default_rng(0)
    s = tsp_samples(rng, 1)[0]
    batch = collate([s], multiple=1, y_per_edge=True)
    lvl = batch.levels[0]
    ei_s = torch.from_numpy(
        np.stack([np.asarray(lvl.l1.rows), np.asarray(lvl.l1.cols)]).astype(
            np.int64)
    )
    ew_s = torch.from_numpy(np.asarray(lvl.l1.vals))
    torch.manual_seed(7)
    ei_ref, ew_ref, _em, node_mask = dropout_node(
        ei_s, ew_s, torch.from_numpy(s.y), p=0.0,
        num_nodes=s.num_edges, training=True,
    )
    keep = node_mask.numpy().astype(np.float64)
    # reference: protected (label-positive) simplices always kept
    assert (keep[s.y > 0] == 1.0).all()
    # our masking with the same keep vector
    ours = dense_l1(lvl) * keep[:, None] * keep[None, :]
    ref = np.zeros_like(ours)
    np.add.at(ref, (ei_ref[0].numpy(), ei_ref[1].numpy()),
              ew_ref.numpy().astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_device_aug_coo_layout():
    rng = np.random.default_rng(1)
    samples = tsp_samples(rng)
    batch = jax.tree.map(jnp.asarray, collate(samples, y_per_edge=True))
    out = tsp_dropout_device(jax.random.key(3), batch, apply_prob=1.0)
    keep = np.asarray(out.x_s[:, -1])
    em = np.asarray(batch.levels[0].edge_mask)
    y = np.asarray(batch.y).reshape(-1)
    # label protection: positive edges always kept
    assert (keep[(y > 0) & (em > 0)] == 1.0).all()
    # padding rows stay zero
    assert (keep[em == 0] == 0.0).all()
    # L1 entries touching dropped simplices vanish; others are untouched
    lvl_in, lvl_out = batch.levels[0], out.levels[0]
    r = np.asarray(lvl_in.l1.rows)
    c = np.asarray(lvl_in.l1.cols)
    kmask = np.asarray(out.x_s[:, -1])
    want = np.asarray(lvl_in.l1.vals) * kmask[r] * kmask[c]
    got = np.asarray(lvl_out.l1.vals)
    # only compare real entries (padding vals are 0 either way)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # everything else untouched
    np.testing.assert_array_equal(
        np.asarray(lvl_out.l0.vals), np.asarray(lvl_in.l0.vals))
    np.testing.assert_array_equal(np.asarray(out.x_s[:, :-1]),
                                  np.asarray(batch.x_s[:, :-1]))


def test_device_aug_apply_prob_zero_is_identity():
    rng = np.random.default_rng(2)
    samples = tsp_samples(rng)
    batch = jax.tree.map(jnp.asarray, collate(samples, y_per_edge=True))
    out = tsp_dropout_device(jax.random.key(0), batch, apply_prob=0.0)
    np.testing.assert_array_equal(
        np.asarray(out.levels[0].l1.vals),
        np.asarray(batch.levels[0].l1.vals),
    )
    em = np.asarray(batch.levels[0].edge_mask)
    np.testing.assert_array_equal(np.asarray(out.x_s[:, -1]), em)


def test_device_aug_dense_layout_spill():
    """Dense layout incl. a block-spanning graph: blocks AND spill masked."""
    from hl_hgat_tpu.complex.dense import BlockDiagMatrix, reorder_sample

    rng = np.random.default_rng(3)
    samples = tsp_samples(rng)
    big = random_simplex_sample(rng, n_nodes=200, extra_edges=150,
                                node_feat=2, edge_feat=2, keig=0)
    big.x_s[:, -1] = 1.0
    big.y = (rng.random(big.num_edges) > 0.6).astype(np.float32)
    samples.append(reorder_sample(big, y_per_edge=True))
    batch = jax.tree.map(
        jnp.asarray, collate_dense_packed(samples, y_per_edge=True))
    lvl = batch.levels[0]
    assert isinstance(lvl.l1, BlockDiagMatrix)
    out = tsp_dropout_device(jax.random.key(5), batch, apply_prob=1.0)
    keep = np.asarray(out.x_s[..., -1]).reshape(-1)
    em = np.asarray(lvl.edge_mask).reshape(-1)
    y = np.asarray(batch.y).reshape(-1)
    assert (keep[(y > 0) & (em > 0)] == 1.0).all()
    assert 0.0 < keep[em > 0].mean() < 1.0
    # blocks masked consistently with the keep vector
    e_pad = lvl.edge_mask.shape[1]
    kb = keep.reshape(-1, e_pad)
    want = np.asarray(lvl.l1.blocks) * kb[:, :, None] * kb[:, None, :]
    np.testing.assert_allclose(
        np.asarray(out.levels[0].l1.blocks), want, rtol=1e-6, atol=1e-7)
    if lvl.l1.spill is not None:
        sp_in, sp_out = lvl.l1.spill, out.levels[0].l1.spill
        want_sp = (np.asarray(sp_in.vals) * keep[np.asarray(sp_in.rows)]
                   * keep[np.asarray(sp_in.cols)])
        np.testing.assert_allclose(np.asarray(sp_out.vals), want_sp,
                                   rtol=1e-6, atol=1e-7)
    # nearest-neighbour band entries masked with the NEIGHBOUR block's keep
    assert lvl.l1.band_up is not None  # the 200-node graph spans blocks
    kb_next = np.concatenate([kb[1:], np.zeros_like(kb[:1])], axis=0)
    want_bu = np.asarray(lvl.l1.band_up) * kb[:, :, None] * kb_next[:, None, :]
    np.testing.assert_allclose(
        np.asarray(out.levels[0].l1.band_up), want_bu, rtol=1e-6, atol=1e-7)
    kb_prev = np.concatenate([np.zeros_like(kb[:1]), kb[:-1]], axis=0)
    want_bd = np.asarray(lvl.l1.band_dn) * kb[:, :, None] * kb_prev[:, None, :]
    np.testing.assert_allclose(
        np.asarray(out.levels[0].l1.band_dn), want_bd, rtol=1e-6, atol=1e-7)


def test_trainer_step_with_aug_trains():
    """Integration: the aug runs inside the jitted train step and the loss
    still goes down on a learnable synthetic TSP batch."""
    from hl_hgat_tpu.models import BackboneConfig, HLHGCNNTsp
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(4)
    samples = tsp_samples(rng, 4)
    batch = jax.tree.map(jnp.asarray, collate(samples, y_per_edge=True))
    model = HLHGCNNTsp(
        cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
        num_classes=1,
    )
    trainer = Trainer(model, TrainerConfig(
        task="edge_binary", lr=3e-3, tsp_aug_prob=0.75, weight_decay=0.0,
    ))
    state = trainer.init_state(batch)
    losses = []
    for _ in range(30):
        state, loss = trainer._train_step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
