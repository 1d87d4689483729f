"""Data augmentations.

Host-side (NumPy) structural augmentations used while building samples —
edge dropout (CIFAR10-SP, reference lib/Hodge_Dataset.py:115-139) and
label-protected node dropout (TSP, reference lib/Hodge_Dataset.py:142-166) —
plus the device-side eigen-PE random sign flip applied per batch on TPU with
``jax.random`` instead of per-sample on the CPU loader (reference
lib/Hodge_Dataset.py:429-439).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def dropout_edge(
    edge_index: np.ndarray,
    p: float = 0.5,
    *,
    rng: np.random.Generator,
    training: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Random undirected-edge dropout; returns (kept edge_index, keep mask).

    Matches reference semantics (lib/Hodge_Dataset.py:115-139, used without
    ``force_undirected`` on the canonical src<dst list).
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"dropout probability must be in [0, 1], got {p}")
    e = edge_index.shape[1]
    if not training or p == 0.0:
        mask = np.ones(e, bool)
        return edge_index, mask
    mask = rng.random(e) >= p
    return edge_index[:, mask], mask


def dropout_node(
    edge_index: np.ndarray,
    edge_attr: np.ndarray,
    y_loc: np.ndarray,
    p: float = 0.0,
    *,
    num_nodes: int,
    rng: np.random.Generator,
    training: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Node dropout that always keeps positively-labelled nodes.

    The TSP augmentation (reference lib/Hodge_Dataset.py:142-166): draw an
    effective rate p' = p + U[0, 0.5), drop nodes with prob p' unless their
    ``y_loc`` flag is set, and take the induced subgraph.  Returns
    (edge_index, edge_attr, edge_mask, node_mask).
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"dropout probability must be in [0, 1], got {p}")
    e = edge_index.shape[1]
    if not training:
        return (
            edge_index,
            edge_attr,
            np.ones(e, bool),
            np.ones(num_nodes, bool),
        )
    keep_prob = rng.random(num_nodes)
    p_eff = p + rng.random() / 2
    node_mask = (keep_prob > p_eff) | y_loc.astype(bool)
    edge_mask = node_mask[edge_index[0]] & node_mask[edge_index[1]]
    return edge_index[:, edge_mask], edge_attr[edge_mask], edge_mask, node_mask


def tsp_dropout_device(key: Array, batch, *, apply_prob: float = 0.75):
    """On-device per-epoch TSP structure augmentation at static shapes.

    Reference semantics (lib/Hodge_Dataset.py:690-708 + dropout_node
    :142-166): per loaded sample, with probability ``aug_prob`` (0.75 in
    main_TSP_*, :404) draw an effective rate p' ~ U[0, 0.5) and drop each
    edge-simplex with prob p' unless its label is positive (tour edges are
    protected); the dropped simplices are removed from **L1 only** (the
    induced ``subgraph`` of ``edge_index_s``) and the keep mask replaces
    the last x_s column, which the model multiplies into its logits
    (lib/Hodge_ST_Model.py:830-852).  L0, B1, degrees and features are NOT
    touched — that is the reference's (quirky) contract.

    Here the same distribution runs under jit with a fresh PRNG every step:
    instead of re-slicing arrays (dynamic shapes), L1 values are multiplied
    by ``keep[row]·keep[col]`` — exactly the induced-subgraph mask — so
    every epoch gets a fresh roll with zero host work and no recompilation.
    Works on both layouts (ComplexBatch / DenseBatch incl. block-spill).
    """
    import dataclasses

    from hl_hgat_tpu.complex.batch import ComplexBatch, CooMatrix
    from hl_hgat_tpu.complex.dense import BlockDiagMatrix, DenseBatch

    ng = batch.num_graphs
    level = batch.levels[0]
    k_apply, k_rate, k_drop = jax.random.split(key, 3)
    # per-graph: does this sample get an augmentation roll, and at what rate
    applied = jax.random.bernoulli(k_apply, apply_prob, (ng + 1,))
    p_eff = jax.random.uniform(k_rate, (ng + 1,)) * 0.5

    if isinstance(batch, ComplexBatch):
        gid = level.s_id
        y = batch.y.reshape(-1)
    else:
        assert isinstance(batch, DenseBatch)
        gid = level.s_gid.reshape(-1)
        y = batch.y.reshape(gid.shape[0], -1)[:, 0]
    gid = jnp.clip(gid, 0, ng)
    u = jax.random.uniform(k_drop, gid.shape)
    protected = y > 0
    keep = (
        (u > p_eff[gid]) | protected | ~applied[gid]
    ).astype(jnp.float32)

    def mask_coo(m: CooMatrix, keep_flat: Array) -> CooMatrix:
        vals = m.vals * keep_flat[m.rows].astype(m.vals.dtype) * keep_flat[
            m.cols
        ].astype(m.vals.dtype)
        ell_vals = m.ell_vals
        if ell_vals is not None:
            row_keep = keep_flat[:, None].astype(ell_vals.dtype)
            col_keep = keep_flat[m.ell_cols].astype(ell_vals.dtype)
            ell_vals = ell_vals * row_keep * col_keep
        return dataclasses.replace(m, vals=vals, ell_vals=ell_vals)

    if isinstance(batch, ComplexBatch):
        l1 = mask_coo(level.l1, keep)
        new_level = dataclasses.replace(level, l1=l1)
        x_s = batch.x_s.at[:, -1].set(keep * level.edge_mask)
    else:
        e_pad = level.edge_mask.shape[1]
        keep_blk = keep.reshape(-1, e_pad)
        if isinstance(level.l1, BlockDiagMatrix):
            blocks = (
                level.l1.blocks
                * keep_blk[:, :, None].astype(level.l1.blocks.dtype)
                * keep_blk[:, None, :].astype(level.l1.blocks.dtype)
            )
            spill = (
                None if level.l1.spill is None
                else mask_coo(level.l1.spill, keep)
            )

            def mask_band(b, col_shift):
                # band_up[g] has rows in block g, cols in block g+shift;
                # both endpoint keeps must survive (induced-subgraph mask)
                if b is None:
                    return None
                zero = jnp.zeros_like(keep_blk[:1])
                col_keep = (
                    jnp.concatenate([keep_blk[1:], zero], axis=0)
                    if col_shift == 1
                    else jnp.concatenate([zero, keep_blk[:-1]], axis=0)
                )
                return (
                    b
                    * keep_blk[:, :, None].astype(b.dtype)
                    * col_keep[:, None, :].astype(b.dtype)
                )

            l1 = dataclasses.replace(
                level.l1, blocks=blocks, spill=spill,
                band_up=mask_band(level.l1.band_up, 1),
                band_dn=mask_band(level.l1.band_dn, -1),
            )
        else:
            l1 = (
                level.l1
                * keep_blk[:, :, None].astype(level.l1.dtype)
                * keep_blk[:, None, :].astype(level.l1.dtype)
            )
        new_level = dataclasses.replace(level, l1=l1)
        x_s = batch.x_s.at[:, :, -1].set(keep_blk * level.edge_mask)

    return batch.replace(
        x_s=x_s, levels=(new_level,) + tuple(batch.levels[1:])
    )


def pe_sign_flip(
    key: Array,
    x: Array,
    *,
    num_static: int,
    enabled: bool = True,
) -> Array:
    """Randomly flip the sign of the eigen-PE feature columns.

    The reference flips signs per *sample* at CPU load time (reference
    lib/Hodge_Dataset.py:429-439); eigenvector sign is arbitrary, so a per-
    batch flip on device is the same augmentation distribution at zero host
    cost.  The first ``num_static`` columns (one-hot / raw features) keep
    their sign.
    """
    if not enabled:
        return x
    n_pe = x.shape[-1] - num_static
    if n_pe <= 0:
        return x
    signs = (
        jax.random.bernoulli(key, 0.5, (n_pe,)).astype(x.dtype) * 2.0 - 1.0
    )
    full = jnp.concatenate([jnp.ones((num_static,), x.dtype), signs])
    return x * full.reshape((1,) * (x.ndim - 1) + (-1,))
