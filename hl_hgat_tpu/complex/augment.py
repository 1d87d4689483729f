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
