"""Checkpoint / resume via orbax.

The reference saves only ``model.state_dict()`` on improvement (reference
main_zinc...py:243) — optimizer/scheduler state is lost, so there is no true
resume (SURVEY.md §5).  Here the FULL `TrainState` (params, BN running stats,
optimizer moments, step counter, PRNG key) plus host-side metadata persists,
and ``restore_checkpoint`` resumes exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _tree_to_numpy(tree):
    """PRNG key arrays are serialized as their raw uint32 key data."""
    return jax.tree.map(
        lambda x: np.asarray(jax.random.key_data(x) if _is_key(x) else x), tree
    )


def _rewrap_keys(restored, target):
    """Re-wrap leaves that were PRNG keys in ``target``.

    The impl comes from the target key — wrap_key_data's default would
    silently rewrap e.g. an rbg training stream (TrainerConfig.prng_impl)
    as threefry on resume."""
    return jax.tree.map(
        lambda r, t: jax.random.wrap_key_data(
            jnp_asarray_u32(r), impl=jax.random.key_impl(t)
        )
        if _is_key(t)
        else r,
        restored,
        target,
    )


def jnp_asarray_u32(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.uint32)


def save_checkpoint(ckpt_dir: str, state, *, extra: dict | None = None) -> str:
    """Write the full train state. Uses orbax when available, falling back to
    a plain npz+json layout (always readable, zero deps)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "state")
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path), _tree_to_numpy(state), force=True
        )
        ckptr.wait_until_finished()
    except Exception:
        flat, treedef = jax.tree.flatten(_tree_to_numpy(state))
        np.savez(
            path + ".npz", **{f"leaf_{i}": leaf for i, leaf in enumerate(flat)}
        )
        with open(path + ".treedef.txt", "w") as f:
            f.write(str(treedef))
    if extra is not None:
        with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump(extra, f)
    return path


def restore_checkpoint(ckpt_dir: str, target) -> Any:
    """Restore into the structure of ``target`` (an abstract or concrete
    TrainState)."""
    path = os.path.join(ckpt_dir, "state")
    if os.path.exists(path + ".npz"):
        data = np.load(path + ".npz")
        flat, treedef = jax.tree.flatten(target)
        leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
        restored = jax.tree.unflatten(treedef, leaves)
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path), target=_tree_to_numpy(target)
        )
    return _rewrap_keys(restored, target)


def load_metadata(ckpt_dir: str) -> dict:
    meta_path = os.path.join(ckpt_dir, "meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)
