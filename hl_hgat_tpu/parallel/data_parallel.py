"""Batch data parallelism over the ``data`` mesh axis.

Each device owns whole padded `ComplexBatch` sub-batches (graphs are small —
ZINC ~23 nodes — so DP is the natural first axis, SURVEY.md §7).  The jitted
step runs forward+backward per device and pmean-reduces gradients, loss, AND
BatchNorm batch statistics over ICI — cross-replica BN sync, which the
single-GPU reference could not do.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hl_hgat_tpu.complex.batch import ComplexBatch
from hl_hgat_tpu.train.trainer import TrainState

Array = jax.Array


def stack_batches(batches: list[ComplexBatch]) -> ComplexBatch:
    """Stack equal-shape collated batches along a new leading device axis."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


def shard_batches(stacked: ComplexBatch, mesh: Mesh) -> ComplexBatch:
    """Place a stacked batch with its leading axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def make_dp_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Mesh,
    pe_flip_node_static: "int | None" = None,
    pe_flip_edge_static: "int | None" = None,
    tsp_aug_prob: "float | None" = None,
) -> Callable:
    """Build the jitted data-parallel training step.

    ``loss_fn(out, batch) -> scalar``.  State is replicated; the stacked
    batch is sharded over 'data' (leading axis = one sub-batch per device).
    ``pe_flip_*_static`` enable the device-side eigen-PE sign-flip
    augmentation with per-device randomness (mirrors the single-device
    Trainer._train_step_impl).
    """

    def per_device(state: TrainState, batches: ComplexBatch):
        from hl_hgat_tpu.complex.compact import maybe_inflate

        batch = jax.tree.map(lambda x: x[0], batches)  # local shard: [1, ...]
        # compact sub-batches were collated independently per device, so
        # their COO block indices are shard-local — densify here, after the
        # shard strip, and only the triplets crossed host->device
        batch = maybe_inflate(batch)
        rng = jax.random.fold_in(state.rng, jax.lax.axis_index("data"))
        rng = jax.random.fold_in(rng, state.step)
        if pe_flip_node_static is not None or pe_flip_edge_static is not None:
            from hl_hgat_tpu.complex.augment import pe_sign_flip

            k_t, k_s = jax.random.split(jax.random.fold_in(rng, 1))
            x_t, x_s = batch.x_t, batch.x_s
            if pe_flip_node_static is not None:
                x_t = pe_sign_flip(k_t, x_t, num_static=pe_flip_node_static)
            if pe_flip_edge_static is not None:
                x_s = pe_sign_flip(k_s, x_s, num_static=pe_flip_edge_static)
            batch = batch.replace(x_t=x_t, x_s=x_s)
        if tsp_aug_prob is not None:
            from hl_hgat_tpu.complex.augment import tsp_dropout_device

            batch = tsp_dropout_device(
                jax.random.fold_in(rng, 2), batch, apply_prob=tsp_aug_prob
            )

        def compute_loss(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                deterministic=False,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            if isinstance(out, tuple):
                out = out[0]
            return loss_fn(out, batch), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        new_stats = jax.lax.pmean(new_stats, "data")  # synced BatchNorm
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
            rng=jax.random.split(state.rng)[0],
        )
        return new_state, loss

    shmapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,  # custom-VJP SpMM + fold_in are replication-opaque
    )
    return jax.jit(shmapped, donate_argnums=(0,))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
