"""Data-parallel Trainer: the full `Trainer.fit` loop on a device mesh.

`parallel/data_parallel.py` provides the sharded step; this bridges it into
the high-level training loop so multi-chip runs keep everything the
single-device `Trainer` offers — ReduceLROnPlateau, metric-gated
checkpointing, early stop, JSONL logging, resume (the loop amenities the
reference implements per-script, reference main_zinc...py:209-250).

Usage: hand the loader a per-device batch size; `train_epoch` groups
``mesh.shape['data']`` consecutive batches into one sharded step (gradients,
loss and BatchNorm statistics pmean over the mesh).  Evaluation pulls the
replicated state once per epoch and reuses the single-device eval step —
metrics (AP/F1) are host-side reductions anyway.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from hl_hgat_tpu.parallel.data_parallel import (
    make_dp_train_step,
    replicate_state,
    shard_batches,
    stack_batches,
)
from hl_hgat_tpu.train.trainer import Trainer, TrainerConfig


class DataParallelTrainer(Trainer):
    """Trainer whose train step runs shard_map data-parallel over ``mesh``.

    The mesh must carry a ``data`` axis; batches from the loader are
    per-device sub-batches (equal static shapes — use one bucket or the
    packed layout with pinned block counts).  A trailing group smaller than
    the data axis is filled by cycling its own batches (the same
    final-partial-batch bias the loader's filler idiom accepts).
    """

    def __init__(self, model, config: TrainerConfig, mesh: Mesh):
        super().__init__(model, config)
        if "data" not in mesh.shape:
            raise ValueError("mesh needs a 'data' axis for DP training")
        self.mesh = mesh
        self.data_ax = mesh.shape["data"]
        self._dp_step = make_dp_train_step(
            model, self.tx, lambda out, b: self._loss_fn(out, b), mesh,
            pe_flip_node_static=config.pe_flip_node_static,
            pe_flip_edge_static=config.pe_flip_edge_static,
            tsp_aug_prob=config.tsp_aug_prob,
        )

    def train_epoch(self, state, batches):
        state = replicate_state(state, self.mesh)
        total, n = None, 0

        def step(group, real):
            nonlocal state, total, n
            new_state, loss = self._dp_step(
                state, shard_batches(stack_batches(group), self.mesh)
            )
            state = new_state
            g = sum(b.num_graphs for b in group[:real])
            contrib = loss * g
            total = contrib if total is None else total + contrib
            n += g

        group: list = []
        for batch in batches:
            group.append(jax.tree.map(np.asarray, batch))
            if len(group) == self.data_ax:
                step(group, self.data_ax)
                group = []
        if group:  # trailing partial group: cycle its own batches
            k = len(group)
            while len(group) < self.data_ax:
                group.append(group[len(group) % k])
            step(group, k)
        if total is None:
            return state, 0.0
        return state, float(np.asarray(total)) / max(n, 1)

    def evaluate(self, state, batches):
        # one host pull of the replicated state per eval; the single-device
        # eval step then runs on the default device
        local = dataclasses.replace(
            state,
            params=jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)), state.params
            ),
            batch_stats=jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)), state.batch_stats
            ),
        )
        return super().evaluate(local, batches)
