"""Data-parallel scaling-efficiency benchmark (north star: ≥80% at N hosts).

Measures the DP training-step throughput at mesh sizes 1, 2, 4, ..., N and
reports efficiency = (throughput_N / N) / throughput_1.  On a CPU host this
runs against the virtual device mesh (set
``XLA_FLAGS=--xla_force_host_platform_device_count=8``); on a pod slice it
uses the real chips and ICI.

    python benchmarks/scaling.py [max_devices]
"""

from __future__ import annotations

import json
import os
import sys
import time

_FORCE_CPU = os.environ.get("SCALING_BACKEND", "cpu") == "cpu"
if _FORCE_CPU and "xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if _FORCE_CPU:
    # must run before any device query — the tunnel backend registers first
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hl_hgat_tpu.complex.build import LevelPad, collate
from hl_hgat_tpu.data.synthetic import random_simplex_sample
from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
from hl_hgat_tpu.parallel import make_dp_train_step, make_mesh, shard_batches, stack_batches
from hl_hgat_tpu.parallel.data_parallel import replicate_state
from hl_hgat_tpu.train import Trainer, TrainerConfig
from hl_hgat_tpu.train.losses import l1_loss

STEPS = 20


def throughput(n_devices: int, batches_per_device: int = 1) -> float:
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(data=n_devices, graph=1, devices=devices)
    model = HLHGCNNGraph(
        cfg=BackboneConfig(channels=(2, 2), filters=(32, 64), k=4, init_k=4),
        num_classes=1,
    )
    trainer = Trainer(model, TrainerConfig(task="regression"))
    rng = np.random.default_rng(0)
    pads = [LevelPad(1024, 1024, 8192, 8192)]
    batches = [
        collate(
            [random_simplex_sample(rng, n_nodes=24, keig=8) for _ in range(32)],
            pads,
        )
        for _ in range(n_devices)
    ]
    loss_fn = lambda out, b: l1_loss(out.reshape(-1), b.y.reshape(-1))  # noqa: E731
    step = make_dp_train_step(model, trainer.tx, loss_fn, mesh)
    state = replicate_state(
        trainer.init_state(jax.tree.map(jnp.asarray, batches[0])), mesh
    )
    sharded = shard_batches(stack_batches(batches), mesh)
    state, loss = step(state, sharded)  # compile
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(STEPS):
        state, loss = step(state, sharded)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    graphs_per_sec = STEPS * 32 * n_devices / dt
    return graphs_per_sec


def main() -> None:
    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= max_dev]
    base = None
    results = []
    for n in sizes:
        gps = throughput(n)
        if base is None:
            base = gps
        eff = gps / (n * base)
        results.append(dict(devices=n, graphs_per_sec=round(gps, 1),
                            efficiency=round(eff, 3)))
        print(json.dumps(results[-1]))
    print(json.dumps(dict(metric="dp_scaling_efficiency",
                          value=results[-1]["efficiency"],
                          unit="fraction", sizes=results)))


if __name__ == "__main__":
    main()
