"""Pooled-model throughput: CIFAR10-SP-shaped attpool step on one chip.

The flagship bench (bench.py) covers the pyr (no-pool) family; this measures
the OTHER architecture family — attention gating + structural pooling over an
MLGC pyramid (reference lib/Hodge_ST_Model.py:958-1091) — end to end
(fwd+bwd+Adam) on synthetic superpixel-shaped graphs (~117 nodes, ~8-NN
edges) in the packed dense layout.

    python benchmarks/attpool_bench.py [batch_graphs]
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(os.environ.get("BENCH_STEPS", "10"))


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    from hl_hgat_tpu.complex.dense import collate_dense_packed
    from hl_hgat_tpu.data.synthetic import random_simplex_sample
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    batch_graphs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cache = f"/tmp/hlhgat_attpool_{batch_graphs}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            batch = pickle.load(fh)
    else:
        rng = np.random.default_rng(0)
        samples = []
        for _ in range(batch_graphs):
            n = int(rng.integers(100, 125))
            s = random_simplex_sample(
                rng, n_nodes=n, extra_edges=3 * n,  # ~8-NN superpixel density
                node_feat=5, edge_feat=4, keig=10, num_pool=1, y_dim=1,
            )
            s.y = np.asarray([rng.integers(0, 10)], np.float32)
            samples.append(s)
        batch = collate_dense_packed(samples, node_cap=128, edge_cap=512)
        with open(cache, "wb") as fh:
            pickle.dump(batch, fh)
    real_edges = int(np.asarray(batch.levels[0].edge_mask).sum())
    batch = jax.tree.map(jnp.asarray, batch)

    model, meta = presets.cifar10sp_attpool(mlp_channels=(256,))
    model = dataclasses.replace(
        model,
        cfg=dataclasses.replace(
            model.cfg,
            compute_dtype="bfloat16",
            # preset default is "layer" (measured optimum for the pooled
            # family); override for A/B via BENCH_STACK
            stack_concat=os.environ.get("BENCH_STACK", model.cfg.stack_concat),
        ),
    )
    trainer = Trainer(
        model, TrainerConfig(
            task="classification", lr=1e-3,
            # BENCH_PRNG=rbg probes the TPU-native generator for the
            # dropout bits (threefry fusions ~150 us/step in the round-5
            # batch-64 trace)
            prng_impl=os.environ.get("BENCH_PRNG", "threefry2x32"),
        )
    )
    state = trainer.init_state(batch)
    inner = trainer._train_step_impl

    @jax.jit
    def multi(state, batch):
        def body(s, _):
            s, loss = inner(s, batch)
            return s, loss

        return jax.lax.scan(body, state, None, length=STEPS)

    def sync(x):
        return float(np.asarray(x)[-1])

    t0 = time.time()
    state, losses = multi(state, batch)
    sync(losses)
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        state, losses = multi(state, batch)
        sync(losses)
        times.append(time.time() - t0)
    sps = STEPS / min(times)
    print(json.dumps(dict(
        metric="attpool_edges_per_sec", value=round(real_edges * sps, 1),
        unit="edges/s", batch_graphs=batch_graphs,
        real_edges=real_edges, steps_per_sec=round(sps, 3),
        compile_s=round(compile_s, 1),
        final_loss=float(np.asarray(losses)[-1]),
        backend=jax.default_backend(),
    )), flush=True)


if __name__ == "__main__":
    main()
