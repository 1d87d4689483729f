"""Inference throughput: edges/s through the flagship forward pass.

The serving path (hl_hgat_tpu/serving.py) runs the deterministic forward
only — no backward, no optimizer, BN in inference mode — so its throughput
ceiling is far above the training step's.  Same methodology as bench.py:
resident batch, lax.scan inside one jit call, host-readback barrier.

    python benchmarks/infer_bench.py [batch_graphs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    from hl_hgat_tpu.complex.dense import collate_dense_packed
    from hl_hgat_tpu.data.synthetic import random_simplex_sample
    from hl_hgat_tpu.models import presets

    batch_graphs = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    steps = int(os.environ.get("BENCH_STEPS", "200"))

    rng = np.random.default_rng(0)
    samples = []
    for _ in range(batch_graphs):
        n = int(rng.integers(15, 33))
        s = random_simplex_sample(
            rng, n_nodes=n, extra_edges=int(rng.integers(2, 6)),
            node_feat=1, edge_feat=1, keig=16,
        )
        s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
        s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
        samples.append(s)
    batch = jax.tree.map(
        jnp.asarray, collate_dense_packed(samples, node_cap=128, edge_cap=128)
    )
    real_edges = int(np.asarray(batch.levels[0].edge_mask).sum())

    model, _ = presets.zinc_pyr(
        channels=(2, 3, 3), filters=(64, 128, 256), k=6, keig=15,
        mlp_channels=(256, 256), compute_dtype="bfloat16",
    )
    variables = model.init(
        {"params": jax.random.key(0)}, batch, deterministic=True
    )

    def many(variables, batch):
        # the carry must FEED the input, or XLA hoists the loop-invariant
        # forward out of the scan and the "throughput" is one forward total
        # (measured: 54M edges/s fiction vs 15M real)
        import dataclasses

        def body(c, _):
            b = dataclasses.replace(
                batch, x_t=batch.x_t + (c * 1e-30).astype(batch.x_t.dtype)
            )
            out = model.apply(variables, b, deterministic=True)
            return jnp.sum(out).astype(jnp.float32), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=steps
        )
        return total

    many = jax.jit(many)

    def sync(x):
        return float(np.asarray(x))

    t0 = time.time()
    sync(many(variables, batch))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        sync(many(variables, batch))
        times.append(time.time() - t0)
    best = min(times)
    eps = real_edges * steps / best
    print(json.dumps(dict(
        metric="inference_edges_per_sec", value=round(eps, 1),
        unit="edges/s", batch_graphs=batch_graphs,
        real_edges_per_batch=real_edges,
        steps_per_sec=round(steps / best, 2),
        compile_s=round(compile_s, 1), backend=jax.default_backend(),
    )), flush=True)


if __name__ == "__main__":
    main()
