"""End-to-end training-epoch wall time: loader + collate + step pipeline.

bench.py measures pure device throughput (one batch, scan inside jit); this
measures what a user's `Trainer.fit` epoch actually costs, including the
per-epoch reshuffle, native packed collate, host dispatch and the loss
readback — the pieces the reference delegates to PyG DataLoader workers.

Modes compare the pipeline stages:
  * sync      — float(loss) after every step (pre-optimization behavior:
                every dispatch gated on a ~30 ms tunnel round-trip)
  * lazy      — on-device loss accumulation, one readback per epoch
                (trainer.train_epoch), collate inline
  * prefetch  — lazy + a daemon thread collating ``depth`` batches ahead
                (data/prefetch.py; the C fills release the GIL)
  * compact   — prefetch + compact COO transfer: operators densify on
                device (complex/compact.py), ~5-15x fewer bytes per batch
                cross the host->device link
  * derived   — compact minus the L0/L1 triplets and degrees: only B1 +
                per-graph 2/λmax cross the link; two batched matmuls
                rebuild the Laplacians on device (~40% fewer bytes again)

    python benchmarks/epoch_bench.py [n_graphs] [batch]
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
    from hl_hgat_tpu.data.loader import BucketedLoader
    from hl_hgat_tpu.data.prefetch import prefetch
    from hl_hgat_tpu.data.synthetic import random_simplex_sample
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    n_graphs = int(sys.argv[1]) if len(sys.argv) > 1 else 3200
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 320

    rng = np.random.default_rng(0)
    samples = []
    for _ in range(n_graphs):
        n = int(rng.integers(15, 33))
        s = random_simplex_sample(
            rng, n_nodes=n, extra_edges=int(rng.integers(2, 6)),
            node_feat=1, edge_feat=1, keig=16,
        )
        s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
        s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
        samples.append(s)
    real_edges = sum(s.num_edges for s in samples)

    loader = BucketedLoader(
        samples, batch_size=batch, layout="dense_packed", seed=0
    )
    loader_c = BucketedLoader(
        samples, batch_size=batch, layout="dense_packed", seed=0,
        transfer="compact",
    )
    loader_d = BucketedLoader(
        samples, batch_size=batch, layout="dense_packed", seed=0,
        transfer="derived",
    )
    # bf16 feature transfer is bit-identical under the bf16-compute model
    # (loader feature_dtype docstring) — halves the dominant x_t/x_s bytes
    loader_d16 = BucketedLoader(
        samples, batch_size=batch, layout="dense_packed", seed=0,
        transfer="derived", feature_dtype="bfloat16",
    )
    model, _ = presets.zinc_pyr(compute_dtype="bfloat16")
    trainer = Trainer(
        model, TrainerConfig(task="regression", lr=1e-3, prefetch=0)
    )
    first = next(iter(loader))
    state = trainer.init_state(jax.tree.map(jnp.asarray, first))

    def epoch(mode):
        nonlocal state
        it = iter(
            {"compact": loader_c, "derived": loader_d,
             "derived_bf16": loader_d16}.get(mode, loader)
        )
        if mode != "sync" and mode != "lazy":
            it = prefetch(it, depth=2)
        t0 = time.time()
        if mode == "sync":
            for b in it:
                state, loss = trainer._train_step(
                    state, jax.tree.map(jnp.asarray, b)
                )
                float(np.asarray(loss))
        else:
            state, _ = trainer.train_epoch(
                state, (jax.tree.map(jnp.asarray, b) for b in it)
            )
        return time.time() - t0

    epoch("lazy")  # warm the compile for this shape set
    epoch("compact")
    epoch("derived")
    epoch("derived_bf16")
    out = {}
    for mode in ("sync", "lazy", "prefetch", "compact", "derived",
                 "derived_bf16"):
        out[mode] = round(min(epoch(mode) for _ in range(2)), 3)
    print(json.dumps(dict(
        metric="epoch_seconds", modes=out, n_graphs=n_graphs,
        batch_graphs=batch, real_edges=real_edges,
        edges_per_sec_best=round(real_edges / min(out.values()), 1),
        backend=jax.default_backend(),
    )), flush=True)


if __name__ == "__main__":
    main()
