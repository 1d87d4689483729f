"""TPU-side cost analysis of the flagship train step (post-fusion numbers).

Compiles the jitted train step for a small packed batch ON THE TPU backend
and prints XLA's own flops / bytes-accessed estimates, scaled to the bench
batch.  No execution — compile only (cache-friendly).

    python benchmarks/cost_probe.py [blocks_scale]
"""

from __future__ import annotations

import os
import sys

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
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    samples = []
    for _ in range(256):
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
    blocks = batch.x_t.shape[0]
    model, meta = presets.zinc_pyr(
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        remat={"0": False, "1": True, "msi": "msi", "dots": "dots"}[
            os.environ.get("BENCH_REMAT", "1")
        ],
    )
    tr = Trainer(model, TrainerConfig(task="regression"))
    state = tr.init_state(batch)
    compiled = jax.jit(tr._train_step_impl).lower(state, batch).compile()
    ca = compiled.cost_analysis()
    f = ca.get("flops", 0.0)
    b = ca.get("bytes accessed", 0.0)
    print(f"backend={jax.default_backend()} blocks={blocks}")
    print(f"flops/step={f/1e9:.1f} GF   bytes accessed={b/1e9:.2f} GB")
    target_blocks = 2748
    sc = target_blocks / blocks
    print(
        f"scaled to {target_blocks} blocks: {f*sc/1e12:.2f} TFLOP, "
        f"{b*sc/1e9:.0f} GB; at 819 GB/s that is {b*sc/819e9*1e3:.0f} ms "
        f"of HBM time, at 394 TF/s bf16 {f*sc/394e12*1e3:.0f} ms of MXU time"
    )
    # memory stats too
    try:
        m = compiled.memory_analysis()
        print(
            f"peak temp={m.temp_size_in_bytes/1e9:.2f} GB "
            f"args={m.argument_size_in_bytes/1e9:.2f} GB "
            f"out={m.output_size_in_bytes/1e9:.2f} GB"
        )
    except Exception as e:
        print("memory_analysis unavailable:", e)


if __name__ == "__main__":
    main()
