"""bf16 accuracy validation across ALL benchmark task types.

benchmarks/convergence.py validates the regression (ZINC) stack; this script
covers the remaining heads — classification (CIFAR10-SP), multilabel
(Peptides-func), edge-binary (TSP) — on learnable synthetic targets, running
each task in f32 and bf16(+per-layer-remat) and reporting the metric pair.
Real-data gates (SURVEY.md §6) still need egress; this isolates the numeric
question "does the bf16+remat throughput recipe converge per task head".

Targets are functionals of the complex the model family can represent:
  classification: quartile bin of tanh(3·L0-smoothness) + 0.5·mean edge feat
  multilabel:     10 bits — per-column node-feature smoothness vs median
  edge_binary:    x_s[:,0] above the per-graph edge median (balanced)

    python benchmarks/convergence_tasks.py [--epochs 30] [--cpu] [--task all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def build_samples(task: str, n: int, rng):
    import numpy as np

    from hl_hgat_tpu.data.synthetic import random_simplex_sample

    samples, scalars = [], []
    for _ in range(n):
        s = random_simplex_sample(
            rng, n_nodes=int(rng.integers(14, 30)), node_feat=6, edge_feat=4,
            keig=6,
        )
        st = s.levels[0]
        l0 = np.zeros((st.num_nodes, st.num_nodes))
        np.add.at(l0, (st.l0_rows, st.l0_cols), st.l0_vals)
        if task == "classification":
            smooth = np.mean(s.x_t[:, :6] * (l0 @ s.x_t[:, :6]))
            scalars.append(np.tanh(3 * smooth) + 0.5 * s.x_s[:, 0].mean())
        elif task == "multilabel":
            per_col = np.mean(s.x_t[:, :6] * (l0 @ s.x_t[:, :6]), axis=0)
            feats = np.concatenate(
                [per_col, s.x_s[:, :4].mean(axis=0)]
            )  # 10 functionals
            scalars.append(feats)
        elif task == "edge_binary":
            med = np.median(s.x_s[:, 0])
            s.y = (s.x_s[:, 0] > med).astype(np.float32)
            s.x_s = np.concatenate(
                [s.x_s, np.ones((s.num_edges, 1), np.float32)], axis=1
            )  # aug-mask column (TSP model contract)
        samples.append(s)

    if task == "classification":
        qs = np.quantile(scalars, [0.25, 0.5, 0.75])
        for s, v in zip(samples, scalars):
            s.y = np.asarray([np.searchsorted(qs, v)], np.float32)
    elif task == "multilabel":
        med = np.median(np.asarray(scalars), axis=0)
        for s, v in zip(samples, scalars):
            s.y = (v > med).astype(np.float32)
    return samples


def run(task: str, dtype: str, remat: bool, args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hl_hgat_tpu.complex.dense import collate_dense, dense_pad_spec
    from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph, HLHGCNNTsp
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    samples = build_samples(task, args.n, rng)
    pads = dense_pad_spec(samples, multiple=8)
    y_per_edge = task == "edge_binary"
    to_batches = lambda ss: [  # noqa: E731
        jax.tree.map(
            jnp.asarray,
            collate_dense(ss[i : i + args.batch_size], pads,
                          y_per_edge=y_per_edge),
        )
        for i in range(0, len(ss) - args.batch_size + 1, args.batch_size)
    ]
    n_val = args.n // 8
    val_b = to_batches(samples[:n_val])
    train_b = to_batches(samples[n_val:])

    cfg = BackboneConfig(channels=(2, 2), filters=(32, 64), k=4, init_k=4,
                         compute_dtype=dtype, remat=remat)
    if task == "classification":
        model = HLHGCNNGraph(cfg=cfg, mlp_channels=(64,), num_classes=4)
        tcfg = TrainerConfig(task="classification", lr=2e-3,
                             weight_decay=1e-5, metric_mode="max")
    elif task == "multilabel":
        model = HLHGCNNGraph(cfg=cfg, mlp_channels=(64,), num_classes=10)
        tcfg = TrainerConfig(task="multilabel", lr=2e-3, weight_decay=1e-5,
                             metric_mode="max")
    else:
        model = HLHGCNNTsp(cfg=cfg, mlp_channels=(32,))
        tcfg = TrainerConfig(task="edge_binary", lr=2e-3, weight_decay=1e-5,
                             metric_mode="max")
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(train_b[0])
    state = trainer.fit(state, lambda: train_b, lambda: val_b,
                        epochs=args.epochs, verbose=args.verbose)
    return max(h["val_metric"] for h in trainer.history)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--task", default="all",
                    choices=["all", "classification", "multilabel",
                             "edge_binary"])
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    tasks = (
        ["classification", "multilabel", "edge_binary"]
        if args.task == "all"
        else [args.task]
    )
    chance = dict(classification=0.25, multilabel=0.5, edge_binary=0.0)
    for task in tasks:
        m32 = run(task, "float32", False, args)
        m16 = run(task, "bfloat16", True, args)
        print(json.dumps(dict(
            metric=f"{task}_val", f32=round(m32, 4), bf16_remat=round(m16, 4),
            chance=chance[task], epochs=args.epochs,
        )), flush=True)


if __name__ == "__main__":
    main()
