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
  node_class:     per-node class = argmax of a fixed projection of features
                  (the beyond-reference PascalVOC/COCO head, macro-F1)
  link_pred:      1-pos-vs-8-neg edge recovery from eig-PE features (the
                  beyond-reference PCQM-Contact head, MRR)

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
        elif task == "node_class":
            w = np.random.default_rng(7).standard_normal((6, 5))
            s.y = np.argmax(
                s.x_t[:, :6] @ w, axis=1
            ).astype(np.float32).reshape(-1, 1)
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
    if task == "node_class":
        # per-node labels ride the COO layout (loader contract)
        from hl_hgat_tpu.complex.build import collate, pad_spec

        pads_coo = pad_spec(samples, multiple=8)
        to_batches = lambda ss: [  # noqa: E731
            jax.tree.map(
                jnp.asarray,
                collate(ss[i : i + args.batch_size], pads_coo,
                        y_per_node=True),
            )
            for i in range(0, len(ss) - args.batch_size + 1, args.batch_size)
        ]
    else:
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
    if task == "node_class":
        from hl_hgat_tpu.models.backbone import HLHGCNNNode

        model = HLHGCNNNode(cfg=cfg, mlp_channels=(32,), num_classes=5)
        tcfg = TrainerConfig(task="node_classification", lr=2e-3,
                             weight_decay=1e-5, metric_mode="max")
    elif task == "classification":
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


def run_link(dtype: str, remat: bool, args):
    """PCQM-Contact-style link prediction proxy: recover held-out edges from
    eig-PE node features (adjacent nodes share PE structure), 1 positive vs
    8 negatives per query, BCE training, MRR eval — the beyond-reference
    ``HLHGCNNLinkPred`` head (models/backbone.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hl_hgat_tpu.complex.build import collate, pad_spec
    from hl_hgat_tpu.data.synthetic import random_simplex_sample
    from hl_hgat_tpu.models import BackboneConfig
    from hl_hgat_tpu.models.backbone import HLHGCNNLinkPred
    from hl_hgat_tpu.train.metrics import mrr
    from hl_hgat_tpu.train.losses import bce_logits_loss
    from hl_hgat_tpu.train.optim import adam_l2
    import optax

    rng = np.random.default_rng(0)
    samples = [
        random_simplex_sample(
            rng, n_nodes=int(rng.integers(14, 30)), node_feat=6, edge_feat=4,
            keig=6,
        )
        for _ in range(args.n)
    ]
    pads = pad_spec(samples, multiple=8)
    n_queries, n_neg = 4, 8

    def make_pairs(ss, offs, rng):
        """[Q·(1+neg), 2] pairs per batch: per graph, n_queries held-out
        edges (positives) + uniform non-adjacent pairs (negatives)."""
        pairs, labels = [], []
        for off, s in zip(offs, ss):
            st = s.levels[0]
            es = set(zip(st.src.tolist(), st.dst.tolist()))
            pos_idx = rng.choice(st.num_edges, n_queries, replace=True)
            for pi in pos_idx:
                pairs.append((off + st.src[pi], off + st.dst[pi]))
                labels.append(1.0)
                negs = 0
                while negs < n_neg:
                    a, b = rng.integers(0, st.num_nodes, 2)
                    lo, hi = int(min(a, b)), int(max(a, b))
                    if lo == hi or (lo, hi) in es:
                        continue
                    pairs.append((off + lo, off + hi))
                    labels.append(0.0)
                    negs += 1
        return (np.asarray(pairs, np.int32),
                np.asarray(labels, np.float32))

    def to_batches(ss, seed):
        prng = np.random.default_rng(seed)
        out = []
        for i in range(0, len(ss) - args.batch_size + 1, args.batch_size):
            chunk = ss[i : i + args.batch_size]
            offs = np.cumsum([0] + [s.num_nodes for s in chunk])[:-1]
            batch = collate(chunk, pads)
            pairs, labels = make_pairs(chunk, offs, prng)
            out.append((
                jax.tree.map(jnp.asarray, batch), jnp.asarray(pairs),
                jnp.asarray(labels),
            ))
        return out

    n_val = args.n // 8
    val_b = to_batches(samples[:n_val], seed=1)
    train_b = to_batches(samples[n_val:], seed=2)

    cfg = BackboneConfig(channels=(2, 2), filters=(32, 64), k=4, init_k=4,
                         compute_dtype=dtype, remat=remat)
    model = HLHGCNNLinkPred(cfg=cfg, mlp_channels=(32,))
    b0, p0, l0 = train_b[0]
    ones = jnp.ones(p0.shape[0], jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        b0, p0, ones, deterministic=True,
    )
    params, bstats = variables["params"], variables.get("batch_stats", {})
    tx = adam_l2(2e-3, 1e-5)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, bstats, opt_state, batch, pairs, labels, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, batch, pairs, ones,
                deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            return bce_logits_loss(out, labels), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), mut["batch_stats"],
                opt_state, loss)

    @jax.jit
    def eval_step(params, bstats, batch, pairs):
        return model.apply(
            {"params": params, "batch_stats": bstats}, batch, pairs, ones,
            deterministic=True,
        )

    key = jax.random.key(2)
    best = 0.0
    for epoch in range(args.epochs):
        for batch, pairs, labels in train_b:
            key, sk = jax.random.split(key)
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, batch, pairs, labels, sk)
        scores = [
            np.asarray(eval_step(params, bstats, batch, pairs))
            for batch, pairs, _ in val_b
        ]
        qs = np.concatenate(scores).reshape(-1, 1 + n_neg)
        m = mrr(qs[:, 0], qs[:, 1:])
        best = max(best, m)
        if args.verbose:
            print(f"link epoch {epoch}: mrr {m:.4f}", flush=True)
    return best


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--task", default="all",
                    choices=["all", "classification", "multilabel",
                             "edge_binary", "node_class", "link_pred"])
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
        ["classification", "multilabel", "edge_binary", "node_class",
         "link_pred"]
        if args.task == "all"
        else [args.task]
    )
    # link_pred chance = E[1/rank] under random scores with 1 pos + 8 negs
    chance = dict(classification=0.25, multilabel=0.5, edge_binary=0.0,
                  node_class=0.2, link_pred=0.314)
    for task in tasks:
        if task == "link_pred":
            m32 = run_link("float32", False, args)
            m16 = run_link("bfloat16", True, args)
        else:
            m32 = run(task, "float32", False, args)
            m16 = run(task, "bfloat16", True, args)
        print(json.dumps(dict(
            metric=f"{task}_val", f32=round(m32, 4), bf16_remat=round(m16, 4),
            chance=chance[task], epochs=args.epochs,
        )), flush=True)


if __name__ == "__main__":
    main()
