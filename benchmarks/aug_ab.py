"""Aug-variant sufficiency A/B (VERDICT r4 item 6).

The reference re-rolls structure augmentation FRESH every epoch on CPU
(CIFAR10SP edge dropout per sample per epoch, reference
lib/Hodge_Dataset.py:769-804); this repo precomputes ``aug_variants=N``
rolls per graph and cycles them (static shapes — a fresh roll would change
the complex and the jit shapes every epoch).  This measures what N
suffices: train the CIFAR-shaped gated/pooled head on a synthetic
superpixel task at N ∈ {1, 4, 16, E} — N=E (one fresh variant per epoch)
IS the reference's fresh-per-epoch semantics for an E-epoch run, so the
gap between N=E and smaller N bounds the deviation.

Each config uses the REAL aug machinery (`cifar10sp_sample(aug=...)`:
25%-chance 0.5 edge dropout, full Laplacian/PE/pyramid rebuild per roll)
and the real loader cycling (`BucketedLoader(variants=N)` — per-epoch
decorrelated rolls).  Validation is on clean (un-augmented) held-out
graphs.

    python benchmarks/aug_ab.py [--epochs 24] [--cpu] [--n 96] [--seeds 2]

Prints one JSON line per (N, seed) + a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def make_raw(rng, n_graphs):
    """Synthetic superpixel-shaped raw graphs with a learnable label: the
    quartile of a smoothness functional of the rgb field (same recipe as
    benchmarks/convergence_tasks.py classification)."""
    import numpy as np

    raws, scalars = [], []
    for _ in range(n_graphs):
        n = int(rng.integers(14, 26))
        src = np.arange(n, dtype=np.int64)
        dst = (src + 1) % n
        extra = rng.integers(0, n, (2, 6))
        keep = extra[0] != extra[1]
        ei = np.concatenate(
            [np.stack([src, dst]), extra[:, keep]], axis=1
        )
        ei = np.concatenate([ei, ei[::-1]], axis=1)
        x = rng.random((n, 3)).astype(np.float32)
        pos = rng.random((n, 2)).astype(np.float32)
        ea = rng.random(ei.shape[1]).astype(np.float32)
        a = np.zeros((n, n))
        a[ei[0], ei[1]] = 1.0
        lap = np.diag(a.sum(1)) - a
        scalars.append(float(np.mean(x * (lap @ x))))
        raws.append((ei, ea, x, pos))
    qs = np.quantile(scalars, [0.25, 0.5, 0.75])
    labels = [int(np.searchsorted(qs, v)) for v in scalars]
    return raws, labels


def build_samples(raws, labels, variants, seed, keig=5):
    import numpy as np

    from hl_hgat_tpu.data.datasets import cifar10sp_sample

    out = []
    for gi, ((ei, ea, x, pos), y) in enumerate(zip(raws, labels)):
        for v in range(variants):
            out.append(cifar10sp_sample(
                ei, ea, x, pos, y, keig=keig, num_pool=1, aug=v > 0,
                rng=np.random.default_rng((seed, gi, v)),
            ))
    return out


def run_config(variants, raws, labels, val_samples, args, seed):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hl_hgat_tpu.data.loader import BucketedLoader
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    train_samples = build_samples(raws, labels, variants, seed=seed)
    train_loader = BucketedLoader(
        train_samples, batch_size=8, shuffle=True, seed=seed,
        variants=variants,
    )
    val_loader = BucketedLoader(
        val_samples, batch_size=8, shuffle=False, pad_final=False,
    )
    model, _ = presets.cifar10sp_attpool(
        channels=(1, 1), filters=(8, 16), k=2, keig=5, dropout=0.0,
        mlp_channels=(8,),
    )
    trainer = Trainer(model, TrainerConfig(
        task="classification", lr=2e-3, metric_mode="max",
        plateau_patience=8, seed=seed, prefetch=0,
    ))
    to_dev = lambda it: (jax.tree.map(jnp.asarray, b) for b in it)  # noqa
    state = trainer.init_state(
        jax.tree.map(jnp.asarray, next(iter(train_loader)))
    )
    state = trainer.fit(
        state, lambda: to_dev(train_loader), lambda: to_dev(val_loader),
        epochs=args.epochs, verbose=False,
    )
    _, final_acc = trainer.evaluate(state, to_dev(val_loader))
    return trainer.best_metric, final_acc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--n_val", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
    except Exception:
        pass

    rng = np.random.default_rng(7)
    raws, labels = make_raw(rng, args.n + args.n_val)
    val_raws, val_labels = raws[args.n:], labels[args.n:]
    raws, labels = raws[: args.n], labels[: args.n]
    val_samples = build_samples(val_raws, val_labels, variants=1, seed=99)

    grid = sorted({1, 4, 16, args.epochs})
    table = {}
    for variants in grid:
        accs = []
        for seed in range(args.seeds):
            best, final = run_config(
                variants, raws, labels, val_samples, args, seed
            )
            accs.append(best)
            print(json.dumps(dict(
                metric="aug_ab_val_acc", variants=variants, seed=seed,
                best_acc=round(best, 4), final_acc=round(final, 4),
                epochs=args.epochs, backend=jax.default_backend(),
            )), flush=True)
        table[variants] = (float(np.mean(accs)), float(np.std(accs)))
    print("\nN_variants  best_val_acc (mean ± std over seeds; "
          f"N={args.epochs} = fresh-per-epoch reference semantics)")
    for v, (m, s) in table.items():
        print(f"{v:>10}  {m:.4f} ± {s:.4f}")


if __name__ == "__main__":
    main()
