"""Convergence A/B: threefry (default) vs TPU-native rbg dropout bits.

`TrainerConfig.prng_impl='rbg'` swaps the training PRNG stream for the
hardware generator — measured +4.8% on the dropout-0.25 pooled family
step (benchmarks/RESULTS.md round 5).  This harness checks the *quality*
side: the cifar-shaped gated/pooled head (dropout 0.25 active in every
block) trained on the same learnable synthetic superpixel task as
benchmarks/aug_ab.py, best val accuracy per seed under each impl.  The
reference has no stream-parity contract to preserve (torch's RNG is its
own stream, reference main_cifar10SP_...py just calls F.dropout), so the
only question is whether rbg's bits train as well as threefry's.

    python benchmarks/prng_ab.py [--seeds 4] [--epochs 24] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from aug_ab import make_raw, build_samples  # noqa: E402  (sibling module)


def run_config(impl, raws, labels, val_samples, args, seed):
    import jax
    import jax.numpy as jnp

    from hl_hgat_tpu.data.loader import BucketedLoader
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    train_samples = build_samples(raws, labels, 1, seed=seed)
    train_loader = BucketedLoader(
        train_samples, batch_size=8, shuffle=True, seed=seed,
    )
    val_loader = BucketedLoader(
        val_samples, batch_size=8, shuffle=False, pad_final=False,
    )
    model, _ = presets.cifar10sp_attpool(
        channels=(1, 1), filters=(8, 16), k=2, keig=5, dropout=0.25,
        mlp_channels=(8,),
    )
    trainer = Trainer(model, TrainerConfig(
        task="classification", lr=2e-3, metric_mode="max",
        plateau_patience=8, seed=seed, prefetch=0, prng_impl=impl,
    ))
    to_dev = lambda it: (jax.tree.map(jnp.asarray, b) for b in it)  # noqa
    state = trainer.init_state(
        jax.tree.map(jnp.asarray, next(iter(train_loader)))
    )
    state = trainer.fit(
        state, lambda: to_dev(train_loader), lambda: to_dev(val_loader),
        epochs=args.epochs, verbose=False,
    )
    return trainer.best_metric


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--n_val", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--seed0", type=int, default=0,
                    help="first seed (run seeds in separate processes — "
                    "many Trainer re-instantiations in one process can "
                    "crash the tunneled TPU worker)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(7)
    raws, labels = make_raw(rng, args.n)
    val_raws, val_labels = make_raw(np.random.default_rng(8), args.n_val)
    val_samples = build_samples(val_raws, val_labels, 1, seed=0)

    results = {}
    for impl in ("threefry2x32", "rbg"):
        accs = [
            run_config(impl, raws, labels, val_samples, args, seed=s)
            for s in range(args.seed0, args.seed0 + args.seeds)
        ]
        results[impl] = dict(
            best_val_acc=[round(float(a), 4) for a in accs],
            mean=round(float(np.mean(accs)), 4),
            std=round(float(np.std(accs)), 4),
        )
        print(json.dumps({impl: results[impl]}), flush=True)
    print(json.dumps(dict(metric="prng_ab", backend=jax.default_backend(),
                          epochs=args.epochs, results=results)), flush=True)


if __name__ == "__main__":
    main()
