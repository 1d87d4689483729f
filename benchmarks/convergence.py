"""Convergence capability check: fit a known graph-spectral target.

Real benchmark data needs egress, so this validates the optimization stack
end-to-end on a *learnable* synthetic task: the regression target is a fixed
nonlinear functional of each molecule's Hodge spectrum and features
(y = tanh(mean L0-smoothness of node features) + 0.5·mean edge feature),
which the model family provably can represent.  Success = validation MAE
driven far below the label std (≪ 1.0), exercising trainer, plateau
scheduling, gating and checkpointing exactly as a real ZINC run would.

    python benchmarks/convergence.py [--epochs 60] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--head_dtype", default=None,
                    help="mixed-precision head (e.g. float32 on a bf16 "
                         "trunk); None follows --dtype")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--channels", default="2,2")
    ap.add_argument("--filters", default="32,64")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--swap_dw", action="store_true",
                    help="swapped-dW stack-GEMM backward (nn/gemm.py)")
    ap.add_argument("--seed", type=int, default=0,
                    help="data-generation seed (numeric-perturbation draws "
                         "for dtype A/Bs)")
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
    import jax.numpy as jnp
    import numpy as np

    from hl_hgat_tpu.complex.dense import collate_dense, dense_pad_spec
    from hl_hgat_tpu.data.synthetic import random_simplex_sample
    from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(args.seed)
    samples = []
    for _ in range(args.n):
        s = random_simplex_sample(
            rng, n_nodes=int(rng.integers(14, 30)), node_feat=6, edge_feat=4,
            keig=6,
        )
        st = s.levels[0]
        l0 = np.zeros((st.num_nodes, st.num_nodes))
        np.add.at(l0, (st.l0_rows, st.l0_cols), st.l0_vals)
        smooth = np.mean(s.x_t[:, :6] * (l0 @ s.x_t[:, :6]))
        s.y = np.asarray(
            [np.tanh(3 * smooth) + 0.5 * s.x_s[:, 0].mean()], np.float32
        )
        samples.append(s)
    ys = np.asarray([float(s.y[0]) for s in samples])
    print(f"label std: {ys.std():.3f}")

    pads = dense_pad_spec(samples, multiple=8)
    n_val = args.n // 8
    to_batches = lambda ss: [  # noqa: E731
        jax.tree.map(
            jnp.asarray,
            collate_dense(ss[i : i + args.batch_size], pads),
        )
        for i in range(0, len(ss) - args.batch_size + 1, args.batch_size)
    ]
    val_b = to_batches(samples[:n_val])
    train_b = to_batches(samples[n_val:])

    if args.swap_dw:
        from hl_hgat_tpu.nn.gemm import use_swap_dw

        use_swap_dw(True)
    channels = tuple(int(x) for x in args.channels.split(","))
    filters = tuple(int(x) for x in args.filters.split(","))
    model = HLHGCNNGraph(
        cfg=BackboneConfig(channels=channels, filters=filters, k=args.k,
                           init_k=args.k,
                           compute_dtype=args.dtype, remat=args.remat,
                           head_dtype=args.head_dtype),
        mlp_channels=(64,),
        num_classes=1,
    )
    trainer = Trainer(
        model,
        TrainerConfig(task="regression", lr=2e-3, weight_decay=1e-5,
                      plateau_patience=8, save_gate=None),
    )
    state = trainer.init_state(train_b[0])
    state = trainer.fit(
        state, lambda: train_b, lambda: val_b, epochs=args.epochs,
        verbose=True,
    )
    best = min(h["val_metric"] for h in trainer.history)
    print(json.dumps(dict(metric="synthetic_val_mae", value=round(best, 4),
                          label_std=round(float(ys.std()), 4),
                          dtype=args.dtype, remat=args.remat,
                          head_dtype=args.head_dtype, seed=args.seed,
                          filters=args.filters, swap_dw=args.swap_dw,
                          ratio=round(best / ys.std(), 3))), flush=True)


if __name__ == "__main__":
    main()
