"""Training entry point (the reference's L4 `main_*.py` scripts as one CLI).

    python -m hl_hgat_tpu.run --benchmark zinc --c1 2 --c2 3 --c3 3 --K 6 \
        --batch_size 256 --lr 1e-3 --l2 1e-3 --epochs 600

Flags mirror the reference argparse surface (reference main_zinc...py:25-38);
5-fold seed loops, ReduceLROnPlateau, metric-gated checkpointing and the
early-stop-on-lr rule are preserved.  Without a ``--data_root`` holding the
real benchmark, ``--synthetic`` trains on benchmark-shaped synthetic data
(smoke/perf mode).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--benchmark", default="zinc",
                   choices=["zinc", "pepfunc", "tsp", "cifar10sp", "brain",
                            "pascalvoc", "coco", "pcqm"])
    p.add_argument("--c1", type=int, default=2)
    p.add_argument("--c2", type=int, default=3)
    p.add_argument("--c3", type=int, default=3)
    p.add_argument("--filters", type=int, default=64)
    p.add_argument("--mlp_channels", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--l2", type=float, default=1e-3)
    p.add_argument("--dropout_ratio", type=float, default=0.0)
    p.add_argument("--K", type=int, default=6)
    p.add_argument("--keig", type=int, default=0,
                   help="PE dims (0 = benchmark default, capped below filters)")
    p.add_argument("--batch_size", type=int, default=128,
                   help="default 128 = the reference scripts' training "
                        "batch (an optimization choice, kept).  Measured "
                        "single-chip THROUGHPUT knees if you only care "
                        "about step rate (benchmarks/RESULTS.md round 5): "
                        "zinc-shaped packed 384; pooled attpool (cifar/"
                        "pepfunc) 64; TSP-500 banded 32; brain 16 "
                        "subjects — the pooled/banded families are "
                        "bandwidth-bound, so their knees sit LOW.  "
                        "Dropout-active families also gain +8%% from "
                        "--prng rbg")
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--fold", type=int, default=-1)
    p.add_argument("--test", type=int, default=0)
    p.add_argument("--aug_variants", type=int, default=-1,
                   help="CIFAR10-SP structure augmentation: preprocess "
                        "N independent dropout rolls per training graph and "
                        "cycle one per epoch (the reference re-rolls at "
                        "load time every epoch; -1 = auto: 8 for the "
                        "cifar10sp train split, else 1.  TSP instead uses "
                        "the on-device per-step dropout (--tsp_aug_prob); "
                        "passing an explicit N>1 for tsp switches it to "
                        "host-side variants)")
    p.add_argument("--tsp_aug_prob", type=float, default=0.75,
                   help="TSP on-device structure augmentation: probability "
                        "a graph gets a label-protected edge-simplex "
                        "dropout roll each step (reference aug_prob, "
                        "main_TSP...py:404; 0 = off)")
    p.add_argument("--ckpt_every", type=int, default=0,
                   help="also save full state every N epochs to "
                        "<ckpt_dir>/latest (crash recovery; 0 = off)")
    p.add_argument("--resume", type=int, default=0,
                   help="resume the fold from its latest checkpoint "
                        "(full state: params, optimizer, scheduler, PRNG; "
                        "the reference's --finetune analog with true "
                        "resume semantics)")
    p.add_argument("--data_root", default=None)
    p.add_argument("--limit_samples", type=int, default=0,
                   help="truncate each real-data split after N graphs "
                        "(quick smoke runs; 0 = full split)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n_synthetic", type=int, default=512)
    p.add_argument("--save_dir", default="./weights")
    p.add_argument("--layout", default="auto",
                   choices=["auto", "coo", "packed"],
                   help="batch layout: auto (default — packed dense "
                        "superblocks wherever every graph fits the pack "
                        "caps, i.e. the measured 1.9M-edges/s recipe from "
                        "benchmarks/RESULTS.md; falls back to coo "
                        "otherwise), coo (general fallback, ~16x slower), "
                        "or packed (force the MXU fast path)")
    p.add_argument("--pack_cap", type=int, default=128,
                   help="node/edge capacity of one packed superblock")
    p.add_argument("--edge_cap", type=int, default=0,
                   help="edge capacity override for packed superblocks "
                        "(0 = same as --pack_cap; superpixel/TSP graphs "
                        "carry ~3-10x more edges than nodes)")
    p.add_argument("--transfer", default="derived",
                   choices=["dense", "compact", "derived"],
                   help="packed-layout transfer format (benchmarks/"
                        "RESULTS.md): derived (default) ships only B1 + "
                        "spectral scales and rebuilds L0/L1/deg on device "
                        "(fastest epochs; ≤1 ulp vs host operators), "
                        "compact ships COO operator triplets, dense ships "
                        "ready blocks")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation compute dtype (accuracy gates default "
                        "to float32; bfloat16 is the throughput recipe)")
    p.add_argument("--swap_dw", default="auto",
                   choices=["auto", "0", "1"],
                   help="swapped-dW stack-GEMM backward (nn/gemm.py): "
                        "auto = on for bfloat16 (the measured recipe, "
                        "+1.9%% at the flagship knee; 2-seed convergence "
                        "within the draw band), off for float32 (keeps "
                        "grads bit-comparable to einsum autodiff)")
    p.add_argument("--prng", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="PRNG for the TRAINING stream (dropout/aug bits; "
                        "param init always uses threefry so weights are "
                        "reproducible across choices).  'rbg' = the "
                        "TPU-native hardware generator: +8.4%% on the "
                        "dropout-0.25 pooled family step, converges "
                        "inside the seed band (benchmarks/prng_ab.py); "
                        "opt-in because it changes the dropout stream")
    p.add_argument("--remat", default="0",
                   choices=["0", "1", "msi", "dots"],
                   help="backward rematerialization granularity")
    p.add_argument("--stack_concat", default="block",
                   choices=["layer", "block", "never"],
                   help="dense-concat stack materialization granularity "
                        "(models/backbone.py)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices: >1 trains through the "
                        "sharded mesh step (parallel/dp_trainer.py); "
                        "--batch_size is per device")
    p.add_argument("--fused", type=int, default=0,
                   help="route dense-layout Laguerre convs through the "
                        "fused Pallas kernel (benchmarks/RESULTS.md)")
    # brain benchmark only (the OHBM workflow, reference
    # HL-HGAT-DEMO/OHBM_DEMO.ipynb cells 36-43)
    p.add_argument("--pool_num", type=int, default=2,
                   help="brain: MLGC_Weight pooling levels (notebook: 2)")
    p.add_argument("--t", type=int, default=128,
                   help="brain: synthetic fMRI series length")
    p.add_argument("--crop_len", type=int, default=0,
                   help="brain: temporal crop augmentation length "
                        "(reference ifaug random crop; 0 = full series, "
                        "no crop)")
    p.add_argument("--rois", type=int, default=0,
                   help="brain: 0 = auto (the REAL Shen-268 skeleton + "
                        "MLGC_Weight pyramid from the reference's shipped "
                        "Group_FC/FCMask data when present, else 32 "
                        "synthetic ROIs); N>0 forces an N-ROI synthetic "
                        "skeleton")
    p.add_argument("--brain_model", default="hgat",
                   choices=["hgat", "abcd"],
                   help="brain: hgat = the DEMO HL_HGAT_attpool (OHBM "
                        "workflow, default); abcd = the lib ABCD model "
                        "(pool_loc LIST, reference "
                        "lib/Hodge_ST_Model.py:26-168) on the same "
                        "shared-skeleton pyramid at scale")
    return p


# flags a `--benchmark brain` run re-defaults to the benched recipe
# (benchmarks/RESULTS.md round 3: shared-skeleton layout + bf16 Inception,
# 6.48M edges/s at batch 16) and the notebook's hyperparameters
# (OHBM_DEMO.ipynb cell 40: lr=l2=1e-4; cell 36 model widths) — explicit
# command-line values always win
BRAIN_DEFAULTS = dict(
    c2=2, c3=2, K=4, batch_size=16, dtype="bfloat16",
    lr=1e-4, l2=1e-4, mlp_channels=1, stack_concat="layer",
)


def apply_brain_defaults(args, argv) -> None:
    import sys as _sys

    passed = set()
    for a in (argv if argv is not None else _sys.argv[1:]):
        if isinstance(a, str) and a.startswith("--"):
            passed.add(a.lstrip("-").split("=")[0])
    for k, v in BRAIN_DEFAULTS.items():
        if k not in passed:
            setattr(args, k, v)


BENCH_SETTINGS = {
    # (preset kwargs builder, TrainerConfig kwargs) — gates from SURVEY.md §6.
    # pe_static = leading non-PE feature columns (node, edge): enables the
    # device-side eigen-PE sign-flip augmentation matching the reference's
    # load-time flips (reference lib/Hodge_Dataset.py:428-439; TSP carries
    # no PE).  The reference's per-epoch STRUCTURE augs: TSP label-protected
    # edge-simplex dropout runs ON DEVICE per step (TrainerConfig
    # tsp_aug_prob, complex/augment.py tsp_dropout_device); CIFAR edge
    # dropout rebuilds the whole complex (spectra, PEs, pyramid — reference
    # lib/Hodge_Dataset.py:829-882) so it stays host-side via precomputed
    # --aug_variants (auto-default 8 for the train split).
    "zinc": dict(task="regression", metric_mode="min", save_gate=0.4,
                 denorm=2.0109, patience=10, pe_static=(1, 1)),
    "pepfunc": dict(task="multilabel", metric_mode="max", save_gate=0.5,
                    patience=10, pe_static=(9, 3)),
    "tsp": dict(task="edge_binary", metric_mode="max", save_gate=0.75,
                patience=5, pe_static=None),
    "cifar10sp": dict(task="classification", metric_mode="max", save_gate=0.6,
                      patience=5, pe_static=(5, 4)),
    # beyond-reference LRGB node-classification heads (the reference ships
    # these loaders, lib/LRGBDataset.py:26-306, but no models; save gates
    # are ours — macro-F1, no published floor)
    "pascalvoc": dict(task="node_classification", metric_mode="max",
                      save_gate=None, patience=10, pe_static=(14, 2)),
    "coco": dict(task="node_classification", metric_mode="max",
                 save_gate=None, patience=10, pe_static=(14, 2)),
    # beyond-reference PCQM-Contact link prediction (the reference ships
    # the loader's edge_label fields, lib/LRGBDataset.py:81-95, but no
    # model or loop); metric = MRR over (1 pos, 8 neg) query groups
    "pcqm": dict(task="link_prediction", metric_mode="max", save_gate=None,
                 patience=10, pe_static=(6, 4)),
}


def make_model(args):
    from hl_hgat_tpu.models import presets

    channels = (args.c1, args.c2, args.c3)
    filters = (args.filters, args.filters * 2, args.filters * 4)
    mlp = () if args.mlp_channels == 0 else (256,) * args.mlp_channels
    if args.benchmark == "zinc":
        keig = args.keig or min(15, args.filters - 1)
        return presets.zinc_pyr(channels=channels, filters=filters, k=args.K,
                                keig=keig, dropout=args.dropout_ratio,
                                mlp_channels=mlp)
    if args.benchmark == "pepfunc":
        return presets.pepfunc_attpool(
            channels=channels, filters=filters, k=args.K,
            dropout=args.dropout_ratio, mlp_channels=mlp or (256,),
        )
    if args.benchmark == "tsp":
        return presets.tsp_pyr(channels=channels, filters=filters, k=args.K,
                               dropout=args.dropout_ratio,
                               mlp_channels=mlp[:1] or (256,))
    if args.benchmark in ("pascalvoc", "coco"):
        fn = (presets.pascalvoc_node if args.benchmark == "pascalvoc"
              else presets.coco_node)
        return fn(channels=channels, filters=filters, k=args.K,
                  dropout=args.dropout_ratio,
                  mlp_channels=mlp[:1] or (128,))
    if args.benchmark == "pcqm":
        return presets.pcqm_link(channels=channels, filters=filters,
                                 k=args.K, dropout=args.dropout_ratio,
                                 mlp_channels=mlp[:1] or (128,))
    return presets.cifar10sp_attpool(
        channels=channels, filters=filters, k=args.K,
        dropout=args.dropout_ratio, mlp_channels=mlp or (256,),
    )


def resolve_layout(layout: str, samples, node_cap: int,
                   edge_cap: int) -> str:
    """``auto`` → ``packed`` iff every graph (every level) fits one
    superblock, else ``coo``.  The packed dense-superblock layout is the
    measured single-chip recipe (benchmarks/RESULTS.md, ~16× over COO);
    graphs larger than the caps need the banded-spill layout
    (complex/dense.py BlockDiagMatrix, benchmarks/tsp_bench.py) which is
    not yet loader-automatic, so they fall back to COO here."""
    if layout != "auto":
        return layout
    for s in samples:
        for lv in s.levels:
            if lv.num_nodes > node_cap or lv.num_edges > edge_cap:
                return "coo"
    return "packed"


def synthetic_samples(args, seed: int):
    from hl_hgat_tpu.data.synthetic import random_simplex_sample

    rng = np.random.default_rng(seed)
    samples = []
    num_pool = 1 if args.benchmark in ("pepfunc", "cifar10sp") else 0
    if args.benchmark in ("pascalvoc", "coco"):
        # fixed random projection → learnable per-node labels
        n_classes = 21 if args.benchmark == "pascalvoc" else 81
        label_w = np.random.default_rng(7).standard_normal((14, n_classes))
    for _ in range(args.n_synthetic):
        if args.benchmark == "zinc":
            s = random_simplex_sample(rng, n_nodes=int(rng.integers(15, 33)),
                                      node_feat=1, edge_feat=1, keig=16)
            s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
            s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
        elif args.benchmark == "tsp":
            s = random_simplex_sample(rng, n_nodes=int(rng.integers(50, 100)),
                                      node_feat=2, edge_feat=2, keig=0)
            s.x_s[:, -1] = 1.0
            s.y = (rng.random(s.num_edges) > 0.8).astype(np.float32)
        elif args.benchmark in ("pascalvoc", "coco"):
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(30, 80)), node_feat=14,
                edge_feat=2, keig=10,
            )
            s.y = np.argmax(
                s.x_t[:, :14] @ label_w, axis=1
            ).astype(np.float32).reshape(-1, 1)
        elif args.benchmark == "pcqm":
            # link-prediction proxy: adjacency is recoverable from the
            # eig-PE columns (benchmarks/convergence_tasks.py run_link);
            # per-batch query pairs come from the loader (link_queries)
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(14, 30)), node_feat=6,
                edge_feat=4, keig=6,
            )
        else:
            s = random_simplex_sample(
                rng, n_nodes=int(rng.integers(20, 60)), node_feat=9,
                edge_feat=3, keig=10, num_pool=num_pool,
                y_dim=10 if args.benchmark == "pepfunc" else 1,
            )
            if args.benchmark == "pepfunc":
                s.y = (s.y > 0).astype(np.float32)
            else:
                s.y = np.asarray([int(abs(s.y[0]) * 7) % 10], np.float32)
        samples.append(s)
    return samples


def run_brain(args) -> None:
    """The reference's fifth workflow — the OHBM brain training loop
    (HL-HGAT-DEMO/OHBM_DEMO.ipynb cells 36-43) — productized: shared-
    skeleton dense layout (`collate_dense_shared`, the 6.48M-edges/s
    recipe), `BrainLoader` crop augmentation, full Trainer semantics
    (plateau, gated checkpointing, `--resume`, `--dp`, `--ckpt_every`),
    and `BrainPredictor` for `--test`.

    Structure: the REAL Shen-268 skeleton + MLGC_Weight pyramid from the
    reference's shipped group data when present (data/brain.py — level-1
    nodes+edges = 2815 matches the shipped checkpoint); otherwise a
    synthetic skeleton from the subjects' FC via fc2mask (notebook cell
    18).  Series: `--data_root` npz (`timeseries` [N,R,T] + `scores`
    [N]), else learnable synthetic fMRI."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from hl_hgat_tpu.complex.build import build_structure
    from hl_hgat_tpu.complex.coarsen import mlgc
    from hl_hgat_tpu.data import brain as brain_data
    from hl_hgat_tpu.data.brain import BrainLoader
    from hl_hgat_tpu.data.datasets import fc2mask
    from hl_hgat_tpu.data.synthetic import synthetic_fmri_series
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    real_dir_ok = os.path.isdir(brain_data.REFERENCE_BRAIN_DIR)
    if args.data_root:
        path = args.data_root
        if os.path.isdir(path):
            path = os.path.join(path, "brain.npz")
        z = np.load(path)
        ts_all, scores = z["timeseries"], z["scores"]
        rois = ts_all.shape[1]
    else:
        rois = 268 if (args.rois == 0 and real_dir_ok) else (args.rois or 32)
        ts_all, scores = synthetic_fmri_series(
            rng, args.n_synthetic, rois, args.t
        )
    use_real = args.rois == 0 and real_dir_ok and rois == 268
    if use_real:
        levels, pools, _skw = brain_data.build_real_brain_pyramid(
            pool_num=args.pool_num
        )
        print(f"REAL skeleton: {rois} ROIs, {levels[0].num_edges} edges "
              f"(level-1 n+e = "
              f"{levels[1].num_nodes + levels[1].num_edges})")
    else:
        # notebook cell 18: group FC -> fc2mask skeleton; then the
        # MLGC_Weight pyramid (prune single-fine-edge coarse edges, drop
        # isolated nodes) weighted by |mean FC|
        fcs = np.stack([np.corrcoef(ts) for ts in ts_all])
        mask = fc2mask(fcs, percent=0.2, mode=1)
        src, dst = np.nonzero(mask)
        order = np.argsort(src * mask.shape[0] + dst)
        src = src[order].astype(np.int32)
        dst = dst[order].astype(np.int32)
        levels = [build_structure(src, dst, rois)]
        pools = []
        weight = np.abs(fcs.mean(0))[src, dst]
        for _ in range(args.pool_num):
            step = mlgc(
                levels[-1], edge_weight=weight,
                prune_single_fine_edges=True, drop_isolated_nodes=True,
            )
            levels.append(step.structure)
            pools.append((step.c_node, step.c_edge))
            weight = None
        print(f"synthetic skeleton: {rois} ROIs, {levels[0].num_edges} "
              f"edges")

    t_full = ts_all.shape[-1]
    crop = args.crop_len if 0 < args.crop_len < t_full else None
    n_val = max(len(ts_all) // 5, 1)  # notebook: 40 train / 10 test
    folds = [args.fold] if args.fold >= 0 else list(range(args.folds))
    final = levels[args.pool_num]
    if final.num_nodes == 0:
        raise SystemExit(
            "brain pyramid collapsed to 0 nodes (MLGC_Weight pruning on a "
            "too-sparse skeleton) — increase --rois or lower --pool_num"
        )
    for fold in folds:
        print(f"Fold {fold} begin")
        mlp = (64,) * max(args.mlp_channels, 1)
        if args.brain_model == "abcd":
            model, meta = presets.abcd_attpool(
                channels=(args.c1, args.c2, args.c3),
                filters=(args.filters // 2, args.filters, args.filters * 2),
                k=args.K, dropout=args.dropout_ratio, mlp_channels=mlp,
                pool_num=args.pool_num,
                nodes_per_graph=final.num_nodes,
                edges_per_graph=final.num_edges,
            )
        else:
            model, meta = presets.hgat_attpool(
                channels=(args.c1, args.c2, args.c3),
                filters=(args.filters // 2, args.filters, args.filters * 2),
                k=args.K, dropout=args.dropout_ratio, mlp_channels=mlp,
                pool_num=args.pool_num,
                nodes_per_graph=final.num_nodes,
                edges_per_graph=final.num_edges,
                fine_nodes_per_graph=levels[0].num_nodes,
                fine_edges_per_graph=levels[0].num_edges,
            )
        model = _dc.replace(
            model,
            cfg=_dc.replace(
                model.cfg,
                compute_dtype=args.dtype,
                remat={"0": False, "1": True, "msi": "msi",
                       "dots": "dots"}[args.remat],
                stack_concat=args.stack_concat,
            ),
        )
        cfg = TrainerConfig(
            task="brain", lr=args.lr, weight_decay=args.l2,
            plateau_patience=10, metric_mode="max", save_gate=None,
            denorm=meta["y_std"],
            ckpt_dir=os.path.join(args.save_dir, f"brain_fold{fold}"),
            ckpt_every=args.ckpt_every, seed=fold,
            prng_impl=args.prng,
        )
        if args.dp > 1:
            from hl_hgat_tpu.parallel import DataParallelTrainer
            from hl_hgat_tpu.parallel.mesh import make_mesh

            trainer = DataParallelTrainer(model, cfg, make_mesh(data=args.dp))
        else:
            trainer = Trainer(model, cfg)

        perm = np.random.default_rng(fold).permutation(len(ts_all))
        val_idx, train_idx = perm[:n_val], perm[n_val:]
        train_loader = BrainLoader(
            [ts_all[i] for i in train_idx], scores[train_idx],
            levels, pools, args.batch_size, crop_len=crop, shuffle=True,
            seed=fold, y_mean=meta["y_mean"], y_std=meta["y_std"],
        )
        val_loader = BrainLoader(
            [ts_all[i] for i in val_idx], scores[val_idx], levels, pools,
            min(args.batch_size, n_val), crop_len=None, shuffle=False,
            drop_last=False, y_mean=meta["y_mean"], y_std=meta["y_std"],
        )
        if len(train_loader) == 0:
            raise SystemExit(
                f"batch_size {args.batch_size} exceeds the "
                f"{len(train_idx)}-subject train split"
            )
        to_dev = (
            (lambda it: it) if args.dp > 1
            else (lambda it: (jax.tree.map(jnp.asarray, b) for b in it))
        )
        state = trainer.init_state(
            jax.tree.map(jnp.asarray, next(iter(val_loader)))
        )
        if args.test:
            from hl_hgat_tpu.serving import BrainPredictor
            from hl_hgat_tpu.train.metrics import pearson_corr

            state, start = trainer.maybe_restore(state, prefer="best")
            if start == 1:
                raise SystemExit(
                    f"--test: no checkpoint under {cfg.ckpt_dir} — train "
                    f"first (or point --save_dir at the trained weights)"
                )
            predictor = BrainPredictor(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                levels, pools, batch_size=min(args.batch_size, n_val),
            )
            out = predictor([ts_all[i] for i in val_idx])
            yz = (scores[val_idx] - meta["y_mean"]) / meta["y_std"]
            pred = out["pred"].reshape(-1)
            corr = float(np.asarray(pearson_corr(
                jnp.asarray(pred), jnp.asarray(yz))))
            rmse = float(np.sqrt(np.mean((pred - yz) ** 2))) * meta["y_std"]
            print(f"Fold {fold} test corr={corr:.4f} "
                  f"RMSE={rmse:.4f} (epoch {start - 1} best)")
            continue
        state = trainer.fit(
            state,
            lambda: to_dev(train_loader),
            lambda: to_dev(val_loader),
            epochs=args.epochs,
            resume=bool(args.resume),
        )
        print(f"Fold {fold} best metric: {trainer.best_metric:.4f}")


def _apply_swap_dw(args) -> None:
    """Resolve --swap_dw auto per the measured per-family A/B
    (benchmarks/RESULTS.md round 4): the swapped-dW backward wins on the
    molecular packed family (flagship zinc +1.9% at the batch-384 knee;
    pooled attpool neutral) but LOSES ~2% on the banded TSP layout
    (1.605M → 1.572M) and the shared-skeleton brain layout
    (6.754M → 6.604M), whose GEMM shapes differ.  auto = on for bfloat16
    except those two benchmarks; f32 always keeps einsum autodiff for
    bit-comparable grads."""
    from hl_hgat_tpu.nn.gemm import use_swap_dw

    if args.swap_dw == "auto":
        use_swap_dw(args.dtype == "bfloat16"
                    and args.benchmark not in ("brain", "tsp"))
    else:
        use_swap_dw(args.swap_dw == "1")


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    if args.benchmark == "brain":
        apply_brain_defaults(args, argv)  # may re-default --dtype
        _apply_swap_dw(args)
        return run_brain(args)
    _apply_swap_dw(args)
    import jax
    import jax.numpy as jnp

    from hl_hgat_tpu.data.loader import BucketedLoader
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    if args.aug_variants == -1:  # auto: reference-faithful defaults
        args.aug_variants = 8 if args.benchmark == "cifar10sp" else 1
    tsp_aug_prob = (
        args.tsp_aug_prob
        if (args.benchmark == "tsp" and args.tsp_aug_prob > 0
            and args.aug_variants <= 1 and not args.test)
        else None
    )
    settings = BENCH_SETTINGS[args.benchmark]
    folds = [args.fold] if args.fold >= 0 else list(range(args.folds))
    if args.fused:
        from hl_hgat_tpu.nn.conv import use_fused_dense

        use_fused_dense(True)
    for fold in folds:
        print(f"Fold {fold} begin")
        model, meta = make_model(args)
        # apply the perf recipe uniformly (presets expose cfg)
        import dataclasses as _dc

        model = _dc.replace(
            model,
            cfg=_dc.replace(
                model.cfg,
                compute_dtype=args.dtype,
                remat={"0": False, "1": True, "msi": "msi",
                       "dots": "dots"}[args.remat],
                stack_concat=args.stack_concat,
            ),
        )
        cfg = TrainerConfig(
            task=settings["task"],
            lr=args.lr,
            weight_decay=args.l2,
            plateau_patience=settings["patience"],
            save_gate=settings["save_gate"],
            metric_mode=settings["metric_mode"],
            denorm=settings.get("denorm", 1.0),
            early_stop_lr=1e-5 if args.benchmark == "tsp" else None,
            ckpt_dir=os.path.join(
                args.save_dir, f"{args.benchmark}_fold{fold}"
            ),
            ckpt_every=args.ckpt_every,
            seed=fold,
            pe_flip_node_static=(settings["pe_static"] or (None, None))[0],
            pe_flip_edge_static=(settings["pe_static"] or (None, None))[1],
            tsp_aug_prob=tsp_aug_prob,
            prng_impl=args.prng,
        )
        if args.dp > 1:
            from hl_hgat_tpu.parallel import DataParallelTrainer
            from hl_hgat_tpu.parallel.mesh import make_mesh

            trainer = DataParallelTrainer(
                model, cfg, make_mesh(data=args.dp)
            )
        else:
            trainer = Trainer(model, cfg)

        eval_split = "val"
        if args.synthetic or args.data_root is None:
            samples = synthetic_samples(args, seed=fold)
            n_val = max(len(samples) // 10, 1)
            train_s, val_s = samples[n_val:], samples[:n_val]
        else:
            # npz cache / raw public formats (hl_hgat_tpu/data/ingest.py);
            # official train/val splits when the files provide them
            from hl_hgat_tpu.data.ingest import load_samples

            kw = dict(
                root=args.data_root,
                keig=(args.keig or 15) + 1 if args.benchmark == "zinc"
                else (10 if args.benchmark == "cifar10sp" else 100),
                num_pool=1 if args.benchmark in ("pepfunc", "cifar10sp")
                else 0,
                seed=fold,
                aug_variants=args.aug_variants,
                limit=args.limit_samples or None,
            )
            if args.test:
                # evaluate the saved best checkpoint on the test split
                # (reference --test path, main_cifar10SP...py:196-199)
                try:
                    train_s = load_samples(
                        args.benchmark, split="test", **kw
                    )
                    eval_split = "test"
                except FileNotFoundError:
                    train_s = load_samples(args.benchmark, split="val", **kw)
                    eval_split = "val (no test split files found)"
                val_s = train_s
            else:
                from hl_hgat_tpu.data.ingest import effective_aug_variants

                train_s = load_samples(args.benchmark, split="train", **kw)
                a = effective_aug_variants(
                    args.benchmark, "train", args.aug_variants
                )
                try:
                    val_s = load_samples(args.benchmark, split="val", **kw)
                except FileNotFoundError:
                    # hold out 10% of GROUPS; validate on the clean
                    # (variant-0) roll of each held-out graph
                    n_val = max(len(train_s) // a // 10, 1)
                    val_s = train_s[: n_val * a : a]
                    train_s = train_s[n_val * a :]
        y_per_edge = settings["task"] == "edge_binary"
        y_per_node = settings["task"] == "node_classification"
        link_task = settings["task"] == "link_prediction"
        if y_per_node or link_task:
            # packed collators carry neither node labels nor flat-row pair
            # indices (the packer reorders node rows into superblocks)
            layout = "coo"
        else:
            layout = resolve_layout(
                args.layout, list(train_s) + list(val_s),
                args.pack_cap, args.edge_cap or args.pack_cap,
            )
            if args.layout == "auto":
                print(f"--layout auto -> {layout}")
        make_loader = lambda ss, sh, **lkw: BucketedLoader(  # noqa: E731
            ss, batch_size=args.batch_size, shuffle=sh, y_per_edge=y_per_edge,
            y_per_node=y_per_node,
            link_queries=(4, 8) if link_task else None,
            seed=fold,
            layout="dense_packed" if layout == "packed" else "coo",
            node_cap=args.pack_cap,
            edge_cap=args.edge_cap or args.pack_cap,
            transfer=args.transfer,
            # bf16 compute casts features at model entry anyway — ship them
            # pre-cast (bit-identical, half the x_t/x_s transfer bytes)
            feature_dtype=args.dtype,
            **lkw,
        )
        if args.data_root is not None and not args.synthetic and not args.test:
            from hl_hgat_tpu.data.ingest import effective_aug_variants

            train_variants = effective_aug_variants(
                args.benchmark, "train", args.aug_variants
            )
        else:
            train_variants = 1
        train_loader = make_loader(train_s, True, variants=train_variants)
        # DataParallelTrainer stages batches itself (stack+shard); pushing
        # them to the default device first would round-trip every batch
        # host->device->host
        to_dev = (
            (lambda it: it)
            if args.dp > 1
            else (lambda it: (jax.tree.map(jnp.asarray, b) for b in it))
        )
        state = trainer.init_state(
            jax.tree.map(jnp.asarray, next(iter(train_loader)))
        )
        if args.test:
            # exact metrics: no filler duplicates in the final short batch
            val_loader = make_loader(val_s, False, pad_final=False)
            state, start = trainer.maybe_restore(state, prefer="best")
            if start == 1:
                raise SystemExit(
                    f"--test: no checkpoint under {cfg.ckpt_dir} — train "
                    f"first (or point --save_dir at the trained weights)"
                )
            loss, metric = trainer.evaluate(state, to_dev(val_loader))
            print(
                f"Fold {fold} {eval_split} loss={loss:.4f} "
                f"metric={metric:.4f} (epoch {start - 1} best)"
            )
            continue
        val_loader = make_loader(val_s, False)
        state = trainer.fit(
            state,
            lambda: to_dev(train_loader),
            lambda: to_dev(val_loader),
            epochs=args.epochs,
            resume=bool(args.resume),
        )
        print(f"Fold {fold} best metric: {trainer.best_metric:.4f}")


if __name__ == "__main__":
    main()
