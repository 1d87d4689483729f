"""Brain fMRI pipeline demo — the OHBM notebook flow, end to end.

Replicates HL-HGAT-DEMO/OHBM_DEMO.ipynb (init → train → analyze).  By
default (``--real auto``) it uses the REFERENCE'S REAL GROUP DATA when
present: the shipped ``Group_FC.mat``/``Group_FCMask.mat`` build the real
Shen-268 skeleton and MLGC_Weight pyramid (notebook cell 46 — level-1
nodes+edges lands on the pretrained checkpoint's 2815), and
``affiliations.mat`` provides the real lobe ordering for the attention
matrix.  Only the per-subject fMRI series are synthetic (``DEMO_DATA.mat``
is LFS-missing); pass ``--data`` to supply real series.

1. **init**: group FC → skeleton (``fc2mask`` when synthetic; the shipped
   study mask when real) → shared simplex complex → ``MLGC_Weight``
   coarsening (single-fine-edge pruning + isolated-node dropping);
2. **train**: ``HLHGATAttpool`` (Inception1D time embedding, FastConv-style
   trunk, attention pooling, flatten readout) on z-scored IQ targets with
   MSE; reports Pearson r + RMSE;
3. **analyze**: subject-averaged edge-attention → symmetric ROI×ROI matrix,
   lobe-sorted exactly like ``plt_sort_anatomy`` (real affiliations when
   available).

    python examples/brain_demo.py [--epochs 5]            # real structure
    python examples/brain_demo.py --real off --rois 32    # fully synthetic
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=24)
    ap.add_argument("--rois", type=int, default=32)
    ap.add_argument("--t", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--mask_percent", type=float, default=0.2)
    ap.add_argument("--data", default=None, help="npz with timeseries/scores")
    ap.add_argument(
        "--real", default="auto", choices=["auto", "on", "off"],
        help="use the reference's real Group_FC/FCMask/affiliations "
             "(auto: when the reference data dir exists)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hl_hgat_tpu.complex.build import build_structure, collate
    from hl_hgat_tpu.complex.coarsen import mlgc
    from hl_hgat_tpu.complex.dense import collate_dense_shared
    from hl_hgat_tpu.data import brain as brain_data
    from hl_hgat_tpu.data.datasets import brain_sample, fc2mask
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig
    from hl_hgat_tpu.train.metrics import pearson_corr
    from hl_hgat_tpu.utils import attention_fc_matrix, sort_by_parcels

    use_real = args.real == "on" or (
        args.real == "auto" and os.path.isdir(brain_data.REFERENCE_BRAIN_DIR)
        and args.data is None
    )
    rng = np.random.default_rng(0)
    if use_real:
        # REAL group inputs: skeleton + pyramid exactly as notebook cell 46
        levels, pools, _skw = brain_data.build_real_brain_pyramid(pool_num=2)
        src, dst = levels[0].src, levels[0].dst
        args.rois = levels[0].num_nodes
        print(f"REAL skeleton: {args.rois} ROIs, {src.size} edges "
              f"(level-1 n+e = {levels[1].num_nodes + levels[1].num_edges})")
    if args.data:
        z = np.load(args.data)
        ts_all, scores = z["timeseries"], z["scores"]
    else:
        # synthetic fMRI: latent network signal + noise, IQ correlated with
        # the strength of one latent component
        k = 4
        mixing = rng.standard_normal((args.rois, k))
        ts_all = np.empty((args.subjects, args.rois, args.t))
        scores = np.empty(args.subjects)
        for s in range(args.subjects):
            strength = rng.uniform(0.5, 2.0)
            lat = rng.standard_normal((k, args.t))
            lat[0] *= strength
            ts_all[s] = mixing @ lat + 0.5 * rng.standard_normal(
                (args.rois, args.t)
            )
            scores[s] = 95.1377 + 7.3 * (strength - 1.25)

    # ---- init: group skeleton + shared pyramid -----------------------------
    if not use_real:
        fcs = np.stack([np.corrcoef(ts) for ts in ts_all])
        mask = fc2mask(fcs, percent=args.mask_percent, mode=1)
        src, dst = np.nonzero(mask)
        order = np.argsort(src * mask.shape[0] + dst)
        src, dst = src[order].astype(np.int32), dst[order].astype(np.int32)
        print(f"skeleton: {args.rois} ROIs, {src.size} edges")

        levels = [build_structure(src, dst, args.rois)]
        pools = []
        mean_fc_w = np.abs(fcs.mean(0))[src, dst]
        weight = mean_fc_w
        for lvl in range(2):
            step = mlgc(
                levels[-1], edge_weight=weight,
                prune_single_fine_edges=True, drop_isolated_nodes=True,
            )
            levels.append(step.structure)
            pools.append((step.c_node, step.c_edge))
            weight = None
            print(
                f"  pool {lvl}: {step.structure.num_nodes} nodes / "
                f"{step.structure.num_edges} edges"
            )

    samples = [
        brain_sample(ts_all[s], src, dst, levels, pools, y=scores[s], rng=rng)
        for s in range(args.subjects)
    ]
    n_val = max(args.subjects // 4, 1)
    train_s, val_s = samples[n_val:], samples[:n_val]

    # shared-skeleton dense layout: one broadcast operator per level →
    # single-GEMM mat-vecs over all subjects (259× over flat COO on TPU,
    # benchmarks/RESULTS.md round 3)
    collate_fn = lambda ss, multiple=1: collate_dense_shared(  # noqa: E731
        ss, multiple=multiple)
    batch0 = collate_fn(train_s[: args.batch_size])
    final = levels[-1]
    n0, e0 = levels[0].num_nodes, levels[0].num_edges

    model, meta = presets.hgat_attpool(
        channels=(1, 1, 1), filters=(16, 16, 32), k=3, pool_num=2,
        mlp_channels=(32,),
        nodes_per_graph=final.num_nodes, edges_per_graph=final.num_edges,
        fine_nodes_per_graph=n0, fine_edges_per_graph=e0,
    )

    # ---- train -------------------------------------------------------------
    import optax

    dev = lambda b: jax.tree.map(jnp.asarray, b)  # noqa: E731
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        dev(batch0), deterministic=True,
    )
    params, bstats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def batches(split):
        # clamp to the split size so small splits (e.g. the validation
        # quarter at the default --subjects) still yield one batch
        bs = min(args.batch_size, len(split))
        for i in range(0, len(split) - bs + 1, bs):
            yield dev(collate_fn(split[i : i + bs]))

    @jax.jit
    def train_step(params, bstats, opt_state, batch, key):
        def loss_fn(p):
            (pred, *_), mut = model.apply(
                {"params": p, "batch_stats": bstats}, batch,
                deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            return jnp.mean((pred.reshape(-1) - batch.y.reshape(-1)) ** 2), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates),
            mut["batch_stats"], opt_state, loss,
        )

    key = jax.random.key(2)
    for epoch in range(args.epochs):
        losses = []
        for batch in batches(train_s):
            key, sk = jax.random.split(key)
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, batch, sk
            )
            losses.append(float(loss))
        print(f"epoch {epoch}: train MSE {np.mean(losses):.4f}")

    # ---- evaluate ----------------------------------------------------------
    @jax.jit
    def infer(batch):
        return model.apply(
            {"params": params, "batch_stats": bstats}, batch,
            deterministic=True,
        )

    preds, ys, edge_atts = [], [], []
    for batch in batches(val_s):
        pred, latent, node_att, edge_att = infer(batch)
        preds.append(np.asarray(pred).reshape(-1))
        ys.append(np.asarray(batch.y).reshape(-1))
        edge_atts.append(np.asarray(edge_att))
    pred = np.concatenate(preds)
    y = np.concatenate(ys)
    corr = float(pearson_corr(jnp.asarray(pred), jnp.asarray(y)))
    rmse = float(np.sqrt(np.mean((pred - y) ** 2))) * meta["y_std"]
    print(f"validation: corr {corr:.3f}, RMSE {rmse:.3f} (raw score units)")

    # ---- analyze: anatomically sorted attention ----------------------------
    mean_att = np.concatenate(edge_atts).mean(0)
    fc_att = attention_fc_matrix(mean_att, src, dst, args.rois)
    if use_real:
        aff = brain_data.load_affiliations()
        out = brain_data.lobe_sorted_matrix(
            fc_att, aff["affiliation"], aff["lobe_names"])
        print(
            f"attention FC matrix {fc_att.shape}, lobe-sorted with the real "
            f"affiliations; blocks: "
            + ", ".join(f"{n}={s}" for n, s in
                        zip(out["labels"][:4], out["sizes"][:4])) + ", ...; "
            f"top-attention edge: "
            f"{np.unravel_index(np.argmax(fc_att), fc_att.shape)}"
        )
    else:
        parcels = rng.integers(0, 4, args.rois)  # synthetic lobe labels
        sorted_m, perm, bounds = sort_by_parcels(fc_att, parcels)
        print(
            f"attention FC matrix {fc_att.shape}, parcel boundaries at "
            f"{bounds.tolist()}; top-attention edge: "
            f"{np.unravel_index(np.argmax(fc_att), fc_att.shape)}"
        )


if __name__ == "__main__":
    main()
