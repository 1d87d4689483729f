"""Brain-workload throughput: HL_HGAT_attpool training step on the REAL
Shen-268 structure (one chip).

The reference's brain workload (HL-HGAT-DEMO/OHBM_DEMO.ipynb) trains
``HL_HGAT_attpool`` on batches of subjects sharing ONE skeleton: 268 ROIs /
8997 FC edges, coarsened twice by ``MLGC_Weight``.  This bench builds that
exact real structure (``hl_hgat_tpu.data.brain`` — the pyramid whose
level-1 nodes+edges equals the shipped checkpoint's 2815) with synthetic
per-subject series, and measures the full training step (Inception1D
embedding, dense-int3 trunk, attention pooling, flatten head, MSE, Adam).

Layouts: ``shared`` (default, round 3) uses ``collate_dense_shared`` — ONE
dense operator per level broadcast over all subjects, so every L/B1
mat-vec is a single [S, S] @ [S, G·C] MXU GEMM (the FC-dense L1 has no
block locality, so both COO and banded-spill layouts are scatter-bound on
this workload — measured 22.9k edges/s COO at batch 8); ``coo`` keeps the
flat path for comparison.

    python benchmarks/brain_bench.py [batch_subjects] [--t 128] [--pool_num 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(os.environ.get("BENCH_STEPS", "10"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch_subjects", nargs="?", type=int, default=16)
    ap.add_argument("--t", type=int, default=128)
    ap.add_argument("--pool_num", type=int, default=2)
    ap.add_argument("--model", default="hgat", choices=["hgat", "abcd"],
                    help="hgat = the DEMO HL_HGAT_attpool (OHBM workload); "
                         "abcd = the lib ABCD model (HLHGCNNAbcd, pool_loc "
                         "LIST — reference lib/Hodge_ST_Model.py:26-168) at "
                         "the same real skeleton/scale (VERDICT r4 item 4)")
    ap.add_argument("--layout", choices=["shared", "coo"], default="shared")
    ap.add_argument("--infer", action="store_true",
                    help="forward-only (serving) throughput instead of the "
                         "training step")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    import dataclasses

    import optax

    from hl_hgat_tpu.complex.build import collate
    from hl_hgat_tpu.complex.dense import collate_dense_shared
    from hl_hgat_tpu.data.brain import build_real_brain_pyramid
    from hl_hgat_tpu.data.datasets import brain_sample
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train.optim import adam_l2

    t0 = time.time()
    levels, pools, _w = build_real_brain_pyramid(pool_num=args.pool_num)
    src, dst = levels[0].src, levels[0].dst
    rng = np.random.default_rng(0)
    samples = [
        brain_sample(
            rng.standard_normal((levels[0].num_nodes, args.t)),
            src, dst, levels, pools,
            y=95.1377 + 7.3 * rng.standard_normal(),
        )
        for _ in range(args.batch_subjects)
    ]
    collate_fn = (
        collate_dense_shared if args.layout == "shared" else collate
    )
    batch = jax.tree.map(jnp.asarray, collate_fn(samples, multiple=1))
    build_s = time.time() - t0
    real_edges = args.batch_subjects * src.shape[0]

    final = levels[args.pool_num]
    if args.model == "abcd":
        model, meta = presets.abcd_attpool(
            pool_num=args.pool_num, k=4, filters=(32, 64, 128),
            mlp_channels=(64,),
            nodes_per_graph=final.num_nodes,
            edges_per_graph=final.src.shape[0],
        )
    else:
        model, meta = presets.hgat_attpool(
            pool_num=args.pool_num,
            mlp_channels=(64,),
            nodes_per_graph=final.num_nodes,
            edges_per_graph=final.src.shape[0],
            fine_nodes_per_graph=levels[0].num_nodes,
            fine_edges_per_graph=src.shape[0],
        )
    model = dataclasses.replace(
        model, cfg=dataclasses.replace(model.cfg, compute_dtype=args.dtype),
    )
    variables = model.init(
        {"params": jax.random.key(0)}, batch, deterministic=True)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    tx = adam_l2(1e-3)
    opt_state = tx.init(params)

    if args.infer:
        # forward-only scan; feed the prediction back into a dummy carry so
        # XLA cannot hoist the body (the scan-hoisting trap, RESULTS.md)
        @jax.jit
        def multi_infer(params, bstats, batch, seed_row):
            def step(carry, _):
                b2 = batch.replace(
                    x_t=batch.x_t.at[0, 0, 0].add(carry * 0.0))
                out = model.apply(
                    {"params": params, "batch_stats": bstats}, b2,
                    deterministic=True)
                pred = out[0] if isinstance(out, tuple) else out
                return pred.reshape(-1)[0], pred.reshape(-1)[0]

            _, outs = jax.lax.scan(step, seed_row, None, length=STEPS)
            return outs

        def sync(x):
            return float(np.asarray(x)[-1])

        seed_row = jnp.zeros((), jnp.float32)
        t0 = time.time()
        outs = multi_infer(params, bstats, batch, seed_row)
        sync(outs)
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            outs = multi_infer(params, bstats, batch, seed_row)
            sync(outs)
            times.append(time.time() - t0)
        sps = STEPS / min(times)
        print(json.dumps(dict(
            metric="brain_infer_edges_per_sec",
            value=round(real_edges * sps, 1), unit="edges/s",
            batch_subjects=args.batch_subjects, t=args.t,
            model=args.model, layout=args.layout, subjects_per_sec=round(
                args.batch_subjects * sps, 2),
            steps_per_sec=round(sps, 3), compile_s=round(compile_s, 1),
            backend=jax.default_backend(),
        )), flush=True)
        return

    @jax.jit
    def multi(params, bstats, opt_state, batch):
        def step(carry, _):
            params, bstats, opt_state = carry

            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bstats}, batch,
                    deterministic=False, mutable=["batch_stats"],
                )
                pred = out[0] if isinstance(out, tuple) else out
                return (
                    jnp.mean((pred.reshape(-1) - batch.y.reshape(-1)) ** 2),
                    mut,
                )

            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, mut["batch_stats"], opt_state), loss

        (params, bstats, opt_state), losses = jax.lax.scan(
            step, (params, bstats, opt_state), None, length=STEPS)
        return params, bstats, opt_state, losses

    def sync(x):
        return float(np.asarray(x)[-1])

    t0 = time.time()
    params, bstats, opt_state, losses = multi(params, bstats, opt_state, batch)
    sync(losses)
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        params, bstats, opt_state, losses = multi(
            params, bstats, opt_state, batch)
        sync(losses)
        times.append(time.time() - t0)
    sps = STEPS / min(times)
    print(json.dumps(dict(
        metric="brain_edges_per_sec", value=round(real_edges * sps, 1),
        unit="edges/s", batch_subjects=args.batch_subjects, t=args.t,
        rois=levels[0].num_nodes, skeleton_edges=int(src.shape[0]),
        pool_num=args.pool_num, model=args.model, layout=args.layout,
        real_edges=real_edges,
        steps_per_sec=round(sps, 3), subjects_per_sec=round(
            args.batch_subjects * sps, 2),
        compile_s=round(compile_s, 1), build_s=round(build_s, 1),
        final_loss=sync(losses), backend=jax.default_backend(),
    )), flush=True)


if __name__ == "__main__":
    main()
