"""One-shot jax.profiler trace of a training step on the tunneled TPU.

Writes a trace to /tmp/hlhgat_trace_{which}; if device events arrive through
the tunnel, decode them with benchmarks/xplane/parse_trace.py (the protoc-
compiled xplane schema — TF's own protos are absent here) to get the
op-level time breakdown behind the roofline verdict in RESULTS.md.

    python benchmarks/profile_probe.py [flagship|tsp|brain] [scan_steps]

Falls back gracefully if the backend doesn't support remote tracing.
"""

from __future__ import annotations

import dataclasses as _dc
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def make_step(which: str, scan_steps: int):
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    if which == "flagship":
        # the committed driver recipe: batch 384 + swap-dW (bench.py);
        # override via BENCH_BATCH_GRAPHS / HLHGAT_SWAP_DW
        from hl_hgat_tpu.nn.gemm import use_swap_dw

        use_swap_dw(os.environ.get("HLHGAT_SWAP_DW", "1") == "1")
        nb = os.environ.get("BENCH_BATCH_GRAPHS", "384")
        cache = f"/tmp/hlhgat_bench_packed_{nb}.pkl"
        with open(cache, "rb") as fh:
            batch = pickle.load(fh)
        model, _ = presets.zinc_pyr(compute_dtype="bfloat16", remat=False)
        model = _dc.replace(
            model, cfg=_dc.replace(model.cfg, stack_concat="block")
        )
        tr = Trainer(model, TrainerConfig(task="regression", lr=1e-3,
                                          weight_decay=1e-3))
    elif which == "attpool":
        # the pooled family at the benched recipe (attpool_bench.py; the
        # round-5 knee is batch 64 — override via BENCH_BATCH_GRAPHS)
        nb = os.environ.get("BENCH_BATCH_GRAPHS", "64")
        with open(f"/tmp/hlhgat_attpool_{nb}.pkl", "rb") as fh:
            batch = pickle.load(fh)
        model, _ = presets.cifar10sp_attpool(mlp_channels=(256,))
        model = _dc.replace(
            model, cfg=_dc.replace(model.cfg, compute_dtype="bfloat16")
        )
        tr = Trainer(model, TrainerConfig(
            task="classification", lr=1e-3,
            prng_impl=os.environ.get("BENCH_PRNG", "threefry2x32"),
        ))
    elif which == "tsp":
        with open("/tmp/hlhgat_tsp_samples_64.pkl", "rb") as fh:
            samples = pickle.load(fh)
        from hl_hgat_tpu.complex.dense import collate_dense_packed

        batch = collate_dense_packed(
            samples, node_cap=128, edge_cap=512, y_per_edge=True
        )
        model, _ = presets.tsp_pyr(
            channels=(2, 2, 2), filters=(64, 128, 256), k=2, dropout=0.0,
            mlp_channels=(256,),
        )
        model = _dc.replace(
            model, cfg=_dc.replace(model.cfg, compute_dtype="bfloat16")
        )
        tr = Trainer(model, TrainerConfig(task="edge_binary", lr=1e-3))
    elif which == "brain":
        # the shared-skeleton brain step (benchmarks/brain_bench.py recipe)
        from hl_hgat_tpu.complex.dense import collate_dense_shared
        from hl_hgat_tpu.data.brain import build_real_brain_pyramid
        from hl_hgat_tpu.data.datasets import brain_sample

        levels, pools, _w = build_real_brain_pyramid(pool_num=2)
        rng = np.random.default_rng(0)
        samples = [
            brain_sample(rng.standard_normal((levels[0].num_nodes, 128)),
                         levels[0].src, levels[0].dst, levels, pools,
                         y=95.1377 + 7.3 * rng.standard_normal())
            for _ in range(16)
        ]
        batch = collate_dense_shared(samples, multiple=1)
        final = levels[2]
        model, _ = presets.hgat_attpool(
            pool_num=2, mlp_channels=(64,),
            nodes_per_graph=final.num_nodes,
            edges_per_graph=final.src.shape[0],
            fine_nodes_per_graph=levels[0].num_nodes,
            fine_edges_per_graph=levels[0].src.shape[0],
        )
        model = _dc.replace(
            model, cfg=_dc.replace(model.cfg, compute_dtype="bfloat16")
        )
        # the hgat model returns a tuple; wrap a bare MSE step
        import optax

        from hl_hgat_tpu.train.optim import adam_l2

        variables = model.init({"params": jax.random.key(0)},
                               jax.tree.map(jnp.asarray, batch),
                               deterministic=True)
        params, bstats = variables["params"], variables.get(
            "batch_stats", {})
        tx = adam_l2(1e-3)
        opt_state = tx.init(params)
        batch = jax.tree.map(jnp.asarray, batch)

        def multi_step(carry, batch):
            def body(c, _):
                params, bstats, opt_state = c

                def loss_fn(p):
                    (pred, *_), mut = model.apply(
                        {"params": p, "batch_stats": bstats}, batch,
                        deterministic=False, mutable=["batch_stats"],
                    )
                    return jnp.mean(
                        (pred.reshape(-1) - batch.y.reshape(-1)) ** 2), mut

                (loss, mut), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, mut["batch_stats"], opt_state), loss

            return jax.lax.scan(body, carry, None, length=scan_steps)

        return (jax.jit(multi_step, donate_argnums=(0,)),
                (params, bstats, opt_state), batch)
    else:
        raise SystemExit(f"unknown target {which}")
    batch = jax.tree.map(jnp.asarray, batch)
    state = tr.init_state(batch)

    def multi_step(state, batch):
        def body(s, _):
            s, loss = tr._train_step_impl(s, batch)
            return s, loss

        return jax.lax.scan(body, state, None, length=scan_steps)

    # donate like bench.py so the persistent-cache entry is shared with it
    # (donation participates in the compile-cache key)
    # name matters: the persistent-cache key includes the jitted
    # function name, and bench.py compiles the same graph as 'multi_step'
    return jax.jit(multi_step, donate_argnums=(0,)), state, batch


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    multi, state, batch = make_step(which, scan_steps)
    state, losses = multi(state, batch)
    np.asarray(losses)  # warm + barrier

    logdir = f"/tmp/hlhgat_trace_{which}"
    try:
        jax.profiler.start_trace(logdir)
        state, losses = multi(state, batch)
        np.asarray(losses)
        jax.profiler.stop_trace()
    except Exception as e:
        print("tracing failed:", e)
        return
    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    for f in files:
        print(f, os.path.getsize(f), "bytes")
    if not files:
        print("no trace files produced")


if __name__ == "__main__":
    main()
