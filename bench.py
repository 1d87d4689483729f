"""Benchmark: edges/s/chip on the flagship ZINC training step (fwd+bwd+opt).

Prints ONE JSON line:
  {"metric": "edges_per_sec", "value": N, "unit": "edges/s", "vs_baseline": R}

Metric definition (BASELINE.md): throughput of real (unpadded) 1-simplices
through the full training step — forward (2 MSI boundary products + 2(K−1)
Laplacian SpMMs + 6 GEMMs per layer, reference cost model
lib/Hodge_Cheb_Conv.py:100-101,494-507), backward, Adam update.

``vs_baseline`` divides by an engineering estimate of the A100 PyTorch/PyG
reference's end-to-end training throughput for the same model family
(~1.0e6 edges/s fwd+bwd at these widths — scatter-bound; the reference
publishes no number, BASELINE.md).  The north-star target is vs_baseline ≥ 2.

Run on the single real TPU chip.  The tunnel adds ~30 ms per dispatch, so the
timed region is a lax.scan of many steps inside one jit call.  A persistent
compilation cache keeps repeat runs fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

# A100 PyG reference estimate (edges/s, fwd+bwd, ZINC widths) — see module
# docstring.  No published number exists; this constant is the comparison
# denominator recorded alongside the measurement.
BASELINE_EDGES_PER_SEC = 1.0e6

STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS", "200"))
TIMED_CALLS = 3
# Measured single-chip optimum (host-readback barrier): packed superblocks
# (first-fit-decreasing packer, round 4), batch 384, bf16, NO remat,
# merged-GEMM MSI + block-granular stacks + MXU one-hot readout →
# 2.16M real edges/s.  Per-edge throughput peaks at the batch where XLA's
# auto-spill pass starts firing; the FFD packer moved the knee from 320 to
# 384 (320 → 2.146M, 384 → 2.160M, 448 → 2.150M).  Full frontier +
# methodology note in benchmarks/RESULTS.md.  Override batch / dtype /
# remat / K / filters / stack granularity via env.
BATCH_GRAPHS = int(os.environ.get("BENCH_BATCH_GRAPHS", "384"))


def main() -> None:
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from hl_hgat_tpu.complex.dense import collate_dense, collate_dense_packed
    from hl_hgat_tpu.data import synthetic_zinc_batch
    from hl_hgat_tpu.data.synthetic import random_simplex_sample
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    # 'packed' packs ~4-5 graphs per 128-row dense superblock (block-diagonal
    # operators — one MXU tile pass per Laplacian mat-vec instead of one per
    # graph); 'dense' is one graph per [G, S, *] block; 'coo' is the
    # gather/segment-sum path.
    mode = sys.argv[1] if len(sys.argv) > 1 else "packed"

    # Measured regime (benchmarks/RESULTS.md): the XLA path with NO remat
    # wins at knee-scale batches — with terms resident the XLA backward
    # (reads saved terms) beats the fused kernel's recompute backward.  The
    # fused kernel + msi-remat is the recipe only when a huge batch forces
    # remat: HLHGAT_FUSED_DENSE=1 BENCH_REMAT=msi.
    if mode in ("dense", "packed") and os.environ.get(
        "HLHGAT_FUSED_DENSE", "0"
    ) == "1":
        from hl_hgat_tpu.nn.conv import use_fused_dense

        use_fused_dense(True)

    # ablation knobs (cost decomposition; flagship defaults)
    filters = tuple(
        int(x) for x in os.environ.get("BENCH_FILTERS", "64,128,256").split(",")
    )
    model, meta = presets.zinc_pyr(
        channels=(2, 3, 3), filters=filters,
        k=int(os.environ.get("BENCH_K", "6")), keig=15,
        mlp_channels=(256, 256),
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        remat={"0": False, "1": True, "msi": "msi", "dots": "dots"}[
            os.environ.get("BENCH_REMAT", "0")
        ],
    )
    # Swapped-dW stack-GEMM backward: part of the measured bf16 recipe
    # (benchmarks/RESULTS.md round 4: 2.160M -> 2.200M at the batch-384
    # knee; convergence within the seed band on 2 draws).  f32 runs keep
    # einsum autodiff.  HLHGAT_SWAP_DW=0/1 overrides.
    from hl_hgat_tpu.nn.gemm import use_swap_dw

    use_swap_dw(os.environ.get(
        "HLHGAT_SWAP_DW",
        "1" if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16"
        else "0",
    ) == "1")
    if os.environ.get("BENCH_HEAD_DTYPE"):
        # mixed-precision readout+MLP head (BackboneConfig.head_dtype)
        import dataclasses as _dc0

        model = _dc0.replace(
            model, cfg=_dc0.replace(
                model.cfg, head_dtype=os.environ["BENCH_HEAD_DTYPE"]
            ),
        )
    # stack materialization granularity (models/backbone.py stack_concat):
    # 'layer' = reference formulation, 'block' = concat at width changes,
    # 'never' = pure piece tuples
    import dataclasses as _dc

    model = _dc.replace(
        model,
        cfg=_dc.replace(
            model.cfg, stack_concat=os.environ.get("BENCH_STACK", "block")
        ),
    )
    if mode in ("dense", "packed"):
        # the throttled host takes minutes to collate 12k+ graphs; cache the
        # deterministic (seed 0) batch on disk across runs
        import pickle

        cache = f"/tmp/hlhgat_bench_{mode}_{BATCH_GRAPHS}.pkl"
        if os.path.exists(cache):
            with open(cache, "rb") as fh:
                batch = pickle.load(fh)
        else:
            rng = np.random.default_rng(0)
            samples = []
            for _ in range(BATCH_GRAPHS):
                n = int(rng.integers(15, 33))
                s = random_simplex_sample(
                    rng, n_nodes=n, extra_edges=int(rng.integers(2, 6)),
                    node_feat=1, edge_feat=1, keig=16,
                )
                s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
                s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
                samples.append(s)
            if mode == "packed":
                batch = collate_dense_packed(
                    samples, node_cap=128, edge_cap=128
                )
            else:
                batch = collate_dense(samples, multiple=8)
            with open(cache, "wb") as fh:
                pickle.dump(batch, fh)
        real_edges = int(np.asarray(batch.levels[0].edge_mask).sum())
    else:
        batch = synthetic_zinc_batch(
            BATCH_GRAPHS, seed=0, keig=16, embed_ids=True,
            with_ell=os.environ.get("BENCH_ELL", "1") == "1",
        )
        real_edges = int(np.asarray(batch.levels[0].edge_mask).sum())
    batch = jax.tree.map(jnp.asarray, batch)

    trainer = Trainer(
        model, TrainerConfig(task="regression", lr=1e-3, weight_decay=1e-3)
    )
    state = trainer.init_state(batch)

    inner = trainer._train_step_impl

    # BENCH_SCAN_UNROLL=k unrolls the step loop k-fold — probing whether the
    # small-vector carry copies at the scan boundary (f32[128]/[256]
    # param/stat writebacks, ~5-9 us each in the round-5 trace) amortize.
    unroll = int(os.environ.get("BENCH_SCAN_UNROLL", "1"))

    def multi_step(state, batch):
        def body(s, _):
            s, loss = inner(s, batch)
            return s, loss

        return jax.lax.scan(
            body, state, None, length=STEPS_PER_CALL, unroll=unroll
        )

    # Optional remote-compiler options (client-side XLA_FLAGS cannot carry
    # TPU flags through the tunneled backend, but per-jit compiler_options
    # ride the PJRT compile request), e.g.
    #   BENCH_XLA_OPT="xla_tpu_scoped_vmem_limit_kib=65536"
    opts = None
    if os.environ.get("BENCH_XLA_OPT"):
        opts = dict(
            kv.split("=", 1) for kv in os.environ["BENCH_XLA_OPT"].split(",")
        )
    multi_step = jax.jit(
        multi_step, donate_argnums=(0,), compiler_options=opts
    )

    # Synchronization: on the tunneled TPU backend `jax.block_until_ready`
    # returns before execution finishes (measured: a 10-step scan "blocks"
    # in 0.1 ms while the following host readback waits 437 ms —
    # benchmarks/sync_probe.py).  A host transfer is the only reliable
    # barrier, so every timed call reads the loss back.
    def sync(x):
        return float(np.asarray(x)[-1])

    # warmup / compile
    t0 = time.time()
    state, losses = multi_step(state, batch)
    sync(losses)
    compile_s = time.time() - t0

    times = []
    for _ in range(TIMED_CALLS):
        t0 = time.time()
        state, losses = multi_step(state, batch)
        sync(losses)
        times.append(time.time() - t0)

    best = min(times)
    steps_per_sec = STEPS_PER_CALL / best
    edges_per_sec = real_edges * steps_per_sec
    result = {
        "metric": "edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / BASELINE_EDGES_PER_SEC, 3),
    }
    print(json.dumps(result), flush=True)
    print(
        json.dumps(
            dict(
                detail=dict(
                    mode=mode,
                    backend=jax.default_backend(),
                    batch_graphs=BATCH_GRAPHS,
                    real_edges_per_batch=real_edges,
                    steps_per_sec=round(steps_per_sec, 2),
                    compile_s=round(compile_s, 1),
                    call_times_s=[round(t, 3) for t in times],
                    final_loss=float(np.asarray(losses)[-1]),
                )
            )
        )
    )


if __name__ == "__main__":
    main()
