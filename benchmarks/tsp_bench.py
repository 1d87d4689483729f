"""Large-graph throughput: TSP-shaped training step on one chip.

The reference TSP workload runs 50–500-node KNN graphs with dense edge sets
(reference lib/Hodge_Dataset.py:670-745, main_TSP_HL_HGCNN_dense_int3_pyr.py)
— far past the 128-row dense pack caps.  Round 1 dropped these to the flat
COO path at ~110k edges/s (16× off the flagship).  This bench measures the
round-2 fast path: graphs spanning several dense blocks with COO spill
corrections (complex/dense.py BlockDiagMatrix), after a BFS locality
reorder.

    python benchmarks/tsp_bench.py [batch_graphs] [--layout packed|coo]
                                   [--node-cap N] [--edge-cap N]

Synthetic instance generator mirrors the reference's: uniform random 2-D
points, k=10 nearest-neighbour graph, node count uniform in [50, 500]
(PyG GNNBenchmarkDataset TSP construction).  Features are random at the
reference dims (x_t: 2 coords, x_s: 1 weight + aug-mask column) — this is
a throughput bench; accuracy runs live in run.py.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(os.environ.get("BENCH_STEPS", "10"))


def knn_graph(rng: np.random.Generator, n: int, k: int = 10) -> np.ndarray:
    """Canonical undirected KNN edge list of n uniform points (TSP style)."""
    pos = rng.random((n, 2)).astype(np.float32)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argpartition(d2, k, axis=1)[:, :k]
    src = np.repeat(np.arange(n), k)
    dst = nbr.reshape(-1)
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    key = lo.astype(np.int64) * n + hi
    uniq = np.unique(key)
    return np.stack([uniq // n, uniq % n]).astype(np.int64), pos


def build_samples(batch_graphs: int, seed: int = 0):
    from hl_hgat_tpu.complex.build import build_complex
    from hl_hgat_tpu.complex.dense import reorder_sample

    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(batch_graphs):
        n = int(rng.integers(50, 501))
        ei, pos = knn_graph(rng, n)
        e = ei.shape[1]
        x_s = np.concatenate(
            [rng.standard_normal((e, 1), np.float32().dtype).astype(np.float32),
             np.ones((e, 1), np.float32)], axis=1,
        )
        y = (rng.random(e) > 0.85).astype(np.float32)
        s = build_complex(ei, n, x_t=pos, x_s=x_s, y=y)
        s.y = y
        samples.append(reorder_sample(s, y_per_edge=True))
    return samples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch_graphs", nargs="?", type=int, default=64)
    ap.add_argument("--layout", choices=["packed", "coo"], default="packed")
    ap.add_argument("--node-cap", type=int, default=128)
    ap.add_argument("--edge-cap", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import dataclasses

    from hl_hgat_tpu.complex.build import collate
    from hl_hgat_tpu.complex.dense import collate_dense_packed
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    cache = f"/tmp/hlhgat_tsp_samples_{args.batch_graphs}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            samples = pickle.load(fh)
    else:
        t0 = time.time()
        samples = build_samples(args.batch_graphs)
        print(f"built {len(samples)} samples in {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        with open(cache, "wb") as fh:
            pickle.dump(samples, fh)

    t0 = time.time()
    if args.layout == "packed":
        batch = collate_dense_packed(
            samples, node_cap=args.node_cap, edge_cap=args.edge_cap,
            y_per_edge=True,
        )
        lvl = batch.levels[0]
        spill_info = dict(
            blocks=int(lvl.node_mask.shape[0]),
            spill0=0 if not hasattr(lvl.l0, "spill") or lvl.l0.spill is None
            else int(lvl.l0.spill.nnz),
            spill1=0 if not hasattr(lvl.l1, "spill") or lvl.l1.spill is None
            else int(lvl.l1.spill.nnz),
            spillb=0 if lvl.b1_sp is None else int(lvl.b1_sp.nnz),
        )
        real_edges = int(np.asarray(lvl.edge_mask).sum())
    else:
        batch = collate(samples, y_per_edge=True)
        lvl = batch.levels[0]
        spill_info = {}
        real_edges = int(np.asarray(lvl.edge_mask).sum())
    collate_s = time.time() - t0
    batch = jax.tree.map(jnp.asarray, batch)

    model, meta = presets.tsp_pyr(
        channels=(2, 2, 2), filters=(64, 128, 256), k=2, dropout=0.0,
        mlp_channels=(256,),
    )
    model = dataclasses.replace(
        model, cfg=dataclasses.replace(model.cfg, compute_dtype=args.dtype),
    )
    trainer = Trainer(model, TrainerConfig(task="edge_binary", lr=1e-3))
    state = trainer.init_state(batch)
    inner = trainer._train_step_impl

    @jax.jit
    def multi(state, batch):
        def body(s, _):
            s, loss = inner(s, batch)
            return s, loss

        return jax.lax.scan(body, state, None, length=STEPS)

    def sync(x):
        return float(np.asarray(x)[-1])

    t0 = time.time()
    state, losses = multi(state, batch)
    sync(losses)
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        state, losses = multi(state, batch)
        sync(losses)
        times.append(time.time() - t0)
    sps = STEPS / min(times)
    print(json.dumps(dict(
        metric="tsp_edges_per_sec", value=round(real_edges * sps, 1),
        unit="edges/s", layout=args.layout, batch_graphs=args.batch_graphs,
        node_cap=args.node_cap, edge_cap=args.edge_cap,
        real_edges=real_edges, steps_per_sec=round(sps, 3),
        compile_s=round(compile_s, 1), collate_s=round(collate_s, 1),
        final_loss=sync(losses), backend=jax.default_backend(),
        **spill_info,
    )), flush=True)


if __name__ == "__main__":
    main()
