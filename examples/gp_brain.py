"""Graph-parallel brain demo: ONE large FC complex sharded across a mesh.

The brain regime the reference cannot touch (single GPU, single graph,
reference HL-HGAT-DEMO/OHBM_DEMO.ipynb trains on ~400-ROI complexes): here a
dense-FC simplicial complex with tens of thousands of 1-simplices trains as
a SINGLE sample row-sharded over the ``graph`` mesh axis — the flax model
runs unmodified under GSPMD while every Laguerre conv routes through the
overlapped ppermute halo-exchange SpMM (`hl_hgat_tpu.parallel.gp_model`).

Runs anywhere: on a multi-chip TPU slice the mesh spans real devices; on CPU
it forces 8 virtual devices (the test/dev configuration).

    python examples/gp_brain.py [--rois 64 --steps 10 --parts 8 --cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=64)
    ap.add_argument("--keep", type=float, default=0.3,
                    help="fraction of FC edges kept in the skeleton")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.cpu or len(jax.devices()) < args.parts:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.parts}"
        )
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hl_hgat_tpu.complex.build import GraphSample, build_structure
    from hl_hgat_tpu.complex.coarsen import mlgc
    from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
    from hl_hgat_tpu.parallel import build_gp_batch, make_mesh
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    n = args.rois
    # synthetic group FC skeleton: top |corr| edges of a random SPD matrix
    ts = rng.standard_normal((n, 256)).astype(np.float32)
    fc = np.corrcoef(ts)
    iu = np.triu_indices(n, 1)
    order = np.argsort(-np.abs(fc[iu]))
    keep = order[: int(args.keep * order.size)]
    src, dst = iu[0][keep].astype(np.int32), iu[1][keep].astype(np.int32)
    e = src.size
    print(f"complex: {n} nodes, {e} edges, {args.parts}-way graph sharding")

    st = build_structure(src, dst, n)
    lvl = mlgc(st, edge_weight=np.abs(fc[src, dst]).astype(np.float64))
    sample = GraphSample(
        x_t=ts[:, :8].copy(),
        x_s=np.abs(fc[src, dst])[:, None].astype(np.float32),
        y=np.asarray([0.37], np.float32),
        levels=[st, lvl.structure],
        pools=[(lvl.c_node, lvl.c_edge)],
    )

    mesh = make_mesh(data=1, graph=args.parts)
    batch = build_gp_batch(sample, args.parts, mesh)

    model = HLHGCNNGraph(
        cfg=BackboneConfig(
            channels=(2, 2), filters=(32, 64), k=4, init_k=2,
            pool_locs=(0,), att_locs=(0,), act="leaky_relu",
        ),
        mlp_channels=(64,),
        num_classes=1,
    )
    trainer = Trainer(model, TrainerConfig(task="regression", lr=1e-3))
    state = trainer.init_state(batch)
    t0 = time.time()
    for step in range(args.steps):
        state, loss = trainer._train_step(state, batch)
        if step in (0, args.steps - 1):
            print(f"step {step}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    print("graph-parallel training OK on mesh", mesh.shape, flush=True)


if __name__ == "__main__":
    main()
