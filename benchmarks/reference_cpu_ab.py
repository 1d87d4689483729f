"""Same-host A/B: the EXECUTED reference vs this framework, identical work.

The `vs_baseline` denominator in bench.py is a first-principles estimate
(BASELINE.md) because no A100/PyG is reachable.  What this environment CAN
measure since round 2 is the reference itself, executed through the
pure-torch shim on the host CPU — so this script times the full training
step (forward + loss + backward + Adam) of the reference
``HL_HGCNN_zinc_dense_int3_pyr`` against this framework's identical model
on the SAME batches, SAME host, both frameworks on CPU.

The resulting ratio is a SOFTWARE-efficiency comparison (graph handling,
scatter vs dense-pack layouts, compiler fusion), not a hardware claim: the
host CPU is heavily throttled and favours neither side; torch uses its
ATen/BLAS kernels with threading, JAX uses XLA:CPU.  It replaces the
estimated denominator with a measured one for the shapes tested.

    python benchmarks/reference_cpu_ab.py [--graphs 32] [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import warnings

warnings.simplefilter("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--channels", type=int, nargs="+", default=[2, 3, 3])
    ap.add_argument("--filters", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--k", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from scripts.pyg_shim import install

    install()
    sys.path.insert(0, "/root/reference")
    import lib.Hodge_ST_Model as ref_models
    from torch_geometric.data import Batch

    from scripts.make_reference_fixtures import _pair_from_graph, make_graph

    node_dim, edge_dim, keig = 13, 7, 15
    gen = torch.Generator().manual_seed(42)
    rng = np.random.default_rng(42)
    datas = []
    for gi in range(args.graphs):
        n = int(rng.integers(18, 38))
        ei = make_graph(n, int(rng.integers(4, 12)), seed=5000 + gi)
        x_t = torch.randn(n, node_dim + keig, generator=gen)
        x_s = torch.randn(ei.shape[1], edge_dim + keig, generator=gen)
        datas.append(_pair_from_graph(ei, n, x_t, x_s,
                                      torch.randn(1, generator=gen)))
    batch_t = Batch.from_data_list(datas)
    real_edges = int(batch_t.num_edge1.sum())

    # ---- reference side (executed via the shim, torch CPU) ----------------
    torch.manual_seed(0)
    ref = ref_models.HL_HGCNN_zinc_dense_int3_pyr(
        channels=list(args.channels), filters=list(args.filters),
        mlp_channels=[256], K=args.k,
        node_dim=node_dim, edge_dim=edge_dim, keig=keig,
    )
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    crit = torch.nn.L1Loss()
    ref.train()

    def torch_step():
        opt.zero_grad()
        out = ref(batch_t, device="cpu")
        loss = crit(out.view(-1, 1), batch_t.y.view(-1, 1))
        loss.backward()
        opt.step()
        return float(loss)

    torch_step()  # warmup (allocations, BN stats)
    t0 = time.time()
    for _ in range(args.steps):
        torch_step()
    ref_s = (time.time() - t0) / args.steps

    # ---- this framework (JAX on the same CPU) -----------------------------
    from hl_hgat_tpu.complex.build import build_complex, collate
    from hl_hgat_tpu.models.backbone import BackboneConfig, HLHGCNNGraph
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    samples = []
    noff = 0
    eoff = 0
    for d in datas:
        n = int(d.num_node1)
        e = int(d.num_edge1)
        samples.append(build_complex(
            d.edge_index.numpy(), n,
            x_t=d.x_t.numpy(), x_s=d.x_s.numpy(),
            y=d.y.numpy().reshape(1)))
        noff += n
        eoff += e
    batch_j = jax.tree.map(jnp.asarray, collate(samples))

    model = HLHGCNNGraph(
        cfg=BackboneConfig(
            channels=tuple(args.channels), filters=tuple(args.filters),
            k=args.k, init_k=args.k, deg_eps=0.0),
        mlp_channels=(256,), num_classes=1,
    )
    trainer = Trainer(model, TrainerConfig(task="regression", lr=1e-3))
    state = trainer.init_state(batch_j)
    state, loss = trainer._train_step(state, batch_j)  # compile + warmup
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(args.steps):
        state, loss = trainer._train_step(state, batch_j)
    jax.block_until_ready(loss)
    ours_s = (time.time() - t0) / args.steps

    print(json.dumps(dict(
        metric="cpu_ab_speedup", value=round(ref_s / ours_s, 2),
        unit="x (reference_step_s / ours_step_s, same host CPU)",
        reference_s_per_step=round(ref_s, 3),
        ours_s_per_step=round(ours_s, 3),
        reference_edges_per_sec=round(real_edges / ref_s, 1),
        ours_edges_per_sec=round(real_edges / ours_s, 1),
        graphs=args.graphs, real_edges=real_edges,
        channels=args.channels, filters=args.filters, k=args.k,
        torch_threads=torch.get_num_threads(),
    )), flush=True)


if __name__ == "__main__":
    main()
