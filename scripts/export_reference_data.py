"""Export reference benchmark datasets to framework-readable pickles.

Run this in a PyTorch-Geometric environment (e.g. the reference's own,
/root/reference README.md:19-22) — the GNNBenchmark/LRGB processed ``.pt``
files need torch_geometric classes to unpickle, so the TPU framework cannot
read them directly.  Output: one ``{benchmark}_{split}.pkl`` per split under
--out, a plain pickle of dicts of numpy arrays that
`hl_hgat_tpu.data.ingest.load_samples` parses (and caches as npz) without
any torch_geometric dependency.

    python scripts/export_reference_data.py --benchmark tsp \
        --root <pyg data root> --out <dir visible to the TPU host>

Schemas (all numpy):
  tsp:        pos [n,2], edge_index [2,e], edge_attr [e], y [e]
  cifar10sp:  x [n,3], pos [n,2], edge_index [2,e], edge_attr [e], y [1]
  zinc / pepfunc need no export — ingest reads their raw pickles directly.
"""

from __future__ import annotations

import argparse
import os
import pickle


def export(benchmark: str, root: str, out: str, splits=("train", "val", "test")):
    import numpy as np
    from torch_geometric.datasets import GNNBenchmarkDataset

    name = {"tsp": "TSP", "cifar10sp": "CIFAR10"}[benchmark]
    os.makedirs(out, exist_ok=True)
    for split in splits:
        ds = GNNBenchmarkDataset(root, name, split=split)
        graphs = []
        for data in ds:
            g = dict(
                edge_index=data.edge_index.numpy(),
                edge_attr=data.edge_attr.numpy().reshape(-1),
                y=data.y.numpy().reshape(-1),
            )
            if benchmark == "tsp":
                g["pos"] = data.pos.numpy()
            else:
                g["x"] = data.x.numpy()
                g["pos"] = data.pos.numpy()
            graphs.append(g)
        path = os.path.join(out, f"{benchmark}_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(graphs, f)
        print(f"wrote {len(graphs)} graphs -> {path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--benchmark", required=True, choices=["tsp", "cifar10sp"])
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    export(args.benchmark, args.root, args.out)
