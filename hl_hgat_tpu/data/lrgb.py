"""LRGB (Long-Range Graph Benchmark) loader.

Equivalent of the reference's vendored ``lib/LRGBDataset.py`` (305 LoC):
registry of the five LRGB datasets with download URLs, published statistics,
and parsers for the released pickle/torch formats.  Download is gated — this
environment has no egress — but files already present under
``<root>/<name>/raw`` are parsed into `GraphSample` streams.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator

import numpy as np

from hl_hgat_tpu.complex.build import GraphSample
from hl_hgat_tpu.data.datasets import peptides_sample

# (url, stats) registry — reference lib/LRGBDataset.py:38-105
LRGB_DATASETS = {
    "pascalvoc-sp": dict(
        url="https://www.dropbox.com/s/8x722ai272wqwl4/voc_superpixels_edge_wt_region_boundary.zip?dl=1",
        num_graphs=11_355, avg_nodes=479.4, avg_edges=2710.5,
        task="node_classification", classes=21,
    ),
    "coco-sp": dict(
        url="https://www.dropbox.com/s/r6ihg1f4pmyjjy0/coco_superpixels_edge_wt_region_boundary.zip?dl=1",
        num_graphs=123_286, avg_nodes=476.9, avg_edges=2693.7,
        task="node_classification", classes=81,
    ),
    "pcqm-contact": dict(
        url="https://www.dropbox.com/s/qdag867u6h6i60y/pcqmc_contact.zip?dl=1",
        num_graphs=529_434, avg_nodes=30.1, avg_edges=61.0,
        task="link_prediction",
    ),
    "peptides-func": dict(
        url="https://www.dropbox.com/s/ol2v01usvaxbsr8/peptidesfunc.zip?dl=1",
        num_graphs=15_535, avg_nodes=150.9, avg_edges=307.3,
        task="graph_classification", classes=10,
    ),
    "peptides-struct": dict(
        url="https://www.dropbox.com/s/464u3303eu2u4zp/peptidesstruct.zip?dl=1",
        num_graphs=15_535, avg_nodes=150.9, avg_edges=307.3,
        task="graph_regression", targets=11,
    ),
}


def lrgb_info(name: str) -> dict:
    key = name.lower()
    if key not in LRGB_DATASETS:
        raise ValueError(
            f"unknown LRGB dataset {name!r}; options: {sorted(LRGB_DATASETS)}"
        )
    return LRGB_DATASETS[key]


def _raw_dir(root: str, name: str) -> str:
    return os.path.join(root, name.lower(), "raw")


def download(root: str, name: str) -> str:
    """Download the raw archive (requires network egress)."""
    import urllib.request
    import zipfile

    info = lrgb_info(name)
    raw = _raw_dir(root, name)
    os.makedirs(raw, exist_ok=True)
    archive = os.path.join(raw, "archive.zip")
    if not os.path.exists(archive):
        urllib.request.urlretrieve(info["url"], archive)
    with zipfile.ZipFile(archive) as zf:
        zf.extractall(raw)
    return raw


def iter_peptides_func(
    root: str, split: str = "train", *, keig: int = 100
) -> Iterator[GraphSample]:
    """Parse the released peptides-func pickles into simplex samples.

    Format (reference lib/LRGBDataset.py peptides branch): a pickle per split
    with lists of (edge_index, edge_attr, x, y) arrays, or torch-saved
    dicts; both layouts are handled."""
    raw = _raw_dir(root, "peptides-func")
    candidates = [
        os.path.join(raw, f"{split}.pickle"),
        os.path.join(raw, f"peptides_{split}.pickle"),
        os.path.join(raw, f"{split}.pt"),
    ]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        raise FileNotFoundError(
            f"no raw peptides-func {split} file under {raw}; expected one of "
            f"{[os.path.basename(c) for c in candidates]} (download with "
            f"hl_hgat_tpu.data.lrgb.download on a machine with egress)"
        )
    if path.endswith(".pickle"):
        with open(path, "rb") as f:
            graphs = pickle.load(f)
    else:
        import torch

        graphs = torch.load(path, weights_only=False)
    for g in graphs:
        if isinstance(g, dict):
            ei = np.asarray(g["edge_index"])
            ea = np.asarray(g["edge_attr"])
            x = np.asarray(g["x"])
            y = np.asarray(g["y"])
        else:
            ei, ea, x, y = (np.asarray(t) for t in g)
        yield peptides_sample(ei, ea, x, y, keig=keig)
