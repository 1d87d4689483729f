"""Real group-level brain data (Shen-268 atlas) shipped with the reference.

The reference's DEMO directory carries the only REAL data in the tree:

* ``Group_FC.mat``     — group-mean functional connectivity ``fc_mean``
  [268, 268] (+ structural ``sc_mean``), loaded at OHBM_DEMO.ipynb cell 46;
* ``Group_FCMask.mat`` — the study's group skeleton ``sf_mask`` (derived
  from the per-subject FC stack via FC2mask; the per-subject series
  ``DEMO_DATA.mat`` is LFS-missing, so the mask is used as shipped — the
  notebook's own inference path, cell 46, does exactly that);
* ``affiliations.mat`` — anatomical parcel memberships (Shen ROIs → 20
  lobes etc.), loaded by ``plt_sort_anatomy``
  (HL-HGAT-DEMO/lib/Hodge_Dataset.py:53-107).

``build_real_brain_pyramid`` reproduces notebook cell 46 EXACTLY, including
torch-cluster's matching behaviour: the notebook seeds ``torch.manual_seed
(10086)`` right before the two ``MLGC_Weight`` poolings because
torch-cluster's graclus visits nodes in ``torch.randperm`` order and does
not symmetrize the canonical edge list.  With ``visit=randperm`` +
``directed_match=True`` our matcher lands on the identical pyramid —
268→139→75 nodes, 8997→2676→800 edges, so level-1 ``nodes+edges = 2815``
matches the shipped ``HL_HGAT_Brain.pt`` checkpoint's flatten-head width
bit-for-bit (``infer_hgat_config``: ``num_nodepedge=2815``).  That is the
evidence this code path rebuilds the authors' actual training structure
from the raw data.
"""

from __future__ import annotations

import os

import numpy as np

from hl_hgat_tpu.complex.build import GraphStructure, build_structure
from hl_hgat_tpu.complex.coarsen import mlgc

REFERENCE_BRAIN_DIR = "/root/reference/HL-HGAT-DEMO/data"

# plt_sort_anatomy's hard-coded lobe display order (reference
# HL-HGAT-DEMO/lib/Hodge_Dataset.py:64): interleaves left/right homologues
# (group ids are 1-based; +1 applied at use).
LOBE_ORDER = [1, 11, 5, 15, 0, 10, 3, 13, 2, 12, 4, 14, 6, 16, 8, 18, 9, 19, 7, 17]


def load_group_fc(data_dir: str = REFERENCE_BRAIN_DIR) -> dict[str, np.ndarray]:
    """``Group_FC.mat`` + ``Group_FCMask.mat`` → fc_mean/sc_mean/sf_mask."""
    from scipy.io import loadmat

    fc = loadmat(os.path.join(data_dir, "Group_FC.mat"))
    m = loadmat(os.path.join(data_dir, "Group_FCMask.mat"))
    return dict(
        fc_mean=np.asarray(fc["fc_mean"], np.float64),
        sc_mean=np.asarray(fc["sc_mean"], np.float64),
        sf_mask=np.asarray(m["sf_mask"], np.float64),
    )


def load_affiliations(data_dir: str = REFERENCE_BRAIN_DIR) -> dict:
    """``affiliations.mat`` → parcel membership table + readable labels
    (reference loads it at HL-HGAT-DEMO/lib/Hodge_Dataset.py:55)."""
    from scipy.io import loadmat

    data = loadmat(os.path.join(data_dir, "affiliations.mat"))
    aff = np.asarray(data["affiliation"], np.int64)  # [268, 6] 1-based ids
    labels = data["labels"][0]
    lobe_names = [str(cell[0][0]) for cell in labels["Lobes_20Ns"][0]]
    return dict(affiliation=aff, lobe_names=lobe_names)


def real_skeleton(
    fc_mean: np.ndarray, sf_mask: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Notebook cell 46: clamp negative FC to 0.001, mask, strict upper
    triangle → canonical (src, dst, fc_weight) arrays in row-major order
    (the order ``torch.Tensor.to_sparse`` emits)."""
    fc = fc_mean.copy()
    fc[fc < 0] = 0.001
    masked = np.triu(fc * sf_mask, 1)
    src, dst = np.nonzero(masked)  # row-major like torch's to_sparse
    return src.astype(np.int64), dst.astype(np.int64), masked[src, dst]


def build_real_brain_pyramid(
    data_dir: str = REFERENCE_BRAIN_DIR,
    pool_num: int = 2,
    seed: int = 10086,
) -> tuple[list[GraphStructure], list[tuple[np.ndarray, np.ndarray]], np.ndarray]:
    """The real Shen-268 pyramid of OHBM_DEMO.ipynb cell 46.

    Returns (levels, pools, skeleton_fc_weights); ``pools[k]`` holds the
    (c_node, c_edge) assignments with −1 for dropped simplices (the
    reference's ``inf``).  Requires torch only for the ``randperm`` visit
    order that torch-cluster's graclus consumes under the notebook's seed.
    """
    import torch

    g = load_group_fc(data_dir)
    src, dst, w = real_skeleton(g["fc_mean"], g["sf_mask"])
    n = int(max(src.max(), dst.max())) + 1
    levels = [build_structure(src.astype(np.int32), dst.astype(np.int32), n)]
    pools: list[tuple[np.ndarray, np.ndarray]] = []
    torch.manual_seed(seed)
    weight = w
    for _ in range(pool_num):
        st = levels[-1]
        visit = torch.randperm(st.num_nodes).numpy()
        lvl = mlgc(
            st,
            edge_weight=weight,
            x_s=weight.reshape(-1, 1),
            prune_single_fine_edges=True,
            drop_isolated_nodes=True,
            visit=visit,
            directed_match=True,
        )
        levels.append(lvl.structure)
        pools.append((lvl.c_node, lvl.c_edge))
        weight = lvl.x_s_pool.reshape(-1)  # MLGC_Weight pools the FC values
    return levels, pools, w


def lobe_sorted_matrix(
    m: np.ndarray, affiliation: np.ndarray, lobe_names: list[str]
) -> dict:
    """The array behind ``plt_sort_anatomy`` (reference
    HL-HGAT-DEMO/lib/Hodge_Dataset.py:53-107): permute an ROI×ROI matrix by
    the 20-lobe membership (column 5) in the reference's display order.

    Returns the sorted matrix, the permutation, per-lobe block sizes, and
    the ordered lobe labels — everything the plot draws, without plotting.
    """
    group = affiliation[:, 5]  # 1-based lobe ids
    perm_parts = []
    sizes = []
    for lobe in LOBE_ORDER:
        idx = np.nonzero(group == lobe + 1)[0]
        perm_parts.append(idx)
        sizes.append(idx.size)
    perm = np.concatenate(perm_parts)
    return dict(
        matrix=m[np.ix_(perm, perm)],
        perm=perm,
        sizes=np.asarray(sizes),
        labels=[lobe_names[o] for o in LOBE_ORDER],
    )
