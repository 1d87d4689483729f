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


class BrainLoader:
    """Subject-batch loader for shared-skeleton brain datasets — the
    reference's ``Brain_MLGC_ALL`` + ``DataLoader`` pairing
    (HL-HGAT-DEMO/lib/Hodge_Dataset.py:110-145, OHBM_DEMO.ipynb cell 25).

    Yields ``collate_dense_shared`` batches: per-subject temporal crop
    augmentation re-rolled every epoch (reference ``ifaug``), Pearson FC at
    the shared skeleton, z-scored targets.  Static shapes: every batch has
    the same operators and the same [B, S, *] feature shapes (a fixed
    ``crop_len`` keeps the time axis static too), so the training step
    compiles once.
    """

    def __init__(
        self,
        timeseries: "list[np.ndarray]",
        scores: "list[float] | np.ndarray",
        levels,
        pools,
        batch_size: int,
        *,
        crop_len: int | None = None,
        shuffle: bool = True,
        seed: int = 0,
        y_mean: float = 95.1377,
        y_std: float = 7.3,
        drop_last: bool = True,
    ) -> None:
        from hl_hgat_tpu.complex.build import GraphStructure  # noqa: F401

        assert len(timeseries) == len(scores)
        self.timeseries = timeseries
        self.scores = np.asarray(scores, np.float64)
        self.levels = list(levels)
        self.pools = list(pools)
        self.batch_size = batch_size
        self.crop_len = crop_len
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.y_mean = y_mean
        self.y_std = y_std
        self.drop_last = drop_last
        st = self.levels[0]
        self.src, self.dst = st.src, st.dst

    def __len__(self) -> int:
        n = len(self.timeseries)
        b = self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def __iter__(self):
        from hl_hgat_tpu.complex.dense import collate_dense_shared
        from hl_hgat_tpu.data.datasets import brain_sample

        order = np.arange(len(self.timeseries))
        if self.shuffle:
            self.rng.shuffle(order)
        b = self.batch_size
        stop = (len(order) - b + 1) if self.drop_last else len(order)
        for lo in range(0, max(stop, 0), b):
            idx = order[lo:lo + b]
            samples = [
                brain_sample(
                    self.timeseries[i], self.src, self.dst,
                    self.levels, self.pools, y=float(self.scores[i]),
                    crop_len=self.crop_len, rng=self.rng,
                    y_mean=self.y_mean, y_std=self.y_std,
                )
                for i in idx
            ]
            yield collate_dense_shared(samples, multiple=1)
