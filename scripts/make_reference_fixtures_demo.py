"""Reference fixtures executed against the DEMO fork (HL-HGAT-DEMO/lib).

Must run as its OWN process (not imported by make_reference_fixtures.py):
the DEMO fork shadows the main tree's ``lib`` package name, so only one of
the two can be imported per interpreter.

Cases
-----
* fc2mask_real          reference ``FC2mask`` executed on the REAL
                        ``Group_FC.mat`` group-mean (modes 1 and 3) and on
                        a synthetic multi-subject FC stack (modes 1/2/3 —
                        mode 2 needs a subject dimension for std), pinning
                        this repo's ``fc2mask`` including the reference's
                        mode-3 loop-variable quirk
                        (HL-HGAT-DEMO/lib/Hodge_Dataset.py:148-178).
* model_hgat_attpool    the DEMO ``HL_HGAT_attpool`` forwarded with the
                        REAL pretrained ``HL_HGAT_Brain.pt`` weights on the
                        REAL Shen-268 structure (Group_FC/Group_FCMask →
                        skeleton → MLGC_Weight pyramid, notebook cell 46),
                        incl. the fast-conv K>2 recurrence the checkpoint
                        was trained with (HL-HGAT-DEMO/lib/
                        Hodge_Cheb_Conv.py:561) and the attention maps the
                        OHBM notebook visualizes (cells 48-49).  Subject
                        fMRI series are synthetic (DEMO_DATA.mat is
                        LFS-missing) but structure and weights are real.

torch-cluster graclus faithfulness: the real torch_cluster visits nodes in
``torch.randperm`` order and does not symmetrize the canonical edge list;
with the notebook's ``torch.manual_seed(10086)`` this reproduces the
authors' training pyramid EXACTLY (level-1 nodes+edges = 2815 = the
checkpoint's flatten-head width).  The shim's default graclus is this
repo's index-order matcher, so this script patches the DEMO lib to the
torch-faithful variant before building the pyramid.

Run:  python scripts/make_reference_fixtures_demo.py
"""

from __future__ import annotations

import os
import sys
import warnings

import numpy as np
import torch

warnings.simplefilter("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.pyg_shim import install  # noqa: E402

install()
sys.path.insert(0, "/root/reference/HL-HGAT-DEMO")

import lib.Hodge_Cheb_Conv as demo_conv  # noqa: E402  (the REAL DEMO modules)
import lib.Hodge_Dataset as demo_ds  # noqa: E402
from torch_geometric.data import Batch  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "reference",
)
DATA = "/root/reference/HL-HGAT-DEMO/data"
WEIGHTS = "/root/reference/HL-HGAT-DEMO/weights/HL_HGAT_Brain.pt"


def save(name: str, **arrays):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **{
        k: (v.detach().numpy() if torch.is_tensor(v) else np.asarray(v))
        for k, v in arrays.items()
    })
    print(f"wrote {path}")


def _torch_faithful_graclus(row, col, weight=None, num_nodes=None):
    """torch_cluster.graclus_cluster semantics: randperm visit order from
    the global torch RNG + non-symmetrized neighbour lists."""
    from hl_hgat_tpu.complex.coarsen import graclus_cluster

    n = num_nodes if num_nodes is not None else int(max(row.max(), col.max())) + 1
    visit = torch.randperm(n).numpy()
    w = None if weight is None else weight.detach().cpu().numpy()
    lab = graclus_cluster(
        row.detach().cpu().numpy().astype(np.int64),
        col.detach().cpu().numpy().astype(np.int64),
        w, n, visit=visit, directed=True,
    )
    return torch.from_numpy(np.asarray(lab, dtype=np.int64))


def fixture_fc2mask():
    fc_mean = demo_ds.loadmat(os.path.join(DATA, "Group_FC.mat"))["fc_mean"]
    real = torch.tensor(fc_mean, dtype=torch.float32).unsqueeze(0)
    out = {"fc_mean": fc_mean}
    for mode in (1, 3):
        out[f"real_mode{mode}"] = demo_ds.FC2mask(
            real, threshmode=mode, k_ratio=0.25).numpy()
    gen = torch.Generator().manual_seed(4242)
    stack = torch.randn(6, 30, 30, generator=gen, dtype=torch.float32)
    stack = (stack + stack.transpose(1, 2)) / 2
    out["stack"] = stack.numpy()
    for mode in (1, 2, 3):
        out[f"stack_mode{mode}"] = demo_ds.FC2mask(
            stack, threshmode=mode, k_ratio=0.2).numpy()
    save("fc2mask_real", **out)


def build_real_graphs(pool_num=2, seed=10086):
    """Notebook cell 46, executed with the REFERENCE code itself."""
    fc = torch.tensor(
        demo_ds.loadmat(os.path.join(DATA, "Group_FC.mat"))["fc_mean"])
    fc[fc < 0] = 0.001
    mask = torch.tensor(
        demo_ds.loadmat(os.path.join(DATA, "Group_FCMask.mat"))["sf_mask"])
    skeleton = torch.triu(fc * mask, diagonal=1).to_sparse()

    torch.manual_seed(seed)
    num_rois = int(skeleton.indices().max()) + 1
    par1 = demo_ds.adj2par1(
        skeleton.indices(), num_rois, skeleton.indices().shape[-1]).to_dense()
    L0 = torch.matmul(par1, par1.T)
    maxeig = torch.linalg.eigh(L0)[0].max()
    L0 = 2 * torch.matmul(par1, par1.T) / maxeig
    L1 = 2 * torch.matmul(par1.T, par1) / maxeig
    eit, ewt = demo_ds.dense_to_sparse(L0)
    eis, ews = demo_ds.dense_to_sparse(L1)
    graph = demo_ds.PairData(
        x_s=skeleton.values().view(-1, 1), edge_index_s=eis,
        edge_weight_s=ews, x_t=torch.ones(num_rois, 1),
        edge_index_t=eit, edge_weight_t=ewt,
        edge_index=skeleton.indices(),
    )
    graph.num_node1 = num_rois
    graph.num_edge1 = skeleton.indices().shape[1]
    graph.num_nodes = num_rois
    graphs = [graph]
    for i in range(pool_num):
        graph, c_node, c_edge = demo_ds.MLGC_Weight(graphs[i])
        graphs[i].pos_s, graphs[i].pos_t = c_edge, c_node
        graphs.append(graph)
    return graphs, skeleton


def fixture_model_hgat_attpool():
    # faithful torch_cluster behaviour for the pyramid build (see module
    # docstring); patched on the module the reference code resolves from
    demo_ds.graclus_cluster = _torch_faithful_graclus

    graphs, skeleton = build_real_graphs()
    n1 = int(graphs[1].num_node1)
    e1 = int(graphs[1].num_edge1)
    num_nodepedge = n1 + e1
    print(f"real pyramid: level1 {n1}+{e1} = {num_nodepedge} "
          "(checkpoint flatten head expects 2815)")
    assert num_nodepedge == 2815, "pyramid does not match the checkpoint"

    # two synthetic subjects through the Brain_MLGC_ALL.get() recipe
    # (reference HL-HGAT-DEMO/lib/Hodge_Dataset.py:130-144); structure and
    # model weights are REAL
    gen = torch.Generator().manual_seed(777)
    T = 64
    level_lists = [[] for _ in graphs]
    subjects = []
    import copy
    for _ in range(2):
        fmri = torch.randn(268, T, generator=gen)
        subjects.append(fmri.clone().numpy())
        fmri = (fmri - fmri.mean()) / fmri.std()
        fcs = torch.corrcoef(fmri)[skeleton.indices()[0], skeleton.indices()[1]]
        datas = copy.deepcopy(graphs)
        datas[0].x_s = fcs.view(-1, 1)
        datas[0].x_t = fmri
        datas[0].y = torch.zeros(1)
        for lvl, d in zip(level_lists, datas):
            lvl.append(d)
    batch = [Batch.from_data_list(lvl) for lvl in level_lists]

    model = demo_conv.HL_HGAT_attpool(pool_num=1, num_nodepedge=num_nodepedge)
    model.load_state_dict(torch.load(WEIGHTS, map_location="cpu"))
    model.eval()
    with torch.no_grad():
        pred, latent, node_att, edge_att = model(batch, device="cpu")

    # the OHBM attention matrix (cell 49) + its lobe-sorted form
    attmap = torch.zeros(268, 268)
    attmap[skeleton.indices()[0], skeleton.indices()[1]] = edge_att.mean(dim=0)
    attmap = attmap + attmap.T

    g0, g1 = graphs[0], graphs[1]
    save(
        "model_hgat_attpool",
        pred=pred, latent=latent, node_att=node_att, edge_att=edge_att,
        attmap=attmap,
        skeleton_src=skeleton.indices()[0], skeleton_dst=skeleton.indices()[1],
        skeleton_val=skeleton.values(),
        subjects=np.stack(subjects),
        pos_t0=g0.pos_t, pos_s0=g0.pos_s,
        pos_t1=g1.pos_t, pos_s1=g1.pos_s,
        l1_edge_index=g1.edge_index, l2_edge_index=graphs[2].edge_index,
        num_node=np.asarray([g.num_node1 for g in graphs]),
        num_edge=np.asarray([g.num_edge1 for g in graphs]),
    )


if __name__ == "__main__":
    fixture_fc2mask()
    fixture_model_hgat_attpool()
    print("DEMO reference fixtures complete")
