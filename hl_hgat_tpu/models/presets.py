"""Reference-model presets: each entry reproduces one reference class /
training-script configuration (constructor defaults + main-script CLI
defaults), with every documented quirk wired in.

Factory functions return (module, metadata) ready to ``init``/``apply`` on a
`ComplexBatch`.
"""

from __future__ import annotations

from hl_hgat_tpu.models.abcd import HLHGCNNAbcd
from hl_hgat_tpu.models.backbone import BackboneConfig, HLHGCNNGraph, HLHGCNNTsp
from hl_hgat_tpu.models.hgat import HLHGATAttpool

# ---------------------------------------------------------------------------
# ZINC (reference lib/Hodge_ST_Model.py:544-646; script main_zinc...py:43-149)
# ---------------------------------------------------------------------------


def zinc_pyr(
    channels=(2, 3, 3),
    filters=(64, 128, 256),
    k=6,
    keig=15,
    dropout=0.0,
    mlp_channels=(256, 256),
    use_embedding=True,
    compute_dtype="float32",
    remat=False,
):
    """Script variant: shared nn.Embedding(28) inputs, init conv K=1, no
    degree epsilon (reference main_zinc...py:52-53,58,127)."""
    cfg = BackboneConfig(
        channels=tuple(channels),
        filters=tuple(filters),
        k=k,
        init_k=1 if use_embedding else k,
        act="relu",
        dropout=dropout,
        deg_eps=0.0,  # reference quirk (lib/Hodge_ST_Model.py:624)
        compute_dtype=compute_dtype,
        remat=remat,
    )
    model = HLHGCNNGraph(
        cfg=cfg,
        mlp_channels=tuple(mlp_channels),
        num_classes=1,
        embed_num=28 if use_embedding else 0,
        embed_dim=(filters[0] - keig) if use_embedding else 0,
    )
    return model, dict(task="regression", y_mean=0.0153, y_std=2.0109)


def zinc_attpool(
    channels=(2, 2, 2, 2), filters=(64, 128, 256, 512), k=2, keig=7,
    dropout=0.0, mlp_channels=(),
):
    """reference lib/Hodge_ST_Model.py:412-541 — ReLU gates computed from and
    applied to the LAST layer outputs (while the pool moves the stacks;
    faithful quirk, reference :517-521)."""
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=k,
        act="relu", dropout=dropout, deg_eps=0.0,
        pool_locs=(0,), att_sigma="relu", gate_input="last", gate_target="last",
        stack_concat="layer",  # pooled family: measured faster than "block"
    )
    return HLHGCNNGraph(cfg=cfg, mlp_channels=tuple(mlp_channels)), dict(
        task="regression", y_mean=0.0153, y_std=2.0109
    )


def zinc_poolint3_pyr(
    channels=(2, 2, 2, 2), filters=(64, 128, 256, 512), k=2, dropout=0.0,
    mlp_channels=(),
):
    """reference lib/Hodge_ST_Model.py:649-749 — MSI once per block after the
    convs."""
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=k,
        act="relu", dropout=dropout, deg_eps=0.0, msi_per_layer=False,
        stack_concat="layer",  # conv recurrence materializes stacks anyway
    )
    return HLHGCNNGraph(cfg=cfg, mlp_channels=tuple(mlp_channels)), dict(
        task="regression", y_mean=0.0153, y_std=2.0109
    )


# ---------------------------------------------------------------------------
# Peptides-func (reference lib/Hodge_ST_Model.py:173-407; main_pepfunc...py)
# ---------------------------------------------------------------------------


def pepfunc_attpool(
    channels=(2, 2, 2),
    filters=(64, 128, 256),
    k=6,
    keig=10,
    dropout=0.25,
    mlp_channels=(256,),
    pool_loc=1,
    script_variant=True,
):
    """10-way multilabel.  Script variant gates the stacks EVERY block with
    λ=0.5 and pools at pool_loc (reference main_pepfunc...py:90,133-149);
    lib variant gates only at pool_loc with the default λ=0.9 (reference
    lib/Hodge_ST_Model.py:225-227).  Both pinned by executed-reference
    fixtures (model_pepfunc_attpool / model_pepfunc_attpool_lib)."""
    n_blocks = len(channels)
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=1,
        act="relu", dropout=dropout, deg_eps=1e-6,
        pool_locs=(pool_loc,),
        att_locs=tuple(range(n_blocks)) if script_variant else (),
        att_sigma="sigmoid", att_lam=0.5 if script_variant else 0.9,
        gate_input="stack", gate_target="stack",
        stack_concat="layer",  # pooled family: measured faster than "block"
    )
    return HLHGCNNGraph(
        cfg=cfg, mlp_channels=tuple(mlp_channels), num_classes=10
    ), dict(task="multilabel")


def pepfunc_pyr(
    channels=(2, 2, 2, 2), filters=(64, 128, 256, 512), k=2, dropout=0.0,
    mlp_channels=(),
):
    """reference lib/Hodge_ST_Model.py:307-407 (no pooling; init conv K=K)."""
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=k,
        act="relu", dropout=dropout, deg_eps=1e-6,
    )
    return HLHGCNNGraph(
        cfg=cfg, mlp_channels=tuple(mlp_channels), num_classes=10
    ), dict(task="multilabel")


# ---------------------------------------------------------------------------
# TSP (reference lib/Hodge_ST_Model.py:756-852; main_TSP...py)
# ---------------------------------------------------------------------------


def tsp_pyr(
    channels=(4, 4, 4), filters=(32, 64, 128), k=4, dropout=0.25,
    mlp_channels=(256,),
):
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=k,
        act="relu", dropout=dropout, deg_eps=1e-6,
    )
    return HLHGCNNTsp(cfg=cfg, mlp_channels=tuple(mlp_channels)), dict(
        task="edge_binary"
    )


# ---------------------------------------------------------------------------
# CIFAR10 superpixels (reference lib/Hodge_ST_Model.py:858-1091)
# ---------------------------------------------------------------------------


def cifar10sp_pyr(
    channels=(2, 2, 2, 2), filters=(64, 128, 256, 512), k=2, keig=10,
    dropout=0.0, mlp_channels=(), lam=0.9,
):
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=1,
        act="relu", dropout=dropout, deg_eps=1e-6, att_lam=lam,
    )
    return HLHGCNNGraph(
        cfg=cfg, mlp_channels=tuple(mlp_channels), num_classes=10
    ), dict(task="classification")


def cifar10sp_attpool(
    channels=(2, 2, 2), filters=(64, 128, 256), k=4, keig=10, dropout=0.25,
    mlp_channels=(256,), lam=0.5,
):
    """ReLU gates, max-normalized, applied to the last outputs (reference
    lib/Hodge_ST_Model.py:1058-1064); λ = 0.5."""
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=1,
        act="relu", dropout=dropout, deg_eps=1e-6,
        pool_locs=(0,), att_sigma="relu", att_lam=lam,
        gate_input="last", gate_target="last", max_normalize_gates=True,
        stack_concat="layer",  # measured: 1.72M vs 1.62M edges/s at "block"
    )
    return HLHGCNNGraph(
        cfg=cfg, mlp_channels=tuple(mlp_channels), num_classes=10
    ), dict(task="classification")


# ---------------------------------------------------------------------------
# Brain (reference lib/Hodge_ST_Model.py:26-168;
# HL-HGAT-DEMO/lib/Hodge_Cheb_Conv.py:250-399)
# ---------------------------------------------------------------------------


def abcd_attpool(
    channels=(2, 2, 2), filters=(64, 128, 256), k=2, dropout=0.0,
    mlp_channels=(), nodes_per_graph=0, edges_per_graph=0, pool_num=1,
):
    """``pool_num`` mirrors the reference ctor's ``pool_loc`` LIST
    (lib/Hodge_ST_Model.py:28): pools after blocks 0..pool_num−1 — they
    must sit at non-final blocks (a last-block pool only moves the dead
    stack; the readout consumes the last conv outputs).  The 2-pool path
    is pinned against the executed reference (model_abcd_attpool2)."""
    if pool_num >= len(channels):
        raise ValueError(
            f"pool_num {pool_num} needs non-final pools; model has "
            f"{len(channels)} blocks")
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=k,
        act="leaky_relu", dropout=dropout, deg_eps=1e-6,
        pool_locs=tuple(range(pool_num)), att_sigma="sigmoid",
        gate_input="last", gate_target="stack",
        stack_concat="layer",  # pooled family: measured faster than "block"
    )
    return HLHGCNNAbcd(
        cfg=cfg, mlp_channels=tuple(mlp_channels),
        nodes_per_graph=nodes_per_graph, edges_per_graph=edges_per_graph,
    ), dict(task="regression", y_mean=95.1377, y_std=7.3)


def hgat_attpool(
    channels=(2, 2, 2), filters=(32, 64, 128), k=4, dropout=0.0,
    mlp_channels=(), pool_num=2, nodes_per_graph=0, edges_per_graph=0,
    fine_nodes_per_graph=0, fine_edges_per_graph=0, use_inception=True,
    demo_conv_compat=False,
):
    """``demo_conv_compat=True`` reproduces the DEMO fast-conv K>2
    recurrence the shipped ``HL_HGAT_Brain.pt`` was trained with
    (HL-HGAT-DEMO/lib/Hodge_Cheb_Conv.py:561); default keeps the fixed
    canonical recurrence."""
    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=k,
        act="leaky_relu", dropout=dropout, deg_eps=1e-6,
        pool_locs=tuple(range(pool_num)), att_sigma="sigmoid",
        gate_input="stack", gate_target="stack",
        stack_concat="layer",  # pooled family: measured faster than "block"
        demo_conv_compat=demo_conv_compat,
    )
    return HLHGATAttpool(
        cfg=cfg, mlp_channels=tuple(mlp_channels),
        nodes_per_graph=nodes_per_graph, edges_per_graph=edges_per_graph,
        fine_nodes_per_graph=fine_nodes_per_graph,
        fine_edges_per_graph=fine_edges_per_graph,
        use_inception=use_inception,
    ), dict(task="regression", y_mean=95.1377, y_std=7.3)


# ---------------------------------------------------------------------------
# LRGB extensions — PascalVOC-SP / COCO-SP node classification and
# PCQM-Contact link prediction (the reference ships loaders,
# lib/LRGBDataset.py:26-306, but no models; these extend the family with the
# TSP edge head's node/pair-level mirrors)
# ---------------------------------------------------------------------------


def pascalvoc_node(
    channels=(2, 2, 2), filters=(64, 128, 256), k=4, dropout=0.1,
    mlp_channels=(128,), num_classes=21,
):
    from hl_hgat_tpu.models.backbone import HLHGCNNNode

    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=1,
        act="relu", dropout=dropout, deg_eps=1e-6,
    )
    return HLHGCNNNode(
        cfg=cfg, mlp_channels=tuple(mlp_channels), num_classes=num_classes
    ), dict(task="node_classification")


def coco_node(**kw):
    kw.setdefault("num_classes", 81)
    return pascalvoc_node(**kw)


def pcqm_link(
    channels=(2, 2, 2), filters=(64, 128, 256), k=4, dropout=0.1,
    mlp_channels=(128,),
):
    """Beyond-reference PCQM-Contact head (the reference ships the loader's
    edge_label fields, lib/LRGBDataset.py:81-95, but no model): query pairs
    ride the batch (``ComplexBatch.pairs``/``pair_mask`` + per-pair ``y``,
    attached by ``BucketedLoader(link_queries=...)``), so the standard
    ``Trainer`` fit/test loop applies — ``run.py --benchmark pcqm`` with
    MRR eval; convergence proxy in
    ``benchmarks/convergence_tasks.py --task link_pred``."""
    from hl_hgat_tpu.models.backbone import HLHGCNNLinkPred

    cfg = BackboneConfig(
        channels=tuple(channels), filters=tuple(filters), k=k, init_k=1,
        act="relu", dropout=dropout, deg_eps=1e-6,
    )
    return HLHGCNNLinkPred(
        cfg=cfg, mlp_channels=tuple(mlp_channels)
    ), dict(task="link_prediction")


PRESETS = {
    "zinc_pyr": zinc_pyr,
    "pascalvoc_node": pascalvoc_node,
    "coco_node": coco_node,
    "pcqm_link": pcqm_link,
    "zinc_attpool": zinc_attpool,
    "zinc_poolint3_pyr": zinc_poolint3_pyr,
    "pepfunc_attpool": pepfunc_attpool,
    "pepfunc_pyr": pepfunc_pyr,
    "tsp_pyr": tsp_pyr,
    "cifar10sp_pyr": cifar10sp_pyr,
    "cifar10sp_attpool": cifar10sp_attpool,
    "abcd_attpool": abcd_attpool,
    "hgat_attpool": hgat_attpool,
}
