"""The shared dense-int3 backbone + graph/edge-level model heads.

Template (every reference model, SURVEY.md §2.5): HL_init_conv → per block i
of ``channels`` with width ``filters[i]``: channels[i] × (MSI → node/edge
Laguerre pair with BN/act/dropout → dense concat onto the running stacks) →
optional attention gating / structural pooling → readout → MLP head.

Per-model quirks are config, not code forks (reference cites inline):

* ``deg_eps``: ``degree(...)+1e-6`` everywhere EXCEPT the zinc pyr/attpool
  block loops (reference lib/Hodge_ST_Model.py:504,624 — no epsilon).
* ``gate_input``/``gate_target``: zinc-attpool gates (x_t, x_s) and multiplies
  them into x_t/x_s — which the following pool of x_t0 ignores (reference
  :517-521, a faithful quirk); pepfunc gates and multiplies the stacks
  (x_t0, x_s0) (reference main_pepfunc...py:134-136); CIFAR gates the last
  outputs with max-normalization (reference :1060-1064).
* ``att_locs`` vs ``pool_locs``: the pepfunc script applies attention every
  block but pools only at pool_loc (reference main_pepfunc...py:133-149);
  lib models gate only at pool_loc.
* ``msi_per_layer=False`` is the poolint3 variant: convs consume the raw
  stacks and one MSI runs per block after the convs (reference
  lib/Hodge_ST_Model.py:649-749).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from hl_hgat_tpu.complex.batch import ComplexBatch, ComplexLevel
from hl_hgat_tpu.nn.blocks import (
    ConvBNAct,
    NEConvPair,
    activation,
    merged_conv_pair,
)
from hl_hgat_tpu.nn.conv import LaguerreConv
from hl_hgat_tpu.nn.interaction import NodeEdgeInt
from hl_hgat_tpu.nn.linear import TorchLinear
from hl_hgat_tpu.nn.norm import MaskedBatchNorm
from hl_hgat_tpu.nn.pool import global_mean_pool, sapool_scatter
from hl_hgat_tpu.ops.dispatch import (
    apply_edge_mask,
    apply_node_mask,
    b1_t2s,
    masked_mean_edges,
    masked_mean_nodes,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    channels: tuple[int, ...] = (2, 2, 2, 2)
    filters: tuple[int, ...] = (64, 128, 256, 512)
    k: int = 2
    init_k: int = 2  # K of HL_init_conv (1 for zinc-script/CIFAR/pepfunc-att)
    act: str = "relu"
    leaky_slope: float = 0.1
    dropout: float = 0.0
    deg_eps: float = 1e-6
    msi_per_layer: bool = True
    # attention / pooling
    pool_locs: tuple[int, ...] = ()
    att_locs: tuple[int, ...] = ()
    att_sigma: str = "sigmoid"
    att_lam: float = 0.9
    att_dk: int = 32
    gate_input: str = "last"  # 'last' (x_t, x_s) | 'stack' (x_t0, x_s0)
    gate_target: str = "stack"  # 'stack' | 'last'
    max_normalize_gates: bool = False
    # activations dtype: 'bfloat16' halves HBM traffic and doubles MXU rate;
    # params stay fp32, matmuls accumulate fp32 (preferred_element_type), BN
    # statistics are computed in fp32 regardless.
    compute_dtype: str = "float32"
    # Mixed-precision head: dtype of the readout + MLP-head computation.
    # None follows compute_dtype.  "float32" on a bf16 trunk casts the
    # final backbone features up BEFORE the readout, so the pooled
    # vector / readout convs / MLP / output layer all run in f32 — a
    # measured-neutral option at ~zero step cost (benchmarks/RESULTS.md
    # round 4; the head is [G, C]-sized, a negligible share of the step's
    # bytes).  Honored by EVERY model family: graph (segment-mean + MLP),
    # node / TSP edge (readout K=1 convs), link-pred (pair MLP), and ABCD
    # (readout convs + flatten head) — see ``head_cast``.
    head_dtype: str | None = None
    # Swapped-dW stack-GEMM backward (nn/gemm.py): None follows the
    # process default (use_swap_dw(), set once by run.py/bench.py before
    # tracing); True/False pin the choice for THIS model's trace via
    # swap_dw_scope, so it is part of module config and trace-stable —
    # a bf16 trainer and an f32 parity eval can coexist in one process.
    swap_dw: bool | None = None
    # rematerialize layers in the backward pass (per-layer nn.remat):
    #   True  — remat both MSI and conv pairs: residuals shrink from every
    #           layer's Laguerre term pyramid to the layer inputs; unlocks
    #           batches past the HBM wall at ~1 extra forward of recompute
    #           (benchmarks/RESULTS.md; coarser granularity measured worse —
    #           see make_backbone)
    #   "msi" — remat only the MSI interactions; pair with the fused Laguerre
    #           kernel (HLHGAT_FUSED_DENSE=1), whose custom VJP already keeps
    #           the term pyramid out of HBM — full remat would recompute the
    #           recurrence a third time (fwd + replay + kernel bwd)
    #   False — no remat.
    # Parameter trees are unchanged (lifted transform keeps scope names).
    remat: bool | str = False
    # Dense-concat stack materialization granularity (exact math either way;
    # the stacks may be carried as tuples of column pieces, see
    # nn/interaction.py _as_pieces):
    #   'layer' — concat after every layer (the reference's formulation):
    #             pays O(L²) stack writes + duplicated backward residuals,
    #             but every MSI GEMM is one wide dot.
    #   'block' — concat only when the block width changes: ≤ channels[i]
    #             pieces per MSI GEMM (few partial-sum outputs), stack
    #             writes only at block transitions.
    #   'never' — pure pieces: zero concat writes, O(L) residuals, but each
    #             MSI GEMM pays one [N, 2dv] f32 partial sum per piece.
    stack_concat: str = "block"
    # Reproduce the DEMO fast-conv K>2 recurrence deviation (nn/conv.py
    # polynomial_terms 'laguerre_demo') — needed to run the shipped
    # pretrained brain checkpoint faithfully; default stays the fixed math.
    demo_conv_compat: bool = False


class DenseInt3Backbone(nn.Module):
    """Shared trunk; returns last-layer features, stacks, final level index,
    and any attention maps (for visualization parity, reference
    lib/Hodge_ST_Model.py:1089-1090)."""

    cfg: BackboneConfig

    @nn.compact
    def __call__(
        self,
        x_t: Array,
        x_s: Array,
        batch: ComplexBatch,
        deterministic: bool = False,
    ):
        # ``deterministic`` is positional-friendly so make_backbone can mark
        # it static under nn.remat (static_argnums=(4,))
        from hl_hgat_tpu.nn.gemm import swap_dw_scope

        with swap_dw_scope(self.cfg.swap_dw):
            return self._forward(x_t, x_s, batch, deterministic)

    def _forward(
        self,
        x_t: Array,
        x_s: Array,
        batch: ComplexBatch,
        deterministic: bool = False,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x_t = x_t.astype(dtype)
        x_s = x_s.astype(dtype)
        # operators follow the compute dtype: mixed f32-operator × bf16-x
        # matmuls would otherwise upcast and run at the f32 MXU rate
        # (ops/dispatch.py cast_operators)
        from hl_hgat_tpu.ops.dispatch import cast_operators

        batch = cast_operators(batch, dtype)
        level = batch.levels[0]
        deg = level.deg + cfg.deg_eps
        snapshots: list[tuple[Array, Array]] = []

        # HL_init_conv (reference lib/Hodge_ST_Model.py:556-568); the two
        # paths run as ONE merged recurrence/GEMM chain when the dense-block
        # layouts line up (nn/blocks.py merged_conv_pair — falls back to
        # separate execution for COO layouts or unequal feature widths)
        init_node = ConvBNAct(
            cfg.filters[0], cfg.init_k, cfg.act, cfg.leaky_slope, cfg.dropout,
            demo_compat=cfg.demo_conv_compat, name="init_node",
        )
        init_edge = ConvBNAct(
            cfg.filters[0], cfg.init_k, cfg.act, cfg.leaky_slope, cfg.dropout,
            demo_compat=cfg.demo_conv_compat, name="init_edge",
        )
        merged_init = merged_conv_pair(
            init_node, init_edge, x_t, x_s, level, deterministic
        )
        if merged_init is not None:
            x_t, x_s = merged_init
        else:
            x_t = init_node(
                x_t, level.l0, level.node_mask, deterministic=deterministic
            )
            x_s = init_edge(
                x_s, level.l1, level.edge_mask, deterministic=deterministic
            )
        # The dense-concat stacks are carried as tuples of column pieces
        # (virtual concats, nn/interaction.py _as_pieces): MSI consumes them
        # piecewise via kernel row-slices, so the O(L²) stack concats are
        # never materialized and autodiff saves each layer output once —
        # not once per downstream stack copy.
        pieces_t: tuple[Array, ...] = (x_t,)
        pieces_s: tuple[Array, ...] = (x_s,)

        k = 0  # pooling level index
        atts: list[tuple[Array, Array]] = []
        if cfg.remat == "dots":
            # Selective policy: keep every dot/GEMM output resident, replay
            # only the cheap elementwise/BN tails — cuts saved-activation
            # HBM traffic without recomputing any MXU work.
            import jax

            policy = jax.checkpoint_policies.checkpoint_dots
            NEIntCls = nn.remat(
                NodeEdgeInt, static_argnums=(5,), policy=policy
            )
            NEPairCls = nn.remat(
                NEConvPair, static_argnums=(4,), policy=policy
            )
        elif cfg.remat:
            # static_argnums count self: (x_t, x_s, level, deg, det) → 5 /
            # (x_t, x_s, level, det) → 4
            NEIntCls = nn.remat(NodeEdgeInt, static_argnums=(5,))
            NEPairCls = (
                nn.remat(NEConvPair, static_argnums=(4,))
                if cfg.remat is True
                else NEConvPair  # 'msi': conv residuals stay (fused kernel)
            )
        else:
            NEIntCls, NEPairCls = NodeEdgeInt, NEConvPair
        for i, width in enumerate(cfg.filters):
            for j in range(cfg.channels[i]):
                if cfg.msi_per_layer:
                    x_t, x_s = NEIntCls(
                        dv=width, lam=cfg.att_lam, name=f"NEInt{i}{j}"
                    )(pieces_t, pieces_s, level, deg, deterministic)
                    x_t, x_s = NEPairCls(
                        width, cfg.k, cfg.act, cfg.leaky_slope, cfg.dropout,
                        demo_compat=cfg.demo_conv_compat,
                        name=f"NEConv{i}{j}",
                    )(x_t, x_s, level, deterministic)
                else:
                    # poolint3: the conv recurrence needs a materialized
                    # stack (L mixes rows at full width) — concat here, as
                    # the reference does every layer
                    x_t, x_s = NEPairCls(
                        width, cfg.k, cfg.act, cfg.leaky_slope, cfg.dropout,
                        demo_compat=cfg.demo_conv_compat,
                        name=f"NEConv{i}{j}",
                    )(
                        jnp.concatenate(pieces_t, axis=-1),
                        jnp.concatenate(pieces_s, axis=-1),
                        level, deterministic,
                    )
                pieces_t += (x_t,)
                pieces_s += (x_s,)
                snapshots.append((x_t, x_s))
                if cfg.stack_concat == "layer" and len(pieces_t) > 1:
                    pieces_t = (jnp.concatenate(pieces_t, axis=-1),)
                    pieces_s = (jnp.concatenate(pieces_s, axis=-1),)

            if not cfg.msi_per_layer:
                # poolint3: one MSI per block after the convs (reference
                # lib/Hodge_ST_Model.py:737-740)
                x_t, x_s = NEIntCls(dv=width, name=f"NEInt{i}")(
                    pieces_t, pieces_s, level, deg, deterministic
                )
                pieces_t += (x_t,)
                pieces_s += (x_s,)

            if cfg.stack_concat == "block" and len(pieces_t) > 1:
                pieces_t = (jnp.concatenate(pieces_t, axis=-1),)
                pieces_s = (jnp.concatenate(pieces_s, axis=-1),)

            gated_here = i in cfg.att_locs or i in cfg.pool_locs
            if gated_here:
                g_in_t, g_in_s = (
                    (x_t, x_s) if cfg.gate_input == "last"
                    else (pieces_t, pieces_s)
                )
                a_t, a_s = NodeEdgeInt(
                    dk=cfg.att_dk, only_att=True, sigma=cfg.att_sigma,
                    lam=cfg.att_lam, name=f"NEAtt{i}",
                )(g_in_t, g_in_s, level, deg, deterministic=deterministic)
                if cfg.max_normalize_gates:
                    a_t = a_t / jnp.maximum(jnp.max(a_t), 1e-12)
                    a_s = a_s / jnp.maximum(jnp.max(a_s), 1e-12)
                atts.append((a_t, a_s))
                # The gate itself stays f32 (att-L1 losses / return_atts),
                # but the wide multiply runs in the activation dtype — the
                # f32 scale inside the att head otherwise promotes the
                # gated stack to f32 under bf16 compute.  No-op in f32;
                # measured neutral at the pooled-family knee (RESULTS.md
                # round 5 — dtype hygiene, not a throughput lever).
                if cfg.gate_target == "stack":
                    gt = a_t.astype(pieces_t[0].dtype)
                    gs = a_s.astype(pieces_s[0].dtype)
                    pieces_t = tuple(p * gt for p in pieces_t)
                    pieces_s = tuple(p * gs for p in pieces_s)
                else:
                    x_t = x_t * a_t.astype(x_t.dtype)
                    x_s = x_s * a_s.astype(x_s.dtype)

            if i in cfg.pool_locs:
                coarse = batch.levels[k + 1]
                x_t0, x_s0 = sapool_scatter(
                    jnp.concatenate(pieces_t, axis=-1),
                    jnp.concatenate(pieces_s, axis=-1),
                    batch.pools[k], level, coarse,
                )
                pieces_t, pieces_s = (x_t0,), (x_s0,)
                k += 1
                level = coarse
                deg = level.deg + cfg.deg_eps

        return dict(
            x_t=x_t, x_s=x_s,
            # materialized stacks for heads/analysis that want them; unused
            # concats are dead code under jit (the flagship graph head pools
            # only the last-layer features)
            x_t0=jnp.concatenate(pieces_t, axis=-1),
            x_s0=jnp.concatenate(pieces_s, axis=-1),
            level_idx=k, atts=atts,
            # per-layer (x_t, x_s) snapshots for feature-trend analysis
            # (reference lib/Visualization.py:35-122 emits sout/tout)
            snapshots=snapshots,
        )


def make_backbone(cfg: BackboneConfig, name: str = "backbone"):
    """The shared trunk (one place to apply lifted transforms).

    Remat granularity note (measured, benchmarks/RESULTS.md): wrapping the
    WHOLE trunk in one nn.remat — even with a save-only-layer-outputs
    policy — makes memory WORSE (28.5G vs 19G at batch 16k bf16), because
    the single region's backward replays the full forward and then holds
    every recomputed dense-concat stack live at once, i.e. the non-remat
    peak.  Per-layer remat (applied inside `DenseInt3Backbone` when
    ``cfg.remat``) is what shrinks the peak: each layer's backward replays
    only that layer, so at most one layer's internals are live on top of
    the saved stack snapshots.
    """
    return DenseInt3Backbone(cfg, name=name)


def head_cast(cfg: BackboneConfig, *arrays: Array):
    """Cast final backbone features to ``cfg.head_dtype`` (no-op when None).

    Every model family routes its readout inputs through this, so
    ``--head_dtype float32`` means the same thing on graph, node, TSP,
    link-pred, and ABCD heads (round-4 advisor finding: it used to be
    honored only by ``HLHGCNNGraph``)."""
    if cfg.head_dtype is not None:
        hd = jnp.dtype(cfg.head_dtype)
        arrays = tuple(a.astype(hd) for a in arrays)
    return arrays if len(arrays) > 1 else arrays[0]


class MLPHead(nn.Module):
    """Linear→BN→act→dropout stack + output Linear (reference
    lib/Hodge_ST_Model.py:595-605)."""

    mlp_channels: tuple[int, ...]
    num_classes: int
    act: str = "relu"
    leaky_slope: float = 0.1
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: Array, *, deterministic: bool = False, return_latent: bool = False
    ):
        for i, width in enumerate(self.mlp_channels):
            x = TorchLinear(width, name=f"mlp{i}_lin")(x)
            x = MaskedBatchNorm(width, name=f"mlp{i}_bn")(
                x, use_running_average=deterministic
            )
            x = activation(self.act, self.leaky_slope)(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        out = TorchLinear(self.num_classes, name="out")(x).astype(jnp.float32)
        if return_latent:
            return out, x
        return out


class HLHGCNNGraph(nn.Module):
    """Graph-level model: backbone → mean-pool concat [edges ‖ nodes] → MLP.

    Covers zinc pyr/attpool/poolint3, pepfunc pyr/attpool, CIFAR10-SP
    pyr/attpool via `BackboneConfig` (presets.py).  ``embed_sizes`` enables
    the zinc script variant's ``nn.Embedding`` inputs (reference
    main_zinc...py:52-53,120-121 — which reuses the *node* table for edges).
    """

    cfg: BackboneConfig
    mlp_channels: tuple[int, ...] = ()
    num_classes: int = 1
    dropout_mlp: float = 0.0
    embed_num: int = 0  # vocabulary of the shared embedding table (0 = off)
    embed_dim: int = 0

    @nn.compact
    def __call__(
        self,
        batch: ComplexBatch,
        *,
        deterministic: bool = False,
        return_atts: bool = False,
        return_latent: bool = False,
    ):
        x_t, x_s = batch.x_t, batch.x_s
        if self.embed_num:
            table = nn.Embed(self.embed_num, self.embed_dim, name="node_embedding")
            # embed_lookup: gather forward, one-hot-matmul BACKWARD (the
            # autodiff scatter for the table gradient measured 64 us/step;
            # ops/segment.py embed_lookup)
            from hl_hgat_tpu.ops.segment import embed_lookup

            x_t = jnp.concatenate(
                [embed_lookup(table.embedding, x_t[..., 0].astype(jnp.int32)),
                 x_t[..., 1:]], axis=-1
            )
            # reference quirk: edge ids go through the node table too
            x_s = jnp.concatenate(
                [embed_lookup(table.embedding, x_s[..., 0].astype(jnp.int32)),
                 x_s[..., 1:]], axis=-1
            )
            x_t = apply_node_mask(batch.level0, x_t)
            x_s = apply_edge_mask(batch.level0, x_s)
        feats = make_backbone(self.cfg)(
            x_t, x_s, batch, deterministic
        )
        level = batch.levels[feats["level_idx"]]
        f_t, f_s = head_cast(self.cfg, feats["x_t"], feats["x_s"])
        pooled = jnp.concatenate(
            [
                masked_mean_edges(level, f_s, batch.num_graphs),
                masked_mean_nodes(level, f_t, batch.num_graphs),
            ],
            axis=-1,
        )
        out = MLPHead(
            self.mlp_channels, self.num_classes, self.cfg.act,
            self.cfg.leaky_slope, self.dropout_mlp, name="head",
        )(pooled, deterministic=deterministic)
        extras = {}
        if return_atts:
            extras["atts"] = feats["atts"]
        if return_latent:
            extras["latent"] = pooled
        return (out, extras) if extras else out


class HLHGCNNNode(nn.Module):
    """Node-level model for PascalVOC-SP / COCO-SP node classification.

    The reference ships LRGB loaders for these datasets
    (lib/LRGBDataset.py:26-306) but no model; this head extends the family
    with the node-side mirror of the TSP edge model (reference
    lib/Hodge_ST_Model.py:845-852): the readout concatenates the final node
    features with the boundary coupling D⁻¹·|B1|·x_s (the MSI direction of
    reference lib/Hodge_Cheb_Conv.py:100), then applies node-wise K=1
    Laguerre-conv layers; per-node logits are masked by node validity.
    """

    cfg: BackboneConfig
    mlp_channels: tuple[int, ...] = ()
    num_classes: int = 21

    @nn.compact
    def __call__(self, batch: ComplexBatch, *, deterministic: bool = False):
        level = batch.level0
        feats = make_backbone(self.cfg)(
            batch.x_t, batch.x_s, batch, deterministic
        )
        x_t, x_s = head_cast(self.cfg, feats["x_t"], feats["x_s"])
        from hl_hgat_tpu.ops.dispatch import abs_b1_s2t

        deg = level.deg + self.cfg.deg_eps
        s2t = abs_b1_s2t(level, x_s)
        s2t = s2t / jnp.where(deg > 0, deg, 1.0)[..., None].astype(s2t.dtype)
        x_t = jnp.concatenate([x_t, s2t], axis=-1)
        for i, width in enumerate(self.mlp_channels):
            x_t = ConvBNAct(
                width, 1, self.cfg.act, self.cfg.leaky_slope,
                self.cfg.dropout, name=f"mlp{i}",
            )(x_t, level.l0, level.node_mask, deterministic=deterministic)
        logits = LaguerreConv(self.num_classes, 1, name="out")(x_t, level.l0)
        return apply_node_mask(level, logits.astype(jnp.float32))


class HLHGCNNLinkPred(nn.Module):
    """Link-prediction model for PCQM-Contact.

    The reference ships the loader (lib/LRGBDataset.py pcqm-contact branch)
    but no model; this head scores candidate node pairs from the backbone's
    final node features with a bilinear-style MLP on
    [h_u ‖ h_v ‖ h_u⊙h_v].  ``pairs``: [P, 2] int32 node ids (padded rows
    point anywhere and are killed by ``pair_mask``).
    """

    cfg: BackboneConfig
    mlp_channels: tuple[int, ...] = (128,)

    @nn.compact
    def __call__(
        self,
        batch: ComplexBatch,
        pairs: Array | None = None,
        pair_mask: Array | None = None,
        *,
        deterministic: bool = False,
    ):
        if pairs is None:
            # batch-carried pairs (complex/build.py attach_link_pairs) —
            # the Trainer path, which knows only ComplexBatch
            pairs, pair_mask = batch.pairs, batch.pair_mask
        if pairs is None:
            raise ValueError(
                "HLHGCNNLinkPred needs pairs: pass them explicitly or "
                "attach them to the batch (attach_link_pairs)"
            )
        feats = make_backbone(self.cfg)(
            batch.x_t, batch.x_s, batch, deterministic
        )
        h = head_cast(self.cfg, feats["x_t"])
        hu = jnp.take(h, pairs[:, 0].astype(jnp.int32), axis=0)
        hv = jnp.take(h, pairs[:, 1].astype(jnp.int32), axis=0)
        z = jnp.concatenate([hu, hv, hu * hv], axis=-1)
        for i, width in enumerate(self.mlp_channels):
            z = TorchLinear(width, name=f"mlp{i}_lin")(z)
            z = MaskedBatchNorm(width, name=f"mlp{i}_bn")(
                z, pair_mask, use_running_average=deterministic
            )
            z = activation(self.cfg.act, self.cfg.leaky_slope)(z)
        logit = TorchLinear(1, name="out")(z).astype(jnp.float32)[:, 0]
        return logit * pair_mask.astype(jnp.float32)


class HLHGCNNTsp(nn.Module):
    """Edge-level model (reference HL_HGCNN_TSP_dense_int3_pyr,
    lib/Hodge_ST_Model.py:756-852): readout concatenates x_s with
    |B1ᵀ x_t|/2 and applies edge-wise K=1 Laguerre-conv layers; logits are
    multiplied by the augmentation edge mask carried in x_s's last column."""

    cfg: BackboneConfig
    mlp_channels: tuple[int, ...] = ()
    num_classes: int = 1

    @nn.compact
    def __call__(self, batch: ComplexBatch, *, deterministic: bool = False):
        level = batch.level0
        x_s, aug_mask = batch.x_s[..., :-1], batch.x_s[..., -1:]
        feats = make_backbone(self.cfg)(
            batch.x_t, x_s, batch, deterministic
        )
        x_t, x_s = head_cast(self.cfg, feats["x_t"], feats["x_s"])
        # abs AFTER the product (reference lib/Hodge_ST_Model.py:848)
        x_t2s = jnp.abs(b1_t2s(level, x_t)) / 2.0
        x_s = jnp.concatenate([x_s, x_t2s], axis=-1)
        if len(self.mlp_channels) == 1:
            x_s = ConvBNAct(
                self.mlp_channels[0], 1, self.cfg.act, self.cfg.leaky_slope,
                self.cfg.dropout, name="mlp",
            )(x_s, level.l1, level.edge_mask, deterministic=deterministic)
        logits = LaguerreConv(self.num_classes, 1, name="out")(x_s, level.l1)
        return logits.astype(jnp.float32) * aug_mask
