"""Model families (the reference's L3, lib/Hodge_ST_Model.py + script-local
variants) built on one configurable backbone.

All reference models share the dense-int3 template (SURVEY.md §2.5); their
differences — activation, attention placement, which tensor is gated, degree
epsilon, pooling — are load-bearing quirks captured in `BackboneConfig`.

presets.py maps each reference class name to its exact configuration.
"""

from hl_hgat_tpu.models.backbone import (
    BackboneConfig,
    DenseInt3Backbone,
    HLHGCNNGraph,
    HLHGCNNLinkPred,
    HLHGCNNNode,
    HLHGCNNTsp,
)
from hl_hgat_tpu.models.abcd import HLHGCNNAbcd
from hl_hgat_tpu.models.hgat import HLHGATAttpool
from hl_hgat_tpu.models import presets

__all__ = [
    "BackboneConfig",
    "DenseInt3Backbone",
    "HLHGCNNGraph",
    "HLHGCNNNode",
    "HLHGCNNLinkPred",
    "HLHGCNNTsp",
    "HLHGCNNAbcd",
    "HLHGATAttpool",
    "presets",
]
