"""Analysis & observability: visualization data extraction, profiling,
structured logging (reference L5, lib/Visualization.py + DEMO notebook)."""

from hl_hgat_tpu.utils.viz import (
    attention_fc_matrix,
    collect_outputs,
    edge_index_from_level,
    feature_trends,
    sort_by_parcels,
)
from hl_hgat_tpu.utils.profiling import StepTimer, trace_context

__all__ = [
    "collect_outputs",
    "feature_trends",
    "attention_fc_matrix",
    "sort_by_parcels",
    "edge_index_from_level",
    "StepTimer",
    "trace_context",
]
