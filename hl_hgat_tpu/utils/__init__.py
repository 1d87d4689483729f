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
from hl_hgat_tpu.utils.torch_import import (
    import_hgat_attpool,
    infer_hgat_config,
    load_torch_state_dict,
)

__all__ = [
    "import_hgat_attpool",
    "infer_hgat_config",
    "load_torch_state_dict",
    "collect_outputs",
    "feature_trends",
    "attention_fc_matrix",
    "sort_by_parcels",
    "edge_index_from_level",
    "StepTimer",
    "trace_context",
]
