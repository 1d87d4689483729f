"""Dataset pipelines: synthetic generators (tests/benchmarks), the
benchmark preprocessing pipelines mirroring the reference Dataset classes
(reference lib/Hodge_Dataset.py §2.3), the vendored LRGB loader, and the
raw-data/npz-cache ingestion used by the CLI (`--data_root`)."""

from hl_hgat_tpu.data.ingest import load_samples
from hl_hgat_tpu.data.loader import BucketedLoader
from hl_hgat_tpu.data.synthetic import (
    random_simplex_sample,
    synthetic_brain_batch,
    synthetic_tsp_batch,
    synthetic_zinc_batch,
)

__all__ = [
    "BucketedLoader",
    "load_samples",
    "random_simplex_sample",
    "synthetic_zinc_batch",
    "synthetic_tsp_batch",
    "synthetic_brain_batch",
]
