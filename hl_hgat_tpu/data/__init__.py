"""Dataset pipelines: synthetic generators (tests/benchmarks) plus the
benchmark preprocessing pipelines mirroring the reference Dataset classes
(reference lib/Hodge_Dataset.py §2.3) and the vendored LRGB loader."""

from hl_hgat_tpu.data.synthetic import (
    random_simplex_sample,
    synthetic_brain_batch,
    synthetic_tsp_batch,
    synthetic_zinc_batch,
)

__all__ = [
    "random_simplex_sample",
    "synthetic_zinc_batch",
    "synthetic_tsp_batch",
    "synthetic_brain_batch",
]
