"""Device mesh helpers.

One mesh, two axes: ``data`` (batch DP — gradients ride ICI allreduce) and
``graph`` (simplex partitioning of one large complex).  XLA compiles every
collective; there is no hand-written transport (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int | None = None, graph: int = 1, *, devices=None
) -> Mesh:
    """Build a ('data', 'graph') mesh.  ``data=None`` uses all devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if data is None:
        data = len(devices) // graph
    n = data * graph
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{graph} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))
