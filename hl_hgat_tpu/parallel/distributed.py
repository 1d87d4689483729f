"""Multi-host initialization and cross-host mesh construction.

On a pod slice every host runs the same program; ``init_distributed`` wires
``jax.distributed`` (coordinator discovery from env or args) and
``make_multihost_mesh`` lays the ('data', 'graph') axes so the graph axis
stays inside one host's ICI domain while data parallelism spans hosts over
DCN — the layout that keeps halo ppermutes on ICI (SURVEY.md §5).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op in single-process runs)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def make_multihost_mesh(graph: int = 1) -> Mesh:
    """('data', 'graph') mesh over all global devices.

    Devices are ordered host-major, so a graph axis that divides the local
    device count keeps each graph-parallel group within one host's ICI.
    """
    devices = np.asarray(jax.devices())
    local = jax.local_device_count()
    if graph > local or local % graph != 0:
        raise ValueError(
            f"graph axis {graph} must divide local device count {local} to "
            f"stay on ICI"
        )
    data = devices.size // graph
    return Mesh(devices.reshape(data, graph), axis_names=("data", "graph"))


def process_local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(start, size) of this host's shard of a global batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch_size // n
    return i * per, per
