"""Worker process for the multi-host rehearsal test (tests/test_multihost.py).

Two copies of this script run as separate OS processes, each with 2 virtual
CPU devices (XLA_FLAGS set by the parent), wired together through
``jax.distributed`` exactly as two pod hosts would be:

    python scripts/multihost_worker.py <coordinator_port> <process_id>

It exercises, across the REAL process boundary:
  1. ``init_distributed`` + ``make_multihost_mesh`` (parallel/distributed.py)
  2. a cross-process psum collective
  3. a halo-exchange SpMM whose graph axis spans both processes
     (parallel/graph_parallel.py) checked against the dense oracle
  4. one data-parallel train step (parallel/data_parallel.py) — grads
     pmean'd over DCN — checked finite and identical on both processes

Prints ``MULTIHOST_OK <summary>`` on success; any assertion kills the
process with a non-zero exit the test will catch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])

    from hl_hgat_tpu.parallel.distributed import (
        init_distributed,
        make_multihost_mesh,
        process_local_batch_slice,
    )

    init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert jax.local_device_count() == 2

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    # --- 1/2: standard mesh + cross-process psum -------------------------
    mesh = make_multihost_mesh(graph=2)
    assert mesh.devices.shape == (2, 2)

    def total(x):
        return jax.lax.psum(jnp.sum(x), ("data", "graph"))

    sharding = NamedSharding(mesh, P("data", "graph"))
    garr = jax.make_array_from_callback(
        (2, 2), sharding, lambda idx: np.ones((1, 1), np.float32)
    )
    tot = jax.jit(
        jax.shard_map(total, mesh=mesh, in_specs=P("data", "graph"),
                      out_specs=P()),
    )(garr)
    assert float(np.asarray(tot)) == 4.0, tot

    start, size = process_local_batch_slice(8)
    assert size == 4 and start == pid * 4

    # --- 3: halo-exchange SpMM spanning the process boundary -------------
    from hl_hgat_tpu.parallel.graph_parallel import (
        halo_spmm,
        partition_halo,
    )

    span = Mesh(np.asarray(jax.devices()).reshape(1, 4), ("data", "graph"))
    rng = np.random.default_rng(0)  # same on both processes
    n, f, nnz = 64, 5, 400
    rows = rng.integers(0, n, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    shard, x_blocks = partition_halo(rows, cols, vals, n, 4, x=x)

    def put(arr, spec):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(span, spec),
            lambda idx: arr[idx],
        )

    import dataclasses

    shard = dataclasses.replace(
        shard,
        rows=put(shard.rows, P("graph")),
        cols=put(shard.cols, P("graph")),
        vals=put(shard.vals, P("graph")),
        send_idx=put(shard.send_idx, P("graph")),
        send_mask=put(shard.send_mask, P("graph")),
        mesh=span,
    )
    xb = put(x_blocks, P("graph"))
    out = halo_spmm(shard, xb, span)
    out_local = np.asarray(
        jax.experimental.multihost_utils.process_allgather(out, tiled=True)
    ).reshape(-1, f)[:n]
    dense = np.zeros((n, n), np.float64)
    np.add.at(dense, (rows, cols), vals.astype(np.float64))
    np.testing.assert_allclose(out_local, dense @ x, rtol=1e-4, atol=1e-4)

    # --- 4: one data-parallel train step over both processes -------------
    from hl_hgat_tpu.complex.build import collate
    from hl_hgat_tpu.data.synthetic import random_simplex_sample
    from hl_hgat_tpu.models import BackboneConfig, HLHGCNNGraph
    from hl_hgat_tpu.parallel.data_parallel import (
        make_dp_train_step,
        stack_batches,
    )
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    from hl_hgat_tpu.complex.build import LevelPad, pad_spec

    data_mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
    rng = np.random.default_rng(1)
    groups = []
    for _ in range(4):  # one per global device, identical on both hosts
        groups.append([
            random_simplex_sample(rng, n_nodes=12, extra_edges=3,
                                  node_feat=4, edge_feat=3, keig=0)
            for _ in range(2)
        ])
    # shared pad spec so the stacked sub-batches have equal static shapes
    specs = [pad_spec(g, multiple=8) for g in groups]
    pads = [
        LevelPad(
            nodes=max(s[lv].nodes for s in specs),
            edges=max(s[lv].edges for s in specs),
            nnz0=max(s[lv].nnz0 for s in specs),
            nnz1=max(s[lv].nnz1 for s in specs),
        )
        for lv in range(len(specs[0]))
    ]
    batches = [collate(g, pads=pads) for g in groups]
    stacked = stack_batches(batches)

    def put_data(arr):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(data_mesh, P("data")),
            lambda idx: arr[idx],
        )

    gbatch = jax.tree.map(put_data, stacked)

    model = HLHGCNNGraph(
        cfg=BackboneConfig(channels=(1,), filters=(8,), k=2, init_k=2),
        num_classes=1,
    )
    trainer = Trainer(model, TrainerConfig(task="regression", lr=1e-3))
    state = trainer.init_state(batches[0])

    # replicate_state()'s device_put cannot target non-addressable devices
    # in a multi-controller run; rebuild each (identical-per-process) leaf
    # as a fully-replicated global array instead
    def replicate(a):
        if hasattr(a, "dtype") and jnp.issubdtype(
            a.dtype, jax.dtypes.prng_key
        ):
            return jax.random.wrap_key_data(replicate(jax.random.key_data(a)))
        arr = np.asarray(a)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(data_mesh, P()), lambda idx: arr[idx]
        )

    state = jax.tree.map(replicate, state)
    step = make_dp_train_step(
        model, trainer.tx, lambda out, b: trainer._loss_fn(out, b), data_mesh
    )
    state, loss = step(state, gbatch)
    loss = float(np.asarray(loss))
    assert np.isfinite(loss), loss
    losses = np.asarray(
        jax.experimental.multihost_utils.process_allgather(
            jnp.asarray([loss]), tiled=True
        )
    )
    assert np.allclose(losses, losses[0]), losses

    # --- shared-skeleton (brain-family) DP step across the process
    # boundary: broadcast [1, S, S] operators, per-subject features ---
    from hl_hgat_tpu.complex.build import build_structure
    from hl_hgat_tpu.complex.coarsen import build_pyramid
    from hl_hgat_tpu.complex.dense import collate_dense_shared
    from hl_hgat_tpu.data.datasets import brain_sample

    nsh = 12
    sh_src = np.arange(nsh - 1).astype(np.int32)
    sh_dst = np.arange(1, nsh).astype(np.int32)
    sh_levels, sh_pools = build_pyramid(
        [build_structure(sh_src, sh_dst, nsh)], 0)
    sh_batches = [
        collate_dense_shared(
            [brain_sample(rng.standard_normal((nsh, 8)), sh_src, sh_dst,
                          sh_levels, sh_pools, y=95.0 + g + i)
             for i in range(2)],
            multiple=1,
        )
        for g in range(4)
    ]
    sh_global = jax.tree.map(put_data, stack_batches(sh_batches))
    sh_state = jax.tree.map(replicate, trainer.init_state(sh_batches[0]))
    sh_state, sh_loss = step(sh_state, sh_global)
    sh_loss = float(np.asarray(sh_loss))
    assert np.isfinite(sh_loss), sh_loss

    print(f"MULTIHOST_OK pid={pid} psum=4.0 halo=ok dp_loss={loss:.5f} "
          f"shared_loss={sh_loss:.5f}",
          flush=True)


if __name__ == "__main__":
    import jax.experimental.multihost_utils  # noqa: F401  (import check)

    main()
