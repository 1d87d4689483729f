"""Measured roofline for the flagship training step (VERDICT r1 item 4).

Round 1 argued "memory-bound" from XLA cost analysis alone; its
bytes-accessed counter overcounts fused reads, so the claim needed
measurement.  This script produces the three numbers that settle it, all
with the host-readback barrier (block_until_ready is a no-op on the
tunneled backend — benchmarks/sync_probe.py):

1. **Achievable HBM bandwidth** on this chip: a streaming x = x + 1 carry
   over a large array inside one lax.scan (reads + writes N elements per
   step, nothing to fuse away).  v5e datasheet peak is 819 GB/s.
2. **Achievable MXU throughput**: bf16 square matmul chain (carry feeds the
   next step so XLA cannot hoist it).  v5e datasheet peak is 197 TFLOP/s.
3. **The flagship step** (same model/batch/recipe as bench.py packed): wall
   time per step, exact FLOPs from compiled cost analysis (FLOP counts are
   exact, unlike bytes), and two bandwidth estimates that bracket the
   truth:
     - upper bound: XLA bytes_accessed / step-time (overcounts fusion),
     - lower bound: unique bytes = every distinct HLO buffer argument +
       output counted ONCE (undercounts re-reads of spilled operands).
   MXU duty = flops / (time x measured peak).  If the lower-bound implied
   bandwidth is already a large fraction of the MEASURED stream bandwidth,
   the step is at the memory wall and further traffic cuts are the only
   lever; if both bounds sit well under it, scheduling/occupancy is the
   lever instead.

    python benchmarks/roofline.py            # all three parts
    python benchmarks/roofline.py micro      # just the peaks
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    return float(np.asarray(x).reshape(-1)[0])


def _time_best(fn, *args, calls: int = 3) -> float:
    out = fn(*args)  # warm / compile
    _sync(out[0] if isinstance(out, tuple) else out)
    best = float("inf")
    for _ in range(calls):
        t0 = time.time()
        out = fn(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        best = min(best, time.time() - t0)
    return best


def measure_hbm_bw(n_elems: int = 1 << 27, steps: int = 64) -> dict:
    """Streaming read+write bandwidth, f32 (1 GiB traffic per step)."""

    @jax.jit
    def stream(x):
        def body(c, _):
            return c + 1.0, ()

        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c[:8]  # tiny readback: the tunnel moves ~27 MB/s, so the
        # sync slice must not scale with the array

    x = jnp.zeros((n_elems,), jnp.float32)
    best = _time_best(stream, x)
    traffic = 2 * 4 * n_elems * steps  # read + write, 4 B
    return dict(
        stream_gb_s=round(traffic / best / 1e9, 1),
        stream_s=round(best, 4),
        n_elems=n_elems,
        steps=steps,
    )


def measure_mxu(dim: int = 8192, steps: int = 32) -> dict:
    """bf16 matmul chain; carry feeds forward so nothing hoists."""

    @jax.jit
    def chain(a, b):
        def body(c, _):
            c2 = jax.lax.dot(a, c, precision=None,
                             preferred_element_type=jnp.bfloat16)
            # keep magnitudes bounded without a second full pass: scale by
            # a scalar from the result (broadcast multiply fuses into the
            # matmul epilogue)
            s = jax.lax.rsqrt(jnp.float32(c2[0, 0]) ** 2 + 1.0)
            return (c2 * s.astype(jnp.bfloat16)), ()

        c, _ = jax.lax.scan(body, b, None, length=steps)
        return c[0, :8]  # tiny readback (see measure_hbm_bw)

    a = jnp.asarray(
        np.random.default_rng(0).standard_normal((dim, dim)) / np.sqrt(dim),
        jnp.bfloat16,
    )
    b = jnp.asarray(
        np.random.default_rng(1).standard_normal((dim, dim)) / np.sqrt(dim),
        jnp.bfloat16,
    )
    best = _time_best(chain, a, b)
    flops = 2.0 * dim**3 * steps
    return dict(
        mxu_tflop_s=round(flops / best / 1e12, 1),
        mxu_s=round(best, 4),
        dim=dim,
        steps=steps,
    )


def flagship_step(batch_graphs: int = 320, scan_steps: int = 200) -> dict:
    """Same recipe as `python bench.py` (packed, bf16, no remat, merged
    MSI, stack='block'); reuses its cached batch when present."""
    import dataclasses as _dc

    from hl_hgat_tpu.complex.dense import collate_dense_packed
    from hl_hgat_tpu.data.synthetic import random_simplex_sample
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    cache = f"/tmp/hlhgat_bench_packed_{batch_graphs}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            batch = pickle.load(fh)
    else:
        rng = np.random.default_rng(0)
        samples = []
        for _ in range(batch_graphs):
            n = int(rng.integers(15, 33))
            s = random_simplex_sample(
                rng, n_nodes=n, extra_edges=int(rng.integers(2, 6)),
                node_feat=1, edge_feat=1, keig=16,
            )
            s.x_t[:, 0] = rng.integers(0, 28, s.x_t.shape[0])
            s.x_s[:, 0] = rng.integers(0, 4, s.x_s.shape[0])
            samples.append(s)
        batch = collate_dense_packed(samples, node_cap=128, edge_cap=128)
        with open(cache, "wb") as fh:
            pickle.dump(batch, fh)
    batch = jax.tree.map(jnp.asarray, batch)
    real_edges = int(np.asarray(batch.levels[0].edge_mask).sum())

    model, _ = presets.zinc_pyr(compute_dtype="bfloat16", remat=False)
    model = _dc.replace(
        model, cfg=_dc.replace(model.cfg, stack_concat="block")
    )
    tr = Trainer(model, TrainerConfig(task="regression", lr=1e-3,
                                      weight_decay=1e-3))
    state = tr.init_state(batch)

    def multi(state, batch):
        def body(s, _):
            s, loss = tr._train_step_impl(s, batch)
            return s, loss

        return jax.lax.scan(body, state, None, length=scan_steps)

    jitted = jax.jit(multi)
    lowered = jitted.lower(state, batch)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_xla = float(cost.get("bytes accessed", 0.0))
    # unique-buffer lower bound: every jit argument + output counted once
    # per scan step (params/opt-state re-read each step; batch re-read each
    # step; activations are intra-step traffic NOT counted here — that is
    # what makes this a lower bound)
    def _nbytes(s):
        try:
            return int(np.prod(s.shape)) * np.dtype(s.dtype).itemsize
        except TypeError:  # extended dtypes (PRNG keys): negligible
            return 0

    arg_bytes = sum(
        _nbytes(s) for s in jax.tree.leaves((state, batch))
        if hasattr(s, "shape")
    )
    best = _time_best(lambda s, b: jitted(s, b)[1], state, batch)
    step_s = best / scan_steps
    return dict(
        step_s=round(step_s, 5),
        edges_per_sec=round(real_edges / step_s, 1),
        flops_per_step=flops / scan_steps,
        bytes_xla_per_step=bytes_xla / scan_steps,
        unique_arg_bytes=float(arg_bytes),
        implied_bw_upper_gb_s=round(bytes_xla / scan_steps / step_s / 1e9, 1),
        implied_bw_lower_gb_s=round(float(arg_bytes) / step_s / 1e9, 1),
        tflop_s=round(flops / scan_steps / step_s / 1e12, 2),
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    out = dict(backend=jax.default_backend())
    if which in ("all", "micro"):
        out["hbm"] = measure_hbm_bw()
        print(json.dumps(dict(hbm=out["hbm"])), flush=True)
        out["mxu"] = measure_mxu()
        print(json.dumps(dict(mxu=out["mxu"])), flush=True)
    if which in ("all", "step"):
        out["step"] = flagship_step()
        print(json.dumps(dict(step=out["step"])), flush=True)
    if "hbm" in out and "step" in out:
        s, h, m = out["step"], out["hbm"], out["mxu"]
        out["verdict"] = dict(
            mxu_duty_pct=round(
                100 * s["tflop_s"] / max(m["mxu_tflop_s"], 1e-9), 1
            ),
            bw_upper_pct_of_stream=round(
                100 * s["implied_bw_upper_gb_s"] / h["stream_gb_s"], 1
            ),
            bw_lower_pct_of_stream=round(
                100 * s["implied_bw_lower_gb_s"] / h["stream_gb_s"], 1
            ),
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
