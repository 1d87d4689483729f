"""Microbenchmark: Pallas ELL SpMM vs XLA scatter SpMM on one TPU chip.

Regime: one large sparse complex (single graph, graph-parallel per-shard
sizes) — the case the ELL path targets (``ops.dispatch.lap_matvec`` routes
there when a CooMatrix carries ELL arrays and the operand fits VMEM).

Run:  python benchmarks/spmm_ell.py [N] [F]
Prints a JSON line per variant: {variant, fwd_us, fwdbwd_us, gflops_fwd}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 100  # scan length inside one jit call (tunnel RTT ~30 ms/dispatch)


def time_call(fn, *args):
    # host readback as the barrier: block_until_ready is a no-op on the
    # tunneled backend (benchmarks/sync_probe.py)
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.time() - t0)
    return best / REPS


def main() -> None:
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    from hl_hgat_tpu.complex.build import coo_to_ell, hodge_laplacians_coo
    from hl_hgat_tpu.data.synthetic import _random_connected
    from hl_hgat_tpu.ops.pallas_spmm import spmm_ell_symmetric
    from hl_hgat_tpu.ops.spmm import spmm_coo

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rng = np.random.default_rng(0)
    src, dst = _random_connected(rng, n, 3 * n)
    src, dst = src.astype(np.int32), dst.astype(np.int32)
    (rows, cols, vals), _, _ = hodge_laplacians_coo(src, dst, n)
    nnz = rows.shape[0]
    ell_cols, ell_vals = coo_to_ell(rows, cols, vals, n)
    w = ell_cols.shape[1]
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    rows, cols, vals = map(jnp.asarray, (rows, cols, vals))
    ell_cols, ell_vals = jnp.asarray(ell_cols), jnp.asarray(ell_vals)
    print(json.dumps(dict(n=n, f=f, nnz=int(nnz), ell_width=int(w),
                          backend=jax.default_backend())))

    def scan_fwd(matvec):
        @jax.jit
        def run(x):
            def body(c, _):
                return matvec(c), None
            out, _ = jax.lax.scan(body, x, None, length=REPS)
            return jnp.sum(out)  # scalar readback = cheap sync barrier
        return run

    def scan_fwdbwd(matvec):
        @jax.jit
        def run(x):
            def body(c, _):
                g = jax.grad(lambda xx: jnp.sum(matvec(xx) ** 2))(c)
                return g / jnp.maximum(jnp.linalg.norm(g), 1e-6), None
            out, _ = jax.lax.scan(body, x, None, length=REPS)
            return jnp.sum(out)  # scalar readback = cheap sync barrier
        return run

    variants = {
        "xla_coo": lambda xx: spmm_coo(rows, cols, vals, xx, n),
        "pallas_ell": lambda xx: spmm_ell_symmetric(ell_cols, ell_vals, xx),
    }
    flops = 2.0 * nnz * f
    for name, mv in variants.items():
        # correctness first
        np.testing.assert_allclose(
            np.asarray(mv(x)),
            np.asarray(spmm_coo(rows, cols, vals, x, n)),
            rtol=2e-4, atol=2e-4,
        )
        t_fwd = time_call(scan_fwd(mv), x)
        t_bwd = time_call(scan_fwdbwd(mv), x)
        print(json.dumps(dict(
            variant=name,
            fwd_us=round(t_fwd * 1e6, 1),
            fwdbwd_us=round(t_bwd * 1e6, 1),
            gflops_fwd=round(flops / t_fwd / 1e9, 1),
        )))


if __name__ == "__main__":
    main()
