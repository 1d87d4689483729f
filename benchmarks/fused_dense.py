"""Microbench: fused Pallas dense-Laguerre kernel vs the XLA dense path.

Shapes mirror the flagship ZINC model on the PACKED superblock layout
(complex/dense.py collate_dense_packed): S = 128-row tiles, C sweeping the
dense-concat stack widths, F the conv output width, K = 6.

Usage:  python benchmarks/fused_dense.py [dtype]   (float32 | bfloat16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.nn.conv import laguerre_matvec
from hl_hgat_tpu.ops.pallas_hodge import laguerre_dense_fused

STEPS = 20


def timed(fn, *args):
    # block_until_ready is a no-op on the tunneled backend; a host readback
    # is the only reliable barrier (benchmarks/sync_probe.py)
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(3):
        out = fn(*args)
        np.asarray(out)
    return (time.time() - t0) / 3


def main():
    dtype = jnp.dtype(sys.argv[1] if len(sys.argv) > 1 else "float32")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    rng = np.random.default_rng(0)
    g, s, k, f = 2048, 128, 6, 256
    print(f"backend={jax.default_backend()} dtype={dtype} G={g} S={s} K={k} F={f}")
    for c in (192, 576, 1344):
        l = rng.standard_normal((g, s, s)).astype(np.float32)
        l = (l + l.transpose(0, 2, 1)) / np.sqrt(s)
        x = jnp.asarray(rng.standard_normal((g, s, c)), dtype)
        w = jnp.asarray(rng.standard_normal((k, c, f)) * 0.02, jnp.float32)
        b = jnp.asarray(rng.standard_normal(f), jnp.float32)
        l = jnp.asarray(l)

        # lax.scan inside one jit call amortizes the ~30 ms tunnel RTT
        def fwd_loop(fn):
            def run(x, w):
                def body(acc, _):
                    return acc + jnp.sum(fn(x, w)), None

                return jax.lax.scan(body, 0.0, None, length=STEPS)[0]

            return jax.jit(run)

        def grad_loop(fn):
            def loss(x, w):
                return jnp.sum(fn(x, w) ** 2)

            gr = jax.grad(loss, argnums=(0, 1))

            def run(x, w):
                def body(acc, _):
                    dx, dw = gr(x, w)
                    return (
                        acc + jnp.sum(dx).astype(jnp.float32) + jnp.sum(dw),
                        None,
                    )

                return jax.lax.scan(body, jnp.zeros(()), None,
                                    length=STEPS)[0]

            return jax.jit(run)

        fused = lambda x, w: laguerre_dense_fused(l, x, w, b)  # noqa: E731
        xla = lambda x, w: laguerre_matvec(x, l, w, b)  # noqa: E731

        for name, fn in (("fused", fused), ("xla", xla)):
            tf = timed(fwd_loop(fn), x, w) / STEPS
            tg = timed(grad_loop(fn), x, w) / STEPS
            flops = 2 * g * s * (s * c * (k - 1) + k * c * f)
            print(
                f"C={c:5d} {name:5s} fwd {tf*1e3:7.2f} ms"
                f" ({flops/tf/1e12:6.1f} TF/s)   fwd+bwd {tg*1e3:7.2f} ms"
            )


if __name__ == "__main__":
    main()
