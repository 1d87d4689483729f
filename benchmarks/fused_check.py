"""On-device correctness check of the fused Laguerre kernel.

tests/ run the kernel in interpret mode on CPU; this script compares the
REAL Mosaic-compiled kernel against the XLA path on the TPU — values and
gradients, f32 and bf16, tiled and untiled C.

    python benchmarks/fused_check.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.nn.conv import laguerre_matvec
from hl_hgat_tpu.ops.pallas_hodge import laguerre_dense_fused


def check(g, s, c, f, k, dtype, rtol, atol):
    rng = np.random.default_rng(0)
    l = rng.standard_normal((g, s, s)).astype(np.float32)
    l = (l + l.transpose(0, 2, 1)) / np.sqrt(s)
    x = jnp.asarray(rng.standard_normal((g, s, c)), dtype)
    w = jnp.asarray(rng.standard_normal((k, c, f)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(f), jnp.float32)
    l = jnp.asarray(l)

    # the fused kernel runs f32 dots at HIGHEST precision; the XLA path
    # defaults to the MXU's bf16x3 decomposition (comparable to A100 TF32
    # defaults) — match precision for the comparison
    with jax.default_matmul_precision("highest"):
        out_f = jax.jit(laguerre_dense_fused)(l, x, w, b)
        out_x = jax.jit(laguerre_matvec)(x, l, w, b)
    a = np.asarray(out_f, np.float32)
    e = np.asarray(out_x, np.float32)
    scale = np.abs(e).max() + 1e-6  # compare relative to the output scale
    np.testing.assert_allclose(a / scale, e / scale, rtol=rtol, atol=atol)

    def loss_f(x, w):
        return jnp.sum(laguerre_dense_fused(l, x, w, b) ** 2)

    def loss_x(x, w):
        return jnp.sum(laguerre_matvec(x, l, w, b) ** 2)

    with jax.default_matmul_precision("highest"):
        gf = jax.jit(jax.grad(loss_f, argnums=(0, 1)))(x, w)
        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(x, w)
    for a, e, name in zip(gf, gx, ("dx", "dw")):
        a = np.asarray(a, np.float32)
        e = np.asarray(e, np.float32)
        # grads of sum(out^2) reach 1e7 magnitudes with cancellation; judge
        # them relative to the tensor scale, not elementwise
        scale = np.abs(e).max() + 1e-6
        np.testing.assert_allclose(
            a / scale, e / scale, rtol=10 * rtol, atol=10 * atol,
            err_msg=name,
        )
    print(f"OK g={g} s={s} c={c} f={f} k={k} {dtype}", flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    check(8, 128, 192, 64, 6, jnp.float32, 2e-4, 2e-4)
    check(8, 128, 192, 64, 6, jnp.bfloat16, 0.1, 0.1)
    check(4, 128, 600, 32, 3, jnp.float32, 2e-3, 2e-3)  # c-tiled (600 > 512)
    print("all on-device fused checks passed", flush=True)


if __name__ == "__main__":
    main()
