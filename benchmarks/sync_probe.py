"""Probe: does jax.block_until_ready actually synchronize on this backend?

Times a scan-of-train-steps three ways:
  A. block_until_ready(losses)            (the bench.py pattern)
  B. np.asarray(losses)                   (host transfer — must be a sync)
  C. float(losses[-1])                    (scalar readback)

If A ≪ B the backend's block_until_ready is a no-op for remote arrays and
every throughput number measured with pattern A is dispatch-rate, not
compute.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    print("backend:", jax.default_backend())

    # a compute-heavy scan: 100 matmul-chain steps on [2048, 2048]
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2048, 2048)),
                    jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def heavy(x, steps):
        def body(c, _):
            c = jnp.tanh(c @ x / 50.0)
            return c, jnp.sum(c)

        return jax.lax.scan(body, x, None, length=steps)[1]

    for steps in (10, 100):
        fn = lambda: heavy(x, steps)  # noqa: E731
        out = fn()
        jax.block_until_ready(out)  # warmup/compile
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        ta = time.time() - t0
        t0 = time.time()
        _ = np.asarray(out)
        tb = time.time() - t0
        t0 = time.time()
        out2 = fn()
        _ = np.asarray(out2)
        tc = time.time() - t0
        print(
            f"steps={steps:4d}  A block_until_ready={ta*1e3:8.1f} ms   "
            f"B np.asarray(after A)={tb*1e3:8.1f} ms   "
            f"C dispatch+asarray={tc*1e3:8.1f} ms"
        )
    # expected per-step cost: 2*2048^3 = 17.2 GFLOP → ~0.1 ms/step at 197 TF/s


if __name__ == "__main__":
    main()
