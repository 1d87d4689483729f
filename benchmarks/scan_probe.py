"""Attempt (b) of VERDICT r3 item 4: does scanning over layer repeats with
stacked weights beat the unrolled chain?

The flagship step executes ~6.3k device ops; the hypothesis to test is
that rolling the per-block ``channels`` repeats into one ``lax.scan`` body
(weights stacked on a leading axis) cuts per-op overhead.  On TPU a scan
body is compiled once and EXECUTED per iteration — the device runs the
same op sequence either way — so the expected effect is compile-time, not
run-time; this probe measures both.

Chain under test (flagship-like shapes, fwd+bwd+param-grads): L repeats of
  y = relu(x @ W_l + b_l);  x = x + y @ P_l   (keeps width constant so the
  scan is exact — the real DenseNet grows width per layer, which a scan
  would have to zero-pad; if even the EQUAL-width scan shows no run-time
  win, padding can only make it worse)

    python benchmarks/scan_probe.py [--l 8 --g 72 --s 128 --c 576 --f 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(os.environ.get("BENCH_STEPS", "100"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=8)
    ap.add_argument("--g", type=int, default=72)
    ap.add_argument("--s", type=int, default=128)
    ap.add_argument("--c", type=int, default=576)
    ap.add_argument("--f", type=int, default=128)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x0 = jnp.asarray(rng.standard_normal((args.g, args.s, args.c)), dt)
    ws = jnp.asarray(
        rng.standard_normal((args.l, args.c, args.f)) * 0.05, jnp.float32)
    bs = jnp.zeros((args.l, args.f), jnp.float32)
    ps = jnp.asarray(
        rng.standard_normal((args.l, args.f, args.c)) * 0.05, jnp.float32)

    def layer(x, w, b, p):
        y = jnp.einsum("gsc,cf->gsf", x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        y = jax.nn.relu(y + b).astype(x.dtype)
        return x + jnp.einsum("gsf,fc->gsc", y, p.astype(x.dtype),
                              preferred_element_type=jnp.float32).astype(x.dtype)

    def chain_unrolled(x, ws, bs, ps):
        for i in range(args.l):
            x = layer(x, ws[i], bs[i], ps[i])
        return x

    def chain_scanned(x, ws, bs, ps):
        def body(x, wbp):
            w, b, p = wbp
            return layer(x, w, b, p), None

        x, _ = jax.lax.scan(body, x, (ws, bs, ps))
        return x

    results = {}
    outs_ref = None
    for name, chain in (("unrolled", chain_unrolled),
                        ("scanned", chain_scanned)):
        def loss(x, ws, bs, ps, chain=chain):
            return jnp.sum(chain(x, ws, bs, ps).astype(jnp.float32) ** 2)

        grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3))

        @jax.jit
        def multi(x, ws, bs, ps):
            def body(carry, _):
                x, ws, bs, ps = carry
                dx, dw, db, dp = grad_fn(x, ws, bs, ps)
                return (x + dx.astype(x.dtype) * 1e-9,
                        ws + dw * 1e-9, bs + db * 1e-9, ps + dp * 1e-9), dw[0, 0, 0]

            carry, outs = jax.lax.scan(
                body, (x, ws, bs, ps), None, length=STEPS)
            return carry, outs

        t0 = time.time()
        carry, outs = multi(x0, ws, bs, ps)
        last = np.asarray(outs)[-1]
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            carry, outs = multi(x0, ws, bs, ps)
            _ = np.asarray(outs)[-1]
            times.append(time.time() - t0)
        us = min(times) / STEPS * 1e6
        results[name] = dict(us_per_step=round(us, 1),
                             compile_s=round(compile_s, 1))
        if outs_ref is None:
            outs_ref = last
        else:
            np.testing.assert_allclose(last, outs_ref, rtol=1e-3, atol=1e-5)

    print(json.dumps(dict(
        metric="scan_vs_unrolled_us", shapes=vars(args), steps=STEPS,
        backend=jax.default_backend(), **results)), flush=True)


if __name__ == "__main__":
    main()
