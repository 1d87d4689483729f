"""Isolate the DenseNet-stack GEMM fwd+bwd and measure transpose behaviour.

Round-2 trace finding (benchmarks/RESULTS.md): the top single ops in the
flagship step are [72,128,576] stack transposes ({2,1,0}<->{1,2,0},
~28-34 us each) around every stack GEMM — the forward contracts the
channel axis while the dW backward contracts the row axes, so XLA
materializes the stack in both orientations.  Round 2 declared this
"inherent to autodiff"; VERDICT r3 item 4 demands that claim be tested.

This probe runs the isolated computation  y = x @ W,  loss = sum(y*g)
(so dx and dW both flow) at the real shapes under several formulations:

  einsum3d   jnp.einsum("gsc,cf->gsf")               (the current form)
  flat2d     reshape [G*S, C] -> dot -> reshape back (transpose-folding
             opportunity for XLA's 2-D dot)
  vjp_swap   custom VJP computing dW as (g2.T @ x2).T — transposes the
             SMALL [F, C] result instead of the big stack operand
  vjp_both   custom VJP: dW via swap AND dx via dot_general with
             dimension numbers that contract f directly

Run:  python benchmarks/transpose_probe.py [--g 72 --s 128 --c 576 --f 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(os.environ.get("BENCH_STEPS", "200"))


def f_einsum3d(x, w):
    return jnp.einsum("gsc,cf->gsf", x, w,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def f_flat2d(x, w):
    g, s, c = x.shape
    y = jax.lax.dot_general(
        x.reshape(g * s, c), w.astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(g, s, -1).astype(x.dtype)


@jax.custom_vjp
def f_vjp_swap(x, w):
    return f_einsum3d(x, w)


def _swap_fwd(x, w):
    return f_einsum3d(x, w), (x, w)


def _swap_bwd(res, gy):
    x, w = res
    g, s, c = x.shape
    f = w.shape[-1]
    x2 = x.reshape(g * s, c)
    g2 = gy.reshape(g * s, f)
    # dW = (g2.T @ x2).T : contract the long axis with g2 as LHS so the
    # big stack operand is consumed in its native orientation; only the
    # small [F, C] result is transposed.
    dw_t = jax.lax.dot_general(
        g2, x2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [F, C]
    dw = dw_t.T.astype(w.dtype)
    dx = jax.lax.dot_general(
        g2, w.astype(g2.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, s, c).astype(x.dtype)
    return dx, dw


f_vjp_swap.defvjp(_swap_fwd, _swap_bwd)


@jax.custom_vjp
def f_vjp_both(x, w):
    return f_flat2d(x, w)


def _both_fwd(x, w):
    return f_flat2d(x, w), (x, w)


def _both_bwd(res, gy):
    x, w = res
    g, s, c = x.shape
    f = w.shape[-1]
    x2 = x.reshape(g * s, c)
    g2 = gy.reshape(g * s, f)
    # dW with x2 as LHS, contracting its MAJOR dim via dimension numbers —
    # leaves the choice of internal layout entirely to XLA, no explicit T
    dw = jax.lax.dot_general(
        x2, g2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)  # [C, F]
    dx = jax.lax.dot_general(
        g2, w.astype(g2.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, s, c).astype(x.dtype)
    return dx, dw


f_vjp_both.defvjp(_both_fwd, _both_bwd)

FORMS = dict(einsum3d=f_einsum3d, flat2d=f_flat2d,
             vjp_swap=f_vjp_swap, vjp_both=f_vjp_both)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=72)
    ap.add_argument("--s", type=int, default=128)
    ap.add_argument("--c", type=int, default=576)
    ap.add_argument("--f", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((args.g, args.s, args.c)), dt)
    w0 = jnp.asarray(rng.standard_normal((args.c, args.f)) * 0.01, jnp.float32)
    gy = jnp.asarray(rng.standard_normal((args.g, args.s, args.f)), dt)

    results = {}
    ref = None
    for name, fn in FORMS.items():
        def loss(x, w, fn=fn):
            return jnp.sum(fn(x, w).astype(jnp.float32) * gy.astype(jnp.float32))

        grad_fn = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def multi(x, w):
            def body(carry, _):
                x, w = carry
                dx, dw = grad_fn(x, w)
                # feed grads back so the loop can't be hoisted
                return (x + dx.astype(x.dtype) * 1e-6,
                        w + dw.astype(w.dtype) * 1e-6), dw[0, 0]

            (x, w), outs = jax.lax.scan(body, (x, w), None, length=STEPS)
            return x, w, outs

        t0 = time.time()
        x, w, outs = multi(x0, w0)
        _ = np.asarray(outs)[-1]  # device barrier via host readback
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            x, w, outs = multi(x0, w0)
            _ = np.asarray(outs)[-1]
            times.append(time.time() - t0)
        us = min(times) / STEPS * 1e6
        results[name] = dict(us_per_step=round(us, 1),
                             compile_s=round(compile_s, 1))
        # correctness: all forms produce identical grads (1 step)
        dx, dw = jax.grad(loss, argnums=(0, 1))(x0, w0)
        if ref is None:
            ref = (np.asarray(dx, np.float32), np.asarray(dw))
        else:
            np.testing.assert_allclose(
                np.asarray(dx, np.float32), ref[0], rtol=2e-2, atol=1e-2)
            np.testing.assert_allclose(
                np.asarray(dw), ref[1], rtol=2e-2, atol=1e-1)

    print(json.dumps(dict(
        metric="stack_gemm_us", shapes=vars(args), steps=STEPS,
        backend=jax.default_backend(), **results), default=str), flush=True)


if __name__ == "__main__":
    main()
