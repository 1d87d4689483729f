"""The stack GEMM y = x @ W with a choice of backward formulation.

Round-2/3 profile finding (benchmarks/RESULTS.md, benchmarks/
transpose_probe.py): the DenseNet-stack GEMMs are bandwidth-bound on
re-reading the [G, S, C] stack operand, and the dW backward contracts the
row axes while the forward contracts the channel axis — XLA materializes
the stack in both orientations ({2,1,0}<->{1,2,0} transposes).

``HLHGAT_SWAP_DW=1`` switches to a custom VJP that computes
``dW = (g2ᵀ @ x2)ᵀ`` — consuming the big stack operand in its native
orientation and transposing only the small [F, C] result — and expresses
``dx`` via explicit ``dot_general`` dimension numbers.  Measured isolated
(transpose_probe.py, v5e): ties the einsum autodiff at [72,128,576]×F for
F ∈ {128, 1024} and beats it ~18% at C=320/F=256 (where einsum autodiff
also hit a 92 s autotuner stall); never slower, and compiles 2-4× faster.
Exact math: same contractions, f32 accumulation, different association
only — in float32.  Under ``compute_dtype=bfloat16`` the custom VJP must
round dx to bf16 after every layer (custom_vjp cotangents carry the primal
dtype) where einsum autodiff keeps f32 cotangents end-to-end, so grads
differ by ~3e-3 per layer (tests/test_nn.py).

Round-4 end-to-end measurements (benchmarks/RESULTS.md): flagship
2.160M → 2.200M edges/s at the batch-384 knee (+1.9%), and 40-epoch
bf16 convergence A/Bs on two data seeds land inside the seed-to-seed
band (seed 0: 0.0860 vs 0.0905 plain; seed 1: 0.1009 vs 0.0980 — the
per-layer rounding is numerically neutral at this scale).  The MODULE
default stays OFF (f32 runs keep grads bit-comparable to einsum
autodiff for the parity/trajectory suites); the bf16 recipes turn it on
(bench.py, run.py ``--swap_dw auto``).
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_swap_dw_flag = os.environ.get("HLHGAT_SWAP_DW", "0") == "1"
_swap_dw_override: bool | None = None


def use_swap_dw(enable: bool | None = None) -> bool:
    """Get/set the PROCESS DEFAULT for the swapped-dW stack-GEMM backward.

    The default is read at trace time, so flipping it after a step has
    been jitted does not retrace — set it once before tracing (run.py
    ``--swap_dw auto`` does), or prefer the trace-stable per-model route:
    ``BackboneConfig.swap_dw``, which the backbone pins for its whole
    trace via :func:`swap_dw_scope` (round-4 advisor finding — two models
    in one process, e.g. a bf16 trainer plus an f32 parity eval, can then
    carry different settings)."""
    global _swap_dw_flag
    if enable is not None:
        _swap_dw_flag = enable
    return _swap_dw_flag if _swap_dw_override is None else _swap_dw_override


@contextlib.contextmanager
def swap_dw_scope(enable: bool | None):
    """Pin the swapped-dW choice for the enclosed trace.

    ``None`` leaves the process default in force.  Used by
    ``DenseInt3Backbone`` with ``cfg.swap_dw``: the choice becomes part of
    module config, so it is trace-stable — whenever the model (and thus
    its config) differs, the jit cache entry differs with it."""
    global _swap_dw_override
    prev = _swap_dw_override
    if enable is not None:
        _swap_dw_override = enable
    try:
        yield
    finally:
        _swap_dw_override = prev


@jax.custom_vjp
def _gemm_swap(x: Array, w: Array) -> Array:
    return jnp.einsum(
        "...c,cf->...f", x, w.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


def _gemm_swap_fwd(x, w):
    return _gemm_swap(x, w), (x, w)


def _gemm_swap_bwd(res, gy):
    x, w = res
    c = x.shape[-1]
    f = w.shape[-1]
    x2 = x.reshape(-1, c)
    g2 = gy.reshape(-1, f)
    # DTYPE NOTE (round-5 trace diff, benchmarks/RESULTS.md): under bf16
    # compute the cotangent gy is f32 (the forward accumulates f32), so
    # ``x2.astype(g2.dtype)`` makes these contractions run in FLOAT32
    # where einsum autodiff rounds gy to bf16 and contracts in bf16.  Both
    # variants were measured end-to-end: the f32 form wins on the flagship
    # (2.263M vs 2.202M with gy rounded first — the rounding inserts big
    # f32→bf16 converts of every layer's cotangent), and on TSP even the
    # bf16-contraction variant still loses to no-swap (1.583M vs 1.609M —
    # the orientation itself doesn't pay off at banded shapes), so the
    # per-family ``--swap_dw auto`` exclusions stand on mechanism: the
    # swap recipe bundles f32-precision dW/dx contractions, a free
    # precision bonus where stack re-read traffic dominates (flagship) and
    # a rate penalty where dW GEMM FLOPs dominate (TSP/brain).
    dw_t = jax.lax.dot_general(
        g2, x2.astype(g2.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [F, C] — only this small result is transposed
    dw = dw_t.T.astype(w.dtype)
    # cotangents must carry the PRIMAL dtypes (x may be bf16 while the
    # f32-accumulated output's cotangent is f32)
    dx = jax.lax.dot_general(
        g2, w.astype(g2.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(x.shape).astype(x.dtype)
    return dx, dw


_gemm_swap.defvjp(_gemm_swap_fwd, _gemm_swap_bwd)


def stack_gemm(x: Array, w: Array) -> Array:
    """``einsum('...c,cf->...f')`` with f32 accumulation; backward per
    ``use_swap_dw``.  Returns the f32 accumulator (caller casts)."""
    if use_swap_dw():
        return _gemm_swap(x, w)
    return jnp.einsum(
        "...c,cf->...f", x, w.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
