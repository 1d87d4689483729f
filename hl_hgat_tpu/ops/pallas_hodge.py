"""Fused dense-block Laguerre filter — the flagship Pallas kernel.

The XLA path materializes all K polynomial terms ([G, S, K·C]) in HBM before
the output projection; for K=6 that is 6× the activation memory and a
limiting factor for batch size.  This kernel computes the whole recurrence

    T0 = x,  T1 = x − L x,
    T_{k+1} = (−L·T_k + (2k+1)·T_k − k·T_{k−1}) / (k+1),
    out     = Σ_k T_k @ W_k + b

(reference recurrence: lib/Hodge_Cheb_Conv.py:494,507) per graph-block
entirely in VMEM: one [S, S] Laplacian tile + two [S, Ct] recurrence
registers + one f32 [S, F] accumulator.  HBM traffic drops from
(K+2)·S·C + S·F to S·C + S·F per block.

The recurrence is **channel-independent** (L mixes rows, never channels), so
wide inputs are tiled along C: grid (G, n_ct) forward / (n_ct, G) backward,
with the weight block [K, Ct, F] resident per c-tile.  This is what makes the
kernel viable at the flagship's dense-concat stack widths (C grows past 1300;
an untiled [K·C, F] weight block would blow VMEM).

All matmuls are per-term ([S, Ct] @ [Ct, F] etc.) rather than one concatenated
[S, K·Ct] matmul: indexing the major axis of the 3-D weight block is free,
while concatenating/slicing K term tiles along the minor (lane) axis forces
Mosaic relayout copies whenever Ct is not a lane multiple.

The backward pass is hand-derived (L is symmetric; dL is never consumed):
    dW_k = Σ_g T_kᵀ @ g          (T_k recomputed forward — one pass, exact)
    dx   = adjoint recurrence over b_k = g @ W_kᵀ, one L matvec per step.
Accumulation across the grid exploits the TPU grid's sequential execution:
the dW block for c-tile j stays VMEM-resident for the whole inner sweep over
graphs (zeroed at i == 0), and the forward's f32 accumulator persists across
the c-tile sweep for one graph (output written at the last c-tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# widest c-tile: [K, Ct, F] weight block + K [S, Ct] term registers stay
# comfortably under VMEM at K=6, S=128, F=256
_CT_MAX = 512


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _split_c(c: int) -> tuple[int, int]:
    """(c_tile, c_padded): tile C only when it exceeds the VMEM budget."""
    if c <= _CT_MAX:
        return c, c
    return _CT_MAX, -(-c // _CT_MAX) * _CT_MAX


def _prec(dtype):
    # f32 matmuls on the MXU default to a bf16-decomposition (~3e-4 relative
    # error over a K-term recurrence); accuracy-gated f32 runs need the full
    # passes.  bf16 inputs keep DEFAULT (already exact for bf16 operands).
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _dot(a, b, out_dtype):
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=_prec(a.dtype)
    ).astype(out_dtype)


def _terms(l, x, k):
    """Recurrence terms as a python-unrolled list (k is static)."""
    terms = [x]
    if k > 1:
        terms.append(x - _dot(l, x, x.dtype))
    j = 1
    for _ in range(2, k):
        lt = _dot(l, terms[-1], x.dtype)
        terms.append(((-lt + (2 * j + 1) * terms[-1] - j * terms[-2]) / (j + 1)))
        j += 1
    return terms


def _fwd_kernel(l_ref, x_ref, w_ref, b_ref, out_ref, acc_ref, *, k, n_ct):
    j = pl.program_id(1)
    x = x_ref[0]
    l = l_ref[0].astype(x.dtype)
    terms = _terms(l, x, k)
    partial = jnp.dot(
        terms[0], w_ref[0].astype(x.dtype),
        preferred_element_type=jnp.float32, precision=_prec(x.dtype),
    )
    for kk in range(1, k):
        partial += jnp.dot(
            terms[kk], w_ref[kk].astype(x.dtype),
            preferred_element_type=jnp.float32, precision=_prec(x.dtype),
        )

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = partial

    @pl.when(j > 0)
    def _acc():
        acc_ref[:] += partial

    @pl.when(j == n_ct - 1)
    def _emit():
        out_ref[0] = (acc_ref[:] + b_ref[:].astype(jnp.float32)).astype(
            out_ref.dtype
        )


def _bwd_kernel(l_ref, x_ref, w_ref, g_ref, dx_ref, dw_ref, db_ref, *, k):
    j = pl.program_id(0)  # c-tile (major: dw block resident per tile)
    i = pl.program_id(1)  # graph block
    x = x_ref[0]
    g = g_ref[0]
    l = l_ref[0].astype(x.dtype)

    # --- dW, db: recompute terms (one forward pass), accumulate over graphs
    terms = _terms(l, x, k)

    @pl.when(i == 0)
    def _init_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    for kk in range(k):
        dw_ref[kk] += jnp.dot(
            terms[kk].T, g.astype(x.dtype),
            preferred_element_type=jnp.float32, precision=_prec(x.dtype),
        ).astype(dw_ref.dtype)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_db():
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(j == 0)
    def _acc_db():
        db_ref[:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    # --- dx: adjoint of the recurrence (channel-independent per c-tile) ---
    b_list = [
        jnp.dot(
            g, w_ref[kk].astype(g.dtype).T,
            preferred_element_type=jnp.float32, precision=_prec(x.dtype),
        ).astype(x.dtype)
        for kk in range(k)
    ]  # bar-T_k, each [S, Ct]
    # walk k = K-1 .. 2, folding contributions downward
    for kk in range(k - 1, 1, -1):
        jj = kk - 1  # T_{j+1} = (−L T_j + (2j+1) T_j − j T_{j−1})/(j+1)
        bt = b_list[kk]
        lbt = _dot(l, bt, x.dtype)
        b_list[kk - 1] = b_list[kk - 1] + (-lbt + (2 * jj + 1) * bt) / (jj + 1)
        b_list[kk - 2] = b_list[kk - 2] - (jj / (jj + 1)) * bt
    dx = b_list[0]
    if k > 1:
        b1 = b_list[1]
        dx = dx + b1 - _dot(l, b1, x.dtype)
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def laguerre_dense_fused(l: Array, x: Array, w: Array, b: Array) -> Array:
    """Fused Laguerre filter on dense blocks.

    l: [G, S, S]; x: [G, S, C]; w: [K, C, F]; b: [F] → [G, S, F].
    """
    return _fused_fwd_impl(l, x, w, b)


def _pad_c(x, w, ct, cp):
    c = x.shape[-1]
    if cp == c:
        return x, w
    x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c)))
    w = jnp.pad(w, ((0, 0), (0, cp - c), (0, 0)))
    return x, w


def _fused_fwd_impl(l, x, w, b):
    g_, s, c = x.shape
    k, _, f = w.shape
    ct, cp = _split_c(c)
    x_p, w_p = _pad_c(x, w, ct, cp)
    n_ct = cp // ct
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, n_ct=n_ct),
        out_shape=jax.ShapeDtypeStruct((g_, s, f), x.dtype),
        grid=(g_, n_ct),
        in_specs=[
            pl.BlockSpec((1, s, s), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((k, ct, f), lambda i, j: (0, j, 0)),
            pl.BlockSpec((f,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, f), lambda i, j: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((s, f), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * g_ * s * (s * cp * (k - 1) + k * cp * f),
            bytes_accessed=g_ * (s * s + s * cp + s * f) * 4 + k * cp * f * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(l, x_p, w_p, b)


def _fused_fwd(l, x, w, b):
    return _fused_fwd_impl(l, x, w, b), (l, x, w)


def _fused_bwd(res, g):
    l, x, w = res
    g_, s, c = x.shape
    k, _, f = w.shape
    ct, cp = _split_c(c)
    x_p, w_p = _pad_c(x, w, ct, cp)
    n_ct = cp // ct
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((g_, s, cp), x.dtype),
            jax.ShapeDtypeStruct((k, cp, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ),
        grid=(n_ct, g_),
        in_specs=[
            pl.BlockSpec((1, s, s), lambda j, i: (i, 0, 0)),
            pl.BlockSpec((1, s, ct), lambda j, i: (i, 0, j)),
            pl.BlockSpec((k, ct, f), lambda j, i: (0, j, 0)),
            pl.BlockSpec((1, s, f), lambda j, i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, s, ct), lambda j, i: (i, 0, j)),
            pl.BlockSpec((k, ct, f), lambda j, i: (0, j, 0)),
            pl.BlockSpec((1, f), lambda j, i: (0, 0)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g_ * s * (s * cp * (k - 1) + k * cp * f),
            bytes_accessed=g_ * (s * s + 2 * s * cp + 2 * s * f) * 4
            + 2 * k * cp * f * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(l, x_p, w_p, g)
    # dL is never consumed (the Laplacian is data); zeros feed DCE
    return (
        jnp.zeros_like(l),
        dx[:, :, :c],
        dw[:, :c].astype(w.dtype),
        db[0].astype(w.dtype),
    )


laguerre_dense_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Terms-only kernel: the polynomial recurrence with L resident in VMEM.
#
# The no-remat XLA path re-streams the SAME [S, S] Laplacian tile from HBM
# for every one of the K−1 recurrence mat-vecs and re-reads each term tile
# ~3× (next mat-vec + elementwise combine); the backward adjoint repeats the
# pattern.  This kernel produces ALL K terms in one pass per (graph, c-tile)
# program — L and the two recurrence registers stay in VMEM, each term is
# written exactly once — and the hand-derived adjoint (linear recurrence; L
# symmetric, dL never consumed) reads each cotangent tile exactly once.
# Unlike `laguerre_dense_fused` it does NOT fold in the output GEMM: the
# terms remain materialized, so XLA keeps its saved-terms backward (the
# measured winner over recompute, benchmarks/RESULTS.md) and the MXU GEMMs
# stay in XLA where they fuse with neighbors.
# ---------------------------------------------------------------------------


def _terms_fwd_kernel(l_ref, x_ref, t_ref, *, k):
    x = x_ref[0]
    l = l_ref[0].astype(x.dtype)
    terms = _terms(l, x, k)
    for kk in range(k):
        t_ref[kk, 0] = terms[kk]


def _terms_bwd_kernel(l_ref, dt_ref, dx_ref, *, k):
    b_list = [dt_ref[kk, 0] for kk in range(k)]
    l = l_ref[0].astype(b_list[0].dtype)
    # adjoint of T_{j+1} = (−L·T_j + (2j+1)·T_j − j·T_{j−1})/(j+1), L = Lᵀ
    for kk in range(k - 1, 1, -1):
        jj = kk - 1
        bt = b_list[kk]
        lbt = _dot(l, bt, bt.dtype)
        b_list[kk - 1] = b_list[kk - 1] + (-lbt + (2 * jj + 1) * bt) / (jj + 1)
        b_list[kk - 2] = b_list[kk - 2] - (jj / (jj + 1)) * bt
    dx = b_list[0]
    if k > 1:
        b1 = b_list[1]
        dx = dx + b1 - _dot(l, b1, b1.dtype)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _terms_fwd_impl(l, x, k):
    g_, s, c = x.shape
    ct, cp = _split_c(c)
    x_p = (
        x if cp == c else jnp.pad(x, ((0, 0), (0, 0), (0, cp - c)))
    )
    n_ct = cp // ct
    t = pl.pallas_call(
        functools.partial(_terms_fwd_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((k, g_, s, cp), x.dtype),
        grid=(g_, n_ct),
        in_specs=[
            pl.BlockSpec((1, s, s), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, ct), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((k, 1, s, ct), lambda i, j: (0, i, 0, j)),
        cost_estimate=pl.CostEstimate(
            flops=2 * g_ * s * s * cp * (k - 1),
            bytes_accessed=g_ * (s * s + s * cp + k * s * cp) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(l, x_p)
    return t[..., :c] if cp != c else t


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def laguerre_terms_dense(l: Array, x: Array, k: int) -> Array:
    """All K Laguerre terms on dense blocks in one VMEM-resident pass.

    l: [G, S, S] (symmetric); x: [G, S, C] → [K, G, S, C]."""
    return _terms_fwd_impl(l, x, k)


def _terms_vjp_fwd(l, x, k):
    return _terms_fwd_impl(l, x, k), l


def _terms_vjp_bwd(k, l, dt):
    g_, s = l.shape[0], l.shape[1]
    c = dt.shape[-1]
    ct, cp = _split_c(c)
    dt_p = (
        dt if cp == c else jnp.pad(dt, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    )
    n_ct = cp // ct
    dx = pl.pallas_call(
        functools.partial(_terms_bwd_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((g_, s, cp), dt.dtype),
        grid=(g_, n_ct),
        in_specs=[
            pl.BlockSpec((1, s, s), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((k, 1, s, ct), lambda i, j: (0, i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, s, ct), lambda i, j: (i, 0, j)),
        cost_estimate=pl.CostEstimate(
            flops=2 * g_ * s * s * cp * (k - 1),
            bytes_accessed=g_ * (s * s + s * cp + k * s * cp) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(l, dt_p)
    # dL is never consumed (the Laplacian is data); zeros feed DCE
    return jnp.zeros_like(l), (dx[:, :, :c] if cp != c else dx)


laguerre_terms_dense.defvjp(_terms_vjp_fwd, _terms_vjp_bwd)
