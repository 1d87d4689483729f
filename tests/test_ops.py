"""Unit parity of the sparse kernel layer against dense linear algebra.

The reference ships no tests; per SURVEY.md §4 the oracle for every kernel is
the dense matrix it represents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.ops import (
    boundary_abs_s2t,
    boundary_abs_t2s,
    boundary_s2t,
    boundary_t2s,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
    sddmm_coo,
    spmm_coo,
    spmm_dense_oracle,
)
from hl_hgat_tpu.ops.boundary import node_degree
from hl_hgat_tpu.complex.build import boundary_dense, coo_to_ell
from hl_hgat_tpu.ops.pallas_spmm import spmm_ell_pallas


def random_coo(rng, n_rows, n_cols, nnz, pad=7):
    rows = rng.integers(0, n_rows, nnz).astype(np.int32)
    cols = rng.integers(0, n_cols, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    # pad with zero-valued entries (arbitrary in-range indices)
    rows = np.concatenate([rows, np.zeros(pad, np.int32)])
    cols = np.concatenate([cols, np.zeros(pad, np.int32)])
    vals = np.concatenate([vals, np.zeros(pad, np.float32)])
    return rows, cols, vals


class TestSegment:
    def test_sum_mean_max(self, rng):
        data = rng.standard_normal((20, 5)).astype(np.float32)
        ids = rng.integers(0, 6, 20).astype(np.int32)
        out = segment_sum(jnp.asarray(data), jnp.asarray(ids), 6)
        expect = np.zeros((6, 5), np.float32)
        np.add.at(expect, ids, data)
        np.testing.assert_allclose(out, expect, rtol=1e-5)

        mean = segment_mean(jnp.asarray(data), jnp.asarray(ids), 6)
        counts = np.maximum(np.bincount(ids, minlength=6), 1)
        np.testing.assert_allclose(mean, expect / counts[:, None], rtol=1e-5)

        mx = segment_max(jnp.asarray(data), jnp.asarray(ids), 6)
        for s in range(6):
            if (ids == s).any():
                np.testing.assert_allclose(
                    mx[s], data[ids == s].max(0), rtol=1e-5
                )

    def test_out_of_range_dropped(self):
        data = jnp.ones((4, 2))
        ids = jnp.array([0, 1, 5, 9], jnp.int32)  # 5, 9 out of range
        out = segment_sum(data, ids, 2)
        np.testing.assert_allclose(out, np.ones((2, 2)))

    def test_weighted_mean_excludes_padding(self, rng):
        data = rng.standard_normal((6, 3)).astype(np.float32)
        ids = np.array([0, 0, 0, 1, 1, 1], np.int32)
        w = np.array([1, 1, 0, 1, 0, 0], np.float32)
        out = segment_mean(
            jnp.asarray(data), jnp.asarray(ids), 2, weights=jnp.asarray(w)
        )
        np.testing.assert_allclose(out[0], data[:2].mean(0), rtol=1e-5)
        np.testing.assert_allclose(out[1], data[3], rtol=1e-5)

    def test_segment_softmax(self, rng):
        x = rng.standard_normal((8, 1)).astype(np.float32)
        ids = np.array([0, 0, 0, 1, 1, 1, 1, 1], np.int32)
        out = np.asarray(segment_softmax(jnp.asarray(x), jnp.asarray(ids), 2))
        for s in range(2):
            grp = out[ids == s]
            np.testing.assert_allclose(grp.sum(), 1.0, rtol=1e-5)
            ref = np.exp(x[ids == s])
            np.testing.assert_allclose(grp, ref / ref.sum(), rtol=1e-5)


class TestSpmm:
    def test_matches_dense(self, rng):
        rows, cols, vals = random_coo(rng, 10, 12, 30)
        x = rng.standard_normal((12, 4)).astype(np.float32)
        out = spmm_coo(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(x), 10,
        )
        expect = spmm_dense_oracle(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(x), 10,
        )
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_gradients(self, rng):
        rows, cols, vals = random_coo(rng, 6, 6, 14, pad=2)
        x = rng.standard_normal((6, 3)).astype(np.float32)

        def f_sparse(v, xx):
            return jnp.sum(
                spmm_coo(jnp.asarray(rows), jnp.asarray(cols), v, xx, 6) ** 2
            )

        def f_dense(v, xx):
            dense = jnp.zeros((6, 6)).at[rows, cols].add(v)
            return jnp.sum((dense @ xx) ** 2)

        gv, gx = jax.grad(f_sparse, argnums=(0, 1))(
            jnp.asarray(vals), jnp.asarray(x)
        )
        gv_d, gx_d = jax.grad(f_dense, argnums=(0, 1))(
            jnp.asarray(vals), jnp.asarray(x)
        )
        np.testing.assert_allclose(gx, gx_d, rtol=1e-4, atol=1e-5)
        # duplicate (row, col) pairs may split the value-gradient differently
        # between entries only if duplicates exist; random_coo can create
        # duplicates, so compare through the dense matrix instead:
        dense_g = np.zeros((6, 6), np.float32)
        np.add.at(dense_g, (rows, cols), np.asarray(gv))
        dense_gd = np.zeros((6, 6), np.float32)
        np.add.at(dense_gd, (rows, cols), np.asarray(gv_d))
        np.testing.assert_allclose(dense_g, dense_gd, rtol=1e-4, atol=1e-5)

    def test_sddmm(self, rng):
        rows, cols, _ = random_coo(rng, 8, 9, 20, pad=0)
        a = rng.standard_normal((8, 5)).astype(np.float32)
        b = rng.standard_normal((9, 5)).astype(np.float32)
        out = sddmm_coo(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(a), jnp.asarray(b)
        )
        expect = (a @ b.T)[rows, cols]
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_ell_kernel_interpret(self, rng):
        rows, cols, vals = random_coo(rng, 16, 16, 40)
        x = rng.standard_normal((16, 8)).astype(np.float32)
        ell_cols, ell_vals = coo_to_ell(rows, cols, vals, 16)
        out = spmm_ell_pallas(
            jnp.asarray(ell_cols), jnp.asarray(ell_vals), jnp.asarray(x),
            block_rows=8,
        )
        expect = spmm_dense_oracle(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(x), 16,
        )
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_ell_symmetric_fwd_bwd(self, rng):
        from hl_hgat_tpu.ops.pallas_spmm import spmm_ell_symmetric

        # random symmetric operator (dedup'd via the dense matrix)
        n, f = 12, 5
        dense = np.zeros((n, n), np.float32)
        r0 = rng.integers(0, n, 30)
        c0 = rng.integers(0, n, 30)
        v0 = rng.standard_normal(30).astype(np.float32)
        np.add.at(dense, (r0, c0), v0)
        dense = dense + dense.T
        rows, cols = np.nonzero(dense)
        vals = dense[rows, cols].astype(np.float32)
        rows, cols = rows.astype(np.int32), cols.astype(np.int32)
        ell_cols, ell_vals = coo_to_ell(rows, cols, vals, n)
        x = rng.standard_normal((n, f)).astype(np.float32)

        out = spmm_ell_symmetric(
            jnp.asarray(ell_cols), jnp.asarray(ell_vals), jnp.asarray(x)
        )
        np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-5)

        def loss_ell(ev, xx):
            y = spmm_ell_symmetric(jnp.asarray(ell_cols), ev, xx)
            return jnp.sum(jnp.sin(y))

        def loss_dense(dd, xx):
            return jnp.sum(jnp.sin(dd @ xx))

        gv, gx = jax.grad(loss_ell, argnums=(0, 1))(
            jnp.asarray(ell_vals), jnp.asarray(x)
        )
        gd, gx_d = jax.grad(loss_dense, argnums=(0, 1))(
            jnp.asarray(dense), jnp.asarray(x)
        )
        np.testing.assert_allclose(gx, gx_d, rtol=1e-4, atol=1e-5)
        # scatter ELL value-grad back to dense and compare
        gd_from_ell = np.zeros((n, n), np.float32)
        np.add.at(
            gd_from_ell,
            (np.repeat(np.arange(n), ell_cols.shape[1]), ell_cols.ravel()),
            np.asarray(gv).ravel(),
        )
        expect_dense = np.where(dense != 0, np.asarray(gd), 0.0)
        np.testing.assert_allclose(
            gd_from_ell, expect_dense, rtol=1e-4, atol=1e-5
        )

    def test_ell_symmetric_rejects_rectangular(self, rng):
        from hl_hgat_tpu.ops.pallas_spmm import spmm_ell_pallas as k

        with pytest.raises(ValueError):
            k(
                jnp.zeros((4, 2), jnp.int32),
                jnp.zeros((4, 2), jnp.float32),
                jnp.zeros((6, 3), jnp.float32),
            )


class TestBoundary:
    def test_all_products_match_dense_b1(self, rng, graph_factory):
        src, dst = graph_factory(n=10, extra_edges=8)
        n, e = 10, src.shape[0]
        b1 = boundary_dense(src, dst, n)
        x_s = rng.standard_normal((e, 4)).astype(np.float32)
        x_t = rng.standard_normal((n, 4)).astype(np.float32)
        s, d = jnp.asarray(src), jnp.asarray(dst)

        np.testing.assert_allclose(
            boundary_abs_s2t(jnp.asarray(x_s), s, d, n),
            np.abs(b1) @ x_s, rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            boundary_s2t(jnp.asarray(x_s), s, d, n),
            b1 @ x_s, rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            boundary_abs_t2s(jnp.asarray(x_t), s, d),
            np.abs(b1).T @ x_t, rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            boundary_t2s(jnp.asarray(x_t), s, d),
            b1.T @ x_t, rtol=1e-4, atol=1e-5,
        )

    def test_edge_mask_zeroes_padding(self, rng, graph_factory):
        src, dst = graph_factory(n=8, extra_edges=4)
        e = src.shape[0]
        # append bogus padded edges pointing at node 0
        src_p = np.concatenate([src, np.zeros(3, np.int32)])
        dst_p = np.concatenate([dst, np.zeros(3, np.int32)])
        mask = np.concatenate([np.ones(e, np.float32), np.zeros(3, np.float32)])
        x_s = rng.standard_normal((e + 3, 4)).astype(np.float32)
        out = boundary_abs_s2t(
            jnp.asarray(x_s), jnp.asarray(src_p), jnp.asarray(dst_p), 8,
            edge_mask=jnp.asarray(mask),
        )
        b1 = boundary_dense(src, dst, 8)
        np.testing.assert_allclose(out, np.abs(b1) @ x_s[:e], rtol=1e-4, atol=1e-5)

    def test_degree(self, graph_factory):
        src, dst = graph_factory(n=9, extra_edges=5)
        deg = node_degree(jnp.asarray(src), jnp.asarray(dst), 9, eps=1e-6)
        expect = np.bincount(src, minlength=9) + np.bincount(dst, minlength=9)
        np.testing.assert_allclose(deg, expect + 1e-6, rtol=1e-5)


class TestEllGatherSpmm:
    def test_matches_coo_and_grads(self):
        """XLA ELL gather path (ops/spmm.py::spmm_ell_sym) must match the
        COO scatter path in value AND gradient on a symmetric operator."""
        import numpy as np

        from hl_hgat_tpu.native import coo_to_ell
        from hl_hgat_tpu.ops.spmm import spmm_coo, spmm_ell_sym

        rng = np.random.default_rng(0)
        n = 37
        # random symmetric pattern with zero-padded COO
        r = rng.integers(0, n, 120).astype(np.int32)
        c = rng.integers(0, n, 120).astype(np.int32)
        v = rng.standard_normal(120).astype(np.float32)
        rows = np.concatenate([r, c])
        cols = np.concatenate([c, r])
        vals = np.concatenate([v, v])  # symmetric by construction
        x = rng.standard_normal((n, 5)).astype(np.float32)
        ell = coo_to_ell(rows, cols, vals, n)
        if ell is None:
            pytest.skip("native library unavailable")
        ell_cols, ell_vals = ell

        f_coo = lambda xx, vv: jnp.sum(  # noqa: E731
            spmm_coo(
                jnp.asarray(rows), jnp.asarray(cols), vv, xx, n
            )
            ** 2
        )
        f_ell = lambda xx, vv: jnp.sum(  # noqa: E731
            spmm_ell_sym(jnp.asarray(ell_cols), vv, xx) ** 2
        )
        y_coo = spmm_coo(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(x), n,
        )
        y_ell = spmm_ell_sym(
            jnp.asarray(ell_cols), jnp.asarray(ell_vals), jnp.asarray(x)
        )
        np.testing.assert_allclose(y_coo, y_ell, rtol=1e-5, atol=1e-5)
        gx_coo = jax.grad(f_coo, argnums=0)(
            jnp.asarray(x), jnp.asarray(vals)
        )
        gx_ell = jax.grad(f_ell, argnums=0)(
            jnp.asarray(x), jnp.asarray(ell_vals)
        )
        np.testing.assert_allclose(gx_coo, gx_ell, rtol=1e-4, atol=1e-4)

    def test_model_forward_matches_without_ell(self):
        """A COO model forward must be identical with and without ELL
        attached (the dispatch routes L mat-vecs through the gather path)."""
        import numpy as np

        from hl_hgat_tpu.data.synthetic import synthetic_zinc_batch
        from hl_hgat_tpu.models import presets

        b_plain = synthetic_zinc_batch(3, seed=5, keig=8)
        b_ell = synthetic_zinc_batch(3, seed=5, keig=8, with_ell=True)
        model, _ = presets.zinc_pyr(
            channels=(1, 1), filters=(8, 16), k=3, keig=8, mlp_channels=(8,),
            use_embedding=False,
        )
        to_dev = lambda b: jax.tree.map(  # noqa: E731
            lambda x: jnp.asarray(x) if x is not None else None, b
        )
        v = model.init({"params": jax.random.key(0)}, to_dev(b_plain),
                       deterministic=True)
        out_plain = model.apply(v, to_dev(b_plain), deterministic=True)
        out_ell = model.apply(v, to_dev(b_ell), deterministic=True)
        np.testing.assert_allclose(out_plain, out_ell, rtol=2e-5, atol=1e-6)
