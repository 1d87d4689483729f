"""C++ native kernels must be bit-compatible with the Python fallbacks."""

import numpy as np
import pytest

from hl_hgat_tpu import native
from hl_hgat_tpu.complex.build import coo_to_ell as py_coo_to_ell
from hl_hgat_tpu.complex.coarsen import coarse_edges, graclus_cluster

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@needs_native
class TestNativeParity:
    def test_graclus_matches_python(self, rng, graph_factory):
        for trial in range(5):
            n = int(rng.integers(10, 60))
            src, dst = graph_factory(n=n, extra_edges=int(rng.integers(0, 30)))
            w = rng.random(src.shape[0]).astype(np.float32)
            for weight in (None, w):
                py = graclus_cluster(src, dst, weight, n, impl="python")
                cc = native.graclus_match(src, dst, weight, n)
                np.testing.assert_array_equal(py, cc)

    def test_coarse_edges_matches_python(self, rng, graph_factory):
        n = 40
        src, dst = graph_factory(n=n, extra_edges=40)
        c_node = graclus_cluster(src, dst, None, n)
        uniq = np.unique(c_node)
        remap = {int(r): i for i, r in enumerate(uniq)}
        c_dense = np.asarray([remap[int(r)] for r in c_node], np.int64)
        ps, pd, pe = coarse_edges(c_dense, src, dst, impl="python")
        cs, cd, ce = native.coarse_edges(c_dense, src, dst)
        np.testing.assert_array_equal(ps, cs)
        np.testing.assert_array_equal(pd, cd)
        np.testing.assert_array_equal(pe, ce)

    def test_ell_matches_python(self, rng):
        rows = rng.integers(0, 30, 200).astype(np.int32)
        cols = rng.integers(0, 30, 200).astype(np.int32)
        vals = rng.standard_normal(200).astype(np.float32)
        vals[rng.random(200) < 0.2] = 0.0  # padding entries
        pc, pv = py_coo_to_ell(rows, cols, vals, 30)
        cc, cv = native.coo_to_ell(rows, cols, vals, 30)
        np.testing.assert_array_equal(pc, cc)
        np.testing.assert_allclose(pv, cv)

    def test_hodge_l1_matches_dense(self, rng, graph_factory):
        from hl_hgat_tpu.complex.build import hodge_laplacians

        src, dst = graph_factory(n=20, extra_edges=25)
        l0d, l1d, max_eig = hodge_laplacians(src, dst, 20)
        rows, cols, vals = native.hodge_l1(src, dst, 20, 2.0 / max_eig)
        m = np.zeros_like(l1d)
        np.add.at(m, (rows, cols), vals)
        np.testing.assert_allclose(m, l1d, atol=1e-5)

    def test_ell_width_overflow_raises(self, rng):
        rows = np.zeros(10, np.int32)
        cols = np.arange(10, dtype=np.int32)
        vals = np.ones(10, np.float32)
        with pytest.raises(ValueError):
            native.coo_to_ell(rows, cols, vals, 4, width=5)


def test_native_builds():
    """The toolchain exists in this environment: the library must build."""
    assert native.available(), "native build failed — check native/Makefile"
