"""Property + parity tests for complex construction, batching, coarsening."""

import numpy as np
import pytest

from hl_hgat_tpu.complex.build import (
    boundary_dense,
    build_complex,
    build_structure,
    canonical_undirected,
    collate,
    eig_pe,
    hodge_laplacians,
    pad_spec,
)
from hl_hgat_tpu.complex.coarsen import build_pyramid, graclus_cluster, mlgc


class TestCanonical:
    def test_dedup_min(self):
        ei = np.array([[0, 1, 1, 2, 3, 3], [1, 0, 2, 1, 2, 2]])
        attr = np.array([5.0, 3.0, 1.0, 2.0, 7.0, 4.0])
        out_ei, out_attr = canonical_undirected(ei, attr)
        assert out_ei.shape == (2, 3)
        np.testing.assert_array_equal(out_ei, [[0, 1, 2], [1, 2, 3]])
        np.testing.assert_allclose(out_attr, [3.0, 1.0, 4.0])

    def test_self_loops_dropped(self):
        ei = np.array([[0, 1, 1], [0, 2, 1]])
        out_ei, _ = canonical_undirected(ei)
        np.testing.assert_array_equal(out_ei, [[1], [2]])


class TestLaplacians:
    def test_spectrum_in_0_2(self, graph_factory):
        src, dst = graph_factory(n=14, extra_edges=10)
        l0, l1, max_eig = hodge_laplacians(src, dst, 14)
        assert max_eig > 0
        w0 = np.linalg.eigvalsh(l0)
        w1 = np.linalg.eigvalsh(l1)
        assert w0.max() <= 2.0 + 1e-9 and w0.min() >= -1e-9
        assert w1.max() <= 2.0 + 1e-9 and w1.min() >= -1e-9

    def test_l0_is_b1_b1t(self, graph_factory):
        src, dst = graph_factory(n=10, extra_edges=6)
        b1 = boundary_dense(src, dst, 10)
        l0, l1, max_eig = hodge_laplacians(src, dst, 10)
        np.testing.assert_allclose(l0, 2 * b1 @ b1.T / max_eig, atol=1e-12)
        np.testing.assert_allclose(l1, 2 * b1.T @ b1 / max_eig, atol=1e-12)

    def test_eig_pe_shape_and_orthonormal(self, graph_factory):
        src, dst = graph_factory(n=12, extra_edges=4)
        l0, _, _ = hodge_laplacians(src, dst, 12)
        pe = eig_pe(l0, k=6)
        assert pe.shape == (12, 5)
        # columns are eigenvectors => unit norm
        np.testing.assert_allclose(
            np.linalg.norm(pe, axis=0), np.ones(5), rtol=1e-5
        )

    def test_eig_pe_pads_small_graphs(self):
        src = np.array([0], np.int32)
        dst = np.array([1], np.int32)
        l0, _, _ = hodge_laplacians(src, dst, 2)
        pe = eig_pe(l0, k=9)
        assert pe.shape == (2, 8)
        np.testing.assert_allclose(pe[:, 1:], 0)


def make_sample(rng, graph_factory, n=10, ft=3, fs=2, y_dim=1):
    src, dst = graph_factory(n=n, extra_edges=5)
    ei = np.stack([src, dst])
    e = src.shape[0]
    return build_complex(
        ei,
        n,
        x_t=rng.standard_normal((n, ft)).astype(np.float32),
        x_s=rng.standard_normal((e, fs)).astype(np.float32),
        y=rng.standard_normal(y_dim).astype(np.float32),
    )


class TestCollate:
    def test_block_diagonal_layout(self, rng, graph_factory):
        samples = [make_sample(rng, graph_factory, n=n) for n in (8, 11, 9)]
        batch = collate(samples)
        lvl = batch.levels[0]
        n_tot = sum(s.num_nodes for s in samples)
        e_tot = sum(s.num_edges for s in samples)
        assert lvl.node_mask.sum() == n_tot
        assert lvl.edge_mask.sum() == e_tot
        # features land in the right rows
        np.testing.assert_allclose(batch.x_t[: samples[0].num_nodes],
                                   samples[0].x_t)
        o = samples[0].num_nodes
        np.testing.assert_allclose(
            batch.x_t[o : o + samples[1].num_nodes], samples[1].x_t
        )
        # segment ids
        np.testing.assert_array_equal(
            np.asarray(lvl.n_id[:n_tot]),
            np.concatenate(
                [np.full(s.num_nodes, g) for g, s in enumerate(samples)]
            ),
        )
        # padded n_id points at dump bucket
        assert (np.asarray(lvl.n_id[n_tot:]) == 3).all()
        # second graph's edges reference offset nodes
        e0 = samples[0].num_edges
        np.testing.assert_array_equal(
            np.asarray(lvl.src[e0 : e0 + samples[1].num_edges]),
            samples[1].levels[0].src + o,
        )

    def test_collate_with_ell_matches_coo(self, rng, graph_factory):
        samples = [make_sample(rng, graph_factory, n=n) for n in (8, 10)]
        batch = collate(samples, with_ell=True)
        lvl = batch.levels[0]
        for mat in (lvl.l0, lvl.l1):
            assert mat.ell_cols is not None and mat.symmetric
            n_rows = mat.shape[0]
            assert mat.ell_cols.shape[0] == n_rows
            dense_coo = np.zeros((n_rows, mat.shape[1]), np.float32)
            np.add.at(
                dense_coo,
                (np.asarray(mat.rows), np.asarray(mat.cols)),
                np.asarray(mat.vals),
            )
            dense_ell = np.zeros_like(dense_coo)
            w = mat.ell_cols.shape[1]
            np.add.at(
                dense_ell,
                (np.repeat(np.arange(n_rows), w), np.asarray(mat.ell_cols).ravel()),
                np.asarray(mat.ell_vals).ravel(),
            )
            np.testing.assert_allclose(dense_ell, dense_coo, rtol=1e-5, atol=1e-6)
        # default collate carries no ELL arrays
        plain = collate(samples)
        assert plain.levels[0].l0.ell_cols is None

    def test_l0_blocks_match_per_graph(self, rng, graph_factory):
        samples = [make_sample(rng, graph_factory, n=7) for _ in range(2)]
        batch = collate(samples)
        lvl = batch.levels[0]
        # reconstruct dense batched L0 and compare with block-diag of samples
        nmax = lvl.num_nodes
        dense = np.zeros((nmax, nmax))
        r, c, v = (np.asarray(lvl.l0.rows), np.asarray(lvl.l0.cols),
                   np.asarray(lvl.l0.vals))
        np.add.at(dense, (r, c), v)
        o = 0
        for s in samples:
            l0, _, _ = hodge_laplacians(
                s.levels[0].src, s.levels[0].dst, s.num_nodes
            )
            n = s.num_nodes
            np.testing.assert_allclose(dense[o : o + n, o : o + n], l0,
                                       rtol=1e-5, atol=1e-6)
            o += n
        np.testing.assert_allclose(dense[o:, :], 0)

    def test_pad_spec_multiple(self, rng, graph_factory):
        samples = [make_sample(rng, graph_factory, n=9) for _ in range(3)]
        pads = pad_spec(samples, multiple=16)
        assert pads[0].nodes % 16 == 0
        assert pads[0].nodes >= 27

    def test_per_edge_labels(self, rng, graph_factory):
        samples = []
        for _ in range(2):
            s = make_sample(rng, graph_factory, n=8)
            s.y = np.arange(s.num_edges, dtype=np.float32)
            samples.append(s)
        batch = collate(samples, y_per_edge=True)
        e0 = samples[0].num_edges
        np.testing.assert_allclose(batch.y[:e0], samples[0].y)
        np.testing.assert_allclose(batch.y[e0 : e0 + samples[1].num_edges],
                                   samples[1].y)


class TestSmallUtilities:
    def test_par2adj_roundtrip(self, graph_factory):
        from hl_hgat_tpu.complex.build import par2adj

        src, dst = graph_factory(n=10, extra_edges=6)
        b1 = boundary_dense(src, dst, 10)
        ei = par2adj(b1)
        np.testing.assert_array_equal(ei[0], src)
        np.testing.assert_array_equal(ei[1], dst)

    def test_post2poss_matches_mlgc_assignment(self, graph_factory):
        from hl_hgat_tpu.complex.build import build_structure, post2poss
        from hl_hgat_tpu.complex.coarsen import mlgc

        src, dst = graph_factory(n=16, extra_edges=10)
        st = build_structure(src, dst, 16)
        lvl = mlgc(st)
        ei = np.stack([src, dst])
        ei1 = np.stack([lvl.structure.src, lvl.structure.dst])
        pos_s = post2poss(lvl.c_node, ei, ei1)
        np.testing.assert_array_equal(pos_s, lvl.c_edge)

    def test_unbatch_edge_attr(self, rng, graph_factory):
        from hl_hgat_tpu.complex.build import unbatch_edge_attr
        from hl_hgat_tpu.complex.build import build_complex, collate

        samples = [
            build_complex(
                np.stack(graph_factory(n=8, extra_edges=3)), 8,
                x_s=None, y=np.zeros(1),
            )
            for _ in range(3)
        ]
        for s in samples:
            s.x_s = rng.standard_normal((s.num_edges, 2)).astype(np.float32)
        batch = collate(samples)
        lvl = batch.levels[0]
        parts = unbatch_edge_attr(batch.x_s, lvl.s_id, lvl.edge_mask, 3)
        for s, p in zip(samples, parts):
            np.testing.assert_allclose(p, s.x_s)


class TestCoarsen:
    def test_graclus_is_valid_matching(self, graph_factory):
        src, dst = graph_factory(n=20, extra_edges=15)
        rep = graclus_cluster(src, dst, None, 20)
        # every cluster has <= 2 members and members are adjacent or singleton
        uniq, counts = np.unique(rep, return_counts=True)
        assert counts.max() <= 2
        edges = {(int(a), int(b)) for a, b in zip(src, dst)}
        for r, c in zip(uniq, counts):
            if c == 2:
                members = np.nonzero(rep == r)[0]
                a, b = int(members[0]), int(members[1])
                assert (a, b) in edges or (b, a) in edges

    def test_mlgc_native_matches_symmetrized_python(self, graph_factory):
        """Round-5 advisor fix: the default unweighted MLGC routes through
        the native symmetrizing matcher (graclus_match).  For a CANONICAL
        row-major skeleton its per-node neighbour order is ascending by
        index, so it must agree EXACTLY with the reference-order
        symmetrized Python walk (the previous default path) — on flat
        graphs and on deep pyramid levels (where the r4 neighbour-order
        bug lived)."""
        from hl_hgat_tpu import native
        from hl_hgat_tpu.complex.coarsen import build_pyramid

        if native.graclus_match(
            np.asarray([0], np.int32), np.asarray([1], np.int32), None, 2
        ) is None:
            import pytest

            pytest.skip("native library unavailable")
        for seed in range(12):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(10, 60))
            src, dst = graph_factory(n=n, extra_edges=int(rng.integers(4, 30)))
            st = build_structure(src, dst, n)
            levels, _ = build_pyramid([st], 2)
            for lv in levels[:-1]:
                s, d, nn = lv.src, lv.dst, lv.num_nodes
                fast = graclus_cluster(s, d, None, nn, impl="native_or_sym")
                ss = np.concatenate([s, d])
                dd = np.concatenate([d, s])
                order = np.lexsort((dd, ss))
                ref = graclus_cluster(
                    ss[order], dd[order], None, nn,
                    directed=True, impl="python",
                )
                np.testing.assert_array_equal(fast, ref, err_msg=f"seed {seed}")

    def test_mlgc_structure(self, rng, graph_factory):
        src, dst = graph_factory(n=16, extra_edges=10)
        structure = build_structure(src, dst, 16)
        lvl = mlgc(structure)
        coarse = lvl.structure
        assert coarse.num_nodes <= 16
        assert coarse.num_nodes >= 8  # matching halves at most
        # every fine edge maps to a valid coarse edge or −1
        assert lvl.c_edge.min() >= -1
        assert lvl.c_edge.max() < coarse.num_edges
        # mapped coarse endpoints agree with c_node
        for i in range(src.shape[0]):
            ce = lvl.c_edge[i]
            a, b = lvl.c_node[src[i]], lvl.c_node[dst[i]]
            if ce < 0:
                assert a == b
            else:
                assert {int(a), int(b)} == {
                    int(coarse.src[ce]), int(coarse.dst[ce])
                }
        # coarse spectra rescaled into [0, 2]
        dense = np.zeros((coarse.num_nodes, coarse.num_nodes))
        np.add.at(dense, (coarse.l0_rows, coarse.l0_cols), coarse.l0_vals)
        w = np.linalg.eigvalsh(dense)
        assert w.max() <= 2.0 + 1e-6

    def test_pyramid_collate(self, rng, graph_factory):
        samples = []
        for _ in range(3):
            s = make_sample(rng, graph_factory, n=12)
            levels, pools = build_pyramid(s.levels, num_pool=2)
            s.levels, s.pools = levels, pools
            samples.append(s)
        batch = collate(samples)
        assert len(batch.levels) == 3
        assert len(batch.pools) == 2
        # pooled node ids stay within coarse node count (+dump)
        for k in range(2):
            fine, coarse = batch.levels[k], batch.levels[k + 1]
            pos_t = np.asarray(batch.pools[k].pos_t)
            assert pos_t.max() <= coarse.num_nodes
            valid = np.asarray(fine.node_mask) > 0
            assert pos_t[valid].max() < coarse.num_nodes
            # real fine nodes map into real coarse nodes
            cmask = np.asarray(coarse.node_mask)
            assert cmask[pos_t[valid]].all()

    def test_weighted_mlgc_prefers_heavy_edges(self):
        # node 0 has two unmatched neighbours; it must pick the heavy edge 0-2
        src = np.array([0, 0], np.int32)
        dst = np.array([1, 2], np.int32)
        w = np.array([0.1, 10.0])
        rep = graclus_cluster(src, dst, w, 3)
        assert rep[0] == rep[2]
        assert rep[1] != rep[0]
