"""Spatial (polytopes/regions), MDS, spectral clustering, graph/colormap/io
utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.spatial import (
    ConvexPolytope,
    SpaceRegion,
    find_feasible_point,
    flat_convex_hull_3d,
)
from cilantro_tpu.utils import (
    adjacency_dense,
    colormap,
    distance_dense,
    function_value_dense,
    mds,
    neighborhood_degrees,
    read_matrix_raw,
    write_matrix_raw,
)
from cilantro_tpu.clustering import spectral_clustering
from cilantro_tpu.neighbors import knn_search


CUBE = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
     [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
    np.float64,
)


class TestConvexPolytope:
    def test_cube_hull(self):
        p = ConvexPolytope.from_points(CUBE)
        assert not p.empty
        assert len(p.vertices) == 8
        area, vol = p.area_volume()
        assert abs(area - 6.0) < 1e-9
        assert abs(vol - 1.0) < 1e-9

    def test_containment(self):
        p = ConvexPolytope.from_points(CUBE)
        pts = jnp.asarray(
            np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.99, 0.99, 0.01]],
                     np.float32)
        )
        inside = np.asarray(p.contains(pts, tolerance=1e-6))
        assert inside.tolist() == [True, False, True]

    def test_halfspace_roundtrip(self):
        p = ConvexPolytope.from_points(CUBE)
        q = ConvexPolytope.from_halfspaces(p.normals, p.offsets)
        assert not q.empty
        _, vol = q.area_volume()
        assert abs(vol - 1.0) < 1e-6

    def test_intersection(self):
        a = ConvexPolytope.from_points(CUBE)
        b = ConvexPolytope.from_points(CUBE + np.array([0.5, 0.0, 0.0]))
        c = a.intersection(b)
        _, vol = c.area_volume()
        assert abs(vol - 0.5) < 1e-6

    def test_degenerate_empty(self):
        flat = CUBE.copy()
        flat[:, 2] = 0.0
        p = ConvexPolytope.from_points(flat)
        assert p.empty

    def test_transform(self):
        p = ConvexPolytope.from_points(CUBE)
        r = np.eye(3)
        t = np.array([10.0, 0.0, 0.0])
        q = p.transformed(r, t)
        inside = np.asarray(
            q.contains(jnp.asarray(np.float32([[10.5, 0.5, 0.5]])), 1e-6)
        )
        assert inside[0]

    def test_feasible_point(self):
        p = ConvexPolytope.from_points(CUBE)
        x = find_feasible_point(p.normals, p.offsets)
        assert x is not None
        assert (x > 0).all() and (x < 1).all()

    def test_flat_hull(self):
        pts = np.column_stack(
            [np.random.default_rng(0).uniform(0, 1, (50, 2)),
             np.zeros(50) + 1e-9 * np.random.default_rng(1).standard_normal(50)]
        )
        hull2, frame = flat_convex_hull_3d(pts)
        assert not hull2.empty
        assert frame.shape == (3, 3)


class TestSpaceRegion:
    def test_union_contains(self):
        a = ConvexPolytope.from_points(CUBE)
        b = ConvexPolytope.from_points(CUBE + np.array([5.0, 0, 0]))
        r = SpaceRegion([a]).union(SpaceRegion([b]))
        pts = jnp.asarray(np.float32([[0.5, 0.5, 0.5], [5.5, 0.5, 0.5], [3, 0, 0]]))
        assert np.asarray(r.contains(pts, 1e-6)).tolist() == [True, True, False]

    def test_intersection(self):
        a = SpaceRegion([ConvexPolytope.from_points(CUBE)])
        b = SpaceRegion(
            [ConvexPolytope.from_points(CUBE + np.array([0.5, 0, 0]))]
        )
        c = a.intersection(b)
        pts = jnp.asarray(np.float32([[0.75, 0.5, 0.5], [0.25, 0.5, 0.5]]))
        assert np.asarray(c.contains(pts, 1e-6)).tolist() == [True, False]

    def test_complement(self):
        a = SpaceRegion([ConvexPolytope.from_points(CUBE)])
        comp = a.complement()
        pts = jnp.asarray(np.float32([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5]]))
        assert np.asarray(comp.contains(pts, 1e-6)).tolist() == [False, True]

    def test_complement_polytopes_fully_evaluated(self):
        """Complement pieces are evaluated polytopes (space_region.hpp:84-89):
        unbounded flags, infinite measure, transformable, re-complementable."""
        comp = SpaceRegion([ConvexPolytope.from_points(CUBE)]).complement()
        assert len(comp.polytopes) > 0
        for p in comp.polytopes:
            assert not p.empty
            assert not p.bounded  # cube complement pieces are all unbounded
            area, vol = p.area_volume()
            assert area == float("inf") and vol == float("inf")
            assert p.interior_point is not None
        # transformed complement still excludes the shifted cube interior
        shifted = SpaceRegion(
            [p.transformed(np.eye(3), np.array([10.0, 0, 0]))
             for p in comp.polytopes]
        )
        pts = jnp.asarray(np.float32([[10.5, 0.5, 0.5], [12.0, 0.5, 0.5]]))
        assert np.asarray(shifted.contains(pts, 1e-6)).tolist() == [
            False, True,
        ]
        # re-complement recovers the original region's membership
        back = comp.complement()
        pts2 = jnp.asarray(np.float32([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5]]))
        assert np.asarray(back.contains(pts2, 1e-6)).tolist() == [True, False]

    def test_complement_of_empty_is_all_space(self):
        comp = SpaceRegion(
            [ConvexPolytope.from_points(CUBE[:2])]  # degenerate → empty
        ).complement()
        pts = jnp.asarray(np.float32([[0.0, 0.0, 0.0], [1e4, -1e4, 42.0]]))
        assert np.asarray(comp.contains(pts, 1e-6)).all()


class TestPolytopeTopologyAndUnbounded:
    def test_face_topology_consistency(self):
        p = ConvexPolytope.from_points(CUBE)
        nf = len(p.faces)
        assert p.face_neighbors is not None and p.face_neighbors.shape == (
            nf, 3,
        )
        assert ((p.face_neighbors >= 0) & (p.face_neighbors < nf)).all()
        # neighbor facets share an edge (2 common vertices, triangulated 3D)
        for f, nbrs in enumerate(p.face_neighbors):
            for g in nbrs:
                assert len(set(p.faces[f]) & set(p.faces[g])) == 2
        # vertex-facet incidence inverts the facet-vertex lists
        assert len(p.vertex_faces) == len(p.vertices)
        for v, fl in enumerate(p.vertex_faces):
            for f in fl:
                assert v in p.faces[f]
        for f, face in enumerate(p.faces):
            for v in face:
                assert f in p.vertex_faces[v]

    def test_from_halfspaces_topology(self):
        p = ConvexPolytope.from_points(CUBE)
        q = ConvexPolytope.from_halfspaces(p.normals, p.offsets)
        assert q.bounded and q.faces is not None
        assert q.face_neighbors is not None and q.vertex_faces is not None

    def test_unbounded_orthant_vertex(self):
        # x ≥ 0, y ≥ 0, z ≥ 0: unbounded cone, single vertex at the origin.
        n = -np.eye(3)
        b = np.zeros(3)
        p = ConvexPolytope.from_halfspaces(n, b)
        assert not p.empty and not p.bounded
        assert p.area_volume() == (float("inf"), float("inf"))
        inside = np.asarray(
            p.contains(jnp.asarray(np.float32([[1, 2, 3], [-1, 2, 3]])), 1e-6)
        )
        assert inside.tolist() == [True, False]

    def test_unbounded_slab_no_vertices(self):
        # 0 ≤ x ≤ 1: rank-deficient normals, no vertices.
        n = np.array([[-1.0, 0, 0], [1.0, 0, 0]])
        b = np.array([0.0, -1.0])
        p = ConvexPolytope.from_halfspaces(n, b)
        assert not p.empty and not p.bounded
        assert len(p.vertices) == 0
        inside = np.asarray(
            p.contains(
                jnp.asarray(np.float32([[0.5, 9, -9], [1.5, 0, 0]])), 1e-6
            )
        )
        assert inside.tolist() == [True, False]

    def test_redundant_halfspace_dropped(self):
        p = ConvexPolytope.from_points(CUBE)
        n = np.vstack([p.normals, [[1.0, 0, 0]]])  # x ≤ 5: redundant
        b = np.concatenate([p.offsets, [-5.0]])
        q = ConvexPolytope.from_halfspaces(n, b)
        _, vol = q.area_volume()
        assert abs(vol - 1.0) < 1e-6


class TestMDS:
    def test_recovers_planar_config(self, rng):
        pts = rng.uniform(-1, 1, (40, 2)).astype(np.float32)
        d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
        res = mds(jnp.asarray(d), 2)
        emb = np.asarray(res.embedding)
        d2 = np.linalg.norm(emb[:, None, :] - emb[None, :, :], axis=-1)
        np.testing.assert_allclose(d2, d, atol=1e-3)


class TestSpectral:
    def test_two_blobs(self, rng):
        pts = np.concatenate(
            [rng.standard_normal((30, 2)) * 0.1,
             rng.standard_normal((30, 2)) * 0.1 + 5.0]
        ).astype(np.float32)
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        aff = np.exp(-d2 / 0.5)
        res = spectral_clustering(jax.random.PRNGKey(0), jnp.asarray(aff), 2)
        labels = np.asarray(res.labels)
        assert (labels[:30] == labels[0]).all()
        assert (labels[30:] == labels[30]).all()
        assert labels[0] != labels[30]


class TestGraphUtils:
    def test_adjacency_and_degrees(self, rng):
        pts = jnp.asarray(rng.standard_normal((20, 3)).astype(np.float32))
        nb = knn_search(pts, pts, 4, exclude_self=True)
        deg = np.asarray(neighborhood_degrees(nb))
        assert (deg == 4).all()
        adj = np.asarray(adjacency_dense(nb))
        assert adj.shape == (20, 20)
        assert (adj == adj.T).all()
        dm = np.asarray(distance_dense(nb))
        assert (dm >= 0).all()
        fv = np.asarray(function_value_dense(nb, lambda d: jnp.exp(-d)))
        assert fv.max() <= 1.0


class TestColormapIO:
    def test_colormaps_in_range(self):
        v = jnp.linspace(0.0, 1.0, 11)
        for name in ("jet", "gray", "blue2red"):
            c = np.asarray(colormap(v, name))
            assert c.shape == (11, 3)
            assert c.min() >= 0.0 and c.max() <= 1.0

    def test_matrix_raw_roundtrip(self, tmp_path):
        m = np.arange(12, dtype=np.float32).reshape(3, 4)
        p = str(tmp_path / "m.bin")
        write_matrix_raw(p, m)
        np.testing.assert_array_equal(read_matrix_raw(p), m)


class TestSpectralKNN:
    """Large-N iterative path: masked kNN graph + LOBPCG on σI − L."""

    def _blobs(self, rng, n_per=120, k=3, dim=3, sep=6.0):
        pts = np.concatenate(
            [rng.standard_normal((n_per, dim)) * 0.2 + sep * i
             for i in range(k)]
        ).astype(np.float32)
        return pts

    def _graph(self, pts, k=8, sigma2=0.5):
        nb = knn_search(jnp.asarray(pts), jnp.asarray(pts), k,
                        exclude_self=True)
        w = jnp.where(nb.mask, jnp.exp(-nb.distances / sigma2), 0.0)
        return nb.indices, w, nb.mask

    def test_eigenvalues_match_dense(self, rng):
        from cilantro_tpu.clustering import (
            laplacian,
            spectral_embedding_knn,
        )

        pts = self._blobs(rng, n_per=60, k=2)
        idx, w, mask = self._graph(pts)
        n = len(pts)
        # dense symmetrized affinity from the same graph
        a = np.zeros((n, n), np.float32)
        iw, im = np.asarray(w), np.asarray(mask)
        ii = np.asarray(idx)
        for q in range(n):
            for j in range(ii.shape[1]):
                if im[q, j]:
                    a[q, ii[q, j]] += 0.5 * iw[q, j]
                    a[ii[q, j], q] += 0.5 * iw[q, j]
        for kind in ("normalized", "unnormalized"):
            lap = np.asarray(laplacian(jnp.asarray(a), kind))
            dense_vals = np.sort(np.linalg.eigvalsh(lap))[:4]
            emb, vals = spectral_embedding_knn(
                jax.random.PRNGKey(1), idx, w, mask, 4, kind=kind,
                max_iterations=200,
            )
            np.testing.assert_allclose(
                np.asarray(vals), dense_vals, atol=2e-4, err_msg=kind
            )
            # eigenvector subspace check: L v ≈ λ v for each returned pair
            resid = lap @ np.asarray(emb) - np.asarray(emb) * np.asarray(vals)
            assert np.abs(resid).max() < 5e-3, kind

    def test_clusters_three_blobs(self, rng):
        from cilantro_tpu.clustering import spectral_clustering_knn

        pts = self._blobs(rng, n_per=150, k=3)
        idx, w, mask = self._graph(pts)
        res = spectral_clustering_knn(
            jax.random.PRNGKey(0), idx, w, mask, 3, max_iterations=150,
        )
        labels = np.asarray(res.labels)
        for b in range(3):
            blk = labels[150 * b : 150 * (b + 1)]
            assert (blk == blk[0]).all()
        assert len({labels[0], labels[150], labels[300]}) == 3

    def test_large_n_smoke(self, rng):
        """21k points — far beyond any dense (N, N) affinity — cluster
        correctly through the iterative path. A denser graph (k=12) keeps
        the within-blob Fiedler values away from the component zero-modes
        (with k=6 the bottom of the spectrum packs at ~1e-3 and needs far
        more iterations — the same trade Spectra/Lanczos faces)."""
        from cilantro_tpu.clustering import spectral_clustering_knn

        pts = self._blobs(rng, n_per=7000, k=3, sep=8.0)
        idx, w, mask = self._graph(pts, k=12, sigma2=2.0)
        res = spectral_clustering_knn(
            jax.random.PRNGKey(0), idx, w, mask, 3, max_iterations=100,
            filter_degree=16,
        )
        labels = np.asarray(res.labels)
        for b in range(3):
            blk = labels[7000 * b : 7000 * (b + 1)]
            # overwhelming-majority agreement per blob
            assert (blk == np.bincount(blk).argmax()).mean() > 0.999
        assert len({int(np.bincount(labels[7000*b:7000*(b+1)]).argmax())
                    for b in range(3)}) == 3
