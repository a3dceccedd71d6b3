"""Fusion (frame-to-model SLAM) tests on a synthetic rendered scene."""

import numpy as np
import jax.numpy as jnp

from cilantro_tpu.core import CameraIntrinsics, depth_to_points_normals
from cilantro_tpu.core.transforms import Transform, compose, inverse
from cilantro_tpu.slam import (
    FusionConfig,
    init_map_from_frame,
    integrate_frame,
    localize,
)

K = CameraIntrinsics.make(100.0, 100.0, 31.5, 23.5)
H, W = 48, 64


def wavy_depth(phase=0.0):
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    return (
        1.5
        + 0.05 * np.sin(0.2 * u + phase)
        + 0.05 * np.cos(0.15 * v)
    ).astype(np.float32)


def frame_from_depth(d):
    pts, nrm, valid = depth_to_points_normals(jnp.asarray(d), K)
    return pts, nrm, valid


def small_pose(ang=0.008, t=(0.004, -0.002, 0.003)):
    r = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    return Transform(jnp.asarray(r), jnp.asarray(np.array(t, np.float32)))


class TestFusion:
    def test_localize_recovers_pose(self):
        pts, nrm, valid = frame_from_depth(wavy_depth())
        fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
        # Second frame: same scene seen from a moved camera.
        pose2 = small_pose()
        cam2 = inverse(pose2)
        pts2 = cam2.apply(pts)
        nrm2 = cam2.apply_normals(nrm)
        pose_est, res = localize(
            fmap,
            pts2,
            nrm2,
            valid,
            Transform(jnp.eye(3), jnp.zeros(3)),  # identity guess
            K,
            height=H,
            width=W,
            cfg=FusionConfig(icp_iterations=10, icp_convergence_tol=1e-6),
        )
        assert (
            np.linalg.norm(np.asarray(pose_est.linear) - np.asarray(pose2.linear))
            < 2e-3
        )
        assert (
            np.linalg.norm(
                np.asarray(pose_est.translation) - np.asarray(pose2.translation)
            )
            < 2e-3
        )

    def test_localize_multi_gn_steps(self):
        """icp_gn_iterations=2 (the reference's max_optimization_iterations
        knob) recovers the same pose with fewer correspondence updates."""
        pts, nrm, valid = frame_from_depth(wavy_depth())
        fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
        pose2 = small_pose()
        cam2 = inverse(pose2)
        pose_est, res = localize(
            fmap,
            cam2.apply(pts),
            cam2.apply_normals(nrm),
            valid,
            Transform(jnp.eye(3), jnp.zeros(3)),
            K,
            height=H,
            width=W,
            cfg=FusionConfig(
                icp_iterations=5,
                icp_gn_iterations=2,
                icp_convergence_tol=1e-6,
            ),
        )
        assert (
            np.linalg.norm(np.asarray(pose_est.linear) - np.asarray(pose2.linear))
            < 2e-3
        )
        assert (
            np.linalg.norm(
                np.asarray(pose_est.translation) - np.asarray(pose2.translation)
            )
            < 2e-3
        )

    def test_coalesced_gathers_bit_identical(self):
        """The run-coalescing DMA gather path (localize + integrate) yields
        bit-identical poses and pools (interpret-mode kernel on CPU)."""
        from cilantro_tpu.slam.fusion import fusion_step

        frames = [
            frame_from_depth(wavy_depth(p)) for p in (0.0, 0.2, 0.4)
        ]
        out = {}
        for coal in (False, True):
            cfg = FusionConfig(coalesced_gathers=coal)
            pts, nrm, valid = frames[0]
            fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
            pose = Transform(jnp.eye(3), jnp.zeros(3))
            mats = []
            for pts, nrm, valid in frames[1:]:
                fmap, pose, _, _, _ = fusion_step(
                    fmap, pts, nrm, None, valid, pose, K,
                    height=H, width=W, cfg=cfg,
                )
                mats.append(np.asarray(pose.matrix()))
            out[coal] = (np.asarray(fmap.data), np.stack(mats))
        np.testing.assert_array_equal(out[False][0], out[True][0])
        np.testing.assert_array_equal(out[False][1], out[True][1])

    def test_integrate_fuses_not_grows(self):
        pts, nrm, valid = frame_from_depth(wavy_depth())
        fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
        n0 = int(fmap.num_points())
        # Integrating the identical frame at identity pose must fuse ~all.
        fmap2 = integrate_frame(
            fmap, pts, nrm, None, valid,
            Transform(jnp.eye(3), jnp.zeros(3)), K, height=H, width=W,
        )
        n1 = int(fmap2.num_points())
        assert n1 <= n0 * 1.05  # no runaway growth
        # Fused confidence grows by w = radial/(radial + conf) per observation
        # (fusion.cpp:194-203): starting at 1.0, most points must now exceed it.
        conf = np.asarray(fmap2.confidence)
        assert (conf > 1.2).sum() > 0.8 * n0

    def test_integrate_augments_new_geometry(self):
        d1 = wavy_depth()
        d1[:, W // 2 :] = 0.0  # first frame sees only the left half
        pts1, nrm1, v1 = frame_from_depth(d1)
        fmap = init_map_from_frame(H * W * 2, pts1, nrm1, None, v1)
        n0 = int(fmap.num_points())

        d2 = wavy_depth()  # second frame sees everything
        pts2, nrm2, v2 = frame_from_depth(d2)
        fmap2 = integrate_frame(
            fmap, pts2, nrm2, None, v2,
            Transform(jnp.eye(3), jnp.zeros(3)), K, height=H, width=W,
        )
        n1 = int(fmap2.num_points())
        assert n1 > n0 * 1.5  # right half augmented

    def test_carve_removes_floaters(self):
        pts, nrm, valid = frame_from_depth(wavy_depth())
        fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
        # Inject floating junk points in front of the surface (z = 0.5).
        # Keep junk inside the view frustum: u = x·fx/z + cx ∈ [0, 64).
        junk = np.zeros((50, 3), np.float32)
        junk[:, 0] = np.linspace(-0.14, 0.14, 50)
        junk[:, 2] = 0.5
        fmap = fmap.replace_fields(
            points=fmap.points.at[-50:].set(jnp.asarray(junk)),
            normals=fmap.normals.at[-50:].set(
                jnp.asarray(np.tile([0, 0, -1.0], (50, 1)).astype(np.float32))
            ),
            confidence=fmap.confidence.at[-50:].set(1.0),
            valid=fmap.valid.at[-50:].set(True),
        )
        fmap2 = integrate_frame(
            fmap, pts, nrm, None, valid,
            Transform(jnp.eye(3), jnp.zeros(3)), K, height=H, width=W,
        )
        still_there = np.asarray(fmap2.valid)[-50:]
        assert still_there.sum() < 10  # floaters carved

    def test_carve_refuses_grazing_angle(self):
        """A floater seen edge-on (view angle > 45°) must NOT be carved
        (fusion.cpp:219-224)."""
        pts, nrm, valid = frame_from_depth(wavy_depth())
        fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
        junk = np.zeros((50, 3), np.float32)
        junk[:, 0] = np.linspace(-0.14, 0.14, 50)
        junk[:, 2] = 0.5
        # Normals perpendicular to the view ray → grazing incidence.
        grazing = np.tile([0.0, 1.0, 0.0], (50, 1)).astype(np.float32)
        fmap = fmap.replace_fields(
            points=fmap.points.at[-50:].set(jnp.asarray(junk)),
            normals=fmap.normals.at[-50:].set(jnp.asarray(grazing)),
            confidence=fmap.confidence.at[-50:].set(1.0),
            valid=fmap.valid.at[-50:].set(True),
        )
        fmap2 = integrate_frame(
            fmap, pts, nrm, None, valid,
            Transform(jnp.eye(3), jnp.zeros(3)), K, height=H, width=W,
        )
        still_there = np.asarray(fmap2.valid)[-50:]
        assert still_there.sum() == 50  # view-angle gate refuses the carve

    def test_fuse_refuses_normal_disagreement(self):
        """Depth-compatible but normal-flipped observations must not fuse
        (75° gate, fusion.cpp:190-193)."""
        pts, nrm, valid = frame_from_depth(wavy_depth())
        fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
        conf0 = np.asarray(fmap.confidence).copy()
        flipped = -nrm
        fmap2 = integrate_frame(
            fmap, pts, flipped, None, valid,
            Transform(jnp.eye(3), jnp.zeros(3)), K, height=H, width=W,
        )
        conf1 = np.asarray(fmap2.confidence)
        was_valid = np.asarray(fmap.valid)
        n_valid = int(was_valid.sum())
        # No fuse events on previously-valid slots (confidence unchanged
        # there; >105° disagreement legitimately augments into FREE slots).
        grew = ((conf1 > conf0 + 1e-6) & was_valid).sum()
        assert grew < 0.02 * n_valid

    def test_augment_requires_empty_neighborhood(self):
        """A single-pixel model hole surrounded by occupied pixels must not
        spawn a new point (fusion.cpp:204-207)."""
        pts, nrm, valid = frame_from_depth(wavy_depth())
        # Model = frame minus one interior point → its pixel is empty but all
        # 4 neighbors are occupied.
        hole = (H // 2) * W + W // 2
        v_hole = np.asarray(valid).copy()
        v_hole[hole] = False
        fmap = init_map_from_frame(
            H * W * 2, pts, nrm, None, jnp.asarray(v_hole)
        )
        n0 = int(fmap.num_points())
        fmap2 = integrate_frame(
            fmap, pts, nrm, None, valid,
            Transform(jnp.eye(3), jnp.zeros(3)), K, height=H, width=W,
        )
        n1 = int(fmap2.num_points())
        assert n1 == n0  # hole not re-augmented (neighbors occupied)

    def test_reuse_carved_slots_mode(self):
        """The exact free-slot machinery (reuse_carved_slots=True) reclaims
        holes; the default tail allocator appends past the highest slot."""
        pts, nrm, valid = frame_from_depth(wavy_depth())
        cfg_exact = FusionConfig(reuse_carved_slots=True)
        fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
        # Punch holes: invalidate 100 early slots.
        v = np.asarray(fmap.valid).copy()
        holes = np.flatnonzero(v)[:100]
        v[holes] = False
        fmap = fmap.replace_fields(valid=jnp.asarray(v))
        # A frame with fresh geometry on the right (augments).
        d2 = wavy_depth(phase=0.5)
        pts2, nrm2, v2 = frame_from_depth(d2)
        fm_exact = integrate_frame(
            fmap, pts2, nrm2, None, v2,
            Transform(jnp.eye(3), jnp.zeros(3)), K, height=H, width=W,
            cfg=cfg_exact,
        )
        fm_tail = integrate_frame(
            fmap, pts2, nrm2, None, v2,
            Transform(jnp.eye(3), jnp.zeros(3)), K, height=H, width=W,
        )
        v_old = np.asarray(fmap.valid)
        v_exact = np.asarray(fm_exact.valid)
        v_tail = np.asarray(fm_tail.valid)
        new_exact = np.flatnonzero(v_exact & ~v_old)
        new_tail = np.flatnonzero(v_tail & ~v_old)
        assert len(new_exact) > 0 and len(new_tail) > 0  # augments happened
        top_old = np.flatnonzero(v_old).max()
        # Tail mode appends strictly past the highest valid slot; exact mode
        # reclaims free slots below it first.
        assert (new_tail > top_old).all()
        assert (new_exact < top_old).any()
        # Same number of surviving+new points in both modes.
        assert abs(int(v_exact.sum()) - int(v_tail.sum())) <= 100

    def test_compact_map(self):
        """compact_map moves valid rows to the front (stable) so the tail
        allocator can reclaim carved holes."""
        from cilantro_tpu.slam import compact_map

        pts, nrm, valid = frame_from_depth(wavy_depth())
        fmap = init_map_from_frame(H * W * 2, pts, nrm, None, valid)
        v = np.asarray(fmap.valid).copy()
        holes = np.flatnonzero(v)[10:200:3]
        v[holes] = False
        fmap = fmap.replace_fields(valid=jnp.asarray(v))
        n0 = int(fmap.num_points())
        before = np.asarray(fmap.points)[np.asarray(fmap.valid)]
        cm = compact_map(fmap)
        assert int(cm.num_points()) == n0
        vc = np.asarray(cm.valid)
        assert vc[:n0].all() and not vc[n0:].any()  # contiguous prefix
        after = np.asarray(cm.points)[:n0]
        np.testing.assert_array_equal(after, before)  # stable order


class TestPoolWidths:
    """The packed pool has two layouts: (C, 16) with colors, (C, 8) without
    (narrow rows make the combined scatter ~25% cheaper on TPU). Geometry
    and trajectory must be identical across layouts."""

    def test_width8_width16_same_geometry(self):
        from cilantro_tpu.slam import fusion_step
        from cilantro_tpu.slam.fusion import _valid_col

        d0, d1 = wavy_depth(0.0), wavy_depth(0.35)
        pts0, nrm0, val0 = frame_from_depth(d0)
        pts1, nrm1, val1 = frame_from_depth(d1)
        cap = 2 * H * W
        colors0 = jnp.ones((H * W, 3), jnp.float32) * 0.5
        colors1 = jnp.ones((H * W, 3), jnp.float32) * 0.8

        m8 = init_map_from_frame(
            cap, pts0, nrm0, None, val0, with_color_slots=False
        )
        m16 = init_map_from_frame(cap, pts0, nrm0, colors0, val0)
        assert m8.data.shape[1] == 8 and m16.data.shape[1] == 16
        assert m8.colors is None and m16.colors is not None

        from cilantro_tpu.core.transforms import identity

        pose = identity(3)
        m8b, p8, r8, _, _ = fusion_step(
            m8, pts1, nrm1, None, val1, pose, K, height=H, width=W,
        )
        m16b, p16, r16, _, _ = fusion_step(
            m16, pts1, nrm1, colors1, val1, pose, K, height=H, width=W,
        )
        np.testing.assert_allclose(
            np.asarray(p8.matrix()), np.asarray(p16.matrix()), atol=1e-6
        )
        d8 = np.asarray(m8b.data)
        d16 = np.asarray(m16b.data)
        v8 = d8[:, _valid_col(8)] > 0.5
        v16 = d16[:, _valid_col(16)] > 0.5
        np.testing.assert_array_equal(v8, v16)
        np.testing.assert_allclose(d8[v8, 0:3], d16[v16, 0:3], atol=1e-6)
        np.testing.assert_allclose(d8[v8, 3:6], d16[v16, 3:6], atol=1e-6)
        np.testing.assert_allclose(
            d8[v8, 6], d16[v16, 9], atol=1e-6
        )  # confidence

    def test_colors_into_width8_pool_rejected(self):
        import pytest

        from cilantro_tpu.slam import fusion_step

        d0, d1 = wavy_depth(0.0), wavy_depth(0.35)
        pts0, nrm0, val0 = frame_from_depth(d0)
        pts1, nrm1, val1 = frame_from_depth(d1)
        m8 = init_map_from_frame(
            2 * H * W, pts0, nrm0, None, val0, with_color_slots=False
        )
        from cilantro_tpu.core.transforms import identity

        with pytest.raises(ValueError, match="width-8"):
            fusion_step(
                m8, pts1, nrm1, jnp.zeros((H * W, 3)), val1, identity(3),
                K, height=H, width=W,
            )

    def test_update_modes_bit_identical(self):
        """inverse_gather and row_scatter are two lowerings of the same
        update — the resulting pools must match bit for bit, including
        augments and carves."""
        d1 = wavy_depth()
        d1[:, W // 2 :] = 0.0  # leave room for augments
        pts1, nrm1, v1 = frame_from_depth(d1)
        # Put a floater in front so the carve path fires too.
        pts1 = pts1.at[5 * W + 5].set(jnp.array([0.0, 0.0, 0.8]))
        fmap = init_map_from_frame(H * W * 2, pts1, nrm1, None, v1)

        pts2, nrm2, v2 = frame_from_depth(wavy_depth())
        pose = small_pose(ang=0.0, t=(0.0, 0.0, 0.0))
        out = {}
        for mode in ("row_scatter", "inverse_gather"):
            out[mode] = integrate_frame(
                fmap, pts2, nrm2, None, v2, pose, K, height=H, width=W,
                cfg=FusionConfig(update_mode=mode),
            )
        a = np.asarray(out["row_scatter"].data)
        b = np.asarray(out["inverse_gather"].data)
        np.testing.assert_array_equal(a, b)
        # auto at capacity 2·H·W resolves to inverse_gather
        c = integrate_frame(
            fmap, pts2, nrm2, None, v2, pose, K, height=H, width=W,
            cfg=FusionConfig(update_mode="auto"),
        )
        np.testing.assert_array_equal(a, np.asarray(c.data))
