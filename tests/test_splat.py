"""Splat kernels (interpret mode) vs numpy references, plus end-to-end
splat fusion on a synthetic sequence against ground truth and the pool
pipeline (ADVICE r3 #4: the splat modules landed with no tests)."""

import numpy as np
import jax
import jax.numpy as jnp

from cilantro_tpu.core.rgbd import CameraIntrinsics
from cilantro_tpu.slam.driver import ate_rmse, run_fusion_sequence
from cilantro_tpu.slam.splat import (
    flow_select_rows,
    offset_code,
    pad_hw,
    splat_argmin2,
    window_read_codes,
)
from cilantro_tpu.slam.splat_fusion import (
    SplatConfig,
    extract_cloud,
    run_splat_sequence,
    run_splat_sequence_scanned,
)

R = 2
W2 = 2 * R + 1


def _decode(oc):
    dv, du = divmod(int(oc), W2)
    return dv - R, du - R


def _argmin2_ref(key, off, layers):
    """Per-target best/second (key, code) with kernel tie order (l, dv, du)."""
    l, h, w = key.shape
    best_k = np.full((h, w), np.inf, np.float32)
    best_c = np.full((h, w), -1, np.int64)
    sec_k = np.full((h, w), np.inf, np.float32)
    sec_c = np.full((h, w), -1, np.int64)
    for li in range(l):
        for dv in range(-R, R + 1):
            for du in range(-R, R + 1):
                oc = (dv + R) * W2 + (du + R)
                code = oc * layers + li
                for y in range(h):
                    ty = y + dv
                    if not (0 <= ty < h):
                        continue
                    for x in range(w):
                        tx = x + du
                        if not (0 <= tx < w):
                            continue
                        if off[li, y, x] != oc:
                            continue
                        k = key[li, y, x]
                        if k < best_k[ty, tx]:
                            sec_k[ty, tx] = best_k[ty, tx]
                            sec_c[ty, tx] = best_c[ty, tx]
                            best_k[ty, tx] = k
                            best_c[ty, tx] = code
                        elif k < sec_k[ty, tx]:
                            sec_k[ty, tx] = k
                            sec_c[ty, tx] = code
    return best_k, best_c, sec_k, sec_c


def _random_key_off(rng, layers, h, w):
    key = rng.random((layers, h, w)).astype(np.float32)
    off = rng.integers(-1, W2 * W2, size=(layers, h, w)).astype(np.int32)
    key[off < 0] = np.inf
    return key, off


def test_splat_argmin2_matches_reference():
    rng = np.random.default_rng(0)
    layers, h, w = 2, 32, 48  # w NOT a multiple of 128: exercises lane pad
    key, off = _random_key_off(rng, layers, h, w)
    bk, bc, sk, sc = splat_argmin2(
        pad_hw(jnp.asarray(key), R, jnp.inf)[None],
        pad_hw(jnp.asarray(off), R, -1)[None],
        radius=R,
    )
    rk, rc, rsk, rsc = _argmin2_ref(key, off, layers)
    np.testing.assert_allclose(np.asarray(bk[0]), rk)
    np.testing.assert_array_equal(np.asarray(bc[0]), rc)
    np.testing.assert_allclose(np.asarray(sk[0]), rsk)
    np.testing.assert_array_equal(np.asarray(sc[0]), rsc)
    assert bk.shape == (1, h, w)


def test_flow_select_rows_matches_reference():
    rng = np.random.default_rng(1)
    layers, chans, h, w = 2, 5, 32, 48
    rows = rng.standard_normal((layers, chans, h, w)).astype(np.float32)
    key, off = _random_key_off(rng, layers, h, w)
    _, bc, _, _ = splat_argmin2(
        pad_hw(jnp.asarray(key), R, jnp.inf)[None],
        pad_hw(jnp.asarray(off), R, -1)[None],
        radius=R,
    )
    sel = flow_select_rows(
        pad_hw(jnp.asarray(rows), R, 0.0)[None], bc, radius=R
    )[0]
    bc_np = np.asarray(bc[0])
    want = np.zeros((chans, h, w), np.float32)
    for y in range(h):
        for x in range(w):
            code = bc_np[y, x]
            if code < 0:
                continue
            li = code % layers
            dv, du = _decode(code // layers)
            want[:, y, x] = rows[li, :, y - dv, x - du]
    np.testing.assert_allclose(np.asarray(sel), want)


def test_window_read_codes_matches_reference():
    rng = np.random.default_rng(2)
    chans, h, w = 3, 32, 48
    img = rng.integers(-1000, 1000, size=(chans, h, w)).astype(np.int32)
    off = rng.integers(-1, W2 * W2, size=(h, w)).astype(np.int32)
    out = window_read_codes(
        pad_hw(jnp.asarray(img), R, -1)[None],
        jnp.asarray(off)[None],
        radius=R,
    )[0]
    want = np.full((chans, h, w), -1, np.int32)
    for y in range(h):
        for x in range(w):
            if off[y, x] < 0:
                continue
            dv, du = _decode(off[y, x])
            ty, tx = y + dv, x + du
            if 0 <= ty < h and 0 <= tx < w:
                want[:, y, x] = img[:, ty, tx]
            else:
                want[:, y, x] = -1  # pad fill
    np.testing.assert_array_equal(np.asarray(out), want)


def test_offset_code_roundtrip():
    for dv in range(-R, R + 1):
        for du in range(-R, R + 1):
            oc = int(offset_code(jnp.int32(du), jnp.int32(dv), R))
            assert _decode(oc) == (dv, du)
    assert int(offset_code(jnp.int32(R + 1), jnp.int32(0), R)) == -1


H, W = 128, 160  # H + 2*margin must divide the kernel band (16)

import pytest  # noqa: E402


def _sequence(frames=4, seed=0):
    from cilantro_tpu.slam import synthetic_sequence

    k = CameraIntrinsics.make(140.0, 140.0, W / 2 - 0.5, H / 2 - 0.5)
    depths, gt = synthetic_sequence(frames, H, W, k, seed=seed)
    return depths, gt, k


@pytest.fixture(scope="module")
def splat_run():
    """One shared host-loop splat run (interpret-mode kernels are the slow
    part of this file — compute once, assert twice)."""
    depths, gt, k = _sequence()
    cfg = SplatConfig(radius=4, margin=16)
    smap, poses, _ = run_splat_sequence(depths, k, cfg=cfg)
    return depths, gt, k, cfg, smap, poses


def test_splat_sequence_tracks_and_matches_pool(splat_run):
    depths, gt, k, cfg, smap, poses = splat_run
    ate = ate_rmse(poses, gt)
    assert ate < 2e-3, f"splat ATE {ate*1e3:.2f} mm"

    # Pool pipeline on the same frames: trajectories must agree closely.
    fmap, m = run_fusion_sequence(depths, k, map_capacity=4 * H * W)
    cross = ate_rmse(poses, m.poses)
    assert cross < 2e-3, f"splat-vs-pool ATE {cross*1e3:.2f} mm"

    pts, nrm, conf = extract_cloud(smap)
    assert len(pts) > 0.5 * H * W  # a dense surface survived
    assert np.isfinite(pts).all() and np.isfinite(nrm).all()
    # Surfel cloud lies on the observed surface: median distance from the
    # final pool map's points is small.
    pool_pts = np.asarray(fmap.points)[np.asarray(fmap.valid)]
    from cilantro_tpu.neighbors import nn1

    d, _ = nn1(jnp.asarray(pts[:2000]), jnp.asarray(pool_pts))
    assert float(np.median(np.asarray(d))) < 1e-5  # squared-L2 (≈3 mm)


def test_splat_scanned_matches_host_loop():
    """Scanned splat == host loop. Runs its own SMALLER config (radius 2:
    25 window offsets instead of 81): the radius-4 scanned program's
    interpret-mode HLO is large enough that XLA's CPU backend aborted
    compiling it late in a full-suite run (fine standalone — the crash
    needs a process with hundreds of prior compiles), and the
    scan-vs-loop equivalence this asserts is radius-independent."""
    depths, gt, k = _sequence(frames=3)
    cfg = SplatConfig(radius=2, margin=16)
    _, poses_h, _ = run_splat_sequence(depths, k, cfg=cfg)
    _, poses_s, _ = run_splat_sequence_scanned(depths, k, cfg=cfg)
    for a, b in zip(poses_h, poses_s):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_splat_argmin2_halo_across_radii():
    """The sublane-halo padding (halo = radius rounded up to 4) must keep
    elections exact for every radius class: halo > r (r=1,2,3), halo == r
    (r=4), and the next halo step (r=5 -> halo 8). Radius 2 faulted the
    real chip before the halo fix; the bench smoke covers on-chip, this
    pins the wrapper arithmetic for all classes in interpret mode."""
    rng = np.random.default_rng(7)
    for r in (1, 3, 5):
        w2 = 2 * r + 1
        layers, h, w = 2, 32, 40
        key = rng.random((layers, h, w)).astype(np.float32)
        off = rng.integers(-1, w2 * w2, size=(layers, h, w)).astype(np.int32)
        key[off < 0] = np.inf
        bk, bc, _, _ = splat_argmin2(
            pad_hw(jnp.asarray(key), r, jnp.inf)[None],
            pad_hw(jnp.asarray(off), r, -1)[None],
            radius=r,
        )
        best = np.full((h, w), np.inf, np.float32)
        for li in range(layers):
            for y in range(h):
                for x in range(w):
                    oc = off[li, y, x]
                    if oc < 0:
                        continue
                    dv, du = divmod(int(oc), w2)
                    ty, tx = y + dv - r, x + du - r
                    if 0 <= ty < h and 0 <= tx < w:
                        best[ty, tx] = min(best[ty, tx], key[li, y, x])
        np.testing.assert_allclose(
            np.asarray(bk[0]), best, err_msg=f"radius {r}"
        )
