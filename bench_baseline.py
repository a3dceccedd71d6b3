"""Single-core CPU baselines (numpy/scipy) for bench.py.

These implement the same algorithms the reference C++ runs (cilantro itself
cannot be compiled here — no Eigen on the image, see BASELINE.md), in the
same algorithmic class: cKDTree NN for the kd-tree path, z-buffered
projective matching + point-to-plane GN for the fusion path. All
single-threaded.
"""

from __future__ import annotations

import numpy as np


def backproject(depth, fx, fy, cx, cy):
    h, w = depth.shape
    v, u = np.mgrid[0:h, 0:w]
    z = depth
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    return pts, (z > 0).reshape(-1)


def image_normals(depth, fx, fy, cx, cy):
    pts, valid = backproject(depth, fx, fy, cx, cy)
    h, w = depth.shape
    p = pts.reshape(h, w, 3)
    du = np.roll(p, -1, 1) - np.roll(p, 1, 1)
    dv = np.roll(p, -1, 0) - np.roll(p, 1, 0)
    n = np.cross(dv, du)
    nn = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(nn, 1e-30)
    flip = np.sum(n * p, axis=-1, keepdims=True) > 0
    n = np.where(flip, -n, n)
    return pts, n.reshape(-1, 3), valid


def zbuffer_index(points, valid, fx, fy, cx, cy, h, w):
    z = points[:, 2]
    ok = valid & (z > 0)
    u = np.round(points[:, 0] * fx / np.where(ok, z, 1.0) + cx).astype(np.int64)
    v = np.round(points[:, 1] * fy / np.where(ok, z, 1.0) + cy).astype(np.int64)
    ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
    pix = np.where(ok, v * w + u, h * w)
    zmin = np.full(h * w + 1, np.inf)
    np.minimum.at(zmin, pix, np.where(ok, z, np.inf))
    idx = np.full(h * w + 1, -1, np.int64)
    win = ok & (z <= zmin[pix])
    idx[pix[win]] = np.flatnonzero(win)
    return idx[: h * w], zmin[: h * w]


def fusion_cpu(depths, fx, fy, cx, cy, icp_iters=6, fuse_depth=0.01, occl=0.025,
               timing=False):
    """Single-core frame-to-model fusion: projective combined-metric ICP +
    fuse/augment/carve map update. Returns poses (list of 4x4); with
    ``timing=True`` returns ``(poses, loop_seconds)`` where the clock starts
    AFTER frame-0 back-projection/map init — the same work boundary the C++
    baseline's ``out_ms`` uses, so the two per-frame figures divide the same
    (len(depths) - 1) tracked frames over the same measured span."""
    import time as _time

    h, w = depths[0].shape
    pts, nrm, valid = image_normals(depths[0], fx, fy, cx, cy)
    m_pts = pts[valid].copy()
    m_nrm = nrm[valid].copy()
    m_conf = np.ones(len(m_pts))
    pose = np.eye(4)
    poses = [pose.copy()]
    t_loop = _time.perf_counter()
    for fi in range(1, len(depths)):
        f_pts, f_nrm, f_valid = image_normals(depths[fi], fx, fy, cx, cy)
        r, t = pose[:3, :3], pose[:3, 3]
        model_cam = (m_pts - t) @ r
        model_nrm_cam = m_nrm @ r
        imap, _ = zbuffer_index(
            model_cam, np.ones(len(model_cam), bool), fx, fy, cx, cy, h, w
        )
        # ICP (delta composed onto pose).
        dr, dt = np.eye(3), np.zeros(3)
        for _ in range(icp_iters):
            s = f_pts @ dr.T + dt
            z = s[:, 2]
            ok = f_valid & (z > 0)
            u = np.round(s[:, 0] * fx / np.where(ok, z, 1) + cx).astype(np.int64)
            v = np.round(s[:, 1] * fy / np.where(ok, z, 1) + cy).astype(np.int64)
            ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
            hit = np.where(ok, imap[np.clip(v * w + u, 0, h * w - 1)], -1)
            ok &= hit >= 0
            d = model_cam[np.clip(hit, 0, None)]
            diff = d - s
            ok &= np.sum(diff * diff, axis=1) <= 0.01
            sp, dp = s[ok], d[ok]
            dn = model_nrm_cam[hit[ok]]
            j = np.concatenate([np.cross(sp, dn), dn], axis=1)
            res = np.einsum("ni,ni->n", dn, sp - dp)
            jtj = j.T @ j + 1e-9 * np.eye(6)
            x = np.linalg.solve(jtj, -j.T @ res)
            wv, tv = x[:3], x[3:]
            th = np.linalg.norm(wv)
            if th > 1e-12:
                ax = wv / th
                k = np.array(
                    [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
                )
                rr = np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * (k @ k)
            else:
                rr = np.eye(3)
            dr = rr @ dr
            dt = rr @ dt + tv
            if np.linalg.norm(x) < 5e-4:
                break
        delta = np.eye(4)
        delta[:3, :3], delta[:3, 3] = dr, dt
        pose = pose @ delta
        poses.append(pose.copy())
        # Map update.
        r, t = pose[:3, :3], pose[:3, 3]
        model_cam = (m_pts - t) @ r
        imap, mdepth = zbuffer_index(
            model_cam, np.ones(len(model_cam), bool), fx, fy, cx, cy, h, w
        )
        fd = f_pts[:, 2]
        f_ok = f_valid & (fd > 0)
        m_ok = imap >= 0
        both = f_ok & m_ok
        midx = np.clip(imap, 0, None)
        ddiff = fd - mdepth
        do_fuse = both & (np.abs(ddiff) <= fuse_depth)
        do_carve = both & (ddiff > occl)
        do_aug = f_ok & (~m_ok | (both & (ddiff < -occl)))
        w_pts = f_pts @ r.T + t
        w_nrm = f_nrm @ r.T
        tgt = midx[do_fuse]
        c = m_conf[tgt][:, None]
        m_pts[tgt] = (m_pts[tgt] * c + w_pts[do_fuse]) / (c + 1)
        m_nrm[tgt] = m_nrm[tgt] * c + w_nrm[do_fuse]
        m_nrm[tgt] /= np.maximum(
            np.linalg.norm(m_nrm[tgt], axis=1, keepdims=True), 1e-30
        )
        m_conf[tgt] += 1
        keep = np.ones(len(m_pts), bool)
        keep[midx[do_carve]] = False
        m_pts = np.concatenate([m_pts[keep], w_pts[do_aug]])
        m_nrm = np.concatenate([m_nrm[keep], w_nrm[do_aug]])
        m_conf = np.concatenate([m_conf[keep], np.ones(do_aug.sum())])
    if timing:
        return poses, _time.perf_counter() - t_loop
    return poses


# ---------------------------------------------------------------------------
# Single-core numpy denominators for the estimation/clustering rows
# (BASELINE config #3): the same algorithms, one CPU core, vectorized inner
# loops (the honest "what a good numpy implementation costs" bar; the
# algorithm-for-algorithm C++ bars live in cilantro_tpu/native/src/).
# ---------------------------------------------------------------------------


def ransac_plane_cpu(pts, thresh, num_hypotheses=1024, seed=0):
    """Plane RANSAC: minimal 3-point fits, inlier counts, best plane
    (reference ransac_hyperplane_estimator.hpp). One hypothesis per loop
    iteration, residuals vectorized."""
    rng = np.random.default_rng(seed)
    n = len(pts)
    best = (-1, None)
    for _ in range(num_hypotheses):
        i, j, k = rng.choice(n, 3, replace=False)
        v1, v2 = pts[j] - pts[i], pts[k] - pts[i]
        nrm = np.cross(v1, v2)
        ln = np.linalg.norm(nrm)
        if ln < 1e-12:
            continue
        nrm = nrm / ln
        d = -nrm @ pts[i]
        inl = int(np.sum(np.abs(pts @ nrm + d) < thresh))
        if inl > best[0]:
            best = (inl, (nrm, d))
    return best


def kmeans_cpu(pts, k, iters=20, seed=0):
    """Lloyd k-means, brute-force assignment (reference kmeans.hpp:86-120),
    random init."""
    rng = np.random.default_rng(seed)
    cent = pts[rng.choice(len(pts), k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        for c in range(k):
            sel = lab == c
            if sel.any():
                cent[c] = pts[sel].mean(0)
    return cent, lab


def pca_cpu(pts):
    """Mean + covariance + symmetric eigendecomposition (reference
    principal_component_analysis.hpp)."""
    mean = pts.mean(0)
    c = pts - mean
    cov = (c.T @ c) / max(len(pts) - 1, 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    return mean, w[order], v[:, order]
