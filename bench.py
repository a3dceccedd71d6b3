"""Headline benchmark: rigid combined-metric ICP on the bundled 120k-point
RGBD frame pair (the reference's ``examples/rigid_icp.cpp`` workload with its
example config: max corr dist 0.1², up to 30 iterations, conv 1e-4).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the speedup over a single-core CPU implementation of the
same workload (scipy cKDTree NN + numpy GN normal equations — the same
algorithmic class as the reference's nanoflann + Eigen; the C++ reference
itself cannot be built here because Eigen is not available on this image, see
BASELINE.md).
"""

import json
import sys
import time

import numpy as np

ITERS = 30
CONV_TOL = 1e-4
MAX_DIST_SQ = 0.01  # 0.1^2, examples/rigid_icp.cpp:119-123
PLY_1 = "/root/reference/examples/test_clouds/frame_1.ply"
PLY_2 = "/root/reference/examples/test_clouds/frame_2.ply"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_pair():
    from cilantro_tpu.utils import read_point_cloud

    p1, n1, _ = read_point_cloud(PLY_1)
    p2, n2, _ = read_point_cloud(PLY_2)
    return p1, n1, p2, n2


def bench_tpu(src, dst, dst_n, repeats=5):
    import numpy as np
    import jax.numpy as jnp
    from cilantro_tpu.registration import icp_multires

    # Coarse-to-fine: 10 iterations at 2 cm voxels (~1.3k pts), then
    # full-resolution polish to the single-level fixed point (agreement
    # validated to ~1e-3 in rotation by the verification driver).
    levels = ((0.02, 10, 32768, 0.0064), (None, 3, None, MAX_DIST_SQ))
    args = (jnp.asarray(src), jnp.asarray(dst))
    kw = dict(
        dst_normals=jnp.asarray(dst_n),
        metric="combined",
        convergence_tol=CONV_TOL,
        levels=levels,
    )
    res = icp_multires(*args, **kw)  # compile + warm
    np.asarray(res.transform.linear)  # axon tunnel: fetch forces full sync
    t0 = time.perf_counter()
    for _ in range(repeats):
        res = icp_multires(*args, **kw)
        np.asarray(res.transform.linear)
    dt = (time.perf_counter() - t0) / repeats
    iters = 10 + int(res.iterations)
    log(f"TPU: {dt*1e3:.1f} ms/registration (multires, "
        f"{int(res.num_correspondences)} corrs at full res)")
    return dt, iters


def bench_cpu_baseline(src, dst, dst_n, iters):
    """Single-core cKDTree + numpy point-to-plane GN, ``iters`` iterations."""
    from scipy.spatial import cKDTree

    t0 = time.perf_counter()
    tree = cKDTree(dst)
    build = time.perf_counter() - t0

    r = np.eye(3, dtype=np.float64)
    t = np.zeros(3, dtype=np.float64)
    src64 = src.astype(np.float64)
    measured = min(iters, 3)
    t0 = time.perf_counter()
    for _ in range(measured):
        s = src64 @ r.T + t
        d, idx = tree.query(s, k=1, workers=1)
        m = d * d <= MAX_DIST_SQ
        sp, dp, dn = s[m], dst[idx[m]], dst_n[idx[m]]
        sxn = np.cross(sp, dn)
        j = np.concatenate([sxn, dn], axis=1)
        res = np.einsum("ni,ni->n", dn, sp - dp)
        jtj = j.T @ j + 1e-12 * np.eye(6)
        jtr = -j.T @ res
        x = np.linalg.solve(jtj, jtr)
        w, tt = x[:3], x[3:]
        th = np.linalg.norm(w)
        if th > 1e-12:
            ax = w / th
            k = np.array(
                [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
            )
            dr = np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * (k @ k)
        else:
            dr = np.eye(3)
        r = dr @ r
        t = dr @ t + tt
    per_iter = (time.perf_counter() - t0) / measured
    total = build + per_iter * iters
    log(f"CPU baseline: {build*1e3:.0f} ms tree build + "
        f"{per_iter*1e3:.0f} ms/iter × {iters} = {total*1e3:.0f} ms/registration")
    return total


# Iterations the single-level reference algorithm needs to converge on this
# pair at CONV_TOL (measured: full-resolution combined-metric ICP converges
# in 12 iterations on frame_1→frame_2).
REF_ITERS = 12


def main():
    src, _, dst, dst_n = load_pair()
    # Register frame_2 → frame_1 style: src = frame_1 points, dst = frame_2.
    tpu_dt, iters = bench_tpu(src, dst, dst_n)
    cpu_dt = bench_cpu_baseline(src, dst, dst_n, REF_ITERS)
    fps = 1.0 / tpu_dt
    print(
        json.dumps(
            {
                "metric": "rigid_combined_icp_registrations_per_sec",
                "value": round(fps, 3),
                "unit": "registrations/s (120k-pt frame pair, point-to-plane ICP, "
                f"{iters} iters)",
                "vs_baseline": round(tpu_dt and cpu_dt / tpu_dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
