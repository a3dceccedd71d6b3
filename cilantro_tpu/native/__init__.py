"""Native (C++) runtime components with ctypes bindings.

The compute path is JAX/XLA/Pallas; the *runtime around it* — I/O codecs,
loaders — is native C++, mirroring the reference's split (templated headers
for algorithms, compiled tinyply/qhull for I/O and hulls). Libraries are
compiled on first use with g++ -O3 and cached next to the sources; every
binding has a pure-Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_lock = threading.Lock()
_libs = {}


def _build(name: str) -> Optional[str]:
    """Compile ``src/{name}.cpp`` → ``_build/lib{name}.so`` (mtime-cached)."""
    src = os.path.join(_SRC_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if not os.path.exists(src):
        return None
    # Rebuild when the source OR any shared header in src/ is newer.
    dep_mtime = os.path.getmtime(src)
    for f in os.listdir(_SRC_DIR):
        if f.endswith(".hpp"):
            dep_mtime = max(
                dep_mtime, os.path.getmtime(os.path.join(_SRC_DIR, f))
            )
    if os.path.exists(out) and os.path.getmtime(out) >= dep_mtime:
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        src,
        "-o",
        out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    return out


def _load(name: str) -> Optional[ctypes.CDLL]:
    with _lock:
        if name in _libs:
            return _libs[name]
        path = _build(name)
        lib = ctypes.CDLL(path) if path else None
        _libs[name] = lib
        return lib


# ---------------------------------------------------------------------------
# PLY codec bindings.
# ---------------------------------------------------------------------------


def _ply_lib() -> Optional[ctypes.CDLL]:
    lib = _load("ply_codec")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        fpp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        lib.ply_read.argtypes = [
            ctypes.c_char_p, fpp, fpp, fpp, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.ply_read.restype = ctypes.c_int
        lib.ply_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.ply_write.restype = ctypes.c_int
        lib.ply_free.argtypes = [ctypes.c_void_p]
        lib._configured = True
    return lib


def ply_read_native(
    path: str,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]]:
    """Read a PLY with the C++ codec; None if the codec is unavailable.
    Raises ValueError on parse errors."""
    lib = _ply_lib()
    if lib is None:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    pts_p, nrm_p, col_p = fp(), fp(), fp()
    n = ctypes.c_int64(0)
    rc = lib.ply_read(
        path.encode(),
        ctypes.byref(pts_p),
        ctypes.byref(nrm_p),
        ctypes.byref(col_p),
        ctypes.byref(n),
    )
    if rc != 0:
        raise ValueError(f"native PLY parse failed ({rc}): {path}")

    def take(ptr):
        if not ptr:
            return None
        arr = np.ctypeslib.as_array(ptr, shape=(n.value, 3)).copy()
        lib.ply_free(ptr)
        return arr

    return take(pts_p), take(nrm_p), take(col_p)


def ply_write_native(
    path: str,
    points: np.ndarray,
    normals: Optional[np.ndarray] = None,
    colors: Optional[np.ndarray] = None,
    binary: bool = True,
) -> bool:
    """Write a PLY with the C++ codec; False if unavailable."""
    lib = _ply_lib()
    if lib is None:
        return False
    fp = ctypes.POINTER(ctypes.c_float)
    pts_ptr = np.ascontiguousarray(points, np.float32)
    nrm_arr = (
        np.ascontiguousarray(normals, np.float32) if normals is not None else None
    )
    col_arr = (
        np.ascontiguousarray(colors, np.float32) if colors is not None else None
    )
    rc = lib.ply_write(
        path.encode(),
        pts_ptr.ctypes.data_as(fp),
        nrm_arr.ctypes.data_as(fp) if nrm_arr is not None else ctypes.cast(None, fp),
        col_arr.ctypes.data_as(fp) if col_arr is not None else ctypes.cast(None, fp),
        len(points),
        1 if binary else 0,
    )
    return rc == 0


def native_available() -> bool:
    return _ply_lib() is not None


# ---------------------------------------------------------------------------
# Single-core C++ ICP baseline (honest benchmark reference).
# ---------------------------------------------------------------------------


def _baseline_lib() -> Optional[ctypes.CDLL]:
    lib = _load("baseline_icp")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        fp = ctypes.POINTER(ctypes.c_float)
        lib.baseline_icp.argtypes = [
            fp, fp, fp,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            fp, ctypes.POINTER(ctypes.c_double),
        ]
        lib.baseline_icp.restype = ctypes.c_int
        lib._configured = True
    return lib


def baseline_icp_native(
    src: np.ndarray,
    dst: np.ndarray,
    dst_normals: np.ndarray,
    *,
    max_iterations: int = 15,
    max_corr_dist_sq: float = 0.01,
    convergence_tol: float = 1e-5,
) -> Optional[Tuple[np.ndarray, int, float]]:
    """Single-core C++ kd-tree point-to-plane ICP (the compiled CPU baseline
    the bench compares against — a from-scratch stand-in for the reference's
    nanoflann + combined-metric GN path, ``examples/rigid_icp.cpp:116-133``).

    Returns ``(transform (3, 4) [R|t], iterations, milliseconds)`` or None if
    the toolchain is unavailable.
    """
    lib = _baseline_lib()
    if lib is None:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    s = np.ascontiguousarray(src, np.float32)
    d = np.ascontiguousarray(dst, np.float32)
    dn = np.ascontiguousarray(dst_normals, np.float32)
    out_tf = np.zeros(12, np.float32)
    out_ms = ctypes.c_double(0.0)
    it = lib.baseline_icp(
        s.ctypes.data_as(fp),
        d.ctypes.data_as(fp),
        dn.ctypes.data_as(fp),
        len(s),
        len(d),
        max_iterations,
        max_corr_dist_sq,
        convergence_tol,
        out_tf.ctypes.data_as(fp),
        ctypes.byref(out_ms),
    )
    if it < 0:
        raise ValueError(f"baseline_icp failed ({it})")
    return out_tf.reshape(3, 4), it, out_ms.value


def baseline_knn_native(
    keys: np.ndarray,
    queries: np.ndarray,
    k: int,
    *,
    exclude_self: bool = False,
) -> Optional[Tuple[np.ndarray, np.ndarray, float, float]]:
    """Single-core C++ kd-tree kNN (the nanoflann-equivalent CPU baseline
    for the NN-throughput rows; ``core/kd_tree.hpp:199-236``).

    Returns ``(idx (Q, k) int32 with -1 pads, dist² (Q, k), build_ms,
    query_ms)`` or None without a toolchain.
    """
    lib = _baseline_lib()
    if lib is None:
        return None
    if not getattr(lib, "_knn_configured", False):
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.baseline_knn.argtypes = [
            fp, ctypes.c_int64, fp, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ip, fp,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.baseline_knn.restype = ctypes.c_int
        lib._knn_configured = True
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    ks = np.ascontiguousarray(keys, np.float32)
    qs = np.ascontiguousarray(queries, np.float32)
    out_i = np.zeros((len(qs), k), np.int32)
    out_d = np.zeros((len(qs), k), np.float32)
    b_ms = ctypes.c_double(0.0)
    q_ms = ctypes.c_double(0.0)
    rc = lib.baseline_knn(
        ks.ctypes.data_as(fp), len(ks),
        qs.ctypes.data_as(fp), len(qs),
        k, 1 if exclude_self else 0,
        out_i.ctypes.data_as(ip), out_d.ctypes.data_as(fp),
        ctypes.byref(b_ms), ctypes.byref(q_ms),
    )
    if rc != 0:
        raise ValueError(f"baseline_knn failed ({rc})")
    return out_i, out_d, b_ms.value, q_ms.value


def baseline_radius_native(
    keys: np.ndarray,
    queries: np.ndarray,
    radius: float,
    max_neighbors: int,
    *,
    exclude_self: bool = False,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, float, float]]:
    """Single-core C++ kd-tree radius query (CPU denominator for the radius
    rows; same capped-list + overflow contract as the TPU
    ``radius_search`` — reference ``core/kd_tree.hpp:236-273``).

    Returns ``(idx (Q, k) int32 with -1 pads, dist² (Q, k), in-radius count
    (Q,) int32, build_ms, query_ms)`` or None without a toolchain.
    """
    lib = _baseline_lib()
    if lib is None:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    if not getattr(lib, "_radius_configured", False):
        lib.baseline_radius.argtypes = [
            fp, ctypes.c_int64, fp, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ip, fp, ip,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.baseline_radius.restype = ctypes.c_int
        lib._radius_configured = True
    ks = np.ascontiguousarray(keys, np.float32)
    qs = np.ascontiguousarray(queries, np.float32)
    k = int(max_neighbors)
    out_i = np.zeros((len(qs), k), np.int32)
    out_d = np.zeros((len(qs), k), np.float32)
    out_c = np.zeros(len(qs), np.int32)
    b_ms = ctypes.c_double(0.0)
    q_ms = ctypes.c_double(0.0)
    rc = lib.baseline_radius(
        ks.ctypes.data_as(fp), len(ks),
        qs.ctypes.data_as(fp), len(qs),
        float(radius) ** 2, k, 1 if exclude_self else 0,
        out_i.ctypes.data_as(ip), out_d.ctypes.data_as(fp),
        out_c.ctypes.data_as(ip),
        ctypes.byref(b_ms), ctypes.byref(q_ms),
    )
    if rc != 0:
        raise ValueError(f"baseline_radius failed ({rc})")
    return out_i, out_d, out_c, b_ms.value, q_ms.value


# ---------------------------------------------------------------------------
# Single-core C++ fusion baseline (honest benchmark reference).
# ---------------------------------------------------------------------------


def _baseline_fusion_lib() -> Optional[ctypes.CDLL]:
    lib = _load("baseline_fusion")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        fp = ctypes.POINTER(ctypes.c_float)
        lib.baseline_fusion.argtypes = [
            fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            fp, ctypes.POINTER(ctypes.c_double),
        ]
        lib.baseline_fusion.restype = ctypes.c_int
        lib._configured = True
    return lib


def baseline_fusion_native(
    depths: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    *,
    icp_iters: int = 6,
    fuse_depth: float = 0.01,
    occlusion_depth: float = 0.025,
) -> Optional[Tuple[np.ndarray, float]]:
    """Single-core C++ frame-to-model fusion (the compiled CPU baseline the
    headline bench compares against — the same projective-ICP +
    fuse/augment/carve pipeline as ``bench_baseline.fusion_cpu`` and the TPU
    path; reference algorithm ``examples/fusion.cpp:125-254``).

    ``depths``: (F, H, W) float32. Returns ``(poses (F, 4, 4) camera-to-world,
    milliseconds for frames 1..F-1 timed inside the library)`` or None if the
    toolchain is unavailable.
    """
    lib = _baseline_fusion_lib()
    if lib is None:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    d = np.ascontiguousarray(depths, np.float32)
    f, h, w = d.shape
    out_poses = np.zeros((f, 4, 4), np.float32)
    out_ms = ctypes.c_double(0.0)
    rc = lib.baseline_fusion(
        d.ctypes.data_as(fp), f, h, w,
        ctypes.c_float(fx), ctypes.c_float(fy),
        ctypes.c_float(cx), ctypes.c_float(cy),
        icp_iters, ctypes.c_float(fuse_depth),
        ctypes.c_float(occlusion_depth),
        out_poses.ctypes.data_as(fp), ctypes.byref(out_ms),
    )
    if rc != 0:
        raise ValueError(f"baseline_fusion failed ({rc})")
    return out_poses, out_ms.value


# ---------------------------------------------------------------------------
# Non-rigid EDG warp-field baseline.
# ---------------------------------------------------------------------------


def _baseline_warp_lib() -> Optional[ctypes.CDLL]:
    lib = _load("baseline_warp")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        fp = ctypes.POINTER(ctypes.c_float)
        lib.baseline_warp.argtypes = [
            fp, fp, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
            fp, ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ]
        lib.baseline_warp.restype = ctypes.c_int
        lib._configured = True
    return lib


def baseline_warp_native(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    ctrl_res: float = 0.025,
    k_anchors: int = 4,
    k_arcs: int = 8,
    max_outer: int = 10,
    max_cg: int = 200,
    point_weight: float = 1.0,
    stiffness: float = 50.0,
    huber_delta: float = 1e-2,
    max_corr_dist_sq: float = 0.0025,
    conv_tol: float = 2.5e-3,
) -> Optional[Tuple[np.ndarray, int, int, float]]:
    """Single-core C++ sparse (EDG) non-rigid ICP — the compiled CPU
    denominator for the non-rigid bench row (reference algorithm
    ``registration/warp_field_estimation.hpp:1387-1847`` via
    ``examples/non_rigid_icp.cpp:41-84``; configuration mirrors
    ``cilantro_tpu.registration.icp_warp_field``'s bench invocation).

    Returns ``(warped_src (N, 3), outer_iterations, num_nodes,
    milliseconds)`` — timing covers the whole pipeline (node construction,
    graph build, every outer iteration) — or None if the toolchain is
    unavailable.
    """
    lib = _baseline_warp_lib()
    if lib is None:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    s = np.ascontiguousarray(src, np.float32)
    d = np.ascontiguousarray(dst, np.float32)
    n = len(s)
    out_warped = np.zeros((n, 3), np.float32)
    out_ms = ctypes.c_double(0.0)
    out_nodes = ctypes.c_int(0)
    it = lib.baseline_warp(
        s.ctypes.data_as(fp), d.ctypes.data_as(fp), n,
        ctypes.c_float(ctrl_res), k_anchors, k_arcs, max_outer,
        max_cg, ctypes.c_float(point_weight), ctypes.c_float(stiffness),
        ctypes.c_float(huber_delta), ctypes.c_float(max_corr_dist_sq),
        ctypes.c_float(conv_tol),
        out_warped.ctypes.data_as(fp), ctypes.byref(out_ms),
        ctypes.byref(out_nodes),
    )
    if it < 0:
        raise ValueError(f"baseline_warp failed ({it})")
    return out_warped, it, out_nodes.value, out_ms.value
