"""Interactive visualization: a self-contained WebGL scene viewer.

The reference's visualization layer is a Pangolin/OpenGL desktop window
(``include/cilantro/visualization/visualizer.hpp``,
``src/visualization/visualizer.cpp``) with a trackball input handler
(``visualizer_handler.{hpp,cpp}``).  A TPU machine is headless, so the
TPU-native equivalent is a **portable interactive artifact**: the
:class:`Visualizer` here keeps the reference's named-renderable registry and
`RenderingProperties` model, then ``export_html()`` emits ONE standalone HTML
file — hand-written WebGL, zero external dependencies, zero network access —
that reproduces the interactive surface anywhere a browser exists:

* trackball orbit / pan / zoom (``visualizer_handler.cpp`` mouse handling);
* the reference's key bindings (``visualizer_handler.cpp:35-96``):
  ``r`` reset view, ``+``/``-`` point size, ``n`` draw normals,
  ``w`` wireframe, ``p`` perspective/orthographic, ``l`` lighting,
  ``q`` stop, plus ``h`` for the help overlay;
* renderables (``common_renderables.hpp``): point clouds (uniform / RGB /
  scalar-colormapped colors, normal glyphs), point correspondences,
  coordinate frames, camera frusta, triangle meshes (smooth/flat shading,
  face colors, wireframe), and 3D-anchored text;
* render order by opacity (``visualizer.cpp`` RenderPriorityComparator).

All geometry is prepared host-side into flat ``float32`` buffers and embedded
base64 — the browser only ever sees three primitives (points, lines,
triangles) through one shader.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.rgbd import CameraIntrinsics
from ..utils.colormap import colormap

__all__ = [
    "RenderingProperties",
    "Renderable",
    "PointCloudRenderable",
    "PointCorrespondencesRenderable",
    "CoordinateFrameRenderable",
    "CameraFrustumRenderable",
    "TriangleMeshRenderable",
    "TextRenderable",
    "Visualizer",
    "ImageViewer",
]

_NO_COLOR = (-1.0, -1.0, -1.0)
_DEFAULT_COLOR = (1.0, 0.7, 0.7)


def _f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), dtype=np.float32)


def _b64(arr: np.ndarray) -> str:
    return base64.b64encode(_f32(arr).tobytes()).decode("ascii")


@dataclasses.dataclass
class RenderingProperties:
    """Per-renderable display options — mirrors the reference's
    ``RenderingProperties`` (``renderable.hpp:7-51``), chained setters
    included."""

    point_color: Tuple[float, float, float] = _NO_COLOR
    line_color: Tuple[float, float, float] = _NO_COLOR
    point_size: float = 2.0
    line_width: float = 1.0
    opacity: float = 1.0
    use_lighting: bool = True
    draw_normals: bool = False
    normal_length: float = 0.05
    line_density_fraction: float = 1.0
    draw_wireframe: bool = False
    use_face_normals: bool = True
    use_face_colors: bool = False
    use_scalar_value_mapped_colors: bool = True
    min_scalar_value: float = float("nan")
    max_scalar_value: float = float("nan")
    colormap_type: str = "jet"
    font_size: float = 15.0
    text_anchor_point: Tuple[float, float] = (0.5, 0.5)

    # chained setters, as in the reference builder-style API
    def set_point_color(self, r, g=None, b=None) -> "RenderingProperties":
        self.point_color = (r, g, b) if g is not None else tuple(r)
        return self

    def set_line_color(self, r, g=None, b=None) -> "RenderingProperties":
        self.line_color = (r, g, b) if g is not None else tuple(r)
        return self

    def set_point_size(self, s: float) -> "RenderingProperties":
        self.point_size = s
        return self

    def set_line_width(self, w: float) -> "RenderingProperties":
        self.line_width = w
        return self

    def set_opacity(self, o: float) -> "RenderingProperties":
        self.opacity = o
        return self

    def set_use_lighting(self, v: bool) -> "RenderingProperties":
        self.use_lighting = v
        return self

    def set_draw_normals(self, v: bool) -> "RenderingProperties":
        self.draw_normals = v
        return self

    def set_normal_length(self, v: float) -> "RenderingProperties":
        self.normal_length = v
        return self

    def set_line_density_fraction(self, v: float) -> "RenderingProperties":
        self.line_density_fraction = v
        return self

    def set_draw_wireframe(self, v: bool) -> "RenderingProperties":
        self.draw_wireframe = v
        return self

    def set_use_face_normals(self, v: bool) -> "RenderingProperties":
        self.use_face_normals = v
        return self

    def set_use_face_colors(self, v: bool) -> "RenderingProperties":
        self.use_face_colors = v
        return self

    def set_scalar_values_range(self, lo: float, hi: float) -> "RenderingProperties":
        self.min_scalar_value, self.max_scalar_value = lo, hi
        return self

    def set_colormap_type(self, t: str) -> "RenderingProperties":
        self.colormap_type = t
        return self

    def set_font_size(self, s: float) -> "RenderingProperties":
        self.font_size = s
        return self

    def set_text_anchor_point(self, x, y=None) -> "RenderingProperties":
        self.text_anchor_point = (x, y) if y is not None else tuple(x)
        return self


class Renderable:
    """Base renderable: rendering properties + visibility (the reference's
    ``Renderable``, ``renderable.hpp:53+``)."""

    def __init__(self, rp: Optional[RenderingProperties] = None):
        self.rendering_properties = rp or RenderingProperties()
        self.visible = True

    # --- subclass protocol -------------------------------------------------
    def primitives(self) -> List[dict]:
        """Lower to JS-side primitive dicts (kind points|lines|mesh|text)."""
        raise NotImplementedError

    def bounds(self) -> Optional[np.ndarray]:
        """(2, 3) min/max corners, or None."""
        return None


def _resolve_colors(n, rp: RenderingProperties, colors, values, default):
    """Reference color priority (common_renderables.cpp): explicit pointColor
    > per-point colors > colormapped values > default."""
    if rp.point_color != _NO_COLOR:
        return None, tuple(rp.point_color)
    if colors is not None:
        return _f32(colors), None
    if values is not None and rp.use_scalar_value_mapped_colors:
        v = _f32(values).reshape(-1)
        lo = rp.min_scalar_value
        hi = rp.max_scalar_value
        if np.isnan(lo):
            lo = float(v.min()) if n else 0.0
        if np.isnan(hi):
            hi = float(v.max()) if n else 1.0
        import jax.numpy as jnp

        cols = colormap(
            jnp.asarray((v - lo) / max(hi - lo, 1e-20)), rp.colormap_type
        )
        return np.asarray(cols, dtype=np.float32), None
    return None, default


class PointCloudRenderable(Renderable):
    """Point cloud with optional normals / colors / scalar values
    (``common_renderables.hpp:36-89``).  Accepts raw arrays or the package's
    :class:`~cilantro_tpu.core.containers.PointCloud` (mask applied)."""

    def __init__(self, cloud_or_points, rp=None):
        super().__init__(rp)
        pts, nrm, col = _split_cloud(cloud_or_points)
        self.points = _f32(pts).reshape(-1, 3)
        self.normals = None if nrm is None else _f32(nrm).reshape(-1, 3)
        self.colors = None if col is None else _f32(col).reshape(-1, 3)
        self.values: Optional[np.ndarray] = None

    def set_point_normals(self, normals) -> "PointCloudRenderable":
        self.normals = _f32(normals).reshape(-1, 3)
        return self

    def set_point_colors(self, colors) -> "PointCloudRenderable":
        self.colors = _f32(colors).reshape(-1, 3)
        return self

    def set_point_values(self, values) -> "PointCloudRenderable":
        self.values = _f32(values).reshape(-1)
        return self

    def bounds(self):
        if not len(self.points):
            return None
        return np.stack([self.points.min(0), self.points.max(0)])

    def primitives(self):
        rp = self.rendering_properties
        n = len(self.points)
        col, uni = _resolve_colors(n, rp, self.colors, self.values, _DEFAULT_COLOR)
        prim = {
            "kind": "points",
            "pointSize": rp.point_size,
            "opacity": rp.opacity,
            "count": n,
            "pos": _b64(self.points),
        }
        if col is not None:
            prim["col"] = _b64(col)
        else:
            prim["uniformColor"] = list(uni)
        out = [prim]
        if self.normals is not None:
            # Normal glyphs: the reference draws them when drawNormals is on,
            # thinned by lineDensityFraction (common_renderables.cpp).
            step = max(1, int(round(1.0 / max(rp.line_density_fraction, 1e-6))))
            p = self.points[::step]
            v = self.normals[::step]
            seg = np.empty((len(p) * 2, 3), np.float32)
            seg[0::2] = p
            seg[1::2] = p + rp.normal_length * v
            lc = rp.line_color if rp.line_color != _NO_COLOR else (0.0, 0.0, 1.0)
            out.append(
                {
                    "kind": "lines",
                    "role": "normals",
                    "lineWidth": rp.line_width,
                    "opacity": rp.opacity,
                    "count": len(seg),
                    "pos": _b64(seg),
                    "uniformColor": list(lc),
                    "hidden": not rp.draw_normals,
                }
            )
        return out


class PointCorrespondencesRenderable(Renderable):
    """Line segments between corresponding points
    (``common_renderables.hpp:95-162``).  ``correspondences`` may be the
    package's ``Correspondences`` (masked ``dst_idx`` per src row) or None,
    in which case rows pair positionally."""

    def __init__(self, dst_points, src_points, correspondences=None, rp=None):
        super().__init__(rp)
        d = _f32(_split_cloud(dst_points)[0]).reshape(-1, 3)
        s = _f32(_split_cloud(src_points)[0]).reshape(-1, 3)
        if correspondences is not None:
            mask = np.asarray(correspondences.mask).astype(bool)
            idx = np.asarray(correspondences.dst_idx)
            rows = np.flatnonzero(mask)
            s = s[rows]
            d = d[idx[rows]]
        else:
            m = min(len(s), len(d))
            s, d = s[:m], d[:m]
        self.src_points, self.dst_points = s, d

    def bounds(self):
        if not len(self.src_points):
            return None
        allp = np.concatenate([self.src_points, self.dst_points])
        return np.stack([allp.min(0), allp.max(0)])

    def primitives(self):
        rp = self.rendering_properties
        step = max(1, int(round(1.0 / max(rp.line_density_fraction, 1e-6))))
        s = self.src_points[::step]
        d = self.dst_points[::step]
        seg = np.empty((len(s) * 2, 3), np.float32)
        seg[0::2] = s
        seg[1::2] = d
        lc = rp.line_color if rp.line_color != _NO_COLOR else _DEFAULT_COLOR
        return [
            {
                "kind": "lines",
                "lineWidth": rp.line_width,
                "opacity": rp.opacity,
                "count": len(seg),
                "pos": _b64(seg),
                "uniformColor": list(lc),
            }
        ]


class CoordinateFrameRenderable(Renderable):
    """RGB axis triad at a pose (``common_renderables.hpp:164-180``)."""

    def __init__(self, transform=None, scale: float = 1.0, rp=None):
        super().__init__(rp)
        self.transform = (
            np.eye(4, dtype=np.float32) if transform is None else _to_matrix4(transform)
        )
        self.scale = float(scale)

    def bounds(self):
        o = self.transform[:3, 3]
        return np.stack([o - self.scale, o + self.scale])

    def primitives(self):
        rp = self.rendering_properties
        o = self.transform[:3, 3]
        axes = self.transform[:3, :3] * self.scale
        seg = np.empty((6, 3), np.float32)
        col = np.empty((6, 3), np.float32)
        for i in range(3):
            seg[2 * i] = o
            seg[2 * i + 1] = o + axes[:, i]
            c = np.eye(3, dtype=np.float32)[i]
            col[2 * i] = c
            col[2 * i + 1] = c
        return [
            {
                "kind": "lines",
                "lineWidth": rp.line_width,
                "opacity": rp.opacity,
                "count": 6,
                "pos": _b64(seg),
                "col": _b64(col),
            }
        ]


class CameraFrustumRenderable(Renderable):
    """Wireframe pinhole frustum (``common_renderables.hpp:182-200``)."""

    def __init__(
        self,
        width: int,
        height: int,
        intrinsics,
        pose=None,
        scale: float = 1.0,
        rp=None,
    ):
        super().__init__(rp)
        self.width, self.height = int(width), int(height)
        self.intrinsics = _to_k(intrinsics)
        self.pose = np.eye(4, dtype=np.float32) if pose is None else _to_matrix4(pose)
        self.scale = float(scale)

    def bounds(self):
        o = self.pose[:3, 3]
        return np.stack([o - self.scale, o + self.scale])

    def primitives(self):
        rp = self.rendering_properties
        kinv = np.linalg.inv(self.intrinsics)
        corners_px = np.array(
            [[0, 0, 1], [self.width, 0, 1], [self.width, self.height, 1], [0, self.height, 1]],
            np.float32,
        )
        rays = (kinv @ corners_px.T).T * self.scale
        pts = np.concatenate([np.zeros((1, 3), np.float32), rays.astype(np.float32)])
        pts = (self.pose[:3, :3] @ pts.T).T + self.pose[:3, 3]
        edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
        seg = np.array([pts[i] for e in edges for i in e], np.float32)
        lc = rp.line_color if rp.line_color != _NO_COLOR else _DEFAULT_COLOR
        return [
            {
                "kind": "lines",
                "lineWidth": rp.line_width,
                "opacity": rp.opacity,
                "count": len(seg),
                "pos": _b64(seg),
                "uniformColor": list(lc),
            }
        ]


class TriangleMeshRenderable(Renderable):
    """Triangle mesh with flat/smooth shading, per-vertex or per-face colors
    or scalar values, and a wireframe overlay
    (``common_renderables.hpp:202-328``)."""

    def __init__(self, vertices, faces, rp=None):
        super().__init__(rp)
        self.vertices = _f32(vertices).reshape(-1, 3)
        self.faces = np.ascontiguousarray(np.asarray(faces), dtype=np.int64).reshape(-1, 3)
        self.vertex_normals: Optional[np.ndarray] = None
        self.vertex_colors: Optional[np.ndarray] = None
        self.face_colors: Optional[np.ndarray] = None
        self.vertex_values: Optional[np.ndarray] = None
        self.face_values: Optional[np.ndarray] = None

    def set_vertex_normals(self, n) -> "TriangleMeshRenderable":
        self.vertex_normals = _f32(n).reshape(-1, 3)
        return self

    def set_vertex_colors(self, c) -> "TriangleMeshRenderable":
        self.vertex_colors = _f32(c).reshape(-1, 3)
        return self

    def set_face_colors(self, c) -> "TriangleMeshRenderable":
        self.face_colors = _f32(c).reshape(-1, 3)
        return self

    def set_vertex_values(self, v) -> "TriangleMeshRenderable":
        self.vertex_values = _f32(v).reshape(-1)
        return self

    def set_face_values(self, v) -> "TriangleMeshRenderable":
        self.face_values = _f32(v).reshape(-1)
        return self

    def bounds(self):
        if not len(self.vertices):
            return None
        return np.stack([self.vertices.min(0), self.vertices.max(0)])

    def primitives(self):
        rp = self.rendering_properties
        v, f = self.vertices, self.faces
        tri = v[f.reshape(-1)]  # triangle soup (keeps WebGL1 index-free)
        e0 = v[f[:, 1]] - v[f[:, 0]]
        e1 = v[f[:, 2]] - v[f[:, 0]]
        fn = np.cross(e0, e1)
        fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-20)
        if rp.use_face_normals or self.vertex_normals is None:
            nrm = np.repeat(fn, 3, axis=0)
        else:
            nrm = self.vertex_normals[f.reshape(-1)]
        # color resolution: faces take priority under useFaceColors
        if rp.use_face_colors and self.face_colors is not None:
            col = np.repeat(self.face_colors, 3, axis=0)
            uni = None
        elif rp.use_face_colors and self.face_values is not None:
            col, uni = _resolve_colors(
                len(f), rp, None, self.face_values, _DEFAULT_COLOR
            )
            if col is not None:
                col = np.repeat(col, 3, axis=0)
        elif self.vertex_colors is not None and rp.point_color == _NO_COLOR:
            col = self.vertex_colors[f.reshape(-1)]
            uni = None
        elif self.vertex_values is not None:
            col, uni = _resolve_colors(
                len(v), rp, None, self.vertex_values, _DEFAULT_COLOR
            )
            if col is not None:
                col = col[f.reshape(-1)]
        else:
            col, uni = _resolve_colors(len(v), rp, None, None, _DEFAULT_COLOR)
        prim = {
            "kind": "mesh",
            "opacity": rp.opacity,
            "lighting": bool(rp.use_lighting),
            "count": len(tri),
            "pos": _b64(tri),
            "nrm": _b64(nrm.astype(np.float32)),
        }
        if col is not None:
            prim["col"] = _b64(col)
        else:
            prim["uniformColor"] = list(uni)
        # wireframe overlay from unique edges
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        edges = np.unique(np.sort(edges, axis=1), axis=0)
        seg = v[edges.reshape(-1)]
        lc = rp.line_color if rp.line_color != _NO_COLOR else (0.1, 0.1, 0.1)
        wire = {
            "kind": "lines",
            "role": "wireframe",
            "lineWidth": rp.line_width,
            "opacity": rp.opacity,
            "count": len(seg),
            "pos": _b64(seg.astype(np.float32)),
            "uniformColor": list(lc),
            "hidden": not rp.draw_wireframe,
        }
        return [prim, wire]


class TextRenderable(Renderable):
    """3D-anchored screen-space text (``common_renderables.hpp:330-357``)."""

    def __init__(self, text: str, position, rp=None):
        super().__init__(rp)
        self.text = str(text)
        self.position = _f32(position).reshape(3)

    def bounds(self):
        return np.stack([self.position, self.position])

    def primitives(self):
        rp = self.rendering_properties
        tc = rp.point_color if rp.point_color != _NO_COLOR else (0.1, 0.1, 0.1)
        return [
            {
                "kind": "text",
                "text": self.text,
                "pos3": [float(x) for x in self.position],
                "fontSize": rp.font_size,
                "anchor": list(rp.text_anchor_point),
                "color": list(tc),
                "opacity": rp.opacity,
            }
        ]


def _split_cloud(obj):
    """Accept a PointCloud container (mask applied), a (points, normals,
    colors) tuple, or a raw (N, 3) array."""
    if hasattr(obj, "points") and hasattr(obj, "valid_mask"):
        mask = np.asarray(obj.valid_mask()).astype(bool)
        pts = np.asarray(obj.points)[mask]
        nrm = None if obj.normals is None else np.asarray(obj.normals)[mask]
        col = None if obj.colors is None else np.asarray(obj.colors)[mask]
        return pts, nrm, col
    if isinstance(obj, tuple):
        pts = obj[0]
        nrm = obj[1] if len(obj) > 1 else None
        col = obj[2] if len(obj) > 2 else None
        return pts, nrm, col
    return obj, None, None


def _to_matrix4(tf) -> np.ndarray:
    if hasattr(tf, "linear") and hasattr(tf, "translation"):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.asarray(tf.linear)
        m[:3, 3] = np.asarray(tf.translation)
        return m
    m = np.asarray(tf, dtype=np.float32)
    if m.shape == (3, 4):
        m = np.concatenate([m, [[0, 0, 0, 1]]]).astype(np.float32)
    return m.reshape(4, 4)


def _to_k(intr) -> np.ndarray:
    if isinstance(intr, CameraIntrinsics):
        return np.array(
            [[intr.fx, 0, intr.cx], [0, intr.fy, intr.cy], [0, 0, 1]], np.float32
        )
    return np.asarray(intr, dtype=np.float32).reshape(3, 3)


class Visualizer:
    """Named-renderable scene registry + interactive HTML export.

    Mirrors the reference ``Visualizer`` registry surface
    (``visualizer.hpp:23-135``): ``add_object`` / ``get_object`` /
    ``remove`` / ``clear`` / visibility toggles / per-object rendering
    properties / clear color / camera pose.  ``spin()`` becomes
    :meth:`export_html`, the headless analogue of opening the window."""

    def __init__(self, window_name: str = "cilantro_tpu", display_name: str = "disp"):
        self.window_name = window_name
        self.display_name = display_name
        self._objects: Dict[str, Renderable] = {}
        self._clear_color = (0.99, 0.99, 1.0)
        self._camera: Optional[dict] = None
        self._projection: Optional[dict] = None

    # --- registry (visualizer.hpp:23-75) ----------------------------------
    def add_object(self, name: str, renderable: Renderable) -> Renderable:
        self._objects[name] = renderable
        return renderable

    def get_object(self, name: str) -> Optional[Renderable]:
        return self._objects.get(name)

    def remove(self, name: str) -> "Visualizer":
        self._objects.pop(name, None)
        return self

    def clear(self) -> "Visualizer":
        self._objects.clear()
        return self

    def get_object_names(self) -> List[str]:
        return list(self._objects)

    def get_rendering_properties(self, name: str) -> Optional[RenderingProperties]:
        obj = self._objects.get(name)
        return None if obj is None else obj.rendering_properties

    def set_rendering_properties(
        self, name: str, rp: RenderingProperties
    ) -> "Visualizer":
        if name in self._objects:
            self._objects[name].rendering_properties = rp
        return self

    def get_visibility(self, name: str) -> bool:
        obj = self._objects.get(name)
        return bool(obj.visible) if obj is not None else False

    def set_visibility(self, name: str, visible: bool) -> "Visualizer":
        if name in self._objects:
            self._objects[name].visible = bool(visible)
        return self

    def toggle_visibility(self, name: str) -> "Visualizer":
        if name in self._objects:
            self._objects[name].visible = not self._objects[name].visible
        return self

    def set_clear_color(self, r, g=None, b=None) -> "Visualizer":
        self._clear_color = (r, g, b) if g is not None else tuple(r)
        return self

    # --- camera (visualizer.hpp:137-169) ----------------------------------
    def set_camera_pose(self, position, look_at, up=(0.0, -1.0, 0.0)) -> "Visualizer":
        self._camera = {
            "position": [float(x) for x in np.asarray(position).reshape(3)],
            "lookAt": [float(x) for x in np.asarray(look_at).reshape(3)],
            "up": [float(x) for x in np.asarray(up).reshape(3)],
        }
        return self

    def set_perspective_projection(
        self, w: int, h: int, fu: float, fv: float, u0: float, v0: float,
        z_near: float = 0.01, z_far: float = 1000.0,
    ) -> "Visualizer":
        fov_y = 2.0 * np.degrees(np.arctan(0.5 * h / fv))
        self._projection = {
            "ortho": False, "fovY": float(fov_y),
            "near": float(z_near), "far": float(z_far),
        }
        return self

    def set_orthographic_projection(
        self, height: float, z_near: float = 0.01, z_far: float = 1000.0
    ) -> "Visualizer":
        self._projection = {
            "ortho": True, "orthoHeight": float(height),
            "near": float(z_near), "far": float(z_far),
        }
        return self

    # --- scene assembly ----------------------------------------------------
    def _scene_json(self) -> str:
        prims = []
        bounds = []
        for name, obj in self._objects.items():
            b = obj.bounds()
            if b is not None:
                bounds.append(b)
            for p in obj.primitives():
                p["name"] = name
                p["visible"] = bool(obj.visible)
                prims.append(p)
        if bounds:
            b = np.stack(bounds)
            lo, hi = b[:, 0].min(0), b[:, 1].max(0)
        else:
            lo, hi = np.array([-1.0] * 3), np.array([1.0] * 3)
        center = 0.5 * (lo + hi)
        radius = max(float(np.linalg.norm(hi - lo)) * 0.5, 1e-3)
        cam = self._camera or {
            "position": [float(center[0]), float(center[1]), float(center[2] - 2.5 * radius)],
            "lookAt": [float(x) for x in center],
            "up": [0.0, -1.0, 0.0],
        }
        proj = self._projection or {
            "ortho": False, "fovY": 45.0,
            "near": radius * 1e-3, "far": radius * 100.0,
        }
        # render order by opacity, opaque first (visualizer.cpp comparator)
        order = sorted(
            range(len(prims)), key=lambda i: -float(prims[i].get("opacity", 1.0))
        )
        scene = {
            "title": self.window_name,
            "clearColor": list(self._clear_color),
            "camera": cam,
            "projection": proj,
            "sceneRadius": radius,
            "center": [float(x) for x in center],
            "objects": [prims[i] for i in order],
        }
        # "</" must not appear verbatim inside a <script> block (a text
        # renderable containing "</script>" would truncate the page).
        return json.dumps(scene, default=float).replace("</", "<\\/")

    def export_html(self, path: str) -> str:
        """Write the standalone interactive viewer page; returns ``path``."""
        html = _HTML_TEMPLATE.replace("/*__SCENE_JSON__*/null", self._scene_json())
        d = os.path.dirname(os.path.abspath(path))
        os.makedirs(d, exist_ok=True)
        with open(path, "w") as f:
            f.write(html)
        return path

    def spin(self, path: Optional[str] = None) -> str:
        """Headless ``spin()``: export the interactive artifact and report
        where it lives (the reference blocks in its render loop; a TPU host
        has no window to block on)."""
        out = self.export_html(path or f"{self.window_name}.html")
        print(f"[cilantro_tpu.viz] interactive scene written to {out}")
        return out


class ImageViewer:
    """2D image display with zoom/pan — the reference's textured-quad
    ``ImageViewer`` (``image_viewer.hpp:10-55``) as a standalone HTML
    artifact."""

    def __init__(self, window_name: str = "image"):
        self.window_name = window_name
        self._png_b64: Optional[str] = None
        self._shape: Tuple[int, int] = (0, 0)

    def set_image(self, image: np.ndarray) -> "ImageViewer":
        """``image``: (H, W) scalar, (H, W, 3) float [0,1], or uint8."""
        import io as _io

        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.clip(img.astype(np.float32), 0.0, 1.0)
            img = (img * 255.0 + 0.5).astype(np.uint8)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        buf = _io.BytesIO()
        plt.imsave(buf, img, format="png")
        self._png_b64 = base64.b64encode(buf.getvalue()).decode("ascii")
        self._shape = img.shape[:2]
        return self

    def export_html(self, path: str) -> str:
        assert self._png_b64 is not None, "set_image first"
        h, w = self._shape
        html = _IMAGE_TEMPLATE.replace("__TITLE__", self.window_name)
        html = html.replace("__W__", str(w)).replace("__H__", str(h))
        html = html.replace("__PNG_B64__", self._png_b64)
        with open(path, "w") as f:
            f.write(html)
        return path


_HTML_TEMPLATE = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>cilantro_tpu viewer</title>
<style>
 html,body{margin:0;height:100%;overflow:hidden;background:#fff;font-family:sans-serif}
 #c{width:100%;height:100%;display:block}
 .txt{position:absolute;pointer-events:none;white-space:pre}
 #help{position:absolute;left:10px;top:10px;background:rgba(20,20,30,.85);color:#eee;
   padding:10px 14px;border-radius:6px;font-size:12px;line-height:1.6;display:none}
 #hint{position:absolute;right:10px;top:10px;color:#888;font-size:11px}
</style></head><body>
<canvas id="c"></canvas>
<div id="hint">h: help</div>
<div id="help">drag: rotate &nbsp; shift/right-drag: pan &nbsp; wheel: zoom<br>
r: reset view &nbsp; +/-: point size &nbsp; n: normals &nbsp; w: wireframe<br>
p: perspective/ortho &nbsp; l: lighting &nbsp; h: help &nbsp; q: stop</div>
<script>
"use strict";
const SCENE = /*__SCENE_JSON__*/null;
const canvas = document.getElementById("c");
const gl = canvas.getContext("webgl", {antialias:true});
function b64f32(s){const b=atob(s);const u=new Uint8Array(b.length);
  for(let i=0;i<b.length;i++)u[i]=b.charCodeAt(i);return new Float32Array(u.buffer);}
const VS=`attribute vec3 aPos;attribute vec3 aCol;attribute vec3 aNrm;
uniform mat4 uMVP;uniform mat3 uNrm;uniform float uPtSize;
varying vec3 vCol;varying vec3 vNrm;
void main(){gl_Position=uMVP*vec4(aPos,1.0);gl_PointSize=uPtSize;
 vCol=aCol;vNrm=uNrm*aNrm;}`;
const FS=`precision mediump float;varying vec3 vCol;varying vec3 vNrm;
uniform float uOpacity;uniform float uLight;
void main(){vec3 c=vCol;
 if(uLight>0.5){float d=abs(normalize(vNrm).z);c*=0.25+0.75*d;}
 gl_FragColor=vec4(c,uOpacity);}`;
function shader(type,src){const s=gl.createShader(type);gl.shaderSource(s,src);
 gl.compileShader(s);if(!gl.getShaderParameter(s,gl.COMPILE_STATUS))
 throw gl.getShaderInfoLog(s);return s;}
const prog=gl.createProgram();
gl.attachShader(prog,shader(gl.VERTEX_SHADER,VS));
gl.attachShader(prog,shader(gl.FRAGMENT_SHADER,FS));
gl.linkProgram(prog);gl.useProgram(prog);
const loc={pos:gl.getAttribLocation(prog,"aPos"),col:gl.getAttribLocation(prog,"aCol"),
 nrm:gl.getAttribLocation(prog,"aNrm"),mvp:gl.getUniformLocation(prog,"uMVP"),
 nmat:gl.getUniformLocation(prog,"uNrm"),pt:gl.getUniformLocation(prog,"uPtSize"),
 op:gl.getUniformLocation(prog,"uOpacity"),li:gl.getUniformLocation(prog,"uLight")};

// --- build GPU objects ---------------------------------------------------
const objs=[];const texts=[];
for(const o of SCENE.objects){
  if(o.kind==="text"){texts.push(o);const d=document.createElement("div");
    d.className="txt";d.textContent=o.text;
    d.style.fontSize=o.fontSize+"px";
    d.style.color="rgb("+o.color.map(x=>Math.round(x*255)).join(",")+")";
    d.style.opacity=o.opacity;document.body.appendChild(d);o.el=d;continue;}
  const pos=b64f32(o.pos);const n=o.count;
  const buf={kind:o.kind,name:o.name,role:o.role||"",visible:o.visible!==false,
    hidden:!!o.hidden,opacity:o.opacity==null?1:o.opacity,
    pointSize:o.pointSize||2,lineWidth:o.lineWidth||1,
    lighting:o.lighting?1:0,count:n};
  buf.vboPos=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,buf.vboPos);
  gl.bufferData(gl.ARRAY_BUFFER,pos,gl.STATIC_DRAW);
  if(o.col){buf.vboCol=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,buf.vboCol);
    gl.bufferData(gl.ARRAY_BUFFER,b64f32(o.col),gl.STATIC_DRAW);}
  else buf.uniColor=o.uniformColor||[0.8,0.8,0.8];
  if(o.nrm){buf.vboNrm=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,buf.vboNrm);
    gl.bufferData(gl.ARRAY_BUFFER,b64f32(o.nrm),gl.STATIC_DRAW);}
  objs.push(buf);
}
// expose for automated driving / inspection
window.__viewer={scene:SCENE,objects:objs,stopped:false};

// --- camera state --------------------------------------------------------
const init=JSON.parse(JSON.stringify(SCENE.camera));
let proj=JSON.parse(JSON.stringify(SCENE.projection));
const st={};
function vsub(a,b){return [a[0]-b[0],a[1]-b[1],a[2]-b[2]];}
function vlen(a){return Math.hypot(a[0],a[1],a[2]);}
function resetView(){
  st.target=init.lookAt.slice();
  const d=vsub(init.position,init.lookAt);
  st.dist=vlen(d)||1;
  st.az=Math.atan2(d[0],d[2]);st.el=Math.asin(d[1]/st.dist);
  st.ptScale=1;st.showNormals=null;st.showWire=null;st.lightOn=null;}
resetView();
let helpOn=false,stopped=false;

// --- matrices ------------------------------------------------------------
function camEye(){return [st.target[0]+st.dist*Math.cos(st.el)*Math.sin(st.az),
  st.target[1]+st.dist*Math.sin(st.el),
  st.target[2]+st.dist*Math.cos(st.el)*Math.cos(st.az)];}
function lookAtM(eye,ctr,up){
  let f=vsub(ctr,eye);const fl=vlen(f);f=f.map(x=>x/fl);
  let s=[f[1]*up[2]-f[2]*up[1],f[2]*up[0]-f[0]*up[2],f[0]*up[1]-f[1]*up[0]];
  const sl=vlen(s)||1;s=s.map(x=>x/sl);
  const u=[s[1]*f[2]-s[2]*f[1],s[2]*f[0]-s[0]*f[2],s[0]*f[1]-s[1]*f[0]];
  return [s[0],u[0],-f[0],0, s[1],u[1],-f[1],0, s[2],u[2],-f[2],0,
   -(s[0]*eye[0]+s[1]*eye[1]+s[2]*eye[2]),
   -(u[0]*eye[0]+u[1]*eye[1]+u[2]*eye[2]),
   (f[0]*eye[0]+f[1]*eye[1]+f[2]*eye[2]),1];}
function perspM(fovY,asp,n,f){const t=1/Math.tan(fovY*Math.PI/360);
  return [t/asp,0,0,0, 0,t,0,0, 0,0,(f+n)/(n-f),-1, 0,0,2*f*n/(n-f),0];}
function orthoM(h,asp,n,f){const w=h*asp;
  return [2/w,0,0,0, 0,2/h,0,0, 0,0,-2/(f-n),0, 0,0,-(f+n)/(f-n),1];}
function matMul(a,b){const o=new Array(16);
  for(let r=0;r<4;r++)for(let c=0;c<4;c++){let s=0;
    for(let k=0;k<4;k++)s+=a[k*4+c]*b[r*4+k];o[r*4+c]=s;}return o;}

// --- input: trackball orbit / pan / zoom (visualizer_handler.cpp) --------
let drag=null;
canvas.addEventListener("mousedown",e=>{drag={x:e.clientX,y:e.clientY,
  pan:e.button===2||e.shiftKey};e.preventDefault();});
window.addEventListener("mouseup",()=>drag=null);
canvas.addEventListener("contextmenu",e=>e.preventDefault());
window.addEventListener("mousemove",e=>{if(!drag)return;
  const dx=e.clientX-drag.x,dy=e.clientY-drag.y;drag.x=e.clientX;drag.y=e.clientY;
  if(drag.pan){const s=st.dist*0.0015;
    const az=st.az,el=st.el;
    const right=[Math.cos(az),0,-Math.sin(az)];
    const up=[-Math.sin(el)*Math.sin(az),Math.cos(el),-Math.sin(el)*Math.cos(az)];
    for(let i=0;i<3;i++)st.target[i]+=(-dx*right[i]+dy*up[i])*s;}
  else{st.az-=dx*0.008;st.el=Math.max(-1.55,Math.min(1.55,st.el+dy*0.008));}});
canvas.addEventListener("wheel",e=>{e.preventDefault();
  st.dist*=Math.pow(1.0015,e.deltaY);},{passive:false});
window.addEventListener("keydown",e=>{
  const k=e.key;
  if(k==="r"||k==="R")resetView();
  else if(k==="+"||k==="=")st.ptScale*=1.25;
  else if(k==="-")st.ptScale/=1.25;
  else if(k==="n"||k==="N")st.showNormals=st.showNormals===null?true:!st.showNormals;
  else if(k==="w"||k==="W")st.showWire=st.showWire===null?true:!st.showWire;
  else if(k==="l"||k==="L")st.lightOn=st.lightOn===null?false:!st.lightOn;
  else if(k==="p"||k==="P")proj.ortho=!proj.ortho;
  else if(k==="h"||k==="H"){helpOn=!helpOn;
    document.getElementById("help").style.display=helpOn?"block":"none";}
  else if(k==="q"||k==="Q"){stopped=true;window.__viewer.stopped=true;
    document.getElementById("hint").textContent="stopped (q)";}});

// --- render loop ---------------------------------------------------------
function draw(){
  const dpr=window.devicePixelRatio||1;
  const w=canvas.clientWidth*dpr,h=canvas.clientHeight*dpr;
  if(canvas.width!==w||canvas.height!==h){canvas.width=w;canvas.height=h;}
  gl.viewport(0,0,w,h);
  const cc=SCENE.clearColor;gl.clearColor(cc[0],cc[1],cc[2],1);
  gl.enable(gl.DEPTH_TEST);
  gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
  const eye=camEye();
  const view=lookAtM(eye,st.target,init.up);
  const asp=w/h;
  const near=Math.max(proj.near??st.dist*1e-3,st.dist*1e-4);
  const far=Math.max(proj.far??st.dist*100,st.dist*10);
  const P=proj.ortho?orthoM(proj.orthoHeight||2*SCENE.sceneRadius,asp,near,far)
                    :perspM(proj.fovY||45,asp,near,far);
  const mvp=matMul(P,view);
  gl.uniformMatrix4fv(loc.mvp,false,new Float32Array(mvp));
  // normal matrix = upper-left of view (rigid)
  gl.uniformMatrix3fv(loc.nmat,false,new Float32Array([
    view[0],view[1],view[2],view[4],view[5],view[6],view[8],view[9],view[10]]));
  gl.enable(gl.BLEND);gl.blendFunc(gl.SRC_ALPHA,gl.ONE_MINUS_SRC_ALPHA);
  for(const o of objs){
    if(!o.visible)continue;
    let hid=o.hidden;
    if(o.role==="normals"&&st.showNormals!==null)hid=!st.showNormals;
    if(o.role==="wireframe"&&st.showWire!==null)hid=!st.showWire;
    if(hid)continue;
    gl.depthMask(o.opacity>=1.0);
    gl.bindBuffer(gl.ARRAY_BUFFER,o.vboPos);
    gl.enableVertexAttribArray(loc.pos);
    gl.vertexAttribPointer(loc.pos,3,gl.FLOAT,false,0,0);
    if(o.vboCol){gl.bindBuffer(gl.ARRAY_BUFFER,o.vboCol);
      gl.enableVertexAttribArray(loc.col);
      gl.vertexAttribPointer(loc.col,3,gl.FLOAT,false,0,0);}
    else{gl.disableVertexAttribArray(loc.col);
      gl.vertexAttrib3fv(loc.col,o.uniColor);}
    if(o.vboNrm){gl.bindBuffer(gl.ARRAY_BUFFER,o.vboNrm);
      gl.enableVertexAttribArray(loc.nrm);
      gl.vertexAttribPointer(loc.nrm,3,gl.FLOAT,false,0,0);}
    else{gl.disableVertexAttribArray(loc.nrm);gl.vertexAttrib3f(loc.nrm,0,0,1);}
    gl.uniform1f(loc.pt,o.pointSize*st.ptScale*dpr);
    gl.uniform1f(loc.op,o.opacity);
    const lit=(st.lightOn===null?o.lighting:(st.lightOn&&o.lighting))?1:0;
    gl.uniform1f(loc.li,o.kind==="mesh"?lit:0);
    if(o.kind==="points")gl.drawArrays(gl.POINTS,0,o.count);
    else if(o.kind==="lines"){gl.lineWidth(o.lineWidth);
      gl.drawArrays(gl.LINES,0,o.count);}
    else gl.drawArrays(gl.TRIANGLES,0,o.count);
  }
  gl.depthMask(true);
  // project text anchors
  for(const t of texts){
    const p=t.pos3;const x=mvp[0]*p[0]+mvp[4]*p[1]+mvp[8]*p[2]+mvp[12];
    const y=mvp[1]*p[0]+mvp[5]*p[1]+mvp[9]*p[2]+mvp[13];
    const wc=mvp[3]*p[0]+mvp[7]*p[1]+mvp[11]*p[2]+mvp[15];
    if(wc<=0){t.el.style.display="none";continue;}
    t.el.style.display="block";
    const sx=(x/wc*0.5+0.5)*canvas.clientWidth;
    const sy=(-y/wc*0.5+0.5)*canvas.clientHeight;
    const r=t.el.getBoundingClientRect();
    t.el.style.left=(sx-t.anchor[0]*r.width)+"px";
    t.el.style.top=(sy-t.anchor[1]*r.height)+"px";
  }
  requestAnimationFrame(draw);
}
document.title=SCENE.title+" — cilantro_tpu";
requestAnimationFrame(draw);
</script></body></html>
"""

_IMAGE_TEMPLATE = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__ — cilantro_tpu</title>
<style>html,body{margin:0;height:100%;overflow:hidden;background:#222}
#img{position:absolute;image-rendering:pixelated;transform-origin:0 0}
#hud{position:absolute;right:10px;top:10px;color:#aaa;font:11px sans-serif}
</style></head><body>
<img id="img" src="data:image/png;base64,__PNG_B64__" width="__W__" height="__H__">
<div id="hud">wheel: zoom &nbsp; drag: pan &nbsp; r: reset</div>
<script>
"use strict";
const img=document.getElementById("img");
let sc=1,tx=20,ty=20,drag=null;
function apply(){img.style.transform=`translate(${tx}px,${ty}px) scale(${sc})`;}
window.addEventListener("wheel",e=>{e.preventDefault();
  const f=Math.pow(1.0015,-e.deltaY);
  tx=e.clientX-(e.clientX-tx)*f;ty=e.clientY-(e.clientY-ty)*f;sc*=f;apply();},
  {passive:false});
window.addEventListener("mousedown",e=>{drag={x:e.clientX,y:e.clientY};});
window.addEventListener("mouseup",()=>drag=null);
window.addEventListener("mousemove",e=>{if(!drag)return;
  tx+=e.clientX-drag.x;ty+=e.clientY-drag.y;drag.x=e.clientX;drag.y=e.clientY;apply();});
window.addEventListener("keydown",e=>{if(e.key==="r"){sc=1;tx=ty=20;apply();}});
window.__imageViewer={get scale(){return sc;}};
apply();
</script></body></html>
"""
