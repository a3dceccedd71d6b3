"""Interactive-viewer export: registry semantics + embedded-scene fidelity."""
import base64
import json
import re

import numpy as np
import pytest

from cilantro_tpu.viz import (
    CameraFrustumRenderable,
    CoordinateFrameRenderable,
    ImageViewer,
    PointCloudRenderable,
    PointCorrespondencesRenderable,
    RenderingProperties,
    TextRenderable,
    TriangleMeshRenderable,
    Visualizer,
)
from cilantro_tpu.core.rgbd import CameraIntrinsics


def _extract_scene(html: str) -> dict:
    m = re.search(r"const SCENE = (\{.*?\});\n", html, re.S)
    assert m, "scene JSON not embedded"
    return json.loads(m.group(1))


def _decode(prim: dict, key: str = "pos") -> np.ndarray:
    return np.frombuffer(base64.b64decode(prim[key]), dtype=np.float32).reshape(-1, 3)


def test_export_roundtrips_geometry(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (100, 1))
    cols = rng.uniform(size=(100, 3)).astype(np.float32)

    viz = Visualizer("test_scene")
    viz.add_object(
        "cloud",
        PointCloudRenderable(
            (pts, nrm, cols),
            RenderingProperties(point_size=3.0, draw_normals=True),
        ),
    )
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    viz.add_object("mesh", TriangleMeshRenderable(verts, faces))
    viz.add_object("frame", CoordinateFrameRenderable(scale=0.5))
    viz.add_object(
        "cam",
        CameraFrustumRenderable(
            640, 480, CameraIntrinsics.make(500.0, 500.0, 320.0, 240.0), scale=0.1
        ),
    )
    viz.add_object("label", TextRenderable("hello", [0.0, 0.0, 0.0]))

    path = viz.export_html(str(tmp_path / "scene.html"))
    html = open(path).read()
    scene = _extract_scene(html)

    by_name = {}
    for p in scene["objects"]:
        by_name.setdefault(p["name"], []).append(p)

    cloud_prims = by_name["cloud"]
    pts_prim = [p for p in cloud_prims if p["kind"] == "points"][0]
    np.testing.assert_array_equal(_decode(pts_prim), pts)
    np.testing.assert_array_equal(_decode(pts_prim, "col"), cols)
    # normal glyph segments: start at points, end normal_length along normals
    nrm_prim = [p for p in cloud_prims if p.get("role") == "normals"][0]
    seg = _decode(nrm_prim)
    np.testing.assert_array_equal(seg[0::2], pts)
    np.testing.assert_allclose(seg[1::2] - seg[0::2], 0.05 * nrm, atol=1e-6)
    assert not nrm_prim["hidden"]  # draw_normals=True

    mesh_prim = [p for p in by_name["mesh"] if p["kind"] == "mesh"][0]
    tri = _decode(mesh_prim)
    assert tri.shape == (12, 3)  # 4 faces × 3 vertices, triangle soup
    np.testing.assert_array_equal(tri, verts[faces.reshape(-1)])
    normals = _decode(mesh_prim, "nrm")
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-5)
    wire = [p for p in by_name["mesh"] if p.get("role") == "wireframe"][0]
    assert wire["hidden"]  # draw_wireframe defaults off
    assert wire["count"] == 12  # 6 unique edges × 2 endpoints

    frame_prim = by_name["frame"][0]
    seg = _decode(frame_prim)
    np.testing.assert_allclose(seg[1] - seg[0], [0.5, 0, 0], atol=1e-6)

    cam_prim = by_name["cam"][0]
    assert cam_prim["count"] == 16  # 8 frustum edges

    txt = by_name["label"][0]
    assert txt["kind"] == "text" and txt["text"] == "hello"

    # handler + shaders present in the artifact
    for key in ['k==="r"', 'k==="n"', 'k==="w"', 'k==="p"', "wheel", "VERTEX_SHADER"]:
        assert key in html


def test_registry_semantics(tmp_path):
    viz = Visualizer()
    r = viz.add_object("a", PointCloudRenderable(np.zeros((4, 3), np.float32)))
    assert viz.get_object("a") is r
    assert viz.get_object_names() == ["a"]
    assert viz.get_visibility("a")
    viz.toggle_visibility("a")
    assert not viz.get_visibility("a")
    scene = _extract_scene(
        open(viz.export_html(str(tmp_path / "s.html"))).read()
    )
    assert all(not p["visible"] for p in scene["objects"])
    viz.set_rendering_properties("a", RenderingProperties(point_size=9.0))
    assert viz.get_rendering_properties("a").point_size == 9.0
    viz.remove("a")
    assert viz.get_object("a") is None
    viz.clear()
    assert viz.get_object_names() == []


def test_opacity_render_order(tmp_path):
    viz = Visualizer()
    viz.add_object(
        "transparent",
        PointCloudRenderable(
            np.zeros((2, 3), np.float32), RenderingProperties(opacity=0.4)
        ),
    )
    viz.add_object(
        "opaque", PointCloudRenderable(np.ones((2, 3), np.float32))
    )
    scene = _extract_scene(
        open(viz.export_html(str(tmp_path / "s.html"))).read()
    )
    names = [p["name"] for p in scene["objects"]]
    assert names.index("opaque") < names.index("transparent")


def test_scalar_colormap_and_uniform_color(tmp_path):
    pts = np.zeros((5, 3), np.float32)
    r = PointCloudRenderable(pts, RenderingProperties()).set_point_values(
        np.arange(5.0)
    )
    prim = r.primitives()[0]
    cols = _decode(prim, "col")
    assert cols.shape == (5, 3)
    assert not np.allclose(cols[0], cols[-1])  # colormap spans the range

    runi = PointCloudRenderable(
        pts, RenderingProperties().set_point_color(0.1, 0.2, 0.3)
    )
    prim = runi.primitives()[0]
    assert "col" not in prim
    np.testing.assert_allclose(prim["uniformColor"], [0.1, 0.2, 0.3])


def test_correspondence_lines():
    s = np.zeros((3, 3), np.float32)
    d = np.ones((3, 3), np.float32)
    r = PointCorrespondencesRenderable(d, s)
    seg = _decode(r.primitives()[0])
    np.testing.assert_array_equal(seg[0::2], s)
    np.testing.assert_array_equal(seg[1::2], d)


def test_script_close_tag_escaped(tmp_path):
    viz = Visualizer()
    viz.add_object("evil", TextRenderable("</script><b>x</b>", [0, 0, 0]))
    html = open(viz.export_html(str(tmp_path / "s.html"))).read()
    assert "</script><b>" not in html  # escaped to <\/script>
    scene = _extract_scene(html)
    assert scene["objects"][0]["text"] == "</script><b>x</b>"


def test_image_viewer_export(tmp_path):
    img = np.linspace(0, 1, 12, dtype=np.float32).reshape(2, 2, 3)
    v = ImageViewer("depth").set_image(img)
    path = v.export_html(str(tmp_path / "img.html"))
    html = open(path).read()
    assert "data:image/png;base64," in html
    assert 'width="2" height="2"' in html
    b64 = re.search(r"base64,([A-Za-z0-9+/=]+)", html).group(1)
    png = base64.b64decode(b64)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_live_map_viewer_snapshots(tmp_path):
    """During-run visualization hook: periodic self-contained HTML
    snapshots from inside run_fusion_sequence (the reference renders its
    live map every frame, fusion.cpp:241-250; headless TPU analogue)."""
    import numpy as np

    from cilantro_tpu.core.rgbd import CameraIntrinsics
    from cilantro_tpu.slam import run_fusion_sequence, synthetic_sequence
    from cilantro_tpu.viz import LiveMapViewer

    h, w = 48, 64
    k = CameraIntrinsics.make(w * 525 / 640, w * 525 / 640,
                              (w - 1) / 2, (h - 1) / 2)
    depths, _ = synthetic_sequence(6, h, w, k, seed=2)
    out = str(tmp_path / "live.html")
    viewer = LiveMapViewer(out, every=2, subsample=5000)
    fmap, metrics = run_fusion_sequence(
        depths, k, map_capacity=4 * h * w, on_frame=viewer
    )
    assert viewer.snapshots >= 2
    html = open(out).read()
    assert "fusion live" in html and "http-equiv" in html
    assert len(html) > 10_000  # a real scene payload, not a stub
