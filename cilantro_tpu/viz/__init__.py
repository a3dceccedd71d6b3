from .offline import (  # noqa: F401
    render_cloud_image,
    save_cloud_png,
    save_trajectory_png,
    dump_artifacts,
    auto_camera,
)
from .interactive import (  # noqa: F401
    RenderingProperties,
    Renderable,
    PointCloudRenderable,
    PointCorrespondencesRenderable,
    CoordinateFrameRenderable,
    CameraFrustumRenderable,
    TriangleMeshRenderable,
    TextRenderable,
    Visualizer,
    ImageViewer,
)
from .live import LiveMapViewer  # noqa: F401
