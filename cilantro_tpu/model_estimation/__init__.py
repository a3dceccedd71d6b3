from .ransac import (  # noqa: F401
    Hyperplane,
    RANSACResult,
    ransac_plane,
    ransac_transform,
)
