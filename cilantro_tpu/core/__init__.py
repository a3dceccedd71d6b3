from .containers import PointCloud, from_numpy, compact, append  # noqa: F401
from .transforms import (  # noqa: F401
    Transform,
    identity,
    from_matrix,
    compose,
    inverse,
    transform_points,
    transform_normals,
    transform_points_normals,
    project_to_rotation,
    reproject_rigid,
)
