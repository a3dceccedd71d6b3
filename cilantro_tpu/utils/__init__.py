from .ply_io import read_ply, read_point_cloud, write_point_cloud  # noqa: F401
