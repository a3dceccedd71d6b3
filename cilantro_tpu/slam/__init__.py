from .fusion import (  # noqa: F401
    FusionConfig,
    FusionMap,
    empty_map,
    init_map_from_frame,
    integrate_frame,
    localize,
)
