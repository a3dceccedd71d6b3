from .transform_estimation import (  # noqa: F401
    estimate_rigid_point_to_point,
    estimate_affine_point_to_point,
    estimate_rigid_combined_metric,
    estimate_rigid_symmetric_metric,
    estimate_affine_combined_metric,
    residuals_combined_metric,
)
from .icp import (  # noqa: F401
    ICPResult,
    icp,
    icp_residuals,
    simple_point_to_point_icp,
    simple_combined_metric_icp,
)
from .icp import icp_multires, icp_projective  # noqa: F401
from .warp_field import (  # noqa: F401
    DeformationGraph,
    build_deformation_graph,
    build_dense_graph,
    estimate_warp_field,
    icp_warp_field,
    icp_warp_field_projective,
    identity_warp,
    resample_transforms,
    warp_points,
)
from .warp_field_batched import (  # noqa: F401
    estimate_warp_field_batched,
    icp_warp_field_batched,
    identity_warp_batched,
    warp_points_batched,
)
