"""cilantro-tpu: a TPU-native point-cloud processing / registration / SLAM
framework (JAX / XLA / Pallas), providing the capability surface of the
reference C++ library kzampog/cilantro redesigned for TPU hardware.

Subpackages
-----------
core            masked point clouds, transforms, covariance, normals, grids,
                PCA, RGBD conversions
neighbors       exact NN engines (tiled brute-force MXU, grid-hash, Pallas)
correspondence  NN / projective / oracle correspondence search
registration    closed-form + Gauss-Newton rigid/affine ICP, non-rigid warp
                fields (dense + embedded-deformation-graph)
model_estimation  vmapped RANSAC (plane, rigid/affine transform)
clustering      k-means, mean-shift, connected components, spectral
spatial         convex polytopes / space regions
utils           PLY & matrix I/O, MDS, NN-graph matrices, timer, colormaps
parallel        device-mesh sharding, distributed normal-equation reduction
slam            projective-ICP fusion pipeline, pose graph, Schur-complement BA
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry is conditioning-sensitive (normal equations, SO(3) projections,
# squared-distance cancellation): default every matmul/einsum to true f32
# accumulation. Hot kernels that tolerate bf16 opt in locally via
# ``precision=`` / explicit dtype casts.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import (  # noqa: F401
    clustering,
    core,
    correspondence,
    model_estimation,
    neighbors,
    parallel,
    registration,
    slam,
    spatial,
    utils,
)
