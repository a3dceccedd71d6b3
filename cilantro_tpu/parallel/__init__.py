from .sharded import (  # noqa: F401
    make_mesh,
    sharded_combined_icp,
    shard_cloud_arrays,
)
from .sharded import ring_nn1  # noqa: F401
