from .api import (  # noqa: F401
    Neighborhoods,
    knn_search,
    radius_search,
    knn_in_radius_search,
)
from .bruteforce import knn, nn1, INVALID_DIST  # noqa: F401
from .gridhash import radius_search_grid  # noqa: F401
from .pallas_nn import (  # noqa: F401
    NN1PrunePlan,
    knn_pruned,
    make_nn1_prune_plan,
    nn1_pruned,
    nn1_pruned_planned,
    radius_search_pruned,
)
