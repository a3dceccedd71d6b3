from .api import (  # noqa: F401
    Neighborhoods,
    knn_search,
    radius_search,
    knn_in_radius_search,
)
from .bruteforce import knn, nn1, INVALID_DIST  # noqa: F401
from .gridhash import radius_search_grid  # noqa: F401
