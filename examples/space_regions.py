"""Space-region set algebra (reference ``examples/space_region_2d.cpp`` /
``space_region_3d.cpp``): unions of polytopes, intersection, complement,
containment.

Usage: python examples/space_regions.py
"""

import numpy as np

from cilantro_tpu.spatial import ConvexPolytope, SpaceRegion

rng = np.random.default_rng(1)


def box(center, half, d=3):
    lo = np.asarray(center) - half
    hi = np.asarray(center) + half
    corners = np.array(
        np.meshgrid(*[[lo[i], hi[i]] for i in range(d)])
    ).reshape(d, -1).T
    return ConvexPolytope.from_points(corners)


# --- 2D -------------------------------------------------------------------
a2 = box([0, 0], 1.0, d=2)
b2 = box([1.2, 0], 1.0, d=2)
r = SpaceRegion([a2]).union(SpaceRegion([b2]))
probes = np.array([[0.0, 0.0], [1.2, 0.0], [3.0, 0.0]])
print("2D union contains:", [bool(v) for v in r.contains(probes)])

inter = SpaceRegion([a2]).intersection(SpaceRegion([b2]))
print(
    "2D intersection (overlap strip) contains (0.6, 0):",
    bool(inter.contains(np.array([[0.6, 0.0]]))[0]),
    "| (-0.5, 0):",
    bool(inter.contains(np.array([[-0.5, 0.0]]))[0]),
)

comp = SpaceRegion([a2]).complement()
print(
    "2D complement contains (3, 3):",
    bool(comp.contains(np.array([[3.0, 3.0]]))[0]),
    "| origin:",
    bool(comp.contains(np.array([[0.0, 0.0]]))[0]),
)

# --- 3D -------------------------------------------------------------------
a3 = box([0, 0, 0], 1.0)
b3 = box([0.8, 0.8, 0.8], 1.0)
r3 = SpaceRegion([a3]).intersection(SpaceRegion([b3]))
probes3 = np.array([[0.9, 0.9, 0.9], [-0.9, -0.9, -0.9]])
print("3D intersection contains:", [bool(v) for v in r3.contains(probes3)])

u3 = SpaceRegion([a3]).union(SpaceRegion([b3]))
mc = rng.uniform(-1.0, 1.8, (20000, 3))
frac = np.mean(np.asarray(u3.contains(mc)))
vol_est = frac * (2.8 ** 3)
print(f"3D union Monte-Carlo volume ≈ {vol_est:.2f} (2 cubes minus overlap)")
