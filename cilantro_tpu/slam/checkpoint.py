"""Checkpoint / resume for the fusion pipeline.

The reference has no checkpointing — its fusion app holds the map in RAM and
writes one PLY at exit (``examples/fusion.cpp:262``; SURVEY §5). A long-running
or distributed pipeline needs restartable state: this module serializes the
complete per-frame carry — packed map pool, trajectory, the cached index map
— plus the keyframe graph, as one ``.npz``. Resuming from a checkpoint
reproduces the exact continuation the uninterrupted run would have produced
(bit-identical trajectory tail; the cached index map is part of the carry,
so not even the warm-start render differs).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .fusion import FusionMap
from .keyframes import Keyframe, KeyframeGraph


@dataclasses.dataclass
class FusionCheckpoint:
    map_data: np.ndarray  # (C, 16) packed pool
    poses: List[np.ndarray]  # (4, 4) camera-to-world per processed frame
    next_frame: int  # index of the first unprocessed frame
    index_map: Optional[np.ndarray]  # (H, W) cached render, or None
    graph: Optional[KeyframeGraph]
    icp_iterations: Optional[np.ndarray] = None  # per processed frame

    def fusion_map(self) -> FusionMap:
        import jax.numpy as jnp

        return FusionMap(data=jnp.asarray(self.map_data))


def save_checkpoint(
    path: str,
    fmap: FusionMap,
    poses: List[np.ndarray],
    next_frame: int,
    *,
    index_map=None,
    graph: Optional[KeyframeGraph] = None,
    icp_iterations=None,
) -> None:
    """Serialize the fusion carry (+ optional keyframe graph) to ``path``."""
    arrays = {
        "map_data": np.asarray(fmap.data),
        "poses": np.stack([np.asarray(p) for p in poses]),
        "next_frame": np.asarray(next_frame, np.int64),
    }
    if icp_iterations is not None:
        arrays["icp_iterations"] = np.asarray(icp_iterations, np.int32)
    if index_map is not None:
        arrays["index_map"] = np.asarray(index_map)
    if graph is not None:
        arrays["n_keyframes"] = np.asarray(len(graph.keyframes), np.int64)
        for i, kf in enumerate(graph.keyframes):
            arrays[f"kf{i}_index"] = np.asarray(kf.index, np.int64)
            arrays[f"kf{i}_pose"] = np.asarray(kf.pose)
            arrays[f"kf{i}_points"] = np.asarray(kf.points)
            if kf.normals is not None:
                arrays[f"kf{i}_normals"] = np.asarray(kf.normals)
        arrays["edge_i"] = np.asarray(graph.edge_i, np.int64)
        arrays["edge_j"] = np.asarray(graph.edge_j, np.int64)
        if graph.measurements:
            arrays["edge_z"] = np.stack(
                [np.asarray(z) for z in graph.measurements]
            )
        arrays["edge_w"] = np.asarray(graph.edge_weights, np.float32)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str) -> FusionCheckpoint:
    with np.load(path) as z:
        graph = None
        if "n_keyframes" in z:
            graph = KeyframeGraph.empty()
            for i in range(int(z["n_keyframes"])):
                graph.add_keyframe(
                    Keyframe(
                        index=int(z[f"kf{i}_index"]),
                        pose=z[f"kf{i}_pose"],
                        points=z[f"kf{i}_points"],
                        normals=(
                            z[f"kf{i}_normals"]
                            if f"kf{i}_normals" in z
                            else None
                        ),
                    )
                )
            edge_z = z["edge_z"] if "edge_z" in z else np.zeros((0, 4, 4))
            graph.edge_i = [int(v) for v in z["edge_i"]]
            graph.edge_j = [int(v) for v in z["edge_j"]]
            graph.measurements = [m for m in edge_z]
            graph.edge_weights = [float(v) for v in z["edge_w"]]
        return FusionCheckpoint(
            map_data=z["map_data"],
            poses=[p for p in z["poses"]],
            next_frame=int(z["next_frame"]),
            index_map=z["index_map"] if "index_map" in z else None,
            graph=graph,
            icp_iterations=(
                z["icp_iterations"] if "icp_iterations" in z else None
            ),
        )
