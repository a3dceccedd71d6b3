"""Multi-host runtime entry: ``jax.distributed`` initialization + mesh setup.

The reference is a single-process library (SURVEY §2.10: OpenMP only); the
TPU-native framework scales across hosts through JAX's distributed runtime.
This module is the one place a multi-host launcher touches:

    # on every host (e.g. one process per TPU host in a pod slice):
    from cilantro_tpu.parallel import initialize_distributed, make_mesh
    initialize_distributed()           # env-driven (TPU pods auto-detect)
    mesh = make_mesh(n_map_shards=jax.device_count())

After initialization, every `shard_map` program in this package (sharded
ICP / ring NN / Schur BA / sharded fusion) runs unchanged over the global
device set: the mesh spans all hosts' devices and XLA routes `psum` /
`ppermute` over ICI within a slice and DCN across slices.

Single-process multi-device (including the CPU `--xla_force_host_platform_
device_count` test rig) needs no initialization — `initialize_distributed`
is a no-op there by default.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Initialize the multi-host JAX runtime (idempotent).

    Arguments default from the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``)
    and on TPU pods from the cloud metadata autodetection built into
    ``jax.distributed.initialize``. Returns True when a multi-process runtime
    was (or already is) active, False when running single-process.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and os.environ.get("TPU_WORKER_HOSTNAMES") is None
        and os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is None
    ):
        # Single process, nothing to coordinate.
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def process_info():
    """(process_index, process_count, local_device_count, global_device_count)."""
    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
