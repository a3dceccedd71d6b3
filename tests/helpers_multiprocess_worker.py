import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
nproc = int(sys.argv[2])
from cilantro_tpu.parallel import initialize_distributed, process_info

os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:12355"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)
ok = initialize_distributed()
print(f"[p{pid}] initialized={ok} info={process_info()}", flush=True)

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cilantro_tpu.parallel import make_mesh, sharded_combined_icp_ring

rng = np.random.default_rng(0)
n = 4096
xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
z = (0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])).astype(np.float32)
pts = np.column_stack([xy, z])
ang = 0.05
r = np.array(
    [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
    np.float32,
)
t = np.array([0.02, -0.01, 0.015], np.float32)
dst = pts @ r.T + t
nrm = np.zeros_like(dst)
nrm[:, 2] = 1.0

mesh = make_mesh(jax.device_count(), 1)  # global mesh spanning both processes


def put(a):
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("points", *([None] * (a.ndim - 1)))), a
    )


src_s = put(pts)
sv = put(np.ones(n, bool))
dst_s = put(dst)
dn = put(nrm)
dv = put(np.ones(n, bool))
tf, iters = sharded_combined_icp_ring(
    src_s, sv, dst_s, dn, dv, mesh=mesh,
    max_corr_dist_sq=0.25, max_iterations=30, convergence_tol=1e-7,
    point_weight=0.3,
)
lin = np.asarray(jax.device_get(tf.linear))
tr = np.asarray(jax.device_get(tf.translation))
err_r = np.abs(lin - r).max()
err_t = np.abs(tr - t).max()
print(f"[p{pid}] ring ICP over 2-process mesh: rot err {err_r:.1e}, "
      f"tr err {err_t:.1e}", flush=True)
assert err_r < 2e-3 and err_t < 2e-3
print(f"[p{pid}] MULTIPROC OK", flush=True)
