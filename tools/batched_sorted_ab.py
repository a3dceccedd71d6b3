"""Round-5 A/B: batched warp sorted vs chunked assembly at B=8 (cited in
ROUND5.md — sorted 601 vs chunked 555 ms/solve; sorted compiles ~4x faster).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/batched_sorted_ab.py
"""
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import dataclasses
from cilantro_tpu.registration import icp_warp_field_batched
from cilantro_tpu.utils import read_point_cloud
from bench import _bench_edg_graph_host

src, _, _ = read_point_cloud("/root/reference/examples/test_clouds/frame_1.ply")
dsts = []
for b in range(8):
    d = src.copy()
    d[:, 2] += 0.02 * np.sin((8 + 0.5 * b) * src[:, 0] + 0.3 * b)
    d[:, 1] += 0.01 * np.cos((6 + 0.3 * b) * src[:, 0])
    dsts.append(d)
srcj = jax.device_put(src)
dstb = jax.device_put(np.stack(dsts))
graph = _bench_edg_graph_host(src)
stripped = dataclasses.replace(graph, ps_kkf=None, ps_llf=None, ps_w2=None,
                               ps_swap=None, ps_seg=None,
                               arc_sorted_order=None, arc_sorted_seg=None)
kw = dict(max_corr_dist_sq=0.0025, point_weight=1.0, plane_weight=0.0,
          stiffness=50.0, max_iterations=10)
for label, g in (("sorted", graph), ("chunked", stripped)):
    t0 = time.perf_counter()
    tf, it, _ = icp_warp_field_batched(g, srcj, dstb, **kw)
    np.asarray(tf.translation[:, :1])
    print(f"{label}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        tf, it, _ = icp_warp_field_batched(g, srcj, dstb, **kw)
        np.asarray(tf.translation[:, :1])
        best = min(best, time.perf_counter()-t0)
    print(f"{label}: warm best {best:.2f}s = {best/8*1e3:.0f} ms/solve", flush=True)
