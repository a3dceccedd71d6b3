"""Round-3 probe #9: pair-block assembly strategies for the direct warp GN.

The direct solver's dominant cost (honest-bench: 176 of 283 ms/GN) is the
unordered anchor-pair scatter-add: 1.2M rows x 36 f32 into an (M*M, 36)
accumulator via ``acc.at[keys].add``.  The keys are STATIC per solve (the
graph is fixed), which opens precomputed-sort strategies.  Candidates:

  A  burned-in baseline: unsorted ``at[keys].add`` into (M*M, 36)
  B  static-perm gather -> sorted segment_sum into compact (U, 36)
     -> unique sorted ``at[uniq].set`` expand
  C  unsorted segment_sum straight into M*M segments (scatter equivalent)
  D  pre-sorted values (free if points are laid out by key at build time)
     -> sorted segment_sum into compact (U, 36)  [lower bound for B]

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/pairblock_probe.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from tools.honest_bench import op_time


def main():
    from cilantro_tpu.core.containers import PointCloud
    from cilantro_tpu.core.grid import grid_downsample
    from cilantro_tpu.registration import build_deformation_graph
    from cilantro_tpu.utils import read_point_cloud

    src, _, _ = read_point_cloud(
        "/root/reference/examples/test_clouds/frame_1.ply"
    )
    srcj = jax.device_put(src)
    ctrl = grid_downsample(PointCloud(points=srcj), 0.025, capacity=1024)
    graph = build_deformation_graph(
        srcj, ctrl.points, node_valid=ctrl.valid, k_anchors=4, k_arcs=8
    )
    anchors = np.asarray(graph.anchors)  # (N, K) concrete
    n, K = anchors.shape
    m = graph.num_nodes
    T = K * (K + 1) // 2
    kk, ll = [], []
    for a in range(K):
        for b in range(a, K):
            kk.append(a)
            ll.append(b)
    kk, ll = np.array(kk), np.array(ll)
    a_n = anchors[:, kk]
    b_n = anchors[:, ll]
    keys = (np.minimum(a_n, b_n).astype(np.int64) * m
            + np.maximum(a_n, b_n)).reshape(-1)  # (N*T,)
    perm = np.argsort(keys, kind="stable")
    skeys = keys[perm]
    uniq, seg_start = np.unique(skeys, return_index=True)
    U = len(uniq)
    seg_ids = np.zeros(len(skeys), np.int32)
    seg_ids[seg_start[1:]] = 1
    seg_ids = np.cumsum(seg_ids).astype(np.int32)
    print(f"N={n} K={K} T={T} rows={n*T} m={m} unique keys U={U} "
          f"(mean dups {n*T/U:.1f})", flush=True)

    pp = 36
    rows = n * T
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((rows, pp)), jnp.float32)
    keys_j = jnp.asarray(keys.astype(np.int32))
    perm_j = jnp.asarray(perm.astype(np.int32))
    seg_j = jnp.asarray(seg_ids)
    uniq_j = jnp.asarray(uniq.astype(np.int32))

    def a_scatter(v):
        acc = jnp.zeros((m * m, pp), jnp.float32)
        return acc.at[keys_j].add(v)

    def b_sorted(v):
        sv = v[perm_j]
        comp = jax.ops.segment_sum(
            sv, seg_j, num_segments=U, indices_are_sorted=True
        )
        acc = jnp.zeros((m * m, pp), jnp.float32)
        return acc.at[uniq_j].set(
            comp, indices_are_sorted=True, unique_indices=True
        )

    def c_segsum(v):
        return jax.ops.segment_sum(v, keys_j, num_segments=m * m)

    def d_presorted(v):
        return jax.ops.segment_sum(
            v, seg_j, num_segments=U, indices_are_sorted=True
        )

    for name, fn in [("A at[].add (burned-in)", a_scatter),
                     ("B perm+sorted segsum+expand", b_sorted),
                     ("C unsorted segment_sum", c_segsum),
                     ("D pre-sorted segsum (LB)", d_presorted)]:
        try:
            r = op_time(fn, (vals,), lo=1, hi=4)
            print(f"{name}: {r}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # numeric agreement A vs B
    va = a_scatter(vals)
    vb = b_sorted(vals)
    print("max |A-B| =", float(jnp.max(jnp.abs(va - vb))), flush=True)


if __name__ == "__main__":
    main()
