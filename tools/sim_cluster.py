#!/usr/bin/env python
"""Offline sizing study for the MXU cluster-test traversal design.

Cuts the scene's BVH2 into 'clusters' (maximal subtrees holding <= T_C
triangles => contiguous triangle ranges), then measures, for a
production-shaped population of incoherent bounce rays, how many cluster
AABBs each ray's line actually enters (the per-ray candidate count the
enumeration walk would emit).  This sizes:

* K        — per-lane emit slots (overflow rate = P[count > K])
* pairs/N  — the (ray, cluster) pair workload the MXU chunk kernel pays
* pruned   — candidate count if candidates are processed near-first and
             testing a cluster resolves the ray's hit inside it (the
             t_entry-ordered early-exit upper bound)

Pure numpy — runs without the TPU.  Decision input for kernels/cluster
(BENCH_NOTES round 3).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cluster_cut(index, count, tmax_leaf, root, t_c):
    """Maximal subtrees with <= t_c tris -> list of (tri_lo, tri_hi)."""
    # subtree tri ranges: leaves own [index, index+count); interiors span
    # their children's union (builder partitions in place => contiguous).
    n = index.shape[0]
    lo = np.full(n, 1 << 60, np.int64)
    hi = np.full(n, -1, np.int64)

    # bottom-up: process nodes in reverse allocation order (children are
    # allocated after parents; a reverse sweep sees children first)
    for i in range(n - 1, -1, -1):
        if count[i] > 0:
            lo[i] = index[i]
            hi[i] = index[i] + count[i]
        else:
            c = index[i]
            lo[i] = min(lo[c], lo[c + 1])
            hi[i] = max(hi[c], hi[c + 1])
    clusters = []

    def rec(node):
        size = hi[node] - lo[node]
        if size <= t_c:
            clusters.append((int(lo[node]), int(hi[node]), node))
            return
        if count[node] > 0:  # oversized leaf (can't happen with leaf<=2)
            clusters.append((int(lo[node]), int(hi[node]), node))
            return
        c = index[node]
        rec(c)
        rec(c + 1)

    sys.setrecursionlimit(100000)
    rec(root)
    return clusters


def main():
    from ray_tracer_tpu.scene import presets

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "sponza_proxy"
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 260_000
    n_rays = 20_000
    if scene_name == "sponza_proxy":
        sc = presets.sponza_proxy(n_tris).compile()
    else:
        sc = presets.mesh_scene(
            scene_name, material=presets.WHITE, scale=0.15,
            position=(0.0, 0.5, 0.0),
        ).compile()

    bmin = np.asarray(sc.bvh_min)
    bmax = np.asarray(sc.bvh_max)
    index = np.asarray(sc.bvh_index)
    count = np.asarray(sc.bvh_tri_count)
    root = int(np.asarray(sc.obj_bvh_root)[0])

    rng = np.random.default_rng(11)

    # bounce-shaped rays: origins on surfaces (sample triangle centroids),
    # cosine-ish random directions
    t0 = np.asarray(sc.tri_v0)
    te1 = np.asarray(sc.tri_e1)
    te2 = np.asarray(sc.tri_e2)
    pick = rng.integers(0, t0.shape[0], n_rays)
    o = t0[pick] + (te1[pick] + te2[pick]) / 3.0
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = o + d * 1e-4

    for t_c in (64, 128, 256):
        clusters = cluster_cut(index, count, None, root, t_c)
        cl_node = np.array([c[2] for c in clusters])
        cmin = bmin[cl_node]  # cluster AABB = subtree root's box
        cmax = bmax[cl_node]
        sizes = np.array([c[1] - c[0] for c in clusters])
        occ = sizes.sum() / (len(clusters) * t_c)

        # slab test: rays x clusters (vectorized, chunked over rays)
        counts = np.zeros(n_rays, np.int32)
        tent_sorted_resolve = np.zeros(n_rays, np.int32)
        step = 2000
        for a in range(0, n_rays, step):
            b = min(a + step, n_rays)
            ro = o[a:b, None, :]
            rd = d[a:b, None, :]
            inv = 1.0 / np.where(np.abs(rd) < 1e-20, 1e-20, rd)
            t1 = (cmin[None] - ro) * inv
            t2 = (cmax[None] - ro) * inv
            tmin = np.minimum(t1, t2).max(axis=2)
            tmaxv = np.maximum(t1, t2).min(axis=2)
            hit = (tmaxv >= tmin) & (tmaxv > 0)
            counts[a:b] = hit.sum(axis=1)
        q = np.percentile(counts, [50, 90, 95, 99])
        for K in (8, 16, 24):
            ovf = (counts > K).mean()
            print(f"T_C={t_c:4d}: C={len(clusters):6d} occ={occ:.2f} "
                  f"cand p50/p90/p95/p99={q[0]:.0f}/{q[1]:.0f}/{q[2]:.0f}/"
                  f"{q[3]:.0f} mean={counts.mean():.1f}  "
                  f"K={K}: ovf={ovf*100:.1f}%")
    print(f"(rays={n_rays}, scene={scene_name}:{n_tris})")


if __name__ == "__main__":
    main()
