#!/usr/bin/env python
"""Simulate treelet-bounded packet traversal on the bench workload.

Answers, from REAL per-ray walks of the wide BVH (vectorized numpy stack
walk, closest-hit pruning included), BEFORE committing to a kernel design:

  * per-ray interior-visit distribution (the per-ray lower bound),
  * treelet entries per ray for candidate treelet sizes S (sizes the
    per-lane emission-slot count K),
  * predicted per-packet node unions for the two-phase scheme (top walk +
    entry-sorted deep packets) vs the current single-phase binned packets,

where predicted packet cost ~ sum over packets of (union x lane-width
vector cost + per-visit scalar cost) — the measured cost model from
BENCH_NOTES r2/r3 profiling.

Usage: python tools/sim_treelet.py [n_rays] [scene]
"""
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def wide_children(wp):
    """codes (W,8) int (interior>=0 wide id, <0 leaf, huge=empty)."""
    W = wp.shape[0]
    codes_f = wp[:, 6:70:8]
    empty = ~np.isfinite(wp[:, 0:64:8])  # NaN min.x => empty slot
    codes = np.where(empty, 2**30, codes_f.astype(np.int64))
    return codes


def subtree_sizes(codes):
    W = codes.shape[0]
    size = np.ones(W, np.int64)
    # children always have higher wide id than parent (BFS discovery), so
    # process in reverse id order
    for w in range(W - 1, -1, -1):
        for c in codes[w]:
            if 0 <= c < 2**30:
                size[w] += size[c]
    return size


def pick_treelets(codes, size, S):
    """Treelet roots: size<=S whose parent subtree >S. Returns root id per
    node (-1 for top nodes)."""
    W = codes.shape[0]
    troot = np.full(W, -1, np.int64)
    stack = [0]
    while stack:
        w = stack.pop()
        for c in codes[w]:
            if 0 <= c < 2**30:
                if troot[w] >= 0:
                    troot[c] = troot[w]
                elif size[c] <= S:
                    troot[c] = c
                stack.append(int(c))
    if size[0] <= S:
        troot[0] = 0
    return troot


def gen_bounce_rays(scene, n, rng):
    """Random surface origins x cosine-ish directions (measure_union's
    recipe): realistic incoherent bounce populations."""
    tp = np.asarray(scene.tri_packed)
    nt = scene.meta["n_tris"]
    ti = rng.integers(0, nt, n)
    u = rng.uniform(0, 1, (n, 2))
    u = np.where((u.sum(1) > 1)[:, None], 1 - u, u)
    v0, e1, e2 = tp[ti, 0:3], tp[ti, 3:6], tp[ti, 6:9]
    o = v0 + e1 * u[:, 0:1] + e2 * u[:, 1:2]
    nrm = tp[ti, 9:12]
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = np.einsum("ij,ij->i", d, nrm) < 0
    d[flip] -= 2 * np.einsum("ij,ij->i", d[flip], nrm[flip])[:, None] * nrm[flip]
    o = o + nrm * 1e-4
    return o.astype(np.float32), d.astype(np.float32)


def gen_tile_bounce_rays(scene, wp, lr, n, rng):
    """PRODUCTION-shaped population: primary rays of one contiguous pixel
    block of the 1080p bench view, traced to their hits, then one cosine
    bounce from each hit — the rays the integrator's round 2 actually
    traverses for a tile."""
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator.wavefront import raygen
    import jax.numpy as jnp

    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    # the bench's 2^18-pixel tile = 1920 x 136 rows; sample n pixels of it.
    # RT_SIM_TILE=2: a 512x512 square block instead (candidate tile shape).
    if os.environ.get("RT_SIM_TILE") == "2":
        xy = rng.integers(0, 512, (n, 2))
        ids = ((xy[:, 1] + 250) * 1920 + xy[:, 0] + 700).astype(np.int32)
    elif os.environ.get("RT_SIM_TILE") == "3":
        # whole-frame population (the full-frame-wavefront candidate)
        ids = rng.integers(0, 1920 * 1080, n).astype(np.int32)
    else:
        ids = rng.integers(0, 1 << 18, n).astype(np.int32)
    rays = raygen(rot, pos, fov, aspect, near, jnp.asarray(ids), 1920, 1080)
    o0 = np.asarray(rays.origin, np.float32)
    d0 = np.asarray(rays.direction, np.float32)
    visited, best, hitn = per_ray_walk(wp, lr, o0, d0, want_normals=True)
    hit = best < 1e29
    hp = o0 + d0 * np.minimum(best, 100.0)[:, None]
    nrm = hitn
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    # face-forward against the incoming ray
    flipn = np.einsum("ij,ij->i", nrm, d0) > 0
    nrm[flipn] = -nrm[flipn]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = np.einsum("ij,ij->i", d, nrm) < 0
    d[flip] -= 2 * np.einsum("ij,ij->i", d[flip], nrm[flip])[:, None] * nrm[flip]
    o = hp + nrm * 1e-4
    keep = hit
    return o[keep].astype(np.float32), d[keep].astype(np.float32)


def per_ray_walk(wp, leaf_rows, o, d, max_steps=20000, want_normals=False):
    """Vectorized per-ray stack walk; returns per-ray visited interior node
    lists + best t (closest hit, full Moller-Trumbore on leaf rows)."""
    n = o.shape[0]
    W = wp.shape[0]
    inv = 1.0 / d
    boxes = wp[:, :64].reshape(W, 8, 8)
    codes = wide_children(wp)
    lr = leaf_rows.reshape(leaf_rows.shape[0], 8, 16)

    DEPTH = 96
    stack = np.zeros((n, DEPTH), np.int64)
    sp = np.ones(n, np.int64)  # stack[0]=0 (root)
    best = np.full(n, 1e30, np.float32)
    best_n = np.zeros((n, 3), np.float32)
    visited = [[] for _ in range(n)]
    alive_idx = np.arange(n)
    steps = 0
    while alive_idx.size and steps < max_steps:
        steps += 1
        a = alive_idx
        sp[a] -= 1
        code = stack[a, sp[a]]
        is_leaf = code < 0
        # leaves: test 8 records densely
        la = a[is_leaf]
        if la.size:
            slot = (-code[is_leaf] - 1) // 16
            rec = lr[slot]  # (m,8,16)
            ro = o[la][:, None, :] - rec[:, :, 0:3]
            q = np.cross(ro, d[la][:, None, :])
            nrm = rec[:, :, 9:12]
            d0 = -np.einsum("mj,mkj->mk", d[la], nrm)
            with np.errstate(all="ignore"):
                t = np.einsum("mkj,mkj->mk", ro, nrm) / d0
                u = np.einsum("mkj,mkj->mk", rec[:, :, 6:9], q) / d0
                v = -np.einsum("mkj,mkj->mk", rec[:, :, 3:6], q) / d0
            w = 1 - u - v
            ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
            ok &= np.isfinite(t)
            t = np.where(ok, t, 1e30)
            tm = t.min(axis=1)
            if want_normals:
                k = t.argmin(axis=1)
                better = tm < best[la]
                bi = la[better]
                best_n[bi] = nrm[np.arange(la.size)[better], k[better]]
            np.minimum.at(best, la, tm)
        ia = a[~is_leaf]
        if ia.size:
            ni = code[~is_leaf]
            for i, w_id in zip(ia, ni):
                visited[i].append(int(w_id))
            bx = boxes[ni]  # (m,8,8)
            t1 = (bx[:, :, 0:3] - o[ia][:, None, :]) * inv[ia][:, None, :]
            t2 = (bx[:, :, 3:6] - o[ia][:, None, :]) * inv[ia][:, None, :]
            with np.errstate(all="ignore"):
                tmin = np.minimum(t1, t2).max(axis=2)
                tmax = np.maximum(t1, t2).min(axis=2)
            hit = (tmax >= tmin) & (tmax > 0) & (tmin < best[ia][:, None])
            hit &= np.isfinite(tmin)
            cds = codes[ni]
            hit &= cds < 2**30
            # push far-to-near is irrelevant for union stats; push all hits
            for row in range(ia.size):
                i = ia[row]
                hs = np.nonzero(hit[row])[0]
                for c in hs:
                    stack[i, sp[i]] = cds[row, c]
                    sp[i] += 1
        alive_idx = alive_idx[sp[alive_idx] > 0]
    if want_normals:
        return visited, best, best_n
    return visited, best


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "sponza_proxy"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ray_tracer_tpu.scene import presets

    if scene_name == "sponza_proxy":
        sc = presets.sponza_proxy(260_000).compile()
    else:
        sc = presets.mesh_scene(
            scene_name, material=presets.WHITE, scale=0.15,
            position=(0.0, 0.5, 0.0),
        ).compile()
    wp = np.asarray(sc.wide_packed)
    lr = np.asarray(sc.leaf_rows)
    W = wp.shape[0]
    codes = wide_children(wp)
    size = subtree_sizes(codes)
    print(f"scene {scene_name}: {sc.meta['n_tris']} tris, {W} wide nodes")

    rng = np.random.default_rng(5)
    if os.environ.get("RT_SIM_TILE", "0") != "0":
        o, d = gen_tile_bounce_rays(sc, wp, lr, n_rays, rng)
        n_rays = o.shape[0]
        print(f"tile-local bounce rays: {n_rays}")
    else:
        o, d = gen_bounce_rays(sc, n_rays, rng)
    visited, best = per_ray_walk(wp, lr, o, d)
    nv = np.array([len(v) for v in visited])
    print(f"per-ray interior visits: mean {nv.mean():.0f} p50 "
          f"{np.percentile(nv,50):.0f} p90 {np.percentile(nv,90):.0f} "
          f"p99 {np.percentile(nv,99):.0f}")

    # current scheme: packets of P rays in bin-key order; union per packet
    from ray_tracer_tpu.integrator.wavefront import _bin_key
    import jax.numpy as jnp
    key = np.asarray(_bin_key(sc.device_put(), jnp.asarray(o), jnp.asarray(d),
                              jnp.ones(n_rays, bool)))
    order = np.argsort(key, kind="stable")
    P = 2048
    for label, ordv in (("binned", order), ("raw", np.arange(n_rays))):
        unions = []
        for s in range(0, n_rays, P):
            ids = ordv[s:s + P]
            u = set()
            for i in ids:
                u.update(visited[i])
            unions.append(len(u))
        print(f"current {label}: union/packet mean {np.mean(unions):.0f} "
              f"(x{np.mean(unions)/max(nv.mean(),1):.1f} per-ray)")

    # population-size effect: binned union when packets are drawn from
    # only the first M rays (M = tile-sized) vs the full population
    for M in (4096, 8192, 16384, 32768, n_rays):
        if M > n_rays:
            continue
        sub = np.arange(M)
        ksub = key[:M]
        osub = sub[np.argsort(ksub, kind="stable")]
        us = []
        for s in range(0, M, P):
            ids2 = osub[s:s + P]
            u = set()
            for i in ids2:
                u.update(visited[i])
            us.append(len(u))
        print(f"population {M:6d}: binned union/packet mean "
              f"{np.mean(us):.0f}")

    # ---- alternative packet-formation keys (no kernel change needed) ----
    # (a) first-deep-entry: descend-nearest-child-only walk to the first
    #     node with subtree size <= S; cluster rays by that node id.
    # (b) greedy visit-set clustering: upper bound on what ANY key can do.
    def first_entry(o1, d1, S, size):
        inv = 1.0 / d1
        w = 0
        while size[w] > S:
            bx = wp[w, :64].reshape(8, 8)
            t1 = (bx[:, 0:3] - o1) * inv
            t2 = (bx[:, 3:6] - o1) * inv
            with np.errstate(all="ignore"):
                tmin = np.minimum(t1, t2).max(axis=1)
                tmax = np.maximum(t1, t2).min(axis=1)
            hit = (tmax >= tmin) & (tmax > 0) & np.isfinite(tmin)
            cds = codes[w]
            hit &= cds < 2**30
            hit &= cds >= 0  # interior children only for the descent
            if not hit.any():
                return int(w)
            nxt = cds[np.where(hit, np.where(hit, tmin, 1e30), 1e30).argmin()]
            if nxt == w:
                return int(w)
            w = int(nxt)
        return int(w)

    for S_fe in (64, 256):
        fe = np.array([first_entry(o[i], d[i], S_fe, size)
                       for i in range(n_rays)])
        order_fe = np.lexsort((key, fe))
        unions = []
        for s in range(0, n_rays, P):
            ids = order_fe[s:s + P]
            u = set()
            for i in ids:
                u.update(visited[i])
            unions.append(len(u))
        print(f"first-entry key (S={S_fe}): union/packet mean "
              f"{np.mean(unions):.0f} (total {sum(unions)})")

    # greedy clustering upper bound: repeatedly seed a packet with the
    # unassigned ray of largest visit set, add the rays with max overlap
    # (approximated by shared first-32 nodes via hashing buckets: use
    # exact only for modest n)
    if n_rays <= 20000:
        vsets = [frozenset(v) for v in visited]
        unassigned = set(range(n_rays))
        unions = []
        while unassigned:
            seed = next(iter(unassigned))
            u = set(vsets[seed])
            members = [seed]
            unassigned.remove(seed)
            # score all unassigned by |v - u| growth, take cheapest P-1
            cand = sorted(unassigned,
                          key=lambda i: len(vsets[i] - u))[: P - 1]
            for i in cand:
                u.update(vsets[i])
                members.append(i)
                unassigned.remove(i)
            unions.append(len(u))
        print(f"greedy-cluster bound: union/packet mean {np.mean(unions):.0f}"
              f" (total {sum(unions)})")

    for S in (32, 64, 128, 256):
        troot = pick_treelets(codes, size, S)
        n_t = int((troot == np.arange(W)).sum())
        top_mask = troot < 0
        # per-ray: top visits + entry list (visits to treelet roots)
        entries = [[] for _ in range(n_rays)]
        topv = [[] for _ in range(n_rays)]
        deepv = [defaultdict(list) for _ in range(n_rays)]
        for i, vs in enumerate(visited):
            for w_id in vs:
                t = troot[w_id]
                if t < 0:
                    topv[i].append(w_id)
                else:
                    if w_id == t:
                        entries[i].append(t)
                    deepv[i][t].append(w_id)
        ne = np.array([len(e) for e in entries])
        print(f"S={S}: {n_t} treelets, entries/ray mean {ne.mean():.1f} "
              f"p90 {np.percentile(ne,90):.0f} p99 {np.percentile(ne,99):.0f}"
              f" max {ne.max()}")
        # phase 1: packets in bin order walk the top only
        top_unions = []
        for s in range(0, n_rays, P):
            ids = order[s:s + P]
            u = set()
            for i in ids:
                u.update(topv[i])
            top_unions.append(len(u))
        # phase 2: (ray, entry) pairs sorted by entry, packets of P
        pairs = []
        for i, es in enumerate(entries):
            for t in es:
                pairs.append((t, i))
        pairs.sort()
        deep_unions = []
        for s in range(0, len(pairs), P):
            chunk = pairs[s:s + P]
            u = set()
            for t, i in chunk:
                u.update(deepv[i][t])
            deep_unions.append(len(u))
        tot_top = sum(top_unions)
        tot_deep = sum(deep_unions)
        cur = None
        # current total = binned unions
        unions = []
        for s in range(0, n_rays, P):
            ids = order[s:s + P]
            u = set()
            for i in ids:
                u.update(visited[i])
            unions.append(len(u))
        cur = sum(unions)
        print(f"   visit totals: current {cur}, treelet top {tot_top} + "
              f"deep {tot_deep} = {tot_top+tot_deep} "
              f"({cur/(tot_top+tot_deep):.2f}x fewer packet-visits; "
              f"deep packets {len(deep_unions)} vs {len(unions)})")


if __name__ == "__main__":
    main()
