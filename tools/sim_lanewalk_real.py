#!/usr/bin/env python
"""Lanewalk paradigm sim: per-lane threaded walks on the REAL tree.

Round-5 decision input.  tools/probe_lane_gather*.py measured the Mosaic
dynamic-gather primitive (take_along_axis legalizes along BOTH vreg dims)
at ~0.05-0.10 ns/lane-step marginal for a full stackless walk step on a
128-node in-register page — 10-20x below the group kernel's effective
per-lane traversal cost.  Whether a per-LANE traversal paradigm (each
lane advances through its OWN octant-threaded hit/miss sequence —
ops/traverse._walk semantics — with node/tri records fetched by
in-register dynamic gather from treelet pages) beats the group route
depends on three quantities this sim measures on the real narrow tree
with production-shaped rays:

  1. steps/ray (box steps + per-triangle leaf steps) — the BVH2 threaded
     walk does strictly more node visits than the BVH8 packet/group
     family per ray; how many?
  2. page transitions/ray for candidate page sizes P (a walk crossing
     pages must park and re-sort; each transition costs a wavefront
     round's sort + state gather ~5-15 ns/ray) — requires DFS-contiguous
     node ids so a page is a subtree slab.
  3. block-max inflation after bin-key sorting (a 1024-lane vector block
     retires when its SLOWEST lane finishes; per-round step caps +
     compaction bound this, but the raw spread prices the bound).

Per the pre-registered rule (BENCH_NOTES r4): step counts are the one
quantity CPU sims have predicted correctly across rounds 2-4 — this sim
is the go/no-go gate before any kernel build.

Usage: python tools/sim_lanewalk_real.py [n_tris] [log2_rays]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BIG = 99999999.0
SENTINEL = 2**31 - 1  # ops/traverse.SENTINEL (walk termination link)


def dfs_order(index, cnt):
    """Preorder DFS relabeling: old id -> new id, so every subtree is one
    contiguous id range (page = id // P then slices subtrees)."""
    B = index.shape[0]
    new_of_old = np.full(B, -1, np.int64)
    order = []
    stack = [0]
    while stack:
        nd = stack.pop()
        new_of_old[nd] = len(order)
        order.append(nd)
        if cnt[nd] == 0:  # interior: children at index, index+1
            stack.append(index[nd] + 1)
            stack.append(index[nd])
    assert len(order) == B, (len(order), B)
    return np.asarray(order), new_of_old


def walk(o, d, clip, bmin, bmax, index, cnt, hit_l, miss_l, tri, new_of_old,
         page_sizes, anyhit=False, max_leaf=8):
    """Vectorized per-lane threaded walk; returns per-ray
    (box_steps, tri_steps, transitions[P], best)."""
    n = o.shape[0]
    di = np.where(d == 0.0, 1e-20, d).astype(np.float32)
    inv = 1.0 / di
    octant = ((inv[:, 0] < 0) + 2 * (inv[:, 1] < 0) + 4 * (inv[:, 2] < 0)
              ).astype(np.int64)
    B = index.shape[0]
    cur = np.zeros(n, np.int64)  # root
    alive = np.ones(n, bool)
    best = clip.astype(np.float32).copy()
    box_steps = np.zeros(n, np.int64)
    tri_steps = np.zeros(n, np.int64)
    pages = {P: new_of_old[0] // P for P in page_sizes}  # scalar root page
    cur_page = {P: np.full(n, new_of_old[0] // P, np.int64)
                for P in page_sizes}
    trans = {P: np.zeros(n, np.int64) for P in page_sizes}
    it = 0
    while alive.any():
        it += 1
        a = alive
        nd = cur[a]
        # page accounting on the DFS-relabelled id
        nid = new_of_old[nd]
        for P in page_sizes:
            pg = nid // P
            trans[P][a] += (pg != cur_page[P][a])
            cur_page[P][a] = pg
        t1 = (bmin[nd] - o[a]) * inv[a]
        t2 = (bmax[nd] - o[a]) * inv[a]
        tmin = np.minimum(t1, t2).max(axis=1)
        tmax = np.maximum(t1, t2).min(axis=1)
        bhit = (tmax >= tmin) & (tmax > 0) & (tmin < best[a])
        leaf = cnt[nd] > 0
        box_steps[a] += 1

        # leaf triangle tests: one lane-step per triangle in the kernel
        lv = bhit & leaf
        if lv.any():
            ai = np.where(a)[0][lv]
            nl = nd[lv]
            for k in range(max_leaf):
                valid = k < cnt[nl]
                if not valid.any():
                    break
                aik = ai[valid]
                ti = index[nl[valid]] + k
                rc = tri[ti]
                r = o[aik] - rc[:, 0:3]
                q = np.cross(r, d[aik])
                d0 = -np.einsum("nk,nk->n", d[aik], rc[:, 9:12])
                with np.errstate(divide="ignore", invalid="ignore"):
                    dinv = 1.0 / d0
                    t = np.einsum("nk,nk->n", r, rc[:, 9:12]) * dinv
                    u = np.einsum("nk,nk->n", rc[:, 6:9], q) * dinv
                    v = -np.einsum("nk,nk->n", rc[:, 3:6], q) * dinv
                w = 1.0 - u - v
                front = d0 >= 1e-8
                ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
                ok &= ~((~front) & (rc[:, 12] > 0.5))
                t = np.where(ok & np.isfinite(t), t, BIG)
                tri_steps[aik] += 1
                if anyhit:
                    # first accepted hit inside the clip occludes
                    occ = t < best[aik]
                    best[aik[occ]] = -BIG
                else:
                    best[aik] = np.minimum(best[aik], t)

        lb = octant[a] * B + nd
        nxt = np.where(bhit & ~leaf, hit_l[lb], miss_l[lb])
        if anyhit:
            nxt = np.where(best[a] == -BIG, SENTINEL, nxt)  # early exit
        cur[a] = nxt
        alive[a] = nxt != SENTINEL
    return box_steps, tri_steps, trans, best


def block_stats(steps, key, block=1024):
    """Mean block-max step count after bin-key sorting."""
    order = np.argsort(key, kind="stable")
    s = steps[order]
    nb = len(s) // block
    s = s[: nb * block].reshape(nb, block)
    return s.max(axis=1).mean(), s.mean()


def octant_preorder(index, cnt, hit_l, B, octant):
    """Preorder relabel induced by octant ``octant``'s threading: DFS
    where the first child of an interior node is its hit-link target.
    In this labeling BOTH links are strictly increasing (hit -> id+1,
    miss -> preorder successor of the subtree), so a rope walk is
    monotone and a block can gang-sweep pages in increasing id order."""
    first = hit_l[octant * B : (octant + 1) * B]
    new_of_old = np.full(B, -1, np.int64)
    order = []
    stack = [0]
    while stack:
        nd = stack.pop()
        new_of_old[nd] = len(order)
        order.append(nd)
        if cnt[nd] == 0:
            c0, c1 = index[nd], index[nd] + 1
            f = first[nd]
            s = c1 if f == c0 else c0
            stack.append(s)
            stack.append(f)
    assert len(order) == B
    return np.asarray(order), new_of_old


def gang_walk(o, d, clip, bmin, bmax, index, cnt, hit_l, miss_l, tri,
              octant_tables, B, key, page_sizes, block=1024, anyhit=False,
              max_leaf=8):
    """Gang-scheduled page-sweep model.  Lanes are sorted by the bin key
    and cut into blocks; every lane in a block walks the block's
    MAJORITY octant's rope (any octant's rope is a correct complete
    traversal — threading is only a front-to-back heuristic, so minority
    lanes pay extra steps, not wrong answers).  The walk is monotone in
    that octant's preorder id, so the whole block sweeps pages 0..B/P in
    order with a shared cursor; vector time = sum over touched pages of
    the max per-lane steps spent in that page (a lane whose current node
    is beyond the resident page simply waits).  A leaf visit counts as
    ONE step (its <=2 triangles ride the same gathered row).

    Returns per page size: (vector_steps/block, pages_touched/block,
    scalar steps/ray mean, majority-octant step penalty)."""
    n = o.shape[0]
    order = np.argsort(key, kind="stable")
    nb = n // block
    di = np.where(d == 0.0, 1e-20, d).astype(np.float32)
    inv_all = 1.0 / di
    oct_all = ((inv_all[:, 0] < 0) + 2 * (inv_all[:, 1] < 0)
               + 4 * (inv_all[:, 2] < 0)).astype(np.int64)
    res = {P: [0.0, 0.0] for P in page_sizes}
    per_block = {P: [] for P in page_sizes}
    tot_steps = 0.0
    minority = 0.0
    for b in range(nb):
        li = order[b * block : (b + 1) * block]
        ob, db, invb = o[li], d[li], inv_all[li]
        clipb = clip[li]
        octs = oct_all[li]
        o_maj = np.bincount(octs, minlength=8).argmax()
        minority += float((octs != o_maj).mean())
        _, new_of_old = octant_tables[o_maj]
        hl = hit_l[o_maj * B : (o_maj + 1) * B]
        ml = miss_l[o_maj * B : (o_maj + 1) * B]
        fmax = max(page_sizes) // min(page_sizes)
        n_pages_max = (B + min(page_sizes) - 1) // min(page_sizes)
        n_pages_max = ((n_pages_max + fmax - 1) // fmax) * fmax
        # steps spent per (lane, page) at the finest page size; coarser
        # sizes aggregate by summing fine pages (exact because pages
        # nest when sizes divide each other)
        Pf = min(page_sizes)
        spp = np.zeros((block, n_pages_max), np.int32)
        cur = np.zeros(block, np.int64)
        alive = np.ones(block, bool)
        best = clipb.astype(np.float32).copy()
        while alive.any():
            a = alive
            nd = cur[a]
            nid = new_of_old[nd]
            t1 = (bmin[nd] - ob[a]) * invb[a]
            t2 = (bmax[nd] - ob[a]) * invb[a]
            tmin = np.minimum(t1, t2).max(axis=1)
            tmax = np.maximum(t1, t2).min(axis=1)
            bhit = (tmax >= tmin) & (tmax > 0) & (tmin < best[a])
            leaf = cnt[nd] > 0
            ai = np.where(a)[0]
            spp[ai, nid // Pf] += 1
            lv = bhit & leaf
            if lv.any():
                aik0 = ai[lv]
                nl = nd[lv]
                for k in range(max_leaf):
                    valid = k < cnt[nl]
                    if not valid.any():
                        break
                    aik = aik0[valid]
                    ti = index[nl[valid]] + k
                    rc = tri[ti]
                    r = ob[aik] - rc[:, 0:3]
                    q = np.cross(r, db[aik])
                    d0 = -np.einsum("nk,nk->n", db[aik], rc[:, 9:12])
                    with np.errstate(divide="ignore", invalid="ignore"):
                        dinv = 1.0 / d0
                        t = np.einsum("nk,nk->n", r, rc[:, 9:12]) * dinv
                        u = np.einsum("nk,nk->n", rc[:, 6:9], q) * dinv
                        v = -np.einsum("nk,nk->n", rc[:, 3:6], q) * dinv
                    w = 1.0 - u - v
                    front = d0 >= 1e-8
                    ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
                    ok &= ~((~front) & (rc[:, 12] > 0.5))
                    t = np.where(ok & np.isfinite(t), t, BIG)
                    if anyhit:
                        occ = t < best[aik]
                        best[aik[occ]] = -BIG
                    else:
                        best[aik] = np.minimum(best[aik], t)
            nxt = np.where(bhit & ~leaf, hl[nd], ml[nd])
            if anyhit:
                nxt = np.where(best[a] == -BIG, SENTINEL, nxt)
            cur[a] = nxt
            alive[a] = nxt != SENTINEL
        tot_steps += float(spp.sum())
        for P in page_sizes:
            f = P // Pf  # fine pages per coarse page
            npg = (n_pages_max + f - 1) // f
            sc = spp[:, : npg * f].reshape(block, npg, f).sum(axis=2)
            pmax = sc.max(axis=0)
            res[P][0] += float(pmax.sum())
            res[P][1] += float((pmax > 0).sum())
            per_block[P].append(float(pmax.sum()))
    return {P: (res[P][0] / nb, res[P][1] / nb) for P in page_sizes}, \
        tot_steps / (nb * block), minority / nb, per_block


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig, Routing
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.sampling import lights

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 260_000
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << lg
    sc = presets.sponza_proxy(n_tris).compile().device_put()

    bmin = np.asarray(sc.bvh_min)
    bmax = np.asarray(sc.bvh_max)
    index = np.asarray(sc.bvh_index).astype(np.int64)
    cnt = np.asarray(sc.bvh_tri_count).astype(np.int64)
    links = np.asarray(sc.links_packed).astype(np.int64)  # (8B,2)
    hit_l, miss_l = links[:, 0], links[:, 1]
    tri = np.asarray(sc.tri_packed)
    B = index.shape[0]
    order_dfs, new_of_old = dfs_order(index, cnt)
    dfs_frac = np.mean(new_of_old[index[cnt == 0]]
                       == new_of_old[np.where(cnt == 0)[0]] + 1)
    print(f"narrow tree: {B} nodes, {tri.shape[0]} tris, "
          f"max_leaf={sc.max_leaf_tris}; left-child-preorder frac "
          f"(raw ids): {np.mean(index[cnt == 0] == np.where(cnt == 0)[0] + 1):.2f}")

    # ---- production-shaped rays (sim_lockstep harness)
    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(sc)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(n, dtype=jnp.int32) % (1920 * 1080)
    prim = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)
    hit = traverse.traverse(
        sc, prim.origin, prim.direction, jnp.ones(n, bool),
        routing=Routing(packet="off"), need_uv=False,
    )
    dst = np.asarray(hit.dst)
    hitm = np.asarray(hit.did_hit)
    rng = np.random.default_rng(3)
    hp = np.asarray(prim.origin) + np.asarray(prim.direction) * np.minimum(
        dst, 100.0)[:, None]
    srow = np.asarray(sc.shade_tri)[np.maximum(np.asarray(hit.prim), 0)]
    nrm = srow[:, 41:44]
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    din = np.asarray(prim.direction)
    flip = np.einsum("ij,ij->i", nrm, din) > 0
    nrm[flip] = -nrm[flip]
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    f2m = np.einsum("ij,ij->i", d2, nrm) < 0
    d2[f2m] -= 2 * np.einsum(
        "ij,ij->i", d2[f2m], nrm[f2m])[:, None] * nrm[f2m]
    o2 = np.where(hitm[:, None], hp + nrm * 1e-4, np.asarray(prim.origin))
    d2 = np.where(hitm[:, None], d2, din).astype(np.float32)
    o2 = o2.astype(np.float32)
    key2 = np.asarray(wavefront._bin_key(
        sc, jnp.asarray(o2), jnp.asarray(d2), jnp.ones(n, bool)))

    # shadow rays toward the light (anyhit population)
    u = rng.random((n, 3)).astype(np.float32)
    l_dir, li, _, l_dist = lights.sample_rect_light(
        sc, jnp.asarray(o2), jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
        jnp.asarray(u[:, 2]),
    )
    l_dir = np.asarray(l_dir).astype(np.float32)
    l_dist = np.asarray(l_dist).astype(np.float32)
    key_sh = np.asarray(wavefront._bin_key(
        sc, jnp.asarray(o2), jnp.asarray(l_dir), jnp.asarray(hitm)))

    page_sizes = (256, 1024, 4096)
    pops = [
        ("primary closest", np.asarray(prim.origin).astype(np.float32),
         din.astype(np.float32), np.full(n, BIG, np.float32), False,
         np.asarray(wavefront._bin_key(sc, prim.origin, prim.direction,
                                       jnp.ones(n, bool)))),
        ("bounce closest", o2, d2, np.full(n, BIG, np.float32), False, key2),
        ("shadow anyhit", o2, l_dir, l_dist * (1 - 1e-3), True, key_sh),
    ]
    for name, o, d, clip, anyhit, key in pops:
        t0 = time.time()
        bs, ts, trans, best = walk(
            o, d, clip, bmin, bmax, index, cnt, hit_l, miss_l, tri,
            new_of_old, page_sizes, anyhit=anyhit,
            max_leaf=int(sc.max_leaf_tris),
        )
        steps = bs + ts
        bmax_mean, bmean = block_stats(steps, key)
        line = (
            f"{name:16s}: steps mean {steps.mean():7.1f} (box {bs.mean():6.1f}"
            f" tri {ts.mean():6.1f}) p95 {np.percentile(steps, 95):7.0f}"
            f" | blk1024 max/mean {bmax_mean:7.1f}/{bmean:6.1f}"
            f" (infl {bmax_mean / max(bmean, 1e-9):4.2f})"
        )
        for P in page_sizes:
            line += f" | P{P}: {trans[P].mean():5.2f} trans/ray"
        print(line, f"  [{time.time()-t0:.0f}s]")

    # ---- gang-schedule model: monotone page sweep per block on the
    # majority octant's rope (the decisive vector-cost quantity)
    if os.environ.get("LW_GANG", "1") != "0":
        print("\ngang-schedule (sum over pages of per-page lane max):")
        octant_tables = {
            oc: octant_preorder(index, cnt, hit_l, B, oc) for oc in range(8)
        }
        gang_pages = (128, 1024)
        blocks = tuple(int(x) for x in
                       os.environ.get("LW_BLOCKS", "1024,4096").split(","))
        # bin-key sweep for the row-gang metric: LW_KEYS="mb:db,mb:db,..."
        # re-keys the bounce population (the weak one) per setting
        if os.environ.get("LW_KEYS"):
            print("\nbin-key sweep (bounce closest, row-gang metric):")
            for spec in os.environ["LW_KEYS"].split(","):
                mb, db = (int(x) for x in spec.split(":"))
                k2 = np.asarray(wavefront._bin_key(
                    sc, jnp.asarray(o2), jnp.asarray(d2),
                    jnp.ones(n, bool), mb, db,
                ))
                for blk in (128,):
                    per_p, smean, mino, per_block = gang_walk(
                        o2, d2, np.full(n, BIG, np.float32), bmin, bmax,
                        index, cnt, hit_l, miss_l, tri, octant_tables, B,
                        k2, gang_pages, block=blk, anyhit=False,
                        max_leaf=int(sc.max_leaf_tris),
                    )
                    pb = np.asarray(per_block[128])
                    ng8 = len(pb) // 8
                    g8 = pb[: ng8 * 8].reshape(ng8, 8)
                    print(f"  mb={mb} db={db}: row-gang 8x128 P128 "
                          f"{g8.max(axis=1).mean()/(8*blk):7.4f} st/ray "
                          f"(scalar {smean:5.1f}, minority {mino*100:4.1f}%)")
            return
        for name, o, d, clip, anyhit, key in pops:
            for blk in blocks:
                t0 = time.time()
                per_p, smean, mino, per_block = gang_walk(
                    o, d, clip, bmin, bmax, index, cnt, hit_l, miss_l, tri,
                    octant_tables, B, key, gang_pages, block=blk,
                    anyhit=anyhit, max_leaf=int(sc.max_leaf_tris),
                )
                line = (f"{name:16s} blk={blk:4d}: scalar {smean:6.1f} st/ray"
                        f" minority {mino*100:4.1f}%")
                for P in gang_pages:
                    vs, pg = per_p[P]
                    line += (f" | P{P}: vec {vs:7.1f} st/blk"
                             f" ({vs/blk:6.3f}/ray, util"
                             f" {smean/max(vs/blk,1e-9)/blk*100:4.1f}%)"
                             f" pages {pg:6.1f}")
                print(line, f"  [{time.time()-t0:.0f}s]")
                # per-ROW paging model: 8 consecutive gangs of ``blk``
                # run in lockstep sublane rows with independent page
                # cursors; vector steps = max over the 8 rows' sums.
                if blk <= 512:
                    for P in gang_pages:
                        pb = np.asarray(per_block[P])
                        ng8 = len(pb) // 8
                        g8 = pb[: ng8 * 8].reshape(ng8, 8)
                        print(
                            f"  row-gang 8x{blk} P{P}: mean-of-max "
                            f"{g8.max(axis=1).mean():7.1f} st "
                            f"({g8.max(axis=1).mean()/(8*blk):6.4f}/ray) "
                            f"row mean {pb.mean():7.1f}, imbalance "
                            f"{g8.max(axis=1).mean()/max(pb.mean(),1e-9):4.2f}"
                        )


if __name__ == "__main__":
    main()
