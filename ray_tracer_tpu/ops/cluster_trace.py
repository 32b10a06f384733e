"""Cluster-pipeline traversal orchestration (round 3).

Closest-hit (and any-hit) triangle traversal in three stages, replacing
the packet walk's per-leaf VPU triangle loop with MXU-dense cluster
tests (see accel/cluster.py for the structure and the bilinear
Moller-Trumbore factorization; kernels/cluster.py for the test kernel):

1. ENUMERATE — a packet walk over the tiny cluster-BVH8 (a few hundred
   nodes instead of the fine tree's tens of thousands) emits, per ray,
   the clusters whose AABB the ray enters within its clip distance
   (kernels/packet.py ``emit_leaves``).  Mean candidates/ray on the
   hardened proxy's bounce rays: ~4.4 at t_c=128 (tools/sim_cluster.py).
2. GROUP — (ray, cluster) pairs sort by cluster id and run-pad to
   128-multiples, so every 128-pair chunk shares one cluster (the same
   scheme the two-phase treelet path uses for its deep entries,
   ops/traverse.py).  Dead tails get a negative chunk id -> skipped.
3. TEST + RESOLVE — the chunk kernel contracts each chunk against its
   cluster's coefficient page (one matmul per 128 rays x t_c tris) and
   per-ray results fold back with scatter-min.

Lanes whose candidate count overflows the emit slots (~2% at K=16) are
excluded from the pair phase and traced by the classic single-phase
packet walk instead — correctness never depends on K.

Triangle ids here are GLOBAL (cluster ranges are contiguous triangle
ranges), so ``prim_space`` reports 'tri' and shading uses
``scene.shade_tri`` directly — no leaf-slot indirection.

Reference behavior replicated: the closest-hit/any-hit contracts of
shaders/raytrace.comp:222-259 (triangle test) and :443 (shadow query),
with the documented any-hit deviation (config.py nee_anyhit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Routing
from ..kernels import cluster as kcluster
from ..kernels import packet
from ..scene.types import CompiledScene

BIG = 99999999.0
SENT = np.int32(2**30)
IMAX = np.int32(2**31 - 1)


def use_cluster(scene: CompiledScene, mode: str, routing: Routing) -> bool:
    """Cluster routing applies on flattened triangle scenes whose enum
    tree fits the SMEM meta mirror, when the packet path is active."""
    if mode == "off" or routing.cluster == "off":
        return False
    if not scene.meta.get("n_clusters", 0):
        return False
    n_wide = scene.cwide_packed.shape[0]
    if n_wide * 12 * 4 > 600_000:  # packet.py top-mode SMEM meta bound
        return False
    if routing.cluster == "on":
        return True
    # "auto" = off, now MEASURED (r4 campaign, BENCH_NOTES): end-to-end
    # 0.27 vs 1.81 Mrays/s for the packet walk on identical binned
    # bounce-ray populations — the pipeline lost 6.7x on hardware.
    return False


def _uvfront_global(tri_packed, origin, direction, prim):
    """Barycentrics + facing for the winning GLOBAL triangle id, same
    re-derivation as packet._reconstruct_uvfront but over the (T,16)
    global record table."""
    rec = tri_packed[jnp.maximum(prim, 0)]
    d = jnp.where(direction == 0.0, 1e-20, direction)
    r = origin - rec[:, 0:3]
    q = jnp.cross(r, d)
    d0 = -jnp.sum(d * rec[:, 9:12], axis=1)
    dinv = 1.0 / d0
    u = jnp.sum(rec[:, 6:9] * q, axis=1) * dinv
    v = -jnp.sum(rec[:, 3:6] * q, axis=1) * dinv
    miss = prim < 0
    return (
        jnp.where(miss, 0.0, u),
        jnp.where(miss, 0.0, v),
        jnp.where(miss, False, d0 >= 1e-8),
    )


SLICE = 1 << 17  # rays per internal slice: bounds the (n*K)-pair arrays
K_S = 8  # level-1 super emit slots (mean ~1.9 hit/ray, 0% ovf measured)


def _compact_rows(slot_mat, row_ray, row_ok, cap):
    """Compact a (R,K) slot matrix (-1 = empty) into flat pair arrays.

    Returns (flat_val (cap,) with SENT padding, flat_ray (cap,),
    row_ovf (R,) rows whose slots would spill past ``cap``).  Row order
    is preserved; invalid entries scatter one-past-end and drop.
    """
    R, K = slot_mat.shape
    ok = (slot_mat >= 0) & row_ok[:, None]
    cnt = ok.sum(axis=1).astype(jnp.int32)
    base = jnp.cumsum(cnt) - cnt
    row_ovf = base + cnt > cap
    ok = ok & ~row_ovf[:, None]
    k_rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
    dest = jnp.where(ok, base[:, None] + k_rank, cap)
    flat_val = jnp.full((cap,), SENT, jnp.int32).at[
        dest.reshape(-1)
    ].set(slot_mat.reshape(-1), mode="drop")
    flat_ray = jnp.zeros((cap,), jnp.int32).at[dest.reshape(-1)].set(
        jnp.broadcast_to(row_ray[:, None], (R, K)).reshape(-1),
        mode="drop",
    )
    return flat_val, flat_ray, row_ovf


def _group_pairs(pair_key, pair_ray, max_runs):
    """Sort pairs by key (one fused key/value sort) and run-pad each
    key's run to a 128 multiple so every 128-pair chunk shares one key.

    Returns (key_p (m2,), ray_p (m2,), live_p (m2,), chunk_key (g2,)
    with -1 for dead chunks, g2).
    """
    m = pair_key.shape[0]
    pe, ray_sorted = jax.lax.sort_key_val(pair_key, pair_ray)
    prev = jnp.concatenate([jnp.full((1,), -9, jnp.int32), pe[:-1]])
    newrun = pe != prev
    run_id = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    run_start = jnp.where(newrun, jnp.arange(m, dtype=jnp.int32), 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    pos_in_run = jnp.arange(m, dtype=jnp.int32) - run_start
    rid = jnp.minimum(run_id, max_runs - 1)
    lens = jnp.zeros((max_runs,), jnp.int32).at[rid].add(1)
    padded = -(-lens // 128) * 128
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    dest = offs[rid] + pos_in_run
    m2 = -(-(m + max_runs * 128) // 128) * 128
    g2 = m2 // 128
    key_p = jnp.full((m2,), SENT, jnp.int32).at[dest].set(pe)
    ray_p = jnp.zeros((m2,), jnp.int32).at[dest].set(ray_sorted)
    live_p = key_p < SENT
    chunk_key = key_p.reshape(g2, 128)[:, 0]
    chunk_key = jnp.where(chunk_key >= SENT, -1, chunk_key)
    return key_p, ray_p, live_p, chunk_key, g2


def _enum_boxes(scene, feats, routing, interp, lane_active):
    """Two-level box-matmul candidate enumeration (no tree walk).

    Box containment makes {cluster AABBs entered within tmax} EXACTLY
    the candidate set — ancestors add no information — so enumeration is
    brute force on the MXU: level 1 tests every ray against the <=128
    super boxes in one contraction per 128-ray chunk; (ray, super) pairs
    group by super and level 2 tests each pair against its super's
    <=128 cluster boxes.  Cluster ids are contiguous per super
    (accel/cluster.py build_super_tables), so page column c of super s
    is cluster super_cstart[s] + c.

    Returns (pair_cid, pair_ray, ovf_b) — the same contract the
    packet-emit enumeration produces after compaction.
    """
    n = feats.shape[0]
    S = int(scene.meta["n_supers"])
    K = routing.cluster_k
    ray_ids = jnp.arange(n, dtype=jnp.int32)

    # level 1: all rays vs the single super page
    g1 = -(-n // 128)
    padn = g1 * 128 - n
    f1 = jnp.pad(feats, ((0, padn), (0, 0)))  # pad rows: tmax 0 -> no hit
    f1 = f1.reshape(g1, 128, 16).transpose(0, 2, 1)
    w1 = kcluster.box_hits(
        scene.super_page[None], f1, jnp.zeros((g1,), jnp.int32),
        interpret=interp,
    )
    words1 = w1.transpose(0, 2, 1).reshape(-1, 4)[:n]
    sslots, sovf = kcluster.extract_slots(words1, K_S)  # (n,K_S) super ids
    ovf_b = sovf & lane_active

    # (ray, super) pairs: mean ~1.9/ray on the hardened proxy
    cap1 = -(-(n * 3) // 128) * 128
    psid, pray, ovf1 = _compact_rows(
        sslots, ray_ids, lane_active & ~ovf_b, cap1
    )
    ovf_b = ovf_b | ovf1

    # level 2: pairs grouped by super, each chunk vs its cluster page
    sp, rayp, livep, chunk_sid, g2 = _group_pairs(psid, pray, S + 2)
    rays_safe = jnp.where(livep, rayp, 0)
    f2 = jnp.where(livep[:, None], feats[rays_safe], 0.0)
    f2 = f2.reshape(g2, 128, 16).transpose(0, 2, 1)
    w2 = kcluster.box_hits(
        scene.super_cpage, f2, chunk_sid, interpret=interp
    )
    words2 = w2.transpose(0, 2, 1).reshape(-1, 4)
    cols, povf = kcluster.extract_slots(words2, K)  # (m2,K) page columns
    cstart = scene.super_cstart[jnp.clip(sp, 0, max(S - 1, 0))]
    cid_mat = jnp.where(cols >= 0, cstart[:, None] + cols, -1)
    ovf_flag = jnp.zeros((n,), jnp.int32).at[rays_safe].max(
        (povf & livep).astype(jnp.int32)
    )
    ovf_b = ovf_b | (ovf_flag > 0)

    # final (ray, cluster) pair list, pair-major compaction
    cap2 = -(-(n * max(K // 2, 2)) // 128) * 128
    pair_ok = livep & ~ovf_b[rays_safe]
    pair_cid, pair_ray, ovf3 = _compact_rows(cid_mat, rayp, pair_ok, cap2)
    ovf3_flag = jnp.zeros((n,), jnp.int32).at[rays_safe].max(
        (ovf3 & livep).astype(jnp.int32)
    )
    return pair_cid, pair_ray, ovf_b | (ovf3_flag > 0)


def cluster_traverse(
    scene: CompiledScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmax0: jnp.ndarray,
    routing: Routing,
    interp: bool,
    anyhit: bool = False,
    need_uv: bool = True,
    fb_placement: str = "vmem",
):
    """(dst, prim_global, u, v, front); dst=-BIG occluded lanes (anyhit).

    ``fb_placement``: the caller's resolved packet-kernel placement
    ('vmem'|'hbm'|'hbm2') for the overflow fallback walk.

    Wavefronts beyond ``SLICE`` rays run as a compiled-once ``lax.map``
    over slices — the pair phase materializes (rays x K) feature rows,
    which at whole-frame sizes (2^21 rays) would be GB-scale otherwise.
    """
    n = origin.shape[0]
    if n > SLICE:
        s = -(-n // SLICE)
        pad = s * SLICE - n

        def prep(x, fill):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                           constant_values=fill).reshape(
                (s, SLICE) + x.shape[1:])

        def body(args):
            o, d, tm = args
            return _cluster_traverse_slice(
                scene, o, d, tm, routing, interp, anyhit, need_uv,
                fb_placement,
            )

        outs = jax.lax.map(
            body,
            (prep(origin, 0.0), prep(direction, 1.0), prep(tmax0, -BIG)),
        )
        return tuple(x.reshape((s * SLICE,) + x.shape[2:])[:n] for x in outs)
    return _cluster_traverse_slice(
        scene, origin, direction, tmax0, routing, interp, anyhit, need_uv,
        fb_placement,
    )


def _cluster_traverse_slice(
    scene: CompiledScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmax0: jnp.ndarray,
    routing: Routing,
    interp: bool,
    anyhit: bool = False,
    need_uv: bool = True,
    fb_placement: str = "vmem",
):
    n = origin.shape[0]
    K = routing.cluster_k
    C = int(scene.meta["n_clusters"])
    t_c = int(scene.meta["cluster_t_c"])
    psize = routing.packet_size or None
    lane_active = tmax0 > -BIG / 2
    feats = kcluster.ray_features(origin, direction, tmax0)  # (n,16)

    # ---- 1. enumerate candidate clusters per ray
    use_boxes = (
        routing.cluster_enum == "boxes"
        and int(scene.meta.get("n_supers", 0)) > 0
    )
    if use_boxes:
        pair_cid, pair_ray, ovf_b = _enum_boxes(
            scene, feats, routing, interp, lane_active
        )
    else:
        dummy_rows = jnp.full((1, 128), np.nan, jnp.float32)
        out = packet.packet_traverse_wide(
            scene.cwide_packed, dummy_rows, origin, direction, tmax0, 0,
            interpret=interp, packet_size=routing.cluster_enum_packet,
            max_recs=8, top_k=K, emit_leaves=True, need_uv=False,
            mask_mode=routing.mask_mode,
        )
        slots, ovf = out[5], out[6]  # (n,K) cluster ids (-1 pad)
        ovf_b = (ovf > 0) & lane_active
        # Ray-major compaction: the (n,K) slot matrix is ~70% empty
        # (mean ~4.4 candidates at K=16), so compacting to a
        # population-mean cap before the sort halves every downstream
        # array.  Rays whose pairs would spill past the cap join the
        # overflow fallback — a whole-population property, not per-ray.
        pair_cap = -(-(n * max(K // 2, 2)) // 128) * 128
        pair_cid, pair_ray, ovf2 = _compact_rows(
            slots, jnp.arange(n, dtype=jnp.int32),
            ~ovf_b & lane_active, pair_cap,
        )
        ovf_b = ovf_b | ovf2

    # ---- 2. group pairs by cluster (fused sort + 128-run padding)
    pe_p, ray_p, live_p, chunk_cid, g2 = _group_pairs(
        pair_cid, pair_ray, C + 2
    )

    # ---- 3. test chunks on the MXU, resolve per ray with scatter-min
    fp = feats[ray_p]  # (m2,16); dead pairs gather ray 0 — masked below
    fchunks = fp.reshape(g2, 128, 16).transpose(0, 2, 1)
    t_chunk, p_chunk = kcluster.cluster_pairs_test(
        scene.clus_mt, fchunks, chunk_cid, t_c=t_c, interpret=interp
    )
    t_flat = t_chunk.reshape(-1)
    p_flat = p_chunk.reshape(-1)
    gprim = (
        scene.clus_start[jnp.clip(pe_p, 0, C - 1)] + jnp.maximum(p_flat, 0)
    )
    tval = jnp.where(live_p & (p_flat >= 0), t_flat, BIG)
    ray_safe = jnp.where(live_p, ray_p, 0)
    t_min = jnp.full((n,), BIG, jnp.float32).at[ray_safe].min(tval)
    hit = t_min < tmax0
    dst = jnp.where(hit, t_min, tmax0)

    if not anyhit:
        win = live_p & (tval == t_min[ray_safe]) & (tval < tmax0[ray_safe])
        cand = jnp.where(win, gprim, IMAX)
        prim = jnp.full((n,), IMAX, jnp.int32).at[ray_safe].min(cand)
        prim = jnp.where(hit, prim, -1)

    # ---- overflow lanes: classic single-phase packet walk (their pairs
    # were excluded above, so this is the sole source of their result)
    tm_fb = jnp.where(ovf_b & lane_active, tmax0, -BIG)
    mode = fb_placement
    fb = packet.packet_traverse_wide(
        scene.wide_packed, scene.leaf_rows, origin, direction, tm_fb, 0,
        interpret=interp, packet_size=psize,
        tris_in_hbm=mode in ("hbm", "hbm2"),
        nodes_in_hbm=mode == "hbm2",
        max_recs=scene.meta.get("wide_leaf_recs", 8),
        multi_pop=routing.multi_pop, mask_mode=routing.mask_mode,
        anyhit=anyhit, need_uv=False,
    )
    fb_dst, fb_prim = fb[0], fb[1]
    if anyhit:
        occ = hit  # cluster-path lanes: any accepted t inside the clip
        dst = jnp.where(ovf_b, fb_dst, jnp.where(occ, -BIG, tmax0))
        zero = jnp.zeros_like(dst)
        return dst, jnp.full_like(fb_prim, -1), zero, zero, zero > 1
    fb_gprim = jnp.where(
        fb_prim >= 0, scene.leaf_map[jnp.maximum(fb_prim, 0)], fb_prim
    )
    dst = jnp.where(ovf_b, fb_dst, dst)
    prim = jnp.where(ovf_b, fb_gprim, prim)

    if need_uv:
        u, v, front = _uvfront_global(scene.tri_packed, origin, direction,
                                      prim)
    else:
        zero = jnp.zeros_like(dst)
        u, v, front = zero, zero, jnp.zeros_like(prim >= 1)
    return dst, prim, u, v, front
