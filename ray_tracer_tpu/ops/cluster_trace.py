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
    return False  # "auto": off until measured on hardware


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

    # ---- 1. enumerate candidate clusters per ray
    dummy_rows = jnp.full((1, 128), np.nan, jnp.float32)
    out = packet.packet_traverse_wide(
        scene.cwide_packed, dummy_rows, origin, direction, tmax0, 0,
        interpret=interp, packet_size=routing.cluster_enum_packet,
        max_recs=8, top_k=K, emit_leaves=True, need_uv=False,
        mask_mode=routing.mask_mode,
    )
    slots, ovf = out[5], out[6]  # (n,K) cluster ids (-1 pad), (n,) i32
    ovf_b = ovf > 0
    lane_active = tmax0 > -BIG / 2

    # ---- 2. group pairs by cluster (compact + sort + run padding)
    # Ray-major compaction first: the (n,K) slot matrix is ~70% empty
    # (mean ~4.4 candidates at K=16), so compacting to a population-mean
    # cap before the sort halves every downstream array.  Rays whose
    # pairs would spill past the cap join the overflow fallback — a
    # whole-population property (mean candidates > PAIR_CAP/n), not a
    # per-ray one, so on sized workloads it never triggers.
    pair_cap = -(-(n * max(K // 2, 2)) // 128) * 128
    slot_ok = (slots >= 0) & (~ovf_b & lane_active)[:, None]
    cnt = slot_ok.sum(axis=1).astype(jnp.int32)
    base = jnp.cumsum(cnt) - cnt
    ovf2 = base + cnt > pair_cap
    ovf_b = ovf_b | ovf2
    valid2 = slot_ok & ~ovf2[:, None]
    k_rank = jnp.cumsum(valid2.astype(jnp.int32), axis=1) - 1
    dest0 = jnp.where(
        valid2, base[:, None] + k_rank, pair_cap
    )  # invalid -> one-past-end, dropped by mode="drop"
    m = pair_cap
    pair_cid = jnp.full((m,), SENT, jnp.int32).at[dest0.reshape(-1)].set(
        slots.reshape(-1), mode="drop"
    )
    pair_ray = jnp.zeros((m,), jnp.int32).at[dest0.reshape(-1)].set(
        jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, K)
        ).reshape(-1),
        mode="drop",
    )
    # one fused key/value sort; validity re-derives from the key, so no
    # post-sort gathers are needed
    pe, ray_sorted = jax.lax.sort_key_val(pair_cid, pair_ray)
    prev = jnp.concatenate([jnp.full((1,), -9, jnp.int32), pe[:-1]])
    newrun = pe != prev
    run_id = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    run_start = jnp.where(newrun, jnp.arange(m, dtype=jnp.int32), 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    pos_in_run = jnp.arange(m, dtype=jnp.int32) - run_start
    max_runs = C + 2
    rid = jnp.minimum(run_id, max_runs - 1)
    lens = jnp.zeros((max_runs,), jnp.int32).at[rid].add(1)
    padded = -(-lens // 128) * 128
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    dest = offs[rid] + pos_in_run
    m2 = -(-(m + max_runs * 128) // 128) * 128
    g2 = m2 // 128

    def scat(x, init):
        return jnp.full((m2,), init, x.dtype).at[dest].set(x)

    pe_p = scat(pe, SENT)
    ray_p = scat(ray_sorted, 0)
    live_p = pe_p < SENT
    chunk_cid = pe_p.reshape(g2, 128)[:, 0]
    chunk_cid = jnp.where(chunk_cid >= SENT, -1, chunk_cid)

    # ---- 3. test chunks on the MXU, resolve per ray with scatter-min
    feats = kcluster.ray_features(origin, direction)  # (n,16)
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
