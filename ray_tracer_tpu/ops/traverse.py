"""Wavefront scene traversal: stackless octant-threaded BVH walk.

TPU-native replacement for ``calculateIntersections``
(``shaders/raytrace.comp:276-353``).  Design differences from the GLSL
megakernel, driven by the hardware:

* The reference keeps a 64-deep *per-thread* stack and branches per ray.
  Per-lane stacks and divergent control flow are hostile to the TPU's 8x128
  VPU, so each ray instead carries a single node pointer through one of 8
  precomputed near-child-first DFS threadings (selected by the ray's
  direction octant) — see :mod:`ray_tracer_tpu.accel.bvh`.  Every loop step
  is a dense batched gather + slab test over all live lanes.
* Object transforms are applied with *precomputed* inverse matrices (the
  reference recomputes ``inverse(transformMatrix)`` twice per object per ray,
  quirk Q5, ``raytrace.comp:292-293``).
* Like the reference, ``t`` is parametric in world units (object-space
  directions are deliberately NOT renormalized), so hit distances compare
  across objects and spheres directly.

The object loop mirrors the reference's per-object BVH forest (quirk Q11):
a ``lax.scan`` over instances, carrying the running closest hit so the
``dst < closest`` prune sees earlier objects' hits.
"""

from __future__ import annotations

from typing import NamedTuple

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Routing
from ..scene.types import CompiledScene
from . import intersect
from .intersect import BIG


def _packet_mode(scene: CompiledScene, routing: Routing = None) -> str:
    """'off' | 'vmem' | 'hbm' | 'hbm2' | 'interpret*' — trace-time routing.

    ``routing.packet``: "off" forces the gather walk, "force" the Pallas
    packet kernel, "interpret" runs it in interpreter mode (CPU testing);
    default "auto" uses the kernel on TPU backends.  Placement by table
    size vs ``routing.vmem_budget``: 'vmem' = everything resident; 'hbm' =
    leaf rows DMA'd per visit; 'hbm2' = node rows AND leaf rows DMA'd per
    visit (arbitrarily large scenes — the pure-XLA gather walk trips the
    TPU execution watchdog, BENCH_NOTES, so every scene size needs a
    packet path).  Interpret mode reports 'interpret:<placement>' so tests
    can pin each routing.  ``routing=None`` resolves RT_* env vars.
    """
    rt = routing if routing is not None else Routing.from_env()
    if rt.packet == "off" or not scene.meta.get("flattened", False):
        return "off"
    # True VMEM-resident sizes: both tables are already 128-lane rows.
    node_bytes = scene.wide_packed.shape[0] * 512
    tri_bytes = scene.leaf_rows.shape[0] * 512
    if node_bytes + tri_bytes <= rt.vmem_budget:
        placement = "vmem"
    elif node_bytes <= rt.vmem_budget:
        placement = "hbm"
    else:
        placement = "hbm2"
    if rt.packet == "interpret":
        return "interpret:" + placement
    if rt.packet == "force" or jax.default_backend() in ("tpu", "axon"):
        return placement
    return "off"

# numpy scalar: module-level jnp constants would initialize the default
# backend at import time, breaking later jax_platforms overrides (--cpu)
SENTINEL = np.int32(2**31 - 1)

KIND_NONE = 0
KIND_SPHERE = 1
KIND_TRI = 2


class Hit(NamedTuple):
    """Closest-hit record (SoA over the ray batch).

    ``u``/``v`` are Moller-Trumbore barycentrics for deferred attribute
    interpolation (``hit = w*A0 + u*A1 + v*A2``); ``prim`` is the sphere or
    global triangle index; ``obj`` the instance index for triangles.
    """

    dst: jnp.ndarray  # (N,) f32, BIG when no hit
    kind: jnp.ndarray  # (N,) i32: 0 none / 1 sphere / 2 triangle
    prim: jnp.ndarray  # (N,) i32
    obj: jnp.ndarray  # (N,) i32
    u: jnp.ndarray  # (N,) f32
    v: jnp.ndarray  # (N,) f32
    front: jnp.ndarray  # (N,) bool

    @property
    def did_hit(self):
        return self.kind != KIND_NONE


def _transform_point(inv_m, p):
    # (N,4,4) x (N,3)
    return jnp.einsum("nij,nj->ni", inv_m[:, :3, :3], p) + inv_m[:, :3, 3]


def _transform_dir(inv_m, d):
    return jnp.einsum("nij,nj->ni", inv_m[:, :3, :3], d)


def _use_wide(scene: CompiledScene, mode: str, routing: Routing) -> bool:
    """Wide (BVH8) vs narrow packet kernel for a resolved packet mode.

    The narrow kernel only supports fully VMEM-resident tables, so for
    'hbm'/'hbm2' placements the wide kernel runs even when
    ``routing.wide=False`` (graceful degradation instead of a VMEM OOM —
    round-2 ADVICE).
    """
    placement = mode.split(":")[-1]
    return routing.wide or placement in ("hbm", "hbm2")


def prim_space(scene: CompiledScene, routing: Routing = None) -> str:
    """Which id space ``traverse(raw=True)`` reports triangle hits in.

    'slot': padded leaf-slot ids (wide packet kernel) — index
    ``scene.shade_slot``; 'tri': global triangle ids — ``scene.shade_tri``.
    Static at trace time (depends on routing + scene meta only).
    """
    rt = routing if routing is not None else Routing.from_env()
    if _lanewalk_on(scene, rt):
        return "tri"  # rope rows carry global triangle ids
    mode = _packet_mode(scene, rt)
    if mode != "off" and _cluster_on(scene, mode, rt):
        return "tri"  # cluster ranges are contiguous global-id ranges
    if mode != "off" and _use_wide(scene, mode, rt):
        return "slot"
    return "tri"


def _lanewalk_on(scene: CompiledScene, routing: Routing) -> bool:
    """Route through the per-lane rope-walk kernel (kernels/lanewalk.py)?
    Needs the per-octant rope streams (flattened scenes, built by
    scene/builder.py unless RT_ROPE_BUILD=0).  When on it replaces BOTH
    the closest-hit and anyhit triangle traversal."""
    lw = routing.lanewalk
    if lw == "off":
        return False
    if not scene.meta.get("flattened", False) or not scene.meta.get(
        "rope_rows", 0
    ):
        return False
    if lw in ("force", "interpret"):
        return True
    return jax.default_backend() in ("tpu", "axon")


def _cluster_on(scene: CompiledScene, mode: str, routing: Routing) -> bool:
    from . import cluster_trace

    return cluster_trace.use_cluster(scene, mode, routing)


def _group_on(scene: CompiledScene, mode: str, routing: Routing) -> bool:
    """Route closest-hit triangle traversal through the multi-stack
    lane-group kernel (kernels/group.py)?  Needs the wide path with fully
    VMEM-resident tables and single-row (<=8-record) leaf slots.  Anyhit
    routes through the group kernel only when ``routing.anyhit_group``
    additionally opts in (round-5 A/B; r4 measured the unspecialized
    variant neutral)."""
    placement = mode.split(":")[1] if mode.startswith("interpret") else mode
    return (
        routing.groups > 0
        and _use_wide(scene, mode, routing)
        and not routing.two_phase
        and not _cluster_on(scene, mode, routing)
        and placement == "vmem"
        and scene.meta.get(
            "wide_leaf_recs", 4 if scene.max_leaf_tris <= 4 else 8
        ) <= 8
    )


def _two_phase_wide(
    scene: CompiledScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmax0: jnp.ndarray,
    routing: Routing,
    interp: bool,
    anyhit: bool = False,
    need_uv: bool = True,
):
    """Two-phase treelet packet traversal (round 3).

    Phase A walks only the TOP of the wide tree (treelet-root children are
    emitted as per-lane entries, up to ``routing.top_k``; overflow lanes
    fall back to a root-entry pair).  (ray, entry) pairs are sorted by
    entry and RUN-PADDED to 128-multiples, so every deep packet contains
    at most ``packet/128`` distinct entries — the per-packet entry lists
    are then just the first element of each 128-block, and no pair can be
    silently dropped.  Phase B walks each pair from its entry with the
    phase-A best as the initial bound; results fold back with a (K+1)-way
    argmin per ray (pure reshape/argmin — no scatters race).

    Why: a deep packet's node union is bounded by the subtrees its ~16
    entries head, instead of the whole-tree union of a root walk — the
    quantity that dominates incoherent-bounce traversal (BENCH_NOTES r3
    sim: 3.1x fewer packet-visits at 38k-ray populations, improving with
    population size).
    """
    from ..kernels import packet

    n = origin.shape[0]
    K = routing.top_k
    psize = routing.packet_size or packet.PACKET
    R = 128  # run-padding quantum; E = psize // R entries per deep packet
    E = psize // R

    out = packet.packet_traverse_wide(
        scene.wide_packed, scene.leaf_rows, origin, direction, tmax0,
        0, interpret=interp, packet_size=psize,
        max_recs=scene.meta.get("wide_leaf_recs", 8),
        anyhit=anyhit, top_k=K, troot=scene.wide_troot, need_uv=need_uv,
    )
    dstA, primA, uA, vA, frontA, slots, ovf = out

    # Overflow lanes re-traverse from the root: pair 0 becomes the root
    # entry (wide id 0), the rest are dropped.
    ovf_b = ovf > 0
    slots = jnp.where(
        ovf_b[:, None],
        jnp.concatenate(
            [jnp.zeros((n, 1), jnp.int32),
             jnp.full((n, K - 1), -1, jnp.int32)], axis=1,
        ),
        slots,
    )

    lane_active = tmax0 > -1.0
    SENT = jnp.int32(2**30)
    max_runs = int(scene.meta.get("n_treelets", 0)) + 2

    def deep_round(pair_entry, pair_ray, valid, tmax_ray, nk):
        """Sort (ray, entry) pairs by entry, run-pad to R-multiples, walk
        each pair from its entry bounded by the ray's current best, and
        return per-pair (dst, prim, u, v, front, live) in (nk, n) layout.
        """
        m = nk * n
        key = jnp.where(valid, pair_entry, SENT)
        order = jnp.argsort(key)
        pe = key[order]
        prev = jnp.concatenate([jnp.full((1,), -9, jnp.int32), pe[:-1]])
        newrun = pe != prev
        run_id = jnp.cumsum(newrun.astype(jnp.int32)) - 1  # 0-based
        run_start = jnp.where(newrun, jnp.arange(m, dtype=jnp.int32), 0)
        run_start = jax.lax.associative_scan(jnp.maximum, run_start)
        pos_in_run = jnp.arange(m, dtype=jnp.int32) - run_start
        rid = jnp.minimum(run_id, max_runs - 1)
        lens = jnp.zeros((max_runs,), jnp.int32).at[rid].add(1)
        padded = -(-lens // R) * R
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
        )
        dest = offs[rid] + pos_in_run
        m2 = m + max_runs * R  # static padded capacity
        g2 = -(-m2 // psize)
        m2 = g2 * psize

        def scat(x, init):
            return jnp.full((m2,), init, x.dtype).at[dest].set(x)

        pe_p = scat(pe, SENT)
        ray_p = scat(pair_ray[order], 0)
        live_p = scat(valid[order].astype(jnp.int32), 0) > 0
        entries = pe_p.reshape(g2, E, R)[:, :, 0]
        entries = jnp.where(entries >= SENT, -1, entries)

        tm_p = jnp.where(live_p, tmax_ray[ray_p], -packet.BIG)
        dstD, primD, uD, vD, frontD = packet.packet_traverse_wide(
            scene.wide_packed, scene.leaf_rows,
            origin[ray_p], direction[ray_p], tm_p,
            0, interpret=interp, packet_size=psize,
            max_recs=scene.meta.get("wide_leaf_recs", 8),
            anyhit=anyhit, deep_e=E, entries=entries, need_uv=need_uv,
        )
        dest_by_pair = jnp.zeros((m,), jnp.int32).at[order].set(dest)
        take = lambda x: x[dest_by_pair].reshape(nk, n)
        return (take(dstD), take(primD), take(uD), take(vD),
                take(frontD.astype(jnp.int32)),
                take(live_p.astype(jnp.int32)) > 0)

    arange_n = jnp.arange(n, dtype=jnp.int32)

    # ---- deep round 1: each ray's FIRST entry only (the top phase emits
    # in near-first traversal order, so slot 0 is the likeliest subtree to
    # hold the closest hit).  Finding it first lets round 2's pairs prune
    # at their entry instead of walking whole subtrees — the sequential
    # inter-subtree pruning a per-ray walk gets for free (without this,
    # unordered pairs measured 4.4x SLOWER than single-phase).
    e0 = slots[:, 0]
    v0 = (e0 >= 0) & lane_active
    if anyhit:
        v0 = v0 & ~(dstA < -1.0)
    d1, p1, u1, vv1, f1, l1 = deep_round(e0, arange_n, v0, dstA, 1)

    if anyhit:
        occ1 = (dstA < -1.0) | ((d1[0] < -1.0) & l1[0])
        best1 = jnp.where(occ1, -packet.BIG, tmax0)
    else:
        hit1 = (p1[0] >= 0) & l1[0]
        best1 = jnp.where(hit1 & (d1[0] < dstA), d1[0], dstA)

    # ---- deep round 2: remaining entries, bounded by the round-1 best
    K2 = K - 1
    pair_entry = slots[:, 1:].T.reshape(K2 * n)
    pair_ray = jnp.tile(arange_n, (K2,))
    valid = (pair_entry >= 0) & lane_active[pair_ray]
    if anyhit:
        valid = valid & ~(best1[pair_ray] < -1.0)
    d2, p2, u2, v2, f2, l2 = deep_round(
        pair_entry, pair_ray, valid, best1, K2
    )

    if anyhit:
        occ = (best1 < -1.0) | jnp.any((d2 < -1.0) & l2, axis=0)
        marker = jnp.where(occ, -packet.BIG, dstA)
        return marker, primA, uA, vA, frontA

    # ---- fold: phase A + round 1 + round 2 pairs, per-ray argmin
    dstD_by = jnp.concatenate([d1, d2], axis=0)
    primD_by = jnp.concatenate([p1, p2], axis=0)
    uD_by = jnp.concatenate([u1, u2], axis=0)
    vD_by = jnp.concatenate([vv1, v2], axis=0)
    fD_by = jnp.concatenate([f1, f2], axis=0)
    dstD_by = jnp.where(primD_by >= 0, dstD_by, packet.BIG)
    dst_all = jnp.concatenate([dstA[None], dstD_by], axis=0)  # (K+1, n)
    win = jnp.argmin(dst_all, axis=0)  # phase A wins ties
    pick = lambda a_, d_: jnp.where(
        win == 0, a_, jnp.take_along_axis(
            d_, jnp.maximum(win - 1, 0)[None], axis=0
        )[0]
    )
    dst = jnp.take_along_axis(dst_all, win[None], axis=0)[0]
    prim = pick(primA, primD_by)
    u = pick(uA, uD_by)
    v = pick(vA, vD_by)
    front = pick(frontA.astype(jnp.int32), fD_by)
    return dst, prim, u, v, front > 0


def _two_phase_ok(scene: CompiledScene, mode: str, routing: Routing) -> bool:
    """Two-phase applies: flattened + fully VMEM-resident + SMEM meta fits
    + the tree actually has treelets + wide kernel."""
    return (
        routing.two_phase
        and routing.multi_pop == 1
        and mode in ("vmem", "interpret:vmem")
        and routing.wide
        and scene.meta.get("n_treelets", 0) > 0
        and scene.wide_packed.shape[0] * 12 * 4 <= 600_000
        and (routing.packet_size or 2048) % 128 == 0
    )


def traverse(
    scene: CompiledScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    active: jnp.ndarray,
    max_steps: int = None,
    tmax: jnp.ndarray = None,
    raw: bool = False,
    routing: Routing = None,
    need_uv: bool = True,
) -> Hit:
    """Closest hit for a batch of world-space rays.

    ``active`` masks lanes; inactive lanes return no-hit without traversal
    work (their node pointer starts at the sentinel).

    ``tmax`` (optional, (N,)): per-lane search radius.  Hits beyond it are
    not found (lanes report no-hit; ``dst`` stays at the initial bound).
    Used to clip NEE shadow rays at the sampled light distance, which
    prunes every BVH subtree beyond the light.

    ``raw``: skip the leaf-slot -> triangle-id and triangle -> instance
    mapping gathers on the packet path; ``prim`` is then in
    :func:`prim_space` space and ``obj`` is unset (0) for triangle hits —
    callers fetch both from the fat shading row instead (2 fewer per-lane
    gathers per traversal on the hot path).

    ``max_steps`` bounds the gather walk's node visits; the default scales
    with the scene (each node is visited at most once per rope walk, so
    ``n_nodes + 1`` can never truncate a legitimate walk — a fixed 4096
    could silently drop hits on Sponza-scale trees, round-2 ADVICE).

    ``need_uv=False``: the wide packet path skips producing ``u``/``v``/
    ``front`` for triangle hits (they return zeros) — hot callers
    re-derive them from the winning record's geometry inside the fat
    shading-row gather (``wavefront._shade_fetch``), saving a second
    per-lane gather per traversal.  Sphere facing bits are unaffected.
    """
    routing = routing if routing is not None else Routing.from_env()
    n = origin.shape[0]
    n_nodes = scene.bvh_index.shape[0]
    if max_steps is None:
        max_steps = n_nodes + 1
    max_leaf = scene.max_leaf_tris

    best = Hit(
        dst=jnp.full((n,), BIG) if tmax is None else jnp.asarray(tmax),
        kind=jnp.zeros((n,), jnp.int32),
        prim=jnp.zeros((n,), jnp.int32),
        obj=jnp.zeros((n,), jnp.int32),
        u=jnp.zeros((n,)),
        v=jnp.zeros((n,)),
        front=jnp.zeros((n,), bool),
    )

    # ---- spheres: brute force over the (small, padded) sphere table,
    # mirroring the reference's linear loop (raytrace.comp:282-287).
    if scene.n_spheres > 0:
        s_dst, s_front, s_hit = intersect.intersect_spheres(
            origin, direction, scene.sphere_pos, scene.sphere_radius
        )
        s_dst = jnp.where(s_hit, s_dst, BIG)
        si = jnp.argmin(s_dst, axis=1)
        sd = jnp.take_along_axis(s_dst, si[:, None], axis=1)[:, 0]
        sf = jnp.take_along_axis(s_front, si[:, None], axis=1)[:, 0]
        better = active & (sd < best.dst)
        best = Hit(
            dst=jnp.where(better, sd, best.dst),
            kind=jnp.where(better, KIND_SPHERE, best.kind),
            prim=jnp.where(better, si.astype(jnp.int32), best.prim),
            obj=best.obj,
            u=best.u,
            v=best.v,
            front=jnp.where(better, sf, best.front),
        )

    if scene.n_objects == 0 or scene.meta.get("n_tris", 0) == 0:
        return best

    if _lanewalk_on(scene, routing):
        from ..kernels import lanewalk as lanewalk_k

        tmax0 = jnp.where(active, best.dst, -BIG)
        dst, prim = lanewalk_k.lanewalk_traverse(
            scene.rope_streams, scene.meta["rope_rows"], origin, direction,
            tmax0, interpret=routing.lanewalk == "interpret",
        )
        tri_hit = prim >= 0
        if need_uv:
            ti = jnp.maximum(prim, 0)
            trow = scene.tri_packed[ti]
            _, u, v, _, front, _ = intersect.intersect_tris(
                origin, direction, trow[:, 0:3], trow[:, 3:6],
                trow[:, 6:9], trow[:, 9:12], trow[:, 12] > 0.5,
            )
        else:
            zero = jnp.zeros_like(dst)
            u, v, front = zero, zero, jnp.zeros_like(tri_hit)
        owner = (
            jnp.zeros_like(prim)
            if raw
            else scene.tri_obj[jnp.where(tri_hit, prim, 0)]
        )
        return Hit(
            dst=jnp.where(tri_hit, dst, best.dst),
            kind=jnp.where(tri_hit, KIND_TRI, best.kind),
            prim=jnp.where(tri_hit, prim, best.prim),
            obj=jnp.where(tri_hit, owner, best.obj),
            u=jnp.where(tri_hit, u, best.u),
            v=jnp.where(tri_hit, v, best.v),
            front=jnp.where(tri_hit, front, best.front),
        )

    hit_links = scene.bvh_hit_link.reshape(-1)  # (8*B,)
    miss_links = scene.bvh_miss_link.reshape(-1)

    mode = _packet_mode(scene, routing)
    if mode != "off":
        from ..kernels import packet

        interp = mode.startswith("interpret")
        placement = mode.split(":")[1] if interp else mode
        tmax0 = jnp.where(active, best.dst, -BIG)
        psize = routing.packet_size or None
        if _cluster_on(scene, mode, routing):
            from . import cluster_trace

            dst, prim, u, v, front = cluster_trace.cluster_traverse(
                scene, origin, direction, tmax0, routing, interp,
                need_uv=need_uv, fb_placement=placement,
            )
            # prim is already a GLOBAL triangle id (prim_space 'tri')
        elif _group_on(scene, mode, routing):
            from ..kernels import group

            dst, prim = group.group_traverse(
                scene.wide_packed,
                scene.leaf_rows,
                origin,
                direction,
                tmax0,
                0,
                interpret=interp,
                packet_size=routing.groups_packet,
                groups=routing.groups,
                max_recs=scene.meta.get(
                    "wide_leaf_recs", 4 if scene.max_leaf_tris <= 4 else 8
                ),
                # register-top DFS (r5): top pair in the loop carry, one
                # SMEM store/load per group-step; A/B escape hatch only
                reg_top=os.environ.get("RT_GROUP_REGTOP", "0") == "1",
            )
            if need_uv:
                u, v, front = packet._reconstruct_uvfront(
                    scene.leaf_rows, origin, direction, prim
                )
            else:
                zero = jnp.zeros_like(dst)
                u, v, front = zero, zero, jnp.zeros_like(prim >= 1)
            if not raw:
                prim = jnp.where(
                    prim >= 0, scene.leaf_map[jnp.maximum(prim, 0)], prim
                )
        elif _use_wide(scene, mode, routing) and _two_phase_ok(
            scene, mode, routing
        ):
            dst, prim, u, v, front = _two_phase_wide(
                scene, origin, direction, tmax0, routing, interp,
                need_uv=need_uv,
            )
            if not raw:
                prim = jnp.where(
                    prim >= 0, scene.leaf_map[jnp.maximum(prim, 0)], prim
                )
        elif _use_wide(scene, mode, routing):
            dst, prim, u, v, front = packet.packet_traverse_wide(
                scene.wide_packed,
                scene.leaf_rows,
                origin,
                direction,
                tmax0,
                0,  # entry = wide root
                interpret=interp,
                packet_size=psize,
                tris_in_hbm=placement in ("hbm", "hbm2"),
                nodes_in_hbm=placement == "hbm2",
                max_recs=scene.meta.get(
                    "wide_leaf_recs", 4 if scene.max_leaf_tris <= 4 else 8
                ),
                multi_pop=routing.multi_pop,
                mask_mode=routing.mask_mode,
                need_uv=need_uv,
            )
            # kernel reports padded leaf-slot ids; map to global tri ids
            # (hot callers pass raw=True and use shade_slot rows instead)
            if not raw:
                prim = jnp.where(
                    prim >= 0, scene.leaf_map[jnp.maximum(prim, 0)], prim
                )
        else:
            meta = jnp.stack(
                [
                    scene.bvh_index,
                    scene.bvh_tri_count,
                    scene.bvh_axis,
                    jnp.zeros_like(scene.bvh_index),
                ],
                axis=1,
            ).astype(jnp.int32)
            dst, prim, u, v, front = packet.packet_traverse(
                scene.bvh_packed,
                meta,
                scene.tri_packed,
                origin,
                direction,
                tmax0,
                scene.obj_bvh_root[0],
                max_leaf=scene.max_leaf_tris,
                interpret=interp,
                packet_size=psize,
            )
        tri_hit = prim >= 0
        if raw:
            owner = jnp.zeros_like(prim)
        else:
            owner = scene.tri_obj[jnp.where(tri_hit, prim, 0)]
        return Hit(
            dst=jnp.where(tri_hit, dst, best.dst),
            kind=jnp.where(tri_hit, KIND_TRI, best.kind),
            prim=jnp.where(tri_hit, prim, best.prim),
            obj=jnp.where(tri_hit, owner, best.obj),
            u=jnp.where(tri_hit, u, best.u),
            v=jnp.where(tri_hit, v, best.v),
            front=jnp.where(tri_hit, front, best.front),
        )

    if scene.meta.get("flattened", False):
        # Single world-space BVH: one walk, no transforms, no object loop.
        return _walk(
            scene, hit_links, miss_links, origin, direction, active, best,
            root=scene.obj_bvh_root[0], obj_id=None, max_steps=max_steps,
        )

    def per_object(best, obj_params):
        inv_m, root, obj_id = obj_params
        inv_b = jnp.broadcast_to(inv_m, (n, 4, 4))
        o = _transform_point(inv_b, origin)
        d = _transform_dir(inv_b, direction)
        best = _walk(
            scene, hit_links, miss_links, o, d, active, best,
            root=root, obj_id=obj_id, max_steps=max_steps,
        )
        return best, None

    obj_ids = jnp.arange(scene.obj_bvh_root.shape[0], dtype=jnp.int32)
    best, _ = jax.lax.scan(
        per_object,
        best,
        (scene.obj_inv_transform, scene.obj_bvh_root, obj_ids),
    )
    return best


def traverse_anyhit(
    scene: CompiledScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    active: jnp.ndarray,
    tmax: jnp.ndarray,
    routing: Routing = None,
) -> jnp.ndarray:
    """Occlusion query: is there ANY hit strictly inside ``tmax``?

    The TPU shape of a shadow ray.  On the packet-kernel path lanes
    terminate at their first accepted hit (``anyhit=True``), which shrinks
    the per-packet node union drastically for occluded rays; every other
    path (gather walk / narrow kernel / sphere loop) derives occlusion from
    the closest hit, which is equivalent (a closest hit inside ``tmax``
    exists iff any hit does).

    Returns (N,) bool; inactive lanes report unoccluded.
    """
    routing = routing if routing is not None else Routing.from_env()
    occ = jnp.zeros((origin.shape[0],), bool)

    # Spheres: brute-force loop, same as traverse().
    if scene.n_spheres > 0:
        s_dst, _, s_hit = intersect.intersect_spheres(
            origin, direction, scene.sphere_pos, scene.sphere_radius
        )
        s_dst = jnp.where(s_hit, s_dst, BIG)
        occ = occ | (jnp.min(s_dst, axis=1) < tmax)

    if scene.n_objects == 0 or scene.meta.get("n_tris", 0) == 0:
        return occ & active

    if _lanewalk_on(scene, routing):
        from ..kernels import lanewalk as lanewalk_k

        tmax0 = jnp.where(active, tmax, -BIG)
        dst, _ = lanewalk_k.lanewalk_traverse(
            scene.rope_streams, scene.meta["rope_rows"], origin, direction,
            tmax0, interpret=routing.lanewalk == "interpret", anyhit=True,
        )
        return (occ | (dst < -1.0)) & active

    mode = _packet_mode(scene, routing)
    if mode != "off" and (
        _cluster_on(scene, mode, routing) or _use_wide(scene, mode, routing)
    ):
        from ..kernels import packet

        interp = mode.startswith("interpret")
        placement = mode.split(":")[1] if interp else mode
        tmax0 = jnp.where(active, tmax, -BIG)
        if _cluster_on(scene, mode, routing):
            from . import cluster_trace

            dst, _, _, _, _ = cluster_trace.cluster_traverse(
                scene, origin, direction, tmax0, routing, interp,
                anyhit=True, need_uv=False, fb_placement=placement,
            )
        elif _two_phase_ok(scene, mode, routing):
            dst, _, _, _, _ = _two_phase_wide(
                scene, origin, direction, tmax0, routing, interp,
                anyhit=True,
            )
        elif routing.anyhit_group and _group_on(scene, mode, routing):
            # Occlusion through the multi-stack group kernel (round 5,
            # VERDICT item 2).  r4 measured group-anyhit neutral vs the
            # packet walk; re-opened after the order-free anyhit
            # specialization removed the near-first machinery from both
            # kernels — hardware verdict in BENCH_NOTES r5.
            from ..kernels import group

            dst, _ = group.group_traverse(
                scene.wide_packed,
                scene.leaf_rows,
                origin,
                direction,
                tmax0,
                0,
                interpret=interp,
                packet_size=routing.groups_packet,
                groups=routing.anyhit_groups or routing.groups,
                max_recs=scene.meta.get(
                    "wide_leaf_recs", 4 if scene.max_leaf_tris <= 4 else 8
                ),
                anyhit=True,
            )
        else:
            dst, _, _, _, _ = packet.packet_traverse_wide(
                scene.wide_packed,
                scene.leaf_rows,
                origin,
                direction,
                tmax0,
                0,
                interpret=interp,
                packet_size=routing.packet_size or None,
                tris_in_hbm=placement in ("hbm", "hbm2"),
                nodes_in_hbm=placement == "hbm2",
                max_recs=scene.meta.get(
                        "wide_leaf_recs", 4 if scene.max_leaf_tris <= 4 else 8
                    ),
                anyhit=True,
                multi_pop=routing.multi_pop,
                mask_mode=routing.mask_mode,
            )
        return (occ | (dst < -1.0)) & active

    hit = traverse(scene, origin, direction, active, tmax=tmax, routing=routing)
    return (occ | (hit.kind == KIND_TRI)) & active


def traverse_with_stats(scene, origin, direction, active, tmax=None):
    """Closest hit + (box_tests, tri_tests) per ray.

    Debug/diagnostic path replicating the reference's stats counters
    (raytrace.comp:276): always uses the gather walk (the packet kernel
    tracks per-packet, not per-ray, work).  Flattened scenes only need one
    walk; forest scenes scan objects like :func:`traverse`.  Sphere hits
    merge like :func:`traverse` (so full-path heatmaps follow the exact
    production paths) but are not counted — the reference's sphere loop
    increments nothing (raytrace.comp:282-287).
    """
    n = origin.shape[0]
    best = Hit(
        dst=jnp.full((n,), BIG) if tmax is None else jnp.asarray(tmax),
        kind=jnp.zeros((n,), jnp.int32),
        prim=jnp.zeros((n,), jnp.int32),
        obj=jnp.zeros((n,), jnp.int32),
        u=jnp.zeros((n,)),
        v=jnp.zeros((n,)),
        front=jnp.zeros((n,), bool),
    )
    if scene.n_spheres > 0:
        s_dst, s_front, s_hit = intersect.intersect_spheres(
            origin, direction, scene.sphere_pos, scene.sphere_radius
        )
        s_dst = jnp.where(s_hit, s_dst, BIG)
        si = jnp.argmin(s_dst, axis=1)
        sd = jnp.take_along_axis(s_dst, si[:, None], axis=1)[:, 0]
        sf = jnp.take_along_axis(s_front, si[:, None], axis=1)[:, 0]
        better = active & (sd < best.dst)
        best = Hit(
            dst=jnp.where(better, sd, best.dst),
            kind=jnp.where(better, KIND_SPHERE, best.kind),
            prim=jnp.where(better, si.astype(jnp.int32), best.prim),
            obj=best.obj,
            u=best.u,
            v=best.v,
            front=jnp.where(better, sf, best.front),
        )
    stats = (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
    if scene.n_objects == 0 or scene.meta.get("n_tris", 0) == 0:
        return best, stats
    hit_links = scene.bvh_hit_link.reshape(-1)
    miss_links = scene.bvh_miss_link.reshape(-1)
    if scene.meta.get("flattened", False):
        return _walk(
            scene, hit_links, miss_links, origin, direction, active, best,
            root=scene.obj_bvh_root[0], obj_id=None, stats=stats,
        )

    def per_object(carry, obj_params):
        best, stats = carry
        inv_m, root, obj_id = obj_params
        inv_b = jnp.broadcast_to(inv_m, (n, 4, 4))
        o = _transform_point(inv_b, origin)
        d = _transform_dir(inv_b, direction)
        best, stats = _walk(
            scene, hit_links, miss_links, o, d, active, best,
            root=root, obj_id=obj_id, stats=stats,
        )
        return (best, stats), None

    obj_ids = jnp.arange(scene.obj_bvh_root.shape[0], dtype=jnp.int32)
    (best, stats), _ = jax.lax.scan(
        per_object,
        (best, stats),
        (scene.obj_inv_transform, scene.obj_bvh_root, obj_ids),
    )
    return best, stats


def _walk(scene, hit_links, miss_links, o, d, active, best, root, obj_id,
          stats=None, max_steps=None):
    """One stackless octant-threaded walk of a single BVH tree.

    ``obj_id=None``: flattened scene — the owning instance comes from the
    packed triangle row; otherwise the scalar instance id of this forest
    entry.  All hot-loop reads go through the *packed* single-row-per-record
    arrays (one gather per node, one per link pair, one per leaf triangle)
    instead of 8+ separate SoA gathers.

    ``stats``: optional (box_tests, tri_tests) counters, the analogue of the
    reference's ``stats[2]`` debug counters (raytrace.comp:276,310,338);
    updated per ray and returned alongside the hit when given.
    """
    n = o.shape[0]
    n_nodes = scene.bvh_index.shape[0]
    if max_steps is None:
        # each node is visited at most once per rope walk, so this bound
        # can never truncate a legitimate walk (round-2 ADVICE: a fixed
        # 4096 silently dropped hits on large trees)
        max_steps = n_nodes + 1
    max_leaf = scene.max_leaf_tris
    inv_dir = 1.0 / d
    octant = (
        (inv_dir[:, 0] < 0).astype(jnp.int32)
        + 2 * (inv_dir[:, 1] < 0).astype(jnp.int32)
        + 4 * (inv_dir[:, 2] < 0).astype(jnp.int32)
    )
    link_base = octant * n_nodes

    node0 = jnp.where(active, jnp.broadcast_to(root, (n,)).astype(jnp.int32), SENTINEL)

    with_stats = stats is not None
    if not with_stats:
        stats = (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))

    def cond(state):
        node, _, _, steps = state
        # the step bound turns a corrupted/cyclic link table (e.g. from a
        # bad native-builder build) into a truncated walk instead of a hang
        return jnp.any(node != SENTINEL) & (steps < max_steps)

    def body(state):
        node, best, (box_cnt, tri_cnt), steps = state
        live = node != SENTINEL
        ni = jnp.where(live, node, 0)
        row = scene.bvh_packed[ni]  # (N,8): min3|max3|idx|cnt
        idx = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        cnt = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
        t_box = intersect.slab_test(o, inv_dir, row[:, 0:3], row[:, 3:6])
        box_hit = live & (t_box < best.dst)
        is_leaf = cnt > 0
        box_cnt = box_cnt + live.astype(jnp.float32)

        # Leaf: unrolled masked triangle tests (leaves are bounded by the
        # builder's max_leaf_tris).
        for k in range(max_leaf):
            valid = box_hit & is_leaf & (k < cnt)
            ti = jnp.where(valid, idx + k, 0)
            trow = scene.tri_packed[ti]  # (N,16)
            dst, u, v, w, front, hit = intersect.intersect_tris(
                o,
                d,
                trow[:, 0:3],
                trow[:, 3:6],
                trow[:, 6:9],
                trow[:, 9:12],
                trow[:, 12] > 0.5,
            )
            closer = valid & hit & (dst < best.dst)
            tri_cnt = tri_cnt + valid.astype(jnp.float32)
            owner = (
                jax.lax.bitcast_convert_type(trow[:, 13], jnp.int32)
                if obj_id is None
                else obj_id
            )
            best = Hit(
                dst=jnp.where(closer, dst, best.dst),
                kind=jnp.where(closer, KIND_TRI, best.kind),
                prim=jnp.where(closer, ti, best.prim),
                obj=jnp.where(closer, owner, best.obj),
                u=jnp.where(closer, u, best.u),
                v=jnp.where(closer, v, best.v),
                front=jnp.where(closer, front, best.front),
            )

        lrow = scene.links_packed[link_base + ni]  # (N,2): hit|miss
        go_deeper = box_hit & ~is_leaf
        nxt = jnp.where(go_deeper, lrow[:, 0], lrow[:, 1])
        node = jnp.where(live, nxt, SENTINEL)
        return node, best, (box_cnt, tri_cnt), steps + 1

    _, best, stats, _ = jax.lax.while_loop(
        cond, body, (node0, best, stats, jnp.int32(0))
    )
    if with_stats:
        return best, stats
    return best
