"""Pallas TPU packet-BVH-traversal kernel.

The reference walks the BVH per GPU thread with a private 64-deep stack
(``shaders/raytrace.comp:300-349``) — a shape that maps terribly onto the
TPU's 8x128 vector unit, and per-lane gather traversal measures ~0.1 Mrays/s
(HBM-latency-bound).  This kernel instead uses *packet traversal* (classic
CPU-SIMD ray tracing, Wald et al. 2001): a packet of ``PACKET`` rays shares
ONE scalar traversal stack in SMEM; every node visit is a dense slab test of
all lanes at once (pure VPU work on exactly one (8,128)-tile-per-128-lanes
register shape), and a node is descended if ANY live lane wants it, with
near-child-first ordering from the packet's reduced entry distances.  Leaf
triangles stream in as dynamic (1,16) VMEM rows and are tested densely.

The whole scene (packed nodes + packed triangles) lives in VMEM, so there are
ZERO gathers in the loop — just broadcast scalar rows.  Each grid step owns
one packet and exits its loop independently: no cross-packet tail waste (the
pure-JAX walk wastes 5.8x on lane-tail sync for the klein_bottle scene).

Fits scenes up to ~10 MB of nodes+tris (~120k tris); larger scenes fall back
to the gather walk (ops/traverse.py) until the two-level DMA variant lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

BIG = 99999999.0  # python float: jnp scalars become captured consts in pallas
# Rays per packet, laid out as native (8,128) VPU tiles per block (Mosaic
# requires sublane/lane-divisible block shapes).  Larger packets amortize the
# scalar traversal loop over more lanes but visit a larger node union
# (worse for incoherent rays); 1024 = one tile.  On the round-2 hardened
# proxy 2048 beats 4096 by ~6% full-path (1.60 vs 1.51 Mrays/s) and ties
# it on cornell/klein (26.2/26.3, 5.8/5.9), so 2048 is the default; the
# round-1 easy-geometry measurements favored 4096.
PACKET = int(os.environ.get("RT_PACKET_SIZE", 2048))
assert PACKET % 128 == 0
_SUB, _LANE = PACKET // 128, 128
STACK_DEPTH = 96  # builder max depth is 64 (vk_engine.cpp:1215) + margin


def _scalar(x):
    """(1,k) vector slice -> scalar via 1-element reduce (Mosaic-friendly)."""
    return jnp.sum(x)


def _packet_kernel(
    nodes_ref,  # (B,8) f32: min3|max3|idx|cnt  (idx/cnt bitcast i32)
    meta_ref,  # (B,4) i32: idx|cnt|axis|pad (scalar-readable mirror)
    tris_ref,  # (T,16) f32: v0|e1|e2|n|front|obj|pad
    ox_ref, oy_ref, oz_ref,  # (1,P) f32 ray origins
    dx_ref, dy_ref, dz_ref,  # (1,P) f32 ray directions
    tmax_ref,  # (1,P) f32 initial best dst (BIG, or -BIG for inactive lanes)
    root_ref,  # (1,1) i32 in SMEM
    # outputs
    dst_ref, prim_ref, u_ref, v_ref, front_ref,  # (1,P)
    # scratch
    stack_ref,  # SMEM (STACK_DEPTH,) i32
    max_leaf: int,
):
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    # Exactly-zero direction components make 1/d infinite and the slab
    # arithmetic NaN (0*inf), silently failing every box comparison — the
    # lane then traverses NOTHING and only hits what packet-mates happen
    # to visit (composition-dependent!).  A tiny epsilon keeps the slab
    # math finite with the correct signs (axis-aligned camera rays, e.g.
    # the exact center column, are common).
    dx = jnp.where(dx == 0.0, 1e-20, dx)
    dy = jnp.where(dy == 0.0, 1e-20, dy)
    dz = jnp.where(dz == 0.0, 1e-20, dz)
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    dst_ref[...] = tmax_ref[...]
    prim_ref[...] = jnp.full_like(prim_ref[...], -1)
    u_ref[...] = jnp.zeros_like(u_ref[...])
    v_ref[...] = jnp.zeros_like(v_ref[...])
    front_ref[...] = jnp.zeros_like(front_ref[...])

    def slab(child):
        """Entry distance of all lanes vs node ``child`` (scalar index)."""
        row = nodes_ref[pl.ds(child, 1), :]  # (1,8)
        t1x = (row[0, 0] - ox) * inv_x
        t2x = (row[0, 3] - ox) * inv_x
        t1y = (row[0, 1] - oy) * inv_y
        t2y = (row[0, 4] - oy) * inv_y
        t1z = (row[0, 2] - oz) * inv_z
        t2z = (row[0, 5] - oz) * inv_z
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        hit = (tmax >= tmin) & (tmax > 0)
        return jnp.where(hit, jnp.maximum(tmin, 0.0), 99999999.0)

    def leaf_tris(first, count):
        def tri_body(k, _):
            ti = first + k
            trow = tris_ref[pl.ds(ti, 1), :]  # (1,16)
            v0x, v0y, v0z = trow[0, 0], trow[0, 1], trow[0, 2]
            e1x, e1y, e1z = trow[0, 3], trow[0, 4], trow[0, 5]
            e2x, e2y, e2z = trow[0, 6], trow[0, 7], trow[0, 8]
            nx, ny, nz = trow[0, 9], trow[0, 10], trow[0, 11]
            front_only = trow[0, 12] > 0.5
            rx = ox - v0x
            ry = oy - v0y
            rz = oz - v0z
            # q = cross(rov0, d)
            qx = ry * dz - rz * dy
            qy = rz * dx - rx * dz
            qz = rx * dy - ry * dx
            d0 = -(dx * nx + dy * ny + dz * nz)
            dinv = 1.0 / d0
            t = (rx * nx + ry * ny + rz * nz) * dinv
            u = (e2x * qx + e2y * qy + e2z * qz) * dinv
            v = -(e1x * qx + e1y * qy + e1z * qz) * dinv
            w = 1.0 - u - v
            front = d0 >= 1e-8
            ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
            ok = ok & ~((~front) & front_only)
            closer = ok & (t < dst_ref[...])
            dst_ref[...] = jnp.where(closer, t, dst_ref[...])
            prim_ref[...] = jnp.where(closer, ti, prim_ref[...])
            u_ref[...] = jnp.where(closer, u, u_ref[...])
            v_ref[...] = jnp.where(closer, v, v_ref[...])
            front_ref[...] = jnp.where(
                closer, front.astype(jnp.float32), front_ref[...]
            )
            return 0

        jax.lax.fori_loop(0, count, tri_body, 0)

    stack_ref[0] = root_ref[0, 0]

    def cond(sp):
        return sp > 0

    # Packet direction-sign per axis (one-time reductions): drives static
    # near-child-first ordering via each node's split axis, replacing two
    # per-visit min-reductions with scalar arithmetic.
    neg_x = jnp.sum(jnp.where(dx < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dx.size)
    neg_y = jnp.sum(jnp.where(dy < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dy.size)
    neg_z = jnp.sum(jnp.where(dz < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dz.size)

    def body(sp):
        sp = sp - 1
        ni = stack_ref[sp]
        meta = meta_ref[pl.ds(ni, 1), :]  # (1,4): idx|cnt|axis|pad
        idx = meta[0, 0]
        cnt = meta[0, 1]
        axis = meta[0, 2]

        def visit_leaf():
            # leaf box was tested at the parent; just intersect
            leaf_tris(idx, cnt)
            return sp

        def visit_interior():
            best = dst_ref[...]
            t0 = slab(idx)
            t1 = slab(idx + 1)
            hit0 = jnp.any(t0 < best)
            hit1 = jnp.any(t1 < best)
            # left child holds centroids below the split plane
            # (vk_engine.cpp:1244): near = left iff majority dir >= 0
            neg = jnp.where(
                axis == 0, neg_x, jnp.where(axis == 1, neg_y, neg_z)
            )
            near = jnp.where(neg, idx + 1, idx)
            far = jnp.where(neg, idx, idx + 1)
            hit_near = jnp.where(neg, hit1, hit0)
            hit_far = jnp.where(neg, hit0, hit1)

            def push(s, val, do):
                @pl.when(do)
                def _():
                    stack_ref[s] = val

                return jnp.where(do, s + 1, s)

            # push far first so near pops first
            sp2 = push(sp, far, hit_far)
            return push(sp2, near, hit_near)

        return jax.lax.cond(cnt > 0, visit_leaf, visit_interior)

    # root: test its box once (mirrors the per-parent testing invariant)
    t_root = slab(root_ref[0, 0])
    root_hit = jnp.any(t_root < dst_ref[...])
    sp0 = jnp.where(root_hit, 1, 0).astype(jnp.int32)
    jax.lax.while_loop(cond, body, sp0)


@functools.partial(
    jax.jit, static_argnames=("max_leaf", "interpret", "packet_size")
)
def packet_traverse(
    nodes: jnp.ndarray,  # (B,8) f32 packed
    meta: jnp.ndarray,  # (B,4) i32 idx|cnt|axis|pad
    tris: jnp.ndarray,  # (T,16) f32 packed
    origin: jnp.ndarray,  # (N,3)
    direction: jnp.ndarray,  # (N,3)
    tmax0: jnp.ndarray,  # (N,) initial best (use -BIG to disable a lane)
    root: int,
    max_leaf: int = 4,
    interpret: bool = False,
    packet_size: int = None,
):
    """Packet-traverse N rays -> (dst, prim, u, v, front) each (N,).

    N is padded to a PACKET multiple internally.
    """
    p_size = packet_size or PACKET
    assert p_size % 1024 == 0, "narrow kernel: packet_size must be 1024k"
    sub = 8 * (p_size // 1024)
    n = origin.shape[0]
    g = -(-n // p_size)
    pad = g * p_size - n

    def prep(x):
        x = jnp.pad(x, ((0, pad),))
        return x.reshape(g * sub, _LANE)

    ox, oy, oz = (prep(origin[:, i]) for i in range(3))
    dx, dy, dz = (prep(direction[:, i]) for i in range(3))
    # padded lanes: direction 0 -> inf inv_dir; disable via tmax -BIG
    tmax = jnp.pad(tmax0, ((0, pad),), constant_values=-float(BIG)).reshape(
        g * sub, _LANE
    )
    root_arr = jnp.full((1, 1), root, jnp.int32)

    row_spec = pl.BlockSpec(
        (sub, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((g * sub, _LANE), jnp.float32),  # dst
        jax.ShapeDtypeStruct((g * sub, _LANE), jnp.int32),  # prim
        jax.ShapeDtypeStruct((g * sub, _LANE), jnp.float32),  # u
        jax.ShapeDtypeStruct((g * sub, _LANE), jnp.float32),  # v
        jax.ShapeDtypeStruct((g * sub, _LANE), jnp.float32),  # front
    ]
    kernel = functools.partial(_packet_kernel, max_leaf=max_leaf)
    dst, prim, u, v, front = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            full(nodes),
            full(meta),
            full(tris),
            row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
            row_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[row_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(nodes, meta, tris, ox, oy, oz, dx, dy, dz, tmax, root_arr)

    flat = lambda x: x.reshape(-1)[:n]
    return (
        flat(dst),
        flat(prim),
        flat(u),
        flat(v),
        flat(front) > 0.5,
    )


# ---------------------------------------------------------------------------
# Wide (BVH8) variant: one visit tests 8 children, amortizing the scalar
# unit (pop, meta reads, mask transfer, pushes) over 8 tree edges.
#
# Node layout is ONE native (1,128) f32 row per wide node — Mosaic pads the
# minor dim of VMEM arrays to 128 lanes, so narrow (B,8)/(B,4) tables cost
# 16-32x their size in VMEM (measured: a 260k-tri scene's tables demanded
# 237MB of 128MB VMEM).  Per child c: lanes 8c..8c+5 = min3|max3, lane
# 8c+6 = traversal code *as an f32 value* (exact for |code| < 2^24; scalar
# bitcasts are dicey in Mosaic).  Lane 7 = child-sort axis.  Codes: >= 0
# -> target wide node id; < 0 -> leaf, slot = -code-1 into the (L,128)
# leaf-row table (8 NaN-padded tri records per row, shared with the
# HBM-DMA variant).  Empty slots carry NaN boxes -> never hit, never pushed.
# ---------------------------------------------------------------------------


def _packet8_kernel(
    nodes_ref,  # (W,128) f32 packed wide nodes (see layout above)
    meta_ref,  # SMEM (W*12,) i32: codes[0:8] + axis[8] + troot[9] + pad
    tris_ref,  # (L,128) f32 leaf rows, VMEM or HBM
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    entry_ref,  # (1,1) i32 SMEM entry code; deep mode: flat (G*E,) lists
    dst_ref, prim_ref,
    *rest,  # [emit slots + cnt + ovf when top_k,] [vis refs,] stack, scratch
    tris_in_hbm: bool = False,
    nodes_in_hbm: bool = False,
    max_recs: int = 8,
    anyhit: bool = False,
    use_meta: bool = True,
    with_visits: bool = False,
    top_k: int = 0,
    deep_e: int = 0,
    multi_pop: int = 1,
    mask_mode: str = "sum4",
    emit_leaves: bool = False,
):
    # Order-free anyhit pushes (round 5): the occluded set is traversal-
    # order-invariant, so the near-first machinery is optional for
    # occlusion walks.  On THIS kernel the near-first order measured 4%
    # FASTER (34.3 vs 32.9 Mrays/s, binned shadow rays, sponza_proxy —
    # tools/measure_anyhit.py): the saved scalar selects don't cover the
    # extra visits from worse early-exit order.  Default stays near-first;
    # RT_ANYHIT_ORDERFREE_PACKET=1 is the A/B escape.  (The group kernel
    # defaults the other way: order-free is +40% there.)
    anyhit_of = anyhit and os.environ.get("RT_ANYHIT_ORDERFREE_PACKET") == "1"
    rest = list(rest)
    if top_k:
        # Two-phase TOP mode: children that are treelet roots (meta slot 9)
        # are not descended; instead each lane records up to ``top_k``
        # entry codes (its deep-phase work list) + an overflow flag.
        emit_refs = rest[:top_k]
        cnt_ref, ovf_ref = rest[top_k], rest[top_k + 1]
        rest = rest[top_k + 2:]
    if with_visits:
        vis_int_ref, vis_leaf_ref = rest[:2]
        rest = rest[2:]
    stack_ref, *scratch = rest
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    # Exactly-zero direction components make 1/d infinite and the slab
    # arithmetic NaN (0*inf), silently failing every box comparison — the
    # lane then traverses NOTHING and only hits what packet-mates happen
    # to visit (composition-dependent!).  A tiny epsilon keeps the slab
    # math finite with the correct signs (axis-aligned camera rays, e.g.
    # the exact center column, are common).
    dx = jnp.where(dx == 0.0, 1e-20, dx)
    dy = jnp.where(dy == 0.0, 1e-20, dy)
    dz = jnp.where(dz == 0.0, 1e-20, dz)
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz
    # Hoisted origin*inv products: each child plane test becomes one
    # scalar*vector FMA (box*inv - oinv) instead of a vector sub + mul.
    oxi = ox * inv_x
    oyi = oy * inv_y
    ozi = oz * inv_z

    dst_ref[...] = tmax_ref[...]
    prim_ref[...] = jnp.full_like(prim_ref[...], -1)
    if top_k:
        for k in range(top_k):
            emit_refs[k][...] = jnp.full_like(emit_refs[k][...], -1)
        cnt_ref[...] = jnp.zeros_like(cnt_ref[...])
        ovf_ref[...] = jnp.zeros_like(ovf_ref[...])

    neg_x = jnp.sum(jnp.where(dx < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dx.size)
    neg_y = jnp.sum(jnp.where(dy < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dy.size)
    neg_z = jnp.sum(jnp.where(dz < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dz.size)

    def child_hit(row, c, best):
        """Per-lane 'wants child slot c' mask (slab test vs current best).

        Returns the mask directly instead of an entry-distance vector:
        ``max(tmin,0) < best`` is equivalent to ``tmin < best`` whenever the
        slab overlaps (tmax > 0 implies a hit needs best > 0 to matter), so
        the clamp+select of the distance form is dead work."""
        t1x = row[0, 8 * c + 0] * inv_x - oxi
        t2x = row[0, 8 * c + 3] * inv_x - oxi
        t1y = row[0, 8 * c + 1] * inv_y - oyi
        t2y = row[0, 8 * c + 4] * inv_y - oyi
        t1z = row[0, 8 * c + 2] * inv_z - ozi
        t2z = row[0, 8 * c + 5] * inv_z - ozi
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        return (tmax >= tmin) & (tmax > 0) & (tmin < best)

    def _tri_t(trow):
        """Dense Moller-Trumbore of one packed 16-float record vs all lanes.

        Returns the accepted-hit distance per lane, BIG on miss.  NaN
        records (leaf-row padding) fail every comparison -> no hit.  u, v
        and the facing bit are NOT produced here: the kernel only tracks
        (dst, prim), and the caller reconstructs barycentrics/facing for
        the single winning record per ray outside the kernel (one 16-float
        gather + one MT evaluation per ray) — dropping 3 masked VMEM
        read-modify-writes per record from the hot leaf loop."""
        rx = ox - trow[0, 0]
        ry = oy - trow[0, 1]
        rz = oz - trow[0, 2]
        qx = ry * dz - rz * dy
        qy = rz * dx - rx * dz
        qz = rx * dy - ry * dx
        nx, ny, nz = trow[0, 9], trow[0, 10], trow[0, 11]
        d0 = -(dx * nx + dy * ny + dz * nz)
        dinv = 1.0 / d0
        t = (rx * nx + ry * ny + rz * nz) * dinv
        u = (trow[0, 6] * qx + trow[0, 7] * qy + trow[0, 8] * qz) * dinv
        v = -(trow[0, 3] * qx + trow[0, 4] * qy + trow[0, 5] * qz) * dinv
        w = 1.0 - u - v
        front = d0 >= 1e-8
        ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
        ok = ok & ~((~front) & (trow[0, 12] > 0.5))
        return jnp.where(ok, t, BIG)

    # Merged-leaf scenes pack 16 records across TWO consecutive rows per
    # slot (builder merge_wide_leaves); record ids stay slot*8+k because
    # k>=8 lands in row slot+1 at k-8 with the same padded id.
    leaf_rows_per_slot = 2 if max_recs > 8 else 1

    def _test_block(block, slot):
        # Static unroll over the slot's records: NaN padding records cost
        # real VPU work, so scenes built with max_leaf<=4 unroll only 4
        # (their rows never hold more).  A runtime cnt branch was measured
        # 12% SLOWER than the wasted NaN tests (lax.cond per leaf visit).
        # The records fold through a register min-tree (strict < so the
        # EARLIEST record wins exact ties, matching the sequential-update
        # semantics of the gather-walk oracle) into ONE dst/prim update.
        if anyhit:
            # Occlusion-only: no winner to pick, so skip the min-tree and
            # record-id bookkeeping entirely — OR the per-record "hit
            # inside the lane's clip distance" masks (t >= clip and NaN
            # padding both compare False) and mark occluded lanes -BIG,
            # which also prunes them out of every subsequent node vote:
            # lanes drop out at their FIRST hit instead of walking to the
            # closest one.
            clip = dst_ref[...]
            occ = None
            for k in range(max_recs):
                trow = block[
                    k // 8 : k // 8 + 1, 16 * (k % 8) : 16 * (k % 8 + 1)
                ]
                h = _tri_t(trow) < clip
                occ = h if occ is None else (occ | h)
            dst_ref[...] = jnp.where(occ, -BIG, clip)
            return
        cands = []
        for k in range(max_recs):
            trow = block[k // 8 : k // 8 + 1, 16 * (k % 8) : 16 * (k % 8 + 1)]
            cands.append((_tri_t(trow), slot * 8 + k))  # padded id
        while len(cands) > 1:
            nxt = []
            for i in range(0, len(cands) - 1, 2):
                ta, ka = cands[i]
                tb, kb = cands[i + 1]
                take_b = tb < ta
                nxt.append(
                    (jnp.minimum(ta, tb), jnp.where(take_b, kb, ka))
                )
            if len(cands) % 2:
                nxt.append(cands[-1])
            cands = nxt
        tbest, kbest = cands[0]
        closer = tbest < dst_ref[...]
        dst_ref[...] = jnp.where(closer, tbest, dst_ref[...])
        prim_ref[...] = jnp.where(closer, kbest, prim_ref[...])

    sc = list(scratch)
    tri_bufs = sc[:2] if tris_in_hbm else []
    node_bufs = sc[2:] if tris_in_hbm else sc

    if tris_in_hbm:
        def leaf_tris(slot):
            # DMA the slot's aligned row(s) of padded tri records, then
            # statically unroll over them.
            tri_buf, dma_sem = tri_bufs
            cp = pltpu.make_async_copy(
                tris_ref.at[pl.ds(slot, leaf_rows_per_slot), :],
                tri_buf, dma_sem,
            )
            cp.start()
            cp.wait()
            _test_block(tri_buf[...], slot)
    else:
        def leaf_tris(slot):
            _test_block(tris_ref[pl.ds(slot, leaf_rows_per_slot), :], slot)

    if nodes_in_hbm:
        def node_row(code):
            # Node table beyond the VMEM budget: DMA the visited wide-node
            # row on demand (512B).  Slower than resident nodes but gives
            # arbitrarily large scenes a working TPU path (the pure-XLA
            # gather walk is not TPU-safe, BENCH_NOTES r1 finding 4).
            node_buf, node_sem = node_bufs
            cp = pltpu.make_async_copy(
                nodes_ref.at[pl.ds(code, 1), :], node_buf, node_sem
            )
            cp.start()
            cp.wait()
            return node_buf[...]
    else:
        def node_row(code):
            return nodes_ref[pl.ds(code, 1), :]

    if deep_e:
        # Deep phase: per-packet entry list (sorted unique treelet roots of
        # this packet's lanes; -1 padding), read from the flat SMEM table
        # at this packet's program id (SMEM blocks can't be grid-tiled).
        # Entries are pushed untested — their child tests gate all real
        # work, and phase-A bests in tmax prune immediately.
        base = pl.program_id(0) * deep_e
        sp_init = jnp.int32(0)
        for e in range(deep_e):
            val = entry_ref[base + e]
            ok = val >= 0

            @pl.when(ok)
            def _(val=val, sp_init=sp_init):
                stack_ref[sp_init] = val

            sp_init = sp_init + jnp.where(ok, 1, 0)
    else:
        stack_ref[0] = entry_ref[0, 0]
        sp_init = None

    def cond(state):
        return state[0] > 0

    def visit_leaf(code, s):
        if os.environ.get("RT_ABLATE", "") == "skeleton_nl":
            return s  # measurement-only: leaf visit = pop + cond
        # leaf code payload: -(slot*16 + cnt) - 1
        leaf_tris((-code - 1) // 16)
        return s

    def push_masked(code, sp, mask):
        """Masked near-first child pushes from the SMEM meta mirror
        (the tail of the classic interior visit, shared with the
        fused-mask body which computes ``mask`` for several popped
        nodes at once)."""
        codes8 = [meta_ref[code * 12 + c] for c in range(8)]
        if anyhit_of:
            # Occlusion queries are traversal-order-independent (a lane's
            # occluded bit = "exists ANY hit inside clip"; per-lane ``best``
            # never shrinks, so pruning doesn't depend on visit order) —
            # skip the near-first machinery: no sort-axis SMEM load, no
            # majority-sign select, no per-child slot/value selects.  The
            # scalar push tail is the packet walk's serializing resource
            # (BENCH_NOTES r5 step decomposition), so order freedom is
            # pure win here.
            s = sp
            for c in range(8):
                bit = (mask >> c) & 1

                @pl.when(bit == 1)
                def _(s=s, val=codes8[c]):
                    stack_ref[s] = val

                s = s + bit
            return s
        axis = meta_ref[code * 12 + 8]
        neg = jnp.where(
            axis == 0, neg_x, jnp.where(axis == 1, neg_y, neg_z)
        )
        s = sp
        for c in range(8):
            slot = jnp.where(neg, c, 7 - c)
            bit = (mask >> slot) & 1
            val = jnp.where(neg, codes8[c], codes8[7 - c])

            @pl.when(bit == 1)
            def _(s=s, val=val):
                stack_ref[s] = val

            s = s + bit
        return s

    def body(state):
        sp, ni, nl = state
        # Pop up to ``multi_pop`` stack entries per iteration and visit
        # them back-to-back.  The loop is latency-bound per visit (the
        # cross-lane any-hit reductions + the scalar pop/push chain), so
        # issuing several independent visits per iteration lets their
        # long-latency vector work overlap.  Traversal ORDER changes
        # (visit j+1 is the pre-popped sibling, not visit j's near
        # child), which only affects pruning efficiency, never
        # correctness; ``best`` is snapshotted once per iteration, which
        # is conservative pruning for the later visits.
        n_pop = (
            jnp.minimum(sp, jnp.int32(multi_pop))
            if multi_pop > 1
            else jnp.int32(1)
        )
        codes = [
            stack_ref[jnp.maximum(sp - 1 - j, 0)] for j in range(multi_pop)
        ]
        s = sp - n_pop
        best = dst_ref[...]

        def compute_mask(row, best):
            """Per-child 'any live lane wants child c' -> 8-bit scalar mask.

            The vector->scalar transfer here is the dominant interior-visit
            cost (BENCH_NOTES r3 ablation: the slab math + extracts are
            ~150ns, the mask sums ~590ns under 'sum4') — the expensive part
            is the cross-LANE reduction shuffle tree inside each jnp.sum,
            so the schemes differ in how many lane reductions they issue:

            * sum4: 4 sums, two children per i32 word (15-bit count
              fields; lane count <= 8192 cannot carry).
            * sum2: OR-pack all 8 hit bits per lane, fold sublanes by
              static-slice halving (cheap sublane work), then spread the
              folded 4+4 bits into two words of 4x8-bit fields (per-lane
              field value 0/1, <=128 lanes so counts fit) -> 2 sums.
            * rollor: fold lanes with explicit log2 pltpu.roll+OR then one
              sum — measured SLOWER than sum4 (the rolls pay the same
              shuffle cost the reductions do, ~70ns each).
            * mxu: offload the lane reduction to the MATRIX unit — unpack
              the folded (1,128) bit row into 8 child rows (8,128), one
              (8,128)@(128,1) f32 matvec (exact: 0/1 values, counts<=128)
              gives per-child lane counts, weight the >0 bits by 2^c and
              sublane-fold -> the whole 8-bit mask arrives in ONE scalar
              read.  Leaves the VPU shuffle network out of the visit's
              critical path entirely.
            """
            hvecs = []
            if mask_mode in ("sum2", "rollor", "mxu"):
                packed = None
                for c in range(8):
                    hv = child_hit(row, c, best)
                    if top_k:
                        hvecs.append(hv)
                    b = jnp.where(hv, jnp.int32(1 << c), 0)
                    packed = b if packed is None else (packed | b)
                rows = packed.shape[0]
                while rows > 1:
                    packed = packed[: rows // 2] | packed[rows // 2 : rows]
                    rows //= 2
                if mask_mode == "rollor":
                    for sh in (1, 2, 4, 8, 16, 32, 64):
                        packed = packed | pltpu.roll(packed, sh, axis=1)
                    return jnp.sum(packed) >> 7, hvecs  # exact: mask<=255
                if mask_mode == "mxu":
                    rows8 = jnp.concatenate(
                        [
                            ((packed >> c) & 1).astype(jnp.float32)
                            for c in range(8)
                        ],
                        axis=0,
                    )  # (8,128): row c = child c's per-lane hit bit
                    counts = jax.lax.dot_general(
                        rows8,
                        jnp.ones((128, 1), jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (8,1) exact lane counts (0/1 inputs, <=128)
                    # iota must be integer-typed for Mosaic (tpu.iota
                    # verification rejects float results on hardware)
                    w8 = jnp.exp2(
                        jax.lax.broadcasted_iota(
                            jnp.int32, (8, 1), 0
                        ).astype(jnp.float32)
                    )
                    bits = jnp.where(counts > 0, w8, 0.0)
                    r = 8
                    while r > 1:
                        bits = bits[: r // 2] + bits[r // 2 : r]
                        r //= 2
                    return bits[0, 0].astype(jnp.int32), hvecs
                spread = lambda m: (
                    (m & 1) | ((m & 2) << 7) | ((m & 4) << 14)
                    | ((m & 8) << 21)
                )
                s0 = jnp.sum(spread(packed & 0xF))
                s1 = jnp.sum(spread((packed >> 4) & 0xF))
                mask = jnp.int32(0)
                for k in range(4):
                    mask = mask | (
                        jnp.where(
                            ((s0 >> (8 * k)) & 0xFF) > 0, jnp.int32(1), 0
                        )
                        << k
                    )
                    mask = mask | (
                        jnp.where(
                            ((s1 >> (8 * k)) & 0xFF) > 0, jnp.int32(1), 0
                        )
                        << (4 + k)
                    )
                return mask, hvecs
            mask = jnp.int32(0)
            for k in range(4):
                hv_a = child_hit(row, 2 * k, best)
                hv_b = child_hit(row, 2 * k + 1, best)
                if top_k:
                    hvecs += [hv_a, hv_b]
                h_a = jnp.where(hv_a, jnp.int32(1), 0)
                h_b = jnp.where(hv_b, jnp.int32(1 << 15), 0)
                word = jnp.sum(h_a + h_b)
                any_a = jnp.where((word & 0x7FFF) > 0, jnp.int32(1), 0)
                any_b = jnp.where((word >> 15) > 0, jnp.int32(1), 0)
                mask = mask | (any_a << (2 * k)) | (any_b << (2 * k + 1))
            return mask, hvecs

        def visit_interior(code, sp, best):
            row = node_row(code)  # (1,128): whole wide node
            _abl = os.environ.get("RT_ABLATE", "")
            if _abl:
                # measurement-only variants (tools/measure_visit_cost):
                # garbage traversal, but per-visit cost stays meaningful.
                valid = jnp.int32(0)
                acodes = [meta_ref[code * 12 + c] for c in range(8)]
                for c in range(8):
                    valid = valid | (
                        jnp.where(acodes[c] != 0, jnp.int32(1), 0) << c
                    )
                if _abl == "skeleton_bp":
                    # skeleton with BRANCHLESS pushes: unconditional SMEM
                    # stores at prefix-sum offsets (junk beyond sp ignored)
                    axis = meta_ref[code * 12 + 8]
                    neg = jnp.where(
                        axis == 0, neg_x, jnp.where(axis == 1, neg_y, neg_z)
                    )
                    mask = valid
                    s = sp
                    for c in range(8):
                        slot = jnp.where(neg, c, 7 - c)
                        bit = (mask >> slot) & 1
                        val = jnp.where(neg, acodes[c], acodes[7 - c])
                        stack_ref[s] = val
                        s = s + bit
                    return s
                if _abl in ("skeleton", "skeleton_nl"):
                    # no vector work at all: scalar pop/meta/push floor
                    mask = valid
                elif _abl == "mask_real_ff":
                    # REAL mask computation (whatever mask_mode says), but
                    # the result is OR'd with `valid` -> descend-all walk,
                    # bit-identical visits to skeleton/mask_ff.  The time
                    # delta vs mask_ff is the pure sync cost per visit.
                    mask, _ = compute_mask(row, best)
                    mask = mask | valid
                elif _abl == "mask_ff":
                    # slab math + extracts, no reductions
                    acc = None
                    for c in range(8):
                        hv = child_hit(row, c, best)
                        b = jnp.where(hv, jnp.int32(1 << c), 0)
                        acc = b if acc is None else (acc | b)
                    # fold to (1,128) so the value is "used" w/o reduction
                    r = acc.shape[0]
                    while r > 1:
                        acc = acc[: r // 2] | acc[r // 2 : r]
                        r //= 2
                    dst_ref[0:1, :] = dst_ref[0:1, :] + 0.0 * acc.astype(
                        jnp.float32
                    )
                    mask = valid
                elif _abl == "const_bounds":
                    # real sums, no row extracts: bounds faked from `code`
                    cf = code.astype(jnp.float32)
                    mask = jnp.int32(0)
                    for k in range(4):
                        def fake_hit(c):
                            t1x = (cf * 0.001 + c) * inv_x - oxi
                            t2x = (cf * 0.002 + c) * inv_x - oxi
                            t1y = (cf * 0.001 + c) * inv_y - oyi
                            t2y = (cf * 0.002 + c) * inv_y - oyi
                            t1z = (cf * 0.001 + c) * inv_z - ozi
                            t2z = (cf * 0.002 + c) * inv_z - ozi
                            tmin = jnp.maximum(
                                jnp.maximum(
                                    jnp.minimum(t1x, t2x),
                                    jnp.minimum(t1y, t2y),
                                ),
                                jnp.minimum(t1z, t2z),
                            )
                            tmax = jnp.minimum(
                                jnp.minimum(
                                    jnp.maximum(t1x, t2x),
                                    jnp.maximum(t1y, t2y),
                                ),
                                jnp.maximum(t1z, t2z),
                            )
                            return (
                                (tmax >= tmin) & (tmax > 0) & (tmin < best)
                            )
                        h_a = jnp.where(fake_hit(2 * k), jnp.int32(1), 0)
                        h_b = jnp.where(
                            fake_hit(2 * k + 1), jnp.int32(1 << 15), 0
                        )
                        word = jnp.sum(h_a + h_b)
                        any_a = jnp.where(
                            (word & 0x7FFF) > 0, jnp.int32(1), 0
                        )
                        any_b = jnp.where((word >> 15) > 0, jnp.int32(1), 0)
                        mask = (
                            mask | (any_a << (2 * k)) | (any_b << (2 * k + 1))
                        )
                    mask = mask & valid
                else:
                    raise ValueError(_abl)
                axis = meta_ref[code * 12 + 8]
                neg = jnp.where(
                    axis == 0, neg_x, jnp.where(axis == 1, neg_y, neg_z)
                )
                s = sp
                for c in range(8):
                    slot = jnp.where(neg, c, 7 - c)
                    bit = (mask >> slot) & 1
                    val = jnp.where(neg, acodes[c], acodes[7 - c])

                    @pl.when(bit == 1)
                    def _(s=s, val=val):
                        stack_ref[s] = val

                    s = s + bit
                return s
            mask, hvecs = compute_mask(row, best)
            if use_meta:
                # codes/axis as scalar SMEM loads — measured ~5% faster
                # than the 8 strided vector extracts per visit
                axis = None if anyhit_of else meta_ref[code * 12 + 8]
                codes = [meta_ref[code * 12 + c] for c in range(8)]
            else:
                axis = row[0, 7].astype(jnp.int32)
                # child traversal codes, eagerly extracted (f32-held ints)
                # — extracting inside the push branch measured ~12% slower
                codes = [row[0, 8 * c + 6].astype(jnp.int32) for c in range(8)]
            if top_k:
                # Emit-not-descend children, recorded per lane into the
                # lane's first free slot; slots full -> overflow flag (the
                # lane falls back to a full root walk outside).  Two modes:
                # * treelet roots (two-phase deep-entry lists): interior
                #   children whose meta troot flag is set
                # * cluster leaves (emit_leaves, MXU cluster pipeline):
                #   leaf children — the emitted value is the leaf payload's
                #   slot field, i.e. the cluster id
                for c in range(8):
                    if emit_leaves:
                        is_leaf_c = codes[c] < 0
                        is_emit = (((mask >> c) & 1) == 1) & is_leaf_c
                        emit_val = (-codes[c] - 1) // 16
                        clear = jnp.where(is_leaf_c, jnp.int32(1), 0)
                    else:
                        flag = meta_ref[jnp.maximum(codes[c], 0) * 12 + 9]
                        is_emit = (((mask >> c) & 1) == 1) & (flag == 1) & (
                            codes[c] > 0
                        )
                        emit_val = codes[c]
                        clear = jnp.where(
                            (flag == 1) & (codes[c] > 0), jnp.int32(1), 0
                        )

                    @pl.when(is_emit)
                    def _(c=c, code_c=emit_val):
                        h = hvecs[c]
                        cnt = cnt_ref[...]
                        for k in range(top_k):
                            emit_refs[k][...] = jnp.where(
                                h & (cnt == k), code_c, emit_refs[k][...]
                            )
                        ovf_ref[...] = jnp.where(
                            h & (cnt >= top_k), 1, ovf_ref[...]
                        )
                        cnt_ref[...] = cnt + jnp.where(h, 1, 0)

                    mask = mask & ~(clear << c)
            if anyhit_of:
                # Order-free pushes (see push_masked): the occluded set is
                # traversal-order-invariant, so drop the sort-axis load and
                # the per-child slot/value selects from the scalar push
                # tail.  Order DOES change visit counts (near-first finds
                # occluders sooner) — hardware A/B in BENCH_NOTES r5
                # decides the default.
                s = sp
                for c in range(8):
                    bit = (mask >> c) & 1

                    @pl.when(bit == 1)
                    def _(s=s, val=codes[c]):
                        stack_ref[s] = val

                    s = s + bit
                return s
            neg = jnp.where(
                axis == 0, neg_x, jnp.where(axis == 1, neg_y, neg_z)
            )
            s = sp
            # slots are sorted ascending along axis: push far-to-near so the
            # near child pops first (iteration direction from packet sign)
            for c in range(8):
                # +dir: far = high slot, push it first
                slot = jnp.where(neg, c, 7 - c)
                bit = (mask >> slot) & 1
                val = jnp.where(neg, codes[c], codes[7 - c])

                @pl.when(bit == 1)
                def _(s=s, val=val):
                    stack_ref[s] = val

                s = s + bit
            return s

        for j in range(multi_pop):
            code = codes[j]

            def do_visit(sv, code=code):
                return jax.lax.cond(
                    code < 0,
                    lambda: visit_leaf(code, sv),
                    lambda: visit_interior(code, sv, best),
                )

            if j == 0:
                s = do_visit(s)  # while cond guarantees sp > 0
                valid = jnp.int32(1)
            else:
                taken = j < n_pop
                s = jax.lax.cond(
                    taken, lambda s=s, code=code: do_visit(s), lambda s=s: s
                )
                valid = jnp.where(taken, jnp.int32(1), jnp.int32(0))
            if with_visits:
                is_leaf = jnp.where(code < 0, valid, jnp.int32(0))
                ni = ni + valid - is_leaf
                nl = nl + is_leaf
        return (s, ni, nl)

    fused_k = (
        int(mask_mode[5:]) if str(mask_mode).startswith("fused") else 0
    )
    if fused_k > 1:
        # loop-invariant operands of the fused-mask contraction, built
        # OUTSIDE the while body so they lower once (an in-body iota
        # rebuild of the (128K,128) selector would cost ~300 ns/visit —
        # the very sync budget the fusion saves)
        _fblk = (
            jax.lax.broadcasted_iota(
                jnp.int32, (128 * fused_k, 128), 0
            ) // 128
            == jax.lax.broadcasted_iota(
                jnp.int32, (128 * fused_k, 128), 1
            )
        ).astype(jnp.float32)
        _fw8 = jnp.exp2(
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(
                jnp.float32
            )
        )

    def body_fused(state):
        """Pop up to K nodes and resolve ALL their descend masks with ONE
        MXU matvec.

        The r3/r4 decomposition says the interior visit is dominated by
        the vector->scalar mask sync (~290 ns under sum2/mxu vs ~150 ns
        of slab math), and chaining visits through lax.cond (multi_pop)
        cannot overlap it — mp=2 measured 3% SLOWER on the official
        bench.  Here the K popped nodes' slab tests run straight-line,
        their per-lane hit bits fold to K (1,128) rows, and a single
        (8,128K) @ (128K,128) block-diagonal contraction yields every
        node's per-child lane counts at once — one sync for K visits.
        Garbage masks computed for popped LEAF codes (clamped to node 0)
        are never read: the per-node dispatch still routes leaves to the
        VPU Moller-Trumbore path.  Traversal ORDER changes exactly like
        multi_pop (pre-popped siblings), which affects pruning only;
        ``best`` is snapshotted once per iteration (conservative)."""
        sp, ni, nl = state
        kf = fused_k
        n_pop = jnp.minimum(sp, jnp.int32(kf))
        codes = [
            stack_ref[jnp.maximum(sp - 1 - j, 0)] for j in range(kf)
        ]
        s = sp - n_pop
        best = dst_ref[...]
        packs = []
        for j in range(kf):
            row = node_row(jnp.maximum(codes[j], 0))
            packed = None
            for c in range(8):
                hv = child_hit(row, c, best)
                b = jnp.where(hv, jnp.int32(1 << c), 0)
                packed = b if packed is None else (packed | b)
            rows = packed.shape[0]
            while rows > 1:
                packed = packed[: rows // 2] | packed[rows // 2 : rows]
                rows //= 2
            packs.append(packed)  # (1,128) i32: 8 hit bits per lane
        rows8 = jnp.concatenate(
            [
                jnp.concatenate(
                    [((p >> c) & 1).astype(jnp.float32) for c in range(8)],
                    axis=0,
                )
                for p in packs
            ],
            axis=1,
        )  # (8, 128*K): row c, block j = node j's child-c hit bits
        # block-diagonal selector: column j sums node j's 128 lanes only
        # (columns >= K never match and stay zero).  0/1 inputs are exact
        # in one default-precision MXU pass; counts <= 128 are exact in
        # the f32 accumulator.
        counts = jax.lax.dot_general(
            rows8, _fblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, 128): column j = node j's per-child lane counts
        bits = jnp.where(counts > 0, _fw8, 0.0)
        r = 8
        while r > 1:
            bits = bits[: r // 2] + bits[r // 2 : r]
            r //= 2  # (1,128): lane j holds node j's 8-bit descend mask
        for j in range(kf):
            code = codes[j]
            mask_j = bits[0, j].astype(jnp.int32)

            def do_visit(sv, code=code, mask_j=mask_j):
                return jax.lax.cond(
                    code < 0,
                    lambda: visit_leaf(code, sv),
                    lambda: push_masked(code, sv, mask_j),
                )

            if j == 0:
                s = do_visit(s)  # while cond guarantees sp > 0
                valid = jnp.int32(1)
            else:
                taken = jnp.int32(j) < n_pop
                s = jax.lax.cond(
                    taken,
                    lambda s=s, code=code, mask_j=mask_j: do_visit(s),
                    lambda s=s: s,
                )
                valid = jnp.where(taken, jnp.int32(1), jnp.int32(0))
            if with_visits:
                is_leaf = jnp.where(code < 0, valid, jnp.int32(0))
                ni = ni + valid - is_leaf
                nl = nl + is_leaf
        return (s, ni, nl)

    final = jax.lax.while_loop(
        cond, body_fused if fused_k > 1 else body,
        (
            sp_init if deep_e else jnp.int32(1),
            jnp.int32(0),
            jnp.int32(0),
        ),
    )
    if with_visits:
        vis_int_ref[...] = jnp.full_like(vis_int_ref[...], final[1])
        vis_leaf_ref[...] = jnp.full_like(vis_leaf_ref[...], final[2])


def _reconstruct_uvfront(leaf_rows, origin, direction, prim):
    """Barycentrics + facing for each ray's winning record, outside the
    kernel.

    The wide kernel tracks only (dst, prim) in the hot leaf loop (see
    ``_tri_t``); here the ONE winning 16-float record per ray is gathered
    (``leaf_rows`` is exactly 8 records x 16 floats per 128-lane row, so
    padded id ``p`` is row ``p`` of the (L*8,16) view) and Moller-Trumbore
    is re-evaluated with the same formulas and the same zero-direction
    epsilon, reproducing the values the in-kernel test accepted.
    """
    rec = leaf_rows.reshape(-1, 16)[jnp.maximum(prim, 0)]
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "packet_size", "tris_in_hbm", "nodes_in_hbm",
        "max_recs", "anyhit", "with_visits", "top_k", "deep_e",
        "multi_pop", "mask_mode", "need_uv", "emit_leaves",
    ),
)
def packet_traverse_wide(
    nodes: jnp.ndarray,  # (W,128) f32 packed wide nodes
    leaf_rows: jnp.ndarray,  # (L,128) f32: 8 NaN-padded tri records per row
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmax0: jnp.ndarray,
    entry_code=0,
    interpret: bool = False,
    packet_size: int = None,
    tris_in_hbm: bool = False,
    nodes_in_hbm: bool = False,
    max_recs: int = 8,
    anyhit: bool = False,
    with_visits: bool = False,
    top_k: int = 0,
    troot: jnp.ndarray = None,  # (W,) i32 treelet-root flags (top mode)
    deep_e: int = 0,
    entries: jnp.ndarray = None,  # (G,E) i32 per-packet entry lists
    multi_pop: int = 1,
    mask_mode: str = "sum2",
    need_uv: bool = True,
    emit_leaves: bool = False,
):
    """BVH8 packet traversal; same contract as :func:`packet_traverse`,
    except ``prim`` returns *padded leaf-slot ids* (slot*8 + k) — map them
    through the scene's ``leaf_map`` to global triangle ids.

    ``tris_in_hbm``: keep the leaf-row table in HBM and DMA rows on demand —
    for scenes whose triangles don't fit VMEM (nodes still must).

    ``with_visits`` (diagnostic): also return per-packet
    ``(interior_visits, leaf_visits)`` i32 arrays of shape (n_packets,) —
    the node-union size each packet actually walked.

    ``anyhit``: occlusion query — lanes terminate at their FIRST accepted
    hit inside ``tmax0`` instead of refining to the closest one (the TPU
    shape of a shadow ray, replacing the reference's full closest-hit NEE
    raycast, raytrace.comp:443).  ``dst`` returns -BIG for occluded lanes;
    ``prim``/``u``/``v``/``front`` are meaningless.

    Two-phase treelet modes (round 3):

    * ``top_k>0`` + ``troot``: TOP phase — treelet-root children are not
      descended; each lane emits up to ``top_k`` entry codes.  Returns
      ``(..., slots (N,top_k) i32 with -1 padding, overflow (N,) i32)``
      appended to the base tuple.  Requires the SMEM meta mirror (node
      table small enough), enforced by assertion.
    * ``top_k>0`` + ``emit_leaves``: cluster enumeration — LEAF children
      are never intersected; each lane emits the leaf payload's slot
      field (its cluster id) instead.  Same output contract as the
      treelet TOP phase; ``leaf_rows`` is never read.
    * ``deep_e>0`` + ``entries``: DEEP phase — packet ``g`` starts its walk
      from the (<=deep_e, -1-padded) entry list ``entries[g]`` instead of
      the root.
    """
    assert multi_pop == 1 or (top_k == 0 and deep_e == 0), (
        "multi_pop composes with the single-phase walk only"
    )
    p_size = packet_size or PACKET
    # One packet = sub (8,128)-subrows; any 128-multiple works (small
    # packets trade scalar-loop amortization for a smaller node union —
    # the per-visit sync cost is lane-reduction trees whose depth doesn't
    # depend on sublane count, so sub-1024 packets are worth measuring).
    assert p_size % 128 == 0, p_size
    sub = p_size // 128
    n = origin.shape[0]
    g = -(-n // p_size)
    pad = g * p_size - n
    # sum2/rollor sublane halving needs a power-of-two row count
    if mask_mode != "sum4" and not (sub > 0 and (sub & (sub - 1)) == 0):
        mask_mode = "sum4"

    def prep(x):
        x = jnp.pad(x, ((0, pad),))
        return x.reshape(g * sub, _LANE)

    ox, oy, oz = (prep(origin[:, i]) for i in range(3))
    dx, dy, dz = (prep(direction[:, i]) for i in range(3))
    tmax = jnp.pad(tmax0, ((0, pad),), constant_values=-float(BIG)).reshape(
        g * sub, _LANE
    )
    entry_arr = jnp.full((1, 1), entry_code, jnp.int32)

    # Scalar-side mirror of each node's child codes + sort axis, read as
    # SMEM scalar loads in the traversal loop instead of 8 strided vector
    # extracts per visit.  SMEM is 1MB/core; larger node tables keep the
    # vector-extract path.
    n_wide = nodes.shape[0]
    use_meta = n_wide * 12 * 4 <= 600_000
    assert not (top_k and not use_meta), "top mode needs the SMEM meta"
    if str(mask_mode).startswith("fused") and (
        nodes_in_hbm or top_k or deep_e or not use_meta
    ):
        # the fused-mask body needs VMEM-resident nodes (K straight-line
        # row reads), the SMEM meta mirror for its shared push tail, and
        # the plain single-phase walk; everything else falls back.
        mask_mode = "sum2"
    if use_meta:
        codes_f = nodes[:, 6:70:8]  # (W,8) f32-held ints (NaN on empties)
        tr_col = (
            troot.astype(nodes.dtype)[:, None]
            if (top_k and not emit_leaves)
            else jnp.zeros((n_wide, 1), nodes.dtype)
        )
        meta2 = jnp.concatenate(
            [codes_f, nodes[:, 7:8], tr_col,
             jnp.zeros((n_wide, 2), nodes.dtype)],
            axis=1,
        )
        meta = jnp.nan_to_num(meta2, nan=0.0).astype(jnp.int32).reshape(-1)
    else:
        meta = jnp.zeros((12,), jnp.int32)

    row_spec = pl.BlockSpec(
        (sub, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((g * sub, _LANE), jnp.float32),  # dst
        jax.ShapeDtypeStruct((g * sub, _LANE), jnp.int32),  # prim
    ]
    if top_k:
        out_shape += [
            jax.ShapeDtypeStruct((g * sub, _LANE), jnp.int32)
        ] * (top_k + 2)  # slots + cnt + ovf
    if with_visits:
        out_shape += [
            jax.ShapeDtypeStruct((g * sub, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((g * sub, _LANE), jnp.int32),
        ]
    kernel = functools.partial(
        _packet8_kernel,
        tris_in_hbm=tris_in_hbm,
        nodes_in_hbm=nodes_in_hbm,
        max_recs=max_recs,
        anyhit=anyhit,
        use_meta=use_meta,
        with_visits=with_visits,
        top_k=top_k,
        deep_e=deep_e,
        multi_pop=multi_pop,
        mask_mode=mask_mode,
        emit_leaves=emit_leaves,
    )
    # multi_pop / fused-mask visits push up to 8*K entries per iteration,
    # so the worst-case stack depth scales with K
    _k_iter = max(
        1,
        multi_pop,
        int(mask_mode[5:]) if str(mask_mode).startswith("fused") else 1,
    )
    scratch = [
        pltpu.SMEM((STACK_DEPTH * 8 * _k_iter,), jnp.int32)
    ]
    rows_per_slot = 2 if max_recs > 8 else 1
    if tris_in_hbm:
        tri_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        scratch += [
            pltpu.VMEM((rows_per_slot, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        tri_spec = full(leaf_rows)
    if nodes_in_hbm:
        node_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        scratch += [
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        node_spec = full(nodes)
    if deep_e:
        assert entries is not None and entries.shape == (g, deep_e), (
            entries.shape, g, deep_e
        )
        entry_arr = entries.astype(jnp.int32).reshape(-1)
        entry_spec = pl.BlockSpec(
            entry_arr.shape, lambda i: (0,), memory_space=pltpu.SMEM
        )
    else:
        entry_spec = pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        )
    outs = pl.pallas_call(
        kernel,
        # Distinct trace names so profile attribution (tools/profile_bench)
        # can split the NEE/shadow occlusion walk from closest-hit packet
        # phases (round-5 VERDICT item 2: the r4 27% "anyhit" bucket
        # conflated both).
        name="packet8_anyhit" if anyhit else "packet8_wide",
        grid=(g,),
        in_specs=[
            node_spec,
            pl.BlockSpec(meta.shape, lambda i: (0,), memory_space=pltpu.SMEM),
            tri_spec,
            row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
            row_spec,
            entry_spec,
        ],
        out_specs=[row_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(nodes, meta, leaf_rows, ox, oy, oz, dx, dy, dz, tmax, entry_arr)
    dst, prim = outs[:2]

    flat = lambda x: x.reshape(-1)[:n]
    dst_f, prim_f = flat(dst), flat(prim)
    if anyhit or not need_uv:
        # occlusion query: u/v/front are meaningless.  need_uv=False:
        # the caller (the integrator) re-derives them from the winning
        # record's fields inside its ONE fat shading-row gather
        # (wavefront._shade_fetch), so the extra (N,16) leaf-record
        # gather here would be pure overhead (~9% of the official bench).
        zero = jnp.zeros_like(dst_f)
        u_f, v_f, front_f = zero, zero, jnp.zeros_like(prim_f >= 1)
    else:
        u_f, v_f, front_f = _reconstruct_uvfront(
            leaf_rows, origin, direction, prim_f
        )
    result = (dst_f, prim_f, u_f, v_f, front_f)
    k = 2
    if top_k:
        slots = jnp.stack(
            [flat(outs[k + j]) for j in range(top_k)], axis=1
        )
        ovf = flat(outs[k + top_k + 1])
        result = result + (slots, ovf)
        k += top_k + 2
    if with_visits:
        per_packet = lambda x: x.reshape(g, -1)[:, 0]
        return result + (per_packet(outs[k]), per_packet(outs[k + 1]))
    return result
