"""Multi-stack lane-group BVH8 traversal (Pallas TPU).

The packet kernel (kernels/packet.py) amortizes ONE scalar traversal stack
over the whole packet: every node visit slab-tests all lanes, so a packet
descends the UNION of its lanes' want-sets.  On binned bounce rays the
union is ~0.43 nodes/lane (tools/measure_union.py) while a single ray only
needs ~60 visits — mean lane utilization per visit is ~6%.  The GPU
reference gets ~100% from per-thread private stacks
(``shaders/raytrace.comp:300-349``), a shape the TPU cannot gather-walk
per lane (BENCH_NOTES r1 finding 4).

This kernel is the TPU-shaped middle ground: the packet's (SUB,128) lane
block is split into G independent *groups* of whole sublane rows, each
group walking its OWN traversal stack in SMEM.  Every loop step:

* pops the next node per group from a (parent, remaining-children-mask)
  PAIR stack — one scalar word per stack entry, one push per visit and
  one meta load per pop instead of up to eight of each (the naive
  child-push tail measured 1560 ns of a 1947 ns step at G=16,
  tools/measure_group_step.py),
* gathers each group's node OR leaf row from a unified (W+L,128) VMEM
  table by dynamic slice into a (SUB,128) plane (~5 ns),
* computes BOTH interpretations of the plane — the 8-child slab test and
  the 8-record Moller-Trumbore test — as dense (SUB,128) vector work
  (per-group constants enter as (SUB,1) column slices, lane-broadcast by
  the VPU; ~215 + ~130 ns),
* reduces per-group 9-bit {rev-flag, descend-mask} words with two
  lane-sum reductions, packs two groups per scalar word (~40 ns),
* pushes ONE pair per interior visit.

Near-first DFS order is preserved: the stored mask is pre-reversed when
the packet-majority ray sign along the node's sort axis is negative (the
flag bit remembers the slot mapping), so "lowest set bit" is always the
nearest remaining child.  One step retires G visits; steps per packet =
max over groups of the group's walk length (mean 251 vs 879 packet
visits on binned bounce rays at G=16, tools/measure_group.py).

Results are bit-identical to the packet kernel except on exact-t ties of
duplicated geometry, where a different visit order may report the other
duplicate's id (dst always matches; ~1.8% of lanes on the hardened
proxy's foliage).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 99999999.0
# Pair-stack depth per group: one (node, remaining-mask) word per tree
# level, builder max depth 64 (vk_engine.cpp:1215) + margin.  Slot 0 of
# each group's region is a permanent sentinel (load-bearing for
# dead-group pops), and entries live at [1..sp] with an unconditional
# push store at base+1+sp — so the usable depth budget is G_STACK - 2
# (= 94): at sp == G_STACK - 1 the push store would overwrite the NEXT
# group's slot-0 sentinel (or run past the scratch buffer for the last
# group).  Asserted against the builder's max depth below.
G_STACK = 96
_BUILDER_MAX_DEPTH = 64  # scene/builder.py depth cap (vk_engine.cpp:1215)
assert _BUILDER_MAX_DEPTH + 2 <= G_STACK - 2, "group stack depth budget"


def _fold_layout(groups, fields, field_shift):
    """Simulate the mask word fold (rows r -> r/2 with ``lo | hi << s``)
    down to max(groups//fields, 1) rows; returns {group: (row, shift)}."""
    layout = [[(g, 0)] for g in range(groups)]
    shift = field_shift
    r = groups
    while r > max(groups // fields, 1):
        hi = layout[r // 2 : r]
        layout = [
            layout[i] + [(grp, sh + shift) for (grp, sh) in hi[i]]
            for i in range(r // 2)
        ]
        r //= 2
        shift += field_shift
    out = {}
    for w, entries in enumerate(layout):
        for grp, sh in entries:
            out[grp] = (w, sh)
    return out


def _group_kernel(
    uni_ref,  # (W+L,128) f32 unified node+leaf rows (leaf: +slot/flag pads)
    meta_ref,  # SMEM (W*12,) i32 codes[0:8]+axis[8]+pad
    lut_ref,  # SMEM (512,) i32: (flag<<8|mask) -> next child slot
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    entry_ref,  # (1,1) i32 SMEM
    dst_ref, prim_ref,
    *rest,
    groups: int = 16,
    sub: int = 16,
    max_recs: int = 8,
    anyhit: bool = False,
    with_steps: bool = False,
    reg_top: bool = False,
):
    if with_steps:
        steps_ref = rest[0]
        rest = rest[1:]
    stack_ref, = rest
    group_sub = sub // groups
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    # zero-direction guard: see packet.py (slab NaN on exact zeros)
    dx = jnp.where(dx == 0.0, 1e-20, dx)
    dy = jnp.where(dy == 0.0, 1e-20, dy)
    dz = jnp.where(dz == 0.0, 1e-20, dz)
    inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
    oxi, oyi, ozi = ox * inv_x, oy * inv_y, oz * inv_z

    dst_ref[...] = tmax_ref[...]
    prim_ref[...] = jnp.full_like(prim_ref[...], -1)

    # packet-majority direction sign per axis (same pruning-order quality
    # as the packet kernel; bins carry the octant so packets are
    # direction-coherent)
    neg_x = jnp.sum(jnp.where(dx < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dx.size)
    neg_y = jnp.sum(jnp.where(dy < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dy.size)
    neg_z = jnp.sum(jnp.where(dz < 0, 1.0, 0.0)) * 2.0 > jnp.float32(dz.size)

    # Stack words: parent_row << 9 | rev_flag << 8 | remaining_mask8.
    # mask == 0 means "visit `parent` itself" (the root-entry encoding).
    # Slot 0 of each group's region is a PERMANENT 0-word sentinel: a dead
    # group (sp == 0) pops it, decodes to "visit node 0 directly"
    # (interior row -> leaf_flag 0 -> no dst write; pushes are
    # alive-masked), and its writeback rewrites 0 — so the pop side needs
    # neither a max(sp-1, 0) clamp nor an alive-select on the load.
    # Entries live at slots [1..sp]; top = base + sp.
    root = entry_ref[0, 0]
    if reg_top:
        # Register-top mode (r5, VERDICT item 3): the DFS top pair lives
        # in the while-loop carry, not SMEM.  Only slot 0's permanent
        # 0-word sentinel is initialized: it is both the dead-group pop
        # source AND the dead-group store target (a dead group's top is
        # the 0 word, whose mask/rem arithmetic makes the unconditional
        # push store rewrite slot 0 with 0).
        for g in range(groups):
            stack_ref[g * G_STACK] = jnp.int32(0)
    else:
        for g in range(groups):
            stack_ref[g * G_STACK] = jnp.int32(0)
            stack_ref[g * G_STACK + 1] = root << 9

    layout = _fold_layout(groups, fields=2, field_shift=16)
    nwords = max(groups // 2, 1)

    def cond(state):
        if reg_top:
            # group alive iff sp >= 0 (sp == -1 after the sentinel pop)
            alive = state[groups]
            for s in state[groups + 1 : 2 * groups]:
                alive = jnp.maximum(alive, s)
            return alive >= 0
        alive = state[0]
        for s in state[1:groups]:
            alive = jnp.maximum(alive, s)
        return alive > 0

    def body(state):
        if reg_top:
            words = list(state[:groups])
            sps = list(state[groups : 2 * groups])
            nsteps = state[2 * groups]
        else:
            sps = list(state[:groups])
            nsteps = state[groups]
        best = dst_ref[...]

        # ---- pop: extract this step's visit per group from the top pair.
        # Group g owns the STRIDED sublane rows {g, g+groups, ...} so the
        # mask fold's halving slices (rows i and i+r/2) always combine
        # rows of the SAME group.
        # Phase-by-phase across groups (not group-by-group): the scalar
        # core is in-order single-issue, so a group's dependent SMEM
        # chain (stack -> LUT -> meta) stalls ~6 cycles at each USE.
        # Issuing all G loads of a phase back-to-back hides each load's
        # latency under the other groups' loads.
        if reg_top:
            # The top word is already in a register: the LUT/meta chain
            # starts immediately, and the (possibly unused) pop load for
            # the NEXT top issues up front, its latency hidden under the
            # whole step.  alive = sp >= 0; dead groups carry the 0 word
            # (direct-visit of node 0: interior row -> no dst write,
            # pushes alive-masked).
            alives = [sps[g] >= 0 for g in range(groups)]
            nxts = [
                stack_ref[g * G_STACK + jnp.maximum(sps[g], 0)]
                for g in range(groups)
            ]
        else:
            tops, words, alives = [], [], []
            for g in range(groups):
                sp = sps[g]
                alives.append(sp > 0)
                tops.append(g * G_STACK + sp)
            for g in range(groups):
                words.append(stack_ref[tops[g]])
        # next child slot via the 512-entry LUT (index = flag<<8|mask;
        # the LUT folds the lowest-set-bit search AND the near-first
        # slot reversal); mask==0 maps to meta slot 9, which carries
        # the node's OWN row, realizing the root-entry "visit parent
        # directly" encoding branchless.
        slots = [lut_ref[words[g] & 0x1FF] for g in range(groups)]
        # meta stores the child's SIGNED unified-table row: interior ->
        # its node row (== node id); leaf -> -(unified leaf row) - 1.
        # One load yields row + is_leaf with no leaf-code arithmetic.
        childs = [
            meta_ref[(words[g] >> 9) * 12 + slots[g]] for g in range(groups)
        ]
        visits = []  # (child_row, alive, is_leaf)
        grows = []
        row_idxs = []
        rems = []
        for g in range(groups):
            word = words[g]
            mask = word & 0xFF
            child = childs[g]
            rem = mask & (mask - 1)
            rems.append(rem)
            if not reg_top:
                stack_ref[tops[g]] = word + rem - mask
                popped = alives[g] & (rem == 0)
                sps[g] = sps[g] - jnp.where(popped, 1, 0)
            is_leaf = child < 0
            row_idxs.append(jnp.where(is_leaf, -child - 1, child))
            visits.append((child, alives[g], is_leaf))
        for g in range(groups):
            grows.append(uni_ref[pl.ds(row_idxs[g], 1), :])
        rows = [grows[g] for _ in range(group_sub) for g in range(groups)]
        plane = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

        # ---- interpretation 1: 8-child slab test (garbage on leaf rows)
        def col(j):
            return plane[:, j : j + 1]  # (SUB,1), lane-broadcast by use

        packed = None
        for c in range(8):
            t1x = col(8 * c + 0) * inv_x - oxi
            t2x = col(8 * c + 3) * inv_x - oxi
            t1y = col(8 * c + 1) * inv_y - oyi
            t2y = col(8 * c + 4) * inv_y - oyi
            t1z = col(8 * c + 2) * inv_z - ozi
            t2z = col(8 * c + 5) * inv_z - ozi
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tmx = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            hv = (tmx >= tmin) & (tmx > 0) & (tmin < best)
            b = jnp.where(hv, jnp.int32(1 << c), 0)
            packed = b if packed is None else (packed | b)

        # per-group any-lane per child: fold each group's sublane rows,
        # then ONE lane-sum per 4-bit half with 8-bit count fields
        # (<=128 lanes/group after the fold).
        gp = packed
        r = gp.shape[0]
        while r > groups:
            gp = gp[: r // 2] | gp[r // 2 :]
            r //= 2
        spread = lambda m: (
            (m & 1) | ((m & 2) << 7) | ((m & 4) << 14) | ((m & 8) << 21)
        )
        s0 = jnp.sum(spread(gp & 0xF), axis=1, keepdims=True)  # (G,1)
        s1 = jnp.sum(spread((gp >> 4) & 0xF), axis=1, keepdims=True)
        m8 = jnp.int32(0)
        for k in range(4):
            m8 = m8 | (jnp.where(((s0 >> (8 * k)) & 0xFF) > 0,
                                 jnp.int32(1), 0) << k)
            m8 = m8 | (jnp.where(((s1 >> (8 * k)) & 0xFF) > 0,
                                 jnp.int32(1), 0) << (4 + k))
        if anyhit and os.environ.get("RT_ANYHIT_NEARFIRST") != "1":
            # Occlusion queries are traversal-order-independent (per-lane
            # ``best`` never shrinks until the lane dies), so skip the
            # whole near-first machinery: no axis extract/fold, no
            # majority-sign select, no 8-bit reverse — the LUT's flag=0
            # rows give plain lowest-set-bit pops.  MEASURED +40% on this
            # kernel (37.2 vs 26.5 Mrays/s, binned shadow rays,
            # tools/measure_anyhit.py r5) — here the reversal block is
            # per-step VECTOR work, unlike the packet kernel where order
            # freedom only trims scalar selects and near-first wins.
            # RT_ANYHIT_NEARFIRST=1 restores near-first (A/B escape).
            m9 = m8
        else:
            # near-first bit order: reverse the mask when the packet-
            # majority ray sign along the node's sort axis is negative
            # (slots ascend along axis; near end = high slot), and set
            # bit 8 so the pop side can invert the slot mapping.  All
            # vectorized on (G,1).
            axis_vec = col(7).astype(jnp.int32)
            av = axis_vec
            r = av.shape[0]
            while r > groups:
                av = av[: r // 2]
                r //= 2
            # i32 throughout: scalar-bool -> i1-vector selects trip
            # Mosaic's truncation legalization ("Unsupported target
            # bitwidth")
            negi = (jnp.where(neg_x, 1, 0), jnp.where(neg_y, 1, 0),
                    jnp.where(neg_z, 1, 0))
            neg_vec = jnp.where(
                av == 0, negi[0], jnp.where(av == 1, negi[1], negi[2])
            )
            mrev = jnp.int32(0)
            for k in range(8):
                mrev = mrev | (((m8 >> k) & 1) << (7 - k))
            m9 = jnp.where(neg_vec == 1, mrev | 256, m8)
        # pack TWO groups' 9-bit words per i32 (16-bit fields)
        mw = m9
        r = mw.shape[0]
        shift = 16
        while r > nwords:
            mw = mw[: r // 2] | (mw[r // 2 :] << shift)
            r //= 2

        # ---- interpretation 2: dense MT over 8 records (garbage on
        # interior rows; masked by the stamped leaf flag at col 127)
        leaf_flag = col(127) > 0.5
        slot_i = col(126).astype(jnp.int32)
        if anyhit:
            occ = None
            for k in range(max_recs):
                t = _mt_t(plane, k, ox, oy, oz, dx, dy, dz)
                h = t < best
                occ = h if occ is None else (occ | h)
            dst_ref[...] = jnp.where(occ & leaf_flag, -BIG, best)
        else:
            cands = []
            for k in range(max_recs):
                t = _mt_t(plane, k, ox, oy, oz, dx, dy, dz)
                cands.append((t, slot_i * 8 + k))
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
            closer = (tbest < best) & leaf_flag
            dst_ref[...] = jnp.where(closer, tbest, best)
            prim_ref[...] = jnp.where(closer, kbest, prim_ref[...])

        # ---- scalar tail: ONE pair push per interior visit.  The store
        # is UNCONDITIONAL (slots >= sp are dead by invariant, so a
        # suppressed push writes garbage to a dead slot); only the sp
        # increment is masked — pl.when branches measured ~15 cycles each
        # on the in-order scalar core.
        wsums = []
        for w in range(nwords):
            wsums.append(jnp.sum(mw[w : w + 1, 0:1]))
        if reg_top:
            # DFS in registers: descend -> the child's pair becomes the
            # new top and the parent's remainder (if any) is pushed; no
            # descend -> the remainder is the new top, or (drained) the
            # pre-loaded pop word is.  One unconditional SMEM store per
            # group; the sp==-1 (dead) case writes the 0 word back to the
            # group's own slot-0 sentinel.
            for g in range(groups):
                child, alive_g, is_leaf = visits[g]
                wrow, wshift = layout[g]
                m9_g = (wsums[wrow] >> wshift) & 0x1FF
                word = words[g]
                rem = rems[g]
                prem = word + rem - (word & 0xFF)
                descend = alive_g & (~is_leaf) & ((m9_g & 0xFF) != 0)
                s = sps[g]
                stack_ref[g * G_STACK + 1 + s] = prem
                push = descend & (rem != 0)
                pop = alive_g & (~descend) & (rem == 0)
                sps[g] = s + jnp.where(push, 1, 0) - jnp.where(pop, 1, 0)
                words[g] = jnp.where(
                    descend,
                    (child << 9) | m9_g,
                    jnp.where(rem != 0, prem, nxts[g]),
                )
            return tuple(words) + tuple(sps) + (nsteps + 1,)
        for g in range(groups):
            child, alive_g, is_leaf = visits[g]
            wrow, wshift = layout[g]
            m9_g = (wsums[wrow] >> wshift) & 0x1FF
            take = alive_g & (~is_leaf) & ((m9_g & 0xFF) != 0)
            s = sps[g]
            stack_ref[g * G_STACK + 1 + s] = (child << 9) | m9_g
            sps[g] = s + jnp.where(take, 1, 0)
        return tuple(sps) + (nsteps + 1,)

    if reg_top:
        state = (
            tuple(root << 9 for _ in range(groups))
            + tuple(jnp.int32(0) for _ in range(groups))
            + (jnp.int32(0),)
        )
    else:
        state = tuple(jnp.int32(1) for _ in range(groups)) + (jnp.int32(0),)
    out = jax.lax.while_loop(cond, body, state)
    if with_steps:
        steps_ref[...] = jnp.full_like(steps_ref[...], out[-1])


def _mt_t(plane, k, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore accept distance of record ``k`` per lane, BIG on
    miss; identical arithmetic to packet.py::_tri_t, with the record's
    scalars entering as (SUB,1) column slices (per-group constants)."""
    c = lambda j: plane[:, 16 * k + j : 16 * k + j + 1]
    rx = ox - c(0)
    ry = oy - c(1)
    rz = oz - c(2)
    qx = ry * dz - rz * dy
    qy = rz * dx - rx * dz
    qz = rx * dy - ry * dx
    d0 = -(dx * c(9) + dy * c(10) + dz * c(11))
    dinv = 1.0 / d0
    t = (rx * c(9) + ry * c(10) + rz * c(11)) * dinv
    u = (c(6) * qx + c(7) * qy + c(8) * qz) * dinv
    v = -(c(3) * qx + c(4) * qy + c(5) * qz) * dinv
    w = 1.0 - u - v
    front = d0 >= 1e-8
    ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
    ok = ok & ~((~front) & (c(12) > 0.5))
    return jnp.where(ok, t, BIG)


@functools.lru_cache(maxsize=1)
def _pop_lut():
    """(flag<<8 | remaining_mask) -> next child slot.  flag=1 means the
    mask bits were stored reversed (near end = high slot); mask==0 maps
    to meta slot 9 (the node's own id — the direct-visit encoding)."""
    import numpy as np

    lut = np.zeros(512, np.int32)
    for flag in (0, 1):
        for mask in range(256):
            if mask == 0:
                slot = 9
            else:
                c = (mask & -mask).bit_length() - 1
                slot = 7 - c if flag else c
            lut[(flag << 8) | mask] = slot
    return lut


def stamp_leaf_rows(leaf_rows):
    """Stamp per-row slot id (col 126) + leaf flag (col 127) into the pad
    lanes of record 7 so the kernel can recover (slot, is_leaf) from the
    gathered plane itself.  Node rows keep zeros there (builder zeros
    cols 64..127)."""
    L = leaf_rows.shape[0]
    slot = jnp.arange(L, dtype=jnp.float32)
    lr = leaf_rows.at[:, 126].set(slot)
    lr = lr.at[:, 127].set(1.0)
    return lr


@functools.partial(
    jax.jit,
    static_argnames=(
        "entry_code", "interpret", "packet_size", "groups", "max_recs",
        "anyhit", "with_steps", "reg_top",
    ),
)
def group_traverse(
    nodes: jnp.ndarray,  # (W,128) packed wide nodes
    leaf_rows: jnp.ndarray,  # (L,128) leaf rows
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmax0: jnp.ndarray,
    entry_code: int = 0,
    interpret: bool = False,
    packet_size: int = 2048,
    groups: int = 16,
    max_recs: int = 8,
    anyhit: bool = False,
    with_steps: bool = False,
    reg_top: bool = False,
):
    """Same contract as packet.packet_traverse_wide's (dst, prim) prefix:
    ``prim`` is the padded leaf-slot id (slot*8 + k), -1 on miss, and
    ``dst`` is the accepted-hit distance (-BIG occluded lanes under
    ``anyhit``).  u/v/front reconstruction stays with the caller
    (wavefront._shade_fetch), as with need_uv=False."""
    assert packet_size % 128 == 0
    sub = packet_size // 128
    assert sub % groups == 0, (sub, groups)
    assert groups & (groups - 1) == 0, groups  # fold layout needs pow2
    assert max_recs <= 8, "group kernel v1: single-row leaf slots only"
    n = origin.shape[0]
    gcnt = -(-n // packet_size)
    pad = gcnt * packet_size - n

    def prep(x):
        x = jnp.pad(x, ((0, pad),))
        return x.reshape(gcnt * sub, 128)

    ox, oy, oz = (prep(origin[:, i]) for i in range(3))
    dx, dy, dz = (prep(direction[:, i]) for i in range(3))
    tmax = jnp.pad(tmax0, ((0, pad),), constant_values=-float(BIG)).reshape(
        gcnt * sub, 128
    )
    entry_arr = jnp.full((1, 1), entry_code, jnp.int32)

    w_nodes = nodes.shape[0]
    uni = jnp.concatenate([nodes, stamp_leaf_rows(leaf_rows)], axis=0)

    codes_f = nodes[:, 6:70:8]
    # meta slot 9 carries the node's own row: the pop LUT maps mask==0
    # (the root-entry encoding) to slot 9, so "visit parent directly"
    # needs no branch in the pop sequence.
    own_ids = jnp.arange(w_nodes, dtype=nodes.dtype)[:, None]
    meta2 = jnp.concatenate(
        [codes_f, nodes[:, 7:8], own_ids,
         jnp.zeros((w_nodes, 2), nodes.dtype)],
        axis=1,
    )
    meta = jnp.nan_to_num(meta2, nan=0.0).astype(jnp.int32)
    # child slots store the SIGNED unified-table row (interior: node row
    # == node id; leaf: -(w_nodes + leaf_slot_row) - 1) so the kernel's
    # pop decodes row + is_leaf from one load with no code arithmetic.
    child_cols = meta[:, 0:8]
    leaf_rows_idx = w_nodes + (-child_cols - 1) // 16
    meta = meta.at[:, 0:8].set(
        jnp.where(child_cols >= 0, child_cols, -leaf_rows_idx - 1)
    )
    meta = meta.reshape(-1)
    lut = jnp.asarray(_pop_lut())

    row_spec = pl.BlockSpec(
        (sub, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((gcnt * sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((gcnt * sub, 128), jnp.int32),
    ]
    if with_steps:
        out_shape.append(jax.ShapeDtypeStruct((gcnt * sub, 128), jnp.int32))
    kernel = functools.partial(
        _group_kernel,
        groups=groups,
        sub=sub,
        max_recs=max_recs,
        anyhit=anyhit,
        with_steps=with_steps,
        reg_top=reg_top,
    )
    outs = pl.pallas_call(
        kernel,
        # Separate trace names for profile attribution (see packet.py).
        name="group_anyhit" if anyhit else "group_traverse",
        grid=(gcnt,),
        in_specs=[
            full(uni),
            pl.BlockSpec(meta.shape, lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(lut.shape, lambda i: (0,), memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
            row_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[row_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((G_STACK * groups,), jnp.int32)],
        interpret=interpret,
    )(uni, meta, lut, ox, oy, oz, dx, dy, dz, tmax, entry_arr)
    dst, prim = outs[0], outs[1]
    flat = lambda x: x.reshape(-1)[:n]
    if with_steps:
        per_packet = outs[2].reshape(gcnt, -1)[:, 0]
        return flat(dst), flat(prim), per_packet
    return flat(dst), flat(prim)
