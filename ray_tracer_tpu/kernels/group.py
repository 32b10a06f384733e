"""Multi-stack lane-group BVH8 traversal (Pallas TPU).

The packet kernel (kernels/packet.py) amortizes ONE scalar traversal stack
over the whole packet: every node visit slab-tests all lanes, so a packet
descends the UNION of its lanes' want-sets.  On binned bounce rays the
union is ~0.46 nodes/lane (tools/measure_union.py) while a single ray only
needs ~60 visits — mean lane utilization per visit is ~6%.  The GPU
reference gets ~100% from per-thread private stacks
(``shaders/raytrace.comp:300-349``), a shape the TPU cannot gather-walk
per lane (BENCH_NOTES r1 finding 4).

This kernel is the TPU-shaped middle ground: the packet's (SUB,128) lane
block is split into G independent *groups* of whole sublane rows, each
group walking its OWN traversal stack in SMEM.  Every loop step:

* pops one code per group (G scalar SMEM reads),
* gathers each group's node OR leaf row from a unified (W+L,128) VMEM
  table by dynamic slice into a (SUB,128) plane (one row per group,
  repeated ``group_sub`` times),
* computes BOTH interpretations of the plane — the 8-child slab test and
  the 8-record Moller-Trumbore test — as dense (SUB,128) vector work
  (per-group constants enter as (SUB,1) column slices of the plane,
  lane-broadcast by the VPU),
* reduces per-group 8-bit descend masks with two lane-sum reductions and
  reads them back as G/4 packed scalars,
* pushes masked children per group (near-first by packet-majority sign).

One step therefore retires G visits for roughly the vector cost the
packet kernel pays for one, trading it for G-way scalar stack machinery
and the gather/broadcast forms.  Groups that finish early pop a dead code
(row 0, mask forced 0) until all stacks drain.

Results are bit-identical to the packet kernel: each lane's visit set is
a superset of its want-set either way, the accept tests are the same
arithmetic, and the leaf min-tree breaks ties by earliest record id
(order-independent), matching the gather-walk oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 99999999.0
# Per-group stack depth: builder max depth 64 (vk_engine.cpp:1215) x up to
# 7 sibling pushes re-bounded as in packet.py; 512 i32 = 2KB SMEM per group.
G_STACK = 512


def _fold_layout(groups):
    """Simulate the mask word fold (rows r -> r/2 with ``lo | hi << 8k``)
    down to max(groups//4, 1) rows; returns {group: (word_row, shift)}."""
    layout = [[(g, 0)] for g in range(groups)]
    shift = 8
    r = groups
    while r > max(groups // 4, 1):
        hi = layout[r // 2 : r]
        layout = [
            layout[i] + [(grp, sh + shift) for (grp, sh) in hi[i]]
            for i in range(r // 2)
        ]
        r //= 2
        shift += 8
    out = {}
    for w, entries in enumerate(layout):
        for grp, sh in entries:
            out[grp] = (w, sh)
    return out


def _group_kernel(
    uni_ref,  # (W+L,128) f32 unified node+leaf rows (leaf: +slot/flag pads)
    meta_ref,  # SMEM (W*12,) i32 codes[0:8]+axis[8]+pad
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    entry_ref,  # (1,1) i32 SMEM
    dst_ref, prim_ref,
    *rest,
    w_nodes: int = 0,
    groups: int = 16,
    sub: int = 16,
    max_recs: int = 8,
    anyhit: bool = False,
    with_steps: bool = False,
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

    root = entry_ref[0, 0]
    for g in range(groups):
        stack_ref[g * G_STACK] = root

    def cond(state):
        alive = state[0]
        for s in state[1:groups]:
            alive = jnp.maximum(alive, s)
        return alive > 0

    def body(state):
        sps = list(state[:groups])
        nsteps = state[groups]
        best = dst_ref[...]

        # ---- pop one code per group; dead groups read row 0 (mask 0'd).
        # Group g owns the STRIDED sublane rows {g, g+groups, ...} so the
        # mask fold's halving slices (rows i and i+r/2) always combine
        # rows of the SAME group.
        codes = []
        grows = []
        for g in range(groups):
            alive_g = sps[g] > 0
            idx = g * G_STACK + jnp.maximum(sps[g] - 1, 0)
            code = jnp.where(alive_g, stack_ref[idx], 0)
            sps[g] = sps[g] - jnp.where(alive_g, 1, 0)
            is_leaf = code < 0
            # leaf payload -(slot*16+cnt)-1 -> unified row W + slot
            row_idx = jnp.where(is_leaf, w_nodes + (-code - 1) // 16, code)
            codes.append((code, alive_g, is_leaf))
            grows.append(uni_ref[pl.ds(row_idx, 1), :])
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
        # (<=128 lanes/group after the fold), then pack 4 groups' 8-bit
        # masks per word so only groups/4 scalar reads leave the VPU.
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
        # fold groups' masks 4-per-word: rows g, g+G/2 -> g | (g+G/2)<<8,
        # then g, g+G/4 -> | <<16: word row g holds masks of groups
        # (g, g+G/4, g+G/2, g+3G/4) at bits 0/16/8/24.
        mw = m8
        r = mw.shape[0]
        shift = 8
        while r > max(groups // 4, 1):
            mw = mw[: r // 2] | (mw[r // 2 :] << shift)
            r //= 2
            shift += 8

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

        # ---- masked near-first pushes per group (scalar tail)
        nwords = max(groups // 4, 1)
        layout = _fold_layout(groups)
        words = []
        for w in range(nwords):
            words.append(jnp.sum(mw[w : w + 1, 0:1]))
        for g in range(groups):
            code, alive_g, is_leaf = codes[g]
            wrow, wshift = layout[g]
            mask = (words[wrow] >> wshift) & 0xFF
            take = alive_g & (~is_leaf)
            mask = jnp.where(take, mask, 0)
            mbase = jnp.maximum(code, 0) * 12
            axis = meta_ref[mbase + 8]
            codes8 = [meta_ref[mbase + c] for c in range(8)]
            neg = jnp.where(
                axis == 0, neg_x, jnp.where(axis == 1, neg_y, neg_z)
            )
            s = sps[g] + g * G_STACK
            for c in range(8):
                slot = jnp.where(neg, c, 7 - c)
                bit = (mask >> slot) & 1
                val = jnp.where(neg, codes8[c], codes8[7 - c])

                @pl.when(bit == 1)
                def _(s=s, val=val):
                    stack_ref[s] = val

                s = s + bit
            sps[g] = s - g * G_STACK
        return tuple(sps) + (nsteps + 1,)

    state = tuple(jnp.int32(1) for _ in range(groups)) + (jnp.int32(0),)
    out = jax.lax.while_loop(cond, body, state)
    if with_steps:
        steps_ref[...] = jnp.full_like(steps_ref[...], out[groups])


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
        "anyhit", "with_steps",
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
    meta2 = jnp.concatenate(
        [codes_f, nodes[:, 7:8], jnp.zeros((w_nodes, 3), nodes.dtype)],
        axis=1,
    )
    meta = jnp.nan_to_num(meta2, nan=0.0).astype(jnp.int32).reshape(-1)

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
        w_nodes=w_nodes,
        groups=groups,
        sub=sub,
        max_recs=max_recs,
        anyhit=anyhit,
        with_steps=with_steps,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(gcnt,),
        in_specs=[
            full(uni),
            pl.BlockSpec(meta.shape, lambda i: (0,), memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
            row_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[row_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((G_STACK * groups,), jnp.int32)],
        interpret=interpret,
    )(uni, meta, ox, oy, oz, dx, dy, dz, tmax, entry_arr)
    dst, prim = outs[0], outs[1]
    flat = lambda x: x.reshape(-1)[:n]
    if with_steps:
        per_packet = outs[2].reshape(gcnt, -1)[:, 0]
        return flat(dst), flat(prim), per_packet
    return flat(dst), flat(prim)
