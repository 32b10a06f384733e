"""Per-lane rope-walk BVH traversal via Mosaic dynamic gather (round 5).

The packet/group kernels amortize shared traversal stacks over lane
blocks, so every visit tests all lanes against ONE node (group kernel:
G nodes) — utilization is bounded by the packet's want-set union (~6%
at the packet, ~?% at G=16).  This kernel gives every LANE its own
walk — the reference's per-thread traversal shape
(``shaders/raytrace.comp:300-349``) — but TPU-native:

* The narrow tree's octant-threaded rope walk (ops/traverse._walk
  semantics) is flattened into a per-octant ROW STREAM in that octant's
  preorder: interior node -> one BOX row, leaf -> one BOX row + cnt TRI
  rows.  In this labeling both rope links strictly increase (hit ->
  row+1, miss -> preorder successor), so every lane's row id is
  MONOTONE: a gang of lanes can sweep the stream's 128-row pages in
  increasing order with a shared cursor and never revisit a page.
* Each of the 8 sublane rows of the (8,128) lane block is an
  independent 128-lane gang with its OWN page cursor (the stacked
  per-row pages form one (8,128) gather table per field).  A step
  gathers each lane's 16-float row with ``jnp.take_along_axis(axis=1)``
  — the Mosaic dynamic-gather primitive measured at ~1 ns/op
  (tools/probe_lane_gather2.py) — and computes BOTH interpretations
  (AABB slab and Moller-Trumbore) as dense vector work.
* Lanes whose row id is beyond their gang's resident page simply wait
  (masked); the gang reloads its page when its last in-page lane
  leaves.  Vector steps per gang = sum over touched pages of the
  per-page lane max — measured on the real tree at 0.10 (primary),
  0.47 (bounce), 0.087 (shadow) steps/ray (tools/sim_lanewalk_real.py),
  ~6-10x below the group route's effective per-ray cost.

Rays are NOT reordered here: each 1024-lane block walks the stream of
its MAJORITY direction octant (any octant's rope is a correct complete
traversal — threading is only a front-to-back visit-order heuristic;
minority lanes pay extra steps, not wrong answers).  Callers get
coherence from the wavefront's (octant, morton) binning, as with the
packet/group routes.

Contract matches ``group.group_traverse``: returns ``(dst, prim)``
where ``prim`` is the GLOBAL triangle id (prim_space 'tri'), -1 on
miss; ``dst`` = accepted hit distance, or the incoming ``tmax`` when
no hit (-BIG = occluded under ``anyhit``).  Vs the gather walk: same
accept arithmetic, so dst matches to cross-compilation FMA fusion
(1 ULP); ties on exact equal ``t`` of duplicated geometry may report
the other duplicate's id when a lane's octant differs from its block
majority (visit order changes).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 99999999.0
EPS_FRONT = 1e-8  # ops/intersect.EPS_FRONT (raytrace.comp front test)
F = 16  # fields per row
PAGE = 128  # rows per page == lane width (one dynamic gather per field)
DEAD = np.int32(1 << 24)  # terminal row id; f32-exact, page >> any n_pages
SENTINEL = np.int32(2**31 - 1)  # builder link sentinel (scene/types.py)

# Row encodings (all f32; ids exact below 2^24):
#   BOX row:  0:3 bmin | 3:6 bmax | 6 hit_row | 7 miss_row | 15 type=0
#   TRI row:  0:3 v0 | 3:6 e1 | 6:9 e2 | 9:12 n | 12 next_row |
#             13 front_only | 14 global tri id | 15 type=1


def _octant_preorder(index, cnt, first_child, B):
    """Preorder DFS where an interior node's first child is its octant
    hit-link target; returns old ids in visit order."""
    order = np.empty(B, np.int64)
    # iterative DFS with an explicit stack (numpy int64 ops only)
    stack = np.empty(B + 1, np.int64)
    stack[0] = 0
    sp = 1
    k = 0
    while sp:
        sp -= 1
        nd = stack[sp]
        order[k] = nd
        k += 1
        if cnt[nd] == 0:
            f = first_child[nd]
            s = index[nd] + 1 if f == index[nd] else index[nd]
            stack[sp] = s
            stack[sp + 1] = f
            sp += 2
    assert k == B, (k, B)
    return order


def build_rope_streams(
    bvh_min, bvh_max, index, cnt, hit_link, miss_link, tri_packed,
    max_leaf: int,
):
    """Build the (8, n_pages, F*128) per-octant row streams.

    ``hit_link``/``miss_link``: (8, B) octant-threaded rope links with
    SENTINEL terminals (scene/builder.py).  ``tri_packed``: (T, 16)
    v0|e1|e2|n|front_only|obj rows.  Returns (streams f32, n_rows).
    """
    B = index.shape[0]
    index = np.asarray(index, np.int64)
    cnt = np.asarray(cnt, np.int64)
    streams = []
    n_rows = None
    for o in range(8):
        hl = np.asarray(hit_link[o], np.int64)
        ml = np.asarray(miss_link[o], np.int64)
        order = _octant_preorder(index, cnt, hl, B)
        leaf = cnt[order] > 0
        nper = 1 + np.where(leaf, cnt[order], 0)
        row_start = np.zeros(B, np.int64)
        np.cumsum(nper[:-1], out=row_start[1:])
        row_of_node = np.empty(B, np.int64)
        row_of_node[order] = row_start
        R = int(nper.sum())
        if n_rows is None:
            n_rows = R
        assert R == n_rows
        r_pad = -(-max(R, 1) // PAGE) * PAGE
        rows = np.zeros((r_pad, F), np.float32)

        # BOX rows
        rows[row_start, 0:3] = bvh_min[order]
        rows[row_start, 3:6] = bvh_max[order]
        miss_nd = ml[order]
        miss_row = np.where(
            miss_nd == SENTINEL, np.int64(DEAD),
            row_of_node[np.clip(miss_nd, 0, B - 1)],
        )
        hit_nd = hl[order]
        hit_row = np.where(
            leaf, row_start + 1,
            np.where(hit_nd == SENTINEL, np.int64(DEAD),
                     row_of_node[np.clip(hit_nd, 0, B - 1)]),
        )
        rows[row_start, 6] = hit_row
        rows[row_start, 7] = miss_row
        # TRI rows (leaves expand in place, preserving the walk's
        # triangle order index[nd]..index[nd]+cnt-1)
        lp_all = np.where(leaf)[0]
        for k in range(max_leaf):
            sel = cnt[order[lp_all]] > k
            lp = lp_all[sel]
            if lp.size == 0:
                break
            r = row_start[lp] + 1 + k
            ti = index[order[lp]] + k
            rows[r, 0:12] = tri_packed[ti, 0:12]
            last = cnt[order[lp]] == k + 1
            rows[r, 12] = np.where(last, miss_row[lp], r + 1)
            rows[r, 13] = tri_packed[ti, 12]
            rows[r, 14] = ti
            rows[r, 15] = 1.0
        # page-major, field-major layout: (n_pages, F*128) where field f
        # of the page's 128 rows occupies columns f*128:(f+1)*128
        pages = rows.reshape(r_pad // PAGE, PAGE, F).transpose(0, 2, 1)
        streams.append(pages.reshape(r_pad // PAGE, F * PAGE))
    return np.stack(streams), n_rows


def _lanewalk_kernel(
    oct_ref,  # scalar prefetch: (gcnt,) i32 per-block majority octant
    stream_ref,  # (1, n_pages, F*128) f32 — this block's octant stream
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    dst_ref, prim_ref,
    tab_ref,  # VMEM scratch (8, F*128): stacked per-row resident pages
    *,
    n_pages: int,
    max_phases: int,
    phase_steps: int,
    anyhit: bool,
):
    del oct_ref  # consumed by the stream index_map
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    # zero-direction guard: see packet.py (slab NaN on exact zeros)
    dx = jnp.where(dx == 0.0, 1e-20, dx)
    dy = jnp.where(dy == 0.0, 1e-20, dy)
    dz = jnp.where(dz == 0.0, 1e-20, dz)
    inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz

    best0 = tmax_ref[...]
    alive0 = best0 > jnp.float32(-BIG) * 0.5
    cur0 = jnp.where(alive0, jnp.int32(0), DEAD)
    prim0 = jnp.full_like(cur0, -1)

    # Loop structure (probe_lane_step2.py attribution): every
    # vector->scalar sync costs ~100 ns BUT independent syncs pipeline
    # (8 extracts = 1 extract); a data-dependent while cond costs
    # ~220 ns; pl.when branches consuming fresh extracts SERIALIZE the
    # extract->branch->copy chains (~3.2 us/iter in v1).  So v2 hoists
    # ALL scalar work into a per-PHASE boundary: one (8,1) row-min
    # reduce, 8 pipelined extracts, 8 UNconditional page copies, then an
    # inner fori of `phase_steps` gather/test steps on FIXED pages
    # (lanes that leave their row's page just wait for the next
    # boundary; the walk is monotone so they only move forward).
    def inner(carry):
        cur, best, prim, pg_vec = carry
        active = (jax.lax.shift_right_logical(cur, 7) == pg_vec) & (
            cur < DEAD
        )
        ix = jax.lax.bitwise_and(cur, 127)
        tab = tab_ref[...]
        g = [
            jnp.take_along_axis(tab[:, 128 * f : 128 * (f + 1)], ix, axis=1)
            for f in range(F)
        ]

        # ---- BOX interpretation (garbage on TRI rows; masked below).
        # Matches ops/intersect.slab_test + the _walk prune exactly.
        t1x = (g[0] - ox) * inv_x
        t2x = (g[3] - ox) * inv_x
        t1y = (g[1] - oy) * inv_y
        t2y = (g[4] - oy) * inv_y
        t1z = (g[2] - oz) * inv_z
        t2z = (g[5] - oz) * inv_z
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = (
            (t_far >= t_near)
            & (t_far > 0.0)
            & (jnp.maximum(t_near, 0.0) < best)
        )

        # ---- TRI interpretation (garbage on BOX rows; masked below).
        # Matches ops/intersect.intersect_tris exactly.
        rx, ry, rz = ox - g[0], oy - g[1], oz - g[2]
        qx = ry * dz - rz * dy
        qy = rz * dx - rx * dz
        qz = rx * dy - ry * dx
        d0 = -(dx * g[9] + dy * g[10] + dz * g[11])
        dinv = 1.0 / d0
        t = (rx * g[9] + ry * g[10] + rz * g[11]) * dinv
        u = (g[6] * qx + g[7] * qy + g[8] * qz) * dinv
        v = -(g[3] * qx + g[4] * qy + g[5] * qz) * dinv
        w = 1.0 - u - v
        front = d0 >= EPS_FRONT
        thit = (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
        thit = thit & ~((~front) & (g[13] > 0.5))

        is_tri = g[15] > 0.5
        imp = active & is_tri & thit & (t < best)
        if anyhit:
            best = jnp.where(imp, jnp.float32(-BIG), best)
        else:
            best = jnp.where(imp, t, best)
            prim = jnp.where(imp, g[14].astype(jnp.int32), prim)

        nxt = jnp.where(
            is_tri,
            g[12].astype(jnp.int32),
            jnp.where(box_hit, g[6].astype(jnp.int32),
                      g[7].astype(jnp.int32)),
        )
        if anyhit:
            nxt = jnp.where(imp, DEAD, nxt)
        cur = jnp.where(active, nxt, cur)
        return cur, best, prim, pg_vec

    def cond(state):
        phases, cur = state[0], state[1]
        return (jnp.min(cur) < DEAD) & (phases < max_phases)

    def body(state):
        phases, cur, best, prim = state
        # boundary: per-gang (sublane row) minimum row id -> resident
        # page (the walk is monotone, so the min is the earliest page
        # any of the gang's lanes still needs), 8 pipelined extracts,
        # 8 unconditional copies (a dead row reloads page 0 harmlessly)
        rowmin = jnp.min(cur, axis=1, keepdims=True)  # (8,1)
        pg_vec = jax.lax.shift_right_logical(rowmin, 7)
        for r in range(8):
            pgr = jnp.sum(pg_vec[r : r + 1, 0:1])
            pgc = jnp.where(pgr < n_pages, pgr, 0)
            tab_ref[pl.ds(r, 1), :] = stream_ref[0, pl.ds(pgc, 1)]
        carry = (cur, best, prim, pg_vec)
        for _ in range(phase_steps):
            carry = inner(carry)
        cur, best, prim, _ = carry
        return phases + 1, cur, best, prim

    state = (jnp.int32(0), cur0, best0, prim0)
    out = jax.lax.while_loop(cond, body, state)
    dst_ref[...] = out[2]
    prim_ref[...] = out[3]


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "interpret", "anyhit", "phase_steps"),
)
def lanewalk_traverse(
    streams: jnp.ndarray,  # (8, n_pages, F*128) f32
    n_rows: int,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmax0: jnp.ndarray,  # -BIG marks inactive lanes (group convention)
    interpret: bool = False,
    anyhit: bool = False,
    phase_steps: int = None,
):
    if phase_steps is None:
        import os

        phase_steps = int(os.environ.get("LW_PHASE_STEPS", 8))
    n = origin.shape[0]
    block = 1024
    gcnt = -(-n // block)
    pad = gcnt * block - n
    n_pages = streams.shape[1]

    def prep(x):
        x = jnp.pad(x, ((0, pad),))
        return x.reshape(gcnt * 8, 128)

    ox, oy, oz = (prep(origin[:, i]) for i in range(3))
    dx, dy, dz = (prep(direction[:, i]) for i in range(3))
    tmax = jnp.pad(tmax0, ((0, pad),), constant_values=-float(BIG)).reshape(
        gcnt * 8, 128
    )

    # per-block MAJORITY direction octant (the stream selector)
    octs = (
        (direction[:, 0] < 0).astype(jnp.int32)
        + 2 * (direction[:, 1] < 0).astype(jnp.int32)
        + 4 * (direction[:, 2] < 0).astype(jnp.int32)
    )
    octs = jnp.pad(octs, ((0, pad),)).reshape(gcnt, block)
    counts = jnp.sum(
        octs[:, :, None] == jnp.arange(8, dtype=jnp.int32)[None, None, :],
        axis=1,
    )
    oct_blocks = jnp.argmax(counts, axis=1).astype(jnp.int32)

    row_spec = pl.BlockSpec((8, 128), lambda b, oct: (b, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gcnt,),
        in_specs=[
            pl.BlockSpec(
                (1, n_pages, F * PAGE), lambda b, oct: (oct[b], 0, 0)
            ),
            row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
            row_spec,
        ],
        out_specs=[row_spec, row_spec],
        scratch_shapes=[pltpu.VMEM((8, F * PAGE), jnp.float32)],
    )
    kernel = functools.partial(
        _lanewalk_kernel,
        n_pages=n_pages,
        # every phase advances each live row's min lane by >=1 row id
        # (ids are bounded by n_rows), so n_rows + 2 phases can never
        # truncate a legitimate walk
        max_phases=n_rows + 2,
        phase_steps=phase_steps,
        anyhit=anyhit,
    )
    dst, prim = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((gcnt * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((gcnt * 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(oct_blocks, streams, ox, oy, oz, dx, dy, dz, tmax)
    return dst.reshape(-1)[:n], prim.reshape(-1)[:n]
