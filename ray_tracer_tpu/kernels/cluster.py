"""MXU-dense ray x triangle-cluster intersection kernel (round 3).

Pairs (ray, cluster) are grouped so each 128-pair chunk shares ONE
cluster; the kernel contracts the cluster's transposed Moller-Trumbore
coefficient page (accel/cluster.py) against the chunk's ray-feature
block in a single matmul and reduces the accept-masked hit distances
over the triangle axis with a register min-tree.  One chunk = up to
128 rays x t_c triangles tested for the price of one (16,5*t_c)^T @
(16,128) contraction — the work the packet kernel's leaf loop does at
~49 ns per ray-triangle test rides the matrix unit at ~0.03-0.7 ns.

Reference math: shaders/raytrace.comp:222-259 (the same quantities the
packet kernel's ``_tri_t`` computes; see accel/cluster.py for the
bilinear factorization).  Tie semantics: the strict-< min-tree keeps the
LOWEST triangle index in the cluster, matching the sequential
first-record-wins update order of the reference loop.

Chunks whose cluster id is negative (run padding / dead tail) are
skipped via a scalar branch around the whole body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 99999999.0

N_BLOCKS = 5  # T | B | U | V | FO blocks per page (accel/cluster.py)


def _cluster_kernel(
    cids_ref,  # scalar-prefetch (G,) i32 chunk cluster ids (-1 = dead)
    mt_ref,  # (1,16,N_BLOCKS*t_c) f32 this chunk's coefficient page
    f_ref,  # (1,16,128) f32 this chunk's ray features
    t_ref,  # (1,1,128) f32 out: best accepted t per pair lane (BIG = none)
    p_ref,  # (1,1,128) i32 out: winning in-cluster triangle index (-1)
    *,
    t_c: int,
):
    cid = cids_ref[pl.program_id(0)]

    t_ref[...] = jnp.full_like(t_ref[...], BIG)
    p_ref[...] = jnp.full_like(p_ref[...], -1)

    @pl.when(cid >= 0)
    def _():
        page = mt_ref[...][0]  # (16, 5*t_c)
        fr = f_ref[...][0]  # (16, 128): rows 0-2 o, 3-5 d, 9 const 1
        # Shift rays into cluster-local coordinates (the page's
        # coefficients were built against v0 - anchor; the anchor rides
        # in rows 10:13 of column 0, which multiply zero feature rows).
        # Keeping the cancellation terms at cluster-local magnitudes is
        # what makes the bilinear factorization translation-invariant.
        anchor = page[10:13, 0:1]  # (3,1)
        o_l = fr[0:3] - anchor
        d = fr[3:6]
        c_l = jnp.concatenate(
            [
                o_l[1:2] * d[2:3] - o_l[2:3] * d[1:2],
                o_l[2:3] * d[0:1] - o_l[0:1] * d[2:3],
                o_l[0:1] * d[1:2] - o_l[1:2] * d[0:1],
            ],
            axis=0,
        )  # o' x d
        feats = jnp.concatenate([o_l, d, c_l, fr[9:16]], axis=0)
        # HIGHEST: full-f32 contraction.  TPU matmuls at DEFAULT precision
        # run single-pass bf16 (8 mantissa bits) — enough for the 0/1
        # reductions in the packet kernel's mxu mask mode, catastrophic
        # for hit distances on thin/large-coordinate geometry.
        out = jax.lax.dot_general(
            page, feats, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (5*t_c, 128): [T | B | U | V | FO] blocks of (t_c, 128)
        T_ = out[0 * t_c : 1 * t_c]
        B = out[1 * t_c : 2 * t_c]
        U = out[2 * t_c : 3 * t_c]
        V = out[3 * t_c : 4 * t_c]
        FO = out[4 * t_c : 5 * t_c]
        rB = 1.0 / B
        t = T_ * rB
        u = U * rB
        v = V * rB
        w = 1.0 - u - v
        front = B >= 1e-8  # d0 >= 1e-8, raytrace.comp:238
        ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
        ok = ok & ~((~front) & (FO > 0.5))
        # zero-padded coefficient columns: B == 0 -> t = 0*inf = NaN, and
        # every NaN comparison above is false -> inert
        tt = jnp.where(ok, t, BIG)
        ids = jax.lax.broadcasted_iota(jnp.int32, (t_c, 128), 0)
        rows = t_c
        while rows > 1:
            h = rows // 2
            ta, tb = tt[:h], tt[h:rows]
            ia, ib = ids[:h], ids[h:rows]
            take_b = tb < ta  # strict: earliest (lowest) index wins ties
            tt = jnp.minimum(ta, tb)
            ids = jnp.where(take_b, ib, ia)
            rows = h
        t_ref[...] = tt[None]
        p_ref[...] = jnp.where(tt < BIG, ids, -1)[None]


@functools.partial(jax.jit, static_argnames=("t_c", "interpret"))
def cluster_pairs_test(
    clus_mt: jnp.ndarray,  # (C, 16, 5*t_c) f32 coefficient pages
    feats: jnp.ndarray,  # (G, 16, 128) f32 per-chunk ray features
    chunk_cid: jnp.ndarray,  # (G,) i32 cluster id per chunk (-1 dead)
    t_c: int = 128,
    interpret: bool = False,
):
    """Test every chunk's 128 ray-feature lanes against its cluster.

    Returns ``(t, prim_local)`` of shape (G, 128): best accepted hit
    distance (BIG if none) and the winning triangle's index *within the
    cluster* (-1 if none).  Feature layout per lane (accel/cluster.py):
    rows 0-2 origin, 3-5 direction, 6-8 origin x direction, 9 constant 1,
    10-15 zero (padding / caller scratch — the coefficient rows there are
    zero, so the contraction ignores them).
    """
    g = feats.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 16, N_BLOCKS * t_c),
                lambda i, cids: (jnp.maximum(cids[i], 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 16, 128), lambda i, cids: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            # (1,1,128) trailing block dims equal the array dims — the
            # Mosaic lowering rejects a 2-D (1,128) block for a (G,128)
            # array (sublane dim must be 8-divisible or whole).
            pl.BlockSpec((1, 1, 128), lambda i, cids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i, cids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    t, p = pl.pallas_call(
        functools.partial(_cluster_kernel, t_c=t_c),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(chunk_cid.astype(jnp.int32), clus_mt, feats)
    return t[:, 0], p[:, 0]


def _box_kernel(
    pids_ref,  # scalar-prefetch (G,) i32 page id per chunk (-1 = dead)
    page_ref,  # (1,16,6*128) f32 this chunk's box coefficient page
    f_ref,  # (1,16,128) f32 ray features [o|d|0|1|...|tmax@13]
    w_ref,  # (1,4,128) i32 out: per-lane 128-bit hit mask (4 words)
):
    pid = pids_ref[pl.program_id(0)]
    w_ref[...] = jnp.zeros_like(w_ref[...])

    @pl.when(pid >= 0)
    def _():
        page = page_ref[...][0]  # (16, 6*128)
        fr = f_ref[...][0]  # (16,128)
        o = fr[0:3]
        d = fr[3:6]
        iv = 1.0 / d  # ray_features pre-applied the zero-dir epsilon
        oiv = o * iv
        tmax_row = fr[13:14]
        feats = jnp.concatenate(
            [iv, jnp.zeros((13, 128), jnp.float32)], axis=0
        )
        raw = jax.lax.dot_general(
            page, feats, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (6*128, 128): blocks t1x|t2x|t1y|t2y|t1z|t2z (128 boxes each)
        t1x = raw[0 * 128 : 1 * 128] - oiv[0:1]
        t2x = raw[1 * 128 : 2 * 128] - oiv[0:1]
        t1y = raw[2 * 128 : 3 * 128] - oiv[1:2]
        t2y = raw[3 * 128 : 4 * 128] - oiv[1:2]
        t1z = raw[4 * 128 : 5 * 128] - oiv[2:3]
        t2z = raw[5 * 128 : 6 * 128] - oiv[2:3]
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmaxv = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        # NaN padding columns fail every comparison -> never candidates
        hit = (tmaxv >= tmin) & (tmaxv > 0) & (tmin < tmax_row)
        bits = jnp.where(hit, jnp.int32(1), 0)  # (128 boxes, 128 rays)
        words = []
        for w in range(4):
            acc = jnp.zeros((1, 128), jnp.int32)
            for b in range(32):
                acc = acc | (bits[32 * w + b : 32 * w + b + 1] << b)
            words.append(acc)
        w_ref[...] = jnp.concatenate(words, axis=0)[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def box_hits(
    pages: jnp.ndarray,  # (P, 16, 6*128) f32 box coefficient pages
    feats: jnp.ndarray,  # (G, 16, 128) f32 per-chunk ray features
    chunk_pid: jnp.ndarray,  # (G,) i32 page id per chunk (-1 dead)
    interpret: bool = False,
):
    """Brute-force slab test of each chunk's 128 rays against its page's
    <=128 boxes in one MXU contraction; returns (G, 4, 128) i32 bit
    words — bit b of word w set iff ray hits box 32*w+b within its tmax.

    This replaces tree traversal for candidate ENUMERATION: box
    containment makes {leaf boxes hit} exactly the candidate set, so no
    walk order or stack is needed (accel/cluster.py build_super_tables).
    """
    g = feats.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 16, 6 * 128),
                lambda i, pids: (jnp.maximum(pids[i], 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 16, 128), lambda i, pids: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, 128), lambda i, pids: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _box_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 4, 128), jnp.int32),
        interpret=interpret,
    )(chunk_pid.astype(jnp.int32), pages, feats)


def extract_slots(words: jnp.ndarray, k: int):
    """(m, W) i32 bit words -> (slots (m,k) i32 box indices (-1 pad),
    ovf (m,) bool: more than k bits set).

    Iterative lowest-set-bit removal; the bit index comes from the f32
    exponent of the isolated bit (exact for powers of two; bit 31 via
    uint32 round-trip)."""
    m, W = words.shape
    w = words
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    slots = []
    for _ in range(k):
        has = w != 0
        first = jnp.argmax(has, axis=1).astype(jnp.int32)  # (m,)
        cur = jnp.take_along_axis(w, first[:, None], axis=1)[:, 0]
        low = cur & (-cur)
        low_safe = jnp.maximum(low.astype(jnp.uint32), jnp.uint32(1))
        bit = jnp.rint(
            jnp.log2(low_safe.astype(jnp.float32))
        ).astype(jnp.int32)
        any_ = has.any(axis=1)
        slots.append(jnp.where(any_, first * 32 + bit, -1))
        clear = jnp.where(cols == first[:, None], low[:, None], 0)
        w = w & ~clear
    ovf = (w != 0).any(axis=1)
    return jnp.stack(slots, axis=1), ovf


def ray_features(origin: jnp.ndarray, direction: jnp.ndarray,
                 tmax: jnp.ndarray = None):
    """(N,3),(N,3)[,(N,)] -> (N,16) f32 rows [o | d | 0 | 1 | 0 | tmax@13].

    The o x d term is computed IN-KERNEL from the cluster-local origin
    (o - anchor), so only raw origin/direction travel here.  Row 13
    carries the per-ray clip distance for the box-enumeration kernel
    (zero coefficients everywhere else keep it inert to the cluster-test
    contraction).  The same zero-direction epsilon as the traversal
    kernels keeps the math finite for axis-aligned rays (packet.py).
    """
    d = jnp.where(direction == 0.0, 1e-20, direction)
    n = origin.shape[0]
    one = jnp.ones((n, 1), jnp.float32)
    tm = (jnp.zeros((n, 1), jnp.float32) if tmax is None
          else tmax.reshape(n, 1))
    z3 = jnp.zeros((n, 3), jnp.float32)
    return jnp.concatenate(
        [origin, d, z3, one, z3, tm, jnp.zeros((n, 2), jnp.float32)],
        axis=1,
    )
