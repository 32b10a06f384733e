#!/usr/bin/env python
"""Per-step cost decomposition of the lane-group kernel's building blocks.

A synthetic Pallas kernel runs a fixed number of lockstep steps; each
variant enables one more component, so deltas attribute cost:

  pops      G scalar SMEM pops + push-tail machinery (mask from meta)
  gather    + G dynamic-slice row gathers -> (SUB,128) plane
  slab      + 8-child slab test with (SUB,1) column broadcasts
  mask      + per-group lane reductions + packed-word scalar extracts
  mt        + 8-record Moller-Trumbore interpretation
  full      everything (the production step shape)

Codes cycle pseudo-randomly through real node ids, every variant folds
its live values into the output (r3 lesson: DCE produces mirage numbers),
and the loop is long enough (>=1M group-visits) to amortize dispatch.

Usage: python tools/measure_group_step.py [n_tris] [steps] [groups]
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.kernels import group as kgroup

    interp = os.environ.get("RT_MEASURE_INTERPRET", "0") == "1"
    if interp:
        jax.config.update("jax_platforms", "cpu")

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else (
        4_000 if interp else 260_000)
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else (8 if interp else 512)
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    npk = 2 if interp else 64  # packets (grid size)
    sub = 16
    sc = presets.sponza_proxy(n_tris).compile().device_put()
    nodes = sc.wide_packed
    leafs = kgroup.stamp_leaf_rows(sc.leaf_rows)
    W = nodes.shape[0]
    uni = jnp.concatenate([nodes, leafs], axis=0)
    codes_f = nodes[:, 6:70:8]
    meta2 = jnp.concatenate(
        [codes_f, nodes[:, 7:8], jnp.zeros((W, 3), nodes.dtype)], axis=1)
    meta = jnp.nan_to_num(meta2, nan=0.0).astype(jnp.int32).reshape(-1)

    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-3, 3, (npk * sub, 128, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(npk * sub, 128, 3)).astype(np.float32))

    def kern(uni_ref, meta_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
             dz_ref, out_ref, stack_ref, variant="full"):
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
        dx = jnp.where(dx == 0.0, 1e-20, dx)
        dy = jnp.where(dy == 0.0, 1e-20, dy)
        dz = jnp.where(dz == 0.0, 1e-20, dz)
        inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
        oxi, oyi, ozi = ox * inv_x, oy * inv_y, oz * inv_z
        out_ref[...] = jnp.zeros_like(out_ref[...])
        for g in range(groups):
            stack_ref[g * kgroup.G_STACK] = 0

        do_gather = variant in ("gather", "slab", "mask", "mt", "full")
        do_slab = variant in ("slab", "mask", "full")
        do_mask = variant in ("mask", "full")
        do_mt = variant in ("mt", "full")

        def body(i, carry):
            seed = carry
            best = out_ref[0:sub, :] + 1e9
            codes = []
            for g in range(groups):
                # pop (real SMEM read, data-dependent index)
                idx = g * kgroup.G_STACK + ((seed + g) % 4)
                c0 = stack_ref[idx]
                code = (c0 + seed * 131 + g * 7919) % W
                codes.append(code)
            if do_gather:
                rows = [uni_ref[pl.ds(codes[g], 1), :] for g in range(groups)]
                plane = jnp.concatenate(rows, axis=0)
            acc = None
            if do_slab:
                col = lambda j: plane[:, j:j + 1]
                packed = None
                for c in range(8):
                    t1x = col(8 * c + 0) * inv_x - oxi
                    t2x = col(8 * c + 3) * inv_x - oxi
                    t1y = col(8 * c + 1) * inv_y - oyi
                    t2y = col(8 * c + 4) * inv_y - oyi
                    t1z = col(8 * c + 2) * inv_z - ozi
                    t2z = col(8 * c + 5) * inv_z - ozi
                    tmin = jnp.maximum(jnp.maximum(
                        jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                        jnp.minimum(t1z, t2z))
                    tmx = jnp.minimum(jnp.minimum(
                        jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                        jnp.maximum(t1z, t2z))
                    hv = (tmx >= tmin) & (tmx > 0) & (tmin < best)
                    b = jnp.where(hv, jnp.int32(1 << c), 0)
                    packed = b if packed is None else (packed | b)
                acc = packed
            elif do_gather:
                # fold the gathered plane so the load is live
                acc = plane.astype(jnp.int32)

            wordvals = []
            if do_mask:
                gp = acc
                r = gp.shape[0]
                while r > groups:
                    gp = gp[: r // 2] | gp[r // 2:]
                    r //= 2
                spread = lambda m: ((m & 1) | ((m & 2) << 7)
                                    | ((m & 4) << 14) | ((m & 8) << 21))
                s0 = jnp.sum(spread(gp & 0xF), axis=1, keepdims=True)
                s1 = jnp.sum(spread((gp >> 4) & 0xF), axis=1, keepdims=True)
                m8 = jnp.int32(0)
                for k in range(4):
                    m8 = m8 | (jnp.where(((s0 >> (8 * k)) & 0xFF) > 0,
                                         jnp.int32(1), 0) << k)
                    m8 = m8 | (jnp.where(((s1 >> (8 * k)) & 0xFF) > 0,
                                         jnp.int32(1), 0) << (4 + k))
                # near-reorder + 9-bit fields, two groups per word (v2)
                av = plane[:, 7:8].astype(jnp.int32)
                r = av.shape[0]
                while r > groups:
                    av = av[: r // 2]
                    r //= 2
                neg_vec = jnp.where(av == 0, 1, jnp.where(av == 1, 0, 1))
                mrev = jnp.int32(0)
                for k in range(8):
                    mrev = mrev | (((m8 >> k) & 1) << (7 - k))
                m9v = jnp.where(neg_vec == 1, mrev | 256, m8)
                mw = m9v
                r = mw.shape[0]
                while r > max(groups // 2, 1):
                    mw = mw[: r // 2] | (mw[r // 2:] << 16)
                    r //= 2
                for w in range(max(groups // 2, 1)):
                    wordvals.append(jnp.sum(mw[w:w + 1, 0:1]))
            if do_mt:
                cands = None
                for k in range(8):
                    t = kgroup._mt_t(plane, k, ox, oy, oz, dx, dy, dz)
                    cands = t if cands is None else jnp.minimum(cands, t)
                out_ref[0:sub, :] = jnp.minimum(out_ref[0:sub, :], cands)
            elif acc is not None and not do_mask:
                out_ref[0:sub, :] = out_ref[0:sub, :] + 0.0 * acc.astype(
                    jnp.float32)

            # pair-stack tail (mirrors kernels/group.py v2): decode the
            # popped pair, one meta load, one writeback, one push
            layout = kgroup._fold_layout(groups, fields=2, field_shift=16)
            nseed = seed
            for g in range(groups):
                word = (codes[g] << 9) | ((seed + g) & 0x1FF)
                mask = word & 0xFF
                parent = word >> 9
                flag = (word >> 8) & 1
                low = mask & (-mask)
                c = jnp.where((low & 0xF0) != 0, jnp.int32(4), 0)
                c = c + jnp.where(((low >> c) & 0xC) != 0, jnp.int32(2), 0)
                c = c + jnp.where(((low >> c) & 0x2) != 0, jnp.int32(1), 0)
                slot = jnp.where(flag == 1, 7 - c, c)
                child = meta_ref[parent * 12 + slot]
                rem = mask ^ low
                stack_ref[g * kgroup.G_STACK] = (
                    (parent << 9) | (flag << 8) | rem
                )
                if do_mask:
                    wrow, wshift = layout[g]
                    m9 = (wordvals[wrow] >> wshift) & 0x1FF
                else:
                    m9 = jnp.int32(seed & 0x1FF)
                take = (m9 & 0xFF) != 0

                @pl.when(take)
                def _(g=g, child=child, m9=m9):
                    stack_ref[g * kgroup.G_STACK + 1] = (
                        jnp.maximum(child, 0) << 9) | m9

                nseed = nseed + slot + rem
            return nseed % 65536

        seed = jax.lax.fori_loop(0, steps, body, jnp.int32(1))
        out_ref[0:1, 0:1] = out_ref[0:1, 0:1] + seed.astype(jnp.float32)

    row3 = lambda a: a  # (npk*sub,128)
    row_spec = pl.BlockSpec((sub, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    res = {}
    for variant in ("pops", "gather", "slab", "mask", "mt", "full"):
        f = pl.pallas_call(
            functools.partial(kern, variant=variant),
            grid=(npk,),
            in_specs=[full(uni),
                      pl.BlockSpec(meta.shape, lambda i: (0,),
                                   memory_space=pltpu.SMEM)]
            + [row_spec] * 6,
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((npk * sub, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((kgroup.G_STACK * groups,),
                                       jnp.int32)],
            interpret=interp,
        )
        from ray_tracer_tpu.utils.jitting import tpu_jit
        args = (uni, meta, o[:, :, 0], o[:, :, 1], o[:, :, 2],
                d[:, :, 0], d[:, :, 1], d[:, :, 2])
        fj = tpu_jit(lambda *a, f=f: f(*a))
        fj = functools.partial(fj, *args)
        try:
            out = fj()
            np.asarray(out.ravel()[0])
        except Exception as e:
            print(f"{variant}: FAIL {type(e).__name__}: {str(e)[:140]}")
            continue
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fj().ravel()[0])
            best = min(best, time.perf_counter() - t0)
        tot = npk * steps
        res[variant] = best * 1e9 / tot
        print(f"{variant:7s}: {best*1e3:8.2f} ms  "
              f"{res[variant]:8.0f} ns/step  "
              f"{res[variant]/groups:6.1f} ns/group-visit")
    if "pops" in res and "full" in res:
        print("\ndeltas (ns/step):")
        pairs = [("gather", "pops"), ("slab", "gather"),
                 ("mask", "slab"), ("mt", "gather"), ("full", "mask")]
        for b, a in pairs:
            if a in res and b in res:
                print(f"  {b:7s} - {a:7s} = {res[b]-res[a]:8.0f}")


if __name__ == "__main__":
    main()
