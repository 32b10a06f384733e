"""Probe 4: lanewalk LOOP-OVERHEAD attribution on hardware.

The real kernel measured ~3.2 us/iteration vs the 112 ns raw step
(probe_lane_step.py) — a 30x gap that must come from the per-iteration
control machinery.  This probe times the step loop with each suspect
added incrementally:

  base   : fori, 16 gathers + slab + MT + select (probe 3's step)
  rowmin : + per-row min reduce (8,1) per step
  x1     : + ONE vector->scalar extract per step
  x8     : + EIGHT extracts per step (do they pipeline?)
  when8  : + eight pl.when-guarded (1,2048) VMEM copies per step
  while_ : while_loop with a full-min cond per step instead of fori

Run: python tools/probe_lane_step2.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 16
BIG = 99999999.0


def kern(iters_ref, tabs_ref, ox_ref, oy_ref, oz_ref, ix_ref, out_ref,
         tab_ref, *, mode, n_pages):
    iters = iters_ref[0, 0]
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    inv_x, inv_y, inv_z = 1.0 / ox, 1.0 / oy, 1.0 / oz

    def step(ix, best, bi, i):
        tab = [tabs_ref[f, 0] for f in range(F)]
        g = [jnp.take_along_axis(t, ix, axis=1) for t in tab]
        t1x = (g[0] - ox) * inv_x
        t2x = (g[3] - ox) * inv_x
        t1y = (g[1] - oy) * inv_y
        t2y = (g[4] - oy) * inv_y
        t1z = (g[2] - oz) * inv_z
        t2z = (g[5] - oz) * inv_z
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        bhit = (tmax >= tmin) & (tmax > 0.0) & (tmin < best)
        rx, ry, rz = ox - g[0], oy - g[1], oz - g[2]
        qx = ry * oz - rz * oy
        qy = rz * ox - rx * oz
        qz = rx * oy - ry * ox
        d0 = -(ox * g[9] + oy * g[10] + oz * g[11])
        dinv = 1.0 / d0
        t = (rx * g[9] + ry * g[10] + rz * g[11]) * dinv
        u = (g[6] * qx + g[7] * qy + g[8] * qz) * dinv
        v = -(g[3] * qx + g[4] * qy + g[5] * qz) * dinv
        w = 1.0 - u - v
        ok = (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
        ok &= ~((d0 < 1e-8) & (g[12] > 0.5))
        is_tri = g[13] > 0.5
        tri_t = jnp.where(ok, t, BIG)
        improve = is_tri & (tri_t < best)
        best = jnp.where(improve, tri_t, best)
        bi = jnp.where(improve, i, bi)
        nxt = jnp.where(
            is_tri, g[12].astype(jnp.int32),
            jnp.where(bhit, g[6].astype(jnp.int32),
                      g[7].astype(jnp.int32)),
        )
        ix = (nxt + ix) & 127
        return ix, best, bi

    init = (ix_ref[...], jnp.full((8, 128), BIG, jnp.float32),
            jnp.zeros((8, 128), jnp.int32), jnp.int32(0))

    if mode == "while_":
        def cond(c):
            ix = c[0]
            return (jnp.min(ix) < 1 << 24) & (c[3] < iters)

        def body(c):
            ix, best, bi, i = c
            ix, best, bi = step(ix, best, bi, i)
            return ix, best, bi, i + 1

        ix, best, bi, _ = jax.lax.while_loop(cond, body, init)
    else:
        def body(i, c):
            ix, best, bi, _ = c
            if mode in ("rowmin", "x1", "x8", "when8"):
                rowmin = jnp.min(ix, axis=1, keepdims=True)  # (8,1)
                pg_vec = jax.lax.shift_right_logical(rowmin, 4)
                if mode == "x1":
                    s = jnp.sum(pg_vec[0:1, 0:1])
                    bi = bi + s  # consume
                elif mode in ("x8", "when8"):
                    acc = jnp.int32(0)
                    for r in range(8):
                        pgr = jnp.sum(pg_vec[r : r + 1, 0:1])
                        if mode == "when8":
                            @pl.when(pgr != jnp.int32(-1))
                            def _(pgr=pgr, r=r):
                                tab_ref[pl.ds(r, 1), :] = tabs_ref[
                                    0, pl.ds(pgr % n_pages, 1)
                                ]
                        acc = acc + pgr
                    bi = bi + acc
            ix, best, bi = step(ix, best, bi, i)
            return ix, best, bi, jnp.int32(0)

        ix, best, bi, _ = jax.lax.fori_loop(0, iters, body, init)
    out_ref[...] = best + bi.astype(jnp.float32) + ix.astype(jnp.float32)


def run(j, iters, n_pages=64, reps=5):
    tabs = jax.random.uniform(
        jax.random.PRNGKey(0), (F, n_pages, 8, 128), jnp.float32
    ) + 0.5
    ox, oy, oz = (
        jax.random.uniform(jax.random.PRNGKey(i), (8, 128), jnp.float32) + 0.5
        for i in range(1, 4)
    )
    ix = jax.random.randint(jax.random.PRNGKey(9), (8, 128), 0, 128,
                            jnp.int32)
    it = jnp.full((1, 1), iters, jnp.int32)
    r = j(it, tabs, ox, oy, oz, ix)
    np.asarray(jnp.ravel(r)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = j(it, tabs, ox, oy, oz, ix)
        np.asarray(jnp.ravel(r)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    lo, hi = 30000, 100000
    for mode in ("base", "rowmin", "x1", "x8", "when8", "while_"):
        fn = pl.pallas_call(
            functools.partial(kern, mode=mode, n_pages=64),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, F * 128), jnp.float32)],
        )
        j = jax.jit(fn)
        try:
            t_lo = run(j, lo)
            t_hi = run(j, hi)
            marg = (t_hi - t_lo) / (hi - lo)
            print(f"{mode:7s}: marginal {marg*1e9:8.1f} ns/step")
        except Exception as e:  # noqa: BLE001
            print(f"{mode:7s}: FAILED: {str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
