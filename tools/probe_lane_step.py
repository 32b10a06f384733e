"""Probe 3: FULL lanewalk step cost on hardware.

Models one production step of the per-lane rope-walk paradigm
(tools/sim_lanewalk_real.py): each of 1024 lanes holds a current row id
into a 128-row resident page (stacked per-sublane pages -> one (8,128)
table per field); a step

  * gathers F=16 row fields with take_along_axis(axis=1) (one op each),
  * computes BOTH interpretations of the row -- the AABB slab test
    (fields 0-5 = bmin/bmax, links 6-7) and the Moller-Trumbore test
    (fields 0-11 = v0/e1/e2/n, 12 = flags/next) -- as dense (8,128)
    vector work,
  * selects the next row id per lane (hit/miss/tri-next) and advances.

Reported ns/step at iters steps (dependent chain, like the real walk)
is the per-(8,128)-block step cost; per-lane = /1024.  The sim's
sum-of-page-maxes x this number = the lanewalk traversal ceiling.

Also times a page-switch event: dynamic-slice loads of F rows from a
VMEM (F, n_pages, 128) store into the stacked tables.

Run: python tools/probe_lane_step.py
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


def step_kernel(iters_ref, tabs_ref, ox_ref, oy_ref, oz_ref, ix_ref,
                out_ref, *, with_switch, n_pages):
    iters = iters_ref[0, 0]
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    inv_x, inv_y, inv_z = 1.0 / ox, 1.0 / oy, 1.0 / oz

    def body(i, carry):
        ix, best, bi = carry
        if with_switch:
            # page reload EVERY step (worst case; real walk ~4-16
            # steps/page): F pl.ds row loads re-read per step
            pg = i % n_pages
            tab = [
                tabs_ref[f, pl.ds(pg, 1)][0] for f in range(F)
            ]
        else:
            tab = [tabs_ref[f, 0] for f in range(F)]
        g = [jnp.take_along_axis(t, ix, axis=1) for t in tab]
        # ---- slab interpretation (fields 0-5 bmin/bmax, 6 hit, 7 miss)
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
        # ---- Moller-Trumbore interpretation (v0=0:3 e1=3:6 e2=6:9 n=9:12)
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
        # ---- next id select
        hit_next = g[6].astype(jnp.int32)
        miss_next = g[7].astype(jnp.int32)
        tri_next = g[12].astype(jnp.int32)
        nxt = jnp.where(
            is_tri, tri_next, jnp.where(bhit, hit_next, miss_next)
        )
        ix = (nxt + ix) & 127  # keep in-page (synthetic); dependent chain
        return ix, best, bi

    ix, best, bi = jax.lax.fori_loop(
        0, iters, body, (ix_ref[...],
                         jnp.full((8, 128), BIG, jnp.float32),
                         jnp.zeros((8, 128), jnp.int32)),
    )
    out_ref[...] = best + bi.astype(jnp.float32) + ix.astype(jnp.float32)


def make_fn(with_switch, n_pages=64, interpret=False):
    fn = pl.pallas_call(
        functools.partial(step_kernel, with_switch=with_switch,
                          n_pages=n_pages),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return jax.jit(fn)


def run(j, iters, n_pages=64, reps=5):
    key = jax.random.PRNGKey(0)
    tabs = jax.random.uniform(key, (F, n_pages, 8, 128), jnp.float32) + 0.5
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
    lo, hi = 100000, 300000
    for with_switch in (False, True):
        tag = "step+pageswitch" if with_switch else "step           "
        j = make_fn(with_switch)
        t_lo = run(j, lo)
        t_hi = run(j, hi)
        marg = (t_hi - t_lo) / (hi - lo)
        print(f"{tag}: raw {t_hi/hi*1e9:7.1f} ns/step @ {hi}, marginal "
              f"{marg*1e9:7.1f} ns/step ({marg/1024*1e9:6.3f} ns/lane-step)")


if __name__ == "__main__":
    main()
