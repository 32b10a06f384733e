#!/usr/bin/env python
"""Probe: per-LANE stackless BVH walk primitives on the TPU.

The packet kernel's structural tax is descend-if-ANY-lane-wants: an
incoherent 2048-ray packet walks the union of its lanes' node sets.  A
per-lane walk (each lane advances through its OWN hit/miss-linked node
sequence, like one GPU thread, shaders/raytrace.comp:300-349) has no
union — but needs a per-lane gather of node records, which the VPU does
not natively provide.  Two candidate gather mechanisms:

* mxu: one-hot matmul.  Node page transposed to (F,128) (field rows x
  128 node columns); for each sublane row of lane state, build a
  (128,128) one-hot of its indices (iota==idx broadcast) and gather all
  F fields at once as pageT @ onehot -> (F,128).  Cost is MXU cycles
  (F*128*128 MACs ~ F/128 us at peak) + the one-hot build.
* vpu: 128-way select tree.  mask_r = (idx==r) once per r, then per
  field an FMA accumulate of mask_r * page[r,f].  Pure VPU, no layout
  games, cost ~ (128 + F*128) full-width ops per step.
* dg: Mosaic dynamic gather (round-5 discovery: jnp.take_along_axis
  legalizes along BOTH the lane and sublane dims on this toolchain, see
  tools/probe_lane_gather*.py).  Page field f broadcast as an (8,128)
  vreg (nodes in lanes); take_along_axis(axis=1) with the per-lane idx
  fetches field f for all 1024 lanes in ONE op.  F ops per step for a
  128-node page; 2F + selects for 1024-node pages (lane gather + sublane
  gather compose).

This probe times BOTH on a synthetic 128-node page walked S steps by
8*128 = 1024 lanes (and 16*128 = 2048), prints ns per lane-step, and
times jnp.argsort at wavefront sizes (the page-regroup cost a real
per-lane traversal would pay per page crossing).  Decision input for
the round-3/4 'lanewalk' traversal design (BENCH_NOTES).
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    if os.environ.get("LW_INTERPRET", "0") == "1":
        # sitecustomize force-registers the axon plugin over JAX_PLATFORMS;
        # CPU runs must override through jax.config (tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = 8  # fields per node record: min3 | max3 | hitlink | misslink

    def make_page(rng, n=128):
        # random boxes + forward links so a walk terminates at id 127
        mn = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        ext = rng.uniform(0.05, 0.8, (n, 3)).astype(np.float32)
        mx = mn + ext
        ids = np.arange(n)
        hit = np.minimum(ids + 1, n - 1)
        miss = np.minimum(ids + rng.integers(1, 5, n), n - 1)
        page = np.concatenate(
            [mn, mx, hit[:, None], miss[:, None]], axis=1
        ).astype(np.float32)  # (n, F)
        return page

    def walk_kernel(pageT_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref,
                    iz_ref, out_ref, *, steps, mode, sub):
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        ix, iy, iz = ix_ref[...], iy_ref[...], iz_ref[...]
        oxi, oyi, ozi = ox * ix, oy * iy, oz * iz

        def gather_mxu(idx):
            # per-sublane one-hot matmuls; assemble per-field (sub,128)
            rows = []  # list of (F,128) per sublane
            iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            for s in range(sub):
                sel = idx[s : s + 1, :]  # (1,128)
                oh = (iota == sel).astype(jnp.float32)  # (128,128)
                # HIGHEST: the default bf16 MXU passes truncate the
                # gathered f32 payload (caught on real HW round 5)
                r = jax.lax.dot_general(
                    pageT_ref[...], oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (F,128)
                rows.append(r)
            fields = []
            for f in range(F):
                fields.append(
                    jnp.concatenate([r[f : f + 1, :] for r in rows], axis=0)
                )  # (sub,128)
            return fields

        def gather_vpu(idx):
            accs = [jnp.zeros_like(ox) for _ in range(F)]
            for r in range(128):
                m = (idx == r).astype(jnp.float32)
                row = pageT_ref[:, r : r + 1]  # (F,1)
                for f in range(F):
                    accs[f] = accs[f] + m * row[f, 0]
            return accs

        def gather_dg(idx):
            # one take_along_axis per field: page field row broadcast to
            # all sublanes, nodes live in the 128 lanes
            fields = []
            for f in range(F):
                row = jnp.broadcast_to(pageT_ref[f : f + 1, :], idx.shape)
                fields.append(jnp.take_along_axis(row, idx, axis=1))
            return fields

        gather = {"mxu": gather_mxu, "vpu": gather_vpu, "dg": gather_dg}[mode]

        def body(i, carry):
            idx, acc = carry
            g = gather(idx)
            t1x = g[0] * ix - oxi
            t2x = g[3] * ix - oxi
            t1y = g[1] * iy - oyi
            t2y = g[4] * iy - oyi
            t1z = g[2] * iz - ozi
            t2z = g[5] * iz - ozi
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            hit = (tmax >= tmin) & (tmax > 0)
            nxt = jnp.where(hit, g[6], g[7]).astype(jnp.int32)
            return nxt, acc + tmin
        idx0 = jnp.zeros_like(ox, jnp.int32)
        idx, acc = jax.lax.fori_loop(
            0, steps, body, (idx0, jnp.zeros_like(ox))
        )
        out_ref[...] = acc + idx.astype(jnp.float32)

    @functools.partial(
        jax.jit, static_argnames=("steps", "mode", "sub", "interpret")
    )
    def run(pageT, o, inv, steps, mode, sub, interpret=False):
        spec = pl.BlockSpec((sub, 128), lambda: (0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(
                walk_kernel, steps=steps, mode=mode, sub=sub
            ),
            in_specs=[
                pl.BlockSpec(pageT.shape, lambda: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + [spec] * 6,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((sub, 128), jnp.float32),
            interpret=interpret,
        )(pageT, o[0], o[1], o[2], inv[0], inv[1], inv[2])

    rng = np.random.default_rng(7)
    page = make_page(rng)
    pageT = jnp.asarray(page.T)  # (F,128)

    interp = os.environ.get("LW_INTERPRET", "0") == "1"

    # correctness: both gather modes vs a numpy per-lane oracle
    sub = 8
    o_np = [rng.normal(size=(sub, 128)).astype(np.float32) * 2
            for _ in range(3)]
    d_np = [rng.normal(size=(sub, 128)).astype(np.float32) for _ in range(3)]
    inv_np = [(1.0 / np.where(np.abs(x) < 1e-6, 1e-6, x)).astype(np.float32)
              for x in d_np]

    def oracle(steps):
        idx = np.zeros((sub, 128), np.int32)
        acc = np.zeros((sub, 128), np.float32)
        for _ in range(steps):
            g = [page[idx, f] for f in range(F)]
            t1 = [(g[a] * inv_np[a] - o_np[a] * inv_np[a]) for a in range(3)]
            t2 = [(g[3 + a] * inv_np[a] - o_np[a] * inv_np[a])
                  for a in range(3)]
            tmin = np.maximum(
                np.maximum(np.minimum(t1[0], t2[0]), np.minimum(t1[1], t2[1])),
                np.minimum(t1[2], t2[2]),
            )
            tmax = np.minimum(
                np.minimum(np.maximum(t1[0], t2[0]), np.maximum(t1[1], t2[1])),
                np.maximum(t1[2], t2[2]),
            )
            h = (tmax >= tmin) & (tmax > 0)
            idx = np.where(h, g[6], g[7]).astype(np.int32)
            acc = acc + tmin
        return acc + idx.astype(np.float32)

    o_j = [jnp.asarray(x) for x in o_np]
    inv_j = [jnp.asarray(x) for x in inv_np]
    ref4 = oracle(4)
    for mode in ("mxu", "vpu", "dg"):
        got = np.asarray(run(pageT, o_j, inv_j, 4, mode, sub,
                             interpret=interp))
        err = np.abs(got - ref4).max()
        print(f"check {mode}: max|diff| vs numpy oracle = {err:.2e}")
        assert err < 1e-3, (mode, err)
    if interp:
        return  # interpret mode: correctness only, timings meaningless

    subs = tuple(
        int(x) for x in os.environ.get("LW_SUBS", "8,16").split(",")
    )
    steps_list = tuple(
        int(x) for x in os.environ.get("LW_STEPS", "64,512").split(",")
    )
    modes = tuple(os.environ.get("LW_MODES", "mxu,vpu,dg").split(","))
    marg = {}
    for sub in subs:
        o = [jnp.asarray(rng.normal(size=(sub, 128)).astype(np.float32) * 2)
             for _ in range(3)]
        d = [rng.normal(size=(sub, 128)).astype(np.float32) for _ in range(3)]
        inv = [jnp.asarray(1.0 / np.where(np.abs(x) < 1e-6, 1e-6, x))
               for x in d]
        for mode in modes:
            for steps in steps_list:
                f = lambda: run(pageT, o, inv, steps, mode, sub,
                                interpret=interp)
                jax.block_until_ready(f())
                t0 = time.perf_counter()
                reps = 5
                for _ in range(reps):
                    r = f()
                jax.block_until_ready(r)
                dt = (time.perf_counter() - t0) / reps
                lanes = sub * 128
                marg[(mode, sub, steps)] = dt
                print(
                    f"{mode:4s} sub={sub:2d} steps={steps:4d}: "
                    f"{dt*1e6:9.1f} us  "
                    f"{dt/steps*1e9:8.1f} ns/step  "
                    f"{dt/steps/lanes*1e9:7.3f} ns/lane-step"
                )
            # marginal step cost between the two largest step counts —
            # subtracts the fixed dispatch floor (multi-ms on axon)
            if len(steps_list) >= 2:
                s_lo, s_hi = steps_list[-2], steps_list[-1]
                d_dt = marg[(mode, sub, s_hi)] - marg[(mode, sub, s_lo)]
                d_s = s_hi - s_lo
                print(
                    f"  -> {mode} sub={sub} marginal: "
                    f"{d_dt/d_s*1e9:8.1f} ns/step  "
                    f"{d_dt/d_s/(sub*128)*1e9:7.3f} ns/lane-step"
                )

    # page-regroup cost: argsort at wavefront sizes
    for n in (1 << 17, 1 << 19, 1 << 21):
        keys = jnp.asarray(rng.integers(0, 4096, n).astype(np.int32))
        f = jax.jit(jnp.argsort)
        jax.block_until_ready(f(keys))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = f(keys)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"argsort n={n:8d}: {dt*1e3:7.2f} ms  "
              f"({dt/n*1e9:.2f} ns/ray)")


if __name__ == "__main__":
    main()
