#!/usr/bin/env python
"""Hardware A/B: multi-stack lane-group walk vs the packet walk.

Times group_traverse (kernels/group.py) against packet_traverse_wide on
production-shaped BINNED bounce rays from the hardened sponza_proxy —
the population the official bench spends its time on — plus coherent
primaries and anyhit shadow rays.  Honest sync: single-element fetch per
output (BENCH_NOTES r4 "Measurement integrity").

Usage: python tools/measure_group.py [n_tris] [log2_rays]
Env: RT_MEASURE_INTERPRET=1 for a CPU smoke run.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(outs):
    for x in outs:
        np.asarray(x.ravel()[0])


def bench(f, reps=3):
    f()  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(f())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    interp = os.environ.get("RT_MEASURE_INTERPRET", "0") == "1"
    if interp:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_tracer_tpu.kernels import packet, group
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else (
        4_000 if interp else 260_000)
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else (12 if interp else 19)
    n = 1 << lg
    sc = presets.sponza_proxy(n_tris).compile().device_put()
    recs = sc.meta.get("wide_leaf_recs", 8)
    print(f"scene sponza_proxy:{n_tris} wide={sc.wide_packed.shape[0]} "
          f"leaf_rows={sc.leaf_rows.shape[0]} recs={recs} rays=2^{lg}")

    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(sc)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(n, dtype=jnp.int32) % (1920 * 1080)
    prim = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)
    tm = jnp.full((n,), 99999999.0)
    out = packet.packet_traverse_wide(
        sc.wide_packed, sc.leaf_rows, prim.origin, prim.direction, tm, 0,
        max_recs=recs, need_uv=False, interpret=interp,
    )
    dst = np.asarray(out[0]); pr = np.asarray(out[1])
    hitm = pr >= 0
    rng = np.random.default_rng(3)
    hp = np.asarray(prim.origin) + np.asarray(prim.direction) * np.minimum(
        dst, 100.0)[:, None]
    srow = np.asarray(sc.shade_slot)[np.maximum(pr, 0)]
    nrm = srow[:, 0:3]
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    din = np.asarray(prim.direction)
    flip = np.einsum("ij,ij->i", nrm, din) > 0
    nrm[flip] = -nrm[flip]
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    f2m = np.einsum("ij,ij->i", d2, nrm) < 0
    d2[f2m] -= 2 * np.einsum(
        "ij,ij->i", d2[f2m], nrm[f2m])[:, None] * nrm[f2m]
    o2 = np.where(hitm[:, None], hp + nrm * 1e-4, np.asarray(prim.origin))
    d2 = np.where(hitm[:, None], d2, np.asarray(prim.direction))
    key = np.asarray(wavefront._bin_key(
        sc, jnp.asarray(o2), jnp.asarray(d2), jnp.ones(n, bool)))
    order = np.argsort(key, kind="stable")
    o2b = jnp.asarray(o2[order]); d2b = jnp.asarray(d2[order])

    pops = {
        "primary": (prim.origin, prim.direction, tm, False),
        "bounce_binned": (o2b, d2b, tm, False),
        "anyhit_binned": (o2b, d2b, jnp.full((n,), 0.35, jnp.float32), True),
    }

    for name, (o, d, t0v, ah) in pops.items():
        f_ref = jax.jit(lambda o=o, d=d, t0v=t0v, ah=ah: (
            packet.packet_traverse_wide(
                sc.wide_packed, sc.leaf_rows, o, d, t0v, 0,
                max_recs=recs, anyhit=ah, need_uv=False, interpret=interp,
            )[:2]
        ))
        t_ref = bench(f_ref)
        ref_out = [np.asarray(x) for x in f_ref()]
        print(f"[{name}] packet2048: {t_ref*1e3:8.2f} ms "
              f"({n/t_ref/1e6:6.2f} Mrays/s)")
        for psize, G in ((2048, 16), (2048, 8), (4096, 32),
                         (4096, 16), (8192, 32), (8192, 64)):
            if interp and psize > 2048:
                continue
            try:
                f_g = jax.jit(lambda o=o, d=d, t0v=t0v, ah=ah, p=psize,
                              G=G: group.group_traverse(
                                  sc.wide_packed, sc.leaf_rows, o, d, t0v,
                                  0, packet_size=p, groups=G, max_recs=recs,
                                  anyhit=ah, interpret=interp))
                t_g = bench(f_g)
            except Exception as e:
                print(f"  group p={psize} G={G}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            g_out = [np.asarray(x) for x in f_g()]
            ncmp = 1 if ah else 2  # anyhit: prim is meaningless
            ok = all(np.array_equal(a, b)
                     for a, b in zip(ref_out[:ncmp], g_out[:ncmp]))
            print(f"  group p={psize:5d} G={G:3d}: {t_g*1e3:8.2f} ms "
                  f"({n/t_g/1e6:6.2f} Mrays/s) x{t_ref/t_g:5.2f} "
                  f"match={ok}")


if __name__ == "__main__":
    main()
