#!/usr/bin/env python
"""Lanewalk kernel vs group route on REAL hardware, real tree, real rays.

Builds the hardened sponza proxy, generates production-shaped ray
populations (primary / binned bounce / binned shadow — the same harness
as tools/sim_lanewalk_real.py), and times ops.traverse through the
group route (round-4 default) vs the lanewalk kernel, checking dst
agreement.  THE round-5 paradigm A/B.

Usage: python tools/measure_lanewalk_hw.py [n_tris] [log2_rays]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BIG = 99999999.0


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig, Routing
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.sampling import lights
    from ray_tracer_tpu.utils.jitting import tpu_jit

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 260_000
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    n = 1 << lg
    sc = presets.sponza_proxy(n_tris).compile().device_put()
    print(f"scene: {sc.meta['n_tris']} tris, rope rows {sc.meta['rope_rows']}"
          f", streams {sc.rope_streams.shape} "
          f"({sc.rope_streams.size * 4 / 1e6:.0f} MB)")

    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(sc)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(n, dtype=jnp.int32) % (1920 * 1080)
    prim = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)

    # bounce + shadow populations (deterministic, production-shaped)
    hit = traverse.traverse(
        sc, prim.origin, prim.direction, jnp.ones(n, bool),
        routing=Routing(), need_uv=False, raw=True,
    )
    dst = np.asarray(hit.dst)
    hitm = np.asarray(hit.did_hit)
    rng = np.random.default_rng(3)
    hp = (np.asarray(prim.origin)
          + np.asarray(prim.direction) * np.minimum(dst, 100.0)[:, None])
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    o2 = np.where(hitm[:, None], hp + 1e-4, np.asarray(prim.origin))
    d2 = np.where(hitm[:, None], d2, np.asarray(prim.direction)).astype(
        np.float32
    )
    o2 = o2.astype(np.float32)
    u = rng.random((n, 3)).astype(np.float32)
    l_dir, li, _, l_dist = lights.sample_rect_light(
        sc, jnp.asarray(o2), jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
        jnp.asarray(u[:, 2]),
    )
    l_dir = np.asarray(l_dir).astype(np.float32)
    l_dist = np.asarray(l_dist).astype(np.float32)

    def binned(o, d):
        key = np.asarray(wavefront._bin_key(
            sc, jnp.asarray(o), jnp.asarray(d), jnp.ones(n, bool)))
        srt = np.argsort(key)
        return jnp.asarray(o[srt]), jnp.asarray(d[srt]), srt

    o2b, d2b, _ = binned(o2, d2)
    osb, dsb, srt_s = binned(o2, l_dir)
    clip = jnp.asarray(l_dist[srt_s] * (1 - 1e-3))

    pops = [
        ("primary closest", prim.origin, prim.direction, None, False),
        ("bounce closest ", o2b, d2b, None, False),
        ("shadow anyhit  ", osb, dsb, clip, True),
    ]
    sel = os.environ.get("LW_POPS")  # e.g. "shadow" or "primary,bounce"
    if sel:
        pops = [p for p in pops if any(s in p[0] for s in sel.split(","))]
    act = jnp.ones(n, bool)
    routes = [
        ("group  ", Routing()),
        ("lanewlk", Routing(lanewalk="force")),
    ]
    # LW_PHASE_STEPS is read inside lanewalk_traverse; LW_PS_SWEEP="2,4,8"
    # re-times the lanewalk route per value (group timed once).
    ps_sweep = [int(x) for x in
                os.environ.get("LW_PS_SWEEP", "0").split(",") if x != "0"]
    from ray_tracer_tpu.kernels import lanewalk as lw_mod

    for name, o, d, tm, anyhit in pops:
        res = {}
        for rname, rt in routes:
            sweeps = ps_sweep if (ps_sweep and rname == "lanewlk") else [None]
            for ps in sweeps:
                if ps is not None:
                    os.environ["LW_PHASE_STEPS"] = str(ps)
                    lw_mod.lanewalk_traverse.clear_cache()
                if anyhit:
                    f = tpu_jit(
                        lambda o, d, tm, rt=rt: traverse.traverse_anyhit(
                            sc, o, d, act, tm, routing=rt))
                    args = (o, d, tm)
                else:
                    f = tpu_jit(lambda o, d, rt=rt: traverse.traverse(
                        sc, o, d, act, routing=rt, need_uv=False,
                        raw=True).dst)
                    args = (o, d)
                r = jax.block_until_ready(f(*args))
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    r = jax.block_until_ready(f(*args))
                    best = min(best, time.perf_counter() - t0)
                res[rname] = (best, np.asarray(r))
                tag = f" ps={ps}" if ps is not None else ""
                print(f"{name} {rname}{tag}: {best*1e3:8.2f} ms  "
                      f"{n/best/1e6:7.1f} Mrays/s", flush=True)
        a = res["group  "][1]
        b = res["lanewlk"][1]
        if anyhit:
            agree = np.mean(a == b)
            print(f"{name} occlusion agreement: {agree*100:.3f}%")
        else:
            # group dst prefix vs lanewalk dst: both report tmax on miss
            close = np.isclose(a, b, rtol=1e-5, atol=1e-5)
            print(f"{name} dst agreement: {close.mean()*100:.3f}%  "
                  f"max rel err {np.nanmax(np.abs(a-b)/np.maximum(np.abs(a),1e-6)):.2e}")


if __name__ == "__main__":
    main()
