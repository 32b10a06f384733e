#!/usr/bin/env python
"""Hardware A/B for the occlusion (anyhit) traversal routes (round-5
VERDICT item 2).

Production-shaped shadow rays on the official bench scene: primary hits
at 1080p -> rect-light samples -> shadow segments, coherence-binned by
the production shadow key.  Times four kernel variants:

  packet  x {order-free, near-first}   (RT_ANYHIT_NEARFIRST A/B)
  group   x {order-free, near-first}

plus occlusion-agreement checks across all variants.  The near-first
runs clear the jit caches (the ordering flag is read from the env at
trace time).

Usage: python tools/measure_anyhit.py [n_rays] [n_tris]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ray_tracer_tpu import RenderConfig
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import Routing
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.kernels import group as group_k
    from ray_tracer_tpu.kernels import packet as packet_k
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.sampling import lights
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 260_000
    sc = presets.sponza_proxy(n_tris).compile().device_put()
    recs = sc.meta.get("wide_leaf_recs", 8)

    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(sc)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(n, dtype=jnp.int32) % (1920 * 1080)
    prim = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)
    hit = traverse.traverse(
        sc, prim.origin, prim.direction, jnp.ones(n, bool),
        routing=Routing(), need_uv=False, raw=True,
    )
    dst = np.asarray(hit.dst)
    hitm = np.asarray(hit.did_hit)
    rng = np.random.default_rng(3)
    hp = (np.asarray(prim.origin)
          + np.asarray(prim.direction) * np.minimum(dst, 100.0)[:, None])
    o2 = np.where(hitm[:, None], hp + 1e-4, np.asarray(prim.origin))
    o2 = o2.astype(np.float32)
    u = rng.random((n, 3)).astype(np.float32)
    l_dir, li, _, l_dist = lights.sample_rect_light(
        sc, jnp.asarray(o2), jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
        jnp.asarray(u[:, 2]),
    )
    l_dir = np.asarray(l_dir).astype(np.float32)
    l_dist = np.asarray(l_dist).astype(np.float32)

    key = np.asarray(wavefront._bin_key(
        sc, jnp.asarray(o2), jnp.asarray(l_dir), jnp.ones(n, bool)))
    srt = np.argsort(key)
    ob = jnp.asarray(o2[srt])
    db = jnp.asarray(l_dir[srt])
    clip = jnp.asarray(l_dist[srt] * (1 - 1e-3))

    variants = [
        ("packet order-free", "packet", "0"),
        ("packet near-first ", "packet", "1"),
        ("group  order-free", "group", "0"),
        ("group  near-first ", "group", "1"),
    ]
    results = {}
    for pop_name, o, d, tm in [
        ("binned  ", ob, db, clip),
        ("unbinned", jnp.asarray(o2), jnp.asarray(l_dir),
         jnp.asarray(l_dist * (1 - 1e-3))),
    ]:
        for name, route, nearfirst in variants:
            os.environ["RT_ANYHIT_NEARFIRST"] = nearfirst
            packet_k.packet_traverse_wide.clear_cache()
            group_k.group_traverse.clear_cache()
            if route == "packet":
                f = tpu_jit(lambda o, d, tm: packet_k.packet_traverse_wide(
                    sc.wide_packed, sc.leaf_rows, o, d, tm, 0,
                    max_recs=recs, anyhit=True, need_uv=False)[0])
            else:
                psize = int(os.environ.get("AH_PSIZE", 4096))
                grps = int(os.environ.get("AH_GROUPS", 16))
                f = tpu_jit(lambda o, d, tm: group_k.group_traverse(
                    sc.wide_packed, sc.leaf_rows, o, d, tm, 0,
                    packet_size=psize, groups=grps, max_recs=recs,
                    anyhit=True)[0])
            r = jax.block_until_ready(f(o, d, tm))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                r = jax.block_until_ready(f(o, d, tm))
                best = min(best, time.perf_counter() - t0)
            occ = np.asarray(r) < -1.0
            results[(pop_name, name)] = (best, occ)
            print(f"{pop_name} {name}: {best*1e3:8.2f} ms  "
                  f"{n/best/1e6:7.1f} Mrays/s  occluded {occ.mean()*100:.2f}%",
                  flush=True)
        base = results[(pop_name, variants[0][0])][1]
        for name, _, _ in variants[1:]:
            agree = (results[(pop_name, name)][1] == base).mean()
            assert agree == 1.0, (pop_name, name, agree)
        print(f"{pop_name} occlusion agreement across variants: 100%")
    os.environ.pop("RT_ANYHIT_NEARFIRST", None)


if __name__ == "__main__":
    main()
