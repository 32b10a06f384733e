#!/usr/bin/env python
"""Shape sweep for the group-kernel occlusion route (round 5).

The r5 default routes NEE/shadow occlusion through the group kernel with
order-free pops at the closest-hit shape (packet_size=4096, groups=16).
Occlusion economics differ from closest-hit (early exit kills lanes
fast; no best tracking), so the optimal (packet_size, groups) may too.
Sweeps the grid on production-shaped BINNED shadow rays (same population
construction as tools/measure_anyhit.py) and prints a ms / Mrays/s
table.

Usage: python tools/sweep_anyhit_shape.py [n_rays] [n_tris]
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

    psizes = [int(x) for x in os.environ.get(
        "AH_PSIZES", "2048,4096,8192").split(",")]
    groupss = [int(x) for x in os.environ.get(
        "AH_GROUPSS", "8,16,32").split(",")]
    base_occ = None
    rows = []
    for psize in psizes:
        for grps in groupss:
            if (psize // 128) % grps != 0:
                continue  # groups must divide the packet's sublane count
            group_k.group_traverse.clear_cache()
            f = tpu_jit(lambda o, d, tm: group_k.group_traverse(
                sc.wide_packed, sc.leaf_rows, o, d, tm, 0,
                packet_size=psize, groups=grps, max_recs=recs,
                anyhit=True)[0])
            r = jax.block_until_ready(f(ob, db, clip))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                r = jax.block_until_ready(f(ob, db, clip))
                best = min(best, time.perf_counter() - t0)
            occ = np.asarray(r) < -1.0
            if base_occ is None:
                base_occ = occ
            else:
                agree = (occ == base_occ).mean()
                assert agree == 1.0, (psize, grps, agree)
            rows.append((psize, grps, best))
            print(f"psize={psize:5d} groups={grps:3d}: {best*1e3:8.2f} ms  "
                  f"{n/best/1e6:7.1f} Mrays/s", flush=True)
    best = min(rows, key=lambda r: r[2])
    print(f"best: psize={best[0]} groups={best[1]} "
          f"{n/best[2]/1e6:.1f} Mrays/s; occlusion agreement across all: 100%")


if __name__ == "__main__":
    main()
