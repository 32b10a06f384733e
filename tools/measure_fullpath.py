#!/usr/bin/env python
"""Full-path (trace with NEE + bounces) tuning sweep on the live TPU.

Decides the config defaults BENCH_NOTES.md round-1 list deferred to real
hardware: sort_bounce_rays on/off, packet size, scene placement.
One JSON line per point.  Run after bench.py finishes (single chip).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    wanted = os.environ.get(
        "RT_SWEEP_SCENES", "cornell,klein,sponza_proxy"
    ).split(",")
    sorts = [
        s == "1" for s in os.environ.get("RT_SWEEP_SORTS", "0,1").split(",")
    ]
    builders = {
        "cornell": lambda: presets.default_scene(),
        "klein": lambda: presets.mesh_scene(
            "klein_bottle.obj", material=presets.WHITE, scale=0.15,
            position=(0.0, 0.5, 0.0),
        ),
        "sponza_proxy": lambda: presets.sponza_proxy(260_000),
    }
    scenes = {
        k: b().compile().device_put()
        for k, b in builders.items() if k in wanted
    }

    def run_full(scene, cfg, n_rays, reps=4):
        @tpu_jit(static_argnames=("cfg",))
        def fn(scene, rot, pos, fov, aspect, near, ids, cfg):
            def one(acc, s):
                rays = wavefront.raygen(
                    rot, pos, fov, aspect, near, ids, cfg.width, cfg.height
                )
                c, nr = wavefront.trace(scene, rays, ids, jnp.int32(0), s,
                                        cfg, with_stats=True)
                return (acc[0] + jnp.sum(c), acc[1] + nr), None

            acc, _ = jax.lax.scan(
                one,
                (jnp.float32(0), jnp.zeros((2,), jnp.float32)),
                jnp.arange(reps, dtype=jnp.int32),
            )
            return acc

        cam = scene_camera(scene)
        rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
        ids = jnp.arange(n_rays, dtype=jnp.int32)
        out = fn(scene, rot, pos, fov, aspect, near, ids, cfg=cfg)
        _ = np.asarray(out[0])
        t0 = time.perf_counter()
        out = fn(scene, rot, pos, fov, aspect, near, ids, cfg=cfg)
        nr = float(np.asarray(out[1])[0])  # semantic count (see wavefront)
        dt = time.perf_counter() - t0
        return nr / dt / 1e6, nr / reps

    N = 1 << 20  # one 1024^2 frame worth of primaries per rep
    base = RenderConfig(width=1024, height=1024, bounce_limit=8)

    for name, scene in scenes.items():
        for sort in sorts:
            cfg = dataclasses.replace(base, sort_bounce_rays=sort)
            mrays, nr = run_full(scene, cfg, N)
            print(json.dumps({
                "exp": "fullpath", "scene": name, "sort": sort,
                "packet": int(os.environ.get("RT_PACKET_SIZE", 2048)),
                "rt_packet": os.environ.get("RT_PACKET", "auto"),
                "rt_wide": os.environ.get("RT_WIDE", "1"),
                "mrays": round(mrays, 2),
                "rays_per_primary": round(nr / N, 2),
            }), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"error": str(e)[:500]}), file=sys.stderr, flush=True)
        raise
