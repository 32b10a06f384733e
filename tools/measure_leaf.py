#!/usr/bin/env python
"""Leaf-granularity A/B on the official bench workload.

``max_leaf_tris`` trades interior visits against per-leaf-visit record
unrolls (4-record rows skip half the NaN-padded MT tests; 8-record rows
halve leaf COUNT and enable the sibling row merge).  The current auto
rule (8 for >120k tris, scene/builder.py:221) predates lane pooling and
the mxu mask mode, so re-measure the choice at today's schedule.

Usage: python tools/measure_leaf.py   (env RT_LEAF_SIZES, default "4,8")
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax  # noqa: F401
    import jax.numpy as jnp

    from ray_tracer_tpu import RenderConfig
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    sizes = [int(x) for x in os.environ.get("RT_LEAF_SIZES", "4,8").split(",")]
    spp = int(os.environ.get("RT_LEAF_SPP", 2))
    cfg = RenderConfig(width=1920, height=1080, bounce_limit=8,
                       max_rays_per_batch=1 << 21)

    @tpu_jit(static_argnames=("cfg",))
    def frame(scene, rot, pos, fov, aspect, near, frame_i, cfg):
        ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
        c, nr = wavefront.trace_wave(
            scene, rot, pos, fov, aspect, near, ids, frame_i, jnp.int32(0),
            spp, cfg, with_stats=True,
        )
        return jnp.sum(c), nr

    for ml in sizes:
        scene = presets.sponza_proxy(260_000).compile(
            max_leaf_tris=ml).device_put()
        cam = scene_camera(scene)
        rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
        c, nr = frame(scene, rot, pos, fov, aspect, near, jnp.int32(0),
                      cfg=cfg)
        float(np.asarray(c))  # warm/compile, element-fetch sync
        best = None
        for rep in (1, 2):
            t0 = time.perf_counter()
            c, nr = frame(scene, rot, pos, fov, aspect, near,
                          jnp.int32(rep), cfg=cfg)
            cs = float(np.asarray(c))
            nr0 = float(np.asarray(nr.ravel()[0]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({
            "max_leaf_tris": ml, "s": round(best, 3),
            "mrays_sem": round(nr0 / best / 1e6, 3),
            "checksum": round(cs, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
