#!/usr/bin/env python
"""Wavefront population probe: lanes = pixels vs lanes = (pixel, sample).

The whole-frame wavefront table (BENCH_NOTES r3) rose monotonically with
population — 2^18 1.57 -> 2^21 (whole 1080p frame) 2.33 Mrays/s — because
coherence binning clusters better from a larger pool, and the pool was
capped at one frame of PIXELS (trace_wave lanes carried a pixel and ran
its n_spp samples sequentially by regeneration).  This probes the next
doublings: spp-many lanes per pixel, each owning ONE sample (per-lane
``sample_base``), which multiplies the binnable pool by spp without
changing any RNG stream (streams are keyed by (pixel, sample), both
present either way).

Round-4 hardware verdicts (sponza_proxy 260k @1080p, v5e):
  spp2: 3.064 -> 3.440 Mrays/s (+12%)   spp4: 3.162 -> 3.675 (+16%)
=> production default: RenderConfig.lane_pool auto (1<<23); trace_wave
expands internally (wavefront._lane_groups).  This probe now times the
PRODUCTION wrapper at both settings (lane_pool=1 = the round-3
pixel-lane schedule) so the A/B stays re-runnable.

Usage: python tools/measure_pop.py   (env RT_POP_SPP, default 2;
RT_POP_POOLS comma list of lane_pool values, default "1,0")
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracer_tpu import RenderConfig
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    spp = int(os.environ.get("RT_POP_SPP", 2))
    pools = [int(x) for x in os.environ.get("RT_POP_POOLS", "1,0").split(",")]
    scene = presets.sponza_proxy(260_000).compile().device_put()
    cam = scene_camera(scene)
    base = RenderConfig(width=1920, height=1080, bounce_limit=8,
                        max_rays_per_batch=1 << 21)
    rot, pos, fov, aspect, near = _camera_arrays(cam, base)
    n_pix = base.n_pixels
    ids = jnp.arange(n_pix, dtype=jnp.int32)

    @tpu_jit(static_argnames=("cfg",))
    def frame(scene, rot, pos, fov, aspect, near, cfg):
        c, nr = wavefront.trace_wave(
            scene, rot, pos, fov, aspect, near, ids, jnp.int32(0),
            jnp.int32(0), spp, cfg, with_stats=True,
        )
        return jnp.sum(c), nr

    for pool in pools:
        cfg = base.replace(lane_pool=pool)
        g = wavefront._lane_groups(n_pix, spp, cfg)
        # warm (compile) then 2 timed reps; element-fetch sync (see
        # "Measurement integrity on the axon tunnel", BENCH_NOTES r4).
        c, nr = frame(scene, rot, pos, fov, aspect, near, cfg=cfg)
        float(np.asarray(c))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            c, nr = frame(scene, rot, pos, fov, aspect, near, cfg=cfg)
            cs = float(np.asarray(c))
            nr0 = float(np.asarray(nr.ravel()[0]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({
            "lane_pool": pool, "g": g, "s": round(best, 3),
            "mrays_sem": round(nr0 / best / 1e6, 3),
            "checksum": round(cs, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
