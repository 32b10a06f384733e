#!/usr/bin/env python
"""Per-bounce wavefront occupancy + timing on the bench workload.

Answers two round-2 design questions:
 * what fraction of bounce/NEE lanes are alive per bounce (sizes the
   payoff of compaction / path regeneration), and
 * wall time per spp-tile step on the real chip.

Usage: python tools/measure_occupancy.py [scene] [width] [height]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracer_tpu import RenderConfig
from ray_tracer_tpu.api import _camera_arrays, scene_camera
from ray_tracer_tpu.integrator import wavefront
from ray_tracer_tpu.scene import presets
from ray_tracer_tpu.utils.jitting import tpu_jit


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "sponza_proxy"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    cfg = RenderConfig(width=width, height=height, bounce_limit=8,
                       max_rays_per_batch=1 << 16)
    if scene_name == "sponza_proxy":
        scene = presets.sponza_proxy(260_000).compile().device_put()
    elif scene_name == "cornell":
        scene = presets.default_scene().compile().device_put()
    else:
        scene = (
            presets.mesh_scene(scene_name, material=presets.WHITE, scale=0.15,
                               position=(0.0, 0.5, 0.0))
            .compile().device_put()
        )
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)

    n_pix = cfg.n_pixels
    tile = min(n_pix, cfg.max_rays_per_batch)

    @tpu_jit(static_argnames=("cfg",))
    def one_tile(scene, rot, pos, fov, aspect, near, t, cfg):
        ids = jnp.minimum(
            t * tile + jnp.arange(tile, dtype=jnp.int32), jnp.int32(n_pix - 1)
        )
        rays = wavefront.raygen(rot, pos, fov, aspect, near, ids,
                                cfg.width, cfg.height)
        c, nr, prof = wavefront.trace(
            scene, rays, ids, jnp.int32(0), jnp.int32(0), cfg,
            with_profile=True,
        )
        return jnp.sum(c), nr, prof

    # middle tile (interesting geometry), warmup then time
    t_mid = jnp.int32((n_pix // tile) // 2)
    cs, nr, prof = one_tile(scene, rot, pos, fov, aspect, near, t_mid, cfg=cfg)
    np.asarray(cs)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        cs, nr, prof = one_tile(scene, rot, pos, fov, aspect, near, t_mid, cfg=cfg)
    np.asarray(cs)
    dt = (time.perf_counter() - t0) / reps

    alive, nee = np.asarray(prof[0]), np.asarray(prof[1])
    nrays = float(np.asarray(nr)[0])  # [semantic, traced] since round 4
    print(f"scene={scene_name} tile={tile} lanes, {dt*1e3:.1f} ms/tile-spp, "
          f"{nrays/dt/1e6:.2f} Mrays/s (events={nrays:.0f})")
    print(f"{'bounce':>6} {'alive%':>8} {'nee%':>8}")
    for j in range(len(alive)):
        print(f"{j:>6} {100*alive[j]/tile:>7.1f}% {100*nee[j]/tile:>7.1f}%")
    tot_segments = alive.sum() + nee.sum() + tile  # + primaries
    static_lanes = tile * (1 + 2 * len(alive))
    print(f"useful traversal lanes: {tot_segments:.0f} / {static_lanes} static "
          f"({100*tot_segments/static_lanes:.1f}% occupancy)")


if __name__ == "__main__":
    main()
