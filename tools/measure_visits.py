#!/usr/bin/env python
"""Primary-ray Mrays/s per scene + per-packet visit counts (round 2).

Quantifies WHERE sponza-scale traversal time goes: node visits, leaf
visits, and per-visit cost, for coherent primaries vs incoherent rays.
"""
import functools, json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.kernels import packet
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    scenes = {
        "cornell": presets.default_scene(),
        "klein": presets.mesh_scene("klein_bottle.obj", material=presets.WHITE,
                                    scale=0.15, position=(0.0, 0.5, 0.0)),
        "sponza_proxy": presets.sponza_proxy(260_000),
    }
    N = 1 << 18
    cfg = RenderConfig(width=512, height=512)
    for name, b in scenes.items():
        scene = b.compile().device_put()
        cam = scene_camera(scene)
        rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
        ids = jnp.arange(N, dtype=jnp.int32) % (512*512)
        rays = wavefront.raygen(rot, pos, fov, aspect, near, ids, 512, 512)
        fn = tpu_jit(lambda w, l, o, d, t: packet.packet_traverse_wide(
            w, l, o, d, t, 0,
            max_recs=scene.meta.get("wide_leaf_recs", 4 if scene.max_leaf_tris <= 4 else 8))[0])
        f = functools.partial(fn, scene.wide_packed, scene.leaf_rows)
        tm = jnp.full((N,), packet.BIG)
        o, d = rays.origin, rays.direction
        _ = np.asarray(f(o, d, tm).sum())
        t0 = time.perf_counter(); acc = 0.
        for i in range(8):
            acc = f(o, d, tm + acc*0).sum()
        _ = np.asarray(acc)
        dt = (time.perf_counter()-t0)/8
        print(json.dumps({"scene": name, "wide_nodes": int(scene.wide_packed.shape[0]),
                          "leaf_rows": int(scene.leaf_rows.shape[0]),
                          "primary_mrays": round(N/dt/1e6, 2),
                          "us_per_packet": round(dt/ (N//4096) * 1e6, 1)}), flush=True)

if __name__ == "__main__":
    main()
