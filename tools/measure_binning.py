#!/usr/bin/env python
"""Coherence-recovery ceiling experiment (round 2).

Measures packet_traverse_wide Mrays/s on a scene for:
  primary   - coherent camera rays
  random    - incoherent rays (uniform sphere dirs from surface points)
  oct-sort  - same rays pre-sorted by direction octant (permute NOT timed)
  full-sort - same rays pre-sorted by (octant, morton-of-origin)

The sorted rows bound what ANY in/out-of-kernel compaction can recover;
the gap primary-vs-full-sort is pure origin-spread cost.

NOTE: the axon tunnel costs 40-175 ms per dispatch, so reps run INSIDE one
jitted lax.scan (one dispatch, one readback).
"""
import functools, json, os, time
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.kernels import packet
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    scene_name = os.environ.get("RT_SCENE", "sponza_proxy")
    builders = {
        "cornell": lambda: presets.default_scene(),
        "klein": lambda: presets.mesh_scene(
            "klein_bottle.obj", material=presets.WHITE, scale=0.15,
            position=(0.0, 0.5, 0.0)),
        "sponza_proxy": lambda: presets.sponza_proxy(260_000),
    }
    scene = builders[scene_name]().compile().device_put()
    cfg = RenderConfig(width=1024, height=1024)
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    N = int(os.environ.get("RT_N", 1 << 18))
    REPS = int(os.environ.get("RT_REPS", 8))
    ids = jnp.arange(N, dtype=jnp.int32)
    rays = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1024, 1024)
    o_p = np.asarray(rays.origin); d_p = np.asarray(rays.direction)

    hit = tpu_jit(lambda scene, o, d: traverse.traverse(
        scene, o, d, jnp.ones((N,), bool)))(scene, rays.origin, rays.direction)
    hp = np.asarray(rays.origin
                    + rays.direction * np.asarray(hit.dst)[:, None] * 0.999)
    rng = np.random.default_rng(7)
    v = rng.normal(size=(N, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    perm = rng.permutation(N)
    o_r, d_r = hp[perm], v  # shuffled origins x random dirs

    def key_oct(d):
        return (d[:, 0] < 0) * 1 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 4

    def key_full(o, d):
        k = key_oct(d).astype(np.int64) << 30
        lo, hi = o.min(0), o.max(0) + 1e-6
        cell = ((o - lo) / (hi - lo) * 31.999).astype(np.int64)
        m = 0
        for b in range(5):
            for ax in range(3):
                m |= ((cell[:, ax] >> b) & 1) << (3 * b + ax)
        return k | m

    ord_o = np.argsort(key_oct(d_r), kind="stable")
    ord_f = np.argsort(key_full(o_r, d_r), kind="stable")

    max_recs = 4 if scene.max_leaf_tris <= 4 else 8

    @tpu_jit
    def run(w, l, o, d):
        def one(carry, _):
            tm = jnp.full((N,), packet.BIG) + carry * 0
            dst = packet.packet_traverse_wide(
                w, l, o, d, tm, 0, max_recs=max_recs)[0]
            return jnp.sum(jnp.where(dst < packet.BIG, dst, 0.0)), None
        acc, _ = jax.lax.scan(one, jnp.float32(0), None, length=REPS)
        return acc

    def bench(o, d, label):
        o = jnp.asarray(o); d = jnp.asarray(d)
        _ = np.asarray(run(scene.wide_packed, scene.leaf_rows, o, d))
        t0 = time.perf_counter()
        _ = np.asarray(run(scene.wide_packed, scene.leaf_rows, o, d))
        dt = (time.perf_counter() - t0) / REPS
        print(json.dumps({"scene": scene_name, "case": label,
                          "mrays": round(N / dt / 1e6, 2),
                          "ms": round(dt * 1e3, 2)}), flush=True)

    bench(o_p, d_p, "primary")
    bench(o_r, d_r, "random")
    bench(o_r[ord_o], d_r[ord_o], "oct-sort")
    bench(o_r[ord_f], d_r[ord_f], "full-sort")


if __name__ == "__main__":
    main()
