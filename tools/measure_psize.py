#!/usr/bin/env python
"""Packet-size sweep for incoherent (bounce-shaped) rays, sorted vs not."""
import functools, json, os, sys, time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def main():
    import jax, jax.numpy as jnp
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.kernels import packet
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    scene = presets.sponza_proxy(260_000).compile().device_put()
    cfg = RenderConfig(width=1024, height=1024)
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    N = 1 << 18
    REPS = 8
    ids = jnp.arange(N, dtype=jnp.int32)
    rays = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1024, 1024)
    hit = tpu_jit(lambda scene, o, d: traverse.traverse(
        scene, o, d, jnp.ones((N,), bool)))(scene, rays.origin, rays.direction)
    hp = np.asarray(rays.origin
                    + rays.direction * np.asarray(hit.dst)[:, None] * 0.999)
    rng = np.random.default_rng(7)
    v = rng.normal(size=(N, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    perm = rng.permutation(N)
    o_r, d_r = hp[perm], v

    def key_full(o, d):
        k = ((d[:,0]<0)*1 + (d[:,1]<0)*2 + (d[:,2]<0)*4).astype(np.int64) << 30
        lo, hi = o.min(0), o.max(0) + 1e-6
        cell = ((o - lo) / (hi - lo) * 31.999).astype(np.int64)
        m = 0
        for b in range(5):
            for ax in range(3):
                m |= ((cell[:, ax] >> b) & 1) << (3*b + ax)
        return k | m
    ord_f = np.argsort(key_full(o_r, d_r), kind="stable")
    o_s, d_s = o_r[ord_f], d_r[ord_f]

    # Mosaic pins ray blocks at (8,128) sublane granularity -> min 1024.
    for p in (1024, 2048, 4096):
        @tpu_jit(static_argnames=("ps",))
        def run(w, l, o, d, ps):
            def one(carry, _):
                tm = jnp.full((N,), packet.BIG) + carry * 0
                dst = packet.packet_traverse_wide(
                    w, l, o, d, tm, 0, max_recs=8, packet_size=ps)[0]
                return jnp.sum(jnp.where(dst < packet.BIG, dst, 0.0)), None
            acc, _ = jax.lax.scan(one, jnp.float32(0), None, length=REPS)
            return acc
        for label, (o, d) in (("random", (o_r, d_r)), ("sorted", (o_s, d_s))):
            o = jnp.asarray(o); d = jnp.asarray(d)
            _ = np.asarray(run(scene.wide_packed, scene.leaf_rows, o, d, ps=p))
            t0 = time.perf_counter()
            _ = np.asarray(run(scene.wide_packed, scene.leaf_rows, o, d, ps=p))
            dt = (time.perf_counter() - t0) / REPS
            print(json.dumps({"p": p, "case": label,
                              "mrays": round(N/dt/1e6, 2),
                              "ms": round(dt*1e3, 2)}), flush=True)

if __name__ == "__main__":
    main()
