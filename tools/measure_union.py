#!/usr/bin/env python
"""Per-packet node-union diagnostics on the bench workload (round 2).

The full-path gap is incoherent bounce rays: a packet descends every
node ANY lane wants, so incoherent packets walk a node union far larger
than any single ray's path.  This measures that union directly (kernel
``with_visits`` counters) for:

  * coherent camera primaries,
  * synthetic bounce rays (random surface origins x random directions),
  * the same bounce rays ordered by the production bin key
    (direction octant + origin morton, wavefront._bin_key),

across packet sizes.  Output: visits/packet distribution + Mrays/s per
config — the data that decides whether the next lever is finer binning,
smaller packets, or treelet-restart traversal.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.kernels import packet
    from ray_tracer_tpu.scene import presets

    scene_name = os.environ.get("RT_UNION_SCENE", "sponza_proxy")
    b = (
        presets.sponza_proxy()
        if scene_name == "sponza_proxy"
        else presets.mesh_scene(scene_name)
    )
    scene = b.compile().device_put()
    N = 1 << 18
    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(N, dtype=jnp.int32) % cfg.n_pixels
    prim = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)

    # synthetic bounce load: origins on random triangle surfaces, random
    # sphere directions — the worst-case incoherence the integrator feeds
    # the kernel after one diffuse bounce
    rng = np.random.default_rng(3)
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    ti = rng.integers(0, v0.shape[0], N)
    r1, r2 = rng.random((2, N, 1), np.float32)
    flip = (r1 + r2) > 1.0
    r1 = np.where(flip, 1.0 - r1, r1)
    r2 = np.where(flip, 1.0 - r2, r2)
    bo = v0[ti] + r1 * e1[ti] + r2 * e2[ti]
    bd = rng.normal(size=(N, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)
    bo = jnp.asarray(bo) - bd * 1e-3

    key = wavefront._bin_key(
        scene, jnp.asarray(bo), jnp.asarray(bd), jnp.ones((N,), bool)
    )
    order = jnp.argsort(key)
    bo_s, bd_s = jnp.asarray(bo)[order], jnp.asarray(bd)[order]

    max_recs = scene.meta.get("wide_leaf_recs", 4 if scene.max_leaf_tris <= 4 else 8)

    def run(o, d, p_size, label):
        f = jax.jit(
            functools.partial(
                packet.packet_traverse_wide,
                scene.wide_packed,
                scene.leaf_rows,
                packet_size=p_size,
                max_recs=max_recs,
                with_visits=True,
            )
        )
        tm = jnp.full((N,), packet.BIG)
        out = f(o, d, tm, 0)
        vi = np.asarray(out[5])
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        out = f(o, d, tm, 0)
        jax.block_until_ready(out[0])
        dt = time.perf_counter() - t0
        vl = np.asarray(out[6])
        print(
            json.dumps(
                {
                    "rays": label,
                    "packet": p_size,
                    "mrays": round(N / dt / 1e6, 1),
                    "int_visits_mean": round(float(vi.mean()), 1),
                    "int_visits_p95": int(np.percentile(vi, 95)),
                    "leaf_visits_mean": round(float(vl.mean()), 1),
                    "wide_nodes": int(scene.wide_packed.shape[0]),
                }
            ),
            flush=True,
        )

    for p_size in (1024, 2048, 4096):
        run(prim.origin, prim.direction, p_size, "primary")
        run(jnp.asarray(bo), jnp.asarray(bd), p_size, "bounce-raw")
        run(bo_s, bd_s, p_size, "bounce-binned")


if __name__ == "__main__":
    main()
