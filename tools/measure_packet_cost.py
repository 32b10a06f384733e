#!/usr/bin/env python
"""Measure packet-kernel fixed costs on the live TPU.

Questions (BENCH_NOTES.md "re-measure" list):
  1. Per-packet fixed cost: slope of wall time vs grid size for ALL-DEAD
     packets (tmax=-BIG => root test fails => while loop never entered).
     This isolates the per-grid-step overhead from traversal work.
  2. Dead vs live packet cost: does sorting dead rays together actually
     buy compaction-like savings?
  3. Packet-size sweep on a live primary-ray workload.

Writes one JSON line per experiment to stdout; run as a background job
(the axon tunnel can hang) and tee to a log.
"""

import json
import os
import sys
import time

import numpy as np

PACKET = int(os.environ.get("RT_PACKET_SIZE", 2048))


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.kernels import packet
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    scene = presets.default_scene().compile().device_put()
    cfg = RenderConfig(width=1024, height=1024, samples_per_pixel=1)
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    rays = wavefront.raygen(rot, pos, fov, aspect, near, ids,
                            cfg.width, cfg.height)
    origin, direction = rays
    n = origin.shape[0]

    REPS = 8

    def timed(fn, *args, **static):
        f = tpu_jit(static_argnames=tuple(static))(fn) if static else tpu_jit()(fn)
        out = f(*args, **static)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # force sync
        t0 = time.perf_counter()
        out = f(*args, **static)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0)

    def run_packets(o, d, tmax, psize, reps):
        def fn(o, d, tmax):
            def one(acc, _):
                dst, prim, u, v, front = packet.packet_traverse_wide(
                    scene.wide_packed, scene.leaf_rows,
                    o, d, tmax, 0,
                    packet_size=psize,
                )
                return acc + jnp.sum(dst * 0 + prim * 0), None

            acc, _ = jax.lax.scan(one, jnp.float32(0), jnp.arange(reps))
            return acc

        return timed(fn, o, d, tmax) / reps

    BIG = 99999999.0

    # --- experiment 1+2: dead vs live at several ray counts (packet 2048)
    for frac_n in (0.25, 0.5, 1.0):
        m = int(n * frac_n) // PACKET * PACKET
        o, d = origin[:m], direction[:m]
        t_live = run_packets(o, d, jnp.full((m,), BIG), PACKET, REPS)
        t_dead = run_packets(o, d, jnp.full((m,), -BIG), PACKET, REPS)
        print(json.dumps({
            "exp": "dead_vs_live", "packet": PACKET, "n_rays": m,
            "g": m // PACKET, "t_live_s": round(t_live, 5),
            "t_dead_s": round(t_dead, 5),
            "live_mrays": round(m / t_live / 1e6, 2),
            "dead_us_per_packet": round(t_dead / (m // PACKET) * 1e6, 1),
        }), flush=True)

    # --- experiment 3: packet-size sweep, all live, full frame
    for psize in (1024, 2048, 4096, 8192):
        m = n // psize * psize
        o, d = origin[:m], direction[:m]
        t = run_packets(o, d, jnp.full((m,), BIG), psize, REPS)
        print(json.dumps({
            "exp": "packet_sweep", "packet": psize, "n_rays": m,
            "mrays": round(m / t / 1e6, 2),
            "us_per_packet": round(t / (m // psize) * 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"error": str(e)[:500]}), file=sys.stderr, flush=True)
        raise
