#!/usr/bin/env python
"""Does spatial sorting rescue incoherent-ray packet traversal?

Generates worst-case bounce-like rays (random origins inside the scene
bounds, random directions), then measures raw packet-kernel throughput:
  a) unsorted
  b) sorted by 9-bit Morton(origin) + 3-bit direction octant
  c) sorted, at several packet sizes
The sort itself is done host-side here — this isolates the TRAVERSAL gain;
the integrator's sort cost is measured separately.
"""

import json
import os
import sys
import time

import numpy as np


def morton_octant_key(origin, direction, lo, hi, bits=3):
    q = ((origin - lo) / np.maximum(hi - lo, 1e-9) * (1 << bits)).astype(np.int64)
    q = np.clip(q, 0, (1 << bits) - 1)

    def spread(x):
        out = np.zeros_like(x)
        for b in range(bits):
            out |= ((x >> b) & 1) << (3 * b)
        return out

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    octant = (
        (direction[:, 0] < 0).astype(np.int64)
        + 2 * (direction[:, 1] < 0)
        + 4 * (direction[:, 2] < 0)
    )
    return (morton << 3) | octant


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracer_tpu.kernels import packet
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    name = os.environ.get("RT_COH_SCENE", "klein")
    if name == "klein":
        sb = presets.mesh_scene("klein_bottle.obj", material=presets.WHITE,
                                scale=0.15, position=(0.0, 0.5, 0.0))
    elif name == "sponza_proxy":
        sb = presets.sponza_proxy(260_000)
    else:
        sb = presets.default_scene()
    scene = sb.compile().device_put()

    N = 1 << 20
    rs = np.random.RandomState(0)
    lo = np.array([-1.0, -1.5, -1.0], np.float32)
    hi = np.array([1.0, 1.5, 1.0], np.float32)
    origin = (rs.rand(N, 3).astype(np.float32) * (hi - lo) + lo)
    direction = rs.randn(N, 3).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)

    key = morton_octant_key(origin, direction, lo, hi)
    order = np.argsort(key, kind="stable")

    BIG = 99999999.0

    def run(o, d, psize, reps=4, label=""):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        tmax = jnp.full((N,), BIG)

        @tpu_jit(static_argnames=("psize",))
        def fn(o, d, tmax, psize):
            def one(acc, _):
                dst, prim, u, v, front = packet.packet_traverse_wide(
                    scene.wide_packed, scene.leaf_rows,
                    o, d, tmax, 0, packet_size=psize,
                )
                return acc + jnp.sum(prim.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(one, jnp.float32(0),
                                  jnp.arange(reps, dtype=jnp.int32))
            return acc

        out = fn(o, d, tmax, psize=psize)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        out = fn(o, d, tmax, psize=psize)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "scene": name, "case": label, "packet": psize,
            "mrays": round(N / dt / 1e6, 2),
        }), flush=True)

    run(origin, direction, 2048, label="unsorted")
    run(origin[order], direction[order], 2048, label="sorted")
    for psize in (1024, 4096):
        run(origin[order], direction[order], psize, label="sorted")
        run(origin, direction, psize, label="unsorted")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"error": str(e)[:500]}), file=sys.stderr, flush=True)
        raise
