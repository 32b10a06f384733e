#!/usr/bin/env python
"""Solve for the packet kernel's per-interior-visit and per-leaf-visit cost.

Times packet_traverse_wide on several ray populations with different
interior/leaf visit mixes (coherent primaries, binned bounce, raw bounce,
shadow anyhit), reads the kernel's with_visits counters, and solves
time ~ a*interior + b*leaf + c*dispatch by least squares.  The split
decides whether round-3 kernel work targets the interior slab path or the
leaf Moller-Trumbore path (BENCH_NOTES r3).

Usage: python tools/measure_visit_cost.py [scene] [packet_size]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ray_tracer_tpu.kernels import packet
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "sponza_proxy"
    psize = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    if scene_name == "sponza_proxy":
        sc = presets.sponza_proxy(260_000).compile().device_put()
    else:
        sc = presets.mesh_scene(
            scene_name, material=presets.WHITE, scale=0.15,
            position=(0.0, 0.5, 0.0),
        ).compile().device_put()
    n = 1 << 17
    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(sc)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    rng = np.random.default_rng(3)

    ids = jnp.arange(n, dtype=jnp.int32)
    prim = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)

    hit = None

    def trace(o, d, tmax=None, anyhit=False):
        tm = jnp.full((o.shape[0],), 99999999.0) if tmax is None else tmax
        return packet.packet_traverse_wide(
            sc.wide_packed, sc.leaf_rows, o, d, tm, 0,
            packet_size=psize, with_visits=True, anyhit=anyhit,
            max_recs=sc.meta.get("wide_leaf_recs", 8),
            multi_pop=int(os.environ.get("RT_MULTI_POP", 1)),
            mask_mode=os.environ.get("RT_MASK_MODE", "sum2"),
        )

    # primary hits for bounce-ray generation
    out = trace(prim.origin, prim.direction)
    dst = np.asarray(out[0])
    pr = np.asarray(out[1])
    hitm = pr >= 0
    hp = np.asarray(prim.origin) + np.asarray(prim.direction) * np.minimum(
        dst, 100.0
    )[:, None]
    srow = np.asarray(sc.shade_slot)[np.maximum(pr, 0)]
    nrm = srow[:, 0:3]  # vn0 ~ good enough as a surface normal here
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    din = np.asarray(prim.direction)
    flip = np.einsum("ij,ij->i", nrm, din) > 0
    nrm[flip] = -nrm[flip]
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    f2 = np.einsum("ij,ij->i", d2, nrm) < 0
    d2[f2] -= 2 * np.einsum("ij,ij->i", d2[f2], nrm[f2])[:, None] * nrm[f2]
    o2 = hp + nrm * 1e-4
    o2 = np.where(hitm[:, None], o2, np.asarray(prim.origin))
    d2 = np.where(hitm[:, None], d2, np.asarray(prim.direction))
    o2j, d2j = jnp.asarray(o2, jnp.float32), jnp.asarray(d2, jnp.float32)

    # binned ordering of the bounce rays
    key = np.asarray(
        wavefront._bin_key(sc, o2j, d2j, jnp.ones(n, bool))
    )
    order = np.argsort(key, kind="stable")
    o2b, d2b = o2j[order], d2j[order]

    pops = {
        "primaries": (prim.origin, prim.direction, False),
        "bounce_raw": (o2j, d2j, False),
        "bounce_binned": (o2b, d2b, False),
        "bounce_anyhit": (o2b, d2b, True),
    }
    rows = []
    for name, (o, d, ah) in pops.items():
        f = lambda: trace(o, d, anyhit=ah)
        r = jax.block_until_ready(f())
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            r = f()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        vi = int(np.asarray(r[5]).sum())
        vl = int(np.asarray(r[6]).sum())
        g = n // psize
        print(f"{name:14s} {dt*1e3:7.2f} ms  interior {vi:8d}  leaf {vl:8d}"
              f"  ({vi/g:.0f}/{vl/g:.0f} per packet)  "
              f"{n/dt/1e6:6.1f} Mrays/s")
        rows.append((dt, vi, vl))
    A = np.array([[vi, vl, 1.0] for dt, vi, vl in rows])
    y = np.array([dt for dt, vi, vl in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    print(f"\nleast squares: interior {coef[0]*1e9:.0f} ns/visit, "
          f"leaf {coef[1]*1e9:.0f} ns/visit, fixed {coef[2]*1e3:.2f} ms")
    print(f"packet={psize}, n={n}, scene={scene_name}")


if __name__ == "__main__":
    main()
