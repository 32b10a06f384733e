#!/usr/bin/env python
"""Measure the cluster pipeline's stage costs on the real chip.

Stages timed on a production-shaped bounce-ray population (the
measure_visit_cost generator):

1. sort/scatter glue in isolation: jnp.argsort + lax.sort_key_val at
   pair-phase sizes, and .at[].min scatter — the pipeline's biggest
   unknowns on TPU.
2. the enum walk alone (emit_leaves packet walk over the cluster BVH8).
3. the chunk test kernel alone (ns/chunk — answers whether Mosaic runs
   the K=16 contraction at K-proportional cost or pads to 128).
4. end-to-end cluster_traverse vs the single-phase packet walk.

Usage: python tools/measure_cluster.py [n_tris] [t_c]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(r):
    # Single-ELEMENT host fetch per output: block_until_ready has
    # returned early on the axon tunnel (r4 knob sweep, cell 1), and a
    # full np.asarray drags the whole buffer through the tunnel
    # (~50 MB/s — a 64 MB sort result added ~1.3 s to a 1 ms kernel).
    # Fetching one element waits for the producing computation and
    # moves 4 bytes.
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree.leaves(r):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(jnp.ravel(leaf)[0])
        else:
            np.asarray(leaf)
    return r


def bench(f, reps=3):
    _sync(f())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    # RT_MEASURE_INTERPRET=1: CPU interpret-mode smoke run (tiny sizes) so
    # the campaign script is known-runnable before a hardware window.
    interp = os.environ.get("RT_MEASURE_INTERPRET", "0") == "1"
    if interp:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_tracer_tpu.config import Routing
    from ray_tracer_tpu.kernels import packet, cluster as kcluster
    from ray_tracer_tpu.ops import cluster_trace
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else (
        4_000 if interp else 260_000)
    t_c = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    sc = presets.sponza_proxy(n_tris).compile(cluster_t_c=t_c).device_put()
    C = sc.meta["n_clusters"]
    print(f"scene: sponza_proxy:{n_tris} C={C} t_c={t_c} "
          f"cwide={sc.cwide_packed.shape[0]} wide={sc.wide_packed.shape[0]}")

    # ---- 1. sort / scatter glue
    rng = np.random.default_rng(3)
    for m in ((1 << 12,) if interp else (1 << 19, 1 << 21, 1 << 23)):
        keys = jnp.asarray(rng.integers(0, C, m).astype(np.int32))
        vals = jnp.arange(m, dtype=jnp.int32)
        f1 = jax.jit(jnp.argsort)
        t1 = bench(lambda: f1(keys))
        f2 = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
        t2 = bench(lambda: f2(keys, vals))
        tv = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
        ridx = jnp.asarray(rng.integers(0, 1 << 17, m).astype(np.int32))
        f3 = jax.jit(
            lambda r, t: jnp.full((1 << 17,), 9e9, jnp.float32).at[r].min(t)
        )
        t3 = bench(lambda: f3(ridx, tv))
        print(f"m={m:9d}: argsort {t1*1e3:7.2f} ms  sort_kv {t2*1e3:7.2f} ms"
              f"  scatter-min {t3*1e3:7.2f} ms")

    # ---- bounce-ray population
    n = 1 << 12 if interp else 1 << 17
    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(sc)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(n, dtype=jnp.int32)
    prim = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)
    tm = jnp.full((n,), 99999999.0)
    out = packet.packet_traverse_wide(
        sc.wide_packed, sc.leaf_rows, prim.origin, prim.direction, tm, 0,
        max_recs=sc.meta.get("wide_leaf_recs", 8), need_uv=False,
        interpret=interp,
    )
    dst = np.asarray(out[0]); pr = np.asarray(out[1])
    hitm = pr >= 0
    hp = np.asarray(prim.origin) + np.asarray(prim.direction) * np.minimum(
        dst, 100.0)[:, None]
    srow = np.asarray(sc.shade_slot)[np.maximum(pr, 0)]
    nrm = srow[:, 0:3]
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    din = np.asarray(prim.direction)
    flip = np.einsum("ij,ij->i", nrm, din) > 0
    nrm[flip] = -nrm[flip]
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    f2m = np.einsum("ij,ij->i", d2, nrm) < 0
    d2[f2m] -= 2 * np.einsum("ij,ij->i", d2[f2m], nrm[f2m])[:, None] * nrm[f2m]
    o2 = np.where(hitm[:, None], hp + nrm * 1e-4, np.asarray(prim.origin))
    d2 = np.where(hitm[:, None], d2, np.asarray(prim.direction))
    key = np.asarray(wavefront._bin_key(
        sc, jnp.asarray(o2), jnp.asarray(d2), jnp.ones(n, bool)))
    order = np.argsort(key, kind="stable")
    o2b = jnp.asarray(o2[order]); d2b = jnp.asarray(d2[order])

    rt = Routing.from_env()

    # ---- 2a. packet-emit enum walk alone
    dummy = jnp.full((1, 128), np.nan, jnp.float32)
    K = rt.cluster_k

    def enum():
        return packet.packet_traverse_wide(
            sc.cwide_packed, dummy, o2b, d2b, tm, 0, top_k=K,
            emit_leaves=True, need_uv=False, mask_mode=rt.mask_mode,
            packet_size=rt.cluster_enum_packet, interpret=interp,
        )
    te = bench(enum)
    out = enum()
    slots, ovf = np.asarray(out[5]), np.asarray(out[6])
    cnt = (slots >= 0).sum(1)
    print(f"enum/packet: {te*1e3:.2f} ms ({n/te/1e6:.1f} Mrays/s)  "
          f"cand mean {cnt.mean():.2f} p95 {np.percentile(cnt,95):.0f} "
          f"ovf {(ovf>0).mean()*100:.2f}%")

    # ---- 2b. box-matmul enum alone (both levels + extraction + glue)
    if sc.meta.get("n_supers", 0):
        import functools as _ft

        lane_active = jnp.ones((n,), bool)

        @jax.jit
        def enum_boxes():
            feats = kcluster.ray_features(o2b, d2b, tm)
            return cluster_trace._enum_boxes(
                sc, feats, rt, interp, lane_active
            )
        tb = bench(enum_boxes)
        pc, pr, ob = enum_boxes()
        live = int(np.asarray(pc < 2**30).sum())
        print(f"enum/boxes:  {tb*1e3:.2f} ms ({n/tb/1e6:.1f} Mrays/s)  "
              f"pairs {live} ({live/n:.2f}/ray)  "
              f"ovf {np.asarray(ob).mean()*100:.2f}%")

    # ---- 3. chunk kernel alone (full occupancy, synthetic grouping)
    g = 32 if interp else 4096
    cids = jnp.asarray(rng.integers(0, C, g).astype(np.int32))
    feats = kcluster.ray_features(o2b, d2b)  # (n,16)
    fch = jnp.broadcast_to(
        feats[:128].T[None], (g, 16, 128)
    ).copy() if hasattr(jnp.ndarray, "copy") else jnp.tile(
        feats[:128].T[None], (g, 1, 1))
    f4 = lambda: kcluster.cluster_pairs_test(sc.clus_mt, fch, cids, t_c=t_c,
                                             interpret=interp)
    t4 = bench(f4)
    print(f"chunk kernel: {t4/g*1e9:.0f} ns/chunk "
          f"({t4/g/128/t_c*1e12:.1f} ps/pair-test, {g} chunks {t4*1e3:.2f} ms)")

    # ---- 4. end-to-end vs single-phase packet walk
    def cl():
        return cluster_trace.cluster_traverse(
            sc, o2b, d2b, tm, rt, interp, need_uv=False)
    t5 = bench(cl)
    def pk():
        return packet.packet_traverse_wide(
            sc.wide_packed, sc.leaf_rows, o2b, d2b, tm, 0,
            max_recs=sc.meta.get("wide_leaf_recs", 8), need_uv=False,
            mask_mode=rt.mask_mode, multi_pop=rt.multi_pop, interpret=interp,
        )
    t6 = bench(pk)
    # correctness cross-check on this population
    dc = np.asarray(cl()[0]); dp = np.asarray(pk()[0])
    mism = np.abs(dc - dp) > 1e-3 * np.maximum(1, np.abs(dp))
    print(f"cluster e2e: {t5*1e3:.2f} ms ({n/t5/1e6:.2f} Mrays/s)   "
          f"packet walk: {t6*1e3:.2f} ms ({n/t6/1e6:.2f} Mrays/s)   "
          f"dst mismatches {mism.sum()}/{n}")


if __name__ == "__main__":
    main()
