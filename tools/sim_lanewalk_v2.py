#!/usr/bin/env python
"""EXACT lanewalk-v2 phase simulator on the real row streams.

The hardware A/B (tools/measure_lanewalk_hw.py, r5) measured v2 at
113 ns/ray primary / 180 us per 1024-lane block bounce — 10x the
row-gang sim projection.  The old sim (sim_lanewalk_real.gang_walk)
modeled pages in NODE id space with 1 step per leaf visit; the kernel
walks ROW streams (1 BOX row + cnt TRI rows per leaf, 3.9x more rows)
and quantizes progress into phases of `phase_steps` fixed-page steps.
This sim replays kernels/lanewalk._lanewalk_kernel semantics EXACTLY
(same row tables via build_rope_streams, same per-gang resident-page
rule, same inner-step active mask) and reports, per variant:

  phases/block, inner-step utilization, and predicted us/block under
  T = phases * (B_fixed + phase_steps * S_step(page))

with S_step(128) = 112 ns measured (probe_lane_step) and B_fixed fit
from the v2 hardware point.  Variants: phase_steps x PAGE rows.

Usage: python tools/sim_lanewalk_v2.py [n_tris] [log2_rays]
Env: LWV2_PS="2,4,8,16"  LWV2_PAGES="128,256,512"  LWV2_POPS=...
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BIG = 99999999.0
DEAD = 1 << 24


def decode_streams(streams):
    """(8, n_pages, F*128) page-major field-major -> (8, R, F) row table."""
    o8, npg, fw = streams.shape
    F = fw // 128
    rows = streams.reshape(o8, npg, F, 128).transpose(0, 1, 3, 2)
    return rows.reshape(o8, npg * 128, F)


def sim_block(rows_o, o, d, tmax, anyhit, phase_steps, page, max_phases=10**9):
    """Replay _lanewalk_kernel on one 1024-ray block; rows_o: (R, F).

    Returns (phases, useful_steps, active_lane_steps, dst, prim).
    `page` = rows per resident page (kernel PAGE=128; coarser pages
    model a 2-gather/select table).  Gangs are the 8 sublane rows:
    lanes [g*128:(g+1)*128].
    """
    di = np.where(d == 0.0, 1e-20, d)
    inv = 1.0 / di
    best = tmax.copy()
    alive0 = best > -BIG * 0.5
    cur = np.where(alive0, 0, DEAD).astype(np.int64)
    prim = np.full(1024, -1, np.int64)
    R = rows_o.shape[0]
    g_of = np.repeat(np.arange(8), 128)
    phases = 0
    useful = 0
    lane_steps = 0
    while (cur.min() < DEAD) and phases < max_phases:
        resident = (cur.reshape(8, 128).min(axis=1) // page)
        res_lane = resident[g_of]
        for _ in range(phase_steps):
            active = (cur // page == res_lane) & (cur < DEAD)
            lane_steps += 1024
            na = int(active.sum())
            if na == 0:
                continue
            useful += na
            idx = np.where(active)[0]
            g = rows_o[np.minimum(cur[idx], R - 1)]
            is_tri = g[:, 15] > 0.5
            # BOX
            t1 = (g[:, 0:3] - o[idx]) * inv[idx]
            t2 = (g[:, 3:6] - o[idx]) * inv[idx]
            tnear = np.minimum(t1, t2).max(axis=1)
            tfar = np.maximum(t1, t2).min(axis=1)
            bhit = (tfar >= tnear) & (tfar > 0) & (
                np.maximum(tnear, 0.0) < best[idx])
            # TRI
            r = o[idx] - g[:, 0:3]
            q = np.cross(r, di[idx])
            d0 = -np.einsum("nk,nk->n", di[idx], g[:, 9:12])
            with np.errstate(divide="ignore", invalid="ignore"):
                dinv = 1.0 / d0
                t = np.einsum("nk,nk->n", r, g[:, 9:12]) * dinv
                u = np.einsum("nk,nk->n", g[:, 6:9], q) * dinv
                v = -np.einsum("nk,nk->n", g[:, 3:6], q) * dinv
            w = 1.0 - u - v
            front = d0 >= 1e-8
            thit = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
            thit &= ~((~front) & (g[:, 13] > 0.5))
            imp = is_tri & thit & (t < best[idx])
            if anyhit:
                best[idx[imp]] = -BIG
            else:
                best[idx[imp]] = t[imp]
                prim[idx[imp]] = g[imp, 14].astype(np.int64)
            nxt = np.where(
                is_tri, g[:, 12],
                np.where(bhit, g[:, 6], g[:, 7])).astype(np.int64)
            if anyhit:
                nxt = np.where(imp, DEAD, nxt)
            cur[idx] = np.minimum(nxt, DEAD)
        phases += 1
    return phases, useful, lane_steps, best, prim


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig, Routing
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.sampling import lights

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 260_000
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << lg
    os.environ.setdefault("RT_ROPE_BUILD", "1")
    sc = presets.sponza_proxy(n_tris).compile().device_put()
    streams = np.asarray(sc.rope_streams)
    rows8 = decode_streams(streams)
    print(f"rows table {rows8.shape} ({rows8.nbytes/1e6:.0f} MB decoded)")

    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(sc)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(n, dtype=jnp.int32) % (1920 * 1080)
    prim_r = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)
    hit = traverse.traverse(
        sc, prim_r.origin, prim_r.direction, jnp.ones(n, bool),
        routing=Routing(packet="off", lanewalk="off"), need_uv=False,
    )
    dst = np.asarray(hit.dst)
    hitm = np.asarray(hit.did_hit)
    rng = np.random.default_rng(3)
    hp = np.asarray(prim_r.origin) + np.asarray(
        prim_r.direction) * np.minimum(dst, 100.0)[:, None]
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    o2 = np.where(hitm[:, None], hp + 1e-4, np.asarray(prim_r.origin))
    d2 = np.where(hitm[:, None], d2,
                  np.asarray(prim_r.direction)).astype(np.float32)
    o2 = o2.astype(np.float32)
    u = rng.random((n, 3)).astype(np.float32)
    l_dir, li, _, l_dist = lights.sample_rect_light(
        sc, jnp.asarray(o2), jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
        jnp.asarray(u[:, 2]))
    l_dir = np.asarray(l_dir).astype(np.float32)
    l_dist = np.asarray(l_dist).astype(np.float32)

    def binned(o, d, key_args=None):
        key = np.asarray(wavefront._bin_key(
            sc, jnp.asarray(o), jnp.asarray(d), jnp.ones(n, bool),
            *(key_args or ())))
        srt = np.argsort(key, kind="stable")
        return o[srt], d[srt], srt

    o2b, d2b, _ = binned(o2, d2)
    osb, dsb, srt_s = binned(o2, l_dir)
    clip_s = (l_dist[srt_s] * (1 - 1e-3)).astype(np.float32)

    pops = [
        ("primary", np.asarray(prim_r.origin), np.asarray(prim_r.direction),
         np.full(n, BIG, np.float32), False),
        ("bounce ", o2b, d2b, np.full(n, BIG, np.float32), False),
        ("shadow ", osb, dsb, clip_s, True),
    ]
    sel = os.environ.get("LWV2_POPS")
    if sel:
        pops = [p for p in pops if p[0].strip() in sel.split(",")]

    ps_list = [int(x) for x in
               os.environ.get("LWV2_PS", "2,4,8,16").split(",")]
    pg_list = [int(x) for x in
               os.environ.get("LWV2_PAGES", "128,512").split(",")]
    nb_tot = n // 1024
    nb = min(nb_tot, int(os.environ.get("LWV2_BLOCKS", 32)))
    # evenly-spaced block sample (sequential slices are bin-key-biased)
    block_ids = np.linspace(0, nb_tot - 1, nb).astype(np.int64)

    # cost model: step cost grows with page width (extra gathers+selects
    # per field beyond 128 lanes: ~5ns per extra 128-slice per field x16)
    def step_ns(page):
        return 112.0 + 80.0 * (page // 128 - 1)

    B_FIX = float(os.environ.get("LWV2_BFIX", 500.0))  # ns per phase

    for name, o, d, tmax, anyhit in pops:
        oct_all = ((d[:, 0] < 0) + 2 * (d[:, 1] < 0)
                   + 4 * (d[:, 2] < 0)).astype(np.int64)
        for page in pg_list:
            for ps in ps_list:
                t0 = time.time()
                tot_ph, tot_use, tot_ls = 0, 0, 0
                for b in block_ids:
                    s = slice(b * 1024, (b + 1) * 1024)
                    o_maj = np.bincount(oct_all[s], minlength=8).argmax()
                    ph, use, ls, _, _ = sim_block(
                        rows8[o_maj], o[s], d[s], tmax[s].copy(),
                        anyhit, ps, page)
                    tot_ph += ph
                    tot_use += use
                    tot_ls += ls
                ph_b = tot_ph / nb
                util = tot_use / max(tot_ls, 1)
                t_blk = ph_b * (B_FIX + ps * step_ns(page))
                print(f"{name} page={page:4d} ps={ps:2d}: "
                      f"{ph_b:7.1f} phases/blk util {util*100:5.1f}% "
                      f"-> {t_blk/1e3:7.1f} us/blk "
                      f"= {1024/t_blk*1e3:6.1f} Mrays/s   "
                      f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
