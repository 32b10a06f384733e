#!/usr/bin/env python
"""Union-vs-packet-size simulation on production-shaped bounce rays.

The Mosaic block constraint pins the kernel's ray block at >= (8,128)
(packet 1024); smaller logical packets would have to run as independent
row-walks inside one block, whose per-visit cost is nearly identical
(vector issue width is (8,128) regardless; the lane-reduction tree does
not shrink).  So sub-1024 packets pay ~the same per visit and win ONLY
if the per-packet node-union total shrinks enough.  This computes, from
REAL per-ray walks (sim_treelet.per_ray_walk) of the bench scene and
the PRODUCTION bin ordering (wavefront._bin_key), the exact quantity

    total_cost(P) = sum over packets of
        U_int(P) * c_int(P) + U_leaf(P) * c_leaf(P)

with the measured per-visit model (BENCH_NOTES r3 ablations):
    c_int(P)  = 31 + 150 * max(sub,8)/16 + 295   (scalar+slab+2 sums)
    c_leaf(P) = 30 + 360 * max(sub,8)/16          (MT records, vector)

Usage: python tools/sim_psize.py [n_rays]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sim_treelet import gen_tile_bounce_rays, per_ray_walk, wide_children  # noqa: E402


def per_ray_walk_with_leaves(wp, leaf_rows, o, d):
    """per_ray_walk variant that also records visited leaf slots."""
    n = o.shape[0]
    W = wp.shape[0]
    inv = 1.0 / np.where(d == 0.0, 1e-20, d)
    boxes = wp[:, :64].reshape(W, 8, 8)
    codes = wide_children(wp)
    lr = leaf_rows.reshape(leaf_rows.shape[0], 8, 16)

    DEPTH = 96
    stack = np.zeros((n, DEPTH), np.int64)
    sp = np.ones(n, np.int64)
    best = np.full(n, 1e30, np.float32)
    vis_i = [[] for _ in range(n)]
    vis_l = [[] for _ in range(n)]
    alive_idx = np.arange(n)
    while alive_idx.size:
        a = alive_idx
        sp[a] -= 1
        code = stack[a, sp[a]]
        is_leaf = code < 0
        la = a[is_leaf]
        if la.size:
            slot = (-code[is_leaf] - 1) // 16
            for i, s in zip(la, slot):
                vis_l[i].append(int(s))
            rec = lr[slot]
            ro = o[la][:, None, :] - rec[:, :, 0:3]
            q = np.cross(ro, d[la][:, None, :])
            nrm = rec[:, :, 9:12]
            d0 = -np.einsum("mj,mkj->mk", d[la], nrm)
            with np.errstate(all="ignore"):
                t = np.einsum("mkj,mkj->mk", ro, nrm) / d0
                u = np.einsum("mkj,mkj->mk", rec[:, :, 6:9], q) / d0
                v = -np.einsum("mkj,mkj->mk", rec[:, :, 3:6], q) / d0
            w = 1 - u - v
            ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
            ok &= np.isfinite(t)
            t = np.where(ok, t, 1e30)
            np.minimum.at(best, la, t.min(axis=1))
        ia = a[~is_leaf]
        if ia.size:
            ni = code[~is_leaf]
            for i, w_id in zip(ia, ni):
                vis_i[i].append(int(w_id))
            bx = boxes[ni]
            t1 = (bx[:, :, 0:3] - o[ia][:, None, :]) * inv[ia][:, None, :]
            t2 = (bx[:, :, 3:6] - o[ia][:, None, :]) * inv[ia][:, None, :]
            with np.errstate(all="ignore"):
                tmin = np.minimum(t1, t2).max(axis=2)
                tmax = np.maximum(t1, t2).min(axis=2)
            hit = (tmax >= tmin) & (tmax > 0) & (tmin < best[ia][:, None])
            hit &= np.isfinite(tmin)
            cds = codes[ni]
            hit &= cds < 2**30
            for row in range(ia.size):
                i = ia[row]
                for c in np.nonzero(hit[row])[0]:
                    stack[i, sp[i]] = cds[row, c]
                    sp[i] += 1
        alive_idx = alive_idx[sp[alive_idx] > 0]
    return vis_i, vis_l


def main():
    import jax.numpy as jnp
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.scene import presets

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 15
    rng = np.random.default_rng(11)
    b = presets.sponza_proxy()
    scene = b.compile()
    wp = np.asarray(scene.wide_packed)
    lr = np.asarray(scene.leaf_rows)

    os.environ.setdefault("RT_SIM_TILE", "3")  # whole-frame population
    o, d = gen_tile_bounce_rays(scene, wp, lr, n, rng)
    n = o.shape[0]
    print(f"# {n} production-shaped bounce rays (whole-frame tile)")

    # production bin ordering
    key = np.asarray(
        wavefront._bin_key(
            scene, jnp.asarray(o), jnp.asarray(d), jnp.ones(n, bool), 5
        )
    )
    order = np.argsort(key, kind="stable")
    o, d = o[order], d[order]

    vis_i, vis_l = per_ray_walk_with_leaves(wp, lr, o, d)
    per_ray_i = np.array([len(set(v)) for v in vis_i])
    per_ray_l = np.array([len(set(v)) for v in vis_l])
    print(f"# per-ray visits: interior mean {per_ray_i.mean():.1f}, "
          f"leaf mean {per_ray_l.mean():.1f}")

    for P in (128, 256, 512, 1024, 2048, 4096):
        sub = P // 128
        c_int = 31 + 150 * max(sub, 8) / 16 + 295
        c_leaf = 30 + 360 * max(sub, 8) / 16
        tot_i = tot_l = 0
        g = -(-n // P)
        for p in range(g):
            ui = set()
            ul = set()
            for r in range(p * P, min((p + 1) * P, n)):
                ui.update(vis_i[r])
                ul.update(vis_l[r])
            tot_i += len(ui)
            tot_l += len(ul)
        ns = tot_i * c_int + tot_l * c_leaf
        print(
            f"P={P:5d}: packets={g:4d} U_int/pkt={tot_i/g:8.1f} "
            f"U_leaf/pkt={tot_l/g:8.1f} amp_int={tot_i/per_ray_i.sum():5.2f}x "
            f"pred={ns/1e6:8.2f} ms  pred_mrays={n/ns*1e3:6.2f}"
        )


if __name__ == "__main__":
    main()
