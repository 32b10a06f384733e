#!/usr/bin/env python
"""Step-count sim: independent per-group pair stacks vs lockstep-depth.

The v4 vectorized-stack idea stores all G groups' stack words per level
in ONE VMEM row, so pops/pushes/decodes become vector ops — but the
stack POINTER must then be shared (per-lane dynamic row indexing does
not exist on TPU).  Sharing sp turns G independent DFS walks into a
depth-synchronized joint walk: when any group pushes, groups that
wanted to pop idle at a null word until the joint stack unwinds.

This sim replays EXACT pair-stack walks (real wide tree, real rays,
real Moller-Trumbore best evolution) under both disciplines and reports
the step inflation — the go/no-go number for building the kernel
(pre-registered rule: one hardware-shaped datapoint before >1 day of
kernel work; step counts are the quantity CPU sims have predicted
correctly in rounds 2-4, unlike cost models).

Usage: python tools/sim_lockstep.py [n_tris] [log2_rays] [groups]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig, Routing
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.ops import traverse

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    lanes = 256  # rays per group (p4096 / G16 shape)
    n = 1 << lg
    sc = presets.sponza_proxy(n_tris).compile().device_put()
    W = np.asarray(sc.wide_packed)
    n_wide = W.shape[0]
    leaf = np.asarray(sc.leaf_rows)  # (L,128) -> (L,8,16)
    recs = leaf.reshape(leaf.shape[0], 8, 16)

    cfg = RenderConfig(width=1920, height=1080)
    cam = scene_camera(sc)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(n, dtype=jnp.int32) % (1920 * 1080)
    prim = wavefront.raygen(rot, pos, fov, aspect, near, ids, 1920, 1080)
    hit = traverse.traverse(
        sc, prim.origin, prim.direction, jnp.ones(n, bool),
        routing=Routing(packet="off"), need_uv=False,
    )
    pr = np.asarray(hit.prim)
    dst = np.asarray(hit.dst)
    hitm = np.asarray(hit.did_hit)
    rng = np.random.default_rng(3)
    hp = np.asarray(prim.origin) + np.asarray(prim.direction) * np.minimum(
        dst, 100.0)[:, None]
    srow = np.asarray(sc.shade_tri)[np.maximum(pr, 0)]
    nrm = srow[:, 41:44]
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    din = np.asarray(prim.direction)
    flip = np.einsum("ij,ij->i", nrm, din) > 0
    nrm[flip] = -nrm[flip]
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    f2m = np.einsum("ij,ij->i", d2, nrm) < 0
    d2[f2m] -= 2 * np.einsum(
        "ij,ij->i", d2[f2m], nrm[f2m])[:, None] * nrm[f2m]
    o2 = np.where(hitm[:, None], hp + nrm * 1e-4, np.asarray(prim.origin))
    d2 = np.where(hitm[:, None], d2, din)
    key = np.asarray(wavefront._bin_key(
        sc, jnp.asarray(o2), jnp.asarray(d2), jnp.ones(n, bool)))
    order = np.argsort(key, kind="stable")
    o2, d2 = o2[order], d2[order]

    boxes = W[:, :64].reshape(n_wide, 8, 8)  # per child: min3 max3 code ax
    codes = np.nan_to_num(W[:, 6:64:8], nan=0.0).astype(np.int64)
    axis = W[:, 7].astype(np.int64)

    class GroupWalk:
        """Exact pair-stack DFS for one group of rays; step() advances one
        visit and returns (pushed, stayed) so a joint driver can run it
        under any sp discipline."""

        def __init__(self, o, d):
            self.o, self.d = o, d
            di = np.where(d == 0.0, 1e-20, d)
            self.inv = 1.0 / di
            self.best = np.full(o.shape[0], 99999999.0, np.float32)
            self.neg = (di < 0).mean(axis=0) > 0.5  # per-axis majority

        def visit(self, node):
            """Visit node (interior>=0 or leaf<0); returns near-first
            child list for interiors, [] for leaves."""
            if node < 0:
                slot = (-node - 1) // 16
                rc = recs[slot]  # (8,16)
                r = self.o[None, :, :] - rc[:, None, 0:3]  # (8,n,3)
                q = np.cross(r, np.broadcast_to(self.d[None], r.shape))
                nrm9 = rc[:, 9:12]
                d0 = -np.einsum("lk,nk->ln", nrm9, self.d)
                with np.errstate(divide="ignore", invalid="ignore"):
                    dinv = 1.0 / d0
                    t = np.einsum("lnk,lk->ln", r, nrm9) * dinv
                    u = np.einsum("lk,lnk->ln", rc[:, 6:9], q) * dinv
                    v = -np.einsum("lk,lnk->ln", rc[:, 3:6], q) * dinv
                w = 1.0 - u - v
                front = d0 >= 1e-8
                ok = (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
                ok &= ~((~front) & (rc[:, None, 12] > 0.5))
                t = np.where(ok & np.isfinite(t), t, 99999999.0)
                self.best = np.minimum(self.best, t.min(axis=0))
                return []
            b = boxes[node]
            want = []
            for c in range(8):
                if not np.isfinite(b[c, 0]):
                    continue
                t1 = (b[c, 0:3][None] - self.o) * self.inv
                t2 = (b[c, 3:6][None] - self.o) * self.inv
                tmin = np.minimum(t1, t2).max(axis=1)
                tmax = np.maximum(t1, t2).min(axis=1)
                if np.any((tmax >= tmin) & (tmax > 0)
                          & (tmin < self.best)):
                    want.append(c)
            ax = axis[node]
            if self.neg[ax]:
                want = want  # slots ascend along axis; neg -> high first
                want = sorted(want)
            else:
                want = sorted(want, reverse=True)
            # return FAR-to-near so pop order (list end) is near-first
            return [int(codes[node, c]) for c in want]

    # NaN-safe: leaf padding rows are NaN -> comparisons False -> BIG.
    np.seterr(all="ignore")

    n_pk = n // (groups * lanes)
    ind_tot, lock_tot = 0, 0
    for p in range(n_pk):
        gws, stacks = [], []
        for g in range(groups):
            s = p * groups * lanes + g * lanes
            gw = GroupWalk(o2[s:s + lanes], d2[s:s + lanes])
            gws.append(gw)
            stacks.append([0])  # root

        # independent: steps = max_g walk length
        ind_steps = 0
        for g in range(groups):
            st = list(stacks[g])
            gw = GroupWalk(gws[g].o, gws[g].d)
            steps = 0
            while st:
                node = st.pop()
                st.extend(gw.visit(node))
                steps += 1
            ind_steps = max(ind_steps, steps)
        ind_tot += ind_steps

        # lockstep-depth: shared sp; each group's stack padded with None
        sts = [[0] for _ in range(groups)]  # stacks of child-LISTS (pairs)
        # represent pair stack: each level holds a list of remaining
        # children (near-first at END); level occupancy may be None
        pair = [[[0]] for _ in range(groups)]  # level 0: visit root
        sp = 1
        lock_steps = 0
        gws2 = [GroupWalk(gw.o, gw.d) for gw in gws]
        while sp > 0:
            lock_steps += 1
            any_push, any_stay = False, False
            pushes = [None] * groups
            for g in range(groups):
                lv = pair[g]
                top = lv[sp - 1] if sp - 1 < len(lv) else None
                if not top:  # None or empty: idle
                    continue
                node = top.pop()  # near-first at end
                kids = gws2[g].visit(node)
                if kids:
                    pushes[g] = kids
                    any_push = True
                if top:
                    any_stay = True
            if any_push:
                for g in range(groups):
                    lv = pair[g]
                    while len(lv) < sp + 1:
                        lv.append(None)
                    lv[sp] = pushes[g] if pushes[g] else None
                sp += 1
            elif any_stay:
                pass  # same level continues
            else:
                # all tops exhausted: unwind to the deepest non-empty level
                sp -= 1
                while sp > 0:
                    busy = any(
                        sp - 1 < len(pair[g]) and pair[g][sp - 1]
                        for g in range(groups)
                    )
                    if busy:
                        break
                    sp -= 1
        lock_tot += lock_steps
        print(f"packet {p}: independent(max_g) {ind_steps}  "
              f"lockstep {lock_steps}  x{lock_steps/max(ind_steps,1):.2f}",
              flush=True)
    print(f"TOTAL: independent {ind_tot}  lockstep {lock_tot}  "
          f"inflation x{lock_tot/max(ind_tot,1):.2f}")


if __name__ == "__main__":
    main()
