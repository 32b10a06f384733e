#!/usr/bin/env python
"""Off-diagonal knob-matrix sweep (round-4 VERDICT item 7).

The production defaults (packet 2048, mask_mode sum2, vmem placement)
were each tuned while the others were held at their then-current values;
this sweeps the full matrix on the official bench workload so the
defaults are known-optimal rather than locally tuned:

    packet_size x mask_mode x placement

Each cell times ONE whole-frame trace_wave wavefront (the official bench
shape: sponza_proxy @1080p spp2 b8) and prints a JSON line; a final
table summarizes.  The reference hardcodes its equivalents as
compile-time constants (vk_engine.h:202-206) — this framework measures.

Usage: python tools/sweep_knobs.py [--quick]
  env RT_SWEEP_PSIZES / RT_SWEEP_MASKS / RT_SWEEP_PLACEMENTS to override
  the axes (comma lists), RT_SWEEP_SPP (default 2).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    # RT_SWEEP_SMOKE=1: tiny CPU run (gather-walk routing) purely to
    # verify the harness is runnable before a hardware window.
    smoke = os.environ.get("RT_SWEEP_SMOKE", "0") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_tracer_tpu import RenderConfig
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import Routing
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    psizes = [int(x) for x in os.environ.get(
        "RT_SWEEP_PSIZES", "2048,4096,8192").split(",")]
    masks = os.environ.get("RT_SWEEP_MASKS", "sum4,sum2,mxu").split(",")
    placements = os.environ.get("RT_SWEEP_PLACEMENTS", "vmem,hbm").split(",")
    spp = int(os.environ.get("RT_SWEEP_SPP", 2))
    bin_bits = [int(x) for x in os.environ.get(
        "RT_SWEEP_BIN_BITS", "5").split(",")]
    dir_bits = [int(x) for x in os.environ.get(
        "RT_SWEEP_DIR_BITS", "0").split(",")]
    groupss = [int(x) for x in os.environ.get(
        "RT_SWEEP_GROUPS", "16").split(",")]
    gpackets = [int(x) for x in os.environ.get(
        "RT_SWEEP_GPACKETS", "4096").split(",")]

    scene = presets.sponza_proxy(4_000 if smoke else 260_000)\
        .compile().device_put()
    cam = scene_camera(scene)
    base = RenderConfig(
        width=64 if smoke else 1920, height=64 if smoke else 1080,
        bounce_limit=8, max_rays_per_batch=1 << (12 if smoke else 21),
    )
    rot, pos, fov, aspect, near = _camera_arrays(cam, base)
    n_pix = base.n_pixels
    tile = min(n_pix, base.max_rays_per_batch)

    @tpu_jit(static_argnames=("cfg", "n_spp"))
    def one_tile(scene, rot, pos, fov, aspect, near, frame, cfg, n_spp):
        ids = jnp.arange(tile, dtype=jnp.int32)
        c, nr = wavefront.trace_wave(
            scene, rot, pos, fov, aspect, near, ids, frame, jnp.int32(0),
            n_spp, cfg, with_stats=True,
        )
        return jnp.sum(c), nr

    rows = []
    for pl_ in placements:
        # 'hbm' = leaf rows DMA'd per visit (nodes resident); the budget
        # sits between the node-table and node+leaf sizes.
        vb = 48_000_000 if pl_ == "vmem" else int(
            scene.wide_packed.size * 4 + 2_000_000
        )
        for mm in masks:
            for ps, mb, db, gg, gp in [
                (p, m, d, g, q) for p in psizes for m in bin_bits
                for d in dir_bits for g in groupss for q in gpackets
            ]:
                if (gp // 128) % gg != 0:
                    continue  # groups must divide the packet's sublanes
                rt = Routing(packet_size=ps, mask_mode=mm, vmem_budget=vb,
                             bin_bits=mb, bin_dir_bits=db,
                             groups=gg, groups_packet=gp)
                cfg = base.replace(routing=rt)
                try:
                    c, nr = one_tile(scene, rot, pos, fov, aspect, near,
                                     jnp.int32(0), cfg=cfg, n_spp=spp)
                    # host transfer, not block_until_ready: the axon
                    # tunnel has returned early from block_until_ready
                    # (r4 sweep cell 1 timed 3 ms for a 7 s frame)
                    np.asarray(c)
                    dts = []
                    for rep in (1, 2):
                        t0 = time.perf_counter()
                        c, nr = one_tile(scene, rot, pos, fov, aspect,
                                         near, jnp.int32(rep), cfg=cfg,
                                         n_spp=spp)
                        np.asarray(c)
                        dts.append(time.perf_counter() - t0)
                    dt = min(dts)
                    nr = np.asarray(nr)
                    row = {
                        "packet": ps, "mask": mm, "placement": pl_,
                        "bin": f"{mb}/{db}", "g": f"{gg}/{gp}",
                        "mrays_sem": round(float(nr[0]) / dt / 1e6, 3),
                        "s": round(dt, 2),
                        "checksum": float(np.asarray(c)),
                    }
                except Exception as e:  # noqa: BLE001
                    row = {"packet": ps, "mask": mm, "placement": pl_,
                           "bin": f"{mb}/{db}", "g": f"{gg}/{gp}",
                           "error": str(e)[:200]}
                rows.append(row)
                print(json.dumps(row), flush=True)

    ok = [r for r in rows if "mrays_sem" in r]
    if ok:
        best = max(ok, key=lambda r: r["mrays_sem"])
        print("\n| packet | mask | placement | bin | G/gp | Mrays/s |")
        print("|---|---|---|---|---|---|")
        for r in sorted(ok, key=lambda r: -r["mrays_sem"]):
            mark = " **best**" if r is best else ""
            print(f"| {r['packet']} | {r['mask']} | {r['placement']} |"
                  f" {r['bin']} | {r['g']} | {r['mrays_sem']}{mark} |")
        # all cells must agree on the frame checksum (bit-identical claim)
        cs = {round(r["checksum"], 1) for r in ok}
        print(f"\nchecksums: {cs} ({'CONSISTENT' if len(cs) == 1 else 'DIVERGENT'})")


if __name__ == "__main__":
    main()
