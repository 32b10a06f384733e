#!/usr/bin/env python
"""Wall-time attribution for the official bench tile (VERDICT r2 item 2).

Runs ONE bench-shaped tile (sponza_proxy @1080p geometry, 2^18-pixel tile,
spp from env) under ``jax.profiler.trace``, then parses the emitted
perfetto ``.trace.json.gz`` and aggregates device-track op durations into
buckets: packet-kernel traversal, sort/argsort (coherence binning),
gathers/scatters (state permutes + shading fetches), elementwise fusions
(shading math), and everything else.  Prints a BENCH_NOTES-ready table.

Usage: python tools/profile_bench.py [outdir]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_tile(outdir: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ray_tracer_tpu import RenderConfig
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.scene import presets
    from ray_tracer_tpu.utils.jitting import tpu_jit

    width, height, spp = 1920, 1080, int(os.environ.get("RT_BENCH_SPP", 2))
    cfg = RenderConfig(
        width=width, height=height, bounce_limit=8,
        max_rays_per_batch=1 << int(os.environ.get(
            "RT_PROFILE_TILE_LOG2", 18)),
    )
    scene = presets.sponza_proxy(260_000).compile().device_put()
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    tile = cfg.max_rays_per_batch
    n_pix = cfg.n_pixels

    @tpu_jit(static_argnames=("cfg", "n_spp"))
    def tile_with_stats(scene, rot, pos, fov, aspect, near, frame, t, cfg,
                        n_spp):
        ids = jnp.minimum(
            t * tile + jnp.arange(tile, dtype=jnp.int32),
            jnp.int32(n_pix - 1),
        )
        c, nr = wavefront.trace_wave(
            scene, rot, pos, fov, aspect, near, ids, frame, jnp.int32(0),
            n_spp, cfg, with_stats=True,
        )
        return jnp.sum(c), nr

    # compile + warm
    c, nr = tile_with_stats(scene, rot, pos, fov, aspect, near,
                            jnp.int32(0), jnp.int32(1), cfg=cfg, n_spp=spp)
    jax.block_until_ready((c, nr))

    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        c, nr = tile_with_stats(scene, rot, pos, fov, aspect, near,
                                jnp.int32(1), jnp.int32(1), cfg=cfg,
                                n_spp=spp)
        jax.block_until_ready((c, nr))
    dt = time.perf_counter() - t0
    nr_sem = float(np.asarray(nr)[0])  # [semantic, traced] since round 4
    return {"wall_s": dt, "rays": nr_sem,
            "mrays": nr_sem / dt / 1e6}


BUCKETS = [
    # (bucket, substrings matched against the op/kernel name, lowercased)
    # Order matters: first match wins.  The pallas calls carry explicit
    # names (packet8_anyhit / packet8_wide / group_anyhit /
    # group_traverse, round 5) so the shadow-ray occlusion walk gets its
    # own bucket instead of riding "packet_kernel" (VERDICT r4 item 2).
    ("anyhit_kernel", ["anyhit"]),
    ("group_kernel", ["group_traverse"]),
    ("packet_kernel", ["custom-call", "tpu_custom_call", "packet"]),
    ("sort", ["sort"]),
    ("gather_scatter", ["gather", "scatter", "dynamic-slice",
                        "dynamic_slice", "dynamic-update"]),
    ("fusion_elementwise", ["fusion", "loop_", "add", "multiply", "select",
                            "convert", "copy", "transpose", "broadcast",
                            "reshape", "reduce", "iota", "compare",
                            "bitcast", "concatenate", "slice", "pad",
                            "and", "or", "not", "constant", "rsqrt",
                            "divide", "subtract", "exponential", "power",
                            "tanh", "floor", "clamp", "maximum", "minimum",
                            "while", "condition", "tuple", "param"]),
]


def classify(name: str) -> str:
    low = name.lower()
    for bucket, subs in BUCKETS:
        for s in subs:
            if s in low:
                return bucket
    return "other"


def parse_trace(outdir: str) -> None:
    paths = glob.glob(
        os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        print("no trace.json.gz found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        doc = json.load(f)
    events = doc.get("traceEvents", [])
    # device-track pids: identified by process names containing "TPU" and
    # not "Host"; fall back to all complete events with args.
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    per_op = defaultdict(float)
    per_cnt = defaultdict(int)
    per_bucket = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # thread names like "Steps"/"XLA Modules" double-count; keep only
        # op-level events (those with a dur and an op-like name)
        if name.startswith("jit_") or name in ("Steps",):
            continue
        dur = float(e.get("dur", 0.0)) / 1e6  # us -> s
        per_op[name] += dur
        per_cnt[name] += 1
        per_bucket[classify(name)] += dur
        total += dur
    print(f"\ndevice op time total: {total:.3f} s   (trace: {path})")
    print("\n== buckets ==")
    for b, t in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"{b:22s} {t:8.3f} s  {100*t/max(total,1e-9):5.1f}%")
    print("\n== top 25 ops ==")
    for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        n = per_cnt[name]
        print(f"{t:8.3f} s  {100*t/max(total,1e-9):5.1f}%  n={n:5d}  "
              f"{t/max(n,1)*1e6:8.1f} us/call  {name[:90]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rt_profile"
    stats = run_tile(outdir)
    print(json.dumps(stats))
    parse_trace(outdir)
