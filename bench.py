#!/usr/bin/env python
"""Benchmark: Mrays/sec on the heaviest in-tree scene, one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no numbers; the
north-star target is 200 Mrays/s (Sponza @1080p on one v5p chip).  The
sponza/dragon meshes are absent from the reference tree (SURVEY.md §6
caveat), so the default workload is the heaviest available mesh —
klein_bottle.obj (35,840 tris) in the Cornell box at 1080p — and
``vs_baseline`` is reported against the 200 Mrays/s target.

Rays counted = traversals actually performed (primary + bounce + NEE
shadow), the same events the reference's stats counters track
(raytrace.comp:276).
"""

import functools
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    if os.environ.get("RT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from ray_tracer_tpu import RenderConfig
    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.scene import presets

    width = int(os.environ.get("RT_BENCH_WIDTH", 1920))
    height = int(os.environ.get("RT_BENCH_HEIGHT", 1080))
    spp = int(os.environ.get("RT_BENCH_SPP", 2))
    scene_name = os.environ.get("RT_BENCH_SCENE", "sponza_proxy")

    # WHOLE-FRAME wavefront (round 3): one tile spanning every pixel.
    # Coherence binning improves with population — each (octant, morton
    # cell) bucket fills with rays from the entire frame, so traversal
    # packets get tighter unions (sim: union 2193@4k rays -> 1404@38k and
    # still falling; bench: 1.57 -> 2.33 Mrays/s from 2^18 -> 2^21).  A
    # frame at spp2 is ~10 s of device time, still under the ~60-90 s TPU
    # execution watchdog; higher-spp runs stay per-spp-chunked via
    # max_spp_per_dispatch.
    cfg = RenderConfig(
        width=width, height=height, bounce_limit=8,
        max_rays_per_batch=1 << int(os.environ.get("RT_BENCH_TILE_LOG2", 21)),
    )
    if scene_name.startswith("sponza_proxy"):
        # BASELINE config 5 workload: Sponza-scale (~260k tris); the real
        # sponza .obj is absent from the reference tree (SURVEY §6).
        # "sponza_proxy:N" scales the target triangle count (e.g.
        # :1500000 exercises the >VMEM 'hbm' leaf-DMA routing on real
        # hardware, round-2 VERDICT item 3).
        n_target = 260_000
        if ":" in scene_name:
            n_target = int(scene_name.split(":")[1])
        scene = presets.sponza_proxy(n_target).compile().device_put()
    elif scene_name == "cornell":
        scene = presets.default_scene().compile().device_put()
    else:
        # klein_bottle.obj spans y in [-8.4, 0]: scale 0.15 fits the box
        # with the base on the floor and the light quad unoccluded.
        scene = (
            presets.mesh_scene(scene_name, material=presets.WHITE, scale=0.15,
                               position=(0.0, 0.5, 0.0))
            .compile()
            .device_put()
        )
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)

    from ray_tracer_tpu.utils.jitting import tpu_jit

    n_pix = cfg.n_pixels
    tile = min(n_pix, cfg.max_rays_per_batch)
    n_tiles = -(-n_pix // tile)

    @tpu_jit(static_argnames=("cfg", "n_spp"))
    def tile_with_stats(scene, rot, pos, fov, aspect, near, frame, t,
                        cfg, n_spp):
        """One pixel tile, one dispatch: all spp in the path-regenerating
        wavefront (wavefront.trace_wave); rays counted = traversals
        actually performed.

        One dispatch PER TILE (not a whole-frame tile scan inside one
        program): a single XLA execution beyond the TPU runtime's ~60-90s
        watchdog kills the worker — the round-1 'TPU worker crashed'
        failure shape — and a hard full-path frame at 1080p is minutes of
        device time.  The ~3.5ms dispatch floor is noise against
        multi-second tiles."""
        ids = jnp.minimum(
            t * tile + jnp.arange(tile, dtype=jnp.int32),
            jnp.int32(n_pix - 1),
        )
        c, nr = wavefront.trace_wave(
            scene, rot, pos, fov, aspect, near, ids, frame,
            jnp.int32(0), n_spp, cfg, with_stats=True,
        )
        return jnp.sum(c), nr

    def frame_with_stats(frame):
        checksum = 0.0
        nrays = np.zeros(2)  # [semantic, traced] (see wavefront.trace)
        for t in range(n_tiles):
            c, nr = tile_with_stats(
                scene, rot, pos, fov, aspect, near, frame, jnp.int32(t),
                cfg=cfg, n_spp=spp,
            )
            checksum += float(c)
            nrays += np.asarray(nr)
        return checksum, nrays

    # Warmup / compile.
    frame_with_stats(jnp.int32(0))

    t0 = time.perf_counter()
    checksum, total_rays = frame_with_stats(jnp.int32(1))
    dt = time.perf_counter() - t0

    rays_sem, rays_traced = float(total_rays[0]), float(total_rays[1])
    # Headline denominator = SEMANTIC rays (every ray the reference would
    # traverse): keeps round-over-round Mrays/s apples-to-apples since
    # rounds 1-2 traced the full set.  rays_traced is reported alongside
    # so the analytic facing-away-NEE resolve can't silently inflate
    # throughput (round-3 advisor).
    mrays = rays_sem / dt / 1e6
    # diagnostics (stderr; the driver parses only the stdout JSON line):
    # wall seconds for the measured frame and the traversal count, so
    # ray-count-changing optimizations can be A/B'd on frame time.
    print(
        json.dumps({"frame_s": round(dt, 3), "rays_sem": rays_sem,
                    "rays_traced": rays_traced, "checksum": checksum}),
        file=sys.stderr,
    )
    record = {
        "metric": f"Mrays/s {scene_name} @{width}x{height} spp{spp} b8",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "rays_sem": rays_sem,
        "rays_traced": rays_traced,
        "mrays_traced": round(rays_traced / dt / 1e6, 2),
    }
    if not _env_overridden():
        _save_last_known_good(record)
    print(json.dumps(record))


def _env_overridden() -> bool:
    """True when any RT_* env override is set.

    A/B runs (RT_NEE_PREBIN=..., RT_BENCH_SCENE=..., ...) must NOT
    refresh BENCH_LKG: the fallback record must always describe the
    committed tree's DEFAULT configuration (round-4 and round-5 advisor
    findings — the nosort A/B overwrote the 4.79 default record with its
    own 4.05)."""
    return any(k.startswith("RT_") for k in os.environ)


_LKG_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LKG.json")


def _save_last_known_good(record: dict) -> None:
    """Persist the most recent successful hardware measurement.

    Round 3's official record regressed to 0.0 because the axon tunnel
    happened to be down in the driver's bench window (BENCH_r03.json) —
    a transient outage erased a real +81% perf round.  A committed
    last-known-good file lets a failed window report the newest real
    number, explicitly marked stale, instead of zero.
    """
    try:
        with open(_LKG_PATH, "w") as f:
            json.dump(record, f)
            f.write("\n")
    except OSError:
        pass


def _load_last_known_good() -> "dict | None":
    try:
        with open(_LKG_PATH) as f:
            rec = json.load(f)
        return rec if isinstance(rec, dict) and rec.get("value") else None
    except (OSError, ValueError):
        return None


def _device_probe(timeout_s: int = 240) -> bool:
    """Backend init in a child process with a hard timeout.

    A downed axon tunnel makes ``jax.devices()`` hang forever (observed
    round 3), which would stall the driver — probe in a subprocess so a
    hang becomes a clean zero-value record instead.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_with_retries() -> None:
    # The axon TPU tunnel sporadically fails compiles/executions, and can
    # be down for many minutes at a stretch (it erased the round-3 record
    # entirely: BENCH_r03.json = 0.0).  Spread probe attempts across the
    # bench window — a downed tunnel often heals within minutes — and on
    # persistent failure fall back to the committed last-known-good
    # measurement (marked "stale": true) rather than reporting zero.
    last = None
    # ~6 probes x (120s probe timeout + sleep) spans ~20 min worst case.
    probe_sleeps = [60, 120, 180, 240, 240]
    for attempt in range(len(probe_sleeps) + 1):
        if not (os.environ.get("RT_BENCH_CPU") or _device_probe(120)):
            last = RuntimeError("TPU backend init timed out (tunnel down)")
            print(f"bench attempt {attempt + 1}: {last}", file=sys.stderr)
            if attempt < len(probe_sleeps):
                time.sleep(probe_sleeps[attempt])
            continue
        try:
            main()
            return
        except Exception as e:  # noqa: BLE001
            last = e
            print(f"bench attempt {attempt + 1} failed: {e}", file=sys.stderr)
            time.sleep(20)
    lkg = _load_last_known_good()
    if lkg is not None:
        rec = dict(lkg)
        rec["stale"] = True
        rec["metric"] = rec.get("metric", "Mrays/s") + " [stale: last-known-good]"
        rec["error"] = str(last)[:300]
        print(json.dumps(rec))
        return
    print(
        json.dumps(
            {
                "metric": "Mrays/s (bench failed: TPU backend unavailable)",
                "value": 0.0,
                "unit": "Mrays/s",
                "vs_baseline": 0.0,
                "error": str(last)[:300],
            }
        )
    )


if __name__ == "__main__":
    _run_with_retries()
