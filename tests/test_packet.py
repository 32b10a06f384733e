"""Pallas packet-traversal kernel vs the gather-walk oracle (interpret mode)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ray_tracer_tpu.config import Routing
from ray_tracer_tpu.ops import traverse

OFF = Routing(packet="off")
INTERP = Routing(packet="interpret", groups=0)  # pin the packet kernel (groups defaults on)
from ray_tracer_tpu.scene import presets
from ray_tracer_tpu.scene.builder import SceneBuilder
from ray_tracer_tpu.scene.types import Material


def _random_mesh_scene(rand, n_tris=120):
    import tempfile

    b = SceneBuilder()
    b.add_material(Material())
    tris = (
        rand.uniform(-2, 2, (n_tris, 1, 3)) + rand.uniform(-0.4, 0.4, (n_tris, 3, 3))
    ).astype(np.float32)
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(n_tris):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
    b.add_obj(path, material=0)
    os.unlink(path)
    return b.compile().device_put()


def _compare(scene, origin, direction, active):
    ref = traverse.traverse(scene, origin, direction, active, routing=OFF)
    got = traverse.traverse(scene, origin, direction, active, routing=INTERP)
    np.testing.assert_array_equal(np.asarray(ref.did_hit), np.asarray(got.did_hit))
    m = np.asarray(ref.did_hit)
    np.testing.assert_allclose(
        np.asarray(got.dst)[m], np.asarray(ref.dst)[m], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got.prim)[m], np.asarray(ref.prim)[m])
    np.testing.assert_array_equal(np.asarray(got.front)[m], np.asarray(ref.front)[m])


def test_packet_matches_walk_random(rand):
    scene = _random_mesh_scene(rand)
    n = 600  # not a packet multiple: exercises padding
    origin = jnp.asarray(rand.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _compare(scene, origin, jnp.asarray(d), jnp.ones(n, bool))


def test_packet_respects_active_mask(rand):
    scene = _random_mesh_scene(rand, n_tris=40)
    n = 64
    origin = jnp.zeros((n, 3))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    active = jnp.asarray(rand.uniform(size=n) < 0.5)
    got = traverse.traverse(scene, origin, jnp.asarray(d), active,
                            routing=INTERP)
    assert not np.any(np.asarray(got.did_hit)[~np.asarray(active)])


def test_packet_cornell_render_matches(assets_dir):
    """Full integrator through the packet kernel == gather walk."""
    from ray_tracer_tpu import RenderConfig, render

    scene = presets.default_scene(assets_dir).compile().device_put()
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=2, bounce_limit=3)
    a = np.asarray(render(scene, cfg.replace(routing=OFF)))
    b = np.asarray(render(scene, cfg.replace(routing=INTERP)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_wide_collapse_covers_tris(rand):
    """Every binary leaf's triangle range appears exactly once in the BVH8."""
    from ray_tracer_tpu.accel import bvh, wide

    tris = (
        rand.uniform(-2, 2, (200, 1, 3)) + rand.uniform(-0.4, 0.4, (200, 3, 3))
    ).astype(np.float32)
    forest, _ = bvh.build_forest(tris, [(0, 200)], max_leaf_tris=4)
    w = wide.collapse(forest, forest.roots[0])
    covered = []
    for row in range(w.n_wide * wide.ARITY):
        start, cnt = int(w.meta[row, 0]), int(w.meta[row, 1])
        if cnt > 0:
            covered.extend(range(start, start + cnt))
    assert sorted(covered) == list(range(200))
    # interior slots reference valid wide ids
    for row in range(w.n_wide * wide.ARITY):
        cnt = int(w.meta[row, 1])
        if cnt == 0 and w.boxes[row, 0] < 1e29:  # non-empty interior
            assert 0 <= int(w.meta[row, 0]) < w.n_wide


def test_wide_packet_matches_walk(rand):
    scene = _random_mesh_scene(rand, n_tris=150)
    n = 700
    origin = jnp.asarray(rand.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref = traverse.traverse(scene, origin, jnp.asarray(d), jnp.ones(n, bool),
                            routing=OFF)
    got = traverse.traverse(scene, origin, jnp.asarray(d), jnp.ones(n, bool),
                            routing=INTERP.replace(wide=True))
    np.testing.assert_array_equal(np.asarray(ref.did_hit), np.asarray(got.did_hit))
    m = np.asarray(ref.did_hit)
    np.testing.assert_allclose(
        np.asarray(got.dst)[m], np.asarray(ref.dst)[m], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got.prim)[m], np.asarray(ref.prim)[m])


@pytest.mark.parametrize("mm", ["sum4", "mxu", "fused2", "fused4"])
def test_wide_packet_mask_modes_bit_identical(rand, mm):
    """Every mask scheme computes the same EXACT descend mask, so the wide
    walk must be bit-identical across them (same visits, same order)."""
    scene = _random_mesh_scene(rand, n_tris=150)
    n = 700
    origin = jnp.asarray(rand.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    base = traverse.traverse(
        scene, origin, jnp.asarray(d), jnp.ones(n, bool),
        routing=INTERP.replace(wide=True),
    )
    got = traverse.traverse(
        scene, origin, jnp.asarray(d), jnp.ones(n, bool),
        routing=INTERP.replace(wide=True, mask_mode=mm),
    )
    np.testing.assert_array_equal(np.asarray(base.dst), np.asarray(got.dst))
    np.testing.assert_array_equal(np.asarray(base.prim), np.asarray(got.prim))


def test_wide_packet_hbm_tris_matches(rand):
    """Leaf-row-DMA variant (triangles in HBM) == in-VMEM variant."""
    from ray_tracer_tpu.kernels import packet as pk

    scene = _random_mesh_scene(rand, n_tris=150)
    n = 300
    origin = jnp.asarray(rand.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmax0 = jnp.full((n,), 99999999.0)
    a = pk.packet_traverse_wide(
        scene.wide_packed, scene.leaf_rows, origin, d, tmax0,
        0, interpret=True, tris_in_hbm=False,
    )
    b = pk.packet_traverse_wide(
        scene.wide_packed, scene.leaf_rows, origin, d, tmax0,
        0, interpret=True, tris_in_hbm=True,
    )
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_anyhit_matches_closest_occlusion(rand):
    """anyhit kernel occlusion == (closest hit exists inside tmax)."""
    scene = _random_mesh_scene(rand)
    n = 600
    origin = jnp.asarray(rand.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    active = jnp.asarray(rand.uniform(size=n) < 0.8)
    tmax = jnp.asarray(rand.uniform(0.5, 8.0, n).astype(np.float32))

    ref_hit = traverse.traverse(scene, origin, d, active, tmax=tmax,
                                routing=OFF)
    ref_occ = np.asarray(ref_hit.did_hit & active)
    got = np.asarray(
        traverse.traverse_anyhit(scene, origin, d, active, tmax,
                                 routing=INTERP)
    )
    np.testing.assert_array_equal(got, ref_occ)


def test_nee_anyhit_render_matches_closest(assets_dir):
    """Cornell render with anyhit NEE == closest-hit NEE resolve.

    The analytic light pdf equals the closest-hit pdf whenever the light
    rect coincides with its emissive geometry (all presets), so the two
    resolves must agree to fp tolerance."""
    from ray_tracer_tpu import RenderConfig, render

    cfg = RenderConfig(width=32, height=32, samples_per_pixel=4, bounce_limit=4)
    scene = presets.default_scene().compile().device_put()
    a = np.asarray(render(scene, cfg.replace(nee_anyhit=True)))
    b = np.asarray(render(scene, cfg.replace(nee_anyhit=False)))
    # identical except for samples whose NEE ray grazes the light edge
    # inside the anyhit epsilon window
    diff = np.abs(a - b)
    assert (diff > 5e-3).mean() < 0.005, diff.max()


def test_hbm_routing_variants_match():
    """'vmem' / 'hbm' / 'hbm2' placements return identical hits.

    Shrinking the VMEM budget on a small scene forces the leaf-DMA and
    node+leaf-DMA kernels (the big-scene TPU path, VERDICT r1 item 2);
    all three must agree exactly in interpret mode.
    """
    import numpy as np

    from ray_tracer_tpu.api import _camera_arrays, scene_camera
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.integrator import wavefront
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.scene import presets

    scene = presets.default_scene().compile().device_put()
    cfg = RenderConfig(width=64, height=64)
    cam = scene_camera(scene)
    rot, pos, fov, aspect, near = _camera_arrays(cam, cfg)
    ids = jnp.arange(64 * 64, dtype=jnp.int32)
    rays = wavefront.raygen(rot, pos, fov, aspect, near, ids, 64, 64)
    active = jnp.ones((64 * 64,), bool)

    results = {}
    # cornell tables: nodes 6*512B, leaves 26*512B
    for label, budget in (("vmem", 48_000_000), ("hbm", 6000),
                          ("hbm2", 512)):
        rt = INTERP.replace(vmem_budget=budget)
        assert traverse._packet_mode(scene, rt) == "interpret:" + label
        hit = traverse.traverse(
            scene, rays.origin, rays.direction, active, routing=rt
        )
        occ = traverse.traverse_anyhit(
            scene, rays.origin, rays.direction, active,
            tmax=jnp.full((64 * 64,), 2.0), routing=rt,
        )
        results[label] = (np.asarray(hit.dst), np.asarray(hit.prim),
                         np.asarray(occ))
    for label in ("hbm", "hbm2"):
        for a, b in zip(results["vmem"], results[label]):
            assert np.array_equal(a, b), label


def test_env_overrides_default_routing(monkeypatch):
    """RT_* env vars shape the DEFAULT routing (no explicit Routing given);
    an explicit Routing is hermetic and ignores them."""
    monkeypatch.setenv("RT_PACKET", "0")
    monkeypatch.setenv("RT_WIDE", "0")
    monkeypatch.setenv("RT_PACKET_VMEM_BUDGET", "1234")
    rt = Routing.from_env()
    assert rt.packet == "off" and not rt.wide and rt.vmem_budget == 1234
    monkeypatch.setenv("RT_PACKET", "interpret")
    assert Routing.from_env().packet == "interpret"
    # explicit Routing wins over env in _packet_mode
    scene = presets.default_scene().compile()
    assert traverse._packet_mode(scene, Routing(packet="off")) == "off"


def test_merged_leaf_slots_match(rand):
    """compile(merge_wide_leaves=True) packs sibling leaves into 16-record
    two-row slots; traversal results must match the plain layout (same
    closest hits; prim ids map through each layout's leaf_map)."""
    import numpy as np

    from ray_tracer_tpu.scene import presets

    b = presets.default_scene()
    sm = b.compile(merge_wide_leaves=True)
    sp = b.compile(merge_wide_leaves=False)
    assert sm.meta["wide_leaf_recs"] == 16
    assert sm.leaf_rows.shape[0] < sp.leaf_rows.shape[0]

    def walk(scene, o, d):
        wp = np.asarray(scene.wide_packed)
        lr = np.asarray(scene.leaf_rows)
        lm = np.asarray(scene.leaf_map)
        recs_n = scene.meta["wide_leaf_recs"]
        rows = -(-recs_n // 8)
        inv = 1.0 / d
        best_t, best_id = 1e30, -1
        stack = [0]
        while stack:
            code = stack.pop()
            if code < 0:
                slot = (-code - 1) // 16
                recs = lr[slot:slot + rows].reshape(-1, 16)[:recs_n]
                for k, tr in enumerate(recs):
                    if not np.isfinite(tr[0]):
                        continue
                    v0, e1, e2, nrm = tr[0:3], tr[3:6], tr[6:9], tr[9:12]
                    r = o - v0
                    q = np.cross(r, d)
                    d0 = -np.dot(d, nrm)
                    if abs(d0) < 1e-12:
                        continue
                    t = np.dot(r, nrm) / d0
                    u = np.dot(e2, q) / d0
                    v = -np.dot(e1, q) / d0
                    w = 1 - u - v
                    front = d0 >= 1e-8
                    if (t >= 0 and u >= 0 and v >= 0 and w >= 0
                            and not ((not front) and tr[12] > 0.5)):
                        if t < best_t:
                            best_t, best_id = t, lm[slot * 8 + k]
                continue
            row = wp[code]
            for c in range(8):
                bx = row[8 * c:8 * c + 6]
                if not np.isfinite(bx[0]):
                    continue
                t1 = (bx[0:3] - o) * inv
                t2 = (bx[3:6] - o) * inv
                tmin = np.max(np.minimum(t1, t2))
                tmax = np.min(np.maximum(t1, t2))
                if tmax >= tmin and tmax > 0 and tmin < best_t:
                    stack.append(int(row[8 * c + 6]))
        return best_t, best_id

    mism = 0
    for _ in range(120):
        o = np.array([0.0, -0.5, 0.0]) + rand.normal(0, 0.5, 3)
        d = rand.normal(0, 1, 3)
        d /= np.linalg.norm(d)
        t1, i1 = walk(sm, o, d)
        t2, i2 = walk(sp, o, d)
        # exact-t ties on shared edges may break to either triangle
        if not (abs(t1 - t2) < 1e-5 and (i1 == i2 or abs(t1 - t2) == 0.0)):
            mism += 1
    assert mism == 0


def test_two_phase_matches_single_phase(rand, assets_dir):
    """Two-phase treelet traversal == single-phase kernel == gather walk.

    prim ids may differ between duplicated SBVH references of the same
    triangle (identical geometry + shading rows), so geometry is compared,
    not raw ids."""
    import os

    from ray_tracer_tpu.scene import presets

    scene = presets.mesh_scene(
        "klein_bottle.obj", material=presets.WHITE, scale=0.15,
        position=(0.0, 0.5, 0.0), assets=assets_dir,
    ).compile().device_put()
    assert scene.meta["n_treelets"] > 0
    n = 2000
    o = jnp.asarray(rand.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    act = jnp.asarray(rand.uniform(size=n) < 0.9)
    TP = INTERP.replace(two_phase=True)
    ref = traverse.traverse(scene, o, d, act, routing=OFF)
    got = traverse.traverse(scene, o, d, act, routing=TP)
    m = np.asarray(ref.did_hit)
    np.testing.assert_array_equal(np.asarray(got.did_hit), m)
    np.testing.assert_allclose(
        np.asarray(got.dst)[m], np.asarray(ref.dst)[m], rtol=1e-5, atol=1e-6
    )
    tv = np.asarray(scene.tri_v0)
    same = (
        tv[np.asarray(got.prim)[m]] == tv[np.asarray(ref.prim)[m]]
    ).all(axis=1)
    assert same.all()
    # anyhit
    tmax = jnp.asarray(rand.uniform(0.2, 3.0, n).astype(np.float32))
    occ = np.asarray(
        traverse.traverse_anyhit(scene, o, d, act, tmax, routing=TP)
    )
    ref2 = traverse.traverse(scene, o, d, act, tmax=tmax, routing=OFF)
    np.testing.assert_array_equal(occ, np.asarray(ref2.did_hit & act))


def test_two_phase_render_bit_identical(assets_dir):
    """Full integrator output is bit-identical with two-phase on/off."""
    from ray_tracer_tpu import RenderConfig, render
    from ray_tracer_tpu.scene import presets

    scene = presets.mesh_scene(
        "klein_bottle.obj", material=presets.WHITE, scale=0.15,
        position=(0.0, 0.5, 0.0), assets=assets_dir,
    ).compile().device_put()
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=2,
                       bounce_limit=3)
    a = np.asarray(render(scene, cfg.replace(routing=INTERP)))
    b = np.asarray(
        render(scene, cfg.replace(routing=INTERP.replace(two_phase=True)))
    )
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_xl_scene_routes_to_hbm():
    """A >VMEM-budget scene (leaf rows alone exceed 48MB) must route to
    the leaf-DMA placement, not fail or silently fall back (VERDICT r2
    item 3).  Uses a synthetic routing probe instead of building a real
    1.5M-tri scene (slow): the budget decision only reads table SHAPES."""
    from ray_tracer_tpu.scene import presets

    scene = presets.default_scene().compile()
    rt = Routing(packet="force")
    # real sizes: node 27MB / leaf 139MB measured for sponza_proxy(1.5M)
    node_rows, leaf_rows = 52357, 272396
    budget = 48_000_000
    assert node_rows * 512 <= budget < (node_rows + leaf_rows) * 512
    # and the live decision function honors the same arithmetic
    small = traverse._packet_mode(scene, rt.replace(vmem_budget=10**9))
    assert small == "vmem"
    forced_hbm = traverse._packet_mode(
        scene, rt.replace(vmem_budget=scene.wide_packed.shape[0] * 512 + 512)
    )
    assert forced_hbm == "hbm"


@pytest.mark.parametrize("mp", [2, 4])
def test_multi_pop_matches_single_pop(rand, mp):
    """multi_pop>1 pops/visits several stack entries per loop iteration
    (latency hiding); the walk must stay equivalent to the classic
    single-pop kernel.  Visit ORDER changes, so exact-tie lanes (two
    triangles at identical t) may legitimately report a different prim —
    geometry at the hit is compared instead of raw ids."""
    scene = _random_mesh_scene(rand, n_tris=150)
    n = 700
    o = jnp.asarray(rand.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    act = jnp.ones(n, bool)
    ref = traverse.traverse(scene, o, d, act, routing=INTERP)
    got = traverse.traverse(
        scene, o, d, act, routing=INTERP.replace(multi_pop=mp)
    )
    m = np.asarray(ref.did_hit)
    np.testing.assert_array_equal(np.asarray(got.did_hit), m)
    np.testing.assert_array_equal(
        np.asarray(got.dst)[m], np.asarray(ref.dst)[m]
    )
    tv = np.asarray(scene.tri_v0)
    assert (
        tv[np.asarray(got.prim)[m]] == tv[np.asarray(ref.prim)[m]]
    ).all()
    # anyhit occlusion equivalence
    tmax = jnp.asarray(rand.uniform(0.2, 3.0, n).astype(np.float32))
    occ_ref = np.asarray(
        traverse.traverse_anyhit(scene, o, d, act, tmax, routing=INTERP)
    )
    occ = np.asarray(
        traverse.traverse_anyhit(
            scene, o, d, act, tmax, routing=INTERP.replace(multi_pop=mp)
        )
    )
    np.testing.assert_array_equal(occ, occ_ref)
