"""MXU cluster pipeline vs the gather-walk oracle (interpret mode).

Covers accel/cluster.py (coefficient pages, cluster cut, enum BVH8),
kernels/cluster.py (the matmul-dense chunk test) and
ops/cluster_trace.py (enumerate / group / test / resolve + overflow
fallback), all through the public traverse() routing.
"""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from ray_tracer_tpu.config import Routing
from ray_tracer_tpu.ops import traverse
from ray_tracer_tpu.scene.builder import SceneBuilder
from ray_tracer_tpu.scene.types import Material

OFF = Routing(packet="off")
# default enum = 'boxes' (two-level brute-force slab matmuls)
CLUSTER = Routing(packet="interpret", cluster="on")
# the packet-emit enumeration walk (also the >128-super fallback flavor)
CLUSTER_PKT = Routing(packet="interpret", cluster="on",
                      cluster_enum="packet")
# tiny K forces real overflow traffic through the packet-walk fallback
CLUSTER_K2 = Routing(packet="interpret", cluster="on", cluster_k=2)


def _mesh_scene(rand, n_tris=160, t_c=16, front_only=False):
    b = SceneBuilder()
    b.add_material(Material())
    tris = (
        rand.uniform(-2, 2, (n_tris, 1, 3))
        + rand.uniform(-0.5, 0.5, (n_tris, 3, 3))
    ).astype(np.float32)
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(n_tris):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
    b.add_obj(path, material=0, front_only=front_only)
    os.unlink(path)
    # small t_c => several clusters even on a small mesh
    return b.compile(cluster_t_c=t_c).device_put()


def _rays(rand, n):
    origin = jnp.asarray(rand.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return origin, jnp.asarray(d)


def test_mt_page_quantities(rand):
    """Coefficient-page contraction reproduces Moller-Trumbore exactly."""
    from ray_tracer_tpu.accel.cluster import _mt_pages, N_BLOCKS

    n_tri = 7
    tri_packed = np.zeros((n_tri, 16), np.float32)
    v0 = rand.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    e1 = rand.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    e2 = rand.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    tri_packed[:, 0:3] = v0
    tri_packed[:, 3:6] = e1
    tri_packed[:, 6:9] = e2
    tri_packed[:, 9:12] = np.cross(e1, e2)
    tri_packed[:, 12] = (np.arange(n_tri) % 2).astype(np.float32)
    t_c = 8
    pages = _mt_pages(
        tri_packed, np.array([0], np.int32), np.array([n_tri], np.int32), t_c
    )
    assert pages.shape == (1, 16, N_BLOCKS * t_c)

    o = rand.uniform(-2, 2, (5, 3)).astype(np.float32)
    d = rand.normal(size=(5, 3)).astype(np.float32)
    f = np.concatenate(
        [o, d, np.cross(o, d), np.ones((5, 1), np.float32),
         np.zeros((5, 6), np.float32)], axis=1,
    )
    out = f @ pages[0]  # (5, 5*t_c)
    n_geo = tri_packed[:, 9:12]
    for ri in range(5):
        for k in range(n_tri):
            r = o[ri] - v0[k]
            q = np.cross(r, d[ri])
            d0 = -np.dot(d[ri], n_geo[k])
            np.testing.assert_allclose(
                out[ri, 0 * t_c + k], np.dot(r, n_geo[k]), rtol=2e-4,
                atol=2e-4)
            np.testing.assert_allclose(
                out[ri, 1 * t_c + k], d0, rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(
                out[ri, 2 * t_c + k], np.dot(e2[k], q), rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(
                out[ri, 3 * t_c + k], -np.dot(e1[k], q), rtol=2e-4, atol=2e-4)
            assert out[ri, 4 * t_c + k] == tri_packed[k, 12]
    # padding columns are all zero
    assert not out[:, n_tri:t_c].any()


def test_cluster_cut_covers_range(rand):
    scene = _mesh_scene(rand, n_tris=120, t_c=16)
    assert scene.meta["n_clusters"] > 3
    starts = np.asarray(scene.clus_start)
    # contiguous, ordered, covering [0, n_tris)
    assert starts[0] == 0
    assert np.all(np.diff(starts) > 0)


def _compare(scene, origin, direction, routing, check_prim=True):
    n = origin.shape[0]
    active = jnp.ones(n, bool)
    ref = traverse.traverse(scene, origin, direction, active, routing=OFF)
    got = traverse.traverse(scene, origin, direction, active,
                            routing=routing)
    np.testing.assert_array_equal(
        np.asarray(ref.did_hit), np.asarray(got.did_hit)
    )
    m = np.asarray(ref.did_hit)
    np.testing.assert_allclose(
        np.asarray(got.dst)[m], np.asarray(ref.dst)[m], rtol=1e-4, atol=1e-5
    )
    if check_prim:
        np.testing.assert_array_equal(
            np.asarray(got.prim)[m], np.asarray(ref.prim)[m]
        )
        np.testing.assert_array_equal(
            np.asarray(got.front)[m], np.asarray(ref.front)[m]
        )


def test_cluster_matches_walk(rand):
    scene = _mesh_scene(rand, n_tris=160, t_c=16)
    o, d = _rays(rand, 500)  # non-multiple exercises padding
    _compare(scene, o, d, CLUSTER)


def test_cluster_matches_walk_packet_enum(rand):
    scene = _mesh_scene(rand, n_tris=160, t_c=16)
    o, d = _rays(rand, 500)
    _compare(scene, o, d, CLUSTER_PKT)


def test_extract_slots(rand):
    from ray_tracer_tpu.kernels.cluster import extract_slots

    m = 64
    words = np.zeros((m, 4), np.int64)
    expect = []
    for i in range(m):
        bits = sorted(rand.choice(128, size=rand.integers(0, 12),
                                  replace=False))
        for b in bits:
            words[i, b // 32] |= 1 << (b % 32)
        expect.append(bits)
    words = jnp.asarray(words.astype(np.uint32).view(np.int32))
    slots, ovf = extract_slots(words, 8)
    slots = np.asarray(slots)
    ovf = np.asarray(ovf)
    for i in range(m):
        want = expect[i][:8]
        got = [s for s in slots[i] if s >= 0]
        assert got == want, (i, got, want)
        assert bool(ovf[i]) == (len(expect[i]) > 8)


def test_cluster_multi_super(rand):
    """Enough geometry for several supers: exercises level-2 grouping
    (pairs sorted by super, per-super cluster pages) end to end."""
    scene = _mesh_scene(rand, n_tris=2400, t_c=16)
    assert scene.meta["n_supers"] >= 2, scene.meta["n_supers"]
    o, d = _rays(rand, 700)
    _compare(scene, o, d, CLUSTER)


def test_cluster_overflow_fallback(rand):
    """K=2 overflows many lanes; the packet-walk fallback must cover them."""
    scene = _mesh_scene(rand, n_tris=160, t_c=16)
    o, d = _rays(rand, 300)
    _compare(scene, o, d, CLUSTER_K2)


def test_cluster_translated_scene(rand):
    """Translation invariance: cluster-local anchors keep the bilinear
    factorization's error at CLUSTER-LOCAL magnitudes regardless of
    world position (round-3 review finding: without anchoring, dst error
    grew ~linearly with |origin| — 5e-4 at 2e3, ~1e-2 at 1e5 — and the
    winning prim diverged).  The factorized form still differs from the
    oracle's r-first evaluation by bounded grazing-incidence noise, so
    the gate is: the error at offset 2e3 and at 2e5 must be the SAME
    small bound, not growing with the offset."""
    errs = {}
    for off_val in (2.0e3, 2.0e5):
        b = SceneBuilder()
        b.add_material(Material())
        n_tris = 160
        rs = np.random.default_rng(5)  # same geometry at both offsets
        off = np.float32(off_val)
        tris = (
            rs.uniform(-2, 2, (n_tris, 1, 3))
            + rs.uniform(-0.5, 0.5, (n_tris, 3, 3))
        ).astype(np.float32) + off
        fd, path = tempfile.mkstemp(suffix=".obj")
        with os.fdopen(fd, "w") as f:
            for t in tris:
                for v in t:
                    f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for i in range(n_tris):
                f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
        b.add_obj(path, material=0)
        os.unlink(path)
        scene = b.compile(cluster_t_c=16).device_put()
        o = jnp.asarray(
            (rs.uniform(-4, 4, (400, 3)) + off).astype(np.float32)
        )
        d = rs.normal(size=(400, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        active = jnp.ones(400, bool)
        ref = traverse.traverse(scene, o, d, active, routing=OFF)
        got = traverse.traverse(scene, o, d, active, routing=CLUSTER)
        mr = np.asarray(ref.did_hit)
        mg = np.asarray(got.did_hit)
        # grazing rays may flip did_hit either way at f32-quantized
        # geometry (the coordinates themselves carry ~|off|*eps ULPs, and
        # the enum/packet slab tests' hoisted box*inv - o*inv form cancels
        # at ~|off|*eps absolute — the same envelope the production wide
        # kernel and the reference's GLSL have); require agreement on all
        # but a grazing fraction that scales with the offset's ULP size
        flips = (mr != mg).sum()
        cap = max(2, (0.02 if off_val < 1e4 else 0.10) * mr.sum())
        assert flips <= cap, (off_val, flips, mr.sum())
        m = mr & mg
        rel = np.abs(np.asarray(got.dst)[m] - np.asarray(ref.dst)[m]) / (
            np.abs(np.asarray(ref.dst)[m]) + 1e-6
        )
        # bounded grazing noise; at the extreme offset the two paths can
        # legitimately resolve different (quantized-coincident) triangles
        # on a few lanes, so the hard max-gate applies at 2e3 and the
        # robust median everywhere
        if off_val < 1e4:
            assert rel.max() < 5e-3, (off_val, rel.max())
        errs[off_val] = float(np.median(rel))
    # ...and NOT growing with the offset (100x farther, same error scale;
    # without anchoring the unanchored form grew ~20x here)
    assert errs[2.0e5] < 3 * max(errs[2.0e3], 1e-6), errs


def test_cluster_t_c_validation(rand):
    import pytest

    b = SceneBuilder()
    b.add_material(Material())
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    b.add_obj(path, material=0)
    os.unlink(path)
    with pytest.raises(ValueError, match="power of two"):
        b.compile(cluster_t_c=24)


def test_cluster_capacity_degrades_to_off(rand, monkeypatch):
    """A ClusterCapacityError (depth-capped leaf > t_c refs on
    pathological geometry) must NOT fail the whole compile when clusters
    weren't explicitly requested — the packet kernel serves the scene —
    but a forced clusters=True still surfaces it (round-3 advisor)."""
    import pytest

    from ray_tracer_tpu.accel import cluster as cluster_mod

    def boom(*a, **k):
        raise cluster_mod.ClusterCapacityError("synthetic oversized leaf")

    monkeypatch.setattr(cluster_mod, "build_cluster_tables", boom)

    def make_builder():
        b = SceneBuilder()
        b.add_material(Material())
        fd, path = tempfile.mkstemp(suffix=".obj")
        with os.fdopen(fd, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        b.add_obj(path, material=0)
        os.unlink(path)
        return b

    # cluster_t_c opt-in on pathological geometry: degrade, don't fail
    sc = make_builder().compile(cluster_t_c=128)
    assert int(sc.meta.get("n_clusters", 0)) == 0
    # default: tables are skipped entirely (route measured off, r4)
    sc = make_builder().compile()
    assert int(sc.meta.get("n_clusters", 0)) == 0
    with pytest.raises(cluster_mod.ClusterCapacityError):
        make_builder().compile(clusters=True)  # forced: surface


def test_cluster_cut_convergence_check(rand):
    """cluster_cut fails loudly (not silently-wrong ranges) if the
    forest's max_depth_seen under-reports the real depth (round-3
    advisor)."""
    import dataclasses

    import pytest

    from ray_tracer_tpu.accel.bvh import build_forest
    from ray_tracer_tpu.accel.cluster import cluster_cut

    tris = (
        rand.uniform(-2, 2, (160, 1, 3))
        + rand.uniform(-0.5, 0.5, (160, 3, 3))
    ).astype(np.float32)
    forest, _perm = build_forest(tris.reshape(160, 9), [(0, 160)])
    assert forest.max_depth_seen > 3  # the lie below must matter
    lying = dataclasses.replace(forest, max_depth_seen=0)
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_cut(lying, lying.roots[0], 16)


def test_cluster_front_only(rand):
    scene = _mesh_scene(rand, n_tris=100, t_c=16, front_only=True)
    o, d = _rays(rand, 300)
    _compare(scene, o, d, CLUSTER)


def test_cluster_sbvh_scene(rand):
    """SBVH scene (spatial splits duplicate refs with clipped boxes):
    cluster candidates come from CLIPPED node boxes, so completeness
    holds through the duplicate set — hits must match the oracle, and
    prim may differ only by picking another duplicate of the SAME
    geometry."""
    from ray_tracer_tpu.scene import presets

    scene = presets.sponza_proxy(8000).compile(clusters=True).device_put()
    o, d = _rays(rand, 768)
    # aim rays into the scene from the camera region
    o = jnp.asarray(np.asarray(o) * 0.1 + np.array([0, -0.5, -3.0],
                                                   np.float32))
    active = jnp.ones(768, bool)
    ref = traverse.traverse(scene, o, d, active, routing=OFF)
    got = traverse.traverse(scene, o, d, active, routing=CLUSTER)
    np.testing.assert_array_equal(
        np.asarray(ref.did_hit), np.asarray(got.did_hit)
    )
    m = np.asarray(ref.did_hit)
    np.testing.assert_allclose(
        np.asarray(got.dst)[m], np.asarray(ref.dst)[m], rtol=2e-4,
        atol=1e-5,
    )
    pr = np.asarray(ref.prim)[m]
    pg = np.asarray(got.prim)[m]
    mm = pr != pg
    tp = np.asarray(scene.tri_packed)
    same_geo = np.all(
        np.isclose(tp[pr[mm]][:, :12], tp[pg[mm]][:, :12]), axis=1
    )
    assert same_geo.all(), "prim diff beyond SBVH duplicates"


def test_cluster_anyhit_matches(rand):
    scene = _mesh_scene(rand, n_tris=140, t_c=16)
    o, d = _rays(rand, 400)
    n = o.shape[0]
    active = jnp.ones(n, bool)
    tmax = jnp.full((n,), 3.0)
    ref = traverse.traverse_anyhit(scene, o, d, active, tmax, routing=OFF)
    got = traverse.traverse_anyhit(scene, o, d, active, tmax,
                                   routing=CLUSTER)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_cluster_sliced_wavefront(rand, monkeypatch):
    """n > SLICE routes through the lax.map slicing — same results."""
    from ray_tracer_tpu.ops import cluster_trace

    scene = _mesh_scene(rand, n_tris=120, t_c=16)
    o, d = _rays(rand, 700)
    monkeypatch.setattr(cluster_trace, "SLICE", 256)
    _compare(scene, o, d, CLUSTER)


def test_cluster_prim_space(rand):
    scene = _mesh_scene(rand, n_tris=60, t_c=16)
    assert traverse.prim_space(scene, CLUSTER) == "tri"
    assert traverse.prim_space(scene, Routing(packet="interpret")) == "slot"


def test_cluster_alpha_cutout(rand, tmp_path):
    """Alpha cutouts are shade-time pass-throughs; the cluster traversal
    must compose (left half cut out -> emissive wall visible behind)."""
    from ray_tracer_tpu import api
    from ray_tracer_tpu.config import RenderConfig
    from tests.test_material_maps import (
        _write_quad_obj, _write_half_png, CFG,
    )
    from ray_tracer_tpu.scene.builder import SceneBuilder
    from ray_tracer_tpu.scene.types import Camera, Environment

    quad = str(tmp_path / "quad.obj")
    wall = str(tmp_path / "wall.obj")
    amap = str(tmp_path / "a.png")
    _write_quad_obj(quad, z=0.0)
    _write_quad_obj(wall, z=2.0, half=4.0)
    _write_half_png(amap, 0, 255)
    b = SceneBuilder()
    tex = b.add_texture(amap)
    dark = b.add_material(Material(albedo=(0.05, 0.05, 0.05),
                                   alpha_tex=tex))
    glow = b.add_material(
        Material(emission_color=(1, 1, 1), emission_strength=3.0)
    )
    b.add_obj(quad, material=dark)
    b.add_obj(wall, material=glow)
    b.set_environment(Environment(enabled=False))
    b.set_camera(Camera(position=(0, 0, -4), angles_deg=(0, 0, 0)))
    sc = b.compile(cluster_t_c=16).device_put()
    img_ref = np.asarray(api.render(sc, CFG.replace(routing=OFF)))
    img_cl = np.asarray(api.render(sc, CFG.replace(routing=CLUSTER)))
    np.testing.assert_allclose(img_cl, img_ref, rtol=2e-4, atol=2e-4)
    assert img_cl[8:16, 3:11].mean() > 0.5  # cutout side sees the wall


def test_cluster_render_golden(rand):
    """End-to-end render equivalence: cluster routing vs the oracle."""
    from ray_tracer_tpu import api
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.scene import presets

    sc = presets.cornell_spheres().compile(cluster_t_c=16).device_put()
    base = RenderConfig(width=24, height=24, samples_per_pixel=4,
                        bounce_limit=3)
    img_ref = api.render(sc, base.replace(routing=OFF))
    img_cl = api.render(sc, base.replace(routing=CLUSTER))
    np.testing.assert_allclose(
        np.asarray(img_cl), np.asarray(img_ref), rtol=2e-4, atol=2e-4
    )
