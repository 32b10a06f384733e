"""Scene compiler tests: OBJ/MTL parsing against the reference assets
(SURVEY.md §4: parser tests vs assets/cube.obj, test_plane.obj + its .mtl)."""

import os

import numpy as np
import pytest

from ray_tracer_tpu.scene import mtlio, objio, presets
from ray_tracer_tpu.scene.builder import SceneBuilder
from ray_tracer_tpu.scene.types import Material
from ray_tracer_tpu.utils.transforms import camera_rotation, trs_matrix


def test_parse_cube(assets_dir):
    mesh = objio.parse_obj(os.path.join(assets_dir, "cube.obj"))
    assert mesh.n_tris == 12  # triangulated cube
    assert len(mesh.groups) == 1
    g = mesh.groups[0]
    # all vertices on the unit cube
    assert np.all(np.abs(np.abs(g.positions) - 1.0) < 1e-6)
    # normals are unit axis vectors
    assert np.allclose(np.linalg.norm(g.normals, axis=-1), 1.0, atol=1e-4)


def test_parse_plane(assets_dir):
    mesh = objio.parse_obj(os.path.join(assets_dir, "plane.obj"))
    assert mesh.n_tris == 2
    g = mesh.groups[0]
    assert np.allclose(g.positions[:, :, 1], 0.0)  # y = 0 plane


def test_parse_test_plane_mtl(assets_dir):
    mesh = objio.parse_obj(os.path.join(assets_dir, "test_plane.obj"))
    assert mesh.mtl_path and os.path.exists(mesh.mtl_path)
    lib = mtlio.parse_mtl(mesh.mtl_path)
    assert len(lib.materials) >= 1
    # albedo = Ka * Kd per reference vk_engine.cpp:1100
    for m in lib.materials.values():
        assert all(0.0 <= c <= 1.0 for c in m.albedo)


def test_usemtl_grouping(tmp_path):
    p = tmp_path / "two.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "usemtl a\nf 1 2 3\nusemtl b\nf 1 2 4\nf 1 3 4\n"
    )
    mesh = objio.parse_obj(str(p))
    assert [g.positions.shape[0] for g in mesh.groups] == [1, 2]


def test_dedupe_reuses_bvh(assets_dir):
    b = SceneBuilder()
    b.add_material(Material())
    cube = os.path.join(assets_dir, "cube.obj")
    b.add_obj(cube, material=0, position=(0, 0, 0))
    b.add_obj(cube, material=0, position=(2, 0, 0))
    # forest mode: reference dedupe semantics (vk_engine.cpp:802-815)
    scene = b.compile(flatten_instances=False)
    assert scene.n_objects == 2
    assert int(scene.obj_bvh_root[0]) == int(scene.obj_bvh_root[1])
    assert scene.meta["n_tris"] == 12  # triangles stored once
    # flattened mode: instances baked to world space, one global BVH
    flat = b.compile(flatten_instances=True)
    assert flat.meta["n_tris"] == 24
    assert flat.meta["flattened"]


def test_default_scene_matches_reference_shape(assets_dir):
    scene = presets.default_scene(assets_dir).compile()
    # 2 cubes + light + 6 walls = 9 render objects (vk_engine.cpp:638-751)
    assert scene.n_objects == 9
    assert scene.meta["n_materials"] == 6
    # 2 cubes share one mesh: 12 + light 10(2 tris x5 faces? actual) ...
    # just sanity: all 6 cornell pieces present
    assert scene.meta["n_tris"] > 20
    assert scene.n_lights == 1
    np.testing.assert_allclose(np.asarray(scene.light_area), 4.0 / 9.0, rtol=1e-5)


def test_trs_matrix_translation_rotation():
    m = trs_matrix((1, 2, 3), (0, 90, 0), (1, 1, 1))
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3], atol=1e-6)
    # Ry(90): +z -> +x  (standard right-handed rotation)
    v = m[:3, :3] @ np.array([0, 0, 1.0])
    np.testing.assert_allclose(v, [1, 0, 0], atol=1e-6)


def test_camera_rotation_identity_at_zero():
    np.testing.assert_allclose(camera_rotation((0, 0, 0)), np.eye(3), atol=1e-7)


def test_inverse_transform_precomputed(assets_dir):
    scene = presets.default_scene(assets_dir).compile()
    t = np.asarray(scene.obj_transform)
    inv = np.asarray(scene.obj_inv_transform)
    prod = np.einsum("oij,ojk->oik", t, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (t.shape[0], 1, 1)), atol=1e-4)
