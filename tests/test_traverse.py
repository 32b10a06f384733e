"""Property test: BVH traversal == brute-force intersection on random scenes.

The reference's own brute-force sphere loop (raytrace.comp:282-287) is the
model oracle (SURVEY.md §4); here the oracle is a dense all-rays x all-tris
Moller-Trumbore, and the BVH path must return identical closest hits.
"""

import numpy as np
import jax.numpy as jnp

from ray_tracer_tpu.accel import bvh
from ray_tracer_tpu.ops import intersect, traverse
from ray_tracer_tpu.scene.builder import SceneBuilder
from ray_tracer_tpu.scene.types import Material


def build_tri_scene(rand, n_tris=80, two_objects=True):
    b = SceneBuilder()
    b.add_material(Material())
    tris = (
        rand.uniform(-2, 2, (n_tris, 1, 3)) + rand.uniform(-0.4, 0.4, (n_tris, 3, 3))
    ).astype(np.float32)
    import os
    import tempfile

    # write a temporary OBJ so the full builder path is exercised
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(n_tris):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
    b.add_obj(path, material=0)
    if two_objects:
        b.add_obj(path, material=0, position=(0.5, 0.5, 0.5), scale=(1.2, 0.8, 1.0))
    os.unlink(path)
    return b.compile(), tris


def brute_force_closest(scene, origin, direction):
    """Oracle: test every triangle of every object."""
    n = origin.shape[0]
    best = np.full(n, float(intersect.BIG), np.float32)
    n_obj = scene.n_objects
    for k in range(n_obj):
        inv = np.asarray(scene.obj_inv_transform[k])
        o = origin @ inv[:3, :3].T + inv[:3, 3]
        d = direction @ inv[:3, :3].T
        dst, *_ , hit = intersect.intersect_tris(
            jnp.asarray(o)[:, None, :],
            jnp.asarray(d)[:, None, :],
            scene.tri_v0[None, :, :],
            scene.tri_e1[None, :, :],
            scene.tri_e2[None, :, :],
            scene.tri_n[None, :, :],
            scene.tri_front_only[None, :],
        )
        dst = np.where(np.asarray(hit), np.asarray(dst), float(intersect.BIG))
        best = np.minimum(best, dst.min(axis=1))
    return best


def test_traversal_matches_brute_force(rand):
    scene, _ = build_tri_scene(rand)
    n_rays = 256
    origin = rand.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    direction = rand.normal(size=(n_rays, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)

    hit = traverse.traverse(
        scene.device_put(),
        jnp.asarray(origin),
        jnp.asarray(direction),
        jnp.ones(n_rays, bool),
    )
    oracle = brute_force_closest(scene, origin, direction)
    got = np.where(np.asarray(hit.did_hit), np.asarray(hit.dst), float(intersect.BIG))
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-5)


def test_inactive_lanes_return_no_hit(rand):
    scene, _ = build_tri_scene(rand, n_tris=20, two_objects=False)
    origin = np.zeros((8, 3), np.float32)
    direction = np.tile(np.array([0, 0, 1.0], np.float32), (8, 1))
    active = jnp.asarray([True, False] * 4)
    hit = traverse.traverse(
        scene.device_put(), jnp.asarray(origin), jnp.asarray(direction), active
    )
    assert not np.any(np.asarray(hit.did_hit)[~np.asarray(active)])


def test_sphere_only_scene(rand):
    b = SceneBuilder()
    b.add_material(Material())
    b.add_sphere((0, 0, 2.0), 1.0, 0)
    b.add_sphere((0, 0, 6.0), 1.0, 0)
    scene = b.compile()
    origin = jnp.zeros((4, 3))
    direction = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))
    hit = traverse.traverse(scene.device_put(), origin, direction, jnp.ones(4, bool))
    assert np.all(np.asarray(hit.did_hit))
    np.testing.assert_allclose(np.asarray(hit.dst), 1.0, rtol=1e-5)
    assert np.all(np.asarray(hit.kind) == traverse.KIND_SPHERE)
    assert np.all(np.asarray(hit.prim) == 0)


def test_flattened_matches_forest(rand):
    """Flattening instances to a global world-space BVH must not change any
    closest hit (it only changes traversal structure)."""
    import os
    import tempfile

    from ray_tracer_tpu.scene.types import Material as _M

    tris = (
        rand.uniform(-2, 2, (40, 1, 3)) + rand.uniform(-0.4, 0.4, (40, 3, 3))
    ).astype(np.float32)
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(40):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
    b = SceneBuilder()
    b.add_material(_M())
    b.add_obj(path, material=0)
    b.add_obj(path, material=0, position=(0.5, 0.2, 0.1),
              rotation_deg=(10, 20, 30), scale=(1.1, 0.9, 1.0))
    os.unlink(path)
    forest_scene = b.compile(flatten_instances=False).device_put()
    flat_scene = b.compile(flatten_instances=True).device_put()

    n_rays = 256
    origin = rand.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    direction = rand.normal(size=(n_rays, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    act = jnp.ones(n_rays, bool)

    h1 = traverse.traverse(forest_scene, jnp.asarray(origin), jnp.asarray(direction), act)
    h2 = traverse.traverse(flat_scene, jnp.asarray(origin), jnp.asarray(direction), act)
    np.testing.assert_array_equal(np.asarray(h1.did_hit), np.asarray(h2.did_hit))
    m = np.asarray(h1.did_hit)
    np.testing.assert_allclose(
        np.asarray(h1.dst)[m], np.asarray(h2.dst)[m], rtol=2e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(h1.obj)[m], np.asarray(h2.obj)[m])
