"""Unit tests: intersection math vs analytic cases (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from ray_tracer_tpu.ops import intersect


def test_sphere_hit_front():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    dst, front, hit = intersect.intersect_spheres(
        o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0])
    )
    assert bool(hit[0, 0])
    assert bool(front[0, 0])
    np.testing.assert_allclose(float(dst[0, 0]), 4.0, rtol=1e-5)


def test_sphere_inside_backface():
    """Ray origin inside the sphere: far root, back face (raytrace.comp:209-215)."""
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    dst, front, hit = intersect.intersect_spheres(
        o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0])
    )
    assert bool(hit[0, 0]) and not bool(front[0, 0])
    np.testing.assert_allclose(float(dst[0, 0]), 1.0, rtol=1e-5)


def test_sphere_miss_behind():
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    dst, front, hit = intersect.intersect_spheres(
        o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0])
    )
    assert not bool(hit[0, 0])


def _tri_args(v0, v1, v2):
    v0, v1, v2 = (np.asarray(v, np.float32) for v in (v0, v1, v2))
    e1, e2 = v1 - v0, v2 - v0
    n = np.cross(e1, e2)
    return (
        jnp.asarray(v0)[None],
        jnp.asarray(e1)[None],
        jnp.asarray(e2)[None],
        jnp.asarray(n)[None],
    )


def test_triangle_hit_barycentric():
    v0, e1, e2, n = _tri_args([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.25, 0.25, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    dst, u, v, w, front, hit = intersect.intersect_tris(
        o, d, v0, e1, e2, n, jnp.array([False])
    )
    assert bool(hit[0])
    np.testing.assert_allclose(float(dst[0]), 1.0, rtol=1e-5)
    # reference convention: hit = w*A0 + u*A1 + v*A2
    np.testing.assert_allclose(float(u[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(v[0]), 0.25, atol=1e-5)


def test_triangle_front_only_culls_backface():
    v0, e1, e2, n = _tri_args([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    # front determinant d0 = -dot(dir, n): approaching from +z with n=+z
    # means d0 = +1 -> front face; flip to get a back face hit.
    dst, u, v, w, front, hit = intersect.intersect_tris(
        o, d, v0, e1, e2, n, jnp.array([False])
    )
    assert bool(hit[0]) and bool(front[0])
    o2 = jnp.array([[0.25, 0.25, -1.0]])
    d2 = jnp.array([[0.0, 0.0, 1.0]])
    dst, u, v, w, front, hit = intersect.intersect_tris(
        o2, d2, v0, e1, e2, n, jnp.array([True])
    )
    assert not bool(hit[0])  # backface + frontOnly culled (raytrace.comp:245)
    dst, u, v, w, front, hit = intersect.intersect_tris(
        o2, d2, v0, e1, e2, n, jnp.array([False])
    )
    assert bool(hit[0]) and not bool(front[0])


def test_slab_inside_box_returns_zero():
    o = jnp.array([[0.0, 0.0, 0.0]])
    inv = 1.0 / jnp.array([[1.0, 1.0, 1.0]])
    t = intersect.slab_test(o, inv, jnp.array([[-1.0, -1, -1]]), jnp.array([[1.0, 1, 1]]))
    np.testing.assert_allclose(float(t[0]), 0.0)


def test_slab_miss_sentinel():
    o = jnp.array([[5.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    inv = 1.0 / d
    t = intersect.slab_test(o, inv, jnp.array([[-1.0, -1, -1]]), jnp.array([[1.0, 1, 1]]))
    assert float(t[0]) == float(intersect.BIG)


def test_refract_matches_glsl():
    n = jnp.array([[0.0, 0.0, -1.0]])
    i = jnp.array([[np.sin(0.3), 0.0, np.cos(0.3)]], dtype=jnp.float32)
    eta = jnp.array([1.0 / 1.5])
    out = intersect.refract(i, n, eta)
    # Snell: sin_out = sin(0.3)/1.5
    np.testing.assert_allclose(
        float(out[0, 0]), np.sin(0.3) / 1.5, rtol=1e-5
    )
    assert float(out[0, 2]) > 0  # still travelling +z
