"""Batched SoA intersection primitives (sphere / triangle / AABB slab).

Vectorized re-derivations of the reference's per-thread GLSL routines:
``sphereIntersection`` (``shaders/raytrace.comp:195-224``),
``triangleIntersection`` (Moller-Trumbore, ``:226-261``) and
``boxIntersection`` (``:263-274``).  All functions are elementwise over a
leading ray-batch axis and jit/vmap-friendly (no data-dependent shapes).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# numpy scalars (jnp constants at module level would initialize the backend
# at import, breaking later jax_platforms overrides)
BIG = np.float32(99999999.0)  # miss sentinel, raytrace.comp:272,279
EPS_FRONT = np.float32(1e-8)  # front-face determinant cutoff, :244


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def intersect_spheres(origin, direction, sph_pos, sph_radius):
    """All rays x all spheres.

    origin/direction: (N,3); sph_pos: (S,3); sph_radius: (S,).
    Returns (dst (N,S), front (N,S), hit (N,S)) with the reference's
    front/back handling: nearest positive root, back face if the near root is
    behind the origin (raytrace.comp:205-215).
    """
    oc = sph_pos[None, :, :] - origin[:, None, :]  # (N,S,3)
    d = direction[:, None, :]
    a = jnp.sum(d * d, axis=-1)
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - sph_radius[None, :] ** 2
    disc = b * b - a * c
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (b - sqrtd) / a
    t1 = (b + sqrtd) / a
    front = t0 >= 0
    dst = jnp.where(front, t0, t1)
    hit = (disc >= 0) & (dst >= 0) & (sph_radius[None, :] > 0)
    return jnp.where(hit, dst, BIG), front, hit


def intersect_tris(origin, direction, v0, e1, e2, n, front_only):
    """Moller-Trumbore, one triangle per ray lane.

    origin/direction/v0/e1/e2/n: (...,3); front_only: (...,) bool.
    ``e1 = v1 - v0``, ``e2 = v2 - v0``, ``n = cross(e1, e2)`` precomputed
    host-side.  Returns (dst, u, v, w, front, hit); barycentrics follow the
    reference's convention: ``hit = w*A0 + u*A1 + v*A2`` (raytrace.comp:252).
    """
    rov0 = origin - v0
    q = cross(rov0, direction)
    d0 = -dot(direction, n)
    d = 1.0 / d0
    dst = dot(rov0, n) * d
    u = dot(e2, q) * d
    v = -dot(e1, q) * d
    w = 1.0 - u - v
    front = d0 >= EPS_FRONT
    hit = (dst >= 0) & (u >= 0) & (v >= 0) & (w >= 0) & ~(~front & front_only)
    return jnp.where(hit, dst, BIG), u, v, w, front, hit


def slab_test(origin, inv_dir, box_min, box_max):
    """AABB entry distance or BIG sentinel (raytrace.comp:263-274)."""
    t_min = (box_min - origin) * inv_dir
    t_max = (box_max - origin) * inv_dir
    t1 = jnp.minimum(t_min, t_max)
    t2 = jnp.maximum(t_min, t_max)
    t_near = jnp.max(t1, axis=-1)
    t_far = jnp.min(t2, axis=-1)
    hit = (t_far >= t_near) & (t_far > 0)
    return jnp.where(hit, jnp.maximum(t_near, 0.0), BIG)


def reflect(incident, normal):
    return incident - 2.0 * dot(incident, normal)[..., None] * normal


def refract(incident, normal, eta):
    """GLSL refract(); returns 0 on total internal reflection."""
    cos_i = dot(normal, incident)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    safe_k = jnp.maximum(k, 0.0)
    out = (
        eta[..., None] * incident
        - (eta * cos_i + jnp.sqrt(safe_k))[..., None] * normal
    )
    return jnp.where((k < 0)[..., None], 0.0, out)
