"""Next-event estimation over the scene's area-light table.

Generalizes the reference's *hardcoded* Cornell quad
(``shaders/raytrace.comp:368-403``, quirk Q3) to a table of rectangles: a
uniform point on the chosen rect, and the same solid-angle-measure PDF
``dst^2 / (cos_theta * area)`` — except the visibility term comes from the
integrator's single NEE traversal instead of the reference's *second*
redundant raycast (quirk Q4: ``lightSamplePDF`` re-traces the identical ray,
``raytrace.comp:396,443-447``; both traversals return the same hit, so
reusing it is output-identical and one traversal cheaper).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.intersect import dot


def sample_rect_light(scene, origin, r_pick, r1, r2):
    """Pick a light uniformly, sample a point on it.

    Returns (direction (N,3) normalized, light index (N,), select_weight (N,)).
    ``select_weight`` is the number of lights (the 1/L selection pdf folded
    into the estimator); with a single light this is exactly the reference.
    """
    n_lights = scene.n_lights
    if n_lights <= 1:
        # Single light (the reference's only case, quirk Q3): static row-0
        # slices broadcast across lanes — no per-lane table gathers.
        li = jnp.zeros(r_pick.shape, jnp.int32)
        corner = scene.light_corner[0]
        point = (
            corner
            + scene.light_edge_u[0] * r1[:, None]
            + scene.light_edge_v[0] * r2[:, None]
        )
    else:
        li = jnp.minimum((r_pick * n_lights).astype(jnp.int32), n_lights - 1)
        corner = scene.light_corner[li]
        point = (
            corner
            + scene.light_edge_u[li] * r1[:, None]
            + scene.light_edge_v[li] * r2[:, None]
        )
    vec = point - origin
    dist = jnp.linalg.norm(vec, axis=-1)
    direction = vec / jnp.maximum(dist, 1e-20)[:, None]
    return direction, li, jnp.float32(n_lights), dist


def rect_light_pdf_analytic(scene, li, direction, dist):
    """Solid-angle PDF of a sampled light point at known distance ``dist``.

    The unoccluded value of :func:`rect_light_pdf`: when the shadow ray
    reaches the sampled point, the reference's raycast hits the light at
    exactly this distance (raytrace.comp:396-402), so the pdf needs no
    traversal at all.  A back-side sample (``cos_theta < 0``) yields a
    NEGATIVE pdf — and hence a negative contribution that trips the
    bad-sample zeroing — exactly like the reference's :460+:505 path.
    """
    if scene.n_lights <= 1:
        normal, area = scene.light_normal[0], scene.light_area[0]
    else:
        normal, area = scene.light_normal[li], scene.light_area[li]
    cos_theta = dot(normal, direction)
    return dist * dist / (cos_theta * area)


def rect_light_emission(scene, li):
    """Emission radiance of light ``li`` via its material slot."""
    if scene.n_lights <= 1:
        mat = scene.light_mat[0]
        return (
            scene.mat_emission[mat] * scene.mat_emission_strength[mat]
        )[None, :]
    mat = scene.light_mat[li]
    return (
        scene.mat_emission[mat] * scene.mat_emission_strength[mat][:, None]
    )


def rect_light_pdf(scene, li, direction, hit_dst, hit_emissive):
    """Solid-angle PDF of the sampled direction given the NEE hit.

    Mirrors ``lightSamplePDF`` (raytrace.comp:389-403): zero unless the ray
    actually reached an emissive surface; otherwise ``dst^2/(cos * area)``.
    """
    cos_theta = dot(scene.light_normal[li], direction)
    pdf = hit_dst * hit_dst / (cos_theta * scene.light_area[li])
    return jnp.where(hit_emissive, pdf, 0.0)
