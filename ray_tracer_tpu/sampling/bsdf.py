"""BSDF sampling helpers (batched, branchless).

Replicates the math of the reference's three lobes —
``diffuseBRDF``/``specularBRDF``/``dielectricBTDF``
(``shaders/raytrace.comp:430-481``) and ``cosineHemisphereDir``/``schlick``
(``:405-428,177-181``) — as pure array functions over the ray batch.  Lobe
*selection* happens in the integrator with ``jnp.where`` (all three lobes are
evaluated for every lane; divergence costs more than redundant VPU math).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.intersect import dot

import numpy as np

INV_PI = np.float32(0.3183098862)  # raytrace.comp:7 (np: no backend init)


def cosine_hemisphere_dir(normal, r1, r2):
    """Cosine-weighted hemisphere sample via the reference's Gram-Schmidt ONB
    (raytrace.comp:405-424)."""
    phi = 2.0 * jnp.pi * r1
    sqrt_r2 = jnp.sqrt(r2)
    x = jnp.cos(phi) * sqrt_r2
    y = jnp.sin(phi) * sqrt_r2
    z = jnp.sqrt(1.0 - r2)

    non_parallel = jnp.where(
        (jnp.abs(normal[:, 0]) < 1.0)[:, None],
        jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 0.0, 1.0]),
    )
    t = jnp.cross(normal, non_parallel)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    b = jnp.cross(normal, t)
    return t * x[:, None] + b * y[:, None] + normal * z[:, None]


def cosine_hemisphere_pdf(normal, direction):
    """raytrace.comp:426-428."""
    return jnp.maximum(0.0, dot(direction, normal) * INV_PI)


def uniform_hemisphere_dir(normal, r1, r2):
    """Uniform hemisphere sample (pdf 1/2pi) for the estimator-ablation
    modes reproduced from the reference's importance-sampling study
    (renders/importance_sampling/cornell_uniform.png): a uniform sphere
    point mirrored into the normal's hemisphere."""
    phi = 2.0 * jnp.pi * r1
    z = 2.0 * r2 - 1.0
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    d = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
    return jnp.where(dot(d, normal)[:, None] < 0.0, -d, d)


def schlick(cosine, refraction_index):
    """raytrace.comp:177-181."""
    r0 = (1.0 - refraction_index) / (1.0 + refraction_index)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5
