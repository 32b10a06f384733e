"""Procedural environment light.

Replicates ``getEnvironmentLight`` (``shaders/raytrace.comp:356-365``), the
Sebastian-Lague-style sky: horizon/zenith gradient keyed on ``-dir.y`` (the
scene's y axis points down), a ``pow(dot, focus) * intensity`` sun, and a
ground plane mask.  Disabled (black) unless ``env_light_dir.w == 1``.
"""

from __future__ import annotations

import jax.numpy as jnp


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def environment_light(scene, direction):
    """(N,3) ray directions -> (N,3) radiance."""
    horizon = scene.env_horizon[:3]
    sun_focus = scene.env_horizon[3]
    zenith = scene.env_zenith[:3]
    sun_intensity = scene.env_zenith[3]
    ground = scene.env_ground
    light_dir = scene.env_light_dir[:3]
    enabled = scene.env_light_dir[3]

    neg_y = -direction[:, 1]
    sky_t = smoothstep(0.0, 0.4, neg_y) ** 0.35
    sky = horizon[None, :] + (zenith - horizon)[None, :] * sky_t[:, None]
    cos_sun = jnp.maximum(0.0, -jnp.sum(direction * light_dir[None, :], axis=-1))
    sun = cos_sun**sun_focus * sun_intensity

    ground_to_sky = smoothstep(-0.01, 0.0, neg_y)
    sun_mask = (ground_to_sky >= 1.0).astype(jnp.float32)
    col = (
        ground[None, :]
        + (sky - ground[None, :]) * ground_to_sky[:, None]
        + (sun * sun_mask)[:, None]
    )
    return jnp.where(enabled == 1.0, col, 0.0)
