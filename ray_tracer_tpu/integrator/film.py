"""Film: float32 accumulation, progressive blending, display transform.

The reference accumulates its progressive EMA straight into an rgba8 storage
image (quirk Q2, ``raytrace.comp:576-578`` + ``vk_engine.cpp:1380``), losing
precision at high frame counts; here the accumulator is float32 and
quantization happens only at export.  The blend weight matches the
reference: ``w = 1/(frame+1)`` — a running mean over frames.  NaN/Inf pixels
are painted magenta like the reference canary (``raytrace.comp:579-581``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

MAGENTA = np.array([1.0, 0.0, 1.0], np.float32)  # np: no backend init at import


def progressive_blend(accum, frame_color, frame_index):
    """accum' = accum*(1-w) + color*w with w = 1/(frame+1)."""
    w = 1.0 / (frame_index.astype(jnp.float32) + 1.0)
    return accum * (1.0 - w) + frame_color * w


def finalize(color):
    """NaN/Inf canary (magenta) + clamp to [0,1] (rgba8 store semantics)."""
    bad = jnp.any(~jnp.isfinite(color), axis=-1, keepdims=True)
    color = jnp.where(bad, MAGENTA, color)
    return jnp.clip(color, 0.0, 1.0)


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308, x * 12.92, 1.055 * x ** (1.0 / 2.4) - 0.055
    )


def to_uint8_srgb(color) -> np.ndarray:
    """(H,W,3) linear float -> uint8 sRGB, matching the reference's
    SRGB-format presentation path (storage image viewed as
    ``VK_FORMAT_R8G8B8A8_SRGB``, vk_engine.cpp:1380)."""
    srgb = linear_to_srgb(finalize(color))
    return np.asarray(jnp.round(srgb * 255.0).astype(jnp.uint8))


def write_png(path: str, color) -> None:
    from PIL import Image

    Image.fromarray(to_uint8_srgb(color)).save(path)
