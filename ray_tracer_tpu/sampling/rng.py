"""Counter-based RNG for the path tracer.

The reference threads a mutable 32-bit xorshift/LCG state through every
shader call (``shaders/raytrace.comp:157-175``), seeded per pixel per frame
(``:562-564``).  Sequential state is hostile to SPMD: instead every draw here
is a *pure function* of ``(seed, pixel, frame, sample, bounce, draw)`` — the
pcg4d hash of Jarzynski & Olano, "Hash Functions for GPU Rendering" (JCGT
2020).  This makes results independent of batch slicing, tiling, and device
sharding (quirk Q9: parity with the reference is distribution-level, not
bitwise).

All ops are uint32 mul/xor/shift — pure VPU work, no threefry tables.
"""

from __future__ import annotations

import jax.numpy as jnp

import numpy as np

_INV_U32 = np.float32(1.0 / 4294967296.0)  # np: no backend init at import


def _pcg4d(a, b, c, d):
    """pcg4d: 4 x uint32 -> 4 x uint32 (well-distributed)."""
    v = [
        a.astype(jnp.uint32),
        b.astype(jnp.uint32),
        c.astype(jnp.uint32),
        d.astype(jnp.uint32),
    ]
    for i in range(4):
        v[i] = v[i] * jnp.uint32(1664525) + jnp.uint32(1013904223)
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    for i in range(4):
        v[i] = v[i] ^ (v[i] >> 16)
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    return v


def uniforms(seed, pixel_id, frame, sample, bounce, n_draws: int):
    """(N,) pixel ids -> (N, n_draws) uniforms in [0, 1).

    ``seed/frame/sample/bounce`` are scalars (python or traced).
    """
    pixel_id = jnp.asarray(pixel_id, jnp.uint32)
    base_a = pixel_id
    base_b = jnp.uint32(seed) ^ (jnp.asarray(frame, jnp.uint32) * jnp.uint32(0x9E3779B9))
    base_c = (
        jnp.asarray(sample, jnp.uint32) * jnp.uint32(0x85EBCA6B)
        + jnp.asarray(bounce, jnp.uint32)
    )
    out = []
    for blk in range((n_draws + 3) // 4):
        v = _pcg4d(
            base_a,
            jnp.broadcast_to(base_b, base_a.shape),
            jnp.broadcast_to(base_c, base_a.shape),
            jnp.full(base_a.shape, blk, jnp.uint32),
        )
        out.extend(v)
    bits = jnp.stack(out[:n_draws], axis=-1)
    return bits.astype(jnp.float32) * _INV_U32
