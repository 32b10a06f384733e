"""Per-lane rope-walk kernel (kernels/lanewalk.py) vs the gather-walk
oracle (interpret mode).

The lanewalk shares the gather walk's accept arithmetic (slab prune,
Moller-Trumbore) and, for lanes whose direction octant matches their
block's majority octant, its exact visit order — so dst/prim/u/v/front
must match the oracle exactly on duplicate-free geometry, and dst must
match even for minority-octant lanes (only exact-t duplicate ties may
report the other duplicate's id)."""

import os
import tempfile

import numpy as np
import pytest
import jax.numpy as jnp

from ray_tracer_tpu.config import RenderConfig, Routing
from ray_tracer_tpu.kernels import lanewalk
from ray_tracer_tpu.ops import traverse
from ray_tracer_tpu.scene.builder import SceneBuilder
from ray_tracer_tpu.scene.types import Material


def _mesh_scene(rand, n_tris=400):
    b = SceneBuilder()
    b.add_material(Material())
    tris = (
        rand.uniform(-2, 2, (n_tris, 1, 3))
        + rand.uniform(-0.4, 0.4, (n_tris, 3, 3))
    ).astype(np.float32)
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(n_tris):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
    b.add_obj(path, material=0)
    os.unlink(path)
    return b.compile().device_put()


def _rays(rand, n):
    o = jnp.asarray(rand.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rand.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def test_streams_built(rand):
    sc = _mesh_scene(rand, n_tris=50)
    assert sc.meta["rope_rows"] > 0
    assert sc.rope_streams.shape[0] == 8
    assert sc.rope_streams.shape[2] == lanewalk.F * lanewalk.PAGE


def test_lanewalk_route_matches_oracle(rand):
    """Full Hit contract through ops.traverse, incl. u/v/front
    reconstruction, against the gather walk."""
    sc = _mesh_scene(rand, n_tris=300)
    n = 2500  # not a block multiple: exercises padding
    o, d = _rays(rand, n)
    act = jnp.ones(n, bool)
    ref = traverse.traverse(sc, o, d, act, routing=Routing(packet="off"))
    got = traverse.traverse(
        sc, o, d, act, routing=Routing(packet="off", lanewalk="interpret")
    )
    m = np.asarray(ref.did_hit)
    np.testing.assert_array_equal(m, np.asarray(got.did_hit))
    # dst to fp tolerance: the kernel's MT runs in a different
    # compilation than the oracle's, so FMA fusion may differ by 1 ULP
    np.testing.assert_allclose(
        np.asarray(got.dst)[m], np.asarray(ref.dst)[m], rtol=1e-5
    )
    # prim may flip on sub-ULP t ties (different visit order for
    # minority-octant lanes + cross-compilation rounding); require the
    # overwhelming majority equal, and u/v/front consistent wherever
    # prim agrees
    pm = np.asarray(got.prim)[m] == np.asarray(ref.prim)[m]
    assert pm.mean() > 0.98, pm.mean()
    np.testing.assert_allclose(
        np.asarray(got.u)[m][pm], np.asarray(ref.u)[m][pm],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(got.front)[m][pm], np.asarray(ref.front)[m][pm]
    )


def test_lanewalk_anyhit_matches_oracle(rand):
    sc = _mesh_scene(rand, n_tris=300)
    n = 2048
    o, d = _rays(rand, n)
    act = jnp.ones(n, bool).at[::5].set(False)
    tm = jnp.asarray(rand.uniform(0.1, 6.0, (n,)).astype(np.float32))
    ref = traverse.traverse_anyhit(
        sc, o, d, act, tm, routing=Routing(packet="off")
    )
    got = traverse.traverse_anyhit(
        sc, o, d, act, tm,
        routing=Routing(packet="off", lanewalk="interpret"),
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_lanewalk_inactive_and_clip(rand):
    """Inactive lanes report no hit; tmax clips closest hits."""
    sc = _mesh_scene(rand, n_tris=100)
    n = 1024
    o, d = _rays(rand, n)
    act = jnp.zeros(n, bool).at[::3].set(True)
    tm = jnp.full((n,), 2.0)
    ref = traverse.traverse(
        sc, o, d, act, tmax=tm, routing=Routing(packet="off")
    )
    got = traverse.traverse(
        sc, o, d, act, tmax=tm,
        routing=Routing(packet="off", lanewalk="interpret"),
    )
    np.testing.assert_array_equal(
        np.asarray(ref.did_hit), np.asarray(got.did_hit)
    )
    assert not np.asarray(got.did_hit)[~np.asarray(act)].any()
    np.testing.assert_allclose(
        np.asarray(ref.dst), np.asarray(got.dst), rtol=1e-5
    )


def test_lanewalk_render_bit_identical():
    """End-to-end cornell render through the lanewalk route (closest +
    anyhit + wavefront binning) matches the gather-walk image exactly."""
    from ray_tracer_tpu import render
    from ray_tracer_tpu.scene import presets

    sc = presets.default_scene().compile().device_put()
    cfg0 = RenderConfig(
        width=32, height=24, samples_per_pixel=2, bounce_limit=3,
        bin_rays=True, routing=Routing(packet="off", lanewalk="off"),
    )
    cfg1 = cfg0.replace(
        routing=Routing(packet="off", lanewalk="interpret")
    )
    a = np.asarray(render(sc, cfg0))
    b = np.asarray(render(sc, cfg1))
    np.testing.assert_array_equal(a, b)
