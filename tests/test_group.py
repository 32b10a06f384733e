"""Multi-stack lane-group kernel vs the wide packet kernel (interpret).

The group walk must be bit-identical to the packet walk: every lane's
visit set is a superset of its want-set in both, the accept arithmetic is
shared, and the leaf min-tree breaks ties by earliest record id (see
kernels/group.py docstring)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from ray_tracer_tpu.kernels import packet, group
from ray_tracer_tpu.scene.builder import SceneBuilder
from ray_tracer_tpu.scene.types import Material


def _mesh_scene(rand, n_tris=400):
    import tempfile

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


@pytest.mark.parametrize("groups,psize", [(16, 2048), (8, 2048), (4, 512)])
def test_group_matches_packet(rand, groups, psize):
    sc = _mesh_scene(rand)
    recs = sc.meta.get("wide_leaf_recs", 8)
    n = 900  # not a packet multiple: exercises padding
    o, d = _rays(rand, n)
    tm = jnp.full((n,), 99999999.0)
    ref = packet.packet_traverse_wide(
        sc.wide_packed, sc.leaf_rows, o, d, tm, 0, interpret=True,
        packet_size=psize, max_recs=recs, need_uv=False,
    )
    got = group.group_traverse(
        sc.wide_packed, sc.leaf_rows, o, d, tm, 0, interpret=True,
        packet_size=psize, groups=groups, max_recs=recs,
    )
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_group_anyhit_matches_packet(rand):
    sc = _mesh_scene(rand)
    recs = sc.meta.get("wide_leaf_recs", 8)
    n = 1024
    o, d = _rays(rand, n)
    # finite clip: a mix of occluded / reachable / inactive lanes
    tm = jnp.asarray(
        rand.uniform(0.1, 6.0, (n,)).astype(np.float32)
    ).at[::7].set(-99999999.0)
    ref = packet.packet_traverse_wide(
        sc.wide_packed, sc.leaf_rows, o, d, tm, 0, interpret=True,
        packet_size=2048, max_recs=recs, anyhit=True, need_uv=False,
    )
    got = group.group_traverse(
        sc.wide_packed, sc.leaf_rows, o, d, tm, 0, interpret=True,
        packet_size=2048, groups=16, max_recs=recs, anyhit=True,
    )
    # anyhit contract: dst == -BIG iff occluded; prim is meaningless
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))


def test_group_route_matches_oracle(rand):
    """Routing(groups>0) through ops.traverse vs the gather-walk oracle:
    full Hit contract incl. u/v/front reconstruction and leaf_map
    prim-space mapping."""
    import jax.numpy as jnp
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.config import Routing

    sc = _mesh_scene(rand, n_tris=150)
    n = 700
    o, d = _rays(rand, n)
    act = jnp.ones(n, bool)
    ref = traverse.traverse(sc, o, d, act, routing=Routing(packet="off"))
    got = traverse.traverse(
        sc, o, d, act,
        routing=Routing(packet="interpret", groups=8, groups_packet=1024),
    )
    m = np.asarray(ref.did_hit)
    np.testing.assert_array_equal(m, np.asarray(got.did_hit))
    np.testing.assert_allclose(
        np.asarray(got.dst)[m], np.asarray(ref.dst)[m], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(got.prim)[m], np.asarray(ref.prim)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(got.front)[m], np.asarray(ref.front)[m]
    )


def test_group_route_composes_with_sharded():
    """render_frame_sharded with the group route == single-device image
    (mirrors test_parallel's packet/cluster composition coverage)."""
    import jax
    import pytest
    from ray_tracer_tpu.config import RenderConfig, Routing
    from ray_tracer_tpu import render
    from ray_tracer_tpu.parallel import mesh as pmesh
    from ray_tracer_tpu.scene import presets

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sc = presets.default_scene().compile()
    rt = Routing(packet="interpret", groups=4, groups_packet=512)
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=2,
                       bounce_limit=3, routing=rt)
    m = pmesh.make_mesh(n_data=8, n_sample=1)
    sharded = np.asarray(pmesh.render_frame_sharded(sc, cfg, m))
    single = np.asarray(render(sc.device_put(), cfg))
    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_group_finite_clip_matches_packet(rand):
    sc = _mesh_scene(rand)
    recs = sc.meta.get("wide_leaf_recs", 8)
    n = 2048
    o, d = _rays(rand, n)
    tm = jnp.asarray(rand.uniform(0.5, 8.0, (n,)).astype(np.float32))
    ref = packet.packet_traverse_wide(
        sc.wide_packed, sc.leaf_rows, o, d, tm, 0, interpret=True,
        packet_size=2048, max_recs=recs, need_uv=False,
    )
    got = group.group_traverse(
        sc.wide_packed, sc.leaf_rows, o, d, tm, 0, interpret=True,
        packet_size=2048, groups=16, max_recs=recs,
    )
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_anyhit_group_routing_matches_oracle(rand):
    """Routing(anyhit_group=True) through traverse_anyhit vs the
    gather-walk oracle occlusion (round-5 VERDICT item 2)."""
    from ray_tracer_tpu.config import Routing
    from ray_tracer_tpu.ops import traverse

    sc = _mesh_scene(rand, n_tris=200)
    n = 700
    o, d = _rays(rand, n)
    act = jnp.asarray(rand.random(n) > 0.1)
    tm = jnp.asarray(rand.uniform(0.1, 6.0, (n,)).astype(np.float32))
    ref = traverse.traverse_anyhit(
        sc, o, d, act, tm, routing=Routing(packet="off")
    )
    got = traverse.traverse_anyhit(
        sc, o, d, act, tm,
        routing=Routing(packet="interpret", groups=8, groups_packet=1024,
                        anyhit_group=True),
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
