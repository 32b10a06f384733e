"""Native C++ BVH builder vs the numpy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from ray_tracer_tpu.accel import bvh, native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


def random_tris(rng, n, spread=10.0):
    base = rng.uniform(-spread, spread, (n, 1, 3)).astype(np.float32)
    offs = rng.uniform(-0.5, 0.5, (n, 3, 3)).astype(np.float32)
    return base + offs


def test_native_invariants(rand):
    tris = random_tris(rand, 500)
    forest, perm = native.build_forest_native(tris.copy(), [(0, 250), (250, 250)], 4)
    assert sorted(perm.tolist()) == list(range(500))
    assert int(forest.tri_count.max()) <= 4
    leaf = forest.tri_count > 0
    covered = []
    for i in np.nonzero(leaf)[0]:
        covered.extend(
            range(forest.index[i], forest.index[i] + forest.tri_count[i])
        )
    assert sorted(covered) == list(range(500))
    # bounds contain the (natively reordered) triangles
    ordered = tris[perm]
    tmin = ordered.min(axis=1)
    tmax = ordered.max(axis=1)
    for i in np.nonzero(leaf)[0]:
        lo, hi = forest.index[i], forest.index[i] + forest.tri_count[i]
        assert np.all(forest.node_min[i] <= tmin[lo:hi].min(axis=0) + 1e-5)
        assert np.all(forest.node_max[i] >= tmax[lo:hi].max(axis=0) - 1e-5)


def test_native_threading_terminates(rand):
    tris = random_tris(rand, 300)
    forest, _ = native.build_forest_native(tris, [(0, 300)], 2)
    n = forest.n_nodes
    for o in range(8):
        seen = set()
        node = forest.roots[0]
        steps = 0
        while node != bvh.SENTINEL and steps < 10 * n:
            seen.add(int(node))
            if forest.tri_count[node] > 0:
                node = forest.miss_link[o, node]
            else:
                node = forest.hit_link[o, node]
            steps += 1
        assert steps < 10 * n
        assert len(seen) == n


def test_native_traversal_matches_numpy_tree(rand):
    """Same closest hits through a native-built tree and a numpy-built tree."""
    from ray_tracer_tpu.ops import traverse
    from ray_tracer_tpu.scene.builder import SceneBuilder
    from ray_tracer_tpu.scene.types import Material
    import os
    import tempfile

    tris = random_tris(rand, 150, spread=2.0)
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(150):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")

    def make(native_on):
        os.environ["RT_NATIVE_BVH"] = "1" if native_on else "0"
        try:
            b = SceneBuilder()
            b.add_material(Material())
            b.add_obj(path, material=0)
            return b.compile().device_put()
        finally:
            os.environ.pop("RT_NATIVE_BVH", None)

    s_np = make(False)
    s_nat = make(True)
    os.unlink(path)

    n_rays = 200
    o = jnp.asarray(rand.uniform(-4, 4, (n_rays, 3)).astype(np.float32))
    d = rand.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    act = jnp.ones(n_rays, bool)
    h1 = traverse.traverse(s_np, o, jnp.asarray(d), act)
    h2 = traverse.traverse(s_nat, o, jnp.asarray(d), act)
    np.testing.assert_array_equal(np.asarray(h1.did_hit), np.asarray(h2.did_hit))
    m = np.asarray(h1.did_hit)
    np.testing.assert_allclose(
        np.asarray(h1.dst)[m], np.asarray(h2.dst)[m], rtol=1e-5, atol=1e-6
    )


def test_native_speed_on_big_mesh(rand):
    import time

    tris = random_tris(rand, 200_000)
    t0 = time.perf_counter()
    forest, _ = native.build_forest_native(tris, [(0, 200_000)], 4)
    dt = time.perf_counter() - t0
    assert forest.n_nodes > 100_000
    assert dt < 10.0, f"native build too slow: {dt:.1f}s"
