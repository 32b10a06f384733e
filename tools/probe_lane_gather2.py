"""Probe 2: lane-gather THROUGHPUT + sublane-axis gather legalization.

Models a per-lane traversal step: one dependent index update per step, K
INDEPENDENT lane-gathers per step (the K floats of a node row all use the
same per-lane index, so they pipeline against each other).  Reports
ns/step as K grows; the marginal ns per extra gather is the throughput
figure the speed-of-light model needs.

Also probes take_along_axis(axis=0) — a sublane-dim dynamic gather — which
would extend per-lane tables from 128 to 1024 entries in 2 ops.

Run: python tools/probe_lane_gather2.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_thru(tabs_ref, idx_ref, out_ref, *, iters, K):
    ix = idx_ref[:]
    tabs = [tabs_ref[k] for k in range(K)]
    acc = jnp.zeros_like(tabs[0])

    def body(i, carry):
        acc, ix = carry
        gs = [jnp.take_along_axis(t, ix, axis=1) for t in tabs]
        s = gs[0]
        for g in gs[1:]:
            s = s + g
        acc = acc + s
        # one dependent index update per STEP (not per gather)
        ix = (ix + s.astype(jnp.int32)) & 127
        return acc, ix

    acc, _ = jax.lax.fori_loop(0, iters, body, (acc, ix))
    out_ref[:] = acc


def k_sublane(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)


def time_thru(K, iters=100000):
    tabs = jax.random.uniform(jax.random.PRNGKey(K), (K, 8, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128, jnp.int32)
    fn = pl.pallas_call(
        functools.partial(k_thru, iters=iters, K=K),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    j = jax.jit(fn)
    r = j(tabs, idx)
    np.asarray(jnp.ravel(r)[0])
    t0 = time.perf_counter()
    r = j(tabs, idx)
    np.asarray(jnp.ravel(r)[0])
    dt = time.perf_counter() - t0
    print(f"K={K:3d} independent gathers/step: {dt*1e9/iters:7.1f} ns/step "
          f"({dt*1e9/iters/K:6.2f} ns/gather amortized)")


def main():
    # sublane-axis gather legalization
    try:
        table = jax.random.uniform(jax.random.PRNGKey(0), (8, 128), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 8, jnp.int32)
        fn = pl.pallas_call(
            k_sublane,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(fn)(table, idx))
        ref = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
        print("sublane (axis=0) gather: LEGALIZED, max err",
              float(np.abs(out - ref).max()))
    except Exception as e:  # noqa: BLE001
        print("sublane (axis=0) gather: FAILED:", str(e).splitlines()[0][:200])

    for K in (1, 2, 4, 8, 16, 32):
        try:
            time_thru(K)
        except Exception as e:  # noqa: BLE001
            print(f"K={K}: FAILED:", str(e).splitlines()[0][:160])


if __name__ == "__main__":
    main()
