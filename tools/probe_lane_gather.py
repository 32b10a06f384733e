"""Probe: does Mosaic support per-lane dynamic gather on this toolchain?

The paradigm question for round 5: per-LANE independent BVH traversal needs
each lane to fetch its own node's floats.  On TPU the only vectorized form
of that is an in-register dynamic gather along the lane dimension
(Mosaic DynamicGatherOp, exposed at jnp level as take_along_axis /
vectorized indexing inside a Pallas kernel).  If it legalizes and is cheap
(~1 vector op per gathered float-column), per-lane traversal within
<=128-node treelets becomes viable and the speed-of-light model changes
paradigm.  If it doesn't legalize, the group/packet family is the only
in-register paradigm and its measured ceiling stands.

Run: RT_PROBE=taa|onehot|iter python tools/probe_lane_gather.py
"""
import os
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_take_along(table_ref, idx_ref, out_ref):
    # table: (8,128) f32, one float per node lane; idx: (8,128) i32 node ids
    t = table_ref[:]
    ix = idx_ref[:]
    out_ref[:] = jnp.take_along_axis(t, ix, axis=1)


def k_take_along_chain(table_ref, idx_ref, out_ref, *, iters):
    # dependent-chain version: cost per gather without DCE
    t = table_ref[:]
    ix = idx_ref[:]
    acc = jnp.zeros_like(t)

    def body(i, carry):
        acc, ix = carry
        g = jnp.take_along_axis(t, ix, axis=1)
        acc = acc + g
        # make next index depend on the gather (defeats hoisting)
        ix = (ix + g.astype(jnp.int32)) % 128
        return acc, ix

    acc, _ = jax.lax.fori_loop(0, iters, body, (acc, ix))
    out_ref[:] = acc


def main():
    mode = os.environ.get("RT_PROBE", "taa")
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (8, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128, jnp.int32)

    if mode == "taa":
        fn = pl.pallas_call(
            k_take_along,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(fn)(table, idx))
        ref = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=1)
        print("take_along_axis lane-gather: LEGALIZED, max err",
              float(np.abs(out - ref).max()))
    elif mode == "chain":
        iters = int(os.environ.get("RT_ITERS", "1000"))
        fn = pl.pallas_call(
            functools.partial(k_take_along_chain, iters=iters),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        j = jax.jit(fn)
        r = j(table, idx)
        np.asarray(jnp.ravel(r)[0])  # warm + honest sync
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            r = j(table, idx)
        np.asarray(jnp.ravel(r)[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"chain of {iters} dependent lane-gathers: {dt*1e9/iters:.1f} ns/gather "
              f"(total {dt*1e3:.3f} ms)")
    else:
        raise SystemExit(f"unknown RT_PROBE={mode}")


if __name__ == "__main__":
    main()
