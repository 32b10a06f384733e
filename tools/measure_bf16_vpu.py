#!/usr/bin/env python
"""Measure VPU elementwise throughput: f32 vs bf16 slab-test-shaped work.

Decides whether a bfloat16 box-test path in the packet kernel can halve
the interior-visit issue count (the kernel is vector-issue-bound:
multi_pop overlap measured neutral, BENCH_NOTES r3).  The probe kernel
runs the exact op mix of ``child_hit`` — 6 scalar*vec FMAs, 6 min/max,
2 nested min/max reductions, 3 compares — over a (8,2048)-lane block,
repeated R times inside a fori_loop, in both dtypes.

Usage: python tools/measure_bf16_vpu.py [repeats]
"""
import sys
import time
import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    def probe_kernel(o_ref, out_ref, *, dtype, repeats):
        oxi = o_ref[...]
        inv = oxi * 1.0001 + 0.01
        one = jnp.asarray(1.0, dtype)

        def body(i, acc):
            # 6 bounds emulated from the loop counter (scalar broadcasts,
            # like the node-row scalars in child_hit)
            b = (i.astype(dtype) * jnp.asarray(0.001, dtype))
            t1x = (b + 0.1) * inv - oxi
            t2x = (b + 0.4) * inv - oxi
            t1y = (b + 0.2) * inv - oxi
            t2y = (b + 0.5) * inv - oxi
            t1z = (b + 0.3) * inv - oxi
            t2z = (b + 0.6) * inv - oxi
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            hit = (tmax >= tmin) & (tmax > 0) & (tmin < one)
            return acc + jnp.where(hit, one, jnp.asarray(0, dtype))

        out_ref[...] = jax.lax.fori_loop(0, repeats, body, oxi * 0)

    def run(dtype, lanes=2048):
        shape = (8, lanes)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0.1, 1.0, shape), dtype
        )
        fn = pl.pallas_call(
            functools.partial(probe_kernel, dtype=dtype, repeats=R),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )
        fn = jax.jit(fn)
        fn(x).block_until_ready()
        t0 = time.perf_counter()
        it = 20
        for _ in range(it):
            r = fn(x)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / it
        # one child_hit-alike: ~23 vector ops over 8*lanes elements
        ops = 23 * shape[0] * shape[1] * R
        print(
            f"{jnp.dtype(dtype).name:10s} lanes={lanes}  {dt*1e3:7.3f} ms "
            f"per {R} reps  -> {ops/dt/1e9:7.1f} Gop/s"
        )
        return dt

    print("backend", jax.devices()[0].platform)
    tf32 = run(jnp.float32)
    tbf = run(jnp.bfloat16)
    print(f"bf16 speedup over f32: {tf32/tbf:.2f}x")


if __name__ == "__main__":
    main()
