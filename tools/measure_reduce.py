#!/usr/bin/env python
"""Measure cross-lane mask-reduction schemes for the packet kernel.

The round-3 ablation (tools/measure_visit_cost.py, BENCH_NOTES) showed
the vector->scalar transfer — the cross-lane reductions that turn 8
per-lane hit vectors into one scalar 8-bit descend mask — dominates
interior-visit cost (~150ns per jnp.sum lane reduction; mask_mode=sum2
issues two).  This probe times candidate schemes for producing the SAME
scalar mask from a packed (8,128) i32 bit array, each inside a
fori_loop with loop-dependent input so XLA cannot hoist:

  sum2    : the production scheme — sublane-halve, spread 4+4 bits into
            two words of 4x8-bit count fields, two jnp.sums.
  sum1    : ONE jnp.sum of an 8x4-bit spread word — INVALID for >15
            lanes per field (carry), timed only as the 1-sum floor.
  or1     : sublane-halve then a single lax.reduce bitwise-OR over
            lanes — exact, one reduction, IF Mosaic legalizes it.
  max1    : sublane-halve, spread to 8 nibbles (0/1 values), single
            jnp.max lane reduction — INVALID (fields interact across
            the word under max), timed only as a 1-reduction floor.
  mxu     : stack per-child folded hit rows as 8 sublanes (f32 0/1),
            one (8,128)@(128,1) MXU matvec -> per-child counts, then 8
            scalar VMEM reads to assemble the mask.

Usage: python tools/measure_reduce.py [iters]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

    def make_kernel(scheme, repeats):
        def kernel(x_ref, ones_ref, out_ref):
            base = x_ref[...]  # (8,128) i32 bit-noise

            def body(i, acc):
                # loop-dependent "hit bits": cheap vector work standing in
                # for the packed child_hit output (8 bits per lane)
                packed = (base + i) & 0xFF
                if scheme == "mxu":
                    rows = []
                    for c in range(8):
                        rows.append((packed >> c) & 1)
                    m = jnp.concatenate(
                        [r[:1].astype(jnp.float32) for r in rows], axis=0
                    )  # (8,128) one folded row per child
                    counts = jax.lax.dot_general(
                        m,
                        ones_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (8,1)
                    mask = jnp.int32(0)
                    for c in range(8):
                        mask = mask | (
                            jnp.where(counts[c, 0] > 0, jnp.int32(1), 0) << c
                        )
                    return acc + mask
                # sublane halving fold (cheap), shared by the others
                p = packed
                rows_n = p.shape[0]
                while rows_n > 1:
                    p = p[: rows_n // 2] | p[rows_n // 2 : rows_n]
                    rows_n //= 2
                if scheme == "sum2":
                    spread = lambda m: (
                        (m & 1) | ((m & 2) << 7) | ((m & 4) << 14)
                        | ((m & 8) << 21)
                    )
                    s0 = jnp.sum(spread(p & 0xF))
                    s1 = jnp.sum(spread((p >> 4) & 0xF))
                    mask = jnp.int32(0)
                    for k in range(4):
                        mask = mask | (
                            jnp.where(((s0 >> (8 * k)) & 0xFF) > 0,
                                      jnp.int32(1), 0) << k)
                        mask = mask | (
                            jnp.where(((s1 >> (8 * k)) & 0xFF) > 0,
                                      jnp.int32(1), 0) << (4 + k))
                    return acc + mask
                if scheme == "sum1":
                    spread = jnp.int32(0)
                    for c in range(8):
                        spread = spread | (((p >> c) & 1) << (4 * c))
                    s = jnp.sum(spread)  # INVALID: fields carry past 15
                    mask = jnp.int32(0)
                    for c in range(8):
                        mask = mask | (
                            jnp.where(((s >> (4 * c)) & 0xF) > 0,
                                      jnp.int32(1), 0) << c)
                    return acc + mask
                if scheme == "or1":
                    m = jax.lax.reduce(
                        p, np.int32(0), jax.lax.bitwise_or, (0, 1)
                    )
                    return acc + m
                if scheme == "max1":
                    spread = jnp.int32(0)
                    for c in range(8):
                        spread = spread | (((p >> c) & 1) << (4 * c))
                    s = jnp.max(spread)  # INVALID: cross-field compare
                    mask = jnp.int32(0)
                    for c in range(8):
                        mask = mask | (
                            jnp.where(((s >> (4 * c)) & 0xF) > 0,
                                      jnp.int32(1), 0) << c)
                    return acc + mask
                raise ValueError(scheme)

            total = jax.lax.fori_loop(0, repeats, body, jnp.int32(0))
            out_ref[...] = jnp.full_like(out_ref[...], total)

        return kernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**30, (8, 128)), jnp.int32)
    ones = jnp.ones((128, 1), jnp.float32)

    for scheme in ("sum2", "sum1", "or1", "max1", "mxu"):
        try:
            fn = pl.pallas_call(
                make_kernel(scheme, R),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            fn = jax.jit(fn)
            r = np.asarray(fn(x, ones))  # compile + run
            t0 = time.perf_counter()
            r = np.asarray(fn(x, ones))
            dt = time.perf_counter() - t0
            print(f"{scheme:5s}: {dt / R * 1e9:8.1f} ns/iter "
                  f"(total {dt*1e3:.1f} ms, check {r[0,0]})", flush=True)
        except Exception as e:  # legalization failures are findings too
            msg = str(e).split("\n")[0][:140]
            print(f"{scheme:5s}: FAILED — {msg}", flush=True)


if __name__ == "__main__":
    main()
