#!/usr/bin/env python
"""Price the VECTORIZED group-stack tail in isolation (round 5).

The fresh step decomposition (measure_group_step.py, r5) pins 64% of
the group kernel's step on blocking scalar SMEM ops (~5 per group-step:
top load, LUT load, meta load, writeback, push).  This probe times a
traversal-shaped loop whose stack bookkeeping is entirely VECTOR:

  stack   (16,128) i32 VMEM scratch: sublane g = group g's stack,
          lane s = depth s (budget 128 > builder max depth 64)
  pop     take_along_axis along lanes, idx = sp_g broadcast per sublane
  decode  branchless lowest-set-bit + near-first reversal, all (16,128)
  child   per-sublane lane gather from baked node-row columns
  push    one-hot lane select RMW on the stack plane
  extract 16 vector->SREG sums feeding the uni-row dynamic slices
          (the ONE mandatory scalar boundary)

Variants time cumulative subsets so deltas attribute cost:
  pop+decode | +push RMW | +extract+rowgather | full-tail
Compare ns/step against the production scalar tail (~1137 ns at G=16).

Usage: python tools/probe_vstack.py [steps] [reps]
Env: RT_MEASURE_INTERPRET=1 for CPU interpreter mode (correctness only).
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = os.environ.get("RT_MEASURE_INTERPRET", "0") == "1"
    if interp:
        jax.config.update("jax_platforms", "cpu")

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else (8 if interp else 4096)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    G = 16
    W = 4096  # synthetic node-row table (uni stand-in)

    rng = np.random.default_rng(11)
    uni = jnp.asarray(rng.uniform(size=(W, 128)).astype(np.float32))
    meta = jnp.asarray(
        rng.integers(0, W, size=(W * 12,)).astype(np.int32)
    )

    def kern(uni_ref, meta_ref, out_ref, stack_ref, variant="full"):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
        out_ref[...] = jnp.zeros_like(out_ref[...])
        stack_ref[...] = (lanes * 1540483477) % (W << 9)

        do_push = variant in ("push", "extract", "full")
        do_extract = variant in ("extract", "full")

        def body(i, carry):
            sp, acc = carry  # sp: (G,128) i32, replicated per sublane
            # ---- pop: per-sublane lane gather of the top word
            words = jnp.take_along_axis(stack_ref[...], sp & 127, axis=1)
            # ---- decode: branchless bit search + reversal (all vector)
            mask = words & 0xFF
            flag = (words >> 8) & 1
            low = mask & (-mask)
            c = jnp.where((low & 0xF0) != 0, jnp.int32(4), 0)
            c = c + jnp.where(((low >> c) & 0xC) != 0, jnp.int32(2), 0)
            c = c + jnp.where(((low >> c) & 0x2) != 0, jnp.int32(1), 0)
            slot = jnp.where(mask == 0, jnp.int32(9),
                             jnp.where(flag == 1, 7 - c, c))
            rem = mask & (mask - 1)
            prem = words + rem - mask
            child = (((words >> 9) + slot * 7919 + i) % W) & 0x7FFFFFF
            acc = acc + slot + rem

            if do_push:
                # one-hot RMW: write prem at lane sp+1 per sublane
                tgt = (sp + 1) & 127
                st = stack_ref[...]
                stack_ref[...] = jnp.where(lanes == tgt, prem, st)
                sp = (sp + ((child & 1) ^ 1) * 2 - 1) & 127

            if do_extract:
                # 16 vector->SREG extracts feeding real dynamic slices.
                # In the hybrid tail the extracted word packs (parent<<4 |
                # slot) and ONE scalar SMEM meta load resolves the child
                # row id (replacing production's 5 SMEM ops per group).
                ext = [
                    jnp.sum(child[g : g + 1, 0:1]) for g in range(G)
                ]
                if variant == "full":
                    ids = [meta_ref[ext[g] % (W * 12)] for g in range(G)]
                else:
                    ids = ext
                rows = []
                for g in range(G):
                    rows.append(uni_ref[pl.ds(ids[g] % W, 1), :])
                plane = jnp.concatenate(rows, axis=0)
                acc = acc + plane[:, 0:1].astype(jnp.int32)
            return sp, acc

        sp0 = jnp.zeros((G, 128), jnp.int32)
        acc0 = jnp.zeros((G, 128), jnp.int32)
        sp, acc = jax.lax.fori_loop(0, steps, body, (sp0, acc0))
        out_ref[...] = (acc + sp).astype(jnp.float32)

    results = {}
    for variant in ("decode", "push", "extract", "full"):
        f = pl.pallas_call(
            functools.partial(kern, variant=variant),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((W, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(meta.shape, lambda i: (0,),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((G, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((G, 128), jnp.int32)],
            interpret=interp,
        )
        g = jax.jit(lambda: f(uni, meta))
        r = jax.block_until_ready(g())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = jax.block_until_ready(g())
            best = min(best, time.perf_counter() - t0)
        ns = best / steps * 1e9
        results[variant] = ns
        print(f"{variant:8s}: {ns:8.1f} ns/step  (checksum {float(np.asarray(r).sum()):.3e})",
              flush=True)
    print(f"\nscalar-tail reference (measure_group_step pops): ~1137 ns/step")


if __name__ == "__main__":
    main()
