#!/usr/bin/env python
"""Microbenchmark the scalar-sync primitives of the BVH traversal.

The mesh megakernel's traversal loop alternates vector work (slab
tests, triangle scans) with scalar round trips (dynamic-slice node
reads, any() reductions, lax.cond branches). This isolates each piece
so kernel restructuring targets the real cost:

    python benchmarks/sync_micro.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ITER = 1024
SHAPE = (8, 128)


def run(kernel_body, name, boxes=None):
    import numpy as np

    if boxes is None:
        boxes = jnp.asarray(np.random.rand(N_ITER, 8).astype(np.float32))

    def kernel(boxes_ref, x_ref, o_ref):
        o_ref[:] = kernel_body(boxes_ref, x_ref[:])

    x = jnp.ones(SHAPE, jnp.float32)
    f = jax.jit(lambda b, x: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )(b, x))
    jax.block_until_ready(f(boxes, x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(boxes, x))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e6:9.1f} us total, "
          f"{best/N_ITER*1e9:7.0f} ns/iter")


def vec_work(bb, x):
    # ~20 vector ops, roughly one slab test
    for c in range(3):
        t0 = (bb[0, c] - x) * 1.7
        t1 = (bb[0, 3 + c] - x) * 1.7
        x = jnp.maximum(x, jnp.minimum(t0, t1)) * 0.999
    return x


def main():
    def base(boxes_ref, x):
        def body(i, x):
            return vec_work(boxes_ref[pl.ds(i, 1), :], x)
        return jax.lax.fori_loop(0, N_ITER, body, x)

    run(base, "read + vec (no sync)")

    def with_any_cond(boxes_ref, x):
        def body(i, x):
            bb = boxes_ref[pl.ds(i, 1), :]
            y = vec_work(bb, x)
            hit = jnp.any(y > x)
            return jax.lax.cond(hit, lambda v: v * 1.0001, lambda v: v, y)
        return jax.lax.fori_loop(0, N_ITER, body, x)

    run(with_any_cond, "read + vec + any + cond")

    def with_any_where(boxes_ref, x):
        def body(i, x):
            bb = boxes_ref[pl.ds(i, 1), :]
            y = vec_work(bb, x)
            hit = jnp.any(y > x)
            return jnp.where(hit, y * 1.0001, y)
        return jax.lax.fori_loop(0, N_ITER, body, x)

    run(with_any_where, "read + vec + any + where (no branch)")

    def with_cond_heavy(boxes_ref, x):
        # cond around substantial vector work (the leaf-scan shape)
        def body(i, x):
            bb = boxes_ref[pl.ds(i, 1), :]
            y = vec_work(bb, x)
            hit = jnp.any(y > x)

            def heavy(v):
                for _ in range(8):
                    v = vec_work(bb, v)
                return v

            return jax.lax.cond(hit, heavy, lambda v: v, y)
        return jax.lax.fori_loop(0, N_ITER, body, x)

    run(with_cond_heavy, "read + vec + any + cond(8x vec)")

    def whileloop(boxes_ref, x):
        def cond_fn(c):
            return c[0] < N_ITER

        def body(c):
            i, x = c
            bb = boxes_ref[pl.ds(i, 1), :]
            y = vec_work(bb, x)
            hit = jnp.any(y > x)
            nxt = jnp.where(hit, i + 1, i + 1)
            return (nxt, y)

        return jax.lax.while_loop(cond_fn, body, (jnp.int32(0), x))[1]

    run(whileloop, "while_loop: read + vec + any")


if __name__ == "__main__":
    main()
