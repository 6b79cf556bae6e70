#!/usr/bin/env python
"""Scan-amortized device timings of the binned wavefront stages.

Each stage runs N times inside one jit (lax.scan with a forced data
dependency), so the ~50-110 ms host/tunnel dispatch latency is paid
once, not per measurement — these are device times.

    python benchmarks/wavefront_profile2.py [--res 256] [--sub 6] [--k 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--sub", type=int, default=6)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/crt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from computeraytracer_tpu.kernels import binned
    from computeraytracer_tpu.kernels import megakernel as mk
    from computeraytracer_tpu.ops import camera as cam_ops
    from computeraytracer_tpu.ops import rng
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    N = args.reps
    w = h = args.res
    scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=args.sub))
    static = pt.SceneStatic.from_scene(scene)
    packs = pt.mesh_packs_for(scene, static)
    mesh_arrays = tuple(jnp.asarray(a) for p in packs for a in p.arrays)
    R = w * h
    print(f"tris={sum(p.count for p in static.mesh_parts)} "
          f"chunks={packs[0].n_chunks} R={R} k={args.k} reps={N}",
          flush=True)

    px, py, inv = (jnp.asarray(a) for a in pt._block_order(
        w, h, mk.MESH_TILE_M * pt.LANES))
    sample_u = jnp.uint32(1)
    seed = rng.seed_pixel_p(px, py, sample_u)
    o_p, d_p, seed = cam_ops.camera_rays_p(
        scene.camera.eye, scene.camera.lookat, scene.camera.up,
        scene.camera.fov, w, h, px, py, sample_u, seed)
    o = tuple(o_p[i] for i in range(3))
    d = tuple(d_p[i] for i in range(3))
    exclude = jnp.full((R,), -1, jnp.int32)
    prims_u = mk.pack_prims(scene, static)
    getp = lambda i, j: prims_u[i, j]

    def amortized(fn, label, *xs):
        """fn(o0, *xs) -> array; o0 perturbed per rep to force re-exec."""
        @jax.jit
        def loop(o0, *xs):
            def body(carry, _):
                out = fn(o0 + 0.0 * carry, *xs)
                return jnp.sum(out[0].astype(jnp.float32).ravel()[:1]) \
                    if isinstance(out, tuple) else \
                    jnp.sum(out.ravel()[:1]), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c

        r = jax.block_until_ready(loop(o[0], *xs))
        np.asarray(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(loop(o[0], *xs)))
            best = min(best, time.perf_counter() - t0)
        per = (best) / N
        print(f"{label:26s} {per*1e3:8.2f} ms/exec", flush=True)
        return per

    # dispatch floor
    @jax.jit
    def nul(x):
        return x + 1.0
    jax.block_until_ready(nul(o[0]))
    t0 = time.perf_counter()
    np.asarray(jax.block_until_ready(nul(o[0])))
    print(f"{'dispatch floor':26s} {(time.perf_counter()-t0)*1e3:8.2f} ms",
          flush=True)

    # stage 1: unrolled-scene bound
    def f_ub(o0):
        return mk._scan_primitives(static, getp, (o0, o[1], o[2]), d,
                                   exclude, (R,), barrier=True)["t"]
    amortized(f_ub, "unrolled bound")
    ub = jax.jit(f_ub)(o[0])

    # stage 2a: slab matrix only
    def f_slab(o0):
        return binned._slab_t_enter(packs[0].chunk_bbox,
                                    (o0, o[1], o[2]), d, ub)
    amortized(f_slab, "slab (B,R) matrix")

    # stage 2: candidate pass
    def f_cand(o0):
        cand, t_next = binned.candidate_chunks(
            packs[0].chunk_bbox, (o0, o[1], o[2]), d, ub, k=args.k)
        return cand.astype(jnp.float32)
    amortized(f_cand, f"candidate pass k={args.k}")

    # stage 3: mesh_winner (candidates + sorts + pair kernel + reduce)
    def f_win(o0):
        t, i, n, res, t_nx = binned.mesh_winner(
            packs[0].arrays, (o0, o[1], o[2]), d, exclude, ub, k=args.k)
        return t
    amortized(f_win, f"mesh_winner k={args.k}")

    # stage 3b: full mesh_closest_hit (with fallback walk dispatch)
    def f_hit(o0):
        t, i, n = binned.mesh_closest_hit(
            static, mesh_arrays, (o0, o[1], o[2]), d, exclude, t_bound=ub)
        return t
    amortized(f_hit, "mesh_closest_hit")

    # stage 4: shade step
    m = R // pt.LANES
    step_fn = pt._shade_step_cached(static, 8, 1, mk.MESH_TILE_M, False)
    zero = jnp.zeros((1, m, pt.LANES), jnp.float32)
    one = jnp.ones((1, m, pt.LANES), jnp.float32)
    rays_p = jnp.concatenate([o_p, d_p], axis=0).reshape(6, m, pt.LANES)
    carry_f = jnp.concatenate(
        [rays_p, jnp.tile(zero, (4, 1, 1)), jnp.tile(one, (4, 1, 1)),
         one, one], axis=0)
    carry_u = seed.reshape(4, m, pt.LANES)
    carry_i = jnp.concatenate([
        jnp.full((1, m, pt.LANES), -1, jnp.int32),
        jnp.zeros((2, m, pt.LANES), jnp.int32),
        jnp.ones((1, m, pt.LANES), jnp.int32)], axis=0)
    s_n = scene.spectra.shape[0]
    spect_p = jnp.ones((s_n * 4, m, pt.LANES), jnp.float32) * 0.5
    mesh_f = jnp.concatenate([jnp.full((1, m, pt.LANES), jnp.inf),
                              jnp.zeros((3, m, pt.LANES))], axis=0)
    mesh_i = jnp.full((1, m, pt.LANES), -1, jnp.int32)
    depth_arr = jnp.zeros((1, 1), jnp.int32)

    def f_step(o0):
        cf = carry_f.at[0].add(0.0 * o0.reshape(1, m, pt.LANES)[0])
        outs = step_fn(depth_arr, prims_u, cf, carry_u, carry_i,
                       spect_p, mesh_f, mesh_i)
        return outs[0]
    amortized(f_step, "shade step")


main()
