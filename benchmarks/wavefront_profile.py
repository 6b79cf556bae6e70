#!/usr/bin/env python
"""Stage-level timing of the binned wavefront mesh path.

Times each stage of one bounce at mesh scale (the VERDICT r4 ask-1
profile): the unrolled-scene occlusion bound, the candidate pass, the
pair kernel (with sorts), the seeded-walk fallback dispatch, and the
shade step — then the full wavefront forward per depth.

    python benchmarks/wavefront_profile.py [--res 1024] [--sub 6]
"""
from __future__ import annotations

import argparse
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(f, *args, iters=3):
    import jax

    out = jax.block_until_ready(f(*args))
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--sub", type=int, default=6)
    ap.add_argument("--depth", type=int, default=8)
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
    from computeraytracer_tpu.tracer import xla as xt

    w = h = args.res
    scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=args.sub))
    static = pt.SceneStatic.from_scene(scene)
    packs = pt.mesh_packs_for(scene, static)
    mesh_arrays = tuple(jnp.asarray(a) for p in packs for a in p.arrays)
    n_tris = int(np.asarray(scene.primitives.category).shape[0])
    R = w * h
    print(f"tris={n_tris} chunks={packs[0].n_chunks} R={R}", flush=True)

    # camera rays, planar
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

    # stage 1: unrolled-scene occlusion bound
    f_ub = jax.jit(lambda o, d: mk._scan_primitives(
        static, getp, o, d, exclude, (R,))["t"])
    dt = timed(f_ub, o, d)
    print(f"unrolled bound:    {dt*1e3:8.2f} ms", flush=True)
    ub = f_ub(o, d)

    # stage 2: candidate pass
    f_cand = jax.jit(lambda o, d, ub: binned.candidate_chunks(
        packs[0].chunk_bbox, o, d, ub))
    dt = timed(f_cand, o, d, ub)
    print(f"candidate pass:    {dt*1e3:8.2f} ms", flush=True)
    cand, t_next = f_cand(o, d, ub)
    n_cand = jnp.sum(cand >= 0, axis=1)
    print(f"  cand/ray mean={float(jnp.mean(n_cand)):.2f} "
          f"p99={int(jnp.percentile(n_cand, 99))} "
          f"max={int(jnp.max(n_cand))} "
          f"unresolved_frac={float(jnp.mean(~jnp.isfinite(t_next) * 0 + (jnp.isfinite(t_next)).astype(jnp.float32))):.4f}",
          flush=True)

    # stage 3: full mesh_closest_hit (candidates + sort + pair kernel +
    # reduce + fallback)
    f_hit = jax.jit(lambda o, d, ub: binned.mesh_closest_hit(
        static, mesh_arrays, o, d, exclude, t_bound=ub))
    dt = timed(f_hit, o, d, ub)
    print(f"mesh_closest_hit:  {dt*1e3:8.2f} ms", flush=True)

    # stage 3b: mesh_winner only (no fallback dispatch)
    f_win = jax.jit(lambda o, d, ub: binned.mesh_winner(
        packs[0].arrays, o, d, exclude, t_bound=ub))
    dt = timed(f_win, o, d, ub)
    print(f"  mesh_winner:     {dt*1e3:8.2f} ms", flush=True)
    _, _, _, resolved, _ = f_win(o, d, ub)
    print(f"  resolved_frac:   {float(jnp.mean(resolved.astype(jnp.float32))):.5f}",
          flush=True)

    # stage 4: shade step alone
    m = R // pt.LANES
    step_fn = pt._shade_step_cached(static, args.depth, 1,
                                    mk.MESH_TILE_M, False)
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
    f_step = jax.jit(lambda cf, cu, ci: step_fn(
        depth_arr, prims_u, cf, cu, ci, spect_p, mesh_f, mesh_i))
    dt = timed(f_step, carry_f, carry_u, carry_i)
    print(f"shade step:        {dt*1e3:8.2f} ms", flush=True)

    # full wavefront forward at depth
    f_full = jax.jit(lambda: pt.render_sample_planar(
        scene, w, h, 1, max_depth=args.depth, static=static,
        mesh_packs=packs, backward="none", wavefront=True))
    dt = timed(f_full, iters=2)
    print(f"wavefront fwd d={args.depth}: {dt*1e3:8.2f} ms  "
          f"= {R/dt/1e6:.3f} Mpaths/s", flush=True)


main()
