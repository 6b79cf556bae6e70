#!/usr/bin/env python
"""Forward Mpaths/s of the mesh wavefront at a given (res, sub, depth).

    python benchmarks/mesh_fwd_bench.py --res 1024 --sub 6 --depth 8 [--k 8]
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
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--sub", type=int, default=6)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--k", type=int, default=0, help="override DEFAULT_K")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--no-wavefront", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/crt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from computeraytracer_tpu.kernels import binned
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    if args.k:
        binned.DEFAULT_K = args.k

    w = h = args.res
    scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=args.sub))
    static = pt.SceneStatic.from_scene(scene)
    packs = pt.mesh_packs_for(scene, static)
    n_tris = sum(p.count for p in static.mesh_parts)
    wf = not args.no_wavefront

    @jax.jit
    def render():
        def body(acc, s):
            return acc + pt.render_sample_planar(
                scene, w, h, s, max_depth=args.depth, static=static,
                mesh_packs=packs, backward="none", wavefront=wf), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((3, h, w), jnp.float32),
            jnp.arange(1, args.spp + 1, dtype=jnp.uint32))
        return acc

    t0 = time.perf_counter()
    out = jax.block_until_ready(render())
    np.asarray(out).ravel()[:1]
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(render())
        np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    paths = w * h * args.spp
    print(f"res={w} tris={n_tris} depth={args.depth} spp={args.spp} "
          f"k={args.k or binned.DEFAULT_K} wavefront={wf} "
          f"compile+first={t_compile:.1f}s run={best*1e3:.1f}ms "
          f"=> {paths/best/1e6:.3f} Mpaths/s", flush=True)


main()
