#!/usr/bin/env python
"""Per-cast live-ray populations of the binned wavefront.

Prints, for every mesh cast the wavefront driver actually executes
(closest-hit and per-light shadow, in bounce order), the number of
active lanes — the data that sizes the compacted-cast tiers
(tracer/pallas.py cast tiers): a cast whose live population fits a
tier pays that tier's sort/kernel cost, not the full film's.

    JAX_PLATFORMS=cpu python benchmarks/wavefront_populations.py \
        --res 128 --sub 4 --depth 8
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--sub", type=int, default=4)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    import jax

    # the harness pins JAX_PLATFORMS=axon in the environment; debug.print
    # needs host callbacks, which axon_pjrt lacks — force CPU the way
    # tests/conftest.py does (env var alone is overridden)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from computeraytracer_tpu.kernels import binned
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    orig = binned.mesh_closest_hit

    def recorder(static, mesh_arrays, o, d, exclude, t_bound=None,
                 k=binned.DEFAULT_K, interpret=False, active=None):
        n = (jnp.sum(active.astype(jnp.int32)) if active is not None
             else jnp.int32(-1))
        jax.debug.print("cast active={n} of {r}", n=n, r=o[0].shape[0])
        return orig(static, mesh_arrays, o, d, exclude, t_bound=t_bound,
                    k=k, interpret=interpret, active=active)

    binned.mesh_closest_hit = recorder

    w = h = args.res
    scene, _ = scene_from_dict(presets.mesh_scene(w, h,
                                                  subdivisions=args.sub))
    static = pt.SceneStatic.from_scene(scene)
    packs = pt.mesh_packs_for(scene, static)
    print(f"tris={sum(p.count for p in static.mesh_parts)} R={w*h} "
          f"depth={args.depth}", flush=True)
    img = pt.render_sample_planar(scene, w, h, 1, max_depth=args.depth,
                                  static=static, mesh_packs=packs,
                                  backward="none")
    jax.block_until_ready(img)


main()
