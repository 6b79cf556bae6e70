#!/usr/bin/env python
"""Diagnose where the chunked mesh scan spends time.

Default mode sweeps (tile_m, depth) over the in-kernel bounce loop.
--wavefront compares the in-kernel loop against the per-bounce
wavefront dispatch (tracer/pallas._wavefront_forward) at matched
configs — the measurement that decides MESH_WAVEFRONT_DEFAULT.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(f, *args):
    import jax

    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    x = f(*args)
    jax.block_until_ready(x)
    np.asarray(x)
    return time.perf_counter() - t0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/crt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    import jax.numpy as jnp

    wavefront_mode = "--wavefront" in sys.argv

    w = h = 256
    spp = 4  # amortize the ~110ms host/tunnel dispatch latency the way
    #          real renders do (lax.scan over samples, one dispatch)
    for sub in (6, 7):
        scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=sub))
        static = pt.SceneStatic.from_scene(scene)
        packs = pt.mesh_packs_for(scene, static)
        n = int(np.asarray(scene.primitives.category).shape[0])

        if wavefront_mode:
            for tile_m in (8, 16):
                for depth in (2, 4):
                    def render(s, wf, _d=depth, _tm=tile_m):
                        def body(acc, k):
                            return acc + pt.render_sample(
                                s, w, h, k, max_depth=_d, static=static,
                                mesh_packs=packs, tile_m=_tm,
                                wavefront=wf), None
                        acc, _ = jax.lax.scan(
                            body, jnp.zeros((h, w, 3), jnp.float32),
                            jnp.arange(1, spp + 1, dtype=jnp.uint32))
                        return acc.sum()

                    dt_mk = _timed(jax.jit(lambda s: render(s, False)), scene)
                    dt_wf = _timed(jax.jit(lambda s: render(s, True)), scene)
                    mp_mk = w * h * spp / dt_mk / 1e6
                    mp_wf = w * h * spp / dt_wf / 1e6
                    print(f"tris={n:7d} tile_m={tile_m:2d} depth={depth}  "
                          f"megakernel {mp_mk:7.3f} Mpaths/s  "
                          f"wavefront {mp_wf:7.3f} Mpaths/s  "
                          f"ratio {mp_wf/mp_mk:5.2f}x")
            continue

        for tile_m in (8, 16, 32):
            for depth in (0, 2, 3):
                def render(s, _d=depth, _st=static, _tm=tile_m):
                    def body(acc, k):
                        return acc + pt.render_sample(
                            s, w, h, k, max_depth=_d, static=_st,
                            mesh_packs=packs, tile_m=_tm), None
                    acc, _ = jax.lax.scan(
                        body, jnp.zeros((h, w, 3), jnp.float32),
                        jnp.arange(1, spp + 1, dtype=jnp.uint32))
                    return acc.sum()

                f = jax.jit(render)
                dt = _timed(f, scene)
                mp = w * h * spp / dt / 1e6
                print(f"tris={n:7d} tile_m={tile_m:2d} depth={depth}  "
                      f"{dt/spp*1e3:9.1f} ms/sample  {mp:7.3f} Mpaths/s")


main()
