#!/usr/bin/env python
"""Kernel-level timing breakdown on the current default device.

Separates the Pallas megakernel cost from the XLA wrapper (ray-gen,
spectra/CIE gathers, XYZ conversion) and from fixed dispatch latency,
so optimization effort goes where the time actually is:

    python benchmarks/profile_kernels.py --size 512 --depth 8

Findings log (1 TPU v5e chip via remote tunnel, 512^2 d8):
- 2026-08-18: fwd Pallas kernel ~2.5ms/sample; three scalar-layout CIE
  gathers cost 26ms until ops/spectrum.sample_cie switched to one
  row-indexed gather; ~45ms/call is fixed tunnel dispatch latency
  (visible as the depth=0 floor), amortized by render_accumulate's
  lax.scan over samples.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync_scalar(x):
    import jax

    jax.block_until_ready(x)
    return float(np.asarray(x).ravel()[0])


def bench(label, fn, iters=5):
    fn()  # compile+warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best * 1e3:9.2f} ms")
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tiles", type=int, nargs="+", default=[32, 64])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/crt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from computeraytracer_tpu.kernels import megakernel as mk
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    W = H = args.size
    R = W * H
    depth = args.depth
    scene, _ = scene_from_dict(presets.cornell_box(W, H))
    static = pt.SceneStatic.from_scene(scene)
    S = static.n_spectra

    fwd_full = jax.jit(lambda s: pt.render_sample(
        s, W, H, 1, max_depth=depth, static=static).sum())
    t = bench("render_sample fwd (scalar sync)",
              lambda: _sync_scalar(fwd_full(scene)), args.iters)
    print(f"{'':44s} -> {R / t / 1e6:7.2f} Mpaths/s")

    def loss(spectra, d1):
        s = scene._replace(
            spectra=spectra,
            primitives=scene.primitives._replace(data1=d1))
        img = pt.render_sample(s, W, H, 1, max_depth=depth, static=static)
        return jnp.mean(img ** 2)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    spectra = jnp.asarray(scene.spectra)
    d1 = jnp.asarray(scene.primitives.data1)

    def run_vg():
        out = vg(spectra, d1)
        jax.block_until_ready(out)
        return float(np.asarray(out[0]))

    t = bench("value_and_grad fwd+bwd", run_vg, args.iters)
    print(f"{'':44s} -> {R / t / 1e6:7.2f} Mpaths/s")

    # raw kernels, pre-staged operand planes (no wrapper, no transfer)
    rs = np.random.RandomState(0)
    for tile_m in args.tiles:
        tile = tile_m * mk.LANES
        r_pad = ((R + tile - 1) // tile) * tile
        m = r_pad // mk.LANES
        rays = jnp.asarray(rs.randn(6, m, 128), jnp.float32)
        seeds = jnp.asarray(rs.randint(0, 2 ** 31, (4, m, 128)), jnp.uint32)
        spect = jnp.asarray(rs.rand(S * 4, m, 128), jnp.float32)
        prims = mk.pack_prims(scene, static)
        fwd = mk.build_forward(static, depth, 1, tile_m)
        f = jax.jit(lambda p, r, s, sp: fwd(p, r, s, sp).sum())
        bench(f"fwd kernel tile_m={tile_m}",
              lambda: _sync_scalar(f(prims, rays, seeds, spect)), args.iters)
        if tile_m == args.tiles[0]:
            bwd = mk.build_backward(static, depth, 1, tile_m)
            dl = jnp.ones((4, m, 128), jnp.float32)
            b = jax.jit(
                lambda p, r, s, sp, dl: bwd(p, r, s, sp, dl)[0].sum())
            bench(f"bwd kernel tile_m={tile_m}",
                  lambda: _sync_scalar(b(prims, rays, seeds, spect, dl)),
                  args.iters)

    fwd_d0 = jax.jit(lambda s: pt.render_sample(
        s, W, H, 1, max_depth=0, static=static).sum())
    bench("render_sample depth=0 (wrapper+dispatch)",
          lambda: _sync_scalar(fwd_d0(scene)), args.iters)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
