"""User-facing render API.

The reference's "API" is: edit the scene JSON, reload the browser page
(SURVEY.md §1). Here it becomes a function: render(scene, config) returns
the accumulated/mean XYZ and the tonemapped sRGB image; progressive
refinement is spp accumulation with the same 1-based sample counter the
reference maintains in its UpdateVariables pass.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from computeraytracer_tpu.config import RenderConfig
from computeraytracer_tpu.ops import color
from computeraytracer_tpu.tracer import xla as xla_tracer


def render_sample(scene, width, height, sample, max_depth=8, rr_start=1,
                  kernel: str = "xla"):
    """One progressive sample -> XYZ (H, W, 3)."""
    if kernel == "xla":
        return xla_tracer.render_sample(scene, width, height, sample,
                                        max_depth, rr_start)
    if kernel == "pallas":
        from computeraytracer_tpu.tracer import pallas as pallas_tracer
        return pallas_tracer.render_sample(scene, width, height, sample,
                                           max_depth, rr_start)
    raise ValueError(f"unknown kernel {kernel!r}")


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "tile_h", "spp", "max_depth", "rr_start",
    "kernel", "pstatic"))
def _band_accumulate(scene, mesh_packs, y0, first_sample, *, width,
                     height, tile_h, spp, max_depth, rr_start, kernel,
                     pstatic):
    """Accumulate spp samples for film rows [y0, y0+tile_h)."""
    px, py = xla_tracer.tile_coords(width, tile_h, y0)

    def one(s):
        if kernel == "pallas":
            from computeraytracer_tpu.tracer import pallas as pt
            return pt.render_pixels(scene, width, height, px, py, s,
                                    max_depth, rr_start, static=pstatic,
                                    mesh_packs=mesh_packs)
        return xla_tracer.render_pixels(scene, width, height, px, py, s,
                                        max_depth, rr_start)

    def body(acc, s):
        return acc + one(s), None

    accum0 = jnp.zeros((tile_h * width, 3), jnp.float32)
    samples = first_sample + jnp.arange(spp, dtype=jnp.uint32)
    accum, _ = jax.lax.scan(body, accum0, samples)
    return accum.reshape(tile_h, width, 3)


def _render_accumulate_chunked(scene, cfg: RenderConfig):
    """Row-band chunked accumulation: peak live memory scales with
    ray_chunk instead of width*height — the lever large-film renders
    (BASELINE config 5's 2048^2) need on one chip."""
    rows = max(1, cfg.ray_chunk // cfg.width)
    pstatic = None
    mesh_packs = None
    if cfg.kernel == "pallas":
        from computeraytracer_tpu.tracer import pallas as pt
        pstatic = pt.SceneStatic.from_scene(scene)
        if pstatic.mesh_parts:
            mesh_packs = pt.mesh_packs_for(scene, pstatic)
    bands = []
    for y0 in range(0, cfg.height, rows):
        th = min(rows, cfg.height - y0)
        bands.append(_band_accumulate(
            scene, mesh_packs, jnp.uint32(y0), jnp.uint32(cfg.first_sample),
            width=cfg.width, height=cfg.height, tile_h=th, spp=cfg.spp,
            max_depth=cfg.max_depth, rr_start=cfg.rr_start,
            kernel=cfg.kernel, pstatic=pstatic))
    return jnp.concatenate(bands, axis=0)


def render(scene, cfg: Optional[RenderConfig] = None, **overrides):
    """Render a scene. Returns dict with accum_xyz, mean_xyz, srgb."""
    cfg = (cfg or RenderConfig()).replace(**overrides)
    if cfg.ray_chunk and cfg.ray_chunk > 0:
        accum = _render_accumulate_chunked(scene, cfg)
    elif cfg.kernel == "pallas":
        from computeraytracer_tpu.tracer import pallas as pallas_tracer
        accum = pallas_tracer.render_accumulate(
            scene, cfg.width, cfg.height, cfg.spp, cfg.max_depth,
            cfg.rr_start, cfg.first_sample)
    else:
        accum = xla_tracer.render_accumulate(
            scene, cfg.width, cfg.height, cfg.spp, cfg.max_depth,
            cfg.rr_start, cfg.first_sample)
    # The reference divides the never-cleared accumulator by the sample
    # counter (wgsl:107-110).
    total = cfg.first_sample + cfg.spp - 1
    mean = accum / jnp.float32(total)
    return {
        "accum_xyz": accum,
        "mean_xyz": mean,
        "srgb": color.xyz_to_srgb(mean),
        "samples": total,
    }
