"""User-facing render API.

The reference's "API" is: edit the scene JSON, reload the browser page
(SURVEY.md §1). Here it becomes a function: render(scene, config) returns
the accumulated/mean XYZ and the tonemapped sRGB image; progressive
refinement is spp accumulation with the same 1-based sample counter the
reference maintains in its UpdateVariables pass.
"""

from __future__ import annotations

from typing import Optional

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


def render(scene, cfg: Optional[RenderConfig] = None, **overrides):
    """Render a scene. Returns dict with accum_xyz, mean_xyz, srgb."""
    cfg = (cfg or RenderConfig()).replace(**overrides)
    if cfg.kernel == "pallas":
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
