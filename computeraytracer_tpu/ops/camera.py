"""Pinhole camera: basis construction and per-pixel ray generation.

Matches the reference camera model (ComputeShader.wgsl:470-500):
- right-handed basis from eye/lookat/up,
- `focalLength` in the scene JSON is actually a vertical FOV in radians
  (viewport_height = 2*tan(f/2), wgsl:479),
- per-sample sub-pixel jitter uses stratum (sample % 16) plus one uniform
  in BOTH s and t (the same stratum for both axes), with t measured from
  the bottom: t = (H - py + jitter)/H (wgsl:496-500).
"""

from __future__ import annotations

import jax.numpy as jnp

from computeraytracer_tpu import config as C
from computeraytracer_tpu.ops import rng


def _normalize(v, axis=-1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def camera_basis(eye, lookat, up):
    """Returns (u, v, w) each (3,) — wgsl:470-475."""
    w = _normalize(eye - lookat)
    u = _normalize(jnp.cross(up, w))
    v = jnp.cross(w, u)
    return u, v, w


def camera_rays(eye, lookat, up, fov, width, height, px, py, sample, seed):
    """Generate jittered primary rays for pixel coordinates px, py (...,).

    sample is the 1-based sample counter (uint32). Consumes exactly two
    RNG draws per ray (s then t), like wgsl:496-500. Returns
    (origins (..., 3), directions (..., 3), new_seed).
    """
    u, v, w = camera_basis(eye, lookat, up)
    aspect = jnp.float32(width) / jnp.float32(height)
    viewport_h = 2.0 * jnp.tan(fov / 2.0)
    viewport_w = aspect * viewport_h
    horizontal = viewport_w * u
    vertical = viewport_h * v
    lower_left = eye - horizontal / 2.0 - vertical / 2.0 - w

    stratum = (sample % jnp.uint32(C.GRID_SIZE)).astype(jnp.float32)
    inv_grid = jnp.float32(1.0 / C.GRID_SIZE)
    us, seed = rng.rand(seed)
    ut, seed = rng.rand(seed)
    s = (px.astype(jnp.float32) + (stratum + us) * inv_grid) / jnp.float32(width)
    t = (jnp.float32(height) - py.astype(jnp.float32) + (stratum + ut) * inv_grid) / jnp.float32(height)

    d = (lower_left + s[..., None] * horizontal + t[..., None] * vertical - eye)
    d = _normalize(d)
    o = jnp.broadcast_to(eye, d.shape)
    return o, d, seed
