"""Sampling routines: cosine hemisphere, area lights, MIS power heuristic.

Mirrors /root/reference/src/shaders/ComputeShader.wgsl:
- power_heuristic (beta=2) :297-302
- uniform light selection + uniform point on a rectangular light :341-355
- area->solid-angle light pdf :357-377
- cosine-weighted hemisphere with the z-up/x-up tangent frame :751-774
"""

from __future__ import annotations

import jax.numpy as jnp


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / (f * f + g * g)


def cosine_hemisphere(normal, u, v):
    """Cosine-weighted direction about `normal` from two uniforms.

    Returns (direction (..., 3), pdf (...,)). pdf = cos(theta)/pi.
    """
    r = jnp.sqrt(u)
    theta = 2.0 * jnp.pi * v
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u))
    z_minor = jnp.abs(normal[..., 2]) < 0.999
    up = jnp.where(
        z_minor[..., None],
        jnp.array([0.0, 0.0, 1.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    tangent = jnp.cross(up, normal)
    tangent = tangent / jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-20
    )
    bitangent = jnp.cross(normal, tangent)
    direction = (
        tangent * x[..., None] + bitangent * y[..., None] + normal * z[..., None]
    )
    pdf = z / jnp.pi
    return direction, pdf


def pick_light(u, n_lights):
    """Uniform light index from one uniform (wgsl:341-347)."""
    idx = (u * jnp.float32(n_lights)).astype(jnp.int32)
    return jnp.clip(idx, 0, n_lights - 1)


def point_on_light(origin, edge1, edge2, u, v):
    """Uniform point on a rectangular area light (wgsl:349-355)."""
    return origin + u[..., None] * edge1 + v[..., None] * edge2


def light_solid_angle_pdf(edge1, edge2, n_lights, normal_at_light,
                          ray_direction, light_position, ray_origin):
    """Solid-angle pdf of sampling the point hit on an area light.

    Matches compute_light_pdf (wgsl:357-377): (1/area) / (|cos|/d^2) *
    (1/n_lights), with |cos| clamped to >= 1e-5.
    """
    area = jnp.linalg.norm(edge1, axis=-1) * jnp.linalg.norm(edge2, axis=-1)
    abs_cos = jnp.maximum(
        1e-5, jnp.abs(jnp.sum(normal_at_light * (-ray_direction), axis=-1))
    )
    dist2 = jnp.sum((light_position - ray_origin) ** 2, axis=-1)
    geometric = abs_cos / jnp.maximum(dist2, 1e-20)
    return (1.0 / jnp.maximum(area, 1e-20)) / geometric / jnp.float32(n_lights)
