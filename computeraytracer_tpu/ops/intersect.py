"""Ray-primitive intersection, vectorized over rays x primitives.

Semantics follow the reference's tagged-dispatch intersector
(/root/reference/src/shaders/ComputeShader.wgsl:503-632):

- planar patch (category 0): plane hit with the geometric normal flipped
  toward the ray, |n.d| < 1e-4 rejection, and 2D (u,v) in [0,1]^2
  edge-projection bounds (wgsl:524-583);
- sphere (category 1): quadratic with near-then-far root selection
  (wgsl:584-631);
- triangle (category 2): NEW (the reference has no mesh support) —
  Moller-Trumbore with the same normal-flipped-toward-ray convention.

Self-hit avoidance is via an excluded primitive index, not epsilon alone
(wgsl:527-532), with t_min=0.001 (wgsl:720). Closest hit uses
first-minimum-wins, matching the reference's in-order scan with strict
`t > t_max` rejection.

The scan here is the "naive XLA tracer" baseline: a fully vectorized
(rays x primitives) broadcast reduced with argmin — MXU/VPU-friendly but
O(R*P); BVH traversal (bvh/) replaces it for meshes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

T_MIN = 0.001
INF = jnp.float32(jnp.inf)
NO_INDEX = jnp.int32(-1)  # stands in for the reference's MAX_U32_VALUE

CAT_PATCH = 0
CAT_SPHERE = 1
CAT_TRIANGLE = 2


class Hit(NamedTuple):
    """Closest-hit record for a batch of rays (leading dims = ray batch)."""

    hit: jnp.ndarray        # bool
    t: jnp.ndarray          # f32
    index: jnp.ndarray      # int32 global primitive index (-1 if miss)
    position: jnp.ndarray   # (..., 3)
    normal: jnp.ndarray     # (..., 3) flipped toward the ray
    emission: jnp.ndarray   # int32 spectrum index
    reflectance: jnp.ndarray
    material: jnp.ndarray   # int32


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def safe_normalize(v, eps=1e-20):
    """Normalize with NaN-free gradients at v ~= 0.

    jnp.linalg.norm has an inf gradient at 0 which poisons grads through
    jnp.where (the double-where problem); guard the sum-of-squares before
    the sqrt. For |v| >= 1e-10 the result is bitwise identical in f32.
    """
    s = _dot(v, v)
    s = jnp.where(s < eps, 1.0, s)
    # division (not rsqrt) so results stay bitwise identical to v/|v|
    return v / jnp.sqrt(s)[..., None]


def safe_sqrt(x, eps=0.0):
    """sqrt with a NaN-free gradient for x <= 0 (value is 0 there)."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), eps)


def patch_candidates(o, d, origin, edge1, edge2):
    """Ray-vs-patch t for broadcast shapes; returns (t, valid).

    o, d: (..., 3); origin/edge1/edge2: broadcastable to (..., 3).
    """
    n = safe_normalize(jnp.cross(edge1, edge2))
    ndotd = _dot(n, d)
    # Flip toward ray (wgsl:541-545); after the flip ndotd <= 0.
    n = jnp.where(ndotd[..., None] > 0, -n, n)
    ndotd = jnp.where(ndotd > 0, -ndotd, ndotd)
    grazing = jnp.abs(ndotd) < 1e-4
    safe_ndotd = jnp.where(grazing, 1.0, ndotd)
    t = _dot(n, origin - o) / safe_ndotd
    p = o + t[..., None] * d
    m = p - origin
    u = _dot(m, edge1) / jnp.maximum(_dot(edge1, edge1), 1e-12)
    v = _dot(m, edge2) / jnp.maximum(_dot(edge2, edge2), 1e-12)
    valid = (~grazing) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
    return t, valid


def sphere_candidates(o, d, center, radius, t_min, t_max):
    """Ray-vs-sphere t with near-then-far root selection; (t, valid)."""
    co = o - center
    a = _dot(d, d)
    b = 2.0 * _dot(d, co)
    c = _dot(co, co) - radius * radius
    disc = b * b - 4.0 * a * c
    has_root = disc > 0.0
    sq = safe_sqrt(disc)
    # guard the 2a denominator for degenerate (zero-direction) rays on
    # masked lanes; true division keeps bitwise parity with the oracle
    denom = jnp.where(a > 1e-12, 2.0 * a, 1.0)
    t_near = (-b - sq) / denom
    t_far = (-b + sq) / denom
    has_root = has_root & (a > 1e-12)
    near_ok = (t_near >= t_min) & (t_near <= t_max)
    t = jnp.where(near_ok, t_near, t_far)
    valid = has_root & (t >= t_min) & (t <= t_max)
    return t, valid


def triangle_candidates(o, d, v0, e1, e2):
    """Moller-Trumbore; returns (t, valid). v1 = v0+e1, v2 = v0+e2."""
    pvec = jnp.cross(d, e2)
    det = _dot(e1, pvec)
    degenerate = jnp.abs(det) < 1e-9
    inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
    tvec = o - v0
    u = _dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = _dot(d, qvec) * inv_det
    t = _dot(e2, qvec) * inv_det
    valid = (~degenerate) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, valid


def scene_candidates(o, d, prims, t_min=T_MIN):
    """All-primitive candidate ts for rays o, d of shape (..., 3).

    prims: scene.data.ScenePrimitives with (P,) leaves.
    Returns (t (..., P), valid (..., P)) — range/exclusion NOT yet applied
    (sphere root selection needs t range, so spheres get it here).
    """
    ob = o[..., None, :]
    db = d[..., None, :]
    t_p, ok_p = patch_candidates(ob, db, prims.data1, prims.data2, prims.data3)
    t_s, ok_s = sphere_candidates(ob, db, prims.data1, prims.data2[..., 0],
                                  t_min, INF)
    t_t, ok_t = triangle_candidates(ob, db, prims.data1, prims.data2,
                                    prims.data3)
    cat = prims.category
    t = jnp.where(cat == CAT_PATCH, t_p,
                  jnp.where(cat == CAT_SPHERE, t_s, t_t))
    ok = jnp.where(cat == CAT_PATCH, ok_p,
                   jnp.where(cat == CAT_SPHERE, ok_s, ok_t))
    ok = ok & (t >= t_min)
    return t, ok


def shading_normal(prims, idx, o, d, position):
    """Geometric normal of primitive idx at `position`, flipped toward -d."""
    cat = prims.category[idx]
    d1 = prims.data1[idx]
    d2 = prims.data2[idx]
    d3 = prims.data3[idx]
    n_flat = jnp.cross(d2, d3)  # patches and triangles
    n_sph = position - d1
    n = safe_normalize(jnp.where((cat == CAT_SPHERE)[..., None], n_sph, n_flat))
    # Patches/triangles flip toward the ray; spheres use the outward
    # normal unflipped (wgsl:617-618).
    flip = (_dot(n, d) > 0) & (cat != CAT_SPHERE)
    return jnp.where(flip[..., None], -n, n)


def intersect_brute(o, d, exclude, prims, t_min=T_MIN):
    """Closest-hit over all primitives by linear scan (the naive path).

    o, d: (..., 3); exclude: (...,) int32 primitive index (-1 = none).
    Returns a Hit.
    """
    t, ok = scene_candidates(o, d, prims, t_min)
    ok = ok & (prims.index != exclude[..., None])
    t_masked = jnp.where(ok, t, INF)
    # The reference scans primitives in order and only rejects on strict
    # t > t_max (wgsl:557,609), so the LAST primitive wins exact-t ties.
    # This is load-bearing: the Cornell area light is coplanar with the
    # ceiling and only visible because it is packed after it. Reversed
    # argmin reproduces last-wins.
    n_prims = t_masked.shape[-1]
    winner_rev = jnp.argmin(t_masked[..., ::-1], axis=-1)
    winner = jnp.int32(n_prims - 1) - winner_rev
    t_hit = jnp.take_along_axis(t_masked, winner[..., None], axis=-1)[..., 0]
    hit = jnp.isfinite(t_hit)
    t_safe = jnp.where(hit, t_hit, 0.0)
    position = o + t_safe[..., None] * d
    normal = shading_normal(prims, winner, o, d, position)
    return Hit(
        hit=hit,
        t=t_safe,
        index=jnp.where(hit, prims.index[winner], NO_INDEX),
        position=position,
        normal=normal,
        emission=prims.emission[winner],
        reflectance=prims.reflectance[winner],
        material=prims.material[winner],
    )
