"""Scan-free guided replay: the backward path for mesh-scale scenes.

The Pallas forward megakernel cannot be reverse-differentiated through
its chunked BVH scan (per-lane winner gathers have no efficient in-
kernel transpose on TPU: the cotangent would need a per-lane scatter
into the triangle arrays). Instead the taped forward
(kernels/megakernel.py build_forward(taped=True)) records, per bounce,
the *decisions* a re-execution cannot cheaply re-derive: the closest-hit
winner index and each NEE shadow-scan winner index. Everything else —
RNG draws, BSDF choices, Russian roulette — replays bit-identically
from the same pcg4d streams.

This module re-runs the SAME bounce function (megakernel.make_bounce —
pure jnp, so it traces as a plain XLA program outside Pallas) with the
scans replaced by `hit_from_index`: gather the winning primitive's 12
floats by the taped index and recompute only ITS intersection (t,
position, normal) differentiably. That is exactly the local
linearization of the true scan — the winner is locally constant in the
geometry — so `jax.grad` of the replay yields the path-tracer gradient
w.r.t. every vertex, edge, radius and spectrum, at O(rays * depth) cost
with no re-scan: the BASELINE config-3 capability ("pixel gradients
flow to vertex positions", differentiating the estimator of
/root/reference/src/shaders/ComputeShader.wgsl:119-295).

XLA handles the two awkward pieces natively: the per-bounce winner
gather lowers to a TPU gather over (P, 12), and the cotangent scatter-
add back into the primitive table lowers to a scatter — both O(rays *
depth * 12), independent of triangle count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from computeraytracer_tpu.kernels import megakernel as mk

T_MIN = mk.T_MIN


def hit_from_index(prims_full, cats, idx, o, d):
    """Recompute the winner's intersection from its taped index.

    prims_full (P, 12) f32 — the FULL packed primitive table (all rows,
    including mesh triangles); cats (P,) i32 category per row; idx
    (T, L) i32 taped winner (-1 = miss); o, d 3-tuples of (T, L) planes.

    Returns the same dict _scan_primitives produces for the winning
    lane: {hit, t, idx, pos, nrm} with miss lanes zeroed exactly like
    the scan's initial state. Formulas mirror megakernel.
    _scan_primitives so the recomputed t/pos/nrm equal the forward's
    winner values bit-for-bit; validity (inside/uv) checks are NOT
    re-run — the tape asserts the winner was valid.
    """
    shape = idx.shape
    flat = jnp.maximum(idx.reshape(-1), 0)
    rows = jnp.take(prims_full, flat, axis=0)        # (R, 12)
    cat = jnp.take(cats, flat).reshape(shape)        # (T, L)
    p = lambda c: rows[:, c].reshape(shape)
    p0 = (p(0), p(1), p(2))
    # patches store edges at cols 3..8; triangles store vertices
    # (scene/data.py) — subtract in the same f32 op order as the
    # megakernel's cat-2 branch so t/normal replay bit-exactly
    is_tri = cat == 2
    e1 = tuple(jnp.where(is_tri, p(3 + i) - p(i), p(3 + i))
               for i in range(3))
    e2 = tuple(jnp.where(is_tri, p(6 + i) - p(i), p(6 + i))
               for i in range(3))

    # --- plane-family winner (patch cat 0 / triangle cat 2): identical
    # to the plane test in _scan_primitives (uv bounds not needed)
    n_raw = mk._scalar_cross(e1, e2)
    n_len2 = n_raw[0] * n_raw[0] + n_raw[1] * n_raw[1] + n_raw[2] * n_raw[2]
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(n_len2, 1e-30))
    n0 = (n_raw[0] * inv_len, n_raw[1] * inv_len, n_raw[2] * inv_len)
    ndotd = n0[0] * d[0] + n0[1] * d[1] + n0[2] * d[2]
    flip = ndotd > 0.0
    grazing = jnp.abs(jnp.where(flip, -ndotd, ndotd)) < 1e-4
    num = (n0[0] * (p0[0] - o[0]) + n0[1] * (p0[1] - o[1])
           + n0[2] * (p0[2] - o[2]))
    t_pl = num / jnp.where(grazing, 1.0, ndotd)
    sgn = jnp.where(flip, -1.0, 1.0)
    n_pl = (sgn * n0[0], sgn * n0[1], sgn * n0[2])

    # --- sphere winner (cat 1): radius is packed at column 3
    # (megakernel.pack_prims; reference main.js:239 packs (r, r, r)).
    # A winning t_far implies t_near < T_MIN (see _scan_primitives: a
    # near root past the running best can never validate), so the
    # winner's t is t_near when admissible, else t_far.
    radius = p(3)
    co = mk._vsub(o, p0)
    a = mk._vdot(d, d)
    b = 2.0 * mk._vdot(d, co)
    c2 = mk._vdot(co, co) - radius * radius
    disc = b * b - 4.0 * a * c2
    sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    denom = jnp.where(a > 1e-12, 2.0 * a, 1.0)
    t_near = (-b - sq) / denom
    t_far = (-b + sq) / denom
    t_sp = jnp.where(t_near >= T_MIN, t_near, t_far)

    is_sphere = cat == 1
    t = jnp.where(is_sphere, t_sp, t_pl)
    pos = mk._vadd(o, mk._vscale(t, d))
    n_sp = mk._vnormalize(mk._vsub(pos, p0))
    nrm = mk._vwhere(is_sphere, n_sp, n_pl)

    miss = idx < 0
    zero = jnp.zeros(shape, jnp.float32)
    t = jnp.where(miss, jnp.inf, t)
    pos = mk._vwhere(miss, (zero, zero, zero), pos)
    nrm = mk._vwhere(miss, (zero, zero, zero), nrm)
    return {"hit": ~miss, "t": t, "idx": idx, "pos": pos, "nrm": nrm}


def trace_replay(static, cats, prims_full, rays, seeds, spect_p,
                 tape_idx, tape_sh, max_depth: int, rr_start: int):
    """Re-run the bounce loop guided by the decision tape.

    Inputs in the megakernel's plane layout: rays (6, M, L) f32, seeds
    (4, M, L) u32, spect_p (S*4, M, L) f32, tape_idx (D+1, M, L) i32,
    tape_sh (D+1, n_lights, M, L) i32. Returns radiance (4, M, L).
    Differentiable w.r.t. prims_full, rays and spect_p; per-bounce
    rematerialization keeps the AD tape O(carry) instead of
    O(carry * depth).
    """
    shape = rays.shape[1:]
    # barrier=True: the replay traces to a plain XLA program (never
    # Mosaic), where the watertight edge functions need the
    # anti-FMA-fusion barrier (all its scans are taped overrides, so
    # this only matters if a caller ever drops scan_fn)
    bounce = mk.make_bounce(static, shape, max_depth, rr_start,
                            barrier=True)
    prims_u = prims_full[jnp.asarray(static.rows)]
    getp = lambda i, j: prims_u[i, j]
    gets = lambda row: tuple(spect_p[row * 4 + j] for j in range(4))
    # parts only (reads=None): masks/brdf bindings come from the part
    # ranges; all ray casting goes through the taped scan_fn
    accessors = tuple((part, None) for part in static.mesh_parts)
    diff, nondiff = mk._init_carry(rays, seeds, shape)

    def step(carry, xs):
        depth, t_idx, t_sh = xs

        def scan_fn(tag, so, sd, sexcl):
            idx = t_idx if tag == "main" else t_sh[tag[1]]
            return hit_from_index(prims_full, cats, idx, so, sd)

        diff, nondiff = carry
        diff, nondiff, _ = bounce(getp, gets, diff, nondiff, depth,
                                  accessors, scan_fn=scan_fn)
        return (diff, nondiff), None

    (diff, nondiff), _ = jax.lax.scan(
        jax.checkpoint(step), (diff, nondiff),
        (jnp.arange(max_depth + 1), tape_idx, tape_sh))
    return jnp.stack(diff[2])
