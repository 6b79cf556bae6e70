"""Pallas TPU path-tracing megakernels (forward + hand-built backward).

TPU-native re-design of the reference's WGSL compute megakernel
(/root/reference/src/shaders/ComputeShader.wgsl:77-295). One grid step
traces a tile of TILE_M*128 rays to completion: the per-thread
`while(true)` bounce loop becomes a fori_loop with masked (sublane,
lane) vectors, and the 8x8-workgroup SIMT grid becomes the Pallas grid
over ray tiles (SURVEY.md §2.4).

Design notes (what makes this the TPU shape of the problem):

- **Static scene structure.** Primitive categories, materials, spectrum
  bindings and light rows are Python constants at kernel-build time, so
  the per-primitive tests specialize at trace time (a sphere row emits
  only the quadratic, a patch row only the plane test) and the material
  branches reduce to mask algebra. Geometry and spectra stay traced
  inputs — the differentiable parameters.
- **No gathers in the hot loop.** The only dynamic indexing the WGSL
  kernel does — spectra[index][lambda] — is hoisted out: XLA
  precomputes a per-ray table of EVERY spectrum sampled at the ray's 4
  hero wavelengths (S*4 planes), so in-loop spectrum lookup is a
  static S-way select. CIE conversion and camera ray-gen also live
  outside, where XLA fuses them for free.
- **In-order primitive scan.** Each bounce scans primitives in packing
  order with the reference's strict t > t_max rejection, reproducing
  its last-wins tie semantics exactly (the coplanar ceiling light
  depends on it) — no argmin reduction, and bit-for-bit the oracle's
  draw stream via the same pcg4d (ops/rng.py) run on u32 vectors.
- **Backward = replay + per-bounce adjoint.** The reference has no
  backward at all; JAX cannot reverse-differentiate through a Pallas
  fori_loop, so the backward kernel (a) replays the forward bounce
  loop, checkpointing each bounce's carry into a VMEM tape (~24 planes
  x depth; fits VMEM for tile_m<=32, the Pallas analogue of
  jax.checkpoint at every scan step), then (b) sweeps the bounces in
  reverse, rebuilding each bounce's linearization in-register with
  jax.vjp *inside the kernel* (it traces to pure VPU ops) and
  accumulating cotangents for the primitive table, the per-ray spectra
  planes, and the input rays. Sampling decisions replay bit-identically
  (same pcg4d stream), so the adjoint matches JAX AD of the XLA tracer
  exactly — verified in tests/test_pallas.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from computeraytracer_tpu import config as C

T_MIN = 0.001
ETA1, ETA2 = 1.0, 1.5
LANES = 128
DEFAULT_TILE_M = 32  # 32 x 128 = 4096 rays per grid step
MESH_TILE_M = 32     # mesh scenes: 64x64 pixel blocks (tracer/pallas.py
#                      _block_order); measured best across depths on v5e
N_DIFF = 16  # differentiable carry planes: o3 d3 L4 beta4 last_pdf eta_scale


class MeshPart(NamedTuple):
    """A contiguous run of uniform-material triangles traced via the
    chunked Morton scan (kernels/meshpack.py) instead of static
    unrolling — the TPU answer to mesh-scale scenes."""

    start: int             # first primitive row of the run
    count: int             # number of triangles
    n_chunks: int          # ceil(count / 128)
    material: int
    emission_idx: int
    reflectance_idx: int


class SceneStatic(NamedTuple):
    """Non-differentiable scene structure, static at kernel build.

    rows lists the original primitive ids handled by the unrolled scan;
    large uniform triangle runs become mesh_parts instead.
    """

    rows: tuple            # original row id of each unrolled primitive
    categories: tuple      # aligned with rows: 0 patch, 1 sphere, 2 tri
    materials: tuple
    emission_idx: tuple
    reflectance_idx: tuple
    light_rows: tuple      # original ids of lights (always unrolled)
    n_spectra: int
    mesh_parts: tuple = ()

    @classmethod
    def from_scene(cls, scene, mesh_min: int = 256) -> "SceneStatic":
        from computeraytracer_tpu.kernels import meshpack

        p = scene.primitives
        cat = np.asarray(p.category)
        mat = np.asarray(p.material)
        emi = np.asarray(p.emission)
        ref = np.asarray(p.reflectance)
        n = cat.shape[0]

        # maximal runs of triangles with uniform bindings -> mesh parts
        parts = []
        in_mesh = np.zeros(n, bool)
        i = 0
        while i < n:
            if cat[i] == 2 and mat[i] != C.LIGHT:
                j = i
                while (j < n and cat[j] == 2 and mat[j] == mat[i]
                       and emi[j] == emi[i] and ref[j] == ref[i]):
                    j += 1
                if j - i >= mesh_min:
                    parts.append(MeshPart(
                        start=int(i), count=int(j - i),
                        n_chunks=-(-(j - i) // meshpack.TRIS_PER_CHUNK),
                        material=int(mat[i]), emission_idx=int(emi[i]),
                        reflectance_idx=int(ref[i])))
                    in_mesh[i:j] = True
                i = j
            else:
                i += 1

        rows = tuple(int(r) for r in np.nonzero(~in_mesh)[0])
        return cls(
            rows=rows,
            categories=tuple(int(cat[r]) for r in rows),
            materials=tuple(int(mat[r]) for r in rows),
            emission_idx=tuple(int(emi[r]) for r in rows),
            reflectance_idx=tuple(int(ref[r]) for r in rows),
            light_rows=tuple(int(x) for x in
                             np.asarray(scene.lights.prim_index)),
            n_spectra=int(scene.spectra.shape[0]),
            mesh_parts=tuple(parts),
        )


# ---------------------------------------------------------------------------
# small vector helpers over (T, 128) planes; a "vec3" is a 3-tuple of planes
# ---------------------------------------------------------------------------

def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _vscale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def _vwhere(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _vnormalize(a):
    s = _vdot(a, a)
    s = jnp.where(s < 1e-20, 1.0, s)
    inv = 1.0 / jnp.sqrt(s)
    return _vscale(inv, a)


def _scalar_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


_vcross = _scalar_cross


# ---------------------------------------------------------------------------
# in-kernel pcg4d (vector u32), mirroring ops/rng.py exactly
# ---------------------------------------------------------------------------

_U32 = jnp.uint32


def _pcg4d(s):
    x, y, z, w = s
    x = x * _U32(1664525) + _U32(1013904223)
    y = y * _U32(1664525) + _U32(1013904223)
    z = z * _U32(1664525) + _U32(1013904223)
    w = w * _U32(1664525) + _U32(1013904223)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x, y, z, w = (v ^ (v >> 16) for v in (x, y, z, w))
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return (x, y, z, w)


def _to_unit(bits):
    # Mosaic has no u32->f32 cast; the value is < 2^24 so the i32 hop
    # is exact (and matches ops/rng.py bit-for-bit)
    return (bits & _U32(0x00FFFFFF)).astype(jnp.int32).astype(
        jnp.float32) * jnp.float32(1.0 / 0x01000000)


def _rand_masked(seed, mask):
    new = _pcg4d(seed)
    u = jnp.where(mask, _to_unit(new[0]), 0.0)
    keep = lambda a, b: jnp.where(mask, a, b)
    return u, tuple(keep(n, o) for n, o in zip(new, seed))


# ---------------------------------------------------------------------------
# shared bounce physics, parameterized over how scene data is read
# ---------------------------------------------------------------------------

def _scan_primitives(static: SceneStatic, getp, o, d, exclude, shape,
                     mesh_accessors=(), barrier: bool = False):
    """In-order closest-hit scan (wgsl:503-632 semantics) + mesh BVH.

    getp(slot, j): scalar element j of unrolled-primitive slot (SMEM ref
    read in the forward kernel; jnp array read under the backward's
    vjp). mesh_accessors: per mesh part, (part, reads) where reads is
    the accessor tuple consumed by _scan_mesh_part. barrier: forwarded
    to ops/intersect.watertight_inside — True whenever this trace is
    compiled by XLA (interpret mode / the replay) so mul+sub cannot fuse
    into FMA and break the shared-edge exact-negation symmetry; False
    under Mosaic, whose VPU has no f32 FMA (see watertight_inside).
    Returns dict of (T,128) planes: hit, t, idx, pos, nrm.
    """
    from computeraytracer_tpu.ops import intersect as isect

    inf = jnp.full(shape, jnp.inf, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)
    state = {
        "t": inf,
        "idx": jnp.full(shape, -1, jnp.int32),
        "pos": (zero, zero, zero),
        "nrm": (zero, zero, zero),
    }
    d_dot_d = _vdot(d, d)
    # watertight-triangle shear constants: per-ray, hoisted out of the
    # primitive loop (ops/intersect.py is the single source of these
    # ops so XLA/Pallas/replay decisions agree bit-for-bit)
    wt = (isect.watertight_setup(o, d)
          if any(c == 2 for c in static.categories) else None)
    # NOTE: all directions d reaching this scan are unit-length by
    # construction (camera rays, cosine-hemisphere samples, normalized
    # refraction, reflections of unit vectors), so the |n.d| < 1e-4
    # grazing cutoff is a fixed ~0.006deg angular band. Grazing
    # rejection at silhouette shared edges is the one known exception
    # to the watertight guarantee (ops/intersect.py docstring).

    for slot, (i, cat) in enumerate(zip(static.rows, static.categories)):
        not_excluded = exclude != i
        if cat in (0, 2):  # planar patch / triangle share the plane test
            p0 = (getp(slot, 0), getp(slot, 1), getp(slot, 2))
            if cat == 2:  # triangles store vertices (scene/data.py)
                v1 = (getp(slot, 3), getp(slot, 4), getp(slot, 5))
                v2 = (getp(slot, 6), getp(slot, 7), getp(slot, 8))
                e1 = _vsub(v1, p0)
                e2 = _vsub(v2, p0)
            else:
                e1 = (getp(slot, 3), getp(slot, 4), getp(slot, 5))
                e2 = (getp(slot, 6), getp(slot, 7), getp(slot, 8))
            n_raw = _scalar_cross(e1, e2)
            n_len2 = n_raw[0] * n_raw[0] + n_raw[1] * n_raw[1] + \
                n_raw[2] * n_raw[2]
            inv_len = 1.0 / jnp.sqrt(jnp.maximum(n_len2, 1e-30))
            n0 = (n_raw[0] * inv_len, n_raw[1] * inv_len, n_raw[2] * inv_len)
            ndotd = n0[0] * d[0] + n0[1] * d[1] + n0[2] * d[2]
            flip = ndotd > 0.0
            ndotd_f = jnp.where(flip, -ndotd, ndotd)
            grazing = jnp.abs(ndotd_f) < 1e-4
            num = (n0[0] * (p0[0] - o[0]) + n0[1] * (p0[1] - o[1])
                   + n0[2] * (p0[2] - o[2]))
            # flipped normal flips both numerator and denominator -> t
            # identical; guard the denominator for grazing lanes
            t = num / jnp.where(grazing, 1.0, ndotd)
            p = _vadd(o, _vscale(t, d))
            m = _vsub(p, p0)
            if cat == 0:
                inv_e1 = 1.0 / jnp.maximum(
                    e1[0] * e1[0] + e1[1] * e1[1] + e1[2] * e1[2], 1e-12)
                inv_e2 = 1.0 / jnp.maximum(
                    e2[0] * e2[0] + e2[1] * e2[1] + e2[2] * e2[2], 1e-12)
                u = _vdot(m, e1) * inv_e1
                v = _vdot(m, e2) * inv_e2
                inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
            else:  # triangle: watertight edge-function inside test
                inside = isect.watertight_inside(wt, p0, v1, v2,
                                                 barrier=barrier)
            valid = (not_excluded & ~grazing & inside
                     & (t >= T_MIN) & (t <= state["t"]))
            sgn = jnp.where(flip, -1.0, 1.0)
            n_eff = (sgn * n0[0], sgn * n0[1], sgn * n0[2])
        else:  # sphere
            cx = (getp(slot, 0), getp(slot, 1), getp(slot, 2))
            radius = getp(slot, 3)
            co = _vsub(o, cx)
            a = d_dot_d
            b = 2.0 * _vdot(d, co)
            c2 = _vdot(co, co) - radius * radius
            disc = b * b - 4.0 * a * c2
            has_root = disc > 0.0
            sq = jnp.sqrt(jnp.where(has_root, disc, 1.0))
            denom = jnp.where(a > 1e-12, 2.0 * a, 1.0)
            t_near = (-b - sq) / denom
            t_far = (-b + sq) / denom
            near_ok = (t_near >= T_MIN) & (t_near <= state["t"])
            t = jnp.where(near_ok, t_near, t_far)
            valid = (not_excluded & has_root & (a > 1e-12)
                     & (t >= T_MIN) & (t <= state["t"]))
            p = _vadd(o, _vscale(t, d))
            n_eff = _vnormalize(_vsub(p, cx))
        state = {
            "t": jnp.where(valid, t, state["t"]),
            "idx": jnp.where(valid, i, state["idx"]),
            "pos": _vwhere(valid, p, state["pos"]),
            "nrm": _vwhere(valid, n_eff, state["nrm"]),
        }

    for part, reads in mesh_accessors:
        state = _scan_mesh_part(part, reads, o, d, exclude, state, shape,
                                barrier=barrier)
    state["hit"] = state["idx"] >= 0
    return state


def _scan_mesh_part(part: "MeshPart", reads, o, d, exclude, state, shape,
                    barrier: bool = False):
    """Stackless BVH traversal over Morton chunks of one mesh part.

    reads = (get_chunk, cbox_read, nbox_read, nmeta_read, n_nodes) per
    _make_accessors. The DFS node array is walked with a skip-link
    while_loop: an inner node whose box ANY ray in the tile can still
    hit descends (+1); a miss or a leaf jumps to its `skip` slot. Leaf
    visits re-test each of their LEAF_CHUNKS chunk boxes (tighter) and
    `lax.cond`-skip the 128 triangle tests when no ray can hit.
    Triangle tests broadcast one triangle's scalars over all lanes —
    sequential reads, zero gathers; the tree does the O(log) work a
    per-ray BVH would, at tile granularity. Ties break toward the
    HIGHER primitive id (the order-free form of the reference's
    in-order last-wins; mesh ids are the highest in the scene, and
    Morton order shuffles only within the part).
    """
    from computeraytracer_tpu.kernels import meshpack
    from computeraytracer_tpu.ops import intersect as isect

    get_chunk, cbox_read, nbox_read, nmeta_read, n_nodes = reads
    # per-ray watertight shear constants, fixed for the whole traversal
    wt = isect.watertight_setup(o, d)

    # slab test needs 1/d with the sign preserved for axis-parallel rays
    inv_d = []
    for c in range(3):
        tiny = jnp.abs(d[c]) < 1e-12
        sign = jnp.where(d[c] < 0.0, -1.0, 1.0)
        inv_d.append(jnp.where(tiny, sign * jnp.float32(1e30),
                               1.0 / jnp.where(tiny, 1.0, d[c])))

    def slab_any(bb, t_best):
        """True when any ray in the tile can hit box bb closer than its
        current best. Degenerate empty boxes (lo == hi == BIG,
        meshpack.py) produce t_enter == +inf, excluded explicitly so
        `inf <= inf` against miss lanes' t_best can't fake a hit.
        The interval is padded by 4 ulp on both ends (Ize 2013, "Robust
        BVH Ray Traversal"): shared mesh edges often lie exactly on
        chunk/node AABB faces, and an unpadded slab can round the box
        away from the one triangle whose watertight test would accept
        an edge-grazing ray."""
        t_enter = jnp.full(shape, -jnp.inf, jnp.float32)
        t_exit = jnp.full(shape, jnp.inf, jnp.float32)
        for c in range(3):
            t0 = (bb[0, c] - o[c]) * inv_d[c]
            t1 = (bb[0, 3 + c] - o[c]) * inv_d[c]
            t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
            t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
        pad = jnp.float32(4 * 2.0 ** -23)
        t_exit = t_exit + jnp.abs(t_exit) * pad
        t_enter = t_enter - jnp.abs(t_enter) * pad
        return ((t_enter <= t_exit) & (t_exit >= T_MIN)
                & (t_enter <= t_best) & (t_enter < jnp.inf))

    def chunk_step(k, carry):
        t_best, idx_best, pos, nrm = carry
        hit_box = slab_any(cbox_read(k), t_best)

        def scan_chunk(carry):
            row_read = get_chunk(k)  # streaming: DMA chunk k into VMEM

            def row_step(rr, carry):
                t_best, idx_best, pos, nrm = carry
                rowv = row_read(rr)  # (1, 128)
                for j in range(meshpack.TRIS_PER_ROW):
                    b = meshpack.LANES_PER_TRI * j
                    p0 = (rowv[0, b + 0], rowv[0, b + 1], rowv[0, b + 2])
                    v1 = (rowv[0, b + 3], rowv[0, b + 4], rowv[0, b + 5])
                    v2 = (rowv[0, b + 6], rowv[0, b + 7], rowv[0, b + 8])
                    tid = rowv[0, b + 9].astype(jnp.int32)
                    # unit normal precomputed at pack time (meshpack
                    # lanes 10-12) with the same formula the unrolled
                    # branch evaluates
                    n0 = (rowv[0, b + 10], rowv[0, b + 11],
                          rowv[0, b + 12])
                    ndotd = n0[0] * d[0] + n0[1] * d[1] + n0[2] * d[2]
                    flip = ndotd > 0.0
                    grazing = jnp.abs(
                        jnp.where(flip, -ndotd, ndotd)) < 1e-4
                    num = (n0[0] * (p0[0] - o[0]) + n0[1] * (p0[1] - o[1])
                           + n0[2] * (p0[2] - o[2]))
                    t = num / jnp.where(grazing, 1.0, ndotd)
                    inside = isect.watertight_inside(wt, p0, v1, v2,
                                                     barrier=barrier)
                    valid = ((exclude != tid) & (tid >= 0) & ~grazing
                             & inside & (t >= T_MIN)
                             & ((t < t_best)
                                | ((t == t_best) & (tid > idx_best))))
                    sgn = jnp.where(flip, -1.0, 1.0)
                    p = _vadd(o, _vscale(t, d))
                    t_best = jnp.where(valid, t, t_best)
                    idx_best = jnp.where(valid, tid, idx_best)
                    pos = _vwhere(valid, p, pos)
                    nrm = _vwhere(valid, (sgn * n0[0], sgn * n0[1],
                                          sgn * n0[2]), nrm)
                return t_best, idx_best, pos, nrm

            return jax.lax.fori_loop(0, meshpack.ROWS_PER_CHUNK, row_step,
                                     carry)

        return jax.lax.cond(jnp.any(hit_box), scan_chunk, lambda c: c,
                            carry)

    def traverse_cond(c):
        return c[0] < n_nodes

    def traverse_body(c):
        node, carry = c[0], c[1:]
        hit_any = jnp.any(slab_any(nbox_read(node), carry[0]))
        meta = nmeta_read(node)  # (1, 8): [skip, chunk_start, is_leaf]
        skip, c0 = meta[0, 0], meta[0, 1]
        is_leaf = meta[0, 2] > 0

        def do_leaf(carry):
            return jax.lax.fori_loop(
                0, meshpack.LEAF_CHUNKS,
                lambda i, cc: chunk_step(c0 + i, cc), carry)

        carry = jax.lax.cond(hit_any & is_leaf, do_leaf, lambda cc: cc,
                             carry)
        nxt = jnp.where(hit_any & ~is_leaf, node + 1, skip)
        return (nxt,) + carry

    carry = (jnp.int32(0), state["t"], state["idx"], state["pos"],
             state["nrm"])
    out = jax.lax.while_loop(traverse_cond, traverse_body, carry)
    return {"t": out[1], "idx": out[2], "pos": out[3], "nrm": out[4]}


def make_bounce(static: SceneStatic, shape, max_depth: int, rr_start: int,
                barrier: bool = False):
    """One bounce of the path-trace loop (wgsl:133-293) over all lanes.

    Returns bounce(getp, gets, diff, nondiff, depth, mesh_accessors,
                   scan_fn):
      getp(slot, j)  scalar element of unrolled-primitive slot
      gets(row)   4-tuple of (T,128) planes: spectrum `row` at the
                  ray's hero wavelengths
      diff        (o3, d3, L4, beta4, last_pdf, eta_scale) float planes
      nondiff     (seed u32x4, exclude i32, specular/in_trans/active bool)
      mesh_accessors: per mesh part, (part, reads); reads may be None
                  when scan_fn replaces the scans (tracer/replay.py)
      scan_fn     optional override for ray casting:
                  scan_fn(tag, o, d, exclude) -> hit dict, where tag is
                  "main" or ("nee", light_ordinal). Default: the full
                  _scan_primitives scan. The guided replay substitutes
                  a taped-winner recompute here.
    -> (diff, nondiff, aux) where aux = (hit_idx, (sh_idx per light))
       i32 planes — the per-bounce decision record the taped forward
       writes for the replay backward.
    """
    S = static.n_spectra
    n_lights = len(static.light_rows)
    lslot = {lr: static.rows.index(lr) for lr in static.light_rows}

    def light_pdf(getp, l_row, n_at_light, ray_dir, l_pos, r_origin):
        """compute_light_pdf (wgsl:357-377) for a static light row."""
        sl = lslot[l_row]
        e1 = (getp(sl, 3), getp(sl, 4), getp(sl, 5))
        e2 = (getp(sl, 6), getp(sl, 7), getp(sl, 8))
        area = jnp.sqrt(jnp.maximum(
            e1[0] ** 2 + e1[1] ** 2 + e1[2] ** 2, 1e-30)) * jnp.sqrt(
            jnp.maximum(e2[0] ** 2 + e2[1] ** 2 + e2[2] ** 2, 1e-30))
        abs_cos = jnp.maximum(1e-5, jnp.abs(-_vdot(n_at_light, ray_dir)))
        diff = _vsub(l_pos, r_origin)
        dist2 = _vdot(diff, diff)
        geo = abs_cos / jnp.maximum(dist2, 1e-12)
        pdf = (1.0 / jnp.maximum(area, 1e-12)) / geo / float(n_lights)
        return jnp.clip(pdf, 0.0, 1e16)

    def power_heuristic(f, g):
        r = g / jnp.maximum(f, 1e-12)
        return 1.0 / (1.0 + r * r)

    def bounce(getp, gets, diff, nondiff, depth, mesh_accessors=(),
               scan_fn=None, defer_nee=False):
        o, d, L, beta, last_pdf, eta_scale = diff
        seed, exclude, specular, in_trans, active = nondiff
        one = jnp.ones(shape, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        inv_pi = jnp.float32(1.0 / math.pi)

        if scan_fn is None:
            def scan_fn(tag, so, sd, sexcl):
                return _scan_primitives(static, getp, so, sd, sexcl,
                                        shape, mesh_accessors, barrier)

        hit = scan_fn("main", o, d, exclude)
        lane_hit = active & hit["hit"]
        active = lane_hit
        exclude = jnp.where(lane_hit, hit["idx"], exclude)
        idx = hit["idx"]

        # material mask from static table (+ mesh-part id ranges)
        mat_light = jnp.zeros(shape, bool)
        mat_diffuse = jnp.zeros(shape, bool)
        mat_glass = jnp.zeros(shape, bool)
        mat_mirror = jnp.zeros(shape, bool)

        def or_material(m, sel, masks):
            ml, md, mg, mm = masks
            if m == C.LIGHT:
                ml = ml | sel
            elif m == C.DIFFUSE:
                md = md | sel
            elif m == C.GLASS:
                mg = mg | sel
            elif m == C.MIRROR:
                mm = mm | sel
            return ml, md, mg, mm

        masks = (mat_light, mat_diffuse, mat_glass, mat_mirror)
        for i, m in zip(static.rows, static.materials):
            masks = or_material(m, idx == i, masks)
        part_sels = []
        for part, _ in mesh_accessors:
            sel = (idx >= part.start) & (idx < part.start + part.count)
            part_sels.append(sel)
            masks = or_material(part.material, sel, masks)
        mat_light, mat_diffuse, mat_glass, mat_mirror = masks

        # ---- emissive hit (wgsl:149-164); mesh parts are never lights
        is_light = lane_hit & mat_light
        le = [zero] * 4
        for i, m, ei in zip(static.rows, static.materials,
                            static.emission_idx):
            if m == C.LIGHT:
                sel = idx == i
                emis = gets(ei)
                le = [jnp.where(sel, emis[j], le[j]) for j in range(4)]
        pdf_l_hit = zero
        for lr in static.light_rows:
            sel = idx == lr
            pdf_l_hit = jnp.where(
                sel, light_pdf(getp, lr, hit["nrm"], d, hit["pos"], o),
                pdf_l_hit)
        weight_b = power_heuristic(last_pdf, pdf_l_hit)
        mis_w = jnp.where((depth == 0) | specular, 1.0, weight_b)
        L = tuple(L[j] + jnp.where(is_light, beta[j] * le[j] * mis_w, 0.0)
                  for j in range(4))
        active = active & ~is_light

        scatter = active & (depth < max_depth)
        active = scatter

        # ---- Beer-Lambert (wgsl:173-179)
        ext = gets(S - 1)
        diffp = _vsub(hit["pos"], o)
        dsq = _vdot(diffp, diffp)
        dist = jnp.sqrt(jnp.where(dsq > 0, dsq, 1.0)) * (dsq > 0)
        bl = scatter & in_trans
        beta = tuple(jnp.where(
            bl, beta[j] * jnp.exp(-ext[j] * dist), beta[j])
            for j in range(4))

        is_diffuse = scatter & mat_diffuse
        is_glass = scatter & mat_glass
        is_mirror = scatter & mat_mirror

        # ---- DIFFUSE: NEE + cosine bounce (5 draws)
        u_l, seed = _rand_masked(seed, is_diffuse)
        u_p, seed = _rand_masked(seed, is_diffuse)
        v_p, seed = _rand_masked(seed, is_diffuse)
        u_h, seed = _rand_masked(seed, is_diffuse)
        v_h, seed = _rand_masked(seed, is_diffuse)

        brdf = [zero] * 4
        for i, m, ri in zip(static.rows, static.materials,
                            static.reflectance_idx):
            if m == C.DIFFUSE:
                sel = idx == i
                refl = gets(ri)
                brdf = [jnp.where(sel, refl[j], brdf[j]) for j in range(4)]
        for (part, _), sel in zip(mesh_accessors, part_sels):
            if part.material == C.DIFFUSE:
                refl = gets(part.reflectance_idx)
                brdf = [jnp.where(sel, refl[j], brdf[j]) for j in range(4)]
        brdf = [b * inv_pi for b in brdf]

        # light selection (uniform over static rows)
        li = jnp.clip((u_l * float(n_lights)).astype(jnp.int32), 0,
                      n_lights - 1)
        nee = [zero] * 4
        sh_idx_aux = []
        nee_aux = []
        for l_i, lr in enumerate(static.light_rows):
            lsel = is_diffuse & (li == l_i)
            sl = lslot[lr]
            l_o = (getp(sl, 0), getp(sl, 1), getp(sl, 2))
            l_e1 = (getp(sl, 3), getp(sl, 4), getp(sl, 5))
            l_e2 = (getp(sl, 6), getp(sl, 7), getp(sl, 8))
            p_l = (l_o[0] + u_p * l_e1[0] + v_p * l_e2[0],
                   l_o[1] + u_p * l_e1[1] + v_p * l_e2[1],
                   l_o[2] + u_p * l_e1[2] + v_p * l_e2[2])
            ldir = _vnormalize(_vsub(p_l, hit["pos"]))
            if static.mesh_parts and not defer_nee:
                # mesh scenes: the shadow scan is a full BVH traversal —
                # skip it when no lane in the tile picked this light
                # (replay stays consistent: a skipped scan tapes -1,
                # and the -1 path contributes exactly 0 either way)
                # cond carries no i1 vectors (Mosaic can't legalize
                # them through scf.if): hit re-derives from idx after
                def _sh_scan(_, _li=l_i, _pos=hit["pos"], _ld=ldir,
                             _ex=hit["idx"]):
                    s = scan_fn(("nee", _li), _pos, _ld, _ex)
                    return (s["t"], s["idx"]) + s["pos"] + s["nrm"]

                def _sh_none(_):
                    return (jnp.full(shape, jnp.inf, jnp.float32),
                            jnp.full(shape, -1, jnp.int32),
                            zero, zero, zero, zero, zero, zero)

                flat = jax.lax.cond(jnp.any(lsel), _sh_scan, _sh_none, 0)
                sh = {"t": flat[0], "idx": flat[1], "hit": flat[1] >= 0,
                      "pos": flat[2:5], "nrm": flat[5:8]}
            else:
                sh = scan_fn(("nee", l_i), hit["pos"], ldir, hit["idx"])
            sh_idx_aux.append(sh["idx"])
            unocc = sh["hit"] & (sh["idx"] == lr)
            cos_t = jnp.maximum(0.0, _vdot(hit["nrm"], ldir))
            pdf_l = light_pdf(getp, lr, sh["nrm"], ldir, sh["pos"],
                              hit["pos"])
            pdf_b = cos_t * inv_pi
            w_l = power_heuristic(pdf_l, pdf_b)
            scale = jnp.where(lsel & unocc,
                              cos_t * w_l / jnp.maximum(pdf_l, 1e-12),
                              0.0)
            l_emis = gets(static.emission_idx[lslot[lr]])
            if defer_nee:
                # deferred NEE (build_shade_step): sh was an UNROLLED-
                # only scan; emit the candidate contribution in the
                # exact float op order of the in-kernel L update
                # ((brdf * nee) * beta with nee = l_emis * scale), for
                # XLA to add after it resolves mesh occlusion. Lanes a
                # mesh later occludes get their contribution zeroed;
                # everything else is bit-identical.
                contrib = tuple((brdf[j] * (l_emis[j] * scale)) * beta[j]
                                for j in range(4))
                nee_aux.append((ldir, sh["t"], contrib, lsel))
            else:
                nee = [nee[j] + l_emis[j] * scale for j in range(4)]
        if not defer_nee:
            L = tuple(L[j] + brdf[j] * nee[j] * beta[j] for j in range(4))

        # cosine hemisphere (wgsl:751-774)
        r_h = jnp.sqrt(jnp.maximum(u_h, 0.0))
        th = jnp.float32(2.0 * math.pi) * v_h
        xh = r_h * jnp.cos(th)
        yh = r_h * jnp.sin(th)
        zh = jnp.sqrt(jnp.maximum(0.0, 1.0 - u_h))
        n = hit["nrm"]
        z_minor = jnp.abs(n[2]) < 0.999
        upx = jnp.where(z_minor, 0.0, 1.0)
        upz = jnp.where(z_minor, 1.0, 0.0)
        up = (upx, zero, upz)
        tangent = _vnormalize(_vcross(up, n))
        bitangent = _vcross(n, tangent)
        bounce_d = (tangent[0] * xh + bitangent[0] * yh + n[0] * zh,
                    tangent[1] * xh + bitangent[1] * yh + n[1] * zh,
                    tangent[2] * xh + bitangent[2] * yh + n[2] * zh)
        bounce_pdf = zh * inv_pi
        cos_b = jnp.abs(_vdot(n, bounce_d))
        bfac = cos_b / jnp.maximum(bounce_pdf, 1e-12)
        beta_diffuse = tuple(beta[j] * brdf[j] * bfac for j in range(4))

        # ---- GLASS (1 draw)
        u_g, seed = _rand_masked(seed, is_glass)
        cos_in = _vdot(n, d)
        # fresnel_s (wgsl:814-837)
        cosi = jnp.clip(cos_in, -1.0, 1.0)
        fe = jnp.where(cosi > 0.0, ETA2 / ETA1, ETA1 / ETA2)
        sint2 = fe * fe * (1.0 - cosi * cosi)
        tir = sint2 > 1.0
        cost = jnp.sqrt(jnp.where(tir, 1.0, 1.0 - sint2))
        ci = jnp.abs(cosi)
        rs = (ETA1 * ci - ETA2 * cost) / (ETA1 * ci + ETA2 * cost)
        rp = (ETA2 * ci - ETA1 * cost) / (ETA2 * ci + ETA1 * cost)
        reflectance = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
        eta = jnp.where(cos_in > 0.0, ETA2 / ETA1, ETA1 / ETA2)
        flip_n = cos_in > 0.0
        ng = _vwhere(flip_n, _vscale(-one, n), n)
        # reflect
        nd2 = 2.0 * _vdot(ng, d)
        refl_dir = _vsub(d, _vscale(nd2, ng))
        # refract (WGSL semantics; 0 on TIR)
        ndoti = _vdot(ng, d)
        kk = 1.0 - eta * eta * (1.0 - ndoti * ndoti)
        ktir = kk < 0.0
        sqk = jnp.sqrt(jnp.where(ktir, 1.0, kk))
        rft = _vsub(_vscale(eta, d), _vscale(eta * ndoti + sqk, ng))
        rft = _vwhere(ktir, (zero, zero, zero), rft)
        refr_dir = _vnormalize(rft)
        pr = reflectance
        choose_refl = u_g < pr / jnp.maximum(pr + (1.0 - pr), 1e-12)
        glass_dir = _vwhere(choose_refl, refl_dir, refr_dir)
        eta2v = eta * eta
        beta_glass = tuple(jnp.where(choose_refl, beta[j],
                                     beta[j] * eta2v) for j in range(4))
        eta_scale_glass = jnp.where(choose_refl, eta_scale,
                                    eta_scale / eta2v)
        # Mosaic rejects select on i1 data operands -> boolean algebra
        toggle_trans = is_glass & ~choose_refl  # refraction crossed a
        #                                         glass interface

        # ---- MIRROR
        nd2m = 2.0 * _vdot(n, d)
        mirror_dir = _vsub(d, _vscale(nd2m, n))

        # ---- merge
        o = _vwhere(scatter, hit["pos"], o)
        d = _vwhere(is_diffuse, bounce_d,
                    _vwhere(is_glass, glass_dir,
                            _vwhere(is_mirror, mirror_dir, d)))
        beta = tuple(jnp.where(is_diffuse, beta_diffuse[j],
                               jnp.where(is_glass, beta_glass[j],
                                         beta[j])) for j in range(4))
        last_pdf = jnp.where(is_diffuse, bounce_pdf, last_pdf)
        is_spec_bounce = is_glass | is_mirror
        specular = is_spec_bounce | (specular
                                     & ~(is_diffuse | is_spec_bounce))
        exclude = jnp.where(is_spec_bounce, -1, exclude)
        eta_scale = jnp.where(is_glass, eta_scale_glass, eta_scale)
        in_trans = in_trans ^ toggle_trans

        # ---- Russian roulette (wgsl:279-289)
        r0 = beta[0] * eta_scale
        r1 = beta[1] * eta_scale
        r2 = beta[2] * eta_scale
        max_c = jnp.maximum(r0, jnp.maximum(r1, r2))
        rr = active & (depth > rr_start) & (max_c < 1.0)
        u_r, seed = _rand_masked(seed, rr)
        q = jnp.maximum(0.0, 1.0 - max_c)
        killed = rr & (u_r < q)
        active = active & ~killed
        surv = rr & ~killed
        inv1q = 1.0 / jnp.maximum(1.0 - q, 1e-12)
        beta = tuple(jnp.where(surv, beta[j] * inv1q, beta[j])
                     for j in range(4))

        if defer_nee:
            return ((o, d, L, beta, last_pdf, eta_scale),
                    (seed, exclude, specular, in_trans, active),
                    (hit["idx"], tuple(sh_idx_aux),
                     hit["pos"], tuple(nee_aux)))
        return ((o, d, L, beta, last_pdf, eta_scale),
                (seed, exclude, specular, in_trans, active),
                (hit["idx"], tuple(sh_idx_aux)))

    return bounce


# ---------------------------------------------------------------------------
# carry packing: diff part <-> 16 float planes; nondiff <-> u32/i32 planes
# ---------------------------------------------------------------------------

def _pack_diff(diff):
    o, d, L, beta, last_pdf, eta_scale = diff
    return (*o, *d, *L, *beta, last_pdf, eta_scale)


def _unpack_diff(planes):
    return ((planes[0], planes[1], planes[2]),
            (planes[3], planes[4], planes[5]),
            tuple(planes[6:10]), tuple(planes[10:14]),
            planes[14], planes[15])


def _init_carry(rays_ref, seeds_ref, shape):
    o = (rays_ref[0, :, :], rays_ref[1, :, :], rays_ref[2, :, :])
    d = (rays_ref[3, :, :], rays_ref[4, :, :], rays_ref[5, :, :])
    seed = tuple(seeds_ref[k, :, :] for k in range(4))
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    diff = (o, d, (zero, zero, zero, zero), (one, one, one, one), one, one)
    nondiff = (seed, jnp.full(shape, -1, jnp.int32),
               jnp.zeros(shape, jnp.int32), jnp.zeros(shape, jnp.int32),
               jnp.ones(shape, jnp.int32))
    return diff, nondiff


def _pack_nd(nondiff):
    """nondiff carry -> 8 flat planes (4 u32 seed + 4 i32).

    bool state crosses the fori_loop boundary as int32: Mosaic cannot
    truncate the i8 vectors a loop-carried i1 round-trips through."""
    seed, exclude, specular, in_trans, active = nondiff
    return (*seed, exclude, specular.astype(jnp.int32),
            in_trans.astype(jnp.int32), active.astype(jnp.int32))


def _unpack_nd(planes):
    return (tuple(planes[0:4]), planes[4], planes[5] != 0,
            planes[6] != 0, planes[7] != 0)


# ---------------------------------------------------------------------------
# forward megakernel
# ---------------------------------------------------------------------------

ARRAYS_PER_PART = 4  # tri_rows, chunk_bbox, node_bbox, node_meta

# Mesh parts beyond this many total triangles keep tri_rows in HBM and
# DMA one chunk (16 rows = 8 KiB) into VMEM scratch per box-hit leaf
# chunk, instead of pinning the whole array in VMEM. tri_rows costs
# ~64 B/triangle, and Mosaic's SCOPED vmem budget for whole-array
# kernel operands is 16 MiB on v5e (a 327K-tri part = 21 MiB OOMed the
# walk kernel in the r5 staged run): 180K tris ~ 11.5 MiB leaves room
# for the carry. The config-5 scale (~1.3M tris ~ 84 MiB) cannot be
# VMEM-resident at all (BASELINE.json north star: "flattened node
# arrays in HBM"). The BVH boxes/meta stay VMEM-resident at every
# scale (~40 KiB per 100K tris).
STREAM_TRIS_ABOVE = 180_000


def should_stream_tris(static: "SceneStatic") -> bool:
    return sum(p.count for p in static.mesh_parts) > STREAM_TRIS_ABOVE


def _make_accessors(parts, mesh_refs, tri_scratch=None, tri_sem=None):
    """Build per-part read closures for _scan_mesh_part.

    reads = (get_chunk, cbox_read, nbox_read, nmeta_read, n_nodes).
    get_chunk(k) -> row_read(rr) yielding (1, 128) row rr of chunk k.
    With tri_scratch/tri_sem set (HBM streaming), get_chunk issues a
    blocking DMA of the chunk's 16 rows from the ANY-space tri_rows ref
    into VMEM scratch and reads rows from there; it is only ever called
    under the chunk-box-hit cond, so misses cost no bandwidth and
    padded chunks (degenerate far boxes) are never fetched — which is
    also what keeps the DMA in-bounds: tri_rows stores only REAL
    chunks (meshpack.pack_from_plan), and every real chunk's box is
    finite."""
    from computeraytracer_tpu.kernels import meshpack

    rpc = meshpack.ROWS_PER_CHUNK
    accessors = []
    for pi, part in enumerate(parts):
        tri_ref, cbox_ref, nbox_ref, nmeta_ref = \
            mesh_refs[ARRAYS_PER_PART * pi:ARRAYS_PER_PART * (pi + 1)]
        if tri_scratch is None:
            def get_chunk(k, _t=tri_ref):
                return lambda rr, _t=_t, _k=k: _t[pl.ds(_k * rpc + rr, 1), :]
        else:
            def get_chunk(k, _t=tri_ref):
                dma = pltpu.make_async_copy(
                    _t.at[pl.ds(k * rpc, rpc), :], tri_scratch, tri_sem)
                dma.start()
                dma.wait()
                return lambda rr: tri_scratch[pl.ds(rr, 1), :]
        reads = (
            get_chunk,
            lambda k, _b=cbox_ref: _b[pl.ds(k, 1), :],
            lambda nn, _b=nbox_ref: _b[pl.ds(nn, 1), :],
            lambda nn, _m=nmeta_ref: _m[pl.ds(nn, 1), :],
            nmeta_ref.shape[0],
        )
        accessors.append((part, reads))
    return tuple(accessors)


def build_forward(static: SceneStatic, max_depth: int, rr_start: int,
                  tile_m: int = DEFAULT_TILE_M, interpret: bool = False,
                  taped: bool = False, stream_tris: bool | None = None):
    """Build the forward megakernel for a fixed scene structure.

    Returns f(prims_f (P,12) f32, rays (6,M,128), seeds (4,M,128) u32,
    spect (S*4, M, 128), *mesh_arrays) -> radiance (4, M, 128), where
    mesh_arrays is (tri_rows, chunk_bbox, node_bbox, node_meta) per
    SceneStatic.mesh_part (kernels/meshpack.py layout), replicated to
    every ray tile.

    stream_tris=True keeps tri_rows in HBM (pl.ANY) and DMAs one chunk
    into VMEM scratch per box-hit leaf chunk — the layout that scales
    to ~1M-triangle scenes whose packed triangles exceed VMEM. None
    resolves by total triangle count (should_stream_tris).

    taped=True additionally returns the per-bounce decision record for
    the guided-replay backward (tracer/replay.py):
      tape_idx (D+1, M, 128) i32 — closest-hit winner per bounce
      tape_sh  (D+1, n_lights, M, 128) i32 — NEE shadow-scan winner
    Bounces skipped by the all-dead-tile shortcut record -1 everywhere
    (those lanes are dead in the replayed carry too, so the values are
    never consumed).

    taped="full" instead returns the full per-bounce INPUT carry —
      tape_f (D+1, N_DIFF, M, 128) f32, tape_u (D+1, 4, M, 128) u32,
      tape_i (D+1, 4, M, 128) i32
    — the exact record build_backward's in-kernel replay rebuilds.
    Feeding it to build_backward_from_tape skips the replay, so forward
    trace work runs ONCE per training step instead of twice (r4 ask 6:
    the replay was 14 of the backward's 38 ms at 1024^2). The tape is
    ~(D+1)*24 planes of HBM (~900 MB at 1024^2 depth 8, ~2 ms of
    bandwidth vs ~14 ms of re-trace).
    """
    S = static.n_spectra
    shape = (tile_m, LANES)
    depth_n = max_depth + 1
    # interpret mode executes the trace through XLA, which may fuse the
    # watertight edge functions into FMAs — keep the barrier there;
    # Mosaic-compiled runs have no f32 FMA and no barrier lowering
    bounce = make_bounce(static, shape, max_depth, rr_start,
                         barrier=interpret)
    parts = static.mesh_parts
    n_lights = max(1, len(static.light_rows))
    if stream_tris is None:
        stream_tris = should_stream_tris(static)
    stream_tris = bool(stream_tris and parts)
    taped_full = taped == "full"

    def kernel(prims_ref, rays_ref, seeds_ref, spect_ref, *rest):
        tri_scratch = tri_sem = None
        if stream_tris:
            rest, tri_scratch, tri_sem = rest[:-2], rest[-2], rest[-1]
        if taped_full:
            mesh_refs = rest[:-4]
            out_ref, tf_ref, tu_ref, ti_ref = rest[-4:]
        elif taped:
            mesh_refs = rest[:-3]
            out_ref, tidx_ref, tsh_ref = rest[-3:]
        else:
            mesh_refs, out_ref = rest[:-1], rest[-1]
        getp = lambda i, j: prims_ref[i, j]
        gets = lambda row: tuple(spect_ref[row * 4 + j, :, :]
                                 for j in range(4))
        accessors = _make_accessors(parts, mesh_refs, tri_scratch, tri_sem)
        diff, nondiff = _init_carry(rays_ref, seeds_ref, shape)
        carry = _pack_diff(diff) + _pack_nd(nondiff)

        def body(depth, carry):
            neg = jnp.full(shape, -1, jnp.int32)
            if taped_full:
                # input carry, written unconditionally (matching
                # build_backward's replay: dead tiles still record a
                # valid all-dead carry for the reverse sweep)
                for p in range(N_DIFF):
                    tf_ref[depth, p] = carry[p]
                for k in range(4):
                    tu_ref[depth, k] = carry[N_DIFF + k]
                for k in range(4):
                    ti_ref[depth, k] = carry[N_DIFF + 4 + k]

            def do(carry):
                diff = _unpack_diff(carry[:N_DIFF])
                nondiff = _unpack_nd(carry[N_DIFF:])
                diff, nondiff, aux = bounce(getp, gets, diff, nondiff,
                                            depth, accessors)
                hit_idx, sh_idx = aux
                sh = list(sh_idx) + [neg] * (n_lights - len(sh_idx))
                return (_pack_diff(diff) + _pack_nd(nondiff),
                        (hit_idx, tuple(sh)))

            # a bounce over an all-dead tile is the identity (every
            # update is masked by `active`) — skip it; RR kills most
            # paths well before max_depth, so late trips are often free
            carry, aux = jax.lax.cond(
                jnp.any(carry[-1] != 0), do,
                lambda c: (c, (neg, (neg,) * n_lights)), carry)
            if taped and not taped_full:
                tidx_ref[depth] = aux[0]
                for l_i in range(n_lights):
                    tsh_ref[depth, l_i] = aux[1][l_i]
            return carry

        carry = jax.lax.fori_loop(0, depth_n, body, carry)
        L = _unpack_diff(carry[:N_DIFF])[2]
        for j in range(4):
            out_ref[j, :, :] = L[j]

    @jax.jit
    def forward(prims_f, rays, seeds, spect, *mesh_arrays):
        m = rays.shape[1]
        grid = (m // tile_m,)
        s4 = S * 4
        mesh_specs = []
        for _ in parts:
            # boxes/meta: whole arrays, same block for every tile
            # (index_map const). tri_rows: HBM-resident when streaming.
            mesh_specs.append(pl.BlockSpec(
                memory_space=pl.ANY if stream_tris else pltpu.VMEM))
            for _k in range(ARRAYS_PER_PART - 1):
                mesh_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_specs = [pl.BlockSpec((4, tile_m, LANES), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((4, m, LANES), jnp.float32)]
        if taped_full:
            out_specs += [
                pl.BlockSpec((depth_n, N_DIFF, tile_m, LANES),
                             lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((depth_n, 4, tile_m, LANES),
                             lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((depth_n, 4, tile_m, LANES),
                             lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((depth_n, N_DIFF, m, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((depth_n, 4, m, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((depth_n, 4, m, LANES), jnp.int32),
            ]
        elif taped:
            out_specs += [
                pl.BlockSpec((depth_n, tile_m, LANES),
                             lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((depth_n, n_lights, tile_m, LANES),
                             lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((depth_n, m, LANES), jnp.int32),
                jax.ShapeDtypeStruct((depth_n, n_lights, m, LANES),
                                     jnp.int32),
            ]
        scratch = []
        if stream_tris:
            from computeraytracer_tpu.kernels import meshpack
            scratch = [pltpu.VMEM((meshpack.ROWS_PER_CHUNK, LANES),
                                  jnp.float32),
                       pltpu.SemaphoreType.DMA(())]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((6, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s4, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                *mesh_specs,
            ],
            out_specs=out_specs if taped else out_specs[0],
            out_shape=out_shape if taped else out_shape[0],
            scratch_shapes=scratch,
            interpret=interpret,
        )(prims_f, rays, seeds, spect, *mesh_arrays)
        return out

    return forward


# ---------------------------------------------------------------------------
# wavefront shade kernel: one bounce per dispatch, mesh casting external
# ---------------------------------------------------------------------------


def build_shade_step(static: SceneStatic, max_depth: int, rr_start: int,
                     tile_m: int = DEFAULT_TILE_M,
                     interpret: bool = False,
                     scan_in_kernel: bool = True):
    """One bounce with mesh casting EXTERNALIZED (the binned wavefront).

    Where build_bounce_step walks the chunk BVH inside the kernel (tile-
    granular culling that collapses for incoherent rays), this kernel
    takes the per-ray mesh closest hit as an INPUT (computed between
    bounces by kernels/binned.py at per-RAY granularity) and defers the
    NEE mesh-visibility test: it emits each light's shadow ray and
    candidate contribution, and XLA zeroes the occluded ones after a
    binned shadow cast. RNG draw order and all per-lane arithmetic are
    the megakernel's, so radiance is bit-identical to the in-kernel
    loop (tests/test_pallas.py pins it).

    The kernel also emits the UNROLLED-scene winner for its OUTPUT rays
    (un_f' [t, n.xyz], un_i' [idx]): the next bounce's mesh cast uses
    that t as its occlusion bound (exact — computed by the same Mosaic
    arithmetic as every in-kernel scan, so it can never be tighter than
    the kernel's own winner), and the next shade step consumes the
    whole record as its main-scan unrolled winner instead of
    re-scanning (scan_in_kernel=False), halving unrolled-scan work per
    bounce and removing the XLA-side bound scan entirely (r5: the XLA
    bound re-scan measured 7.6 ms/bounce at 256^2).

    scan_in_kernel=True (the first bounce) scans the carry rays
    in-kernel as before; False consumes un_f/un_i extra inputs. Both
    variants produce identical radiance — the winner record is the
    same Mosaic arithmetic either way.

    Returns f(depth (1,1) i32, prims_f (P,12), carry_f (16,M,128),
    carry_u (4,M,128) u32, carry_i (4,M,128) i32, spect (S4,M,128),
    mesh_f (4,M,128) f32 [t, n.xyz], mesh_i (1,M,128) i32 [idx]
    [, un_f (4,M,128) f32, un_i (1,M,128) i32  when not scan_in_kernel])
    ->
      (carry_f', carry_u', carry_i',
       tape_idx (M,128) i32            — merged main winner,
       sh_f ((3+8*L),M,128) f32        — [shadow origin xyz] then per
         light [ldir xyz, t_unrolled, contrib x4],
       sh_i ((2*L),M,128) i32          — per light [idx_unrolled, lsel],
       un_f' (4,M,128) f32, un_i' (1,M,128) i32 — next bounce's
         unrolled winner [t, n.xyz] / [idx] over the output rays)
    where L = n_lights.
    """
    S = static.n_spectra
    shape = (tile_m, LANES)
    bounce = make_bounce(static, shape, max_depth, rr_start,
                         barrier=interpret)
    parts = static.mesh_parts
    n_lights = max(1, len(static.light_rows))
    nl_real = len(static.light_rows)

    def kernel(depth_ref, prims_ref, cf_ref, cu_ref, ci_ref, spect_ref,
               mf_ref, mi_ref, *rest):
        if scan_in_kernel:
            (cf_out, cu_out, ci_out, tidx_ref, shf_ref, shi_ref,
             unf_out, uni_out) = rest
            unf_ref = uni_ref = None
        else:
            (unf_ref, uni_ref, cf_out, cu_out, ci_out, tidx_ref,
             shf_ref, shi_ref, unf_out, uni_out) = rest
        depth = depth_ref[0, 0]
        getp = lambda i, j: prims_ref[i, j]
        gets = lambda row: tuple(spect_ref[row * 4 + j, :, :]
                                 for j in range(4))
        # parts drive material masks / brdf bindings only (reads=None);
        # all mesh casting came in through mf/mi
        accessors = tuple((part, None) for part in parts)
        mesh_t = mf_ref[0]
        mesh_n = (mf_ref[1], mf_ref[2], mf_ref[3])
        mesh_id = mi_ref[0]

        def scan_fn(tag, so, sd, sexcl):
            if tag == "main" and not scan_in_kernel:
                # winner precomputed by the previous step's output scan
                # (same Mosaic ops); pos rebuilt with the scan's exact
                # expression _vadd(o, _vscale(t, d))
                t_u = unf_ref[0]
                st = {"t": t_u, "idx": uni_ref[0],
                      "pos": _vadd(so, _vscale(t_u, sd)),
                      "nrm": (unf_ref[1], unf_ref[2], unf_ref[3])}
            else:
                st = _scan_primitives(static, getp, so, sd, sexcl, shape,
                                      (), barrier=interpret)
            if tag != "main":
                return st  # NEE: unrolled only; mesh occlusion deferred
            # fold the precomputed mesh winner in with the exact tie
            # rule of _scan_mesh_part; pos recomputed with the same op
            # order (_vadd(o, _vscale(t, d))) as every in-kernel branch
            take = ((mesh_t < st["t"])
                    | ((mesh_t == st["t"]) & (mesh_id > st["idx"])))
            t = jnp.where(take, mesh_t, st["t"])
            idx = jnp.where(take, mesh_id, st["idx"])
            pos = _vwhere(take, _vadd(so, _vscale(mesh_t, sd)),
                          st["pos"])
            nrm = _vwhere(take, mesh_n, st["nrm"])
            return {"t": t, "idx": idx, "pos": pos, "nrm": nrm,
                    "hit": idx >= 0}

        carry = tuple(cf_ref[p] for p in range(N_DIFF)) + \
            tuple(cu_ref[k] for k in range(4)) + \
            tuple(ci_ref[k] for k in range(4))
        neg = jnp.full(shape, -1, jnp.int32)
        zero = jnp.zeros(shape, jnp.float32)
        inf = jnp.full(shape, jnp.inf, jnp.float32)
        zi = jnp.zeros(shape, jnp.int32)

        def do(carry):
            diff = _unpack_diff(carry[:N_DIFF])
            nondiff = _unpack_nd(carry[N_DIFF:])
            diff, nondiff, aux = bounce(getp, gets, diff, nondiff,
                                        depth, accessors,
                                        scan_fn=scan_fn, defer_nee=True)
            hit_idx, sh_idx, sh_o, nee_aux = aux
            flat = [hit_idx] + list(sh_o)
            for l_i in range(nl_real):
                ldir, t_su, contrib, lsel = nee_aux[l_i]
                flat += [sh_idx[l_i], lsel.astype(jnp.int32),
                         t_su, *ldir, *contrib]
            for _ in range(n_lights - nl_real):
                flat += [neg, zi, inf, zero, zero, zero,
                         zero, zero, zero, zero]
            carry = _pack_diff(diff) + _pack_nd(nondiff)
            # next bounce's unrolled winner over the OUTPUT rays (new
            # o/d/exclude): its t is the next mesh cast's exact
            # occlusion bound, the record its main-scan winner
            nxt = _scan_primitives(static, getp,
                                   (carry[0], carry[1], carry[2]),
                                   (carry[3], carry[4], carry[5]),
                                   carry[N_DIFF + 4], shape, (),
                                   barrier=interpret)
            flat += [nxt["t"], *nxt["nrm"], nxt["idx"]]
            return (carry, tuple(flat))

        def skip(carry):
            flat = [neg, zero, zero, zero]
            for _ in range(n_lights):
                flat += [neg, zi, inf, zero, zero, zero,
                         zero, zero, zero, zero]
            # all-dead tile: no ray casts next bounce; inf bound / -1
            # idx keep the candidate sets empty
            flat += [inf, zero, zero, zero, neg]
            return (carry, tuple(flat))

        carry, aux = jax.lax.cond(jnp.any(carry[-1] != 0), do, skip,
                                  carry)
        for p in range(N_DIFF):
            cf_out[p] = carry[p]
        for k in range(4):
            cu_out[k] = carry[N_DIFF + k]
        for k in range(4):
            ci_out[k] = carry[N_DIFF + 4 + k]
        tidx_ref[:] = aux[0]
        shf_ref[0] = aux[1]
        shf_ref[1] = aux[2]
        shf_ref[2] = aux[3]
        for l_i in range(n_lights):
            b = 4 + 10 * l_i
            shi_ref[2 * l_i] = aux[b]
            shi_ref[2 * l_i + 1] = aux[b + 1]
            fb = 3 + 8 * l_i
            shf_ref[fb + 3] = aux[b + 2]           # t_unrolled
            shf_ref[fb + 0] = aux[b + 3]           # ldir x3
            shf_ref[fb + 1] = aux[b + 4]
            shf_ref[fb + 2] = aux[b + 5]
            shf_ref[fb + 4] = aux[b + 6]           # contrib x4
            shf_ref[fb + 5] = aux[b + 7]
            shf_ref[fb + 6] = aux[b + 8]
            shf_ref[fb + 7] = aux[b + 9]
        b = 4 + 10 * n_lights
        unf_out[0] = aux[b]
        unf_out[1] = aux[b + 1]
        unf_out[2] = aux[b + 2]
        unf_out[3] = aux[b + 3]
        uni_out[0] = aux[b + 4]

    @jax.jit
    def step(depth, prims_f, carry_f, carry_u, carry_i, spect,
             mesh_f, mesh_i, *un):
        m = carry_f.shape[1]
        grid = (m // tile_m,)
        s4 = S * 4
        tile = lambda k: pl.BlockSpec((k, tile_m, LANES),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
        un_specs = [] if scan_in_kernel else [tile(4), tile(1)]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                tile(N_DIFF), tile(4), tile(4), tile(s4),
                tile(4), tile(1), *un_specs,
            ],
            out_specs=[
                tile(N_DIFF), tile(4), tile(4),
                pl.BlockSpec((tile_m, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                tile(3 + 8 * n_lights), tile(2 * n_lights),
                tile(4), tile(1),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N_DIFF, m, LANES), jnp.float32),
                jax.ShapeDtypeStruct((4, m, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((4, m, LANES), jnp.int32),
                jax.ShapeDtypeStruct((m, LANES), jnp.int32),
                jax.ShapeDtypeStruct((3 + 8 * n_lights, m, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((2 * n_lights, m, LANES),
                                     jnp.int32),
                jax.ShapeDtypeStruct((4, m, LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, m, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(depth, prims_f, carry_f, carry_u, carry_i, spect,
          mesh_f, mesh_i, *un)

    return step


# ---------------------------------------------------------------------------
# backward megakernel: forward replay with VMEM tape, reverse vjp sweep
# ---------------------------------------------------------------------------

def build_backward(static: SceneStatic, max_depth: int, rr_start: int,
                   tile_m: int = DEFAULT_TILE_M, interpret: bool = False):
    """Build the backward megakernel.

    Returns f(prims_f (P,12), rays (6,M,128), seeds (4,M,128) u32,
    spect (S*4,M,128), dL (4,M,128)) ->
      (d_prims (P,12), d_rays (6,M,128), d_spect (S*4,M,128)).

    d_prims sums over every ray tile (the grid revisits one output
    block; TPU grids are sequential so += is race-free). Decisions
    (hits, BSDF choices, RR) replay bit-identically from the same pcg4d
    streams; each bounce's adjoint is rebuilt in-register by jax.vjp of
    the shared bounce function — the Pallas analogue of
    jax.checkpoint-per-scan-step on the XLA tracer.
    """
    if static.mesh_parts:
        raise NotImplementedError(
            "mesh scenes differentiate through the taped guided replay "
            "(tracer/replay.py); tracer/pallas.py routes there "
            "automatically")
    n_prims = len(static.categories)
    S = static.n_spectra
    s4 = S * 4
    shape = (tile_m, LANES)
    depth_n = max_depth + 1
    # VMEM budget guard: the replay tape is (depth+1) x 24 planes of
    # tile_m x 128 x 4B scratch, and Mosaic's failure mode for an
    # oversized allocation is an opaque error — fail here with the knob
    # named instead. Budget = half of v5e's 128 MiB VMEM, leaving the
    # other half for the carry, spectra tile and the vjp's live values.
    tape_bytes = depth_n * (N_DIFF + 8) * tile_m * LANES * 4
    budget = 64 * 1024 * 1024
    if tape_bytes > budget:
        max_tile = budget // (depth_n * (N_DIFF + 8) * LANES * 4)
        raise ValueError(
            f"backward tape needs {tape_bytes / 2**20:.0f} MiB of VMEM "
            f"(depth {max_depth}, tile_m {tile_m}) > {budget // 2**20} "
            f"MiB budget; pass tile_m<={max_tile} (or reduce max_depth)")
    bounce = make_bounce(static, shape, max_depth, rr_start,
                         barrier=interpret)

    def kernel(prims_ref, rays_ref, seeds_ref, spect_ref, dl_ref,
               dprims_ref, drays_ref, dspect_ref,
               tape_f, tape_seed, tape_i):
        prims = prims_ref[:]          # (P, 12) value: the diff input
        spect = spect_ref[:]          # (S4, T, L) value: the diff input
        getp_v = lambda pv: (lambda i, j: pv[i, j])
        gets_v = lambda sv: (lambda row: tuple(sv[row * 4 + j]
                                               for j in range(4)))

        # ---- forward replay, checkpointing each bounce's input carry
        diff, nondiff = _init_carry(rays_ref, seeds_ref, shape)
        carry = _pack_diff(diff) + _pack_nd(nondiff)

        def replay(depth, carry):
            for p in range(N_DIFF):
                tape_f[depth, p] = carry[p]
            for k in range(4):
                tape_seed[depth, k] = carry[N_DIFF + k]
            for k in range(4):
                tape_i[depth, k] = carry[N_DIFF + 4 + k]

            def do(carry):
                diff = _unpack_diff(carry[:N_DIFF])
                nondiff = _unpack_nd(carry[N_DIFF:])
                diff, nondiff, _ = bounce(getp_v(prims), gets_v(spect),
                                          diff, nondiff, depth)
                return _pack_diff(diff) + _pack_nd(nondiff)

            # all-dead tile: the bounce is the identity (same skip as
            # build_forward); the tape row above is still written so the
            # reverse sweep reads a valid (all-dead) carry
            return jax.lax.cond(jnp.any(carry[-1] != 0), do,
                                lambda c: c, carry)

        jax.lax.fori_loop(0, depth_n, replay, carry)

        # ---- reverse sweep
        d_diff = [jnp.zeros(shape, jnp.float32) for _ in range(N_DIFF)]
        for j in range(4):
            d_diff[6 + j] = dl_ref[j, :, :]  # cotangent of final L
        d_prims = jnp.zeros(prims.shape, jnp.float32)
        d_spect = jnp.zeros(spect.shape, jnp.float32)

        def reverse(k, acc):
            depth = depth_n - 1 - k
            active_in = tape_i[depth, 3]

            def do(acc):
                d_diff, d_prims, d_spect = acc
                diff_in = _unpack_diff(
                    tuple(tape_f[depth, p] for p in range(N_DIFF)))
                seed_in = tuple(tape_seed[depth, j] for j in range(4))
                ints = tuple(tape_i[depth, j] for j in range(4))
                nondiff_in = _unpack_nd(seed_in + ints)

                def f(pv, sv, diff_planes):
                    out_diff, _, _ = bounce(getp_v(pv), gets_v(sv),
                                            _unpack_diff(diff_planes),
                                            nondiff_in, depth)
                    return _pack_diff(out_diff)

                _, vjp = jax.vjp(f, prims, spect, _pack_diff(diff_in))
                dp, ds, dd = vjp(tuple(d_diff))
                return list(dd), d_prims + dp, d_spect + ds

            # an all-dead bounce is the identity on the diff carry and
            # touches no parameters: its vjp passes d_diff through
            # unchanged and adds nothing to d_prims/d_spect — skip it
            return jax.lax.cond(jnp.any(active_in != 0), do,
                                lambda a: a, acc)

        d_diff, d_prims, d_spect = jax.lax.fori_loop(
            0, depth_n, reverse, (d_diff, d_prims, d_spect))

        # cotangents of the initial carry -> input rays
        for j in range(6):
            drays_ref[j, :, :] = d_diff[j]
        dspect_ref[:] = d_spect
        @pl.when(pl.program_id(0) == 0)
        def _():
            dprims_ref[:] = jnp.zeros_like(dprims_ref)
        dprims_ref[:] += d_prims

    @jax.jit
    def backward(prims_f, rays, seeds, spect, dl):
        m = rays.shape[1]
        grid = (m // tile_m,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((6, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s4, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_prims, 12), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s4, tile_m, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_prims, 12), jnp.float32),
                jax.ShapeDtypeStruct((6, m, LANES), jnp.float32),
                jax.ShapeDtypeStruct((s4, m, LANES), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((depth_n, N_DIFF, tile_m, LANES), jnp.float32),
                pltpu.VMEM((depth_n, 4, tile_m, LANES), jnp.uint32),
                pltpu.VMEM((depth_n, 4, tile_m, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(prims_f, rays, seeds, spect, dl)

    return backward


def build_backward_from_tape(static: SceneStatic, max_depth: int,
                             rr_start: int, tile_m: int = DEFAULT_TILE_M,
                             interpret: bool = False):
    """Reverse-sweep-only backward: consumes the forward's full carry
    tape (build_forward taped="full") instead of replaying the trace.

    Returns f(prims_f (P,12), spect (S*4,M,128), tape_f, tape_u,
    tape_i, dL (4,M,128)) ->
      (d_prims (P,12), d_rays (6,M,128), d_spect (S*4,M,128)).

    Identical adjoint arithmetic to build_backward's reverse sweep (the
    same make_bounce under jax.vjp per bounce); only the tape's
    producer changed — the forward kernel wrote it once, so forward
    trace work runs once per training step, not twice (r4 ask 6; the
    re-trace was 38-14=24...14 ms of the 52 ms fwd+bwd sample at
    1024^2, README r4 breakdown). d_rays comes from the depth-0 tape
    row's cotangent, which IS the input-ray cotangent (the initial
    carry embeds the rays)."""
    if static.mesh_parts:
        raise NotImplementedError(
            "mesh scenes differentiate through the taped guided replay "
            "(tracer/replay.py)")
    n_prims = len(static.categories)
    S = static.n_spectra
    s4 = S * 4
    shape = (tile_m, LANES)
    depth_n = max_depth + 1
    bounce = make_bounce(static, shape, max_depth, rr_start,
                         barrier=interpret)

    def kernel(prims_ref, spect_ref, tf_ref, tu_ref, ti_ref, dl_ref,
               dprims_ref, drays_ref, dspect_ref):
        prims = prims_ref[:]
        spect = spect_ref[:]
        getp_v = lambda pv: (lambda i, j: pv[i, j])
        gets_v = lambda sv: (lambda row: tuple(sv[row * 4 + j]
                                               for j in range(4)))

        d_diff = [jnp.zeros(shape, jnp.float32) for _ in range(N_DIFF)]
        for j in range(4):
            d_diff[6 + j] = dl_ref[j, :, :]
        d_prims = jnp.zeros(prims.shape, jnp.float32)
        d_spect = jnp.zeros(spect.shape, jnp.float32)

        def reverse(k, acc):
            depth = depth_n - 1 - k
            active_in = ti_ref[depth, 3]

            def do(acc):
                d_diff, d_prims, d_spect = acc
                diff_in = tuple(tf_ref[depth, p] for p in range(N_DIFF))
                seed_in = tuple(tu_ref[depth, j] for j in range(4))
                ints = tuple(ti_ref[depth, j] for j in range(4))
                nondiff_in = _unpack_nd(seed_in + ints)

                def f(pv, sv, diff_planes):
                    out_diff, _, _ = bounce(getp_v(pv), gets_v(sv),
                                            _unpack_diff(diff_planes),
                                            nondiff_in, depth)
                    return _pack_diff(out_diff)

                _, vjp = jax.vjp(f, prims, spect, diff_in)
                dp, ds, dd = vjp(tuple(d_diff))
                return list(dd), d_prims + dp, d_spect + ds

            return jax.lax.cond(jnp.any(active_in != 0), do,
                                lambda a: a, acc)

        d_diff, d_prims, d_spect = jax.lax.fori_loop(
            0, depth_n, reverse, (d_diff, d_prims, d_spect))

        for j in range(6):
            drays_ref[j, :, :] = d_diff[j]
        dspect_ref[:] = d_spect
        @pl.when(pl.program_id(0) == 0)
        def _():
            dprims_ref[:] = jnp.zeros_like(dprims_ref)
        dprims_ref[:] += d_prims

    @jax.jit
    def backward(prims_f, spect, tape_f, tape_u, tape_i, dl):
        m = spect.shape[1]
        grid = (m // tile_m,)
        tile3 = lambda k, dt: pl.BlockSpec((k, tile_m, LANES),
                                           lambda i: (0, i, 0),
                                           memory_space=pltpu.VMEM)
        tape_spec = lambda k: pl.BlockSpec(
            (depth_n, k, tile_m, LANES), lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                tile3(s4, jnp.float32),
                tape_spec(N_DIFF), tape_spec(4), tape_spec(4),
                tile3(4, jnp.float32),
            ],
            out_specs=[
                pl.BlockSpec((n_prims, 12), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                tile3(6, jnp.float32),
                tile3(s4, jnp.float32),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_prims, 12), jnp.float32),
                jax.ShapeDtypeStruct((6, m, LANES), jnp.float32),
                jax.ShapeDtypeStruct((s4, m, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(prims_f, spect, tape_f, tape_u, tape_i, dl)

    return backward


def pack_prims(scene, static: SceneStatic | None = None) -> jnp.ndarray:
    """(P_unrolled, 12) f32: [origin/center, edge1/radius, edge2, pad].

    Sphere rows put the radius at column 3 (edge1.x), matching the
    reference's (r, r, r) packing of data2 (main.js:239). With a static
    that has mesh parts, only the unrolled rows are packed (mesh
    geometry travels via kernels/meshpack.py instead); the row gather is
    a fixed-index jnp op so gradients scatter back to the scene."""
    p = scene.primitives
    full = jnp.concatenate(
        [p.data1, p.data2, p.data3, jnp.zeros_like(p.data1)], axis=-1)
    if static is None or not static.mesh_parts:
        return full
    return full[jnp.asarray(static.rows, jnp.int32)]
