"""Watertightness of the triangle intersector (north-star requirement).

The reference has no triangle support at all; meshes are the BASELINE
configs 3-5 extension. These tests pin the Woop-style shear-constant
edge-function test (ops/intersect.py:watertight_inside): a ray aimed at
a point on the SHARED edge (or a shared vertex) of two adjacent
icosphere triangles must hit at least one of them — the classic crack
case that the plain Moller-Trumbore epsilon form fails. Triangles store
vertices (not edge vectors) precisely so shared endpoints are bitwise
identical across neighbors (scene/data.py layout note).
"""

import numpy as np
import jax.numpy as jnp

from computeraytracer_tpu.ops import intersect as isect
from computeraytracer_tpu.scene import mesh as mesh_ops


def _shared_edges(faces):
    """(edge -> [face ids]) for edges shared by exactly two faces."""
    edges = {}
    for fi, (a, b, c) in enumerate(faces):
        for u, v in ((a, b), (b, c), (c, a)):
            key = (u, v) if u < v else (v, u)
            edges.setdefault(key, []).append(fi)
    return {k: v for k, v in edges.items() if len(v) == 2}


def _front_facing(verts, faces, eye):
    v0 = verts[faces[:, 0]]
    n = np.cross(verts[faces[:, 1]] - v0, verts[faces[:, 2]] - v0)
    return (n * (v0 - eye)).sum(1) * np.sign(
        (n * v0).sum(1)) < -1e-6  # outward normal faces the eye


def _edge_targets(rng, verts, shared, faces, front, n_points=3):
    """f32 points on shared front-facing edges + their two face ids.

    Vertex-aimed rays are only added when the vertex's ENTIRE incident
    fan is front-facing: the test rays pass within ~1 ulp of (not
    exactly through) their target, and near a SILHOUETTE vertex such a
    ray legitimately grazes past the surface — a tangent near-miss,
    not a crack.
    """
    incident = {}
    for fi, tri in enumerate(faces):
        for vi in tri:
            incident.setdefault(int(vi), []).append(fi)
    fan_front = {vi: all(front[f] for f in fs)
                 for vi, fs in incident.items()}
    pts, pairs = [], []
    for (a, b), (f1, f2) in shared.items():
        if not (front[f1] and front[f2]):
            continue
        va = verts[a].astype(np.float32)
        vb = verts[b].astype(np.float32)
        for w in rng.uniform(0.05, 0.95, n_points):
            # f32 combination: the point is within ~1 ulp of the edge
            pts.append(np.float32(1.0 - w) * va + np.float32(w) * vb)
            pairs.append((f1, f2))
        if fan_front[int(a)]:
            pts.append(va)  # shared VERTEX (full front-facing fan)
            pairs.append((f1, f2))
    return np.asarray(pts, np.float32), pairs


def test_shared_edge_rays_always_hit_one_neighbor():
    rng = np.random.default_rng(0)
    verts, faces = mesh_ops.icosphere(2)  # 320 faces
    eye = np.array([0.0, 0.3, 3.0], np.float32)
    shared = _shared_edges(faces)
    assert len(shared) == 480  # closed 2-manifold: E = 3F/2
    front = _front_facing(verts, faces, eye)
    pts, pairs = _edge_targets(rng, verts, shared, faces, front)
    assert len(pts) > 400

    v32 = verts.astype(np.float32)
    v0 = jnp.asarray(v32[faces[:, 0]])
    v1 = jnp.asarray(v32[faces[:, 1]])
    v2 = jnp.asarray(v32[faces[:, 2]])
    o = jnp.broadcast_to(jnp.asarray(eye), (len(pts), 3))
    d = jnp.asarray(pts) - o  # unnormalized is fine

    t, ok = isect.triangle_candidates(o[:, None, :], d[:, None, :],
                                      v0, v1, v2)
    ok = np.asarray(ok & (t >= isect.T_MIN))
    # the crack property: for EVERY edge point, at least one of the two
    # adjacent triangles (or, at a vertex, any incident one) accepts
    misses = [i for i, (f1, f2) in enumerate(pairs)
              if not (ok[i, f1] or ok[i, f2] or ok[i].any())]
    assert not misses, f"{len(misses)} crack rays leaked, e.g. {misses[:5]}"


def test_scene_scan_never_leaks_through_closed_surface():
    """End-to-end: intersect_brute on a closed mesh must hit for every
    edge-aimed ray (a leak would shoot through the closed surface)."""
    from computeraytracer_tpu.scene import data as sdata

    rng = np.random.default_rng(1)
    verts, faces = mesh_ops.icosphere(2)
    eye = np.array([0.0, 0.3, 3.0], np.float32)
    shared = _shared_edges(faces)
    front = _front_facing(verts, faces, eye)
    pts, _ = _edge_targets(rng, verts, shared, faces, front, n_points=2)

    cols = mesh_ops.mesh_arrays(verts, faces, reflectance=0, emission=0,
                                material=0)
    prims = sdata.ScenePrimitives(
        index=np.arange(len(faces), dtype=np.int32),
        **{k: cols[k] for k in ("category", "data1", "data2", "data3",
                                "emission", "reflectance", "material")})
    import jax
    prims = jax.tree_util.tree_map(jnp.asarray, prims)

    o = jnp.broadcast_to(jnp.asarray(eye), (len(pts), 3))
    d = jnp.asarray(pts) - o
    hit = isect.intersect_brute(o, d, jnp.full(len(pts), -1, jnp.int32),
                                prims)
    n_miss = int((~np.asarray(hit.hit)).sum())
    assert n_miss == 0, f"{n_miss}/{len(pts)} edge rays leaked through"


def _closed_mesh_prims():
    """(prims, eye, edge-aimed unit dirs) for the icosphere leak setup."""
    from computeraytracer_tpu.scene import data as sdata
    import jax

    rng = np.random.default_rng(3)
    verts, faces = mesh_ops.icosphere(2)
    eye = np.array([0.0, 0.3, 3.0], np.float32)
    shared = _shared_edges(faces)
    front = _front_facing(verts, faces, eye)
    pts, _ = _edge_targets(rng, verts, shared, faces, front, n_points=2)

    cols = mesh_ops.mesh_arrays(verts, faces, reflectance=0, emission=0,
                                material=0)
    prims = sdata.ScenePrimitives(
        index=np.arange(len(faces), dtype=np.int32),
        **{k: cols[k] for k in ("category", "data1", "data2", "data3",
                                "emission", "reflectance", "material")})
    prims = jax.tree_util.tree_map(jnp.asarray, prims)
    o = np.broadcast_to(eye, (len(pts), 3)).astype(np.float32)
    d = pts - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return prims, o, d


def test_bvh_traversal_never_leaks_through_closed_surface():
    """Same leak property through intersect_bvh: the padded slab test
    (Ize 2013) must not cull an edge-grazing ray at a node boundary
    before it reaches the one triangle that would accept it."""
    from computeraytracer_tpu.bvh import builder, traverse

    prims, o, d = _closed_mesh_prims()
    bvh = builder.build_bvh(np.asarray(prims.category),
                            np.asarray(prims.data1),
                            np.asarray(prims.data2),
                            np.asarray(prims.data3))
    hit = traverse.intersect_bvh(jnp.asarray(o), jnp.asarray(d),
                                 jnp.full(len(o), -1, jnp.int32),
                                 prims, bvh)
    n_miss = int((~np.asarray(hit.hit)).sum())
    assert n_miss == 0, f"{n_miss}/{len(o)} edge rays leaked through BVH"


def test_grazing_band_leak_bounded_on_closed_mesh():
    """Numeric CEILING on the grazing-band energy leak (r3 ask 8).

    The one known exception to the watertight guarantee is the
    |n.d| < 1e-4 grazing rejection (megakernel.py bounce scan /
    ops/intersect.py known-exception note): a ray that would exit a
    closed surface exactly through a silhouette band of some triangle
    can be rejected by BOTH triangles sharing the edge when each is
    grazing, and leak through. This test measures that leak as a
    fraction of an isotropic ray population cast from points INSIDE a
    closed displaced-blob mesh — every such ray must hit the closed
    surface, so the miss fraction IS the leaked-energy fraction of a
    uniform interior radiance field (each ray carries equal energy).

    Measured (seeds below, 5120-tri displaced blob, 24K rays):
    0 leaked — the band is ~1e-4 rad wide and the neighbor triangle
    across a silhouette edge is rarely ALSO grazing. The asserted
    ceiling 5e-4 is ~10x the one-in-24K resolution, pinning the leak
    at silhouettes to a bounded, tested quantity instead of a
    docstring caveat."""
    from computeraytracer_tpu.scene import data as sdata
    import jax

    verts, faces = mesh_ops.displaced_blob(4)  # 5120 tris, closed, bumpy
    cols = mesh_ops.mesh_arrays(verts, faces, reflectance=0, emission=0,
                                material=0)
    prims = sdata.ScenePrimitives(
        index=np.arange(len(faces), dtype=np.int32),
        **{k: cols[k] for k in ("category", "data1", "data2", "data3",
                                "emission", "reflectance", "material")})
    prims = jax.tree_util.tree_map(jnp.asarray, prims)

    rng = np.random.default_rng(11)
    # interior origins: well inside the blob (min radius ~1-0.25-...)
    n_orig, n_dir = 8, 3000
    o = rng.uniform(-0.3, 0.3, (n_orig, 1, 3))
    d = rng.normal(size=(n_orig, n_dir, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(o, d.shape).reshape(-1, 3).astype(np.float32)
    d = d.reshape(-1, 3).astype(np.float32)

    n = len(o)
    misses = 0
    for s in range(0, n, 4096):  # chunk the (rays, 5120) brute matrix
        hit = isect.intersect_brute(
            jnp.asarray(o[s:s + 4096]), jnp.asarray(d[s:s + 4096]),
            jnp.full(min(4096, n - s), -1, jnp.int32), prims)
        misses += int((~np.asarray(hit.hit)).sum())
    frac = misses / n
    assert frac <= 5e-4, (
        f"grazing-band leak {misses}/{n} = {frac:.2e} exceeds the 5e-4 "
        f"ceiling on a closed mesh")


def test_mesh_part_scan_never_leaks_through_closed_surface():
    """Same leak property through the Pallas megakernel's chunk-BVH mesh
    scan (_scan_mesh_part): the node/chunk slab culls plus the in-kernel
    watertight test must hit a mesh triangle for every edge-aimed ray.
    The taped forward's per-bounce winner record is the observable."""
    from computeraytracer_tpu.kernels import megakernel as mk
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pallas_tracer

    rng = np.random.default_rng(4)
    verts, faces = mesh_ops.icosphere(2)
    eye = np.array([0.0, 0.3, 3.0], np.float32)
    shared = _shared_edges(faces)
    front = _front_facing(verts, faces, eye)
    pts, _ = _edge_targets(rng, verts, shared, faces, front, n_points=2)

    doc = {
        "camera": {"eye": [0, 0.3, 3], "lookat": [0, 0, 0],
                   "up": [0, 1, 0], "focalLength": 0.9,
                   "width": 8, "height": 8},
        "objects": {
            "patches": [presets._patch([-2, 5, -2], [4, 0, 0], [0, 0, 4],
                                       "white", "light", "light")],
            "meshes": [{"vertices": verts.tolist(),
                        "faces": faces.tolist(), "emission": "dark",
                        "reflectance": "white", "type": "diffuse"}],
        },
        "spectra": presets._cornell_spectra(),
    }
    scene, _ = scene_from_dict(doc)
    static = mk.SceneStatic.from_scene(scene, mesh_min=64)
    assert static.mesh_parts
    part = static.mesh_parts[0]

    tile_m = 8
    tile = tile_m * mk.LANES
    r = len(pts)
    r_pad = -(-r // tile) * tile
    m = r_pad // mk.LANES
    o = np.broadcast_to(eye, (r, 3)).astype(np.float32)
    d = pts - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)

    def planes(x, dtype):
        out = np.zeros((x.shape[1], r_pad), dtype)
        out[:, :r] = x.T.astype(dtype)
        return jnp.asarray(out.reshape(x.shape[1], m, mk.LANES))

    rays = planes(np.concatenate([o, d], axis=1), np.float32)
    seeds = planes(np.ones((r, 4), np.uint32), np.uint32)
    spect = jnp.ones((static.n_spectra * 4, m, mk.LANES), jnp.float32)
    packs = pallas_tracer.mesh_packs_for(scene, static)
    mesh_arrays = tuple(jnp.asarray(a) for p in packs for a in p.arrays)
    fwd = mk.build_forward(static, max_depth=0, rr_start=1,
                           tile_m=tile_m, interpret=True, taped=True)
    _, tape_idx, _ = fwd(mk.pack_prims(scene, static), rays, seeds, spect,
                         *mesh_arrays)
    winner = np.asarray(tape_idx)[0].reshape(-1)[:r]
    leaked = winner < part.start  # miss (-1) or the light patch
    assert not leaked.any(), (
        f"{int(leaked.sum())}/{r} edge rays leaked through the mesh scan")
