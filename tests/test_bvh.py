"""BVH: builder invariants + traversal parity vs the brute-force scan.

The BVH must be a pure accelerator: same closest hit (incl. the
reference's last-wins tie semantics, SURVEY.md §2.2) as the linear scan,
and identical renders/gradients when plugged into the XLA tracer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from computeraytracer_tpu import bvh as bvh_mod
from computeraytracer_tpu.ops import intersect as isect
from computeraytracer_tpu.scene import mesh, presets, scene_from_dict
from computeraytracer_tpu.tracer import xla as xla_tracer


@pytest.fixture(scope="module")
def mesh_doc():
    return presets.mesh_scene(32, 32, subdivisions=2)  # 320 tris


@pytest.fixture(scope="module")
def mesh_scene_small(mesh_doc):
    scene, _ = scene_from_dict(mesh_doc)
    return scene


def test_builder_partitions_primitives(mesh_scene_small):
    bvh = bvh_mod.scene_bvh(mesh_scene_small)
    p = np.asarray(bvh.leaf_prims)
    ids = p[p >= 0]
    n = mesh_scene_small.primitives.count
    assert sorted(ids.tolist()) == list(range(n))  # each prim exactly once
    # skip links terminate and stay in range
    assert (np.asarray(bvh.miss) >= 0).all()
    assert (np.asarray(bvh.miss) <= bvh.n_nodes).all()


def test_builder_bounds_contain_primitives(mesh_scene_small):
    prims = mesh_scene_small.primitives
    bvh = bvh_mod.scene_bvh(mesh_scene_small)
    lo, hi = bvh_mod.builder.primitive_bounds(
        prims.category, prims.data1, prims.data2, prims.data3)
    leaf = np.asarray(bvh.leaf_prims)
    for node in range(bvh.n_nodes):
        pids = leaf[node][leaf[node] >= 0]
        if len(pids) == 0:
            continue
        assert (np.asarray(bvh.bbox_min)[node] <= lo[pids].min(0) + 1e-4).all()
        assert (np.asarray(bvh.bbox_max)[node] >= hi[pids].max(0) - 1e-4).all()


def _random_rays(scene, n, seed=0):
    r = np.random.default_rng(seed)
    lo = np.asarray(scene.primitives.data1).min(0) - 50.0
    hi = np.asarray(scene.primitives.data1).max(0) + 50.0
    o = r.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_hits_match(scene, bvh, o, d, exclude):
    from computeraytracer_tpu.scene import data as scene_data
    scene = scene_data.as_jax(scene)
    brute = isect.intersect_brute(o, d, exclude, scene.primitives)
    fast = bvh_mod.intersect_bvh(o, d, exclude, scene.primitives, bvh)
    np.testing.assert_array_equal(np.asarray(fast.hit), np.asarray(brute.hit))
    hit = np.asarray(brute.hit)
    np.testing.assert_array_equal(np.asarray(fast.index)[hit],
                                  np.asarray(brute.index)[hit])
    np.testing.assert_allclose(np.asarray(fast.t)[hit],
                               np.asarray(brute.t)[hit], rtol=1e-5, atol=1e-4)


def test_traversal_matches_brute_mesh(mesh_scene_small):
    bvh = bvh_mod.scene_bvh(mesh_scene_small)
    o, d = _random_rays(mesh_scene_small, 512)
    exclude = jnp.full(512, -1, jnp.int32)
    _assert_hits_match(mesh_scene_small, bvh, o, d, exclude)


def test_traversal_matches_brute_cornell(cornell_scene):
    # mixed patches+spheres, incl. the coplanar ceiling/light tie
    bvh = bvh_mod.scene_bvh(cornell_scene)
    o, d = _random_rays(cornell_scene, 512, seed=1)
    exclude = jnp.full(512, -1, jnp.int32)
    _assert_hits_match(cornell_scene, bvh, o, d, exclude)


def test_traversal_respects_exclusion(cornell_scene):
    bvh = bvh_mod.scene_bvh(cornell_scene)
    o, d = _random_rays(cornell_scene, 256, seed=2)
    exclude = jnp.asarray(
        np.random.default_rng(3).integers(
            0, cornell_scene.primitives.count, 256, dtype=np.int32))
    _assert_hits_match(cornell_scene, bvh, o, d, exclude)


def test_render_with_bvh_matches_brute(mesh_scene_small):
    bvh = bvh_mod.scene_bvh(mesh_scene_small)
    w = h = 16
    want = np.asarray(xla_tracer.render_sample(
        mesh_scene_small, w, h, 1, max_depth=3))
    got = np.asarray(xla_tracer.render_sample(
        mesh_scene_small, w, h, 1, max_depth=3, bvh=bvh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradients_through_bvh(mesh_scene_small):
    bvh = bvh_mod.scene_bvh(mesh_scene_small)
    w = h = 8

    def loss(spectra, use_bvh):
        s = mesh_scene_small._replace(spectra=spectra)
        img = xla_tracer.render_sample(s, w, h, 1, max_depth=2,
                                      bvh=bvh if use_bvh else None)
        return jnp.sum(img ** 2)

    spectra = jnp.asarray(mesh_scene_small.spectra)
    g_bvh = np.asarray(jax.grad(loss)(spectra, True))
    g_brt = np.asarray(jax.grad(loss)(spectra, False))
    assert np.isfinite(g_bvh).all()
    np.testing.assert_allclose(g_bvh, g_brt, rtol=1e-3, atol=1e-6)


def test_obj_roundtrip(tmp_path):
    v, f = mesh.icosphere(1)
    path = tmp_path / "ico.obj"
    lines = ["v %f %f %f" % tuple(p) for p in v]
    lines += ["f %d %d %d" % tuple(i + 1 for i in face) for face in f]
    path.write_text("\n".join(lines))
    v2, f2 = mesh.load_obj(str(path))
    np.testing.assert_allclose(v2, v, rtol=1e-5)
    np.testing.assert_array_equal(f2, f)
