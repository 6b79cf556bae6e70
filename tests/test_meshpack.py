"""Chunk-BVH packing invariants (kernels/meshpack.py).

The kernel traversal is only correct if the DFS/skip structure
partitions the tree and every node box bounds its descendant chunks;
these tests pin that contract, plus the jit-repack path used by
vertex-optimization training (boxes re-derive from traced geometry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computeraytracer_tpu.kernels import meshpack
from computeraytracer_tpu.scene import mesh as mesh_ops


def _ico(sub=2):
    v, f = mesh_ops.icosphere(sub)
    return v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]


def test_dfs_structure_partitions():
    for n_groups in (1, 2, 8, 32):
        perm, meta = meshpack._dfs_structure(n_groups)
        n_nodes = 2 * n_groups - 1
        assert perm.shape == (n_nodes,)
        assert sorted(perm.tolist()) == list(range(n_nodes))
        # walk the skip links from the root: visiting every node via
        # "descend" (+1) must enumerate DFS order; skipping from the
        # root must land exactly past the end
        assert meta[0, 0] == n_nodes
        leaves = meta[meta[:, 2] == 1]
        assert leaves.shape[0] == n_groups
        # leaves cover all chunks exactly once, in some order
        starts = sorted(leaves[:, 1].tolist())
        assert starts == [i * meshpack.LEAF_CHUNKS for i in range(n_groups)]
        # every skip target is a valid DFS slot or the end
        assert ((meta[:, 0] > 0) & (meta[:, 0] <= n_nodes)).all()


def test_node_boxes_bound_chunks():
    v0, v1, v2 = _ico(3)
    plan = meshpack.make_plan(v0, v1, v2)
    pack = meshpack.pack_from_plan(plan, v0, v1, v2,
                                   np.arange(v0.shape[0]))
    cbox = np.asarray(pack.chunk_bbox)
    nbox = np.asarray(pack.node_bbox)
    meta = np.asarray(pack.node_meta)
    # reconstruct each node's chunk range from the complete-tree shape:
    # a node's leaves-below = (skip - dfs_index + 1) / 2
    for d in range(meta.shape[0]):
        span = (meta[d, 0] - d + 1) // 2 * meshpack.LEAF_CHUNKS
        c0 = meta[d, 1]
        lo, hi = nbox[d, 0:3], nbox[d, 3:6]
        for k in range(c0, c0 + span):
            clo, chi = cbox[k, 0:3], cbox[k, 3:6]
            if (clo >= meshpack.BIG / 2).all():
                continue  # empty padding chunk
            assert (lo <= clo + 1e-5).all() and (hi >= chi - 1e-5).all()


def test_chunk_boxes_bound_triangles():
    v0, v1, v2 = _ico(2)
    n = v0.shape[0]
    plan = meshpack.make_plan(v0, v1, v2)
    pack = meshpack.pack_from_plan(plan, v0, v1, v2, np.arange(n))
    rows = np.asarray(pack.tri_rows).reshape(-1, meshpack.LANES_PER_TRI)
    cbox = np.asarray(pack.chunk_bbox)
    ids = rows[:, 9]
    for t in range(rows.shape[0]):
        if ids[t] < 0:
            continue
        k = t // meshpack.TRIS_PER_CHUNK
        corners = np.stack([rows[t, 0:3], rows[t, 3:6], rows[t, 6:9]])
        assert (cbox[k, 0:3] <= corners.min(0) + 1e-5).all()
        assert (cbox[k, 3:6] >= corners.max(0) - 1e-5).all()
    # all real triangle ids present exactly once
    real = np.sort(ids[ids >= 0]).astype(int)
    np.testing.assert_array_equal(real, np.arange(n))


def test_pack_from_plan_traced_geometry():
    """Training moves vertices inside jit; the repack must trace."""
    v0, v1, v2 = _ico(1)
    plan = meshpack.make_plan(v0, v1, v2)
    ids = np.arange(v0.shape[0])

    @jax.jit
    def repack(shift):
        pack = meshpack.pack_from_plan(plan, jnp.asarray(v0) + shift,
                                       jnp.asarray(v1) + shift,
                                       jnp.asarray(v2) + shift, ids)
        return pack.node_bbox, pack.chunk_bbox

    nb1, _ = repack(0.0)
    nb2, _ = repack(5.0)
    # boxes follow the geometry
    np.testing.assert_allclose(np.asarray(nb2[0, 0:3]),
                               np.asarray(nb1[0, 0:3]) + 5.0, atol=1e-4)


def test_empty_padding_boxes_are_far():
    v0, v1, v2 = _ico(2)  # 320 tris -> 3 real chunks, padded to 4+
    plan = meshpack.make_plan(v0, v1, v2)
    pack = meshpack.pack_from_plan(plan, v0, v1, v2,
                                   np.arange(v0.shape[0]))
    cbox = np.asarray(pack.chunk_bbox)
    n_real = -(-v0.shape[0] // meshpack.TRIS_PER_CHUNK)
    if cbox.shape[0] > n_real:
        assert (cbox[n_real:, 0:3] >= meshpack.BIG / 2).all()
        assert (cbox[n_real:, 3:6] >= meshpack.BIG / 2).all()


def test_streamed_tris_bitexact():
    """stream_tris=True (tri_rows in HBM, per-chunk DMA into VMEM
    scratch — megakernel._make_accessors) changes only the residency of
    the triangle array: radiance is bit-identical to the VMEM-resident
    layout, for both the in-kernel bounce loop and the wavefront path."""
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    scene, _ = scene_from_dict(presets.mesh_scene(64, 32, subdivisions=2))
    static = pt.SceneStatic.from_scene(scene, mesh_min=64)
    assert static.mesh_parts
    base = np.asarray(pt.render_sample(scene, 64, 32, 1, max_depth=3,
                                       static=static, stream_tris=False))
    assert np.isfinite(base).all() and base.max() > 0
    got = np.asarray(pt.render_sample(
        scene, 64, 32, 1, max_depth=3, static=static, stream_tris=True))
    np.testing.assert_array_equal(got, base)
    # the wavefront pair kernel is a different XLA program in interpret
    # mode, so fusion may differ by a few ulp there (Mosaic-compiled
    # TPU runs are bit-exact; see test_wavefront_matches_megakernel_*)
    got_wf = np.asarray(pt.render_sample(
        scene, 64, 32, 1, max_depth=3, static=static, stream_tris=True,
        wavefront=True))
    ulp = np.abs(base.view(np.int32) - got_wf.view(np.int32))
    assert ulp.max() <= 4, ulp.max()


def test_streamed_gradients_match_resident():
    """The taped guided replay is oblivious to tri_rows residency:
    gradients through the streamed forward equal the resident ones."""
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    w, h = 32, 16
    scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=1))
    static = pt.SceneStatic.from_scene(scene, mesh_min=16)
    assert static.mesh_parts
    plans = tuple(meshpack.plan_scene_mesh(scene, part)
                  for part in static.mesh_parts)

    def loss(d1, stream):
        s = scene._replace(
            primitives=scene.primitives._replace(data1=d1))
        return jnp.sum(pt.render_sample(
            s, w, h, 1, max_depth=2, static=static, mesh_plans=plans,
            tile_m=2, stream_tris=stream) ** 2)

    d1 = jnp.asarray(scene.primitives.data1)
    g_res = np.asarray(jax.grad(lambda a: loss(a, False))(d1))
    g_str = np.asarray(jax.grad(lambda a: loss(a, True))(d1))
    assert np.isfinite(g_str).all() and np.abs(g_res).max() > 0
    np.testing.assert_array_equal(g_str, g_res)


@pytest.mark.slow
def test_streaming_scales_to_config5_mesh():
    """North-star scale (BASELINE.json config 5, ~1.3M tris): tri_rows
    (~80 MiB — past any whole-array VMEM residency) auto-streams from
    HBM (megakernel.should_stream_tris) and a forward render completes
    in interpret mode. Reference analogue at scale:
    /root/reference/src/shaders/ComputeShader.wgsl:503-518."""
    from computeraytracer_tpu.kernels import megakernel as mk
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    scene, _ = scene_from_dict(presets.mesh_scene(64, 32, subdivisions=8))
    assert int(scene.primitives.category.shape[0]) > 1_300_000
    static = pt.SceneStatic.from_scene(scene)
    assert mk.should_stream_tris(static)
    packs = pt.mesh_packs_for(scene, static)
    assert packs[0].tri_rows.size * 4 > 64 * 2**20
    img = np.asarray(pt.render_sample(scene, 64, 32, 1, max_depth=1,
                                      static=static, mesh_packs=packs,
                                      tile_m=8))
    assert np.isfinite(img).all() and img.max() > 0
