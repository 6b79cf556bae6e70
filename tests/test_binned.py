"""Binned mesh intersection: candidate-pass implementations agree.

The VMEM candidate kernel (kernels/binned.py
build_candidate_kernel / candidate_chunks_pallas) replaces the dense
XLA (C, R) pass on the hot path; this pins the contract between them:
identical candidate SETS (slot order may differ only among equal-entry
ties, which the id tie-break also pins) and bitwise-identical t_next —
the quantity the resolution proof depends on.
"""

import numpy as np
import jax
import jax.numpy as jnp

from computeraytracer_tpu.kernels import binned, meshpack
from computeraytracer_tpu.scene import mesh as mesh_ops


def _setup():
    verts, faces = mesh_ops.displaced_blob(4)  # 5120 tris, 64 chunks
    pack = meshpack.pack_mesh(verts[faces[:, 0]], verts[faces[:, 1]],
                              verts[faces[:, 2]], np.arange(len(faces)))
    rng = np.random.default_rng(0)
    R = 2048
    o = tuple(jnp.asarray(rng.uniform(-2, 2, R), jnp.float32)
              for _ in range(3))
    dn = rng.normal(size=(R, 3))
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = tuple(jnp.asarray(dn[:, c], jnp.float32) for c in range(3))
    tb = jnp.asarray(rng.uniform(0.5, 10, R), jnp.float32)
    act = jnp.asarray(rng.uniform(size=R) < 0.8)
    return pack, o, d, tb, act, R


def test_candidate_kernel_matches_xla_pass():
    pack, o, d, tb, act, R = _setup()
    for k in (4, 8, 16):
        c1, t1 = binned.candidate_chunks(pack.chunk_bbox, o, d, tb, k=k)
        c1 = jnp.where(act[:, None], c1, -1)
        c2, t2 = binned.candidate_chunks_pallas(
            pack.chunk_bbox, o, d, tb, k=k, active=act, interpret=True)
        a1, a2 = np.asarray(c1), np.asarray(c2)
        nact = np.asarray(act)
        for i in range(R):
            if not nact[i]:
                # kernel encoding: inactive lanes carry no candidates
                assert (a2[i] < 0).all()
                continue
            assert (set(a1[i][a1[i] >= 0].tolist())
                    == set(a2[i][a2[i] >= 0].tolist())), (k, i)
        t1n, t2n = np.asarray(t1), np.asarray(t2)
        both = nact & np.isfinite(t1n) & np.isfinite(t2n)
        assert (nact & (np.isfinite(t1n) != np.isfinite(t2n))).sum() == 0
        assert (t1n[both] == t2n[both]).all()


def test_candidate_kernel_unpadded_chunk_count():
    """C not a multiple of SUP_CHUNKS pads with degenerate far boxes
    that must never become candidates."""
    pack, o, d, tb, act, R = _setup()
    C = 40  # not a multiple of 16
    boxes = pack.chunk_bbox[:C]
    c1, t1 = binned.candidate_chunks(boxes, o, d, tb, k=6)
    c2, t2 = binned.candidate_chunks_pallas(boxes, o, d, tb, k=6,
                                            interpret=True)
    a1, a2 = np.asarray(c1), np.asarray(c2)
    assert a2.max() < C
    for i in range(R):
        assert (set(a1[i][a1[i] >= 0].tolist())
                == set(a2[i][a2[i] >= 0].tolist())), i
    t1n, t2n = np.asarray(t1), np.asarray(t2)
    both = np.isfinite(t1n) & np.isfinite(t2n)
    assert (np.isfinite(t1n) == np.isfinite(t2n)).all()
    assert (t1n[both] == t2n[both]).all()


def test_batched_cast_matches_plain():
    """mesh_closest_hit_batched (live-compacted while-loop batches) is
    bit-identical to the plain active-masked path at every live
    fraction: per-lane pipeline quantities are batch-composition-
    independent and the un-permute is a sort on ray id."""
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    scene, _ = scene_from_dict(presets.mesh_scene(16, 16, subdivisions=2))
    static = pt.SceneStatic.from_scene(scene, mesh_min=64)
    assert static.mesh_parts
    packs = pt.mesh_packs_for(scene, static)
    mesh_arrays = tuple(jnp.asarray(a) for p in packs for a in p.arrays)
    rng_ = np.random.default_rng(1)
    R = 4096  # 4 batches of 1024
    # origins in a shell around the mesh bbox, directions at random
    # points inside it: a healthy fraction of rays actually hit
    bb = np.asarray(packs[0].chunk_bbox)
    real = np.abs(bb[:, 0:6]).max(1) < 1e6  # drop meshpack.BIG padding
    bb = bb[real]
    lo, hi = bb[:, 0:3].min(0), bb[:, 3:6].max(0)
    ctr, ext = (lo + hi) / 2, (hi - lo)
    on = ctr + rng_.uniform(-1.5, 1.5, (R, 3)) * ext
    tgt = ctr + rng_.uniform(-0.5, 0.5, (R, 3)) * ext
    dn = tgt - on
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    o = tuple(jnp.asarray(on[:, c], jnp.float32) for c in range(3))
    d = tuple(jnp.asarray(dn[:, c], jnp.float32) for c in range(3))
    ex = jnp.full((R,), -1, jnp.int32)
    tb = jnp.asarray(rng_.uniform(1.0, 1e4, R), jnp.float32)
    for frac in (0.03, 0.5, 1.0):
        act = jnp.asarray(rng_.uniform(size=R) < frac)
        t1, i1, n1 = binned.mesh_closest_hit(
            static, mesh_arrays, o, d, ex, t_bound=tb, interpret=True,
            active=act)
        t2, i2, n2 = binned.mesh_closest_hit_batched(
            static, mesh_arrays, o, d, ex, t_bound=tb, interpret=True,
            active=act, batch=1024)
        assert (np.asarray(i1) == np.asarray(i2)).all(), frac
        assert (np.asarray(t1) == np.asarray(t2)).all(), frac
        for c in range(3):
            assert (np.asarray(n1[c]) == np.asarray(n2[c])).all(), frac
        # some rays of every population actually hit the mesh
        if frac >= 0.5:
            assert (np.asarray(i1) >= 0).any()
        # threshold dispatch: sparse populations batch, dense ones take
        # the plain branch — either way identical to the reference
        t3, i3, _ = binned.mesh_closest_hit_batched(
            static, mesh_arrays, o, d, ex, t_bound=tb, interpret=True,
            active=act, batch=1024, threshold=R // 4)
        assert (np.asarray(i1) == np.asarray(i3)).all(), frac
        assert (np.asarray(t1) == np.asarray(t3)).all(), frac


def test_occlusion_matches_closest_hit_derived():
    """mesh_occluded (any-hit pipeline) == the boolean the closest-hit
    pipeline derives as (idx >= 0) & (t <= t_su), at every live
    fraction and through the batched wrapper — the untaped wavefront's
    shadow casts depend on this equivalence."""
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    scene, _ = scene_from_dict(presets.mesh_scene(16, 16, subdivisions=2))
    static = pt.SceneStatic.from_scene(scene, mesh_min=64)
    packs = pt.mesh_packs_for(scene, static)
    mesh_arrays = tuple(jnp.asarray(a) for p in packs for a in p.arrays)
    rng_ = np.random.default_rng(3)
    R = 4096
    bb = np.asarray(packs[0].chunk_bbox)
    bb = bb[np.abs(bb[:, 0:6]).max(1) < 1e6]
    lo, hi = bb[:, 0:3].min(0), bb[:, 3:6].max(0)
    ctr, ext = (lo + hi) / 2, (hi - lo)
    on = ctr + rng_.uniform(-1.5, 1.5, (R, 3)) * ext
    tgt = ctr + rng_.uniform(-0.5, 0.5, (R, 3)) * ext
    dn = tgt - on
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    o = tuple(jnp.asarray(on[:, c], jnp.float32) for c in range(3))
    d = tuple(jnp.asarray(dn[:, c], jnp.float32) for c in range(3))
    ex = jnp.full((R,), -1, jnp.int32)
    # light distances straddling the mesh: both outcomes well populated
    tsu = jnp.asarray(rng_.uniform(0.5, 3.0, R) * float(ext.max()),
                      jnp.float32)
    for frac in (0.04, 1.0):
        act = jnp.asarray(rng_.uniform(size=R) < frac)
        t1, i1, _ = binned.mesh_closest_hit(
            static, mesh_arrays, o, d, ex, t_bound=tsu, interpret=True,
            active=act)
        want = np.asarray((i1 >= 0) & (t1 <= tsu))
        got = np.asarray(binned.mesh_occluded(
            static, mesh_arrays, o, d, ex, tsu, interpret=True,
            active=act))
        assert (got == want).all(), (frac, int((got != want).sum()))
        got_b = np.asarray(binned.mesh_occluded_batched(
            static, mesh_arrays, o, d, ex, tsu, interpret=True,
            active=act, batch=1024, threshold=R // 4))
        assert (got_b == want).all(), frac
        if frac == 1.0:
            assert want.any() and not want.all()
