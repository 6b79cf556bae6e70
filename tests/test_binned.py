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
