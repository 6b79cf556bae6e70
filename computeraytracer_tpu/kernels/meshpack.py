"""Host-side mesh packing for the Pallas megakernel's chunked mesh scan.

TPU rationale: per-ray BVH traversal is gather-bound — the worst shape
for a VPU (measured ~0.002 Mpaths/s through XLA gathers on an 80K-tri
scene). The megakernel instead scans Morton-ordered triangle CHUNKS:
each chunk is 128 spatially-coherent triangles with one AABB; a bounce
tests the chunk box against the whole ray tile (vector ops + one scalar
any()) and `lax.cond`-skips the 128 triangle tests when no ray can hit
it. All memory access is sequential rows — zero gathers; culling does
the O(log) work a BVH would, at chunk granularity.

Packed layout (VMEM-friendly: lanes fully used, no (N, 12)->(N, 128)
padding blowup):
  tri_rows  (n_rows, 128) f32 — each row holds 8 triangles x 16 lanes:
            [p0.xyz, e1.xyz, e2.xyz, prim_id, 6 pad]; 16 rows = 1 chunk.
  chunk_bbox (n_chunks, 8) f32 — [lo.xyz, hi.xyz, pad, pad].
Padding triangles have id = -1 and zero geometry (Moller-Trumbore
rejects them by det == 0; id -1 never matches).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

TRIS_PER_ROW = 8
LANES_PER_TRI = 16
ROWS_PER_CHUNK = 16
TRIS_PER_CHUNK = TRIS_PER_ROW * ROWS_PER_CHUNK  # 128


class MeshPack(NamedTuple):
    tri_rows: np.ndarray    # (n_rows, 128) f32
    chunk_bbox: np.ndarray  # (n_chunks, 8) f32

    @property
    def n_chunks(self) -> int:
        return self.chunk_bbox.shape[0]


def _morton3(q: np.ndarray) -> np.ndarray:
    """Interleave 10-bit x/y/z -> 30-bit Morton codes. q: (N, 3) uint32."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v
    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def pack_mesh(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
              prim_ids: np.ndarray) -> MeshPack:
    """Sort by centroid Morton code, pack rows of 8 tris, chunk AABBs."""
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    prim_ids = np.asarray(prim_ids, np.int64)
    n = p0.shape[0]

    cent = p0 + (e1 + e2) / 3.0
    lo, hi = cent.min(0), cent.max(0)
    ext = np.maximum(hi - lo, 1e-12)
    q = np.minimum(((cent - lo) / ext) * 1023.0, 1023.0).astype(np.uint32)
    order = np.argsort(_morton3(q), kind="stable")

    n_chunks = max(1, -(-n // TRIS_PER_CHUNK))
    n_pad = n_chunks * TRIS_PER_CHUNK

    def padded(a, fill=0.0):
        out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
        out[:n] = a[order]
        return out

    p0s, e1s, e2s = padded(p0), padded(e1), padded(e2)
    ids = np.full(n_pad, -1.0, np.float32)
    ids[:n] = prim_ids[order].astype(np.float32)

    # triangle AABBs -> chunk AABBs (padding tris are zero-size at origin;
    # exclude them from the box by masking with +-inf)
    corners = np.stack([p0s, p0s + e1s, p0s + e2s], axis=1)
    t_lo = corners.min(1)
    t_hi = corners.max(1)
    valid = (ids >= 0)[:, None]
    t_lo = np.where(valid, t_lo, np.inf)
    t_hi = np.where(valid, t_hi, -np.inf)
    c_lo = t_lo.reshape(n_chunks, TRIS_PER_CHUNK, 3).min(1)
    c_hi = t_hi.reshape(n_chunks, TRIS_PER_CHUNK, 3).max(1)
    chunk_bbox = np.zeros((n_chunks, 8), np.float32)
    chunk_bbox[:, 0:3] = c_lo
    chunk_bbox[:, 3:6] = c_hi

    # rows of 8 tris x 16 lanes
    n_rows = n_pad // TRIS_PER_ROW
    comp = np.zeros((n_pad, LANES_PER_TRI), np.float32)
    comp[:, 0:3] = p0s
    comp[:, 3:6] = e1s
    comp[:, 6:9] = e2s
    comp[:, 9] = ids
    tri_rows = comp.reshape(n_rows, TRIS_PER_ROW * LANES_PER_TRI)
    return MeshPack(tri_rows=tri_rows, chunk_bbox=chunk_bbox)


def pack_scene_mesh(scene, part) -> MeshPack:
    """Pack one SceneStatic mesh part (rows [start, start+count))."""
    p = scene.primitives
    s, c = part.start, part.count
    d1 = np.asarray(p.data1)[s:s + c]
    d2 = np.asarray(p.data2)[s:s + c]
    d3 = np.asarray(p.data3)[s:s + c]
    return pack_mesh(d1, d2, d3, np.arange(s, s + c))
