"""Host-side mesh packing for the Pallas megakernel's chunked mesh scan.

TPU rationale: per-ray BVH traversal is gather-bound — the worst shape
for a VPU (measured ~0.002 Mpaths/s through XLA gathers on an 80K-tri
scene). The megakernel instead scans Morton-ordered triangle CHUNKS:
each chunk is 128 spatially-coherent triangles with one AABB; a bounce
tests the chunk box against the whole ray tile (vector ops + one scalar
any()) and skips the 128 triangle tests when no ray can hit it.

New in round 2: a **complete binary BVH over the chunks** (the
"stackless BVH traversal with flattened node arrays" of the north star,
replacing the reference's linear scan at ComputeShader.wgsl:503-518 at
scale). Chunks stay in Morton order, so every BVH node covers a
CONTIGUOUS run of chunks — reads stay gather-free. The tree is complete
(chunk-groups padded to a power of two), which makes its STRUCTURE
(DFS order, skip links, leaf ranges) a pure function of the chunk
count: structure is computed once on the host, while every BOX is a
cheap jnp reduction pyramid over the chunk AABBs — so geometry updates
during gradient-based vertex optimization re-pack entirely inside jit
(`pack_from_plan`), keeping boxes valid as vertices move. Only culling
QUALITY decays if vertices drift far from the initial Morton order;
call `make_plan` again to re-sort.

Kernel-side traversal (kernels/megakernel.py:_scan_mesh_part) walks the
DFS array with a skip-link while_loop: tile-hit inner node -> descend
(+1); miss or leaf -> jump to `skip`. Leaves hold LEAF_CHUNKS chunks,
each re-tested against its own (tighter) box before the 128-triangle
scan.

Packed layout (VMEM-friendly: lanes fully used):
  tri_rows  (n_rows, 128) f32 — each row holds 8 triangles x 16 lanes:
            [v0.xyz, v1.xyz, v2.xyz, prim_id, unit-normal.xyz, 3 pad];
            16 rows = 1 chunk.
            Vertices (not edges): the watertight triangle test needs
            shared-edge endpoints bitwise identical across triangles.
  chunk_bbox (n_chunks_padded, 8) f32 — [lo.xyz, hi.xyz, pad, pad].
  node_bbox  (n_nodes, 8) f32 — DFS order, [lo.xyz, hi.xyz, pad, pad].
  node_meta  (n_nodes, 8) i32 — DFS order, [skip, chunk_start, is_leaf,
             5 pad]. Leaves cover chunks [chunk_start,
             chunk_start + LEAF_CHUNKS).
Padding triangles have id = -1 and zero geometry (the degenerate
normal makes the plane test grazing-reject them; id -1 never matches). Fully-empty padded
chunks/nodes get a degenerate far-away box (lo == hi == BIG) that every
slab test misses without NaNs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

TRIS_PER_ROW = 8
LANES_PER_TRI = 16
ROWS_PER_CHUNK = 16
TRIS_PER_CHUNK = TRIS_PER_ROW * ROWS_PER_CHUNK  # 128
LEAF_CHUNKS = 4          # chunks per BVH leaf (512 triangles)
BIG = np.float32(3e37)   # degenerate empty-box coordinate (see header)


class MeshPlan(NamedTuple):
    """Static (host-side) packing plan: Morton order + tree structure.

    Everything here is a function of the INITIAL geometry only; the
    boxes themselves are recomputed from live geometry by
    `pack_from_plan` (pure jnp, jit-safe)."""

    order: np.ndarray        # (N,) Morton sort permutation of triangles
    n: int                   # real triangle count
    n_chunks: int            # padded chunk count = n_groups * LEAF_CHUNKS
    n_groups: int            # leaf groups (power of two)
    perm: np.ndarray         # (n_nodes,) level-stacked index per DFS slot
    meta: np.ndarray         # (n_nodes, 8) i32 [skip, chunk_start, leaf]

    @property
    def n_nodes(self) -> int:
        return self.meta.shape[0]


class MeshPack(NamedTuple):
    tri_rows: jnp.ndarray    # (n_rows, 128) f32
    chunk_bbox: jnp.ndarray  # (n_chunks, 8) f32
    node_bbox: jnp.ndarray   # (n_nodes, 8) f32  (DFS order)
    node_meta: jnp.ndarray   # (n_nodes, 8) i32  (DFS order)

    @property
    def n_chunks(self) -> int:
        return self.chunk_bbox.shape[0]

    @property
    def arrays(self):
        return (self.tri_rows, self.chunk_bbox, self.node_bbox,
                self.node_meta)


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


def _dfs_structure(n_groups: int) -> tuple[np.ndarray, np.ndarray]:
    """DFS preorder of the complete binary tree over n_groups leaves.

    Returns (perm, meta): perm[d] = level-stacked index ((2^k - 1) + j)
    of the node at DFS slot d; meta[d] = [skip, chunk_start, is_leaf,
    0...]. skip = DFS index just past the node's subtree (the stackless
    traversal jumps there on a miss or after a leaf)."""
    depth = int(n_groups).bit_length() - 1  # n_groups = 2^depth
    n_nodes = 2 * n_groups - 1
    perm = np.zeros(n_nodes, np.int64)
    meta = np.zeros((n_nodes, 8), np.int32)
    stack = [(0, 0)]  # (level, j)
    d = 0
    while stack:
        k, j = stack.pop()
        leaves_below = n_groups >> k
        subtree = 2 * leaves_below - 1
        perm[d] = (1 << k) - 1 + j
        is_leaf = k == depth
        meta[d, 0] = d + subtree                       # skip
        meta[d, 1] = j * leaves_below * LEAF_CHUNKS    # chunk_start
        meta[d, 2] = 1 if is_leaf else 0
        if not is_leaf:
            # preorder: left child next -> push right first
            stack.append((k + 1, 2 * j + 1))
            stack.append((k + 1, 2 * j))
        d += 1
    return perm, meta


def make_plan(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> MeshPlan:
    """Morton-sort triangle centroids and lay out the chunk BVH."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    n = v0.shape[0]

    cent = (v0 + v1 + v2) / 3.0
    lo, hi = cent.min(0), cent.max(0)
    ext = np.maximum(hi - lo, 1e-12)
    q = np.minimum(((cent - lo) / ext) * 1023.0, 1023.0).astype(np.uint32)
    order = np.argsort(_morton3(q), kind="stable")

    n_chunks_real = max(1, -(-n // TRIS_PER_CHUNK))
    n_groups = 1
    while n_groups * LEAF_CHUNKS < n_chunks_real:
        n_groups *= 2
    n_chunks = n_groups * LEAF_CHUNKS
    perm, meta = _dfs_structure(n_groups)
    return MeshPlan(order=order, n=n, n_chunks=n_chunks,
                    n_groups=n_groups, perm=perm, meta=meta)


def pack_from_plan(plan: MeshPlan, v0, v1, v2, prim_ids) -> MeshPack:
    """Pack live geometry under a fixed plan. Pure jnp: runs inside jit,
    so training steps that move vertices re-derive valid boxes for free.
    Gradients do not flow through the pack (the kernel treats geometry
    as a replayable constant; cotangents come from the taped replay in
    tracer/replay.py)."""
    n, n_chunks = plan.n, plan.n_chunks
    n_pad = n_chunks * TRIS_PER_CHUNK
    order = jnp.asarray(plan.order)

    def padded(a):
        a = jnp.asarray(a, jnp.float32)[order]
        return jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(a)

    v0s, v1s, v2s = padded(v0), padded(v1), padded(v2)
    ids = jnp.full((n_pad,), -1.0, jnp.float32).at[:n].set(
        jnp.asarray(prim_ids)[order].astype(jnp.float32))

    # rows of 8 tris x 16 lanes. Only REAL chunks get triangle storage:
    # fully-padded chunks sit behind far-away boxes the traversal never
    # enters, so their rows would never be read — the tree structure is
    # padded to a power of two, the triangle array is not.
    n_real_chunks = max(1, -(-n // TRIS_PER_CHUNK))
    n_real = n_real_chunks * TRIS_PER_CHUNK
    comp = jnp.zeros((n_real, LANES_PER_TRI), jnp.float32)
    comp = comp.at[:, 0:3].set(v0s[:n_real])
    comp = comp.at[:, 3:6].set(v1s[:n_real])
    comp = comp.at[:, 6:9].set(v2s[:n_real])
    comp = comp.at[:, 9].set(ids[:n_real])
    # lanes 10-12: unit normal, precomputed with the kernels' exact
    # formula (cross(e1, e2) * rsqrt(max(|.|^2, 1e-30))) — removes the
    # cross + rsqrt + normalize (~25 of ~120 VPU ops per triangle test)
    # from every in-kernel scan; padding rows keep n == 0, whose
    # degenerate plane test grazing-rejects as before
    e1p = v1s[:n_real] - v0s[:n_real]
    e2p = v2s[:n_real] - v0s[:n_real]
    n_raw = jnp.cross(e1p, e2p)
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(n_raw * n_raw, -1),
                                         1e-30))
    comp = comp.at[:, 10:13].set(n_raw * inv_len[:, None])
    tri_rows = comp.reshape(n_real // TRIS_PER_ROW,
                            TRIS_PER_ROW * LANES_PER_TRI)

    # triangle AABBs -> chunk AABBs; padding tris excluded via +-inf,
    # fully-empty chunks collapsed to the degenerate far box
    corners = jnp.stack([v0s, v1s, v2s], axis=1)
    valid = (ids >= 0)[:, None]
    t_lo = jnp.where(valid, corners.min(1), jnp.inf)
    t_hi = jnp.where(valid, corners.max(1), -jnp.inf)
    c_lo = t_lo.reshape(n_chunks, TRIS_PER_CHUNK, 3).min(1)
    c_hi = t_hi.reshape(n_chunks, TRIS_PER_CHUNK, 3).max(1)
    empty = ~jnp.isfinite(c_lo[:, :1])
    c_lo = jnp.where(empty, BIG, c_lo)
    c_hi = jnp.where(empty, BIG, c_hi)
    chunk_bbox = jnp.zeros((n_chunks, 8), jnp.float32)
    chunk_bbox = chunk_bbox.at[:, 0:3].set(c_lo).at[:, 3:6].set(c_hi)

    # node boxes: reduction pyramid over chunk boxes, root level first.
    # Fully-empty subtrees keep lo == hi == BIG (always missed); a node
    # with one empty half inherits hi == BIG — conservatively huge but
    # harmless, and only O(log n) such nodes exist on the padding edge.
    lvl_lo = [c_lo.reshape(plan.n_groups, LEAF_CHUNKS, 3).min(1)]
    lvl_hi = [c_hi.reshape(plan.n_groups, LEAF_CHUNKS, 3).max(1)]
    while lvl_lo[0].shape[0] > 1:
        lvl_lo.insert(0, lvl_lo[0].reshape(-1, 2, 3).min(1))
        lvl_hi.insert(0, lvl_hi[0].reshape(-1, 2, 3).max(1))
    all_lo = jnp.concatenate(lvl_lo, axis=0)
    all_hi = jnp.concatenate(lvl_hi, axis=0)
    perm = jnp.asarray(plan.perm)
    node_bbox = jnp.zeros((plan.n_nodes, 8), jnp.float32)
    node_bbox = node_bbox.at[:, 0:3].set(all_lo[perm])
    node_bbox = node_bbox.at[:, 3:6].set(all_hi[perm])
    node_meta = jnp.asarray(plan.meta)
    return MeshPack(tri_rows=tri_rows, chunk_bbox=chunk_bbox,
                    node_bbox=node_bbox, node_meta=node_meta)


def pack_mesh(v0, v1, v2, prim_ids) -> MeshPack:
    """One-shot pack (plan + pack) for concrete geometry."""
    plan = make_plan(np.asarray(v0), np.asarray(v1), np.asarray(v2))
    return pack_from_plan(plan, v0, v1, v2, prim_ids)


def plan_scene_mesh(scene, part) -> MeshPlan:
    p = scene.primitives
    s, c = part.start, part.count
    return make_plan(np.asarray(p.data1)[s:s + c],
                     np.asarray(p.data2)[s:s + c],
                     np.asarray(p.data3)[s:s + c])


def pack_scene_mesh(scene, part, plan: MeshPlan | None = None) -> MeshPack:
    """Pack one SceneStatic mesh part (rows [start, start+count))."""
    p = scene.primitives
    s, c = part.start, part.count
    if plan is None:
        plan = plan_scene_mesh(scene, part)
    return pack_from_plan(plan, jnp.asarray(p.data1)[s:s + c],
                          jnp.asarray(p.data2)[s:s + c],
                          jnp.asarray(p.data3)[s:s + c],
                          np.arange(s, s + c))
