"""Binned mesh intersection: the TPU shape of incoherent ray casts.

Why this exists. The megakernel's chunk-BVH culls at RAY-TILE
granularity: a (8, 128)-lane tile enters a box when ANY of its 1024
rays can hit it. That is near-optimal for camera rays (measured 19 of
640 chunks per tile at 256^2) but collapses after one diffuse bounce:
sorted post-bounce tiles still enter ~92 chunks/tile while the rays
individually average ~2 (measured, benchmarks/mesh_diag.py heritage) —
a ~50x overshoot that made mesh bounces ~450 ms each on v5e. Per-ray
BVH traversal is no answer on TPU (per-lane gathers, ~0.002 Mpaths/s
through XLA). The TPU answer is to make the irregular traversal DENSE:

  1. candidate pass (XLA): slab-test every ray against every chunk
     AABB as pure planar vector math, blocked over chunks, keeping
     each ray's K nearest candidate chunks by entry distance, culled
     by the unrolled-scene occlusion bound (walls/patches: a chunk
     entered behind the bound can never win). Selection is K rounds
     of masked argmin (jax.lax.top_k measured ~350 ms for this
     problem size on v5e).
  2. pair pass (Pallas): (ray, candidate-slot) pairs argsorted by
     CHUNK id, so a (8, 128) pair tile spans 1-2 distinct chunks and
     every 128-triangle scan serves ~all 1024 lanes, independent of
     ray coherence. The kernel repeatedly scans the smallest
     unprocessed chunk id in the tile.
  3. reduce (XLA): fold each ray's K slots with the kernel's exact
     tie rule -> per-ray closest mesh hit.

Soundness. A ray with more than K candidate chunks is "unresolved"
unless its found hit provably precedes every omitted chunk
(t_hit <= t_enter of the first omitted candidate). Unresolved rays
(<1% measured) are COMPACTED and finished by the exact tree-walk
kernel (megakernel._scan_mesh_part) seeded with the binned winner;
an overflow of the compaction budget falls back to the seeded walk
over every tile (sound, never observed). Every triangle test reuses
ops/intersect.py's watertight formulas with the same op order as the
in-kernel scan, so winners (t, id, normal) are bit-identical and the
taped-replay backward (tracer/replay.py) is oblivious to which path
produced the tape.

Reference analogue: the per-ray `intersect` linear scan of
/root/reference/src/shaders/ComputeShader.wgsl:503-518, restructured
as sort + dense batches for a machine with no divergence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from computeraytracer_tpu.kernels import megakernel as mk
from computeraytracer_tpu.kernels import meshpack

LANES = mk.LANES
T_MIN = mk.T_MIN
# Candidate chunks per ray (slots; padded with -1). r5: 16 -> 6 — every
# pair-pipeline cost (both lax.sorts, the pair-kernel grid, the (R, k)
# reduce) scales with R*k, and the mean REAL candidate count is ~1.7-2.6
# (camera/bounce, measured in STAGED_r05.json). Rays with more
# candidates (bounce-population tail: ~2.0% at k=8, ~4.7% at k=6,
# ~0.1% at k=16) fall to the sorted tiered compacted walk, which costs
# its budget, not k. Measured end-to-end at 1024^2 82K tris depth 3:
# k=6 0.387 Mpaths/s vs k=8 0.338 (the sorts dominate the cast).
DEFAULT_K = 6
CAND_BLOCK = 1024     # chunks slab-tested per top-K merge round
PAIR_TILE_M = 8       # (8, 128) = 1024 pairs per pair-kernel grid step


def _slab_t_enter(cbox_blk, o, d, t_bound):
    """Entry distance of each ray into each chunk AABB, +inf on miss.

    cbox_blk (B, 8) f32 [lo.xyz, hi.xyz, pad, pad]; o, d are COMPONENT
    TUPLES of (R,) f32 (planar layout: a stacked (R, 3) here would pad
    its 3-wide minor dim to 128 TPU lanes and make every (R, B, 3)
    intermediate ~42x larger than the (R, B) output); t_bound (R,).
    Mirrors megakernel._scan_mesh_part.slab_any per-lane (same Ize-2013
    4-ulp interval padding, same degenerate-box and axis-parallel
    handling, and min/max are exact so the per-component loop matches
    the old axis reduction bit-for-bit) so the candidate set is a
    superset of every chunk the in-kernel walk would scan for that ray.
    Returns (B, R) — CHUNK-MAJOR: the selection rounds reduce along the
    chunk axis, and a major-axis reduce on TPU is a sequential sweep of
    full (8, 128) vector rows, vs the lane-rotation ladder (and per-row
    masking writes) a minor-axis reduce costs. Measured ~4x on the
    whole candidate pass.
    """
    R = o[0].shape[0]
    B = cbox_blk.shape[0]
    t_enter = jnp.full((B, R), -jnp.inf, jnp.float32)
    t_exit = jnp.full((B, R), jnp.inf, jnp.float32)
    for c in range(3):
        tiny = jnp.abs(d[c]) < 1e-12
        sign = jnp.where(d[c] < 0.0, -1.0, 1.0)
        inv = jnp.where(tiny, sign * jnp.float32(1e30),
                        1.0 / jnp.where(tiny, 1.0, d[c]))      # (R,)
        t0 = (cbox_blk[:, c][:, None] - o[c][None, :]) * inv[None, :]
        t1 = (cbox_blk[:, 3 + c][:, None] - o[c][None, :]) * inv[None, :]
        t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
        t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
    pad = jnp.float32(4 * 2.0 ** -23)
    t_exit = t_exit + jnp.abs(t_exit) * pad
    t_enter_p = t_enter - jnp.abs(t_enter) * pad
    ok = ((t_enter_p <= t_exit) & (t_exit >= T_MIN)
          & (t_enter_p <= t_bound[None, :]) & (t_enter_p < jnp.inf))
    return jnp.where(ok, t_enter_p, jnp.inf)


def candidate_chunks(chunk_bbox, o, d, t_bound=None, k: int | None = None):
    """K nearest candidate chunks per ray, by AABB entry distance.

    chunk_bbox (C, 8) f32; o, d component tuples of (R,) f32 (planar);
    t_bound (R,) optional cull bound (padded by 8 ulp internally so a
    bound from differently-rounded arithmetic can never drop the true
    winner's chunk) — pass the unrolled-scene winner's t here: chunks
    entirely behind the walls produce no candidates at all, which is
    most of a diffuse bounce population in an enclosed scene.

    Selection is k rounds of masked argmin over the dense entry-
    distance matrix — pure VPU reduce/select work (jax.lax.top_k
    measured ~350 ms for a (65K, 529) top-17 on v5e). Blocks over
    chunks (CAND_BLOCK) bound the materialized matrix at config-5 C.

    Returns (cand (R, k) i32 chunk ids with -1 padding — the k smallest
    t_enter, internal order arbitrary; t_next (R,) f32 entry distance
    of the first OMITTED candidate, +inf when every candidate fit).
    A found hit with t <= t_next is provably the global winner, and a
    total miss with t_next == +inf is provably a miss.
    """
    k = DEFAULT_K if k is None else k
    R = o[0].shape[0]
    C = chunk_bbox.shape[0]
    if t_bound is None:
        t_bound = jnp.full((R,), jnp.inf, jnp.float32)
    else:
        t_bound = t_bound + jnp.abs(t_bound) * jnp.float32(8 * 2.0 ** -23)

    def extract_k(te, ids, kk):
        """kk rounds of masked argmin over (B, R): smallest-kk entries.
        Each round is a major-axis min+argmin pair and an iota-compare
        mask that XLA fuses into the next round's sweep — measured
        ~free per round in (B, R) orientation vs 1.7-2.9 ms for the
        (R, B) or scatter forms. Returns (t (R, kk), id (R, kk), te'
        with winners masked out)."""
        outs_t, outs_i = [], []
        rows = jnp.arange(te.shape[0], dtype=jnp.int32)[:, None]
        for _ in range(kk):
            j = jnp.argmin(te, axis=0)                       # (R,)
            tj = jnp.min(te, axis=0)
            ij = jnp.take(ids[:, 0], j)
            outs_t.append(tj)
            outs_i.append(jnp.where(jnp.isfinite(tj), ij, -1))
            te = jnp.where(rows == j[None, :], jnp.inf, te)
        return jnp.stack(outs_t, 1), jnp.stack(outs_i, 1), te

    if C <= CAND_BLOCK:
        te = _slab_t_enter(chunk_bbox, o, d, t_bound)         # (C, R)
        ids = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[:, None], te.shape)
        t_k, i_k, te_rest = extract_k(te, ids, k)
        t_next = jnp.min(te_rest, axis=0)
        return i_k, t_next

    # blocked: maintain the running k best + the best omitted distance
    n_blocks = -(-C // CAND_BLOCK)
    c_pad = n_blocks * CAND_BLOCK
    cbox = jnp.zeros((c_pad, 8), jnp.float32).at[:, 0:6].set(meshpack.BIG)
    cbox = cbox.at[:C].set(chunk_bbox)
    best_t = jnp.full((R, k), jnp.inf, jnp.float32)
    best_c = jnp.full((R, k), -1, jnp.int32)
    t_next = jnp.full((R,), jnp.inf, jnp.float32)

    def merge_k(t_a, i_a, t_b, i_b):
        """Keep the k smallest of two (R, k) candidate lists; returns
        (t (R, k), i (R, k), t_dropped_min (R,)). Small minor-axis
        rounds over width 2k — cheap next to the (B, R) sweeps."""
        t_all = jnp.concatenate([t_a, t_b], axis=1)          # (R, 2k)
        i_all = jnp.concatenate([i_a, i_b], axis=1)
        outs_t, outs_i = [], []
        for _ in range(k):
            j = jnp.argmin(t_all, axis=1)
            outs_t.append(jnp.min(t_all, axis=1))
            outs_i.append(jnp.take_along_axis(i_all, j[:, None],
                                              axis=1)[:, 0])
            t_all = jnp.where(
                jnp.arange(2 * k)[None, :] == j[:, None], jnp.inf, t_all)
        return (jnp.stack(outs_t, 1), jnp.stack(outs_i, 1),
                jnp.min(t_all, axis=1))

    def block(i, carry):
        best_t, best_c, t_next = carry
        blk = jax.lax.dynamic_slice(cbox, (i * CAND_BLOCK, 0),
                                    (CAND_BLOCK, 8))
        te = _slab_t_enter(blk, o, d, t_bound)               # (B, R)
        ids = jnp.broadcast_to(
            (i * CAND_BLOCK
             + jnp.arange(CAND_BLOCK, dtype=jnp.int32))[:, None],
            te.shape)
        t_b, i_b, te_rest = extract_k(te, ids, k)
        best_t, best_c, t_drop = merge_k(best_t, best_c, t_b, i_b)
        t_next = jnp.minimum(t_next, jnp.min(te_rest, axis=0))
        return best_t, best_c, jnp.minimum(t_next, t_drop)

    best_t, best_c, t_next = jax.lax.fori_loop(
        0, n_blocks, block, (best_t, best_c, t_next))
    return best_c, t_next


SUP_CHUNKS = 16       # chunks per supernode in the candidate kernel


@functools.lru_cache(maxsize=32)
def build_candidate_kernel(n_sup: int, k: int, interpret: bool = False,
                           tile_m: int = PAIR_TILE_M):
    """Pallas kernel: k nearest candidate chunks per ray, in VMEM.

    The XLA candidate pass materializes the (C, R) entry-distance
    matrix in HBM and sweeps it k+1 times — ~120 ms/cast at 1024^2
    (r5 XProf). Here the chunk boxes (C x 32 B) and their SUP_CHUNKS-
    chunk supernode boxes live in VMEM; each (8, 128) ray tile walks
    the supernodes with a tile-ANY slab test (identical padded Ize
    formulas, so a skipped supernode provably contains no chunk any
    lane could enter) and runs per-lane k-slot insertion compare-swap
    chains on the chunks of entered supernodes. Only rays in (7
    planes) and candidates out (k+1 planes) touch HBM. Per tile this
    is ~entered_supernodes * SUP_CHUNKS * (slab + k compare-swaps) VPU
    ops — coherent tiles away from the mesh skip ~everything, the
    structural win dense XLA cannot have.

    f(rays7 (7, M, 128) f32 [o.xyz, d.xyz, t_bound], cboxes
      (n_sup*SUP_CHUNKS, 8) f32, sboxes (n_sup, 8) f32)
      -> (cand (k, M, 128) i32 — the k nearest-entry chunk ids, -1
          padded, ascending t_enter; t_next (1, M, 128) f32 — entry
          of the first omitted candidate, +inf if none omitted).

    t_bound is the PRE-PADDED cull bound (the wrapper applies the
    8-ulp pad); lanes with t_bound = -inf produce no candidates and
    t_next = +inf (the "inactive" encoding). Soundness contract
    matches candidate_chunks: the slot set is a superset of every
    chunk whose padded slab interval precedes the bound, and t_next
    is exactly min(t_enter) over the chunks that did not fit.
    """
    shape = (tile_m, LANES)

    def kernel(rays_ref, cbox_ref, sbox_ref, cand_ref, tnext_ref):
        o = tuple(rays_ref[i] for i in range(3))
        d = tuple(rays_ref[3 + i] for i in range(3))
        bound = rays_ref[6]
        pad = jnp.float32(4 * 2.0 ** -23)

        inv_d = []
        for c in range(3):
            tiny = jnp.abs(d[c]) < 1e-12
            sign = jnp.where(d[c] < 0.0, -1.0, 1.0)
            inv_d.append(jnp.where(tiny, sign * jnp.float32(1e30),
                                   1.0 / jnp.where(tiny, 1.0, d[c])))

        def slab(bb):
            """(t_enter_padded, ok) of box bb (1, 8) for all lanes —
            _slab_t_enter's exact arithmetic."""
            t_enter = jnp.full(shape, -jnp.inf, jnp.float32)
            t_exit = jnp.full(shape, jnp.inf, jnp.float32)
            for c in range(3):
                t0 = (bb[0, c] - o[c]) * inv_d[c]
                t1 = (bb[0, 3 + c] - o[c]) * inv_d[c]
                t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
                t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
            t_exit = t_exit + jnp.abs(t_exit) * pad
            t_enter = t_enter - jnp.abs(t_enter) * pad
            ok = ((t_enter <= t_exit) & (t_exit >= T_MIN)
                  & (t_enter <= bound) & (t_enter < jnp.inf))
            return t_enter, ok

        inf = jnp.full(shape, jnp.inf, jnp.float32)
        neg = jnp.full(shape, -1, jnp.int32)
        slots = (inf,) * k + (neg,) * k  # t0..tk-1 asc, i0..ik-1
        t_next = inf

        def chunk_step(ci, carry):
            slots_t = list(carry[:k])
            slots_i = list(carry[k:2 * k])
            t_next = carry[2 * k]
            te, ok = slab(cbox_ref[pl.ds(ci, 1), :])
            t_new = jnp.where(ok, te, jnp.inf)
            i_new = jnp.where(ok, ci, -1)
            for j in range(k):
                # tie-break equal entries by LOWER chunk id: the chain
                # shifts an equal-te pair past each other otherwise and
                # evicts the EARLIER chunk — XLA's k-round argmin keeps
                # the lowest id among boundary ties, and matching it
                # keeps the kept-set identical to the tested XLA pass
                swap = (t_new < slots_t[j]) | (
                    (t_new == slots_t[j]) & (i_new < slots_i[j]))
                slots_t[j], t_new = (jnp.where(swap, t_new, slots_t[j]),
                                     jnp.where(swap, slots_t[j], t_new))
                slots_i[j], i_new = (jnp.where(swap, i_new, slots_i[j]),
                                     jnp.where(swap, slots_i[j], i_new))
            # t_new now holds the evicted (k+1)-th best; once evicted an
            # entry can never re-enter the slots, so the running min over
            # evictions is exactly min t_enter of all omitted candidates
            t_next = jnp.minimum(t_next, t_new)
            return tuple(slots_t) + tuple(slots_i) + (t_next,)

        def sup_step(s, carry):
            _, s_ok = slab(sbox_ref[pl.ds(s, 1), :])

            def do(carry):
                return jax.lax.fori_loop(
                    s * SUP_CHUNKS, (s + 1) * SUP_CHUNKS, chunk_step,
                    carry)

            return jax.lax.cond(jnp.any(s_ok), do, lambda c: c, carry)

        out = jax.lax.fori_loop(0, n_sup, sup_step, slots + (t_next,))
        for j in range(k):
            cand_ref[j] = out[k + j]
        tnext_ref[0] = out[2 * k]

    @jax.jit
    def candidates(rays7, cboxes, sboxes):
        m = rays7.shape[1]
        grid = (m // tile_m,)
        tile = lambda kk: pl.BlockSpec((kk, tile_m, LANES),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile(7),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[tile(k), tile(1)],
            out_shape=[
                jax.ShapeDtypeStruct((k, m, LANES), jnp.int32),
                jax.ShapeDtypeStruct((1, m, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(rays7, cboxes, sboxes)

    return candidates


def candidate_chunks_pallas(chunk_bbox, o, d, t_bound=None,
                            k: int | None = None, active=None,
                            interpret: bool = False):
    """candidate_chunks via the VMEM kernel. Same contract: (cand
    (R, k) i32 nearest-entry chunk ids with -1 padding, t_next (R,))."""
    k = DEFAULT_K if k is None else k
    R = o[0].shape[0]
    C = chunk_bbox.shape[0]
    c_pad = -(-C // SUP_CHUNKS) * SUP_CHUNKS
    cboxes = chunk_bbox
    if c_pad != C:
        fill = jnp.zeros((c_pad - C, 8), jnp.float32)             .at[:, 0:6].set(meshpack.BIG)
        cboxes = jnp.concatenate([chunk_bbox, fill], axis=0)
    sboxes = jnp.zeros((c_pad // SUP_CHUNKS, 8), jnp.float32)
    grp = cboxes.reshape(-1, SUP_CHUNKS, 8)
    sboxes = sboxes.at[:, 0:3].set(grp[:, :, 0:3].min(1))
    sboxes = sboxes.at[:, 3:6].set(grp[:, :, 3:6].max(1))

    if t_bound is None:
        bound = jnp.full((R,), jnp.inf, jnp.float32)
    else:
        bound = t_bound + jnp.abs(t_bound) * jnp.float32(8 * 2.0 ** -23)
    if active is not None:
        bound = jnp.where(active, bound, -jnp.inf)

    tile = PAIR_TILE_M * LANES
    r_pad = -(-R // tile) * tile
    m = r_pad // LANES

    def plane(v, fill):
        if r_pad != R:
            v = jnp.full((r_pad,), fill, v.dtype).at[:R].set(v)
        return v.reshape(m, LANES)

    rays7 = jnp.stack([plane(o[0], 0.0), plane(o[1], 0.0),
                       plane(o[2], 0.0), plane(d[0], 1.0),
                       plane(d[1], 0.0), plane(d[2], 0.0),
                       plane(bound, -jnp.inf)])
    f = build_candidate_kernel(int(c_pad // SUP_CHUNKS), int(k),
                               interpret)
    cand_p, tnext_p = f(rays7, cboxes, sboxes)
    cand = cand_p.reshape(k, r_pad)[:, :R].T          # (R, k)
    t_next = tnext_p.reshape(r_pad)[:R]
    return cand, t_next


@functools.lru_cache(maxsize=32)
def build_pair_kernel(n_rows: int, interpret: bool = False,
                      stream_tris: bool = False,
                      tile_m: int = PAIR_TILE_M):
    """Pallas kernel: closest-hit of each (ray, chunk) pair.

    f(pair_f (7, Mp, 128) f32 [o.xyz, d.xyz, t_bound-unused],
      pair_i (2, Mp, 128) i32 [chunk_id (sorted ascending, -1 dead),
                               exclude],
      tri_rows (n_rows, 128) f32)
      -> (out_f (4, Mp, 128) f32 [t, n.xyz], out_i (1, Mp, 128) i32).

    Per grid step: repeatedly pick the smallest unprocessed chunk id in
    the tile (pairs are chunk-sorted, so usually one per tile), scan its
    128 triangles against all 1024 lanes with per-lane (chunk == c)
    masking, update per-lane winners with the in-kernel tie rule
    ((t < best) | (t == best & id > best_id)). Triangle math is
    megakernel._scan_mesh_part's, op for op — winners bit-match.
    """
    from computeraytracer_tpu.ops import intersect as isect

    shape = (tile_m, LANES)
    rpc = meshpack.ROWS_PER_CHUNK
    BIG_I = 2 ** 30  # "processed / dead" chunk id sentinel (python int:
    #                  a jnp scalar here would be a captured constant)

    def kernel(pf_ref, pi_ref, tri_ref, of_ref, oi_ref, *scratch):
        big_i = jnp.int32(BIG_I)
        o = tuple(pf_ref[i] for i in range(3))
        d = tuple(pf_ref[3 + i] for i in range(3))
        chunk = pi_ref[0]
        exclude = pi_ref[1]
        wt = isect.watertight_setup(o, d)

        t_best = jnp.full(shape, jnp.inf, jnp.float32)
        idx_best = jnp.full(shape, -1, jnp.int32)
        zero = jnp.zeros(shape, jnp.float32)
        nrm = (zero, zero, zero)

        todo = jnp.where(chunk >= 0, chunk, big_i)

        def row_read_for(c):
            if stream_tris:
                tri_scratch, tri_sem = scratch
                dma = pltpu.make_async_copy(
                    tri_ref.at[pl.ds(c * rpc, rpc), :], tri_scratch,
                    tri_sem)
                dma.start()
                dma.wait()
                return lambda rr: tri_scratch[pl.ds(rr, 1), :]
            return lambda rr: tri_ref[pl.ds(c * rpc + rr, 1), :]

        def cond(carry):
            return carry[0] < big_i

        def body(carry):
            _, todo, t_best, idx_best, n0_, n1_, n2_ = carry
            nrm = (n0_, n1_, n2_)
            c = jnp.min(todo)
            sel = todo == c
            row_read = row_read_for(c)

            def row_step(rr, carry):
                t_best, idx_best, nrm = carry
                rowv = row_read(rr)
                for j in range(meshpack.TRIS_PER_ROW):
                    b = meshpack.LANES_PER_TRI * j
                    p0 = (rowv[0, b + 0], rowv[0, b + 1], rowv[0, b + 2])
                    v1 = (rowv[0, b + 3], rowv[0, b + 4], rowv[0, b + 5])
                    v2 = (rowv[0, b + 6], rowv[0, b + 7], rowv[0, b + 8])
                    tid = rowv[0, b + 9].astype(jnp.int32)
                    # packed unit normal (meshpack lanes 10-12), same
                    # values _scan_mesh_part reads
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
                                                     barrier=interpret)
                    valid = (sel & (exclude != tid) & (tid >= 0)
                             & ~grazing & inside & (t >= T_MIN)
                             & ((t < t_best)
                                | ((t == t_best) & (tid > idx_best))))
                    sgn = jnp.where(flip, -1.0, 1.0)
                    t_best = jnp.where(valid, t, t_best)
                    idx_best = jnp.where(valid, tid, idx_best)
                    nrm = mk._vwhere(valid, (sgn * n0[0], sgn * n0[1],
                                             sgn * n0[2]), nrm)
                return t_best, idx_best, nrm

            t_best, idx_best, nrm = jax.lax.fori_loop(
                0, rpc, row_step, (t_best, idx_best, nrm))
            todo = jnp.where(sel, big_i, todo)
            return (jnp.min(todo), todo, t_best, idx_best) + nrm

        out = jax.lax.while_loop(
            cond, body, (jnp.min(todo), todo, t_best, idx_best) + nrm)
        _, _, t_best, idx_best, n0_, n1_, n2_ = out
        of_ref[0] = t_best
        of_ref[1] = n0_
        of_ref[2] = n1_
        of_ref[3] = n2_
        oi_ref[0] = idx_best

    @jax.jit
    def pair_intersect(pair_f, pair_i, tri_rows):
        mp = pair_f.shape[1]
        grid = (mp // tile_m,)
        tile = lambda kk: pl.BlockSpec((kk, tile_m, LANES),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)
        scratch = []
        if stream_tris:
            scratch = [pltpu.VMEM((rpc, LANES), jnp.float32),
                       pltpu.SemaphoreType.DMA(())]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                tile(7), tile(2),
                pl.BlockSpec(
                    memory_space=pl.ANY if stream_tris else pltpu.VMEM),
            ],
            out_specs=[tile(4), tile(1)],
            out_shape=[
                jax.ShapeDtypeStruct((4, mp, LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, mp, LANES), jnp.int32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(pair_f, pair_i, tri_rows)

    return pair_intersect


def _merge_tie(t_a, i_a, n_a, t_b, i_b, n_b):
    """Fold winner b into winner a with the kernel's exact tie rule."""
    take = (t_b < t_a) | ((t_b == t_a) & (i_b > i_a))
    t = jnp.where(take, t_b, t_a)
    i = jnp.where(take, i_b, i_a)
    n = tuple(jnp.where(take, nb, na) for na, nb in zip(n_a, n_b))
    return t, i, n


def mesh_winner(pack_arrays, o, d, exclude, t_bound=None,
                k: int | None = None, interpret: bool = False,
                stream_tris: bool = False, active=None):
    """Closest mesh hit per ray for ONE mesh part, binned-dense.

    pack_arrays = (tri_rows, chunk_bbox, node_bbox, node_meta) per
    kernels/meshpack.py (node arrays unused here — the tree is the
    TILE path's structure; the binned path culls directly at chunk
    granularity). o, d component tuples of (R,) f32 (planar),
    exclude (R,) i32; active (R,) bool masks rays that need no cast
    (their candidate set is emptied).

    Pairs are CHUNK-MAJOR: the (ray, slot) pairs are argsorted by
    candidate chunk id, so every (8, 128) pair tile spans 1-2 distinct
    chunks and the pair kernel's per-chunk scan serves ~every lane —
    regardless of ray coherence. (The previous ray-major order kept
    each ray's k slots adjacent; a tile then scanned the UNION of 64
    rays' candidate sets while each lane accepted only its own chunk:
    <=10% lane utilization even for coherent rays, and arbitrarily bad
    after a diffuse bounce. A 1M-u32 argsort measures ~2-4 ms on v5e —
    noise against the 10x kernel-utilization swing.) Dead pairs
    (chunk -1, masked or beyond the ray's candidate count) sort to the
    end, where all-dead tiles exit the kernel's scan loop immediately.

    Returns (t (R,), idx (R,), nrm component tuple of (R,),
    resolved (R,) bool, t_next (R,) f32 — the entry distance of the
    first OMITTED candidate, +inf when every candidate fit). Rays with
    resolved=False found a hit but cannot prove it global (more than k
    candidate chunks and the hit does not precede the first omitted
    one) — the caller must finish them (shrink pass / exact tree walk).
    """
    tri_rows, chunk_bbox = pack_arrays[0], pack_arrays[1]
    k = DEFAULT_K if k is None else k
    R = o[0].shape[0]
    # the VMEM candidate kernel (vs the dense XLA pass): same contract,
    # ~4-6x cheaper at 1024^2, and inactive lanes come back RESOLVED
    # (empty candidate set, t_next=+inf) instead of joining the walk
    cand, t_next = candidate_chunks_pallas(chunk_bbox, o, d, t_bound, k,
                                           active, interpret)

    P = R * k
    tile = PAIR_TILE_M * LANES
    p_pad = -(-P // tile) * tile
    mp = p_pad // LANES

    # grouping and data movement ride ONE lax.sort each way: the ray
    # data travels as sort PAYLOADS, so no gather ever runs. (Measured
    # on v5e at 1M pairs: lax.sort with payloads ~1-3 ms vs ~10 ms for
    # argsort and ~20 ms PER 1M-element jnp.take — the gather-based
    # grouping cost more than the triangle work it organized.)
    cand_flat = cand.reshape(P)
    key = jnp.where(cand_flat >= 0, cand_flat.astype(jnp.uint32),
                    jnp.uint32(0xFFFFFFFF))
    rep = lambda comp: jnp.broadcast_to(comp[:, None], (R, k)).reshape(P)
    p0 = jnp.arange(P, dtype=jnp.int32)   # original (ray, slot) index
    (key_s, p0_s, o0s, o1s, o2s, d0s, d1s, d2s,
     ex_s) = jax.lax.sort(
        (key, p0, rep(o[0]), rep(o[1]), rep(o[2]),
         rep(d[0]), rep(d[1]), rep(d[2]),
         rep(exclude.astype(jnp.int32))), num_keys=1)
    # chunk ids ride the KEY (dead = 0xFFFFFFFF -> -1): one payload
    # less through the P-sized sort
    chunk_s = jnp.where(key_s == jnp.uint32(0xFFFFFFFF), -1,
                        key_s.astype(jnp.int32))

    def plane1(v, fill):
        if p_pad != P:
            v = jnp.full((p_pad,), fill, v.dtype).at[:P].set(v)
        return v.reshape(mp, LANES)

    pair_f = jnp.stack([plane1(c, 0.0)
                        for c in (o0s, o1s, o2s, d0s, d1s, d2s)]
                       + [jnp.zeros((mp, LANES), jnp.float32)])
    pair_i = jnp.stack([plane1(chunk_s, -1), plane1(ex_s, -1)])

    f = build_pair_kernel(int(tri_rows.shape[0]), interpret, stream_tris)
    out_f, out_i = f(pair_f, pair_i, tri_rows)

    # restore (ray, slot) order the same way: sort on the carried
    # original index, kernel outputs as payloads
    trim = lambda a: a.reshape(p_pad)[:P]
    (_, t_s, i_s, n0s, n1s, n2s) = jax.lax.sort(
        (p0_s, trim(out_f[0]), trim(out_i[0]), trim(out_f[1]),
         trim(out_f[2]), trim(out_f[3])), num_keys=1)
    t_rk = t_s.reshape(R, k)
    i_rk = i_s.reshape(R, k)
    n_rk = [n0s.reshape(R, k), n1s.reshape(R, k), n2s.reshape(R, k)]

    t_w = jnp.full((R,), jnp.inf, jnp.float32)
    i_w = jnp.full((R,), -1, jnp.int32)
    n_w = (jnp.zeros((R,), jnp.float32),) * 3
    for s in range(k):
        t_w, i_w, n_w = _merge_tie(
            t_w, i_w, n_w, t_rk[:, s], i_rk[:, s],
            tuple(n_rk[c][:, s] for c in range(3)))
    resolved = jnp.where(jnp.isfinite(t_next), t_w <= t_next, True)
    return t_w, i_w, n_w, resolved, t_next


@functools.lru_cache(maxsize=32)
def build_walk_kernel(static, tile_m: int = PAIR_TILE_M,
                      interpret: bool = False,
                      stream_tris: bool | None = None):
    """Exact tree-walk closest-hit over the mesh parts, seeded with a
    prior winner — the soundness fallback for unresolved binned rays.

    f(rays (6, M, 128) f32, seed_f (4, M, 128) f32 [t, n.xyz],
      seed_i (2, M, 128) i32 [idx, exclude], *mesh_arrays)
      -> (out_f (4, M, 128) [t, n.xyz], out_i (1, M, 128) [idx]).

    Re-testing the seeded winner is a no-op under the tie rule, so
    running this over already-resolved lanes cannot change them.
    """
    shape = (tile_m, LANES)
    parts = static.mesh_parts
    if stream_tris is None:
        stream_tris = mk.should_stream_tris(static)

    def kernel(rays_ref, sf_ref, si_ref, *rest):
        tri_scratch = tri_sem = None
        if stream_tris:
            rest, tri_scratch, tri_sem = rest[:-2], rest[-2], rest[-1]
        mesh_refs = rest[:-2]
        of_ref, oi_ref = rest[-2:]
        o = tuple(rays_ref[i] for i in range(3))
        d = tuple(rays_ref[3 + i] for i in range(3))
        zero = jnp.zeros(shape, jnp.float32)
        state = {
            "t": sf_ref[0],
            "idx": si_ref[0],
            "pos": (zero, zero, zero),       # recomputed by the caller
            "nrm": (sf_ref[1], sf_ref[2], sf_ref[3]),
        }
        exclude = si_ref[1]
        accessors = mk._make_accessors(parts, mesh_refs, tri_scratch,
                                       tri_sem)
        for part, reads in accessors:
            state = mk._scan_mesh_part(part, reads, o, d, exclude, state,
                                       shape, barrier=interpret)
        of_ref[0] = state["t"]
        of_ref[1] = state["nrm"][0]
        of_ref[2] = state["nrm"][1]
        of_ref[3] = state["nrm"][2]
        oi_ref[0] = state["idx"]

    @jax.jit
    def walk(rays, seed_f, seed_i, *mesh_arrays):
        m = rays.shape[1]
        grid = (m // tile_m,)
        tile = lambda kk: pl.BlockSpec((kk, tile_m, LANES),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)
        mesh_specs = []
        for _ in parts:
            mesh_specs.append(pl.BlockSpec(
                memory_space=pl.ANY if stream_tris else pltpu.VMEM))
            for _k in range(mk.ARRAYS_PER_PART - 1):
                mesh_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch = []
        params = None
        if stream_tris:
            scratch = [pltpu.VMEM((meshpack.ROWS_PER_CHUNK, LANES),
                                  jnp.float32),
                       pltpu.SemaphoreType.DMA(())]
            # config-5-scale meshes (1.3M tris -> 16K chunk boxes + 8K
            # node boxes resident in VMEM): the tile-ANY sweeps'
            # intermediates put the kernel ~1% over Mosaic's default
            # 16 MiB scoped-vmem budget (measured at 2048^2); raise it
            # (v5e has 128 MiB VMEM and the walk runs alone)
            params = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile(6), tile(4), tile(2), *mesh_specs],
            out_specs=[tile(4), tile(1)],
            out_shape=[
                jax.ShapeDtypeStruct((4, m, LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, m, LANES), jnp.int32),
            ],
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(rays, seed_f, seed_i, *mesh_arrays)

    return walk


def mesh_closest_hit(static, mesh_arrays, o, d, exclude, t_bound=None,
                     k: int | None = None, interpret: bool = False,
                     active=None):
    """Closest mesh hit per ray across ALL mesh parts, with the exact
    tree-walk fallback for unresolved rays.

    o, d component tuples of (R,) f32 (planar); exclude (R,) i32;
    t_bound (R,) optional occlusion bound (the unrolled-scene winner's
    t: a mesh hit beyond it can never win the merge, so its chunks are
    never candidates). Returns (t (R,), idx (R,), nrm component tuple)
    bit-matching what the in-kernel _scan_mesh_part walk would produce
    from an empty initial state up to the t_bound cull, which only
    removes provably-losing candidates.

    Unresolved rays (measured ~2-5% of a bounce population at k=6:
    mostly NO-HIT rays grazing the mesh, whose >k origin-overlapping
    candidate chunks all need testing to prove the miss — a shrink-
    style hit-bounded re-candidate provably cannot help them) are
    COMPACTED into at most u_max slots, SORTED by direction octant +
    origin Morton so the gathered tiles are spatially coherent, and
    finished by the exact seeded tree walk — a scattered unresolved
    lane would otherwise drag its whole ray tile through the tree at
    tile-ANY granularity, and an UNsorted gathered tile is the same
    disaster (the r4 profile shows 4 x 1.39 s walk conds per depth-2
    sample at 1024^2 — 80% of sample time). If more than u_max rays
    remain (k badly undersized), the full seeded walk runs over every
    tile — slow but exact.
    """
    stream = mk.should_stream_tris(static)
    k = DEFAULT_K if k is None else k
    R = o[0].shape[0]
    t_w = jnp.full((R,), jnp.inf, jnp.float32)
    i_w = jnp.full((R,), -1, jnp.int32)
    n_w = (jnp.zeros((R,), jnp.float32),) * 3
    resolved = jnp.ones((R,), bool)
    for pi, part in enumerate(static.mesh_parts):
        arrs = mesh_arrays[mk.ARRAYS_PER_PART * pi:
                           mk.ARRAYS_PER_PART * (pi + 1)]
        t_p, i_p, n_p, res, _ = mesh_winner(
            arrs, o, d, exclude, t_bound, k, interpret, stream, active)
        t_w, i_w, n_w = _merge_tie(t_w, i_w, n_w, t_p, i_p, n_p)
        resolved = resolved & res

    args = (t_w, i_w, n_w[0], n_w[1], n_w[2])
    t_w, i_w, n0_, n1_, n2_ = _walk_finish(
        static, mesh_arrays, o, d, exclude, ~resolved, args, interpret)
    return t_w, i_w, (n0_, n1_, n2_)


def _walk_finish(static, mesh_arrays, o, d, exclude, unres, args,
                 interpret):
    """Finish unresolved rays with the tiered compacted seeded walk.

    args = (t, idx, n0, n1, n2) seeds per ray; rays with unres=False
    pass through untouched (re-testing a seeded winner is a no-op
    under the tie rule). Shared by mesh_closest_hit (seeded with the
    binned winner) and mesh_occluded (seeded empty).
    """
    R = o[0].shape[0]
    n_unres = jnp.sum(unres)
    tile = PAIR_TILE_M * LANES
    # tiered compaction budgets: the walk pays for its BUDGET (tiles are
    # a compile-time size), not its occupancy — measured 95 ms/cast at
    # 1024^2 with a flat R/8 budget serving ~4.7% unresolved. The small
    # tier covers the common case; the bigger one is the safety net
    # before walk_full.
    u_tiers = sorted({tile * max(1, R // (32 * tile)),
                      tile * max(1, R // (8 * tile))})
    walk = build_walk_kernel(static, PAIR_TILE_M, interpret)

    def planes_of(cols, dtype, n, m):
        x = jnp.stack(cols, axis=0).astype(dtype)
        if m * LANES != n:
            x = jnp.zeros((x.shape[0], m * LANES), dtype)                 .at[:, :n].set(x)
        return x.reshape(x.shape[0], m, LANES)

    def walk_full(args):
        """Seeded walk over every film tile (the always-sound path)."""
        t_w, i_w, n0_, n1_, n2_ = args
        r_pad = -(-R // tile) * tile
        m = r_pad // LANES
        rays_p = planes_of([o[0], o[1], o[2],
                            d[0], d[1], d[2]], jnp.float32,
                           R, m)
        sf = planes_of([t_w, n0_, n1_, n2_], jnp.float32, R, m)
        si = planes_of([i_w, exclude], jnp.int32, R, m)
        of, oi = walk(rays_p, sf, si, *mesh_arrays)
        flat = lambda a, kk: a[kk].reshape(r_pad)[:R]
        return (flat(of, 0), flat(oi, 0).astype(jnp.int32),
                flat(of, 1), flat(of, 2), flat(of, 3))

    def make_walk_compact(u_max):
        return lambda args: walk_compact(args, u_max)

    def walk_compact(args, u_max):
        """Gather unresolved rays into u_max slots, walk those tiles,
        scatter the results back. Empty slots carry t_best = -inf so
        the walk's slab culls reject every box for them.

        Gathered rays are SORTED by direction octant (major) + 8-bit
        origin Morton (minor) first: the walk culls at tile-ANY
        granularity, and an unsorted gathered tile mixes rays from all
        over the scene pointing everywhere — it would enter most of
        the tree. Sorting is over u_max elements (3 payloads), noise
        next to the tree walk it speeds up; the scatter-back indexes by
        original ray id, so the permutation cannot change any value."""
        t_w, i_w, n0_, n1_, n2_ = args
        (idxs0,) = jnp.nonzero(unres, size=u_max, fill_value=0)
        valid0 = jnp.arange(u_max) < n_unres
        g0 = lambda a: jnp.take(a, idxs0, axis=0)

        def spread3(v):  # 8-bit -> every 3rd bit (meshpack._morton3)
            v = (v | (v << 16)) & jnp.uint32(0x030000FF)
            v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
            v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
            v = (v | (v << 2)) & jnp.uint32(0x09249249)
            return v

        og = [g0(o[c]) for c in range(3)]
        dg = [g0(d[c]) for c in range(3)]
        key = jnp.zeros((u_max,), jnp.uint32)
        for c in range(3):
            oc = jnp.where(valid0, og[c], 0.0)
            lo = jnp.min(jnp.where(valid0, oc, jnp.inf))
            hi = jnp.max(jnp.where(valid0, oc, -jnp.inf))
            q = jnp.clip((oc - lo) / jnp.maximum(hi - lo, 1e-20) * 255.0,
                         0.0, 255.0).astype(jnp.uint32)
            key = key | (spread3(q) << jnp.uint32(c))
            key = key | jnp.where(dg[c] < 0.0,
                                  jnp.uint32(1 << (24 + c)), 0)
        key = jnp.where(valid0, key, jnp.uint32(0xFFFFFFFF))
        (_, idxs, valid) = jax.lax.sort(
            (key, idxs0, valid0.astype(jnp.int32)), num_keys=1)
        valid = valid != 0
        g = lambda a: jnp.take(a, idxs, axis=0)
        m = u_max // LANES
        rays_p = planes_of([g(o[0]), g(o[1]), g(o[2]),
                            g(d[0]), g(d[1]), g(d[2])],
                           jnp.float32, u_max, m)
        seed_t = jnp.where(valid, g(t_w), -jnp.inf)
        sf = planes_of([seed_t, g(n0_), g(n1_), g(n2_)], jnp.float32,
                       u_max, m)
        si = planes_of([jnp.where(valid, g(i_w), -1), g(exclude)],
                       jnp.int32, u_max, m)
        of, oi = walk(rays_p, sf, si, *mesh_arrays)
        flat = lambda a, kk: a[kk].reshape(u_max)
        # masked scatter-back: invalid slots route to a discard row
        tgt = jnp.where(valid, idxs, R)
        upd = lambda base, vals: jnp.zeros((R + 1,), base.dtype)             .at[:R].set(base).at[tgt].set(
                jnp.where(valid, vals, jnp.zeros_like(vals)))[:R]
        # where(valid, ...) above only sanitizes the discard row; valid
        # rows write the walk's exact outputs
        t2 = upd(t_w, flat(of, 0))
        i2 = upd(i_w, flat(oi, 0).astype(jnp.int32))
        n02 = upd(n0_, flat(of, 1))
        n12 = upd(n1_, flat(of, 2))
        n22 = upd(n2_, flat(of, 3))
        return t2, i2, n02, n12, n22

    def dispatch(tiers):
        if not tiers:
            return walk_full
        u, rest = tiers[0], tiers[1:]
        wc = make_walk_compact(u)
        return lambda a: jax.lax.cond(n_unres <= u, wc, dispatch(rest), a)

    return jax.lax.cond(
        n_unres == 0, lambda a: a, dispatch(u_tiers), args)


@functools.lru_cache(maxsize=32)
def build_pair_kernel_occl(n_rows: int, interpret: bool = False,
                           stream_tris: bool = False,
                           tile_m: int = PAIR_TILE_M):
    """Pallas kernel: ANY-hit-before-bound of each (ray, chunk) pair.

    The NEE shadow cast needs only the boolean "some mesh triangle at
    T_MIN <= t <= t_light" — not the closest winner with its normal.
    f(pair_f (7, Mp, 128) f32 [o.xyz, d.xyz, t_bound (EXACT light
    distance, unpadded — the predicate compare, not a cull)],
    pair_i (2, Mp, 128) i32 [chunk_id sorted asc / -1 dead, exclude],
    tri_rows) -> out (1, Mp, 128) i32 hit flag.

    vs build_pair_kernel: no normal selects, no tie rule, one output
    plane (the back-sort carries 2 payloads instead of 6), and the
    chunk loop exits early once every live lane in the tile is
    occluded. Triangle t arithmetic is copied op for op, so
    (hit <=> closest-hit t <= t_bound) exactly.
    """
    from computeraytracer_tpu.ops import intersect as isect

    shape = (tile_m, LANES)
    rpc = meshpack.ROWS_PER_CHUNK
    BIG_I = 2 ** 30

    def kernel(pf_ref, pi_ref, tri_ref, oh_ref, *scratch):
        big_i = jnp.int32(BIG_I)
        o = tuple(pf_ref[i] for i in range(3))
        d = tuple(pf_ref[3 + i] for i in range(3))
        bound = pf_ref[6]
        chunk = pi_ref[0]
        exclude = pi_ref[1]
        wt = isect.watertight_setup(o, d)

        hit = jnp.zeros(shape, bool)
        todo = jnp.where(chunk >= 0, chunk, big_i)

        def row_read_for(c):
            if stream_tris:
                tri_scratch, tri_sem = scratch
                dma = pltpu.make_async_copy(
                    tri_ref.at[pl.ds(c * rpc, rpc), :], tri_scratch,
                    tri_sem)
                dma.start()
                dma.wait()
                return lambda rr: tri_scratch[pl.ds(rr, 1), :]
            return lambda rr: tri_ref[pl.ds(c * rpc + rr, 1), :]

        def cond(carry):
            min_todo, todo, hit = carry
            # exit when every pair is processed/dead OR every live
            # pair's lane already found an occluder
            return (min_todo < big_i) & ~jnp.all(hit | (todo == big_i))

        def body(carry):
            _, todo, hit = carry
            c = jnp.min(todo)
            sel = todo == c
            row_read = row_read_for(c)

            def row_step(rr, hit):
                rowv = row_read(rr)
                for j in range(meshpack.TRIS_PER_ROW):
                    b = meshpack.LANES_PER_TRI * j
                    p0 = (rowv[0, b + 0], rowv[0, b + 1], rowv[0, b + 2])
                    v1 = (rowv[0, b + 3], rowv[0, b + 4], rowv[0, b + 5])
                    v2 = (rowv[0, b + 6], rowv[0, b + 7], rowv[0, b + 8])
                    tid = rowv[0, b + 9].astype(jnp.int32)
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
                                                     barrier=interpret)
                    hit = hit | (sel & (exclude != tid) & (tid >= 0)
                                 & ~grazing & inside & (t >= T_MIN)
                                 & (t <= bound))
                return hit

            hit = jax.lax.fori_loop(0, rpc, row_step, hit)
            todo = jnp.where(sel, big_i, todo)
            return jnp.min(todo), todo, hit

        out = jax.lax.while_loop(
            cond, body, (jnp.min(todo), todo, hit))
        oh_ref[0] = out[2].astype(jnp.int32)

    @jax.jit
    def pair_occluded(pair_f, pair_i, tri_rows):
        mp = pair_f.shape[1]
        grid = (mp // tile_m,)
        tile = lambda kk: pl.BlockSpec((kk, tile_m, LANES),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)
        scratch = []
        if stream_tris:
            scratch = [pltpu.VMEM((rpc, LANES), jnp.float32),
                       pltpu.SemaphoreType.DMA(())]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                tile(7), tile(2),
                pl.BlockSpec(
                    memory_space=pl.ANY if stream_tris else pltpu.VMEM),
            ],
            out_specs=[tile(1)],
            out_shape=[
                jax.ShapeDtypeStruct((1, mp, LANES), jnp.int32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(pair_f, pair_i, tri_rows)

    return pair_occluded


def mesh_occluded_part(pack_arrays, o, d, exclude, t_su,
                       k: int | None = None, interpret: bool = False,
                       stream_tris: bool = False, active=None):
    """Occlusion predicate for ONE mesh part, binned-dense.

    Returns (hit (R,) bool — some triangle at T_MIN <= t <= t_su;
    resolved (R,) bool). A lane that found ANY occluder is resolved
    regardless of omitted candidates (strictly more rays resolve than
    in the closest-hit pipeline); a no-hit lane is resolved only when
    no candidate was omitted. Back-sort carries 2 payloads (vs the
    closest pipeline's 6); the down-sort carries one extra (t_su rides
    to the kernel as the in-kernel predicate bound).
    """
    tri_rows, chunk_bbox = pack_arrays[0], pack_arrays[1]
    k = DEFAULT_K if k is None else k
    R = o[0].shape[0]
    cand, t_next = candidate_chunks_pallas(chunk_bbox, o, d, t_su, k,
                                           active, interpret)

    P = R * k
    tile = PAIR_TILE_M * LANES
    p_pad = -(-P // tile) * tile
    mp = p_pad // LANES

    cand_flat = cand.reshape(P)
    key = jnp.where(cand_flat >= 0, cand_flat.astype(jnp.uint32),
                    jnp.uint32(0xFFFFFFFF))
    rep = lambda comp: jnp.broadcast_to(comp[:, None], (R, k)).reshape(P)
    p0 = jnp.arange(P, dtype=jnp.int32)
    (key_s, p0_s, o0s, o1s, o2s, d0s, d1s, d2s,
     ex_s, tb_s) = jax.lax.sort(
        (key, p0, rep(o[0]), rep(o[1]), rep(o[2]),
         rep(d[0]), rep(d[1]), rep(d[2]),
         rep(exclude.astype(jnp.int32)), rep(t_su)), num_keys=1)
    chunk_s = jnp.where(key_s == jnp.uint32(0xFFFFFFFF), -1,
                        key_s.astype(jnp.int32))

    def plane1(v, fill):
        if p_pad != P:
            v = jnp.full((p_pad,), fill, v.dtype).at[:P].set(v)
        return v.reshape(mp, LANES)

    pair_f = jnp.stack([plane1(c, 0.0)
                        for c in (o0s, o1s, o2s, d0s, d1s, d2s)]
                       + [plane1(tb_s, -jnp.inf)])
    pair_i = jnp.stack([plane1(chunk_s, -1), plane1(ex_s, -1)])

    f = build_pair_kernel_occl(int(tri_rows.shape[0]), interpret,
                               stream_tris)
    (out_h,) = f(pair_f, pair_i, tri_rows)

    trim = lambda a: a.reshape(p_pad)[:P]
    (_, h_s) = jax.lax.sort((p0_s, trim(out_h)), num_keys=1)
    hit = jnp.any(h_s.reshape(R, k) != 0, axis=1)
    resolved = hit | ~jnp.isfinite(t_next)
    return hit, resolved


def mesh_occluded(static, mesh_arrays, o, d, exclude, t_su,
                  k: int | None = None, interpret: bool = False,
                  active=None):
    """Occlusion predicate per ray across ALL mesh parts.

    Returns occl (R,) bool — EXACTLY the boolean the closest-hit
    pipeline derives as (idx >= 0) & (t <= t_su): the pair kernel
    copies the closest kernel's t arithmetic op for op, a found
    any-hit <= t_su implies closest <= t_su, and unresolved rays are
    finished by the same seeded walk (closest t, then the same exact
    compare). Used by the untaped wavefront forward, where no shadow
    WINNER ID is needed (the replay-backward tape is the only consumer
    of shadow winner identity)."""
    stream = mk.should_stream_tris(static)
    k = DEFAULT_K if k is None else k
    R = o[0].shape[0]
    hit = jnp.zeros((R,), bool)
    resolved = jnp.ones((R,), bool)
    for pi, part in enumerate(static.mesh_parts):
        arrs = mesh_arrays[mk.ARRAYS_PER_PART * pi:
                           mk.ARRAYS_PER_PART * (pi + 1)]
        h_p, res_p = mesh_occluded_part(
            arrs, o, d, exclude, t_su, k, interpret, stream, active)
        hit = hit | h_p
        resolved = resolved & res_p

    # a found occluder settles the ray even if some part was unresolved
    unres = ~hit & ~resolved
    seed = (jnp.full((R,), jnp.inf, jnp.float32),
            jnp.full((R,), -1, jnp.int32),
            jnp.zeros((R,), jnp.float32), jnp.zeros((R,), jnp.float32),
            jnp.zeros((R,), jnp.float32))
    t_w, i_w, _, _, _ = _walk_finish(
        static, mesh_arrays, o, d, exclude, unres, seed, interpret)
    return hit | ((i_w >= 0) & (t_w <= t_su))


def mesh_occluded_batched(static, mesh_arrays, o, d, exclude, t_su,
                          k: int | None = None, interpret: bool = False,
                          active=None, batch: int | None = None,
                          threshold: int | None = None):
    """mesh_occluded with the same live-compaction batching as
    mesh_closest_hit_batched (see there for the design and the
    measured dense-cast threshold); NEE populations are the sparsest
    casts in the wavefront, so shadow casts batch most often."""
    R = o[0].shape[0]
    tile = PAIR_TILE_M * LANES
    if batch is not None:
        batch = max(tile, (batch // tile) * tile)
    if batch is None or active is None or batch >= R:
        return mesh_occluded(static, mesh_arrays, o, d, exclude, t_su,
                             k=k, interpret=interpret, active=active)
    nb_max = -(-R // batch)
    r_pad = nb_max * batch
    n_live = jnp.sum(active.astype(jnp.int32))

    def plain(_):
        return mesh_occluded(static, mesh_arrays, o, d, exclude, t_su,
                             k=k, interpret=interpret, active=active)

    def batched(_):
        rid = jnp.arange(R, dtype=jnp.uint32)
        key = jnp.where(active, rid, rid | jnp.uint32(1 << 31))
        (key_s, o0s, o1s, o2s, d0s, d1s, d2s, ex_s, tb_s) = jax.lax.sort(
            (key, o[0], o[1], o[2], d[0], d[1], d[2],
             exclude.astype(jnp.int32), t_su), num_keys=1)
        rid_s = key_s & jnp.uint32(0x7FFFFFFF)

        def padto(v, fill):
            if r_pad == R:
                return v
            return jnp.full((r_pad,), fill, v.dtype).at[:R].set(v)

        o_s = (padto(o0s, 0.0), padto(o1s, 0.0), padto(o2s, 0.0))
        d_s = (padto(d0s, 1.0), padto(d1s, 0.0), padto(d2s, 0.0))
        ex_p = padto(ex_s, -1)
        tb_p = padto(tb_s, 0.0)
        h0 = jnp.zeros((r_pad,), jnp.int32)
        nb = (n_live + batch - 1) // batch

        def body(carry):
            i, h_a = carry
            s = i * batch
            sl = lambda a: jax.lax.dynamic_slice(a, (s,), (batch,))
            act = (jnp.arange(batch, dtype=jnp.int32) + s) < n_live
            h_b = mesh_occluded(
                static, mesh_arrays,
                (sl(o_s[0]), sl(o_s[1]), sl(o_s[2])),
                (sl(d_s[0]), sl(d_s[1]), sl(d_s[2])),
                sl(ex_p), sl(tb_p), k=k, interpret=interpret,
                active=act)
            return (i + 1, jax.lax.dynamic_update_slice(
                h_a, h_b.astype(jnp.int32), (s,)))

        _, h_s = jax.lax.while_loop(
            lambda c: c[0] < nb, body, (jnp.int32(0), h0))
        (_, h_o) = jax.lax.sort(
            (padto(rid_s, jnp.uint32(0xFFFFFFFF)), h_s), num_keys=1)
        return h_o[:R] != 0

    if threshold is not None and threshold < R:
        return jax.lax.cond(n_live <= threshold, batched, plain, 0)
    return batched(0)


def mesh_closest_hit_batched(static, mesh_arrays, o, d, exclude,
                             t_bound=None, k: int | None = None,
                             interpret: bool = False, active=None,
                             batch: int | None = None,
                             threshold: int | None = None):
    """mesh_closest_hit whose cost scales with the LIVE population.

    The binned pipeline's dominant costs (the two R*k pair sorts, the
    candidate kernel, the pair kernel) are sized by the FILM, not by how
    many rays still need a cast — but bounce populations decay fast (RR
    + light-hit termination: measured at depth 8 the per-cast live
    fractions are 1.0/.89/.89/.66/.66/.54 for bounces 0-2 and then
    collapse to .08 -> .003 for bounces 3-8; benchmarks/
    wavefront_populations.py), and the per-light NEE populations are
    sparser still. Here live rays are compacted to a prefix by ONE
    liveness sort (ray id rides the key, so film-block coherence — what
    the candidate kernel's tile-ANY supernode culls feed on — survives
    on both sides of the boundary), then fixed-size batches of the
    prefix run the full pipeline under a lax.while_loop whose trip
    count is ceil(n_live / batch): a cast pays for its population,
    quantized to one batch, and every sparse cast in the unrolled
    wavefront SHARES the one compiled batch body.

    threshold: populations ABOVE it take the plain full-film pipeline
    in one piece (a lax.cond picks per cast at runtime). Measured at
    1024^2 82K tris: batching everything is 1.6x at depth 8 (tail
    casts) but 0.87x at depth 3 (dense casts pay ~10-15 ms/batch of
    dispatch + small-size sort inefficiency for quantization savings
    they don't have); the hybrid keeps both wins. R//4 is the
    break-even measured for batch=R//8.

    Bit-exact with mesh_closest_hit: every per-lane quantity in the
    pipeline is independent of tile/batch composition (per-lane slab
    insertion, per-lane masked pair scans, per-lane seeded walk — see
    the soundness contracts above), and the un-permute is a sort on the
    original ray id. Inactive rays return the inactive encoding
    (t=+inf, idx=-1, n=0) exactly as the active-masked plain path does.
    Requires `active`; falls back to the plain path when batch is None
    or does not subdivide the population (small films / tests).
    """
    R = o[0].shape[0]
    tile = PAIR_TILE_M * LANES
    if batch is not None:
        batch = max(tile, (batch // tile) * tile)
    if batch is None or active is None or batch >= R:
        return mesh_closest_hit(static, mesh_arrays, o, d, exclude,
                                t_bound=t_bound, k=k, interpret=interpret,
                                active=active)
    if t_bound is None:
        t_bound = jnp.full((R,), jnp.inf, jnp.float32)
    nb_max = -(-R // batch)
    r_pad = nb_max * batch
    n_live = jnp.sum(active.astype(jnp.int32))

    def plain(_):
        t, i, n = mesh_closest_hit(static, mesh_arrays, o, d, exclude,
                                   t_bound=t_bound, k=k,
                                   interpret=interpret, active=active)
        return t, i, n[0], n[1], n[2]

    def batched(_):
        # live-first stable partition: ray id rides the key (bit 31 =
        # dead)
        rid = jnp.arange(R, dtype=jnp.uint32)
        key = jnp.where(active, rid, rid | jnp.uint32(1 << 31))
        (key_s, o0s, o1s, o2s, d0s, d1s, d2s, ex_s, tb_s) = jax.lax.sort(
            (key, o[0], o[1], o[2], d[0], d[1], d[2],
             exclude.astype(jnp.int32), t_bound), num_keys=1)
        rid_s = key_s & jnp.uint32(0x7FFFFFFF)

        def padto(v, fill):
            if r_pad == R:
                return v
            return jnp.full((r_pad,), fill, v.dtype).at[:R].set(v)

        o_s = (padto(o0s, 0.0), padto(o1s, 0.0), padto(o2s, 0.0))
        d_s = (padto(d0s, 1.0), padto(d1s, 0.0), padto(d2s, 0.0))
        ex_p = padto(ex_s, -1)
        tb_p = padto(tb_s, 0.0)  # padded lanes are inactive

        t0 = jnp.full((r_pad,), jnp.inf, jnp.float32)
        i0 = jnp.full((r_pad,), -1, jnp.int32)
        z0 = jnp.zeros((r_pad,), jnp.float32)
        nb = (n_live + batch - 1) // batch

        def body(carry):
            i, t_a, i_a, n0_a, n1_a, n2_a = carry
            s = i * batch
            sl = lambda a: jax.lax.dynamic_slice(a, (s,), (batch,))
            act = (jnp.arange(batch, dtype=jnp.int32) + s) < n_live
            t_b, i_b, n_b = mesh_closest_hit(
                static, mesh_arrays,
                (sl(o_s[0]), sl(o_s[1]), sl(o_s[2])),
                (sl(d_s[0]), sl(d_s[1]), sl(d_s[2])),
                sl(ex_p), t_bound=sl(tb_p), k=k, interpret=interpret,
                active=act)
            upd = lambda a, v: jax.lax.dynamic_update_slice(a, v, (s,))
            return (i + 1, upd(t_a, t_b), upd(i_a, i_b),
                    upd(n0_a, n_b[0]), upd(n1_a, n_b[1]),
                    upd(n2_a, n_b[2]))

        _, t_s, i_s, n0_s, n1_s, n2_s = jax.lax.while_loop(
            lambda c: c[0] < nb, body, (jnp.int32(0), t0, i0, z0, z0, z0))

        # un-permute by original ray id (padding ids sort last, trimmed)
        (_, t_o, i_o, n0_o, n1_o, n2_o) = jax.lax.sort(
            (padto(rid_s, jnp.uint32(0xFFFFFFFF)), t_s, i_s,
             n0_s, n1_s, n2_s), num_keys=1)
        trim = lambda a: a[:R]
        return (trim(t_o), trim(i_o), trim(n0_o), trim(n1_o),
                trim(n2_o))

    if threshold is not None and threshold < R:
        t, i, n0, n1, n2 = jax.lax.cond(n_live <= threshold, batched,
                                        plain, 0)
    else:
        t, i, n0, n1, n2 = batched(0)
    return t, i, (n0, n1, n2)
