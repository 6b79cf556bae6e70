"""Pallas-megakernel tracer with the same API as tracer/xla.py.

Forward runs kernels/megakernel.py (one fused TPU kernel per ray tile);
camera ray-gen, hero-wavelength sampling, the per-ray spectra table, and
the CIE conversion stay in XLA where they fuse for free and cost one
pass over HBM.

The kernel is specialized on the non-differentiable scene STRUCTURE
(kernels/megakernel.py SceneStatic) — like XLA specializes on shapes.
Entry points compute it eagerly from a concrete scene; when calling from
inside your own jit, pass `static=SceneStatic.from_scene(scene)`
computed outside.

Differentiation: the kernel call carries a custom_vjp whose backward is
the hand-built Pallas backward megakernel (replay + reverse adjoint
sweep, kernels/megakernel.py build_backward) producing cotangents for
the primitive table, the spectra planes, and the input rays; XLA then
transposes the surrounding gathers/ray-gen/CIE conversion automatically,
so gradients reach every scene leaf (geometry, spectra, camera).

Mesh scenes (static.mesh_parts non-empty) use backward="replay"
instead: the forward kernel runs in taped mode, recording each bounce's
closest-hit and shadow-scan winner indices, and the backward
differentiates a scan-free guided replay (tracer/replay.py) that
re-tests only the winning primitive per bounce — O(rays * depth)
regardless of triangle count, with XLA doing the winner gather and the
cotangent scatter back into the (P, 12) primitive table.

backward="xla" falls back to recompute-vjp through the XLA tracer
(identical pcg4d streams -> identical sampling decisions -> the same
gradient, slower).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from computeraytracer_tpu.ops import camera as cam_ops
from computeraytracer_tpu.ops import rng
from computeraytracer_tpu.ops import spectrum as spec
from computeraytracer_tpu.kernels import megakernel as mk
from computeraytracer_tpu.scene import data as scene_data
from computeraytracer_tpu.tracer import xla as xla_tracer

LANES = mk.LANES
SceneStatic = mk.SceneStatic

# Resolved default for trace_radiance(wavefront=None) on mesh scenes.
# Measured on v5e, 81920 tris (STAGED_r05.json): the binned wavefront
# renders 1024^2 depth-3 at 0.49 Mpaths/s and depth-8 at 0.39 vs 0.016
# for the in-kernel tile-ANY bounce loop at 256^2 depth-8 (r4) —
# incoherent bounce casts dominate mesh renders, and per-ray candidate
# culling beats tile-ANY there by ~40x in triangles tested
# (kernels/binned.py header).
MESH_WAVEFRONT_DEFAULT = True

# Rays per compacted-cast batch = R / BATCH_FRACTION, and casts with
# more than R / THRESHOLD_FRACTION live rays skip compaction entirely
# (binned.mesh_closest_hit_batched threshold): dense casts pay zero
# overhead, sparse ones pay per live batch. Measured at 1024^2 82K
# tris: batch-everything was 1.6x at depth 8 but 0.87x at depth 3;
# the hybrid keeps the dense casts at the plain pipeline's cost.
MESH_CAST_BATCH_FRACTION = 8
MESH_CAST_THRESHOLD_FRACTION = 4


@functools.lru_cache(maxsize=64)
def _forward_cached(static, max_depth, rr_start, tile_m, interpret,
                    taped=False, stream_tris=None):
    return mk.build_forward(static, max_depth, rr_start, tile_m, interpret,
                            taped=taped, stream_tris=stream_tris)


@functools.lru_cache(maxsize=64)
def _backward_cached(static, max_depth, rr_start, tile_m, interpret):
    return mk.build_backward(static, max_depth, rr_start, tile_m, interpret)


@functools.lru_cache(maxsize=64)
def _backward_tape_cached(static, max_depth, rr_start, tile_m, interpret):
    return mk.build_backward_from_tape(static, max_depth, rr_start,
                                       tile_m, interpret)


@functools.lru_cache(maxsize=64)
def _shade_step_cached(static, max_depth, rr_start, tile_m, interpret):
    """(first, rest) shade-step pair for the wavefront: the first
    bounce scans the unrolled scene in-kernel; every later bounce
    consumes the previous step's emitted winner (un_f/un_i)."""
    return (mk.build_shade_step(static, max_depth, rr_start, tile_m,
                                interpret, scan_in_kernel=True),
            mk.build_shade_step(static, max_depth, rr_start, tile_m,
                                interpret, scan_in_kernel=False))


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _call_with_vjp(fwd, bwd, prims_f, rays, seeds, spect_p):
    """Kernel call whose backward is the Pallas backward megakernel.

    seeds is an explicit (integer) argument — closing over it would leak
    tracers across the custom_vjp boundary; its cotangent is float0."""
    return fwd(prims_f, rays, seeds, spect_p)


def _call_fwd(fwd, bwd, prims_f, rays, seeds, spect_p):
    out = _call_with_vjp(fwd, bwd, prims_f, rays, seeds, spect_p)
    return out, (prims_f, rays, seeds, spect_p)


def _call_bwd(fwd, bwd, res, g):
    import numpy as np

    prims_f, rays, seeds, spect_p = res
    dp, dr, dsp = bwd(prims_f, rays, seeds, spect_p, g)
    d_seeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return dp, dr, d_seeds, dsp


_call_with_vjp.defvjp(_call_fwd, _call_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _call_taped(fwd_plain, fwd_taped, bwd_tape, prims_f, rays, seeds,
                spect_p):
    """Kernel call whose backward is the tape-fed reverse sweep.

    The primal (no-grad) path runs the plain forward — no tape writes;
    under grad the fwd rule runs the taped-full forward once and the
    backward consumes the tape without replaying the trace (forward
    trace work once per training step, r4 ask 6)."""
    return fwd_plain(prims_f, rays, seeds, spect_p)


def _call_taped_fwd(fwd_plain, fwd_taped, bwd_tape, prims_f, rays, seeds,
                    spect_p):
    out, tf, tu, ti = fwd_taped(prims_f, rays, seeds, spect_p)
    return out, (prims_f, seeds, spect_p, tf, tu, ti)


def _call_taped_bwd(fwd_plain, fwd_taped, bwd_tape, res, g):
    import numpy as np

    prims_f, seeds, spect_p, tf, tu, ti = res
    dp, dr, dsp = bwd_tape(prims_f, spect_p, tf, tu, ti, g)
    d_seeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return dp, dr, d_seeds, dsp


_call_taped.defvjp(_call_taped_fwd, _call_taped_bwd)


def _zero_cot(x):
    """Cotangent for a non-differentiable argument."""
    import numpy as np

    if jnp.issubdtype(jnp.result_type(x), jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mesh_call(fwd_taped, static, max_depth, rr_start,
               prims_full, rays, seeds, spect_p, cats, mesh_arrays):
    """Mesh-scene kernel call whose backward is the guided replay.

    prims_full is the FULL (P, 12) primitive table (the replay gathers
    winners by global id); the kernel itself consumes only the unrolled
    rows plus the packed mesh arrays."""
    prims_u = prims_full[jnp.asarray(static.rows)]
    out = fwd_taped(prims_u, rays, seeds, spect_p, *mesh_arrays)
    return out[0]


def _mesh_fwd(fwd_taped, static, max_depth, rr_start,
              prims_full, rays, seeds, spect_p, cats, mesh_arrays):
    prims_u = prims_full[jnp.asarray(static.rows)]
    out, tape_idx, tape_sh = fwd_taped(prims_u, rays, seeds, spect_p,
                                       *mesh_arrays)
    return out, (prims_full, rays, seeds, spect_p, cats, mesh_arrays,
                 tape_idx, tape_sh)


def _mesh_bwd(fwd_taped, static, max_depth, rr_start, res, g):
    from computeraytracer_tpu.tracer import replay as replay_mod

    (prims_full, rays, seeds, spect_p, cats, mesh_arrays,
     tape_idx, tape_sh) = res

    def f(pf, r, sp):
        return replay_mod.trace_replay(static, cats, pf, r, seeds, sp,
                                       tape_idx, tape_sh, max_depth,
                                       rr_start)

    _, vjp = jax.vjp(f, prims_full, rays, spect_p)
    dpf, dr, dsp = vjp(g)
    return (dpf, dr, _zero_cot(seeds), dsp, _zero_cot(cats),
            jax.tree_util.tree_map(_zero_cot, mesh_arrays))


_mesh_call.defvjp(_mesh_fwd, _mesh_bwd)


def _wavefront_forward(step_fn, static, max_depth, prims_u, rays, seeds,
                       spect_p, mesh_arrays, interpret, taped=True):
    """Binned wavefront: one shade dispatch per bounce, mesh casts in
    between at per-RAY granularity (kernels/binned.py).

    The megakernel's in-kernel bounce loop culls the chunk BVH at ray-
    TILE granularity — near-optimal for camera rays, but a sorted post-
    bounce tile still enters ~50x more chunks than its rays need
    individually (measured; see kernels/binned.py header). Here every
    bounce is: (1) binned per-ray mesh closest-hit for the live rays,
    (2) one build_shade_step dispatch (unrolled scan + shading + RNG,
    mesh winner folded in, NEE visibility deferred), (3) binned shadow
    casts per light, occluded NEE contributions zeroed in XLA. Per-ray
    arithmetic and pcg4d draws are untouched — radiance is bit-
    identical to the in-kernel loop (tests/test_pallas.py pins it).

    Returns (L (4, M, LANES), tape_idx (D+1, M, LANES), tape_sh
    (D+1, n_lights, M, LANES)) — the same contract as the in-kernel
    taped forward, so the guided replay backward is oblivious.
    """
    from computeraytracer_tpu.kernels import binned

    m = rays.shape[1]
    R = m * LANES
    n_lights = max(1, len(static.light_rows))
    nl_real = len(static.light_rows)
    zero = jnp.zeros((1, m, LANES), jnp.float32)
    one = jnp.ones((1, m, LANES), jnp.float32)
    carry_f = jnp.concatenate(
        [rays, jnp.tile(zero, (4, 1, 1)), jnp.tile(one, (4, 1, 1)),
         one, one], axis=0)
    carry_u = seeds
    carry_i = jnp.concatenate([
        jnp.full((1, m, LANES), -1, jnp.int32),
        jnp.zeros((2, m, LANES), jnp.int32),
        jnp.ones((1, m, LANES), jnp.int32)], axis=0)
    tapes_idx, tapes_sh = [], []
    flat = lambda p: p.reshape(R)
    inf_r = jnp.full((R,), jnp.inf, jnp.float32)
    neg_r = jnp.full((R,), -1, jnp.int32)
    zero_r = jnp.zeros((R,), jnp.float32)
    getp = lambda i, j: prims_u[i, j]

    def cast(o, d, exclude, mask, t_bound):
        """Gated binned mesh closest-hit over planar (R,) components.

        t_bound: occlusion bound per ray (the unrolled-scene winner's
        t, +inf on miss) — candidate chunks entirely behind it are
        culled before any pair is formed. Sparse casts (live <=
        R / MESH_CAST_THRESHOLD_FRACTION) are live-compacted and
        batched (binned.mesh_closest_hit_batched): each pays
        ceil(live / (R / MESH_CAST_BATCH_FRACTION)) batch bodies, and
        all sparse casts share the one compiled body; dense casts run
        the plain full-film pipeline."""
        batch = R // MESH_CAST_BATCH_FRACTION

        def go(_):
            t, i, n = binned.mesh_closest_hit_batched(
                static, mesh_arrays, o, d, exclude, t_bound=t_bound,
                interpret=interpret, active=mask, batch=batch,
                threshold=R // MESH_CAST_THRESHOLD_FRACTION)
            return t, i, n[0], n[1], n[2]

        return jax.lax.cond(
            jnp.any(mask), go,
            lambda _: (inf_r, neg_r, zero_r, zero_r, zero_r), 0)

    step_first, step_rest = step_fn
    un_f = un_i = None
    ub = None
    for depth in range(max_depth + 1):
        o = tuple(flat(carry_f[c]) for c in range(3))
        d = tuple(flat(carry_f[3 + c]) for c in range(3))
        exclude = flat(carry_i[0])
        active = flat(carry_i[3]) != 0
        if depth == 0:
            # camera-ray occlusion bound, XLA-computed once.
            # barrier=True: without it the edge functions could fuse
            # into FMAs and produce a bound tighter than the Mosaic
            # kernel's own winner beyond candidate_chunks' 8-ulp pad,
            # culling the chunk with the true mesh winner (ADVICE r4).
            # Every later bounce's bound comes from the shade kernel's
            # own emitted scan (exact by construction).
            ub = mk._scan_primitives(static, getp, o, d, exclude, (R,),
                                     barrier=True)["t"]
        t_m, i_m, n0, n1, n2 = cast(o, d, exclude, active, ub)
        mesh_f = jnp.stack([t_m, n0, n1, n2]).reshape(4, m, LANES)
        mesh_i = i_m.reshape(1, m, LANES)
        depth_arr = jnp.full((1, 1), depth, jnp.int32)
        un_in = () if depth == 0 else (un_f, un_i)
        step = step_first if depth == 0 else step_rest
        (carry_f, carry_u, carry_i, tidx, sh_f, sh_i,
         un_f, un_i) = step(
            depth_arr, prims_u, carry_f, carry_u, carry_i, spect_p,
            mesh_f, mesh_i, *un_in)
        ub = un_f[0].reshape(R)

        sh_o = tuple(flat(sh_f[c]) for c in range(3))
        ex_sh = flat(tidx)
        l_add = jnp.zeros((4, m, LANES), jnp.float32)
        tape_l = []
        for l_i in range(nl_real):
            fb = 3 + 8 * l_i
            ldir = tuple(flat(sh_f[fb + c]) for c in range(3))
            t_su = flat(sh_f[fb + 3])
            id_su = flat(sh_i[2 * l_i])
            lsel = flat(sh_i[2 * l_i + 1]) != 0
            if taped:
                # the replay backward consumes the shadow WINNER ID, so
                # the taped forward needs the closest occluder. The tie
                # rule reduces to t_mesh <= t_unrolled (mesh ids exceed
                # every unrolled id, SceneStatic contract).
                t_ms, i_ms, _, _, _ = cast(sh_o, ldir, ex_sh, lsel, t_su)
                occl = (i_ms >= 0) & (t_ms <= t_su)
                tape_l.append(jnp.where(occl, i_ms, id_su)
                              .reshape(m, LANES))
            else:
                # forward-only: the occlusion BOOLEAN suffices — any-hit
                # pipeline (2 back-sort payloads instead of 6, no normal
                # work, early-exit pair kernel, hit => resolved)
                occl = jax.lax.cond(
                    jnp.any(lsel),
                    lambda _: binned.mesh_occluded_batched(
                        static, mesh_arrays, sh_o, ldir, ex_sh, t_su,
                        interpret=interpret, active=lsel,
                        batch=R // MESH_CAST_BATCH_FRACTION,
                        threshold=R // MESH_CAST_THRESHOLD_FRACTION),
                    lambda _: jnp.zeros((R,), bool), 0)
                tape_l.append(jnp.full((m, LANES), -1, jnp.int32))
            occl_p = occl.reshape(1, m, LANES)
            l_add = l_add + jnp.where(occl_p, 0.0,
                                      sh_f[fb + 4:fb + 8])
        for _ in range(n_lights - nl_real):
            tape_l.append(jnp.full((m, LANES), -1, jnp.int32))
        carry_f = carry_f.at[6:10].add(l_add)
        tapes_idx.append(tidx)
        tapes_sh.append(jnp.stack(tape_l))

    L = carry_f[6:10]
    tape_idx = jnp.stack(tapes_idx)
    tape_sh = jnp.stack(tapes_sh)
    return L, tape_idx, tape_sh


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mesh_call_wf(step_fn, static, max_depth, rr_start,
                  prims_full, rays, seeds, spect_p, cats, mesh_arrays):
    """Wavefront mesh call; backward is the same guided replay. The
    primal (no-grad) path skips the tapes — any-hit shadow casts."""
    prims_u = prims_full[jnp.asarray(static.rows)]
    out, _, _ = _wavefront_forward(step_fn, static, max_depth, prims_u,
                                   rays, seeds, spect_p, mesh_arrays,
                                   _use_interpret(), taped=False)
    return out


def _mesh_wf_fwd(step_fn, static, max_depth, rr_start,
                 prims_full, rays, seeds, spect_p, cats, mesh_arrays):
    prims_u = prims_full[jnp.asarray(static.rows)]
    out, tape_idx, tape_sh = _wavefront_forward(
        step_fn, static, max_depth, prims_u, rays, seeds, spect_p,
        mesh_arrays, _use_interpret())
    return out, (prims_full, rays, seeds, spect_p, cats, mesh_arrays,
                 tape_idx, tape_sh)


def _mesh_wf_bwd(step_fn, static, max_depth, rr_start, res, g):
    return _mesh_bwd(None, static, max_depth, rr_start, res, g)


_mesh_call_wf.defvjp(_mesh_wf_fwd, _mesh_wf_bwd)


def mesh_packs_for(scene, static: SceneStatic):
    """Chunk + BVH packing for every mesh part. The Morton order and
    tree structure need a concrete scene (data-dependent argsort); the
    boxes themselves are jnp and re-derive from live geometry."""
    from computeraytracer_tpu.kernels import meshpack
    return tuple(meshpack.pack_scene_mesh(scene, part)
                 for part in static.mesh_parts)


def _resolve(scene, static, backward, wavefront, tile_m, mesh_packs,
             mesh_plans):
    """Resolve dispatch knobs + mesh packs shared by every entry point."""
    if static is None:
        static = SceneStatic.from_scene(scene)
    if wavefront is None:
        wavefront = MESH_WAVEFRONT_DEFAULT
    wavefront = bool(wavefront and static.mesh_parts)
    if tile_m is None:
        tile_m = mk.MESH_TILE_M if static.mesh_parts else mk.DEFAULT_TILE_M
    mesh_arrays = ()
    if static.mesh_parts:
        if mesh_packs is None:
            from computeraytracer_tpu.kernels import meshpack
            if mesh_plans is None:
                try:
                    mesh_plans = tuple(
                        meshpack.plan_scene_mesh(scene, part)
                        for part in static.mesh_parts)
                except jax.errors.TracerArrayConversionError as e:
                    raise ValueError(
                        "mesh scene with traced geometry: compute "
                        "mesh_plans from the concrete initial scene "
                        "(kernels/meshpack.plan_scene_mesh) outside "
                        "jit/grad and pass them through") from e
            mesh_packs = tuple(
                meshpack.pack_scene_mesh(scene, part, plan)
                for part, plan in zip(static.mesh_parts, mesh_plans))
        mesh_arrays = tuple(jnp.asarray(a) for p in mesh_packs
                            for a in p.arrays)
        if backward == "pallas":
            backward = "replay"
    return static, backward, wavefront, tile_m, mesh_arrays


def trace_radiance(scene, o, d, lambdas, seed, max_depth: int,
                   rr_start: int = 1, tile_m: int | None = None,
                   static: SceneStatic | None = None,
                   backward: str = "pallas", mesh_packs=None,
                   mesh_plans=None, wavefront: bool | None = None,
                   stream_tris: bool | None = None):
    """Pallas path-trace: (R,3) rays -> (R,4) spectral radiance.

    Differentiable w.r.t. scene geometry/spectra and the rays (o, d).
    Scenes whose static has mesh_parts run the BVH-over-chunks mesh
    scan; their gradients use the taped guided replay (backward
    upgrades from "pallas" to "replay" automatically). Under an outer
    jit with a TRACED scene, pass mesh_plans (host-computed, see
    kernels/meshpack.make_plan) so the packs re-derive from the live
    geometry. tile_m=None picks DEFAULT_TILE_M, or MESH_TILE_M for mesh
    scenes (smaller tiles cull better: a box is entered only when ANY
    ray in the tile can hit it).

    wavefront=True dispatches mesh scenes one bounce at a time with
    inter-bounce ray sorting (direction octant + origin Morton) so ray
    tiles stay spatially coherent at every depth instead of only at the
    camera — see _wavefront_forward. Results are bit-identical to the
    in-kernel bounce loop (tests/test_meshpack.py pins this).
    wavefront=None resolves to MESH_WAVEFRONT_DEFAULT for mesh scenes;
    non-mesh scenes ignore the flag (the unrolled scan has no
    coherence-dependent culling to help).

    stream_tris=True keeps the packed triangle rows in HBM and DMAs
    box-hit chunks into VMEM scratch inside the kernel (the layout for
    ~1M-triangle scenes; see megakernel.should_stream_tris). None
    resolves by total triangle count. Results are bit-identical either
    way — only the residency of tri_rows changes.
    """
    (static, backward, wavefront, tile_m,
     mesh_arrays) = _resolve(scene, static, backward, wavefront, tile_m,
                             mesh_packs, mesh_plans)
    r = o.shape[0]
    tile = tile_m * LANES
    r_pad = ((r + tile - 1) // tile) * tile
    m = r_pad // LANES

    def to_planes(x, dtype):
        # (R, k) -> (k, M, 128), zero-padded only when R isn't
        # tile-aligned (it is for every power-of-two resolution)
        k = x.shape[1]
        xt = x.T.astype(dtype)
        if r_pad != r:
            xt = jnp.zeros((k, r_pad), dtype).at[:, :r].set(xt)
        return xt.reshape(k, m, LANES)

    rays = to_planes(jnp.concatenate([o, d], axis=-1), jnp.float32)
    seeds = to_planes(seed, jnp.uint32)
    # per-ray table of every spectrum at the ray's 4 wavelengths,
    # gathered directly in the kernel's (S, 4, R) plane orientation so
    # neither direction needs a transpose; take_cols carries the
    # scatter-free one-hot-contraction backward
    s_n = scene.spectra.shape[0]
    lam_t = jnp.swapaxes(lambdas, 0, 1)                   # (4, R)
    spect = spec.take_cols(scene.spectra, lam_t).reshape(s_n * 4, r)
    if r_pad != r:
        spect = jnp.zeros((s_n * 4, r_pad),
                          jnp.float32).at[:, :r].set(spect)
    spect_p = spect.reshape(s_n * 4, m, LANES)

    out = _dispatch(scene, static, rays, seeds, spect_p, max_depth,
                    rr_start, tile_m, backward, wavefront, stream_tris,
                    mesh_arrays)
    return out.reshape(4, r_pad)[:, :r].T  # (R, 4)


def _dispatch(scene, static, rays, seeds, spect_p, max_depth, rr_start,
              tile_m, backward, wavefront, stream_tris, mesh_arrays):
    """Run the megakernel on pre-built planes -> radiance (4, M, LANES).

    rays (6, M, LANES) f32, seeds (4, M, LANES) u32, spect_p
    (S*4, M, LANES) f32; backward/wavefront resolved by the caller."""
    interpret = _use_interpret()

    if backward == "replay":
        cats = jnp.asarray(scene.primitives.category, jnp.int32)
        if wavefront:
            step_fn = _shade_step_cached(static, int(max_depth),
                                         int(rr_start), tile_m, interpret)
            out = _mesh_call_wf(step_fn, static, int(max_depth),
                                int(rr_start), mk.pack_prims(scene), rays,
                                seeds, spect_p, cats, mesh_arrays)
        else:
            fwd_t = _forward_cached(static, int(max_depth), int(rr_start),
                                    tile_m, interpret, True, stream_tris)
            out = _mesh_call(fwd_t, static, int(max_depth), int(rr_start),
                             mk.pack_prims(scene), rays, seeds, spect_p,
                             cats, mesh_arrays)
    elif wavefront and backward == "none":
        step_fn = _shade_step_cached(static, int(max_depth),
                                     int(rr_start), tile_m, interpret)
        prims_u = mk.pack_prims(scene, static)
        out, _, _ = _wavefront_forward(step_fn, static, int(max_depth),
                                       prims_u, rays, seeds, spect_p,
                                       mesh_arrays, interpret,
                                       taped=False)
    elif backward == "pallas":
        # re-trace the full forward INSIDE the backward kernel, then
        # the reverse sweep — no tape traffic. DEFAULT over the tape-
        # fed variant below: measured 1024^2 depth 8 Cornell fwd+bwd
        # 15.1 (retrace, tile 32) vs 14.4 (tape-fed, tile 16)
        # Mpaths/s — the pipelined tape reads plus the halved backward
        # tile (forced by Mosaic's scoped-vmem budget) cost more than
        # the in-kernel re-trace saves at this shape.
        fwd = _forward_cached(static, int(max_depth), int(rr_start),
                              tile_m, interpret)
        bwd = _backward_cached(static, int(max_depth), int(rr_start),
                               tile_m, interpret)
        out = _call_with_vjp(fwd, bwd, mk.pack_prims(scene, static),
                             rays, seeds, spect_p)
    elif backward == "pallas_taped":
        fwd = _forward_cached(static, int(max_depth), int(rr_start),
                              tile_m, interpret)
        fwd_t = _forward_cached(static, int(max_depth), int(rr_start),
                                tile_m, interpret, "full")
        # the reverse sweep's tape arrives as PIPELINED inputs (double-
        # buffered blocks), unlike build_backward's scratch tape — at
        # tile_m=32 depth 8 that plus the in-register linearization
        # exceeds Mosaic's 16 MiB scoped-vmem budget (measured r5);
        # halving the backward's tile halves every per-tile buffer, and
        # tile size only changes d_prims' f32 accumulation order
        bwd_t = _backward_tape_cached(static, int(max_depth),
                                      int(rr_start), min(tile_m, 16),
                                      interpret)
        out = _call_taped(fwd, fwd_t, bwd_t, mk.pack_prims(scene, static),
                          rays, seeds, spect_p)
    else:
        fwd = _forward_cached(static, int(max_depth), int(rr_start),
                              tile_m, interpret, False, stream_tris)
        out = fwd(mk.pack_prims(scene, static), rays, seeds, spect_p,
                  *mesh_arrays)
    return out


def render_pixels(scene, width: int, height: int, px, py, sample,
                  max_depth: int = 8, rr_start: int = 1,
                  static: SceneStatic | None = None,
                  backward: str = "pallas", mesh_packs=None,
                  tile_m: int | None = None, mesh_plans=None,
                  wavefront: bool | None = None,
                  stream_tris: bool | None = None,
                  vis_grads=False):
    """Pallas analogue of xla_tracer.render_pixels -> XYZ (R, 3).

    With backward="pallas" (default) this is a plain differentiable
    composition: the kernel's custom_vjp covers the trace (the taped
    guided replay for mesh scenes), XLA AD covers camera ray-gen, the
    spectra gather, and the CIE conversion. With backward="xla" the
    whole pixel function gets a recompute-vjp through the XLA tracer
    instead (slow at mesh scale: no BVH in that path's backward).

    vis_grads: the "screen" warped-area domain (ops/warp.py) runs ON
    THIS FAST PATH — the warp is XLA-side pre-work (film-coordinate
    reparameterization before ray-gen) and post-work (detJ + zero-
    primal tent splat), wrapped around the Pallas kernel trace whose
    custom_vjp carries d(radiance)/d(ray) back into the warp. Primal
    radiance is bit-identical to vis_grads=("screen",) on the XLA path
    (same unstratified draws). The "light"/"hemi" domains hook INSIDE
    the bounce loop and stay on the XLA oracle path (backward="xla" /
    tracer.xla vis_grads) — requesting them here raises.
    """
    if static is None:
        static = SceneStatic.from_scene(scene)
    scene = scene_data.as_jax(scene)
    sample_u = jnp.asarray(sample, jnp.uint32)
    domains = xla_tracer._vis_domains(vis_grads)
    if set(domains) - {"screen"}:
        raise ValueError(
            f"the Pallas path supports vis_grads=('screen',); domains "
            f"{sorted(set(domains) - {'screen'})} hook inside the bounce "
            "loop — use the XLA path (tracer.xla render_pixels "
            "vis_grads=...) for them")
    if domains and jnp.shape(px)[0] != width * height:
        raise ValueError(
            "vis_grads 'screen' requires full-film row-major rays "
            "(the tent splat scatters by py*width+px)")

    def run(scene, sample_u):
        seed = rng.seed_pixel(px, py, sample_u)
        if domains:
            from computeraytracer_tpu.ops import warp
            cam = scene.camera
            frame = cam_ops.film_frame(cam.eye, cam.lookat, cam.up,
                                       cam.fov, width, height)
            s, t, seed = cam_ops.film_coords(width, height, px, py,
                                             sample_u, seed,
                                             stratified=False)
            s, t, detj = warp.screen_warp(scene, width, height, s, t)
            o, d = cam_ops.film_ray(cam.eye, *frame, s, t)
        else:
            o, d, seed = cam_ops.camera_rays(
                scene.camera.eye, scene.camera.lookat, scene.camera.up,
                scene.camera.fov, width, height, px, py, sample_u, seed)
        lambdas, seed = spec.sample_wavelengths(seed)
        radiance = trace_radiance(scene, o, d, lambdas, seed, max_depth,
                                  rr_start, tile_m=tile_m, static=static,
                                  backward=backward,
                                  mesh_packs=mesh_packs,
                                  mesh_plans=mesh_plans,
                                  wavefront=wavefront,
                                  stream_tris=stream_tris)
        xyz = spec.spectral_to_xyz(scene.cie, radiance, lambdas)
        if domains:
            xyz = xyz * detj[..., None]
            xyz = xyz + xla_tracer._splat_correction(xyz, s, t, width,
                                                     height)
        return xyz

    if backward != "xla":
        return run(scene, sample_u)

    import numpy as np

    @jax.custom_vjp
    def run_cv(scene, sample_u):
        return run(scene, sample_u)

    def run_fwd(scene, sample_u):
        return run_cv(scene, sample_u), (scene, sample_u)

    def run_bwd(res, g):
        scene_res, sample_res = res
        _, vjp = jax.vjp(
            lambda s: xla_tracer.render_pixels(
                s, width, height, px, py, sample_res, max_depth, rr_start),
            scene_res)
        (d_scene,) = vjp(g)
        d_sample = np.zeros(np.shape(sample_res), dtype=jax.dtypes.float0)
        return d_scene, d_sample

    run_cv.defvjp(run_fwd, run_bwd)
    return run_cv(scene, sample_u)


def render_pixels_planar(scene, width: int, height: int, px, py, sample,
                         max_depth: int = 8, rr_start: int = 1,
                         static: SceneStatic | None = None,
                         backward: str = "pallas", mesh_packs=None,
                         tile_m: int | None = None, mesh_plans=None,
                         wavefront: bool | None = None,
                         stream_tris: bool | None = None):
    """render_pixels in planar layout -> XYZ (3, R), ray axis minor.

    The production hot path. Two TPU-layout facts drive it:

    1. Every (R, k) array with k in {3, 4, 6} pads its minor dim to 128
       lanes under TPU (8, 128) tiling — a 21-42x HBM and vector-lane
       blowup on multi-hundred-MB per-ray intermediates. Here RNG
       state, ray origins/directions, radiance, and XYZ all keep the
       ray axis minor ((k, R) planes), feeding the megakernel's
       (k, M, 128) operands with plain reshapes instead of relayouts.
    2. Per-ray table lookups (spectra, CIE) become ONE hero-indexed
       one-hot MXU contraction over the hero-expanded tables
       (ops/spectrum.py:gather_hero_planar): the 4 companion
       wavelengths are (hero + 4j) % 301 (wgsl:315-322), so they fold
       into rolled table rows instead of per-ray gather sites. Measured
       on v5e at 1024^2: 0.08 ms vs 25 ms for the (R, k) gathers this
       replaces, and the backward is the transposed fused dot.

    Radiance is bit-identical to render_pixels (same draws, same op
    order); use render_pixels when the caller wants (R, 3).
    """
    if backward == "xla":  # recompute-vjp path stays on the (R, 3) API
        return render_pixels(scene, width, height, px, py, sample,
                             max_depth, rr_start, static=static,
                             backward=backward, mesh_packs=mesh_packs,
                             tile_m=tile_m, mesh_plans=mesh_plans,
                             wavefront=wavefront,
                             stream_tris=stream_tris).T
    if static is None:
        static = SceneStatic.from_scene(scene)
    scene = scene_data.as_jax(scene)
    sample_u = jnp.asarray(sample, jnp.uint32)
    (static, backward, wavefront, tile_m,
     mesh_arrays) = _resolve(scene, static, backward, wavefront, tile_m,
                             mesh_packs, mesh_plans)

    seed = rng.seed_pixel_p(px, py, sample_u)
    o_p, d_p, seed = cam_ops.camera_rays_p(
        scene.camera.eye, scene.camera.lookat, scene.camera.up,
        scene.camera.fov, width, height, px, py, sample_u, seed)
    hero, seed = spec.sample_wavelengths_p(seed)

    r = px.shape[0]
    tile = tile_m * LANES
    r_pad = ((r + tile - 1) // tile) * tile
    m = r_pad // LANES

    def pad_p(x):
        if r_pad == r:
            return x
        return jnp.zeros(x.shape[:-1] + (r_pad,),
                         x.dtype).at[..., :r].set(x)

    rays = pad_p(jnp.concatenate([o_p, d_p], axis=0)).reshape(6, m, LANES)
    seeds = pad_p(seed).reshape(4, m, LANES)
    hero_p = pad_p(hero)  # padded lanes select column 0: never consumed
    s_n = scene.spectra.shape[0]
    table = jnp.concatenate([spec.expand_hero_table(scene.spectra),
                             spec.cie_window_exp(scene.cie)], axis=0)
    planes = spec.gather_hero_planar(table, hero_p)  # (s_n*4+12, r_pad)
    spect_p = planes[:s_n * 4].reshape(s_n * 4, m, LANES)
    cie_p = planes[s_n * 4:, :r]
    out = _dispatch(scene, static, rays, seeds, spect_p, max_depth,
                    rr_start, tile_m, backward, wavefront, stream_tris,
                    mesh_arrays)
    radiance = out.reshape(4, r_pad)[:, :r]
    return spec.spectral_to_xyz_p(cie_p, radiance)


def render_sample_planar(scene, width: int, height: int, sample,
                         max_depth: int = 8, rr_start: int = 1,
                         static: SceneStatic | None = None,
                         backward: str = "pallas", mesh_packs=None,
                         tile_m: int | None = None, mesh_plans=None,
                         wavefront: bool | None = None,
                         stream_tris: bool | None = None, **_):
    """render_sample in planar layout -> XYZ (3, height, width).

    Same pixel order and values as render_sample; the (3, H, W) image
    keeps W minor so accumulation loops over samples never touch a
    padded (H, W, 3) layout (which TPU pads 42x)."""
    if static is None:
        static = SceneStatic.from_scene(scene)
    if static.mesh_parts and mesh_packs is None and mesh_plans is None:
        mesh_packs = mesh_packs_for(scene, static)
    order = None
    if static.mesh_parts:
        tm = tile_m if tile_m is not None else mk.MESH_TILE_M
        order = _block_order(width, height, tm * LANES)
    if order is None:
        px, py = xla_tracer.tile_coords(width, height, 0)
    else:
        px, py, inv = (jnp.asarray(a) for a in order)
    xyz = render_pixels_planar(scene, width, height, px, py, sample,
                               max_depth, rr_start, static=static,
                               backward=backward, mesh_packs=mesh_packs,
                               tile_m=tile_m, mesh_plans=mesh_plans,
                               wavefront=wavefront,
                               stream_tris=stream_tris)
    if order is not None:
        xyz = jnp.take(xyz, inv, axis=1)
    return xyz.reshape(3, height, width)


@functools.lru_cache(maxsize=32)
def _block_order(width: int, height: int, tile_rays: int):
    """Pixel coordinates in compact-block order, plus the inverse map.

    The mesh BVH culls at RAY-TILE granularity: a box is entered when
    ANY ray in the tile can hit it. Row-major tiles are full-width
    strips whose frusta cross the whole scene; square-ish blocks of the
    same ray count subtend a compact solid angle and skip most of the
    tree. Returns (px, py, inv) with inv the permutation that restores
    row-major film order, or None when the film doesn't tile evenly.
    """
    import numpy as np

    bw = 1
    while bw * bw < tile_rays:
        bw *= 2
    bh = tile_rays // bw  # bw >= bh, both powers of two
    if width % bw or height % bh:
        return None
    ys, xs = np.mgrid[0:height, 0:width].astype(np.uint32)
    # (by, bx, iy, ix) block-major layout
    ys = ys.reshape(height // bh, bh, width // bw, bw).swapaxes(1, 2)
    xs = xs.reshape(height // bh, bh, width // bw, bw).swapaxes(1, 2)
    px, py = xs.reshape(-1).copy(), ys.reshape(-1).copy()
    flat = py.astype(np.int64) * width + px.astype(np.int64)
    inv = np.empty(width * height, np.int32)
    inv[flat] = np.arange(width * height, dtype=np.int32)
    # numpy results only: jnp conversion happens at the call site so the
    # cache never captures trace-scoped constants
    return px, py, inv


def render_sample(scene, width: int, height: int, sample,
                  max_depth: int = 8, rr_start: int = 1,
                  static: SceneStatic | None = None,
                  backward: str = "pallas", mesh_packs=None,
                  tile_m: int | None = None, mesh_plans=None,
                  wavefront: bool | None = None,
                  stream_tris: bool | None = None,
                  vis_grads=False, **_):
    if static is None:
        static = SceneStatic.from_scene(scene)
    if static.mesh_parts and mesh_packs is None and mesh_plans is None:
        mesh_packs = mesh_packs_for(scene, static)
    order = None
    if static.mesh_parts and not vis_grads:
        # (the screen-warp splat needs row-major full-film rays; mesh
        # scenes' block order is a culling optimization, not semantics)
        tm = tile_m if tile_m is not None else mk.MESH_TILE_M
        order = _block_order(width, height, tm * LANES)
    if order is None:
        px, py = xla_tracer.tile_coords(width, height, 0)
    else:
        px, py, inv = (jnp.asarray(a) for a in order)
    xyz = render_pixels(scene, width, height, px, py, sample, max_depth,
                        rr_start, static=static, backward=backward,
                        mesh_packs=mesh_packs, tile_m=tile_m,
                        mesh_plans=mesh_plans, wavefront=wavefront,
                        stream_tris=stream_tris, vis_grads=vis_grads)
    if order is not None:
        xyz = jnp.take(xyz, inv, axis=0)
    return xyz.reshape(height, width, 3)


@functools.partial(jax.jit, static_argnames=(
    "static", "width", "height", "spp", "max_depth", "rr_start"))
def _render_accumulate_jit(scene, static, mesh_packs, width, height, spp,
                           max_depth, rr_start, first_sample):
    # first_sample is TRACED (a u32 offset): --progressive calls this
    # once per chunk with a different first_sample, and a static arg
    # would recompile the megakernel every chunk (ADVICE r4)
    def body(accum, s):
        return accum + render_sample(scene, width, height, s, max_depth,
                                     rr_start, static=static,
                                     mesh_packs=mesh_packs), None

    accum0 = jnp.zeros((height, width, 3), jnp.float32)
    samples = first_sample + jnp.arange(spp, dtype=jnp.uint32)
    accum, _ = jax.lax.scan(body, accum0, samples)
    return accum


def render_accumulate(scene, width: int, height: int, spp: int,
                      max_depth: int = 8, rr_start: int = 1,
                      first_sample: int = 1):
    static = SceneStatic.from_scene(scene)
    mesh_packs = (mesh_packs_for(scene, static)
                  if static.mesh_parts else None)
    return _render_accumulate_jit(scene, static, mesh_packs, width, height,
                                  spp, max_depth, rr_start,
                                  jnp.uint32(first_sample))
