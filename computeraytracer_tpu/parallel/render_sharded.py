"""Sharded rendering: film rows over 'dp', samples over 'sp'.

TPU-native replacement for the reference's single-device dispatch grid
(/root/reference/src/main.js:606-610): shard_map over a (dp, sp) mesh
with the scene replicated on every device. Each device renders its own
film-row tile for its own slice of the sample set; the only forward
collective is the psum of XYZ accumulators over the sample axis. Seeds
derive from global pixel coordinates, so the sharded render consumes
exactly the same sample set as a single-device render (equal up to f32
rounding: XLA fuses differently per shard shape, which can flip rare
Russian-roulette decisions).

Everything here is differentiable: jax.grad through shard_map transposes
the psum automatically, producing the gradient all-reduce of SURVEY.md
§2.4 without hand-written communication.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from computeraytracer_tpu.parallel.mesh import DP_AXIS, SP_AXIS
from computeraytracer_tpu.tracer import xla as xla_tracer


def render_accumulate_sharded(scene, width: int, height: int, spp: int,
                              mesh, max_depth: int = 8, rr_start: int = 1,
                              first_sample: int = 1, use_remat: bool = True,
                              bvh=None, kernel: str = "xla", static=None):
    """Accumulated XYZ (H, W, 3) over spp samples, sharded over `mesh`.

    height must divide by mesh dp size; spp by mesh sp size. The result
    matches render_accumulate(...) (same seeds, same sample set) up to
    f32 rounding. bvh (BVHArrays, replicated like the scene) switches
    the per-device intersector to stackless BVH traversal. With
    kernel="pallas" each device runs the Pallas megakernel on its film
    tile (incl. the chunked mesh scan for large triangle runs) — the
    mesh-scale configs (BASELINE configs 3/5) shard exactly like the
    few-primitive ones because the film plane, not the scene, is the
    parallel axis.
    """
    dp = mesh.shape[DP_AXIS]
    sp = mesh.shape[SP_AXIS]
    if height % dp != 0:
        raise ValueError(f"height {height} not divisible by dp={dp}")
    if spp % sp != 0:
        raise ValueError(f"spp {spp} not divisible by sp={sp}")
    tile_h = height // dp
    local_spp = spp // sp

    mesh_packs = None
    block = None
    if kernel == "pallas":
        from computeraytracer_tpu.kernels import megakernel as mk
        from computeraytracer_tpu.tracer import pallas as pallas_tracer
        if static is None:
            static = pallas_tracer.SceneStatic.from_scene(scene)
        if static.mesh_parts:
            mesh_packs = pallas_tracer.mesh_packs_for(scene, static)
            # per-shard block-coherent pixel order: the in-kernel mesh
            # BVH culls at ray-tile granularity, and a row-major shard
            # tile is a full-width strip whose frustum crosses the whole
            # scene (see pallas._block_order). Seeds come from GLOBAL
            # pixel coordinates, so the permutation cannot change any
            # sample value — only which lanes share a tile.
            block = pallas_tracer._block_order(
                width, tile_h, mk.MESH_TILE_M * mk.LANES)

    def render_tile(scene, bvh, px, py, s):
        if kernel == "pallas":
            from computeraytracer_tpu.tracer import pallas as pallas_tracer
            return pallas_tracer.render_pixels(
                scene, width, height, px, py, s, max_depth, rr_start,
                static=static, mesh_packs=mesh_packs)
        return xla_tracer.render_pixels(
            scene, width, height, px, py, s, max_depth, rr_start,
            use_remat, bvh=bvh)

    # check_vma=False: the path-trace scan mixes replicated scene data
    # into device-varying carries, which trips jax's varying-manual-axes
    # typing; semantics are unaffected (pure per-shard compute + psum).
    @partial(shard_map, mesh=mesh, in_specs=(P(), P()),
             out_specs=P(DP_AXIS, None, None), check_vma=False)
    def fn(scene, bvh):
        dpi = jax.lax.axis_index(DP_AXIS)
        spi = jax.lax.axis_index(SP_AXIS)
        y0 = dpi.astype(jnp.uint32) * jnp.uint32(tile_h)
        if block is None:
            px, py = xla_tracer.tile_coords(width, tile_h, y0)
            inv = None
        else:
            px_b, py_b, inv_b = block
            px = jnp.asarray(px_b)
            py = jnp.asarray(py_b) + y0
            inv = jnp.asarray(inv_b)

        def body(acc, k):
            s = (jnp.uint32(first_sample) + spi.astype(jnp.uint32)
                 * jnp.uint32(local_spp) + k)
            return acc + render_tile(scene, bvh, px, py, s), None

        acc0 = jnp.zeros((tile_h * width, 3), jnp.float32)
        acc, _ = jax.lax.scan(body, acc0,
                              jnp.arange(local_spp, dtype=jnp.uint32))
        acc = jax.lax.psum(acc, SP_AXIS)
        if inv is not None:
            acc = jnp.take(acc, inv, axis=0)
        return acc.reshape(tile_h, width, 3)

    if bvh is not None:
        import jax.tree_util as jtu
        bvh = jtu.tree_map(jnp.asarray, bvh)
    # jit the whole sharded program: without it shard_map executes
    # eagerly, dispatching op-by-op (27x slower through a remote tunnel)
    return jax.jit(fn)(scene, bvh)
