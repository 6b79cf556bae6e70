#!/usr/bin/env python
"""Run the five staged configs from BASELINE.json and emit JSON records.

Each config prints one JSON line {"config": N, ...}. Configs that exceed
a single chip (config 5 is specified for a multi-host pod slice at
2048^2 x 64 spp over ~1M tris) run a scaled-down shape by default and
say so in the record — pass --full to attempt the specified shape.

    python benchmarks/staged_configs.py            # configs 1-4
    python benchmarks/staged_configs.py --configs 5 --full
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(rec):
    print(json.dumps(rec), flush=True)


def _time_render(render_fn, paths, iters=2):
    import jax

    jax.block_until_ready(render_fn())  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(render_fn())
        # host-copy one leaf: under the remote-TPU tunnel
        # block_until_ready alone can return early (see bench.py _sync)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best, paths / best / 1e6


def config1():
    """Few-primitive scene, 256^2, 1 spp, primary rays: Pallas vs the
    XLA tracer (itself pinned to the scalar CPU oracle in tests/)."""
    import jax.numpy as jnp

    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt
    from computeraytracer_tpu.tracer import xla as xt

    w = h = 256
    scene, _ = scene_from_dict(presets.simple_scene(w, h))
    static = pt.SceneStatic.from_scene(scene)
    a = pt.render_sample(scene, w, h, 1, max_depth=1, static=static)
    b = xt.render_sample(scene, w, h, 1, max_depth=1)
    err = float(jnp.max(jnp.abs(a - b)))
    t, mpaths = _time_render(
        lambda: pt.render_sample(scene, w, h, 1, max_depth=1,
                                 static=static), w * h)
    _emit({"config": 1, "scene": "simple 256^2 1spp depth1",
           "max_abs_err_vs_xla": err, "allclose": err < 1e-4,
           "seconds": round(t, 4), "mpaths_per_s": round(mpaths, 3)})


def config2():
    """Cornell ~1K-primitive-scale scene, 512^2, 4-bounce diffuse."""
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    w = h = 512
    spp = 4
    scene, _ = scene_from_dict(presets.cornell_box(w, h))
    t, mpaths = _time_render(
        lambda: pt.render_accumulate(scene, w, h, spp=spp, max_depth=4),
        w * h * spp)
    _emit({"config": 2, "scene": "cornell 512^2 4spp depth4",
           "seconds": round(t, 4), "mpaths_per_s": round(mpaths, 3)})


def config3(full=False):
    """~70K-tri mesh at 1024^2 (8 spp when --full): forward throughput,
    full-resolution vertex+albedo gradients through the Pallas taped
    replay backward, and a finite-difference check at test scale —
    everything on the Pallas path (no XLA fallback)."""
    import jax
    import jax.numpy as jnp

    from computeraytracer_tpu.kernels import meshpack
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    w = h = 1024
    spp = 8 if full else 1
    scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=6))
    n_tris = int(np.asarray(scene.primitives.category).shape[0])
    static0 = pt.SceneStatic.from_scene(scene)
    packs = pt.mesh_packs_for(scene, static0)

    # forward on the production planar path (the (H, W, 3) layout pads
    # its 3-wide minor dim 42x on TPU; render_sample_planar is what the
    # training loop and bench.py use)
    @jax.jit
    def fwd():
        def body(acc, s):
            return acc + pt.render_sample_planar(
                scene, w, h, s, max_depth=3, static=static0,
                mesh_packs=packs, backward="none"), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((3, h, w), jnp.float32),
            jnp.arange(1, spp + 1, dtype=jnp.uint32))
        return acc

    t, mpaths = _time_render(fwd, w * h * spp, iters=1)

    # full-resolution vertex+albedo gradient through the taped replay
    static = pt.SceneStatic.from_scene(scene)
    plans = tuple(meshpack.plan_scene_mesh(scene, part)
                  for part in static.mesh_parts)

    def loss_full(d1, sp):
        s = scene._replace(
            primitives=scene.primitives._replace(data1=d1), spectra=sp)
        return jnp.sum(pt.render_sample(s, w, h, 1, max_depth=3,
                                        static=static, mesh_plans=plans))

    d1f = jnp.asarray(scene.primitives.data1)
    spf = jnp.asarray(scene.spectra)
    gfn = jax.jit(jax.value_and_grad(loss_full, argnums=(0, 1)))
    tg, _ = _time_render(lambda: gfn(d1f, spf), w * h, iters=1)
    _, (gd1, gsp) = gfn(d1f, spf)
    grads_finite = bool(np.isfinite(np.asarray(gd1)).all()
                        and np.isfinite(np.asarray(gsp)).all())
    mesh_grad_nonzero = bool(np.abs(np.asarray(gd1)[6:]).max() > 0)

    # FD gradient check (test-scale scene: FD at 1024^2 is pure noise),
    # also through the Pallas replay backward
    gw = gh = 32
    gscene, _ = scene_from_dict(presets.mesh_scene(gw, gh, subdivisions=2))
    gstatic = pt.SceneStatic.from_scene(gscene)
    gplans = tuple(meshpack.plan_scene_mesh(gscene, part)
                   for part in gstatic.mesh_parts)

    def loss(d1):
        s = gscene._replace(primitives=gscene.primitives._replace(data1=d1))
        return jnp.sum(pt.render_sample(s, gw, gh, 1, max_depth=2,
                                        static=gstatic, mesh_plans=gplans))

    d1 = jnp.asarray(gscene.primitives.data1)
    g = jax.grad(loss)(d1)
    # check the most influential mesh-triangle vertex coordinate
    # (patches are rows 0-5; a fixed row can land on an unhit triangle)
    g_mesh = np.asarray(g)[6:]
    row, col = np.unravel_index(np.argmax(np.abs(g_mesh)), g_mesh.shape)
    row += 6
    eps = 0.05
    fd = (loss(d1.at[row, col].add(eps))
          - loss(d1.at[row, col].add(-eps))) / (2 * eps)
    ad = float(g[row, col])
    fd = float(fd)
    rel = abs(ad - fd) / max(abs(fd), 1e-6)
    _emit({"config": 3, "scene": f"mesh {n_tris} tris 1024^2 spp{spp}",
           "scaled_down": not full, "seconds": round(t, 3),
           "mpaths_per_s": round(mpaths, 4),
           "fwd_bwd_seconds_1spp": round(tg, 3),
           "grads_finite": grads_finite,
           "mesh_vertex_grad_nonzero": mesh_grad_nonzero,
           "vertex_grad_ad": ad, "vertex_grad_fd": fd,
           "grad_rel_err": round(rel, 4)})


def config4():
    """Multi-material scene, gradient-based material optimization."""
    import jax.numpy as jnp

    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.train import optimize as opt

    w = h = 128  # the loop is the subject; 1024^2 just scales the film
    scene, _ = scene_from_dict(presets.cornell_box(w, h))
    target = opt.render_mean_xyz(scene, w, h, spp=4, max_depth=4)
    # dim the white spectrum: every diffuse surface carries signal
    perturbed = scene._replace(
        spectra=jnp.asarray(scene.spectra).at[0].mul(0.5))
    t0 = time.perf_counter()
    _, losses = opt.optimize(perturbed, target, w, h,
                             trainable=("spectra",), steps=20,
                             learning_rate=0.02, spp=4, max_depth=4,
                             kernel="pallas")
    dt = time.perf_counter() - t0
    _emit({"config": 4, "scene": "cornell multi-material (diffuse/glass/"
           "emissive) optimization",
           "initial_loss": losses[0], "final_loss": losses[-1],
           "loss_reduced": losses[-1] < losses[0],
           "steps": len(losses), "seconds": round(dt, 2)})


def config5(full=False):
    """Large mesh sharded over every visible device with grad psum
    semantics (multi-host shapes validated on the CPU mesh in tests).

    --full runs the specified GEOMETRY and film (1.3M tris, 2048^2) as
    a 1-spp single-chip slice: the 64-spp spec is a pod-scale sample
    budget (spp shards over the mesh 'sp' axis with no extra per-chip
    work — render_sharded), so the per-chip record is the 1-spp cost.
    This is the config that exercises the HBM tri_rows streaming path
    (megakernel.should_stream_tris > 400K tris) on real hardware."""
    from computeraytracer_tpu.kernels import megakernel as mk
    from computeraytracer_tpu.parallel import mesh as mesh_mod
    from computeraytracer_tpu.parallel import render_sharded
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt

    if full:
        w = h = 2048
        spp, sub = 1, 8  # ~1.3M tris at the specified film size
    else:
        w = h = 256
        spp, sub = 1, 7  # ~327K tris: single-chip-sane demonstrator
    scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=sub))
    n_tris = int(np.asarray(scene.primitives.category).shape[0])
    static = pt.SceneStatic.from_scene(scene)
    mesh = mesh_mod.make_mesh()
    t, mpaths = _time_render(
        lambda: render_sharded.render_accumulate_sharded(
            scene, w, h, spp, mesh, max_depth=2, kernel="pallas"),
        w * h * spp, iters=1)
    _emit({"config": 5, "scene": f"mesh {n_tris} tris {w}^2 spp{spp} "
           f"sharded mesh={dict(mesh.shape)}", "scaled_down": not full,
           "spec_spp": 64, "measured_spp": spp,
           "stream_tris": bool(mk.should_stream_tris(static)),
           "seconds": round(t, 2), "mpaths_per_s": round(mpaths, 4)})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--full", action="store_true",
                    help="attempt the full BASELINE shapes (pod-scale)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/crt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    fns = {1: config1, 2: config2, 3: lambda: config3(args.full),
           4: config4, 5: lambda: config5(args.full)}
    for c in args.configs:
        fns[c]()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
