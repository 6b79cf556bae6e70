#!/usr/bin/env python
"""Capture an XProf trace of one render and print top device ops.

The quick answer to "where does device time actually go" without
TensorBoard: runs a few warmed iterations under jax.profiler.trace
(utils/profiling.py) and aggregates the trace's device-side events.

    python benchmarks/trace_breakdown.py --size 512 --depth 8 --grad
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(logdir: str, top: int = 25) -> None:
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace files found")
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pname = pids.get(e.get("pid"), "?")
            if "CPU" in pname.upper():
                continue  # host-side python frames: not device cost
            dur[e["name"]] += e["dur"]
    total = sum(dur.values())
    print(f"device total: {total / 1000:.2f} ms (all iterations)")
    for name, d in dur.most_common(top):
        print(f"{d / 1000:10.2f} ms  {100 * d / total:5.1f}%  {name[:100]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--grad", action="store_true",
                    help="trace value_and_grad instead of forward")
    ap.add_argument("--mesh", type=int, default=0, metavar="SUB",
                    help="trace the mesh wavefront (subdivisions=SUB)")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/crt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pt
    from computeraytracer_tpu.utils import profiling

    W = H = args.size
    if args.mesh:
        scene, _ = scene_from_dict(
            presets.mesh_scene(W, H, subdivisions=args.mesh))
    else:
        scene, _ = scene_from_dict(presets.cornell_box(W, H))
    static = pt.SceneStatic.from_scene(scene)

    if args.grad:
        def loss(spectra):
            s = scene._replace(spectra=spectra)
            img = pt.render_sample(s, W, H, 1, max_depth=args.depth,
                                   static=static)
            return jnp.mean(img ** 2)

        g = jax.jit(jax.value_and_grad(loss))
        spectra = jnp.asarray(scene.spectra)
        run = lambda: jax.block_until_ready(g(spectra))
    elif args.mesh:
        packs = pt.mesh_packs_for(scene, static)
        f = jax.jit(lambda: pt.render_sample_planar(
            scene, W, H, 1, max_depth=args.depth, static=static,
            mesh_packs=packs, backward="none").sum())
        run = lambda: _sync(f())
    else:
        f = jax.jit(lambda s: pt.render_sample(
            s, W, H, 1, max_depth=args.depth, static=static).sum())
        run = lambda: _sync(f(scene))

    def _sync(x):
        jax.block_until_ready(x)
        np.asarray(x)
        return x

    run(), run()  # compile + warm
    logdir = args.logdir or tempfile.mkdtemp(prefix="crt_trace_")
    with profiling.trace(logdir):
        for _ in range(args.iters):
            run()
    print(f"trace: {logdir}")
    summarize(logdir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
