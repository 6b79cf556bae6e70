#!/usr/bin/env python
"""Headline benchmark: Cornell-box spectral path tracing throughput.

Prints ONE JSON line:
  {"metric": "pallas_fwd_mpaths_per_s", "value": N, "unit": "Mpaths/s",
   "vs_baseline": N}

- metric: forward path-trace throughput of the Pallas megakernel at
  1024x1024, 1 spp, max_depth=8 (full NEE/MIS/RR/glass estimator) on one
  chip. One "path" = one camera sample (each path casts ~2 rays/bounce:
  closest-hit + shadow).
- vs_baseline: speedup over the naive XLA tracer (the reference-
  equivalent lax.scan/vmap implementation, tracer/xla.py) on the same
  workload — BASELINE.md's ">=2x vs naive XLA tracer" target.

The reference publishes no numbers (BASELINE.md): the baseline is our
own naive XLA tracer, as specified by BASELINE.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _time_render(fn, iters: int = 3) -> float:
    import jax

    # warmup/compile
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer import pallas as pallas_tracer
    from computeraytracer_tpu.tracer import xla as xla_tracer

    w = h = args.size
    scene, _ = scene_from_dict(presets.cornell_box(w, h))
    paths = w * h  # 1 spp

    xla_s = _time_render(
        lambda: xla_tracer.render_accumulate(scene, w, h, spp=1,
                                             max_depth=args.depth),
        args.iters)
    xla_rate = paths / xla_s / 1e6

    try:
        pal_s = _time_render(
            lambda: pallas_tracer.render_accumulate(scene, w, h, spp=1,
                                                    max_depth=args.depth),
            args.iters)
        pal_rate = paths / pal_s / 1e6
        result = {
            "metric": "pallas_fwd_mpaths_per_s",
            "value": round(pal_rate, 4),
            "unit": "Mpaths/s",
            "vs_baseline": round(pal_rate / xla_rate, 4),
        }
    except Exception as e:  # pallas path must never zero out the bench
        print(f"pallas bench failed ({type(e).__name__}: {e}); "
              f"reporting naive XLA tracer", file=sys.stderr)
        result = {
            "metric": "xla_fwd_mpaths_per_s",
            "value": round(xla_rate, 4),
            "unit": "Mpaths/s",
            "vs_baseline": 1.0,
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
