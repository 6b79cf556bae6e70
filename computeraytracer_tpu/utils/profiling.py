"""Tracing / profiling hooks (SURVEY.md §5 "Tracing / profiling").

The reference has no instrumentation at all — no timestamp queries, no
GPU profiling hooks (/root/reference/src/main.js has only a vsync-tied
requestAnimationFrame loop at :620). The TPU framework exposes:

- :func:`trace` — an XProf/TensorBoard device trace of a code region
  (``jax.profiler.trace``), viewable with ``tensorboard --logdir`` or
  xprof; captures per-kernel device timelines including Pallas
  megakernel launches and XLA fusions.
- :func:`annotate` — named host annotations that show up inside a trace
  (``jax.profiler.TraceAnnotation``).
- :func:`roofline` — an analytic cost model of the path-tracing
  workload (FLOPs, HBM bytes, arithmetic intensity) and the implied
  speed-of-light time on a given chip, so a measured wall time converts
  to a speed-of-light fraction — the BASELINE.md "fraction of
  speed-of-light" metric.

Wall-clock throughput counters (paths/s, rays/s) live in
``utils.metrics.RenderMeter``; this module is about *device-side*
visibility and analytic ceilings.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, asdict


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture an XProf trace of the enclosed region into ``logdir``.

    Usage::

        with profiling.trace("/tmp/xprof"):
            img = render_sample(scene, ...)
            jax.block_until_ready(img)

    Remember to block on results *inside* the region — dispatch is
    async, and an un-synced region records only the host-side enqueue.
    """
    import jax

    with jax.profiler.trace(logdir, create_perfetto_trace=False):
        yield


def annotate(name: str):
    """Named region that appears on the host timeline of a trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


# Peak specs for common TPU generations: (bf16 matmul TFLOP/s,
# f32 vector TFLOP/s (VPU), HBM GB/s). Path tracing is vector-unit
# work, so the f32 VPU number is the relevant compute ceiling.
CHIP_PEAKS = {
    "v4": (275.0, 4.3, 1228.0),
    "v5e": (197.0, 3.1, 819.0),
    "v5p": (459.0, 7.2, 2765.0),
    "v6e": (918.0, 7.3, 1640.0),
}


@dataclass
class Roofline:
    flops: float            # total f32 vector FLOPs for the workload
    hbm_bytes: float        # HBM traffic (scene reads + film writes)
    intensity: float        # FLOPs / byte
    sol_compute_s: float    # time if VPU-bound at peak
    sol_memory_s: float     # time if HBM-bound at peak
    sol_s: float            # max of the two = speed-of-light time
    bound: str              # "compute" | "memory"

    def fraction(self, measured_s: float) -> float:
        """Speed-of-light fraction achieved by a measured wall time."""
        return self.sol_s / measured_s if measured_s > 0 else 0.0

    def to_dict(self) -> dict:
        return asdict(self)


def roofline(width: int, height: int, spp: int, max_depth: int,
             n_prims: int, mean_depth: float | None = None,
             chip: str = "v5e", backward: bool = False) -> Roofline:
    """Analytic cost model of the megakernel workload.

    Per bounce each live path runs two full primitive scans (closest-hit
    + shadow, ComputeShader.wgsl:503-518 semantics) at roughly 60 f32
    ops per primitive test, plus ~400 ops of shading (NEE/MIS pdfs,
    Fresnel, hemisphere sampling, RNG). Russian roulette makes the
    effective depth ``mean_depth`` (~3 for the Cornell box when
    max_depth=8); pass it for a tighter bound, else max_depth is used.

    The Pallas kernel holds the scene and ray tile in VMEM, so HBM
    traffic is just ray/seed/spectra tile streaming plus the film
    write-back; the workload is strongly compute-bound on every chip
    generation (intensity >> ridge point).
    """
    paths = width * height * spp
    depth = mean_depth if mean_depth is not None else float(max_depth)
    ops_per_prim_test = 60.0
    ops_shading = 400.0
    flops = paths * depth * (2 * n_prims * ops_per_prim_test + ops_shading)
    # 4 wavelengths ride the lanes for free only in vector terms; count
    # them (the WGSL vec4s are real lanes of work on the VPU too).
    flops *= 4.0
    if backward:
        flops *= 3.0  # replay forward + reverse adjoint sweep ~ 3x fwd

    # HBM: per path, stream (6 ray + 4 seed + n_spectra*4 spectra) f32
    # in and 4 f32 XYZ out; scene is resident in VMEM. ~4 bytes each.
    hbm_bytes = paths * (6 + 4 + 4 + 4 * 8) * 4.0

    _, vpu_tflops, hbm_gbs = CHIP_PEAKS[chip]
    sol_c = flops / (vpu_tflops * 1e12)
    sol_m = hbm_bytes / (hbm_gbs * 1e9)
    sol = max(sol_c, sol_m)
    return Roofline(
        flops=flops, hbm_bytes=hbm_bytes,
        intensity=flops / hbm_bytes,
        sol_compute_s=sol_c, sol_memory_s=sol_m, sol_s=sol,
        bound="compute" if sol_c >= sol_m else "memory",
    )


def detect_chip() -> str:
    """Map jax device_kind to a CHIP_PEAKS key (default v5e)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key in ("v6e", "v5p", "v5e", "v4"):
        if key in kind:
            return key
    if "v5 lite" in kind or "v5litepod" in kind:
        return "v5e"
    return "v5e"


def measure_mean_depth(scene, width: int = 256, height: int = 256,
                       sample: int = 1, max_depth: int = 8,
                       rr_start: int = 1) -> float:
    """Expected bounce-loop trips per path, measured empirically.

    Runs the XLA tracer bounce-by-bounce and sums the live-lane fraction
    entering each trip — the `mean_depth` the roofline model needs to
    convert a measured wall time into a speed-of-light fraction (Russian
    roulette makes the effective depth much smaller than max_depth).
    """
    import jax
    import jax.numpy as jnp

    from computeraytracer_tpu.ops import camera as cam_ops
    from computeraytracer_tpu.ops import rng
    from computeraytracer_tpu.ops import spectrum as spec
    from computeraytracer_tpu.scene import data as scene_data
    from computeraytracer_tpu.tracer import xla as xt

    scene = scene_data.as_jax(scene)
    px, py = xt.tile_coords(width, height, 0)
    sample_u = jnp.asarray(sample, jnp.uint32)

    @jax.jit
    def alive_fractions(scene):
        seed = rng.seed_pixel(px, py, sample_u)
        o, d, seed = cam_ops.camera_rays(
            scene.camera.eye, scene.camera.lookat, scene.camera.up,
            scene.camera.fov, width, height, px, py, sample_u, seed)
        lambdas, seed = spec.sample_wavelengths(seed)
        state = xt.init_state(o, d, seed)
        isect_fn = xt.make_intersector(scene)
        fracs = []
        for depth in range(max_depth + 1):
            fracs.append(jnp.mean(state.active.astype(jnp.float32)))
            state = xt.trace_step(scene, lambdas, state, depth,
                                  max_depth, rr_start, isect_fn)
        return jnp.stack(fracs)

    return float(jnp.sum(alive_fractions(scene)))
