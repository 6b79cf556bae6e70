"""Pallas megakernel vs the XLA tracer: same estimator, same RNG.

The megakernel consumes the identical pcg4d draw stream as tracer/xla.py
(kernels/megakernel.py mirrors ops/rng.py on u32 vectors), so per-pixel
XYZ must agree to f32 rounding. On CPU the kernel runs in interpret
mode (tracer/pallas.py:_use_interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from computeraytracer_tpu.tracer import pallas as pallas_tracer
from computeraytracer_tpu.tracer import xla as xla_tracer


def _compare(scene, w, h, sample, max_depth, tol=1e-4):
    want = np.asarray(
        xla_tracer.render_sample(scene, w, h, sample, max_depth=max_depth))
    got = np.asarray(
        pallas_tracer.render_sample(scene, w, h, sample, max_depth=max_depth))
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    denom = np.maximum(np.abs(want), 1e-2)
    rel = np.abs(got - want) / denom
    frac = (rel < tol).all(axis=-1).mean()
    assert frac >= 0.999, (
        f"only {frac:.4f} of pixels match (worst rel {rel.max():.3g})")


def test_simple_scene(simple_scene):
    _compare(simple_scene, 16, 16, sample=1, max_depth=3)


def test_cornell(cornell_scene):
    _compare(cornell_scene, 16, 16, sample=2, max_depth=4)


def test_accumulate_matches_xla(simple_scene):
    w = h = 12
    want = np.asarray(xla_tracer.render_accumulate(
        simple_scene, w, h, spp=2, max_depth=3))
    got = np.asarray(pallas_tracer.render_accumulate(
        simple_scene, w, h, spp=2, max_depth=3))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mesh_chunk_scan_matches_xla():
    """Chunked Morton mesh scan (kernels/meshpack.py) == XLA brute scan.

    mesh_min=64 forces the 320-tri icosphere into a MeshPart, so the
    kernel runs the lax.cond chunk-culled path with 3 chunks."""
    from computeraytracer_tpu.kernels.megakernel import SceneStatic
    from computeraytracer_tpu.scene import presets, scene_from_dict

    scene, _ = scene_from_dict(presets.mesh_scene(12, 12, subdivisions=2))
    static = SceneStatic.from_scene(scene, mesh_min=64)
    assert static.mesh_parts and static.mesh_parts[0].count == 320
    want = np.asarray(xla_tracer.render_sample(scene, 12, 12, 1,
                                               max_depth=3))
    got = np.asarray(pallas_tracer.render_sample(scene, 12, 12, 1,
                                                 max_depth=3,
                                                 static=static))
    denom = np.maximum(np.abs(want), 1e-2)
    rel = np.abs(got - want) / denom
    assert (rel < 1e-4).all(axis=-1).mean() >= 0.999, rel.max()


def test_wavefront_matches_megakernel_bitexact():
    """trace_radiance(wavefront=True) — the binned wavefront: one shade
    dispatch per bounce with per-ray binned mesh casts in between
    (tracer/pallas.py _wavefront_forward, kernels/binned.py) — matches
    the in-kernel bounce loop. On TPU the match is bit-exact (both
    compile via Mosaic, whose VPU has no f32 FMA, and the two paths run
    the same ops in the same order). Under interpret mode (this CPU
    suite) XLA may fuse mul+add into FMA differently in the two program
    shapes, so the bound here is <=4 ulp; the TPU bit-exactness is
    asserted by benchmarks/staged_configs.py on hardware."""
    import jax.numpy as jnp

    from computeraytracer_tpu.kernels.megakernel import SceneStatic
    from computeraytracer_tpu.ops import camera as cam_ops
    from computeraytracer_tpu.ops import rng as rng_ops
    from computeraytracer_tpu.ops import spectrum as spec
    from computeraytracer_tpu.scene import presets, scene_from_dict
    from computeraytracer_tpu.tracer.pallas import trace_radiance

    w, h = 64, 32  # 2048 rays -> 2 tiles at tile_m=8: the sort runs
    scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=2))
    static = SceneStatic.from_scene(scene, mesh_min=64)
    assert static.mesh_parts
    px, py = xla_tracer.tile_coords(w, h, 0)
    seed = rng_ops.seed_pixel(px, py, jnp.uint32(1))
    o, d, seed = cam_ops.camera_rays(
        scene.camera.eye, scene.camera.lookat, scene.camera.up,
        scene.camera.fov, w, h, px, py, jnp.uint32(1), seed)
    lambdas, seed = spec.sample_wavelengths(seed)
    a = np.asarray(trace_radiance(scene, o, d, lambdas, seed, 3,
                                  static=static, tile_m=8,
                                  backward="none", wavefront=False))
    b = np.asarray(trace_radiance(scene, o, d, lambdas, seed, 3,
                                  static=static, tile_m=8,
                                  backward="none", wavefront=True))
    assert np.isfinite(a).all() and np.abs(a).max() > 0
    ulp = np.abs(a.view(np.int32) - b.view(np.int32))
    assert ulp.max() <= 4, (ulp.max(), np.abs(a - b).max())
    assert (ulp > 0).mean() < 0.05  # overwhelmingly identical even here


def test_wavefront_gradients_match_replay():
    """Wavefront gradients route through the SAME taped guided replay;
    the tapes differ only in don't-care entries (scans skipped by one
    path's tile gating but masked off per-lane in both), so gradients
    agree with the in-kernel-loop path to f32 fusion noise."""
    import jax

    from computeraytracer_tpu.kernels import meshpack
    from computeraytracer_tpu.kernels.megakernel import SceneStatic
    from computeraytracer_tpu.scene import presets, scene_from_dict

    w, h = 32, 16  # 512 rays -> 2 tiles at tile_m=2
    scene, _ = scene_from_dict(presets.mesh_scene(w, h, subdivisions=1))
    static = SceneStatic.from_scene(scene, mesh_min=16)
    assert static.mesh_parts
    plans = tuple(meshpack.plan_scene_mesh(scene, part)
                  for part in static.mesh_parts)

    def loss(d1, sp, wavefront):
        s = scene._replace(
            primitives=scene.primitives._replace(data1=d1), spectra=sp)
        return jnp.sum(pallas_tracer.render_sample(
            s, w, h, 1, max_depth=2, static=static, mesh_plans=plans,
            tile_m=2, wavefront=wavefront) ** 2)

    d1 = jnp.asarray(scene.primitives.data1)
    sp = jnp.asarray(scene.spectra)
    g_mk = jax.grad(lambda a, b: loss(a, b, False), argnums=(0, 1))(d1, sp)
    g_wf = jax.grad(lambda a, b: loss(a, b, True), argnums=(0, 1))(d1, sp)
    for gw, gm in zip(g_wf, g_mk):
        gw, gm = np.asarray(gw), np.asarray(gm)
        assert np.isfinite(gw).all()
        scale = max(np.abs(gm).max(), 1e-6)
        np.testing.assert_allclose(gw / scale, gm / scale,
                                   rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(g_wf[0])[6:]).max() > 0


def test_mesh_scene_gradients_via_replay():
    """Mesh-part gradients flow through the taped guided replay
    (tracer/replay.py): vertex positions (data1) AND spectra both match
    JAX AD of the XLA tracer — the BASELINE config-3 capability."""
    import jax

    from computeraytracer_tpu.kernels.megakernel import SceneStatic
    from computeraytracer_tpu.scene import presets, scene_from_dict

    from computeraytracer_tpu.kernels import meshpack

    scene, _ = scene_from_dict(presets.mesh_scene(8, 8, subdivisions=1))
    static = SceneStatic.from_scene(scene, mesh_min=16)
    assert static.mesh_parts
    # geometry is traced under grad: the Morton plan must come from the
    # concrete initial scene (tracer/pallas.py docstring contract)
    plans = tuple(meshpack.plan_scene_mesh(scene, part)
                  for part in static.mesh_parts)

    def loss(tracer, d1, spectra, **kw):
        s = scene._replace(
            primitives=scene.primitives._replace(data1=d1),
            spectra=spectra)
        return jnp.sum(tracer.render_sample(s, 8, 8, 1, max_depth=2,
                                            **kw) ** 2)

    d1 = jnp.asarray(scene.primitives.data1)
    sp = jnp.asarray(scene.spectra)
    g_pal = jax.grad(lambda a, b: loss(pallas_tracer, a, b, static=static,
                                       mesh_plans=plans),
                     argnums=(0, 1))(d1, sp)
    g_xla = jax.grad(lambda a, b: loss(xla_tracer, a, b),
                     argnums=(0, 1))(d1, sp)
    for gp, gx in zip(g_pal, g_xla):
        gp, gx = np.asarray(gp), np.asarray(gx)
        assert np.isfinite(gp).all()
        scale = max(np.abs(gx).max(), 1e-6)
        np.testing.assert_allclose(gp / scale, gx / scale,
                                   rtol=1e-3, atol=1e-4)
    # mesh-triangle rows (>= row 6) actually received vertex gradient
    assert np.abs(np.asarray(g_pal[0])[6:]).max() > 0


@pytest.mark.parametrize("backward", ["pallas", "pallas_taped", "xla"])
def test_spectra_gradient_matches_xla(simple_scene, backward):
    """Backward megakernel (retrace default + tape-fed variant) and the
    XLA-recompute fallback == XLA AD."""
    import jax

    w = h = 8

    def loss_pallas(spectra):
        s = simple_scene._replace(spectra=spectra)
        img = pallas_tracer.render_sample(s, w, h, 1, max_depth=2,
                                          backward=backward)
        return jnp.sum(img ** 2)

    def loss_xla(spectra):
        s = simple_scene._replace(spectra=spectra)
        img = xla_tracer.render_sample(s, w, h, 1, max_depth=2)
        return jnp.sum(img ** 2)

    spectra = jnp.asarray(simple_scene.spectra)
    g_pal = np.asarray(jax.grad(loss_pallas)(spectra))
    g_xla = np.asarray(jax.grad(loss_xla)(spectra))
    assert np.isfinite(g_pal).all()
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-3, atol=1e-5)


def test_geometry_and_camera_gradient_matches_xla(simple_scene):
    """The backward kernel's d_prims/d_rays reach geometry AND camera."""
    import jax

    w = h = 8

    def loss(tracer, d1, eye):
        s = simple_scene._replace(
            primitives=simple_scene.primitives._replace(data1=d1),
            camera=simple_scene.camera._replace(eye=eye))
        img = tracer.render_sample(s, w, h, 1, max_depth=2)
        return jnp.sum(img ** 2)

    d1 = jnp.asarray(simple_scene.primitives.data1)
    eye = jnp.asarray(simple_scene.camera.eye)
    g_pal = jax.grad(lambda a, b: loss(pallas_tracer, a, b),
                     argnums=(0, 1))(d1, eye)
    g_xla = jax.grad(lambda a, b: loss(xla_tracer, a, b),
                     argnums=(0, 1))(d1, eye)
    for gp, gx in zip(g_pal, g_xla):
        gp, gx = np.asarray(gp), np.asarray(gx)
        assert np.isfinite(gp).all()
        scale = max(np.abs(gx).max(), 1e-6)
        np.testing.assert_allclose(gp / scale, gx / scale,
                                   rtol=1e-3, atol=1e-4)
