"""Planar (R-minor) render path vs the (R, 3) reference path.

render_pixels_planar / render_sample_planar (tracer/pallas.py) are the
production hot path: every per-ray intermediate keeps the ray axis
minor and the spectra/CIE lookups run as one hero-indexed one-hot MXU
contraction (ops/spectrum.py:gather_hero_planar). The RNG draws, draw
order, and estimator arithmetic are identical to render_sample; only
floating-point association differs (reduction order inside fused
normalize/XYZ ops), so images agree to f32 rounding and gradients to
~1e-8 relative.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computeraytracer_tpu.ops import camera as cam_ops
from computeraytracer_tpu.ops import rng
from computeraytracer_tpu.ops import spectrum as spec
from computeraytracer_tpu.tracer import pallas as pt
from computeraytracer_tpu.tracer import xla as xla_tracer


def test_planar_rng_bit_exact():
    """seed_pixel_p / rand_p == seed_pixel / rand, component for
    component (same arithmetic, transposed layout)."""
    px = jnp.arange(97, dtype=jnp.uint32)
    py = (px * jnp.uint32(7)) % jnp.uint32(31)
    s_old = rng.seed_pixel(px, py, jnp.uint32(3))
    s_new = rng.seed_pixel_p(px, py, jnp.uint32(3))
    np.testing.assert_array_equal(np.asarray(s_old).T, np.asarray(s_new))
    u_old, s_old = rng.rand(s_old)
    u_new, s_new = rng.rand_p(s_new)
    np.testing.assert_array_equal(np.asarray(u_old), np.asarray(u_new))
    np.testing.assert_array_equal(np.asarray(s_old).T, np.asarray(s_new))


def test_hero_gather_matches_real_gather():
    """gather_hero_planar == table[:, hero] bit-exactly, and
    expand_hero_table encodes the +4j%301 companion offsets."""
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (7, 301), jnp.float32)
    hero = jax.random.randint(jax.random.PRNGKey(1), (513,), 0, 301,
                              jnp.int32)
    exp = spec.expand_hero_table(table)
    assert exp.shape == (28, 301)
    got = np.asarray(spec.gather_hero_planar(exp, hero))
    want = np.asarray(exp[:, hero])
    np.testing.assert_array_equal(got, want)
    # companion j of spectrum s == table[s, (hero + 4j) % 301]
    h = np.asarray(hero)
    t = np.asarray(table)
    for s in (0, 3, 6):
        for j in range(4):
            np.testing.assert_array_equal(
                got[s * 4 + j], t[s, (h + 4 * j) % 301])


def test_hero_gather_backward_is_scatter():
    """d_table from the one-hot contraction == an explicit scatter-add."""
    table = jnp.arange(5 * 301, dtype=jnp.float32).reshape(5, 301) / 100
    hero = jnp.asarray([0, 7, 7, 300, 12], jnp.int32)
    g = jnp.arange(5 * 5, dtype=jnp.float32).reshape(5, 5)

    def f(t):
        return jnp.sum(spec.gather_hero_planar(t, hero) * g)

    d = np.asarray(jax.grad(f)(table))
    want = np.zeros((5, 301), np.float32)
    for r, hh in enumerate(np.asarray(hero)):
        want[:, hh] += np.asarray(g)[:, r]
    np.testing.assert_allclose(d, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("scene_name", ["simple", "cornell"])
def test_planar_render_matches_reference_path(scene_name, simple_scene,
                                              cornell_scene):
    scene = simple_scene if scene_name == "simple" else cornell_scene
    w, h = 32, 16
    static = pt.SceneStatic.from_scene(scene)
    old = np.asarray(jax.jit(lambda s: pt.render_sample(
        s, w, h, 1, max_depth=4, static=static))(scene))
    new = np.asarray(jax.jit(lambda s: pt.render_sample_planar(
        s, w, h, 1, max_depth=4, static=static))(scene))
    assert new.shape == (3, h, w)
    new_t = np.moveaxis(new, 0, -1)
    # identical draws/paths: differences are pure rounding association,
    # never a diverged path (which would change XYZ by O(1))
    np.testing.assert_allclose(new_t, old, rtol=5e-5, atol=5e-6)


def test_planar_pixels_subset(cornell_scene):
    """render_pixels_planar on an arbitrary pixel subset matches the
    full-film render at those pixels."""
    w = h = 16
    static = pt.SceneStatic.from_scene(cornell_scene)
    px = jnp.asarray([0, 5, 11, 15, 3, 8, 9, 2], jnp.uint32)
    py = jnp.asarray([0, 2, 15, 7, 3, 8, 1, 14], jnp.uint32)
    sub = np.asarray(pt.render_pixels_planar(
        cornell_scene, w, h, px, py, 1, max_depth=3, static=static))
    full = np.asarray(pt.render_sample_planar(
        cornell_scene, w, h, 1, max_depth=3, static=static))
    for i, (x, y) in enumerate(zip(np.asarray(px), np.asarray(py))):
        np.testing.assert_allclose(sub[:, i], full[:, y, x],
                                   rtol=1e-5, atol=1e-7)


def test_planar_gradients_match_reference_path(cornell_scene):
    """d_spectra and d_geometry agree between the planar and (R, 3)
    paths (same custom_vjp kernel backward; only the XLA-side table
    gather transpose differs)."""
    w = h = 12
    scene = cornell_scene
    static = pt.SceneStatic.from_scene(scene)

    def loss_old(spectra, d1):
        s = scene._replace(spectra=spectra,
                           primitives=scene.primitives._replace(data1=d1))
        return jnp.mean(pt.render_sample(s, w, h, 1, max_depth=3,
                                         static=static) ** 2)

    def loss_new(spectra, d1):
        s = scene._replace(spectra=spectra,
                           primitives=scene.primitives._replace(data1=d1))
        img = pt.render_sample_planar(s, w, h, 1, max_depth=3,
                                      static=static)
        return jnp.mean(jnp.moveaxis(img, 0, -1) ** 2)

    args = (jnp.asarray(scene.spectra),
            jnp.asarray(scene.primitives.data1))
    go = jax.jit(jax.grad(loss_old, argnums=(0, 1)))(*args)
    gn = jax.jit(jax.grad(loss_new, argnums=(0, 1)))(*args)
    for a, b in zip(go, gn):
        scale = np.abs(np.asarray(a)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=1e-4, atol=1e-6)


def test_planar_xla_fallback_backward(simple_scene):
    """backward='xla' routes planar through the recompute-vjp path."""
    w = h = 8
    img = pt.render_sample_planar(simple_scene, w, h, 1, max_depth=2,
                                  backward="xla")
    want = xla_tracer.render_sample(simple_scene, w, h, 1, max_depth=2)
    np.testing.assert_allclose(np.moveaxis(np.asarray(img), 0, -1),
                               np.asarray(want), rtol=2e-4, atol=2e-4)
