"""Golden tests: vectorized XLA tracer vs the scalar NumPy oracle.

Because both consume identical pcg4d streams, images must match to f32
rounding; a tiny fraction of pixels may diverge where accumulated
rounding flips a Russian-roulette or tie decision."""

import numpy as np

from computeraytracer_tpu.tracer import reference_cpu as oracle
from computeraytracer_tpu.tracer import xla as xla_tracer


def _compare(scene, w, h, sample, max_depth, frac_close=0.995, tol=1e-3):
    want = oracle.render_sample(scene, w, h, sample, max_depth)
    got = np.asarray(xla_tracer.render_sample(scene, w, h, sample, max_depth))
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    denom = np.maximum(np.abs(want), 1e-2)
    rel = np.abs(got - want) / denom
    close = (rel < tol).all(axis=-1)
    frac = close.mean()
    assert frac >= frac_close, (
        f"only {frac:.4f} of pixels match (worst rel {rel.max():.3g})")


def test_simple_scene_primary(simple_scene):
    # config-1 style: few primitives, short paths
    _compare(simple_scene, 24, 24, sample=1, max_depth=2)


def test_simple_scene_deeper(simple_scene):
    _compare(simple_scene, 16, 16, sample=3, max_depth=6)


def test_cornell_multibounce(cornell_scene):
    # full Cornell incl. glass sphere + coplanar light tie-breaking
    _compare(cornell_scene, 20, 20, sample=1, max_depth=5)


def test_cornell_second_sample(cornell_scene):
    _compare(cornell_scene, 12, 12, sample=7, max_depth=8)


def test_mean_energy_sane(cornell_scene):
    img = np.asarray(xla_tracer.render_sample(cornell_scene, 32, 32, 1, 6))
    # Y channel (luminance) should be positive on average and finite
    assert np.isfinite(img).all()
    assert img[..., 1].mean() > 0.01
