"""Aux subsystems: profiling roofline, checkify sanitizer, multi-host
init wrapper, global mesh (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computeraytracer_tpu.parallel import distributed, mesh as mesh_mod
from computeraytracer_tpu.scene import presets, scene_from_dict
from computeraytracer_tpu.tracer import xla as xla_tracer
from computeraytracer_tpu.utils import debug, profiling


def test_roofline_sane():
    r = profiling.roofline(1024, 1024, 1, 8, 18, mean_depth=3.0,
                           chip="v5e")
    assert r.flops > 0 and r.hbm_bytes > 0
    assert r.bound == "compute"  # path tracing is VPU-bound
    assert r.sol_s == max(r.sol_compute_s, r.sol_memory_s)
    # measured time worse than speed of light -> fraction < 1
    assert 0 < r.fraction(r.sol_s * 10) < 1
    assert r.to_dict()["intensity"] == pytest.approx(r.intensity)


def test_roofline_backward_costs_more():
    fwd = profiling.roofline(256, 256, 1, 4, 18)
    bwd = profiling.roofline(256, 256, 1, 4, 18, backward=True)
    assert bwd.flops > fwd.flops


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "xprof")
    with profiling.trace(logdir):
        with profiling.annotate("tiny-matmul"):
            x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            jax.block_until_ready(x)
    files = list((tmp_path / "xprof").rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifacts written"


def test_checked_clean_render_passes():
    scene, _ = scene_from_dict(presets.cornell_box(8, 8))
    fn = debug.checked(
        lambda s: xla_tracer.render_sample(s, 8, 8, 1, max_depth=2,
                                           use_remat=False))
    img = fn(scene)
    assert np.isfinite(np.asarray(img)).all()


def test_checked_catches_nan():
    from jax.experimental import checkify

    scene, _ = scene_from_dict(presets.cornell_box(8, 8))
    bad = scene._replace(
        spectra=jnp.asarray(scene.spectra).at[0, 0].set(jnp.nan))
    fn = debug.checked(
        lambda s: xla_tracer.render_sample(s, 8, 8, 1, max_depth=2,
                                           use_remat=False))
    with pytest.raises(checkify.JaxRuntimeError):
        fn(bad)


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert distributed.initialize() is False  # single host: no-op


def test_global_mesh_spans_all_devices():
    m = distributed.global_mesh()
    assert m.shape[mesh_mod.DP_AXIS] * m.shape[mesh_mod.SP_AXIS] == len(
        jax.devices())
    m1 = distributed.global_mesh(sp=1)
    assert m1.shape[mesh_mod.SP_AXIS] == 1
