"""Scene ingestion: flattening, spectra resampling, JSON round-trip."""

import json

import numpy as np

from computeraytracer_tpu import config as C
from computeraytracer_tpu.ops import spectrum as spec
from computeraytracer_tpu.scene import presets, scene_from_dict, load_scene


def test_resample_spectrum_lerp():
    # 2-point ramp: 400->0, 700->1
    table = spec.resample_spectrum([400, 700], [0.0, 1.0])
    assert table.shape == (C.N_LAMBDA,)
    assert table[0] == 0.0
    assert abs(table[150] - 0.5) < 1e-6
    assert table[-1] == 1.0


def test_resample_exact_and_flat():
    table = spec.resample_spectrum([400, 500, 700], [2.0, 4.0, 4.0])
    assert table[0] == 2.0
    assert table[100] == 4.0
    assert table[200] == 4.0


def test_cie_tables_shape_and_peak():
    cie = spec.cie_1931_tables()
    assert cie.shape == (3, C.CIE_N)
    # y-bar peaks near 555nm (index 195) with value ~1
    peak = int(np.argmax(cie[1]))
    assert abs(peak - 195) <= 5
    assert 0.95 < cie[1][peak] <= 1.1


def test_cornell_flattening():
    scene, meta = scene_from_dict(presets.cornell_box(128, 128))
    prims = scene.primitives
    assert prims.count == 18  # 16 patches + 2 spheres
    assert int(np.sum(np.asarray(prims.category) == 1)) == 2
    # light is the third patch, like the reference scene
    assert int(scene.lights.prim_index[0]) == 2
    assert scene.lights.count == 1
    # insertion-order spectrum indexing; extinction last
    assert meta["spectrum_index"]["white"] == 0
    assert meta["spectrum_index"]["extinction"] == scene.n_spectra - 1
    assert meta["width"] == 128


def test_json_roundtrip(tmp_path):
    doc = presets.simple_scene(32, 32)
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(doc))
    scene, meta = load_scene(str(p))
    assert scene.primitives.count == 4
    assert meta["height"] == 32


def test_mesh_loading():
    doc = presets.simple_scene(32, 32)
    doc["objects"]["meshes"] = [{
        "vertices": [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
        "faces": [[0, 1, 2], [1, 3, 2]],
        "emission": "dark", "reflectance": "white", "type": "diffuse",
    }]
    scene, _ = scene_from_dict(doc)
    prims = scene.primitives
    assert prims.count == 6
    cat = np.asarray(prims.category)
    assert list(cat[-2:]) == [2, 2]
    # triangle data2/data3 are edge vectors
    np.testing.assert_allclose(np.asarray(prims.data2[-2]), [1, 0, 0])
