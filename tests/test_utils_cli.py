"""utils (PNG io, metrics) and the CLI entry points."""

import json

import numpy as np

from computeraytracer_tpu import cli
from computeraytracer_tpu.utils.image import read_png, to_u8, write_png
from computeraytracer_tpu.utils.metrics import RenderMeter


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 1.0, (13, 17, 3)).astype(np.float32)
    path = tmp_path / "x.png"
    write_png(str(path), img)
    back = read_png(str(path))
    np.testing.assert_array_equal(back, to_u8(img))


def test_render_meter(tmp_path):
    log = tmp_path / "m.jsonl"
    m = RenderMeter(jsonl_path=str(log))
    m.start()
    rec = m.stop(paths=1000, step=1)
    assert rec["paths"] == 1000 and rec["step"] == 1
    assert m.total_paths == 1000
    assert json.loads(log.read_text())["paths"] == 1000


def test_cli_info(capsys):
    rc = cli.main(["info", "--preset", "cornell_box"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["primitives"] == out["patches"] + out["spheres"] + \
        out["triangles"]
    assert out["lights"] >= 1


def test_cli_render_xla(tmp_path, capsys):
    out = tmp_path / "img.png"
    rc = cli.main(["render", "--preset", "simple_scene", "--width", "16",
                   "--height", "16", "--spp", "1", "--depth", "2",
                   "--kernel", "xla", "--out", str(out)])
    assert rc == 0
    img = read_png(str(out))
    assert img.shape == (16, 16, 3)
    assert img.max() > 0


def test_cli_render_progressive(tmp_path, capsys):
    """--progressive N rewrites --out every N samples and the final
    accumulated image equals a one-shot --spp render bit-for-bit
    (counter-based seeding: progressive chunks are a pure fold)."""
    out_p = tmp_path / "prog.png"
    rc = cli.main(["render", "--preset", "simple_scene", "--width", "16",
                   "--height", "16", "--spp", "4", "--depth", "2",
                   "--kernel", "xla", "--progressive", "2",
                   "--out", str(out_p)])
    assert rc == 0
    out_s = tmp_path / "shot.png"
    rc = cli.main(["render", "--preset", "simple_scene", "--width", "16",
                   "--height", "16", "--spp", "4", "--depth", "2",
                   "--kernel", "xla", "--out", str(out_s)])
    assert rc == 0
    a = read_png(str(out_p))
    b = read_png(str(out_s))
    import numpy as np
    # 8-bit PNGs: identical up to the accumulation-order half-ulp
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
