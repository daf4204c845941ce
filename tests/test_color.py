import numpy as np
import pytest

from cudabrot_tpu import color


def test_normalize_stretches_range():
    rng = np.random.default_rng(0)
    img = rng.integers(1000, 3000, size=(64, 64)).astype(np.uint16)
    out = color.normalize(img)
    assert out.min() == 0.0
    assert out.max() == 1.0
    assert out.shape == img.shape


def test_normalize_constant_image():
    img = np.full((8, 8), 500, np.uint16)
    out = color.normalize(img)
    assert np.all((out == 0.0) | (out == 1.0) | np.isfinite(out))


def test_combine_rgb_channels():
    h = np.full((4, 4), 65535, np.uint16)
    z = np.zeros((4, 4), np.uint16)
    rgb = color.combine_rgb([(h, "red"), (z, "lime"), (z, "blue")])
    np.testing.assert_allclose(rgb[..., 0], 1.0)
    np.testing.assert_allclose(rgb[..., 1], 0.0)
    np.testing.assert_allclose(rgb[..., 2], 0.0)


def test_combine_rgb_sums_and_clips():
    h = np.full((2, 2), 65535, np.uint16)
    rgb = color.combine_rgb([(h, "red"), (h, "yellow")])
    np.testing.assert_allclose(rgb[..., 0], 1.0)  # 1 + 1 clipped
    np.testing.assert_allclose(rgb[..., 1], 1.0)
    np.testing.assert_allclose(rgb[..., 2], 0.0)


def test_combine_rgb_unknown_color():
    with pytest.raises(ValueError):
        color.combine_rgb([(np.zeros((2, 2), np.uint8), "mauve")])


def test_hsl_primaries():
    # H=0, S=1, L=0.5 => pure red.
    one = np.ones((1, 1))
    half = np.full((1, 1), 0.5)
    rgb = color.hsl_to_rgb(np.zeros((1, 1)), one, half)
    np.testing.assert_allclose(rgb[0, 0], [1.0, 0.0, 0.0], atol=1e-6)
    # H=1/3 => green.
    rgb = color.hsl_to_rgb(np.full((1, 1), 1 / 3), one, half)
    np.testing.assert_allclose(rgb[0, 0], [0.0, 1.0, 0.0], atol=1e-6)
    # L=1 => white regardless of H/S.
    rgb = color.hsl_to_rgb(np.full((1, 1), 0.7), one, np.ones((1, 1)))
    np.testing.assert_allclose(rgb[0, 0], [1.0, 1.0, 1.0], atol=1e-6)


def test_combine_hsl_hue_rotation_wraps():
    h = np.full((1, 1), 60000, np.uint16)
    s = np.full((1, 1), 65535, np.uint16)
    l = np.full((1, 1), 32768, np.uint16)
    a = color.combine_hsl(h, s, l, adjust_hue=0.0)
    b = color.combine_hsl(h, s, l, adjust_hue=1.0)  # full wheel = identity
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_render_color_end_to_end(tmp_path, monkeypatch):
    """Tiny deterministic 3-band RGB render through the real pipeline."""
    out = str(tmp_path / "c.png")
    monkeypatch.chdir(tmp_path)
    rc = color.main(
        [
            "--mode", "rgb",
            "-o", out,
            "-w", "24",
            "-h", "24",
            "--engine", "oracle",
            "--passes", "1",
            "--band", "blue:50:5:1.0:1",
            "--band", "lime:80:20:1.0:1",
            "--band", "red:120:40:1.0:1",
            "--keep-bands",
        ]
    )
    assert rc == 0
    from cudabrot_tpu.io import png as png_io

    img = png_io.read_png(out)
    assert img.shape == (24, 24, 3)
    assert img.sum() > 0


def test_render_color_extended_deep_zoom(tmp_path, monkeypatch):
    """--precision extended and --sample-domain forward through the
    color pipeline (the color deep-zoom recipe, README 'Deep zoom')."""
    out = str(tmp_path / "dz.png")
    monkeypatch.chdir(tmp_path)
    # Fast-escape window (~56 steps) so one oracle pass emits.
    win = "-0.7500005,-0.7499995,0.0549995,0.0550005"
    rc = color.main(
        [
            "--mode", "hsl",
            "-o", out,
            "-w", "16",
            "-h", "16",
            "--engine", "oracle",
            "--precision", "extended",
            "--sample-domain", win,
            "--passes", "1",
            "--band", "H:40:5:1.0:1",
            "--band", "S:80:40:1.0:1",
            "--band", "L:160:50:1.0:1",
        ]
    )
    assert rc == 0
    from cudabrot_tpu.io import png as png_io

    img = png_io.read_png(out)
    assert img.shape == (16, 16, 3)


def test_interleaved_matches_sequential_bitwise(tmp_path, monkeypatch):
    """--interleave must produce per-band output bitwise identical to the
    sequential loop for fixed pass counts: the bands are independent
    renders, so dispatch order cannot affect their histograms."""
    monkeypatch.chdir(tmp_path)
    args = [
        "--mode", "rgb",
        "-w", "20", "-h", "20",
        "--engine", "oracle",
        "--passes", "2",
        # Large time boxes: --passes must be the only stop condition, or
        # a slow run (loaded machine) trips the 1s box after one pass in
        # one mode but not the other and the bitwise assert flakes.
        "--band", "blue:40:4:1.0:600",
        "--band", "lime:60:10:1.0:600",
        "--band", "red:90:30:1.0:600",
        "--keep-bands",
    ]
    rc = color.main(args + ["-o", str(tmp_path / "seq.png")])
    assert rc == 0
    from cudabrot_tpu.io import pgm as pgm_io

    seq = {k: pgm_io.read_pgm(f"band_{k}.pgm") for k in ("blue", "lime", "red")}

    rc = color.main(args + ["--interleave", "-o", str(tmp_path / "il.png")])
    assert rc == 0
    for k in seq:
        np.testing.assert_array_equal(
            pgm_io.read_pgm(f"band_{k}.pgm"), seq[k]
        )
    assert (tmp_path / "seq.png").read_bytes() == (
        tmp_path / "il.png"
    ).read_bytes()
