import os

import numpy as np
import pytest

from cudabrot_tpu.io import pgm, png


def test_pgm_roundtrip_u16(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, size=(13, 29)).astype(np.uint16)
    path = str(tmp_path / "x.pgm")
    pgm.write_pgm(path, img)
    back = pgm.read_pgm(path)
    np.testing.assert_array_equal(back, img)


def test_pgm_header_format(tmp_path):
    """Byte-level parity with SaveImage (cudabrot.cu:557-571): P5 header,
    maxval 65535, big-endian pixel block."""
    img = np.asarray([[0x0102, 0xFFFE]], np.uint16)
    path = str(tmp_path / "h.pgm")
    pgm.write_pgm(path, img)
    data = open(path, "rb").read()
    assert data.startswith(b"P5\n2 1\n65535\n")
    assert data[-4:] == bytes([0x01, 0x02, 0xFF, 0xFE])


def test_pgm_u8_roundtrip(tmp_path):
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    path = str(tmp_path / "u8.pgm")
    pgm.write_pgm(path, img)
    np.testing.assert_array_equal(pgm.read_pgm(path), img)


def test_pgm_rejects_bad_dtype(tmp_path):
    with pytest.raises(ValueError):
        pgm.write_pgm(str(tmp_path / "bad.pgm"), np.zeros((2, 2), np.float32))


def test_pgm_read_with_comment(tmp_path):
    path = str(tmp_path / "c.pgm")
    with open(path, "wb") as f:
        f.write(b"P5\n# a comment\n2 2\n255\n\x01\x02\x03\x04")
    np.testing.assert_array_equal(
        pgm.read_pgm(path), [[1, 2], [3, 4]]
    )


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("channels", [None, 3])
def test_png_roundtrip(tmp_path, dtype, channels):
    rng = np.random.default_rng(1)
    shape = (11, 17) if channels is None else (11, 17, 3)
    hi = 256 if dtype == np.uint8 else 65536
    img = rng.integers(0, hi, size=shape).astype(dtype)
    path = str(tmp_path / "x.png")
    png.write_png(path, img)
    back = png.read_png(path)
    assert back.dtype == dtype
    np.testing.assert_array_equal(back, img)


def test_png_magic(tmp_path):
    path = str(tmp_path / "m.png")
    png.write_png(path, np.zeros((2, 2), np.uint8))
    assert open(path, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
