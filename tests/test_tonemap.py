import jax.numpy as jnp
import numpy as np

from cudabrot_tpu.ops import tonemap


def _scalar_reference(hist, gamma):
    """GetLinearColorScale + DoGammaCorrection + Clamp
    (cudabrot.cu:416-468) as scalar numpy."""
    maxval = 65535.0
    m = hist.max()
    scale = maxval / m if m > 0 else 0.0
    out = np.zeros(hist.shape, np.uint16)
    for idx in np.ndindex(hist.shape):
        scaled = float(hist[idx]) * scale
        if gamma <= 0.0:
            out[idx] = np.uint16(int(scaled) & 0xFFFF)
        else:
            v = maxval * (scaled / maxval) ** (1.0 / gamma)
            v = min(max(v, 0.0), maxval)
            out[idx] = np.uint16(int(v))
    return out, m, scale


def test_linear_tonemap_matches_reference_math():
    rng = np.random.default_rng(0)
    hist = rng.integers(0, 100000, size=(16, 16)).astype(np.uint32)
    res = tonemap.tonemap(jnp.asarray(hist), 1.0)
    want, m, scale = _scalar_reference(hist, 1.0)
    assert int(res.max_count) == m
    np.testing.assert_allclose(float(res.linear_scale), scale, rtol=1e-6)
    # f32-vs-f64 rounding can shift a value across the truncation boundary;
    # allow off-by-one.
    assert np.max(np.abs(res.image.astype(int) - want.astype(int))) <= 1


def test_gamma_tonemap_matches_reference_math():
    rng = np.random.default_rng(1)
    hist = rng.integers(0, 5000, size=(8, 8)).astype(np.uint32)
    res = tonemap.tonemap(jnp.asarray(hist), 2.2)
    want, _, _ = _scalar_reference(hist, 2.2)
    assert np.max(np.abs(res.image.astype(int) - want.astype(int))) <= 1


def test_negative_gamma_disables_correction():
    hist = np.asarray([[0, 50, 100]], np.uint32)
    res = tonemap.tonemap(jnp.asarray(hist), -1.0)
    np.testing.assert_array_equal(
        np.asarray(res.image), [[0, 32767, 65535]]
    )


def test_max_pixel_maps_to_full_white():
    hist = np.asarray([[1, 7]], np.uint32)
    for gamma in (1.0, 2.2, -1.0):
        res = tonemap.tonemap(jnp.asarray(hist), gamma)
        assert int(res.image[0, 1]) == 65535


def test_empty_histogram_is_black():
    res = tonemap.tonemap(jnp.zeros((4, 4), jnp.uint32), 2.2)
    np.testing.assert_array_equal(np.asarray(res.image), 0)
    assert int(res.max_count) == 0
