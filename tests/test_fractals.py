import jax.numpy as jnp
import numpy as np
import pytest

from cudabrot_tpu.models import fractals
from tests import reference_impl as ref


def test_registry_contents():
    assert set(fractals.FRACTALS) == {
        "buddhabrot", "burning-ship", "anti-buddhabrot"
    }
    assert fractals.get_fractal("buddhabrot").use_cull
    assert not fractals.get_fractal("burning-ship").use_cull
    anti = fractals.get_fractal("anti-buddhabrot")
    # Interior mode must iterate (not cull) the guaranteed-interior
    # cardioid/bulb samples — they are the signal — and prove interiors
    # early via cycle detection.
    assert anti.emit == "interior"
    assert not anti.use_cull
    assert anti.cycle_detect
    with pytest.raises(ValueError):
        fractals.get_fractal("mandelbox")


def test_step_matches_scalar():
    rng = np.random.default_rng(0)
    zr, zi, cr, ci = rng.uniform(-2, 2, size=(4, 256))
    fm = fractals.get_fractal("buddhabrot")
    out_r, out_i = fractals.step(fm, jnp.asarray(zr), jnp.asarray(zi),
                                 jnp.asarray(cr), jnp.asarray(ci))
    np.testing.assert_allclose(out_r, zr * zr - zi * zi + cr, rtol=1e-6)
    np.testing.assert_allclose(out_i, 2 * zr * zi + ci, rtol=1e-6)


def test_burning_ship_folds_abs():
    fm = fractals.get_fractal("burning-ship")
    zr = jnp.asarray([-1.0])
    zi = jnp.asarray([-0.5])
    out_r, out_i = fractals.step(fm, zr, zi, jnp.asarray([0.0]),
                                 jnp.asarray([0.0]))
    # |z| fold: (1, 0.5) -> (1 - 0.25, 2*1*0.5) = (0.75, 1.0)
    np.testing.assert_allclose(out_r, [0.75])
    np.testing.assert_allclose(out_i, [1.0])


def test_cull_matches_scalar_formulas():
    rng = np.random.default_rng(1)
    cr, ci = rng.uniform(-2, 2, size=(2, 2048))
    fm = fractals.get_fractal("buddhabrot")
    got = np.asarray(fractals.cull_mask(fm, jnp.asarray(cr), jnp.asarray(ci)))
    want = np.array(
        [
            ref.in_main_cardioid(a, b) or ref.in_order2_bulb(a, b)
            for a, b in zip(cr, ci)
        ]
    )
    np.testing.assert_array_equal(got, want)


def test_cull_is_sound_no_escaper_culled():
    """Property test (SURVEY.md §4): no culled point may escape within a
    large iteration budget — culled means guaranteed non-escaping."""
    rng = np.random.default_rng(2)
    cr, ci = rng.uniform(-2, 2, size=(2, 512))
    fm = fractals.get_fractal("buddhabrot")
    culled = np.asarray(
        fractals.cull_mask(fm, jnp.asarray(cr), jnp.asarray(ci))
    )
    for a, b, c in zip(cr, ci, culled):
        if c:
            assert ref.classify_scalar(a, b, 2000) == 2000


def test_burning_ship_never_culls():
    fm = fractals.get_fractal("burning-ship")
    mask = fractals.cull_mask(fm, jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert not bool(mask[0])
