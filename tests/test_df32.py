"""Exactness tests for the double-float (df32) primitives.

The deep-zoom feature's whole premise is that (hi, lo) float32 pairs
carry ~2^-48 relative precision through the orbit iteration, so these
tests assert the error-free-transformation contracts tightly — UNDER
JIT, because that is where compilers break them: XLA's CPU emitter was
measured contracting ``(a*a + e) - a*a`` into an FMA against the
UNROUNDED square, destroying the error term at 2^-24 relative (it also
strips optimization barriers and ignores the excess-precision flags).
ops/df32.py is hardened against contraction (bitmask split +
runtime-zero product sealing); these tests are the tripwire that the
hardening keeps working on every backend the suite runs on.

``ZERO`` is always passed as a traced jit argument — a literal 0.0
could be folded away, silently re-exposing the contraction hazard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudabrot_tpu.ops import df32

ZERO = jnp.float32(0.0)


def _rand(n, seed, scale_pow=0):
    rng = np.random.default_rng(seed)
    # Mix magnitudes across the orbit's dynamic range (|z| <= 2 mostly,
    # plus small residuals like lo components).
    m = rng.uniform(-2.0, 2.0, n).astype(np.float32)
    e = rng.integers(-24, 2, n).astype(np.float32)
    return (m * np.float32(2.0) ** (e + scale_pow)).astype(np.float32)


def test_two_sum_exact():
    a = _rand(4096, 1)
    b = _rand(4096, 2)
    s, e = jax.jit(df32.two_sum)(a, b)
    s, e = np.asarray(s), np.asarray(e)
    # s must be the rounded sum, s + e the exact sum (any two f32 values
    # sum exactly in f64).
    np.testing.assert_array_equal(s, (a + b).astype(np.float32))
    exact = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(
        s.astype(np.float64) + e.astype(np.float64), exact
    )


def test_split_is_exact_and_narrow():
    a = _rand(4096, 10)
    hi, lo = jax.jit(df32.split)(a)
    hi, lo = np.asarray(hi), np.asarray(lo)
    np.testing.assert_array_equal(hi + lo, a)  # Sterbenz-exact residual
    # Both halves must square exactly in f32 (the property two_prod
    # relies on): check via f64.
    for half in (hi, lo):
        sq32 = (half * half).astype(np.float32).astype(np.float64)
        sq64 = half.astype(np.float64) ** 2
        np.testing.assert_array_equal(sq32, sq64)


@pytest.mark.parametrize("fn,nargs", [(df32.two_prod, 2),
                                      (df32.two_prod_sqr, 1)])
def test_two_prod_near_exact(fn, nargs):
    a = _rand(65536, 3)
    b = _rand(65536, 4) if nargs == 2 else a
    args = (a, b, ZERO) if nargs == 2 else (a, ZERO)
    p, e = jax.jit(fn)(*args)
    p, e = np.asarray(p), np.asarray(e)
    np.testing.assert_array_equal(p, (a * b).astype(np.float32))
    exact = a.astype(np.float64) * b.astype(np.float64)  # exact in f64
    err = np.abs(p.astype(np.float64) + e.astype(np.float64) - exact)
    # The truncating bitmask split admits <= 1 ulp of error in e itself
    # (vs Dekker's fully exact rounding split) — far below the df32
    # target; most lanes are exactly 0.
    bound = np.abs(exact) * 2.0**-46 + 1e-45
    assert (err <= bound).all(), err.max()
    assert (err == 0).mean() > 0.99


def _df_from64(x64):
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def test_add_mul_sqr_track_float64():
    """Renormalized df ops agree with f64 to ~2^-46 (relative to the
    operand magnitudes for additive ops — cancellation makes
    result-relative bounds meaningless — and to the result for
    multiplicative ones)."""
    rng = np.random.default_rng(6)
    x64 = rng.uniform(-2.0, 2.0, 65536)
    y64 = rng.uniform(-2.0, 2.0, 65536)
    xh, xl = _df_from64(x64)
    yh, yl = _df_from64(y64)

    scale = np.abs(x64) + np.abs(y64)
    for op, ref in [(df32.add, x64 + y64), (df32.sub, x64 - y64)]:
        h, l = jax.jit(op)(xh, xl, yh, yl)
        err = np.abs(df32.to_float64(h, l) - ref) / scale
        assert err.max() < 2.0**-46, (op.__name__, err.max())

    h, l = jax.jit(df32.mul)(xh, xl, yh, yl, ZERO)
    ref = x64 * y64
    err = np.abs(df32.to_float64(h, l) - ref) / np.maximum(np.abs(ref), 1e-30)
    assert err.max() < 2.0**-45, err.max()

    h, l = jax.jit(df32.sqr)(xh, xl, ZERO)
    err = np.abs(df32.to_float64(h, l) - x64**2) / np.maximum(x64**2, 1e-30)
    assert err.max() < 2.0**-45, err.max()


def test_renormalized_invariant():
    """Results satisfy hi = RN(hi + lo): lo is a true residual."""
    xh, xl = _df_from64(np.random.default_rng(7).uniform(-2, 2, 1024))
    yh, yl = _df_from64(np.random.default_rng(8).uniform(-2, 2, 1024))
    h, l = jax.jit(df32.add)(xh, xl, yh, yl)
    h, l = np.asarray(h), np.asarray(l)
    np.testing.assert_array_equal(h, (h + l).astype(np.float32))
    h, l = jax.jit(df32.mul)(xh, xl, yh, yl, ZERO)
    h, l = np.asarray(h), np.asarray(l)
    np.testing.assert_array_equal(h, (h + l).astype(np.float32))


def test_from_float_roundtrip():
    for x in (-0.7436438870371587, 0.1318259042124784, 2.0, -1.9999999999):
        hi, lo = df32.from_float(x)
        assert abs((hi + lo) - x) <= abs(x) * 2.0**-47
        assert np.float32(hi) == np.float32(np.float64(hi) + np.float64(lo))


def test_complex_sqr_add_tracks_float64_orbit():
    """A df32 orbit shadows the f64 orbit far beyond where plain f32
    has fully decorrelated — the integration test that the primitives
    compose correctly UNDER JIT (the contraction bug showed up exactly
    here: per-step error was 2^-24 instead of 2^-48)."""
    c = -0.7436438870371587 + 0.1318259042124784j  # deep seahorse point
    crh, crl = df32.from_float(c.real)
    cih, cil = df32.from_float(c.imag)
    zr = jnp.float32(crh)
    zrl = jnp.float32(crl)
    zi = jnp.float32(cih)
    zil = jnp.float32(cil)
    # Iterate against the f64 orbit of the df32-representable c (the
    # df32 pair reproduces c only to 2^-48; comparing against the exact
    # decimal would conflate representation with arithmetic error).
    cd = complex(df32.to_float64(np.float32(crh), np.float32(crl)),
                 df32.to_float64(np.float32(cih), np.float32(cil)))
    z64 = np.complex128(cd)
    z32 = np.complex64(cd)
    step = jax.jit(df32.complex_sqr_add)
    df_err = 0.0
    f32_err = 0.0
    for _ in range(30):
        zr, zrl, zi, zil, _ = step(
            zr, zrl, zi, zil, crh, crl, cih, cil, ZERO
        )
        z64 = z64 * z64 + cd
        z32 = z32 * z32 + np.complex64(cd)
        got = complex(
            df32.to_float64(zr, zrl), df32.to_float64(zi, zil)
        )
        df_err = max(df_err, abs(got - complex(z64)))
        f32_err = max(f32_err, abs(complex(z32) - complex(z64)))
    # Chaos amplifies per-step 2^-48 errors; 30 steps of |2z| growth
    # leave comfortable headroom below 2^-36 if (and only if) each step
    # is genuinely ~2^-48 accurate.
    assert df_err < 2.0**-36, df_err
    # And the premise: plain f32 is orders of magnitude worse by then.
    assert f32_err > df_err * 1e4


def test_burning_ship_fold():
    rng = np.random.default_rng(9)
    x64 = rng.uniform(-2.0, 2.0, 512)
    y64 = rng.uniform(-2.0, 2.0, 512)
    xh, xl = _df_from64(x64)
    yh, yl = _df_from64(y64)
    c = (np.float32(0.1), np.float32(0.0), np.float32(0.1), np.float32(0.0))
    nzr, nzrl, nzi, nzil, _ = jax.jit(
        lambda *a: df32.complex_sqr_add(*a, fold_abs=True)
    )(xh, xl, yh, yl, *c, ZERO)
    ax, ay = np.abs(x64), np.abs(y64)
    c32 = np.float64(np.float32(0.1))  # the constant the df path adds
    ref_r = ax * ax - ay * ay + c32
    ref_i = 2 * ax * ay + c32
    err_r = np.abs(df32.to_float64(nzr, nzrl) - ref_r)
    err_i = np.abs(df32.to_float64(nzi, nzil) - ref_i)
    assert err_r.max() < 2.0**-44 and err_i.max() < 2.0**-44


def test_nan_inf_propagate_as_escaped():
    """Escaped lanes coast to inf/NaN; mag2 must then fail `<= 4` so the
    kernel's survival counter keeps counting them as escaped."""
    big = jnp.float32(1e30)
    zero = jnp.float32(0.0)
    out = df32.complex_sqr_add(
        big, zero, big, zero, zero, zero, zero, zero, ZERO
    )
    mag2 = np.asarray(out[4])
    assert not (mag2 <= 4.0)
    # One more round from the inf/NaN state stays escaped.
    out2 = df32.complex_sqr_add(
        out[0], out[1], out[2], out[3], zero, zero, zero, zero, ZERO
    )
    assert not (np.asarray(out2[4]) <= 4.0)


@pytest.mark.parametrize("width", [1e-6, 1e-9, 3e-11])
def test_quantization_premise(width):
    """The feature's premise, stated as numbers: pixel pitch below f32
    ulp(2) cannot be resolved by f32 orbit points, but df32 resolves it
    down to ~1e-11 canvas widths (1000-pixel canvas)."""
    pixel = width / 1000.0
    f32_q = float(np.spacing(np.float32(2.0)))
    df_q = 2.0 ** -47 * 2.0
    assert pixel < f32_q  # f32 would band at every one of these widths
    if width >= 3e-11:
        assert df_q < pixel or width < 1e-10
