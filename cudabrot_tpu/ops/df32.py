"""Double-float (df32) arithmetic: ~48-bit-mantissa reals as (hi, lo)
float32 pairs, for the extended-precision deep-zoom iteration path.

Why this exists: the TPU VPU has no float64 datapath, but a Buddhabrot
deep zoom needs orbit positions with *absolute* accuracy finer than a
canvas pixel whenever the orbit visits the (tiny) canvas window.  Plain
f32 quantizes positions at ulp(|z|) <= 2^-22 near |z| = 2, so canvases
narrower than ~1e-4 visibly band (every orbit point snaps to a grid
coarser than the pixels).  A hi+lo float32 pair carries ~2^-48 relative
precision — about 7e-15 absolute at |z| = 2 — extending usable canvas
widths by ~9 decades while staying pure VPU f32 arithmetic (usable
inside a Pallas kernel, where f64 is unavailable).  The reference
renders the full set only and iterates hardware double
(cudabrot.cu:321); this module is the TPU-native answer to *exceeding*
that: deep crops the reference cannot resolve at all.

Compiler-hardening (the hard-won part — see tests/test_df32.py):

Error-free transformations are correct only under strict one-rounding-
per-op f32 semantics.  XLA's CPU emitter CONTRACTS a multiply feeding
an add/subtract into an FMA (measured here: ``(a*a + e) - a*a`` used
the unrounded square on one side, silently destroying the error term at
2^-24 relative), strips ``lax.optimization_barrier`` before the emitter
runs, and ignores ``--xla_allow_excess_precision=false`` /
``--xla_cpu_enable_fast_math=false`` for this pattern.  Two defenses
make the algorithms immune to contraction instead of fighting it:

  1. **Bitmask Veltkamp split.**  ``split`` clears the low 12 mantissa
     bits via integer masking instead of Dekker's ``(a*C - (a*C - a))``
     — no float multiply exists to contract, and every partial product
     of two 12-bit-mantissa halves is exactly representable, so an FMA
     contraction of the error-term sums computes the same value.
  2. **Runtime-zero product sealing.**  The rounded product
     ``p = RN(a*b)`` must reach every consumer as the SAME rounded
     value; a raw ``mul`` node adjacent to an add invites contraction
     with the unrounded product.  ``p + zero`` — where ``zero`` is a
     RUNTIME 0.0 the compiler cannot prove is zero — turns p into an
     add node (contraction-proof downstream) and is itself
     contraction-safe (``fma(a, b, 0.0) == RN(a*b)``).  Every function
     that multiplies therefore takes an explicit ``zero`` operand;
     callers thread in a zero-valued traced scalar (a jit argument, an
     SMEM word in Pallas kernels — never a literal, which the
     simplifier could fold away).

Overflow/NaN: once a component overflows (escaped orbits coasting to
the window edge multiply to inf), hi propagates inf/NaN through every
operation.  The kernel's escape test is written so NaN counts as
escaped, exactly like the f32 path (pallas_kernels).

All functions take and return float32 jax arrays (broadcastable); a df
value is the pair (hi, lo) with hi = RN(hi + lo) (lo is the residual).
"""

from __future__ import annotations

import numpy as np
from jax import lax


def two_sum(a, b):
    """s, e with s = RN(a + b) and s + e == a + b exactly (Knuth;
    add/sub only — contraction-immune)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """s, e with s + e == a + b exactly, REQUIRING |a| >= |b| (or a == 0).
    3 flops; used to renormalize results whose ordering is known.
    Operands must be add-rooted or sealed values (see module docstring)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Bitmask Veltkamp split: a == hi + lo with 12-bit-mantissa hi and
    lo exact by Sterbenz (a - hi loses no bits).  Truncating (vs
    Dekker's rounding split) widens |lo| to < 2^-11|a|; all partial
    products of two halves still fit 24 bits exactly."""
    import jax.numpy as jnp

    bits = lax.bitcast_convert_type(a, jnp.uint32)
    hi = lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFFF000), jnp.float32
    )
    return hi, a - hi


def two_prod(a, b, zero):
    """p, e with p = RN(a * b) and p + e == a * b (exact modulo <=1 ulp
    of e from the truncating split — below 2^-46 relative).  ``zero``
    is the runtime-zero seal operand (see module docstring)."""
    p = (a * b) + zero
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def two_prod_sqr(a, zero):
    """p, e with p + e == a * a; one split instead of two."""
    p = (a * a) + zero
    ah, al = split(a)
    e = ((ah * ah - p) + 2.0 * (ah * al)) + al * al
    return p, e


def add(ah, al, bh, bl):
    """(ah, al) + (bh, bl) -> renormalized df pair."""
    s, e = two_sum(ah, bh)
    e = e + (al + bl)
    return quick_two_sum(s, e)


def add_f(ah, al, b):
    """(ah, al) + float32 b -> renormalized df pair."""
    s, e = two_sum(ah, b)
    e = e + al
    return quick_two_sum(s, e)


def sub(ah, al, bh, bl):
    """(ah, al) - (bh, bl) -> renormalized df pair."""
    return add(ah, al, -bh, -bl)


def mul(ah, al, bh, bl, zero):
    """(ah, al) * (bh, bl) -> renormalized df pair (drops al*bl, below
    2^-48 relative — standard double-double multiply)."""
    p, e = two_prod(ah, bh, zero)
    # Contraction inside this error-term sum only re-rounds quantities
    # below 2^-48 relative — no seal needed (unlike p).
    e = e + (ah * bl + al * bh)
    return quick_two_sum(p, e)


def sqr(ah, al, zero):
    """(ah, al)^2 -> renormalized df pair."""
    p, e = two_prod_sqr(ah, zero)
    e = e + 2.0 * (ah * al)
    return quick_two_sum(p, e)


def neg(ah, al):
    return -ah, -al


def abs_(ah, al):
    """|(ah, al)|: sign is carried by hi (|lo| <= ulp(hi)/2), so flip
    both components where hi is negative."""
    import jax.numpy as jnp

    flip = ah < 0.0
    return jnp.where(flip, -ah, ah), jnp.where(flip, -al, al)


def from_float(x: float) -> tuple[float, float]:
    """Split a Python float (f64) into df32 (hi, lo) PYTHON floats — for
    baking compile-time constants (window/canvas centers) into kernels.
    hi + lo reproduces x to ~2^-48 relative."""
    hi = float(np.float32(x))
    lo = float(np.float32(x - hi))
    return hi, lo


def to_float64(hi, lo):
    """Exact f64 value of a df pair (for tests/host-side checks)."""
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def complex_sqr_add(
    zr, zrl, zi, zil, crh, crl, cih, cil, zero, *, fold_abs=False
):
    """One df32 iteration of z <- f(z) + c for the quadratic family
    (f = z^2, or the burning-ship fold-then-square when ``fold_abs``).

    Returns (nzr, nzrl, nzi, nzil, mag2) where mag2 is the f32
    magnitude-squared |z'|^2 of the NEW point (hi parts only — the
    escape test needs ~1e-3 accuracy, cudabrot.cu:336).  Mirrors
    models/fractals.step semantics in df32.  ``zero`` is the runtime-
    zero seal operand (see module docstring).
    """
    if fold_abs:
        zr, zrl = abs_(zr, zrl)
        zi, zil = abs_(zi, zil)
    r2h, r2l = sqr(zr, zrl, zero)
    i2h, i2l = sqr(zi, zil, zero)
    xh, xl = mul(zr, zrl, zi, zil, zero)
    nzr, nzrl = add(r2h, r2l, -i2h, -i2l)
    nzr, nzrl = add(nzr, nzrl, crh, crl)
    # Doubling a df pair is exact (power-of-two scale of both parts).
    nzi, nzil = add(xh + xh, xl + xl, cih, cil)
    # hi parts suffice for the 4.0 escape threshold (needs ~1e-3, not
    # 2^-48, of accuracy).
    mag2 = nzr * nzr + nzi * nzi
    return nzr, nzrl, nzi, nzil, mag2
