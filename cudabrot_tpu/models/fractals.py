"""Fractal iteration-map registry.

The reference hard-wires two systems behind a compile-time switch
(RENDER_BURNING_SHIP, cudabrot.cu:15-17): the Mandelbrot map z <- z^2 + c
(cudabrot.cu:331-333) and the burning-ship variant that folds |.| onto both
components before each step (cudabrot.cu:327-330). Here each system is a
registry entry selected at runtime; the step/cull functions are pure and
dtype-generic so they are shared verbatim by the jax.numpy oracle engine and
the Pallas TPU kernel (both trace them, so the "switch" costs nothing at
runtime — it is baked into the compiled program).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FractalMap:
    """A quadratic escape-time system rendered Buddhabrot-style."""

    name: str
    #: Fold absolute values onto z before each step (burning ship,
    #: cudabrot.cu:327-330).
    fold_abs: bool
    #: Apply the closed-form cardioid/period-2-bulb rejection tests. Only
    #: valid for the true Mandelbrot map (the reference disables them for
    #: burning ship, cudabrot.cu:397-399).
    use_cull: bool
    #: Whether interior orbits converge to attracting cycles, making Brent
    #: cycle detection sound (true for the Mandelbrot map's hyperbolic
    #: interior; disabled for burning ship where we have no such guarantee).
    cycle_detect: bool
    #: Which samples are rendered: "escape" replays orbits of in-band
    #: escaping samples (the Buddhabrot, cudabrot.cu:407-412); "interior"
    #: replays orbits of samples that do NOT escape within the iteration
    #: cap (the anti-Buddhabrot — no reference equivalent). Interior
    #: samples are those proven periodic by Brent detection plus those
    #: reaching the cap; each replays max_escape_iterations orbit points.
    #: The -c cutoff has no meaning in interior mode and is ignored.
    emit: str = "escape"


def step(fractal: FractalMap, zr, zi, cr, ci):
    """One iteration of the system: z <- f(z) + c.

    Mirrors the update at cudabrot.cu:331-333 (and the burning-ship fold at
    cudabrot.cu:327-330). Returns (zr', zi').
    """
    if fractal.fold_abs:
        zr = jnp.abs(zr)
        zi = jnp.abs(zi)
    new_zr = zr * zr - zi * zi + cr
    new_zi = 2.0 * zr * zi + ci
    return new_zr, new_zi


def escaped(zr, zi):
    """Escape test |z|^2 > 4 (cudabrot.cu:336, 363)."""
    return zr * zr + zi * zi > 4.0


def in_main_cardioid(cr, ci):
    """Closed-form main-cardioid membership (cudabrot.cu:284-290)."""
    imag_sq = ci * ci
    q = (cr - 0.25)
    q = q * q + imag_sq
    return q * (q + (cr - 0.25)) < imag_sq * 0.25


def in_order2_bulb(cr, ci):
    """Closed-form period-2 bulb membership (cudabrot.cu:294-298)."""
    t = cr + 1.0
    return t * t + ci * ci < (1.0 / 16.0)


def cull_mask(fractal: FractalMap, cr, ci):
    """True where the sample is guaranteed non-escaping and can be skipped
    without iterating (cudabrot.cu:397-399)."""
    if not fractal.use_cull:
        return jnp.zeros(jnp.shape(cr), dtype=bool)
    return in_main_cardioid(cr, ci) | in_order2_bulb(cr, ci)


FRACTALS: dict[str, FractalMap] = {
    "buddhabrot": FractalMap(
        name="buddhabrot", fold_abs=False, use_cull=True, cycle_detect=True
    ),
    "burning-ship": FractalMap(
        name="burning-ship", fold_abs=True, use_cull=False, cycle_detect=False
    ),
    # The interior complement: culls stay OFF so cardioid/bulb samples
    # (guaranteed interior — the brightest structures) are iterated,
    # cycle-detected, and rendered instead of skipped.
    "anti-buddhabrot": FractalMap(
        name="anti-buddhabrot", fold_abs=False, use_cull=False,
        cycle_detect=True, emit="interior",
    ),
}


def get_fractal(name: str) -> FractalMap:
    try:
        return FRACTALS[name]
    except KeyError:
        raise ValueError(
            f"Unknown fractal {name!r}; available: {sorted(FRACTALS)}"
        ) from None
