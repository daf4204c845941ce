"""Slow scalar NumPy re-statement of the reference algorithm, used as
ground truth in tests.

This mirrors the *behavior* of DrawBuddhabrot and its helpers
(cudabrot.cu:284-414) as plain Python loops: per-sample escape-time
classification starting from z = c, band filtering, orbit replay recording
every update including the escape point, and the exact bin quantization of
IncrementPixelCounter (cudabrot.cu:302-314). It is deliberately naive —
a few hundred samples at double precision — so any disagreement with the
vectorized engines is an engine bug, not a test-harness bug.
"""

from __future__ import annotations

import numpy as np


def classify_scalar(cr, ci, max_iterations, burning_ship=False):
    """IterateMandelbrot (cudabrot.cu:319-340): returns the 0-based escape
    loop index, or max_iterations when the point doesn't escape."""
    zr, zi = cr, ci
    for i in range(max_iterations):
        if burning_ship:
            zr, zi = abs(zr), abs(zi)
        zr, zi = zr * zr - zi * zi + cr, 2.0 * zr * zi + ci
        if zr * zr + zi * zi > 4.0:
            return i
    return max_iterations


def in_main_cardioid(cr, ci):
    imag_sq = ci * ci
    q = (cr - 0.25) ** 2 + imag_sq
    return q * (q + (cr - 0.25)) < imag_sq * 0.25


def in_order2_bulb(cr, ci):
    return (cr + 1.0) ** 2 + ci * ci < 1.0 / 16.0


def bin_point(re, im, canvas):
    """IncrementPixelCounter's quantization (cudabrot.cu:302-314); returns
    (row, col) or None if the point is off-canvas."""
    if re < canvas.min_real or im < canvas.min_imag:
        return None
    col = int((re - canvas.min_real) / canvas.delta_real)
    row = int((im - canvas.min_imag) / canvas.delta_imag)
    if 0 <= row < canvas.height and 0 <= col < canvas.width:
        return row, col
    return None


def replay_scalar(cr, ci, hist, canvas, burning_ship=False):
    """IterateAndRecord (cudabrot.cu:347-365): caller must guarantee
    escape."""
    zr, zi = cr, ci
    while True:
        if burning_ship:
            zr, zi = abs(zr), abs(zi)
        zr, zi = zr * zr - zi * zi + cr, 2.0 * zr * zi + ci
        rc = bin_point(zr, zi, canvas)
        if rc is not None:
            hist[rc] += 1
        if zr * zr + zi * zi > 4.0:
            return


def render_samples(cr_arr, ci_arr, canvas, max_it, min_it, burning_ship=False):
    """The full DrawBuddhabrot sample loop (cudabrot.cu:390-413) over given
    samples. Returns (hist, iters array, in_band mask)."""
    hist = np.zeros(canvas.shape, dtype=np.uint32)
    iters = np.zeros(len(cr_arr), dtype=np.int32)
    in_band = np.zeros(len(cr_arr), dtype=bool)
    for k, (cr, ci) in enumerate(zip(cr_arr, ci_arr)):
        cr = float(cr)
        ci = float(ci)
        if not burning_ship and (
            in_main_cardioid(cr, ci) or in_order2_bulb(cr, ci)
        ):
            iters[k] = -1  # culled marker (never classified)
            continue
        i = classify_scalar(cr, ci, max_it, burning_ship)
        iters[k] = i
        if i >= max_it or i < min_it:
            continue
        in_band[k] = True
        replay_scalar(cr, ci, hist, canvas, burning_ship)
    return hist, iters, in_band
