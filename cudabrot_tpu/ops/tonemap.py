"""Histogram -> 16-bit grayscale tone mapping, on device.

Reference parity (math is identical, execution is not): the reference does a
two-pass CPU loop — scan for the max count (GetLinearColorScale,
cudabrot.cu:425-439) then per-pixel linear scale + optional gamma with
truncating casts (DoGammaCorrection/Clamp/SetGrayscalePixels,
cudabrot.cu:416-468). Here both passes are a handful of fused XLA
reductions/elementwise ops running on the accelerator, so tone-mapping a
20000^2 histogram costs milliseconds instead of a host round-trip.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TonemapResult(NamedTuple):
    image: jnp.ndarray  # uint16, same shape as the histogram
    max_count: jnp.ndarray  # uint32 scalar (printed by the driver for parity
    #                         with cudabrot.cu:437)
    linear_scale: jnp.ndarray  # float64-ish scalar as float32


@functools.partial(jax.jit, static_argnames=("gamma",))
def tonemap(hist: jnp.ndarray, gamma: float) -> TonemapResult:
    """Scale counts to [0, 65535] and gamma-correct.

    * linear scale = 65535 / max(hist) (cudabrot.cu:436);
    * gamma <= 0 disables correction and truncates the scaled value
      (cudabrot.cu:447);
    * otherwise out = clamp(65535 * (scaled/65535)^(1/gamma)) with the same
      truncation/clamp behavior as Clamp (cudabrot.cu:416-420, 448).

    Edge case the reference leaves undefined (divide-by-zero at
    cudabrot.cu:436 when the histogram is empty): an all-zero histogram maps
    to an all-zero image here.
    """
    maxval = 65535.0
    max_count = jnp.max(hist)
    denom = jnp.maximum(max_count, 1).astype(jnp.float32)
    # Normalize as q = count/max rather than count * (65535/max): q is
    # exactly 1.0 for the max pixel (IEEE x/x == 1), so full white is hit
    # exactly, where the reference's double arithmetic (cudabrot.cu:436,445)
    # merely gets within an ulp. The f32 error elsewhere is far below one
    # gray level.
    q = jnp.where(max_count > 0, hist.astype(jnp.float32) / denom, 0.0)
    scale = jnp.where(max_count > 0, maxval / denom, 0.0)
    if gamma <= 0.0:
        out = (q * maxval).astype(jnp.uint16)  # truncating cast, cudabrot.cu:447
    else:
        corrected = maxval * jnp.power(q, 1.0 / gamma)
        corrected = jnp.clip(corrected, 0.0, maxval)
        out = corrected.astype(jnp.uint16)
    return TonemapResult(out, max_count.astype(jnp.uint32), scale)


def tonemap_hist(hist, gamma: float) -> TonemapResult:
    """Dtype-dispatching entry for host histograms.

    uint64 histograms (extreme-duration renders) can't ride through jax
    without x64 (silent demotion) — and don't need to: the tone map is a
    ratio, so float32 carries it to far below one gray level. max_count
    is taken exactly on the host for the parity print."""
    import numpy as np

    h = np.asarray(hist)
    if h.dtype == np.uint64:
        res = tonemap(jnp.asarray(h.astype(np.float32)), gamma)
        return TonemapResult(res.image, int(h.max(initial=0)),
                             res.linear_scale)
    return tonemap(jnp.asarray(h), gamma)
