"""A/B the Metropolis-Hastings sampler against uniform sampling on a
crop: equal wall-clock, same canvas/band/seed class, compare deposited
on-canvas signal and its spatial distribution.

MH's value proposition is signal on crops where uniform sampling
starves: the uniform hit mass scales roughly with the crop's preimage
measure (falls with window area), while MH chains stay ON the
contributing c-regions and only pay the 1/v re-weighting variance. The
honest comparison is *effective* signal at equal time:

  * uniform deposits N_u points, each weight 1 -> Poisson-ish variance,
    relative error ~ 1/sqrt(hits per pixel);
  * MH deposits weighted mass M = sum rep/v per pixel; its variance per
    unit mass is larger (chain correlation + weight spread), so we also
    report an effective-sample-size proxy per pixel
    (ESS = (sum w)^2 / sum w^2 over deposits is not recoverable from the
    histogram alone; we report the cross-correlation of two
    independent-seed MH half-runs instead, the practical precision
    measure).

Usage: python benchmarks/mh_ab.py [seconds_per_variant] [span]
  span: crop width centered on the seahorse valley (default 6e-3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CENTER = (-0.7436, 0.1319)  # seahorse valley
BAND = (5000, 500)  # (max_it, min_it) — deep enough to be structured


def _cfg(span: float, sampler: str, seed: int = 1337):
    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )

    cx, cy = CENTER
    half = span / 2.0
    return RenderConfig(
        canvas=Canvas(
            width=600, height=600,
            min_real=cx - half, max_real=cx + half,
            min_imag=cy - half, max_imag=cy + half,
        ),
        band=IterationBand(
            max_escape_iterations=BAND[0], min_escape_iterations=BAND[1]
        ),
        seed=seed,
        options=EngineOptions(
            sampler=sampler,
            # Uniform: native host replay with the canvas emit filter
            # (its best crop mode). MH: the device bins-deposit path
            # (production default) and intrinsic gating.
            replay="host" if sampler == "uniform" else "auto",
            emit_filter="canvas" if sampler == "uniform" else "any",
        ),
    )


def measure(sampler: str, span: float, seconds: float, seed: int = 1337):
    import jax

    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    print(f"[mh_ab] leg start: {sampler} seed={seed}", file=sys.stderr,
          flush=True)
    engine = PallasEngine(_cfg(span, sampler, seed))
    state = engine.init_state(None)
    engine.warmup(state)
    state = engine.init_state(None)
    print(f"[mh_ab] leg warm: {sampler} seed={seed}", file=sys.stderr,
          flush=True)

    t0 = time.monotonic()
    p = 0
    while time.monotonic() - t0 < seconds:
        state = engine.run_pass(state, p)
        p += 1
        # Throttle like driver.run_render: MH device mode has no host
        # worker backpressure, so an unthrottled loop enqueues ~1800
        # async passes in 45 s and the trailing block_until_ready
        # "hangs" for their full drain time (observed: 45 s legs that
        # ran for 50+ minutes).
        if p % 2 == 0:
            jax.block_until_ready(state)
    jax.block_until_ready(state)
    wall = time.monotonic() - t0
    hist = engine.histogram(state)
    stats = engine.stats(state)
    scale = stats.get("weight_scale", 1)
    mass = float(hist.sum()) / scale
    occupied = float((hist > 0).mean())
    return {
        "sampler": sampler,
        "passes": p,
        "wall_s": round(wall, 2),
        "deposited_mass": mass,
        "mass_per_s": mass / wall,
        "pixel_occupancy": occupied,
        "max_bin": float(hist.max()) / scale,
        "accepts": stats.get("mh_accepts"),
        "samples": stats["samples"],
        "merged_rep": stats.get("mh_merged_rep"),
        "lost_weight": stats.get("mh_lost_weight"),
        "replay_dropped": stats["replay_dropped"],
    }, hist.astype(np.float64) / max(scale, 1)


def half_run_correlation(span: float, seconds: float) -> float:
    """Precision proxy: correlation of two independent-seed MH runs'
    normalized histograms (1.0 = fully converged)."""
    _, h1 = measure("mh", span, seconds, seed=1337)
    _, h2 = measure("mh", span, seconds, seed=4242)
    if h1.sum() == 0 or h2.sum() == 0:
        return 0.0
    a = h1 / h1.sum()
    b = h2 / h2.sum()
    return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    span = float(sys.argv[2]) if len(sys.argv) > 2 else 6e-3
    out = {"span": span, "seconds_per_variant": seconds}
    res_u, hu = measure("uniform", span, seconds)
    res_m, hm = measure("mh", span, seconds)
    out["uniform"] = res_u
    out["mh"] = res_m
    if res_u["deposited_mass"] > 0:
        out["mass_ratio_mh_over_uniform"] = (
            res_m["mass_per_s"] / res_u["mass_per_s"]
        )
    if hu.sum() > 0 and hm.sum() > 0:
        a = hu / hu.sum()
        b = hm / hm.sum()
        out["cross_correlation"] = float(
            np.corrcoef(a.ravel(), b.ravel())[0, 1]
        )
    out["mh_half_run_correlation"] = half_run_correlation(
        span, seconds / 2
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
