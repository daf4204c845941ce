"""A/B the hybrid replay split (device share of the orbit-point mass).

At the headline band the pipeline is host-replay-bound while the chip is
~70% idle after classify; routing a small share of the *short* orbits to
the device's blocked replay uses that idle. Balance model (measured
rates: device scatter ~1.1e8 pts/s, host ~7.6e8 pts/s, classify ~25-28
ms/pass) predicts the optimum near share ~0.08 for ~9%.

Usage: python benchmarks/hybrid_ab.py [seconds_per_variant] [shares...]
"""

from __future__ import annotations

import json
import sys
import time


def measure(share: float, seconds: float) -> dict:
    import jax

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    cfg = RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
        options=EngineOptions(replay_device_share=share),
    )
    engine = PallasEngine(cfg, replay_mode="host")
    state = engine.init_state(None)
    engine.warmup(state)

    state = engine.run_pass(state, 0)
    jax.block_until_ready(state)
    engine._worker.drain()
    prev = engine.stats(state)

    t0 = time.monotonic()
    p = 1
    while time.monotonic() - t0 < seconds:
        state = engine.run_pass(state, p)
        p += 1
    jax.block_until_ready(state)
    engine._worker.drain()
    dt = time.monotonic() - t0
    st = engine.stats(state)
    classify = st["classify_iters"] - prev["classify_iters"]
    points = st["orbit_points"] - prev["orbit_points"]
    return {
        "share": share,
        "threshold": engine.split_threshold,
        "total_per_s": round((classify + points) / dt, 1),
        "classify_per_s": round(classify / dt, 1),
        "points_per_s": round(points / dt, 1),
        "passes": p,
        "elapsed": round(dt, 2),
    }


def main() -> int:
    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    shares = [float(a) for a in sys.argv[2:]] or [0.0, 0.08, 0.15]
    for share in shares:
        print(json.dumps(measure(share, seconds)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
