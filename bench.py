"""Benchmark harness: the headline metric from BASELINE.json.

Config: 1000x1000 canvas, iteration band [2000, 20000) (the reference's
"cutoff 2000" example, README.md:155-157), time-boxed run on one chip.
The metric counts *complex iterations* — classification steps plus orbit
replay steps (each orbit point is one z^2+c iteration), matching what the
reference's passes-per-10s log measures (version_timing.txt) since its
kernel performs both. Baseline: 1e10 iterations/s/chip (BASELINE.md north
star); the reference's own Radeon VII figure works out to ~4.7e9.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_ITERS_PER_SEC = 1.0e10


def main() -> int:
    import jax

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )
    from cudabrot_tpu import engines

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    cfg = RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
        seconds_to_run=seconds,
    )
    engine = engines.make_engine(cfg)

    # Warmup (compile) outside the timed region.
    state = engine.init_state(None)
    state = engine.run_pass(state, 0)
    jax.block_until_ready(state)

    # Median of five segments: throughput through the shared tunnel is
    # noisy (segments vary ~12% within a run), so one long window
    # under-reports as often as not; the median of more, shorter
    # segments keeps run-to-run medians within ~+-5%.
    n_segments = 5
    seg_len = max(seconds / n_segments, 1.0)
    seg_rates = []
    passes = 1
    prev = engine.stats(state)
    elapsed = 0.0
    classify = points = samples = 0
    for _seg in range(n_segments):
        t0 = time.monotonic()
        while time.monotonic() - t0 < seg_len:
            state = engine.run_pass(state, passes)
            passes += 1
        jax.block_until_ready(state)
        if getattr(engine, "_worker", None) is not None:
            engine._worker.drain()
        dt = time.monotonic() - t0
        st = engine.stats(state)
        d_classify = st["classify_iters"] - prev["classify_iters"]
        d_points = st["orbit_points"] - prev["orbit_points"]
        classify += d_classify
        points += d_points
        samples += st["samples"] - prev["samples"]
        elapsed += dt
        seg_rates.append((d_classify + d_points) / dt)
        prev = st

    hist = engine.histogram(state)
    iters_per_sec = sorted(seg_rates)[n_segments // 2]  # median segment
    # Tunnel-noise visibility: publish every segment and the spread so a
    # recorded number can be judged against the run's own variance.
    spread_pct = 100.0 * (max(seg_rates) - min(seg_rates)) / iters_per_sec

    print(
        json.dumps(
            {
                "metric": "complex_iterations_per_sec_per_chip",
                "value": round(iters_per_sec, 1),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 4),
                "segment_rates": [round(r, 1) for r in seg_rates],
                "segment_spread_pct": round(spread_pct, 2),
                "classify_iters_per_sec": round(classify / elapsed, 1),
                "orbit_points_per_sec": round(points / elapsed, 1),
                "samples_per_sec": round(samples / elapsed, 1),
                "passes": passes,
                "elapsed_seconds": round(elapsed, 3),
                "engine": engine.name,
                "replay": st.get("replay", "n/a"),
                "backend": jax.default_backend(),
                "band": [2000, 20000],
                "canvas": [1000, 1000],
                "histogram_mass": int(hist.sum()),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
