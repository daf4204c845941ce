"""Benchmark harness: the headline metric from BASELINE.json.

Config: 1000x1000 canvas, iteration band [2000, 20000) (the reference's
"cutoff 2000" example, README.md:155-157), time-boxed run on one chip.
Reports complex iterations/sec (classification work, the analog of the
reference's passes-per-10s log in version_timing.txt) plus samples/sec and
orbit points scattered/sec. Baseline: 1e10 complex iterations/sec/chip
(BASELINE.md north star); the reference's own Radeon VII figure is
~1.07e9 samples/sec at m=100 (version_timing.txt:74-84).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_ITERS_PER_SEC = 1.0e10


def main() -> int:
    import jax

    from cudabrot_tpu import driver
    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    on_tpu = jax.default_backend() == "tpu"
    cfg = RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
        seconds_to_run=seconds,
        options=EngineOptions(
            engine="auto",
            oracle_samples_per_pass=1 << 14,
            pipeline_depth=2,
        ),
    )

    # Warmup pass (compile) outside the timed run.
    warm = cfg.replace(seconds_to_run=-1.0, max_passes=1)
    driver.run_render(warm, log=lambda s: None)

    t0 = time.monotonic()
    result = driver.run_render(cfg, log=lambda s: None)
    elapsed = result.elapsed_seconds

    iters = result.stats.get("classify_iters", 0)
    points = result.stats.get("orbit_points", 0)
    samples = result.stats.get("samples", 0)
    iters_per_sec = iters / elapsed if elapsed > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "complex_iterations_per_sec_per_chip",
                "value": round(iters_per_sec, 1),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 4),
                "samples_per_sec": round(samples / elapsed, 1),
                "orbit_points_per_sec": round(points / elapsed, 1),
                "passes": result.passes,
                "elapsed_seconds": round(elapsed, 3),
                "engine": result.engine_name,
                "backend": jax.default_backend(),
                "band": [2000, 20000],
                "canvas": [1000, 1000],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
