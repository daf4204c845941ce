"""Sweep the extended-MH kernel's raw rate across (inner_unroll,
steps_per_flush, lane_rows) on the attached chip.

Motivation (r4): BENCH_r03 mh_zoom lost to its uniform comparator
(signal_vs_uniform 0.58) and benchmarks/mh_flush_ab.py measured the
chain kernel saturating at ~5.3e8 lane-steps/s — ~80x below the uniform
df32 kernel at the same window (4.3e10) and far below any boundary-cost
model. This probe isolates where the steps go: if U=32 compiles
pathologically (the known XLA-CPU failure mode, verify skill), smaller
U wins; if the df32 VMEM-pressure regime binds (PERF_NOTES "df32 rate
correction"), fewer lane rows win; if neither moves the rate, the
boundary block itself is the wall.

Usage: python benchmarks/mh_kernel_sweep.py [seconds_per_leg] [legs...]
  legs: U:flush:rows triples, default sweep below.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    legs = []
    for a in sys.argv[2:]:
        u, f, r = a.split(":")
        legs.append((int(u), int(f), int(r)))
    if not legs:
        legs = [
            (32, 16384, 64),
            (16, 16384, 64),
            (8, 16384, 64),
            (4, 16384, 64),
            (8, 4096, 64),
            (8, 16384, 32),
            (8, 16384, 128),
        ]

    import jax

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    cx, cy = -0.743643887037151, 0.131825904205330
    span = 1e-5
    for u, flush, rows in legs:
        cfg = RenderConfig(
            canvas=Canvas(
                width=1000, height=1000,
                min_real=cx - span / 2, max_real=cx + span / 2,
                min_imag=cy - span / 2, max_imag=cy + span / 2,
            ),
            band=IterationBand(max_escape_iterations=20000,
                               min_escape_iterations=500),
            sample_domain=(cx - 4 * span, cx + 4 * span,
                           cy - 4 * span, cy + 4 * span),
            seconds_to_run=seconds,
            options=EngineOptions(
                precision="extended", sampler="mh",
                steps_per_flush=flush, inner_unroll=u,
                lane_rows=rows,
                steps_per_pass=flush * 16,
            ),
        )
        engine = PallasEngine(cfg)
        state = engine.init_state(None)
        p = 0
        for _ in range(cfg.options.mh_burnin_passes + 1):
            state = engine.run_pass(state, p)
            p += 1
        jax.block_until_ready(state)
        base_mass = float(engine.histogram(state).sum())

        t0 = time.monotonic()
        p0 = p
        while time.monotonic() - t0 < seconds:
            state = engine.run_pass(state, p)
            p += 1
            # Throttle like driver.run_render (pipeline depth 2): MH
            # device mode has no host-worker backpressure, and an
            # unthrottled loop enqueues minutes-to-hours of async passes.
            if p % 2 == 0:
                jax.block_until_ready(state)
        jax.block_until_ready(state)
        if engine._worker is not None:
            engine._worker.drain()
        wall = time.monotonic() - t0

        hist = engine.histogram(state)
        st = engine.stats(state)
        tn = engine.tuning
        lane_steps = (p - p0) * tn.steps_per_pass * engine.lanes
        print(json.dumps({
            "U": u, "flush": flush, "rows": rows,
            "passes": p - p0,
            "wall_s": round(wall, 2),
            "lane_steps_per_s": round(lane_steps / wall, 1),
            "deposited_mass_per_s": round(
                (float(hist.sum()) - base_mass) / 256.0 / wall, 1
            ),
            "fetch_s": st.get("replay_fetch_seconds"),
            "replay_s": st.get("replay_busy_seconds"),
        }), flush=True)
        if engine._worker is not None:
            engine._worker.close()
        del state, engine
        import gc

        gc.collect()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
